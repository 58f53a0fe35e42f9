package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the native expressions as SQL functions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_cosine / graft_simhash / graft_hyperplane_sig usable from SQL") {
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_simhash(array('a','b')) AS s,
        |       graft_hyperplane_sig(array(1.0D, 2.0D), 16) AS h""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 16))
  }

  test("graft_top_ngram_frac usable from SQL, equals the Column API") {
    val r = spark.sql(
      "SELECT graft_top_ngram_frac('a b a b a b', 2) AS f").head()
    assert(r.getDouble(0) == 1.0)
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents").limit(50)
    docs.createOrReplaceTempView("__ext_docs")
    val api = docs.select(graft.functions.Text.topNgramFrac(lower(col("text")), 3))
      .collect().map(_.getDouble(0)).toSeq
    val sql = spark.sql(
      "SELECT graft_top_ngram_frac(lower(text), 3) FROM __ext_docs")
      .collect().map(_.getDouble(0)).toSeq
    assert(api == sql)
  }

  test("graft_word_ngrams: multiplicity kept, order kept, short text empty; SQL == API") {
    val r = spark.sql(
      """SELECT graft_word_ngrams('a b a b', 2) AS g,
        |       graft_word_ngrams('a', 2) AS short""".stripMargin).head()
    // multiplicity preserved ('a b' twice) — shingles would dedup
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(r.getSeq[String](1) == Seq.empty)
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents").limit(50)
    docs.createOrReplaceTempView("__ng_docs")
    val api = docs.select(graft.functions.Text.ngrams(lower(col("text")), 2))
      .collect().map(_.getSeq[String](0)).toSeq
    val sql = spark.sql("SELECT graft_word_ngrams(lower(text), 2) FROM __ng_docs")
      .collect().map(_.getSeq[String](0)).toSeq
    assert(api == sql)
    // counting identity: Σ per-doc ngram counts == Σ max(0, n_tok - 1)
    val total = docs.select(size(graft.functions.Text.ngrams(col("text"), 2)))
      .collect().map(_.getInt(0)).sum
    val expected = docs.select(greatest(lit(0),
        size(split(col("text"), " ")) - 1))
      .collect().map(_.getInt(0)).sum
    assert(total == expected)
  }

  test("remaining kernels usable from SQL: shingles/minhash/hash_tokens/rolling/nearest_cells") {
    val r = spark.sql(
      """SELECT graft_word_shingles('a b c d', 3) AS sh,
        |       graft_minhash_sig(array('a','b','c'), 8) AS mh,
        |       graft_hash_tokens(array('a','b')) AS ht,
        |       graft_rolling_hash(array('a','b')) AS rh,
        |       graft_nearest_cells(array(1.0D, 0.0D),
        |         array(10L, 20L), array(1.0D, 0.0D, 0.0D, 1.0D), 1) AS nc""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[Long](1).length == 8)
    assert(r.getSeq[Long](2).length == 2)
    assert(r.getLong(3) != 0L)
    assert(r.getSeq[Long](4) == Seq(10L)) // (1,0) is exactly centroid 10
    // SQL == Column API on real docs (the parity that matters)
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents").limit(50)
    docs.createOrReplaceTempView("__ext_docs2")
    val api = docs.select(
        graft.plans.exprs.minhashSig(graft.functions.Text.shingles(lower(col("text")), 3), 16))
      .collect().map(_.getSeq[Long](0)).toSeq
    val sql = spark.sql(
      "SELECT graft_minhash_sig(graft_word_shingles(lower(text), 3), 16) FROM __ext_docs2")
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(api == sql)
  }

  test("SQL cosine == Column-API cosine on real embeddings") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables(spark, TestSpark.sf0001, "embeddings").limit(20)
    emb.createOrReplaceTempView("__ext_emb")
    val api = emb.select(graft.functions.Vectors.cosine(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0)).toSeq
    val sql = spark.sql(
      "SELECT graft_cosine(embedding, embedding) FROM __ext_emb")
      .collect().map(_.getDouble(0)).toSeq
    assert(api == sql)
  }
}
