package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** BM25 retrieval scoring over a document corpus — the ranking half of
  * data curation (find the training docs most relevant to a probe query;
  * the same scorer backs quality-by-relevance filtering and train-set
  * search tooling).
  *
  * score(D, Q) = Σ_{t∈Q} idf(t) · f(t,D)·(k1+1) /
  *                        (f(t,D) + k1·(1 − b + b·|D|/avgdl)),
  * idf(t) = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))   (Robertson–Spärck
  * Jones, the Okapi BM25 formulation).
  *
  * Scale shape: the token explode is filtered to the |Q| query terms
  * BEFORE any exchange (an `isin` over a literal set — at 100 TB the
  * stream that shuffles is only matching (doc, term) occurrences, a
  * vanishing fraction of the corpus token count). Corpus stats (N,
  * avgdl) are a 1-row aggregate and the per-term idf table has |Q|
  * rows — both broadcast. Two exchanges total: the (doc, term) tf
  * aggregate and the per-doc score sum. */
object Retrieval {

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = docs.select(col(idCol).as("id"),
        Text.tokens(lower(col(textCol))).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = base.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("dl")).as("__avgdl"))
    val tf = base.select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("f"))
    val idf = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)))
      .select("term", "idf", "__avgdl")
    tf.join(broadcast(idf), Seq("term"))
      .withColumn("part", col("idf") * col("f") * lit(k1 + 1) /
        (col("f") + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("part")), 6).as("score"))
  }
}
