package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bloom, Similarity}
import graft.sources.Tables

class PqBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- product quantization ----

  test("pqEncode/pqLut/pqAdc agree with hand computation on a known codebook") {
    // m=2 subspaces × ksub=2 codewords × subDim=2:
    //   j=0: c0=(0,0), c1=(10,10);  j=1: c0=(0,0), c1=(-10,-10)
    val cb = Array[Double](0, 0, 10, 10, 0, 0, -10, -10)
    val df = Seq((1L, Array(9.0, 9.0, 1.0, 1.0))).toDF("id", "v")
    val enc = df.select(graft.plans.exprs.pqEncode($"v", cb, 2, 2).as("codes"))
      .head().getSeq[Long](0)
    assert(enc == Seq(1L, 0L)) // (9,9) nearer (10,10); (1,1) nearer (0,0)
    val lut = df.select(graft.plans.exprs.pqLut($"v", cb, 2, 2).as("lut"))
      .head().getSeq[Double](0)
    // [j=0: to c0 = 81+81, to c1 = 1+1, j=1: to c0 = 1+1, to c1 = 121+121]
    assert(lut == Seq(162.0, 2.0, 2.0, 242.0))
    val adc = df
      .select(graft.plans.exprs.pqAdc(
        graft.plans.exprs.pqEncode($"v", cb, 2, 2),
        graft.plans.exprs.pqLut($"v", cb, 2, 2), 2).as("adc"))
      .head().getDouble(0)
    assert(adc == 4.0) // 2.0 + 2.0: per-subspace minima
  }

  test("pqEncode skips NaN-marked dead codewords") {
    val cb = Array[Double](Double.NaN, Double.NaN, 5, 5)   // m=1, ksub=2: c0 dead
    val df = Seq((1L, Array(0.0, 0.0))).toDF("id", "v")
    val enc = df.select(graft.plans.exprs.pqEncode($"v", cb, 1, 2).as("codes"))
      .head().getSeq[Long](0)
    assert(enc == Seq(1L)) // c0 would be nearer but is dead
  }

  test("pqTrain: monotone Lloyd error, full model shape, planted twin is ADC top-1") {
    val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    val (model, errs) = Similarity.pqTrain(emb, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, iters = 2)
    assert(model.codebooks.length == 8 * 16 * 8)
    assert(errs.length == 3)
    errs.sliding(2).foreach { p => assert(p(1) <= p(0) + 1e-9, errs.toString) }
    // planted exact twin: its ADC distance to the original equals its own
    // quantization error (the per-subspace argmin sum — the global min)
    val twin = emb.filter($"vec_id" === 0)
      .select(lit(999999L).as("vec_id"), $"embedding")
    val top1 = Similarity.pqTopK(emb, twin, "vec_id", "embedding", model, k = 1)
      .head()
    val selfAdc = Similarity.pqEncode(twin, "embedding", model)
      .select(graft.plans.exprs.pqAdc($"codes",
        graft.plans.exprs.pqLut(graft.functions.Vectors.toDouble($"embedding"),
          model.codebooks, model.m, model.ksub), model.ksub))
      .head().getDouble(0)
    assert(top1.getAs[Double]("adc") == selfAdc)
  }

  test("pqEncode is a zero-exchange projection; pqTopK broadcasts queries " +
       "and map-side-limits the ranking") {
    val raw = Tables(spark, TestSpark.sf0001, "embeddings")
    val emb = raw.repartition(5) // multi-partition corpus = the cluster shape
    val (model, _) = Similarity.pqTrain(raw, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, iters = 1)
    val encPlan = Similarity.pqEncode(raw, "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), encPlan.take(800))
    val topPlan = Similarity.pqTopK(emb, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", model, k = 4).queryExecution.executedPlan.toString
    assert(topPlan.contains("Broadcast"), topPlan.take(1200))
    assert(topPlan.contains("WindowGroupLimit"), topPlan.take(1200))
    assert(topPlan.contains("Partial"), topPlan.take(1200))
  }

  test("ivfPqTopK at full probe equals pqTopK row-for-row; zero-exchange " +
       "route+encode side") {
    val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    val (model, _) = Similarity.pqTrain(emb, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, iters = 1)
    val cents = Similarity.trainCentroidsKMeans(emb, "vec_id", "embedding",
      dim = 64, cells = 8, iters = 1)
    val q = emb.filter($"vec_id" < 5)
    val ivf = Similarity.ivfPqTopK(emb, q, cents, "vec_id", "embedding",
        model, k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding", model, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(ivf == pq)
    // route + encode is one projection: no Exchange upstream of the join
    val plan = Similarity.ivfPqTopK(emb, q, cents, "vec_id", "embedding",
      model, k = 3, nProbe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan.take(1200))
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("balancedAxisOrder: deals a two-tier spectrum evenly; is a permutation") {
    // 8 big + 8 tiny eigenvalues into m=4 subspaces of 4 axes: every
    // subspace must get exactly 2 of each — the sorted-block degeneracy
    // (ADVICE-grade greedy bug: negative log increments made the
    // emptiest bucket never win) would give two all-big subspaces
    val eig = Array.fill(8)(2.0) ++ Array.fill(8)(0.005)
    val ord = Similarity.balancedAxisOrder(eig, m = 4)
    assert(ord.sorted.toSeq == (0 until 16))
    for (j <- 0 until 4) {
      val big = ord.slice(j * 4, j * 4 + 4).count(_ < 8)
      assert(big == 2, s"subspace $j got $big big axes: ${ord.mkString(",")}")
    }
  }

  test("rotated encode (rotate + pqEncode) is a zero-exchange projection; " +
       "rotated PQ beats unrotated on a correlated corpus") {
    val raw = Tables(spark, TestSpark.sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    // the planted correlation of q128: second half ≈ first half
    val mixed = raw.select($"vec_id", array((0 until 64).map { i =>
      if (i < 32) element_at($"embedding", i + 1).cast("double")
      else element_at($"embedding", i - 31).cast("double") +
        lit(0.1) * element_at($"embedding", i + 1).cast("double")
    }: _*).as("embedding"))
    val (_, errsU) = Similarity.pqTrain(mixed, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, iters = 2)
    val (rmodel, errsR) = Similarity.rotatedPqTrain(mixed, "vec_id",
      "embedding", dim = 64, m = 8, ksub = 16, iters = 2)
    assert(errsR.last < errsU.last,
      s"rotated ${errsR.last} not below unrotated ${errsU.last}")
    // the OPQ scale contract: rotating and encoding the corpus is ONE
    // narrow projection — no Exchange anywhere in the plan
    val encPlan = Similarity.pqEncode(
        Similarity.rotate(mixed, "embedding", rmodel), "pc", rmodel.pq)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), encPlan.take(1200))
  }

  test("cdcChunkDedup is shift-robust where fixed blocks are not") {
    import graft.operators.Dedup
    val body = (0 until 80).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, body), (2L, s"ins0 ins1 $body")).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedup(df, "doc_id", "text", avgChunkTokens = 8)
      .orderBy("id").collect()
    // doc 1 (smaller id) keeps everything; doc 2's shared chunks after
    // the first content boundary dedupe away despite the 2-token shift
    assert(cdc(0).getAs[Long]("n_dropped") == 0L)
    assert(cdc(1).getAs[Long]("n_dropped") > 0L, cdc.mkString("; "))
    assert(cdc(1).getAs[Long]("n_tok_clean") < 82L)
    // the prefix itself must survive (it's novel content)
    assert(cdc(1).getAs[String]("text_clean").startsWith("ins0 ins1"))
    // fixed-width blocks miss ALL of it: every boundary shifted by 2
    val blk = Dedup.blockDedup(df, "doc_id", "text", blockTokens = 8)
      .orderBy("id").collect()
    assert(blk(1).getAs[Long]("n_tok_clean") == 82L)
    // determinism: same input → same cleaned text
    val again = Dedup.cdcChunkDedup(df, "doc_id", "text", avgChunkTokens = 8)
      .orderBy("id").collect()
    assert(again(1).getAs[String]("text_clean") ==
      cdc(1).getAs[String]("text_clean"))
  }

  test("CdcBoundaries kernel is bit-identical to the Column-level hexInt coin") {
    // the kernel reads the first three md5 digest bytes; the Column
    // recipe reads the first six hex chars — same 24-bit integer. Mixed
    // scripts, punctuation and empty strings must all agree, or the SQL
    // oracle replay silently diverges.
    val toks = Seq("the", "Schrödinger", "京都", "x", "", "a b", "punct!?",
      "0123456789abcdef", "ζ-function", "ää") ++ (0 until 200).map(i => s"w$i")
    val df = Seq((1L, toks.toArray)).toDF("id", "t")
    val kernel = df.select(graft.plans.exprs.cdcBoundaries($"t", ":cdc", 8))
      .head().getSeq[Int](0)
    val viaHex = df.select(posexplode($"t").as(Seq("i", "tok")))
      .select(col("i"), pmod(graft.operators.TestCoin.hexInt(col("tok"), ":cdc"),
        lit(8)).as("v"))
      .filter($"v" === 0).select(($"i" + 1).cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(kernel == viaHex, s"kernel=$kernel hex=$viaHex")
    assert(kernel.nonEmpty) // 210 tokens at P=1/8 — vacuous pass guard
  }

  test("cdcChunkDedup: exact-duplicate doc drops entirely; null-free contract") {
    import graft.operators.Dedup
    val body = (0 until 40).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val got = Dedup.cdcChunkDedup(df, "doc_id", "text", avgChunkTokens = 8)
      .orderBy("id").collect()
    assert(got.length == 2) // rows never dropped
    assert(got(0).getAs[String]("text_clean") == body)
    assert(got(1).getAs[String]("text_clean") == "")
    assert(got(1).getAs[Long]("n_tok_clean") == 0L)
    assert(got(1).getAs[Long]("n_dropped") == got(1).getAs[Long]("n_chunks"))
  }

  // ---- bloom decontamination ----

  test("bloom membership: no false negatives, deterministic verdicts") {
    val mBits = 1 << 16
    val elems = (0 until 500).map(i => s"elem $i word$i").toDF("ng")
    val bitmap = Bloom.buildBitmap(elems, "ng", mBits, kHashes = 6)
    // every inserted element tests positive
    val neg = elems.filter(!Bloom.mightContain($"ng", bitmap, mBits, 6)).count()
    assert(neg == 0L)
    // two builds of the same set are bit-identical (md5 coin, no RNG)
    val bitmap2 = Bloom.buildBitmap(elems, "ng", mBits, kHashes = 6)
    assert(java.util.Arrays.equals(bitmap, bitmap2))
  }

  test("buildBitmap: rejects sub-word mBits at the call site, " +
       "ignores NULL elements") {
    val elems = Seq(Some("a b c"), None, Some("d e f")).toDF("ng")
    // 32 divides 2^24 but yields a zero-length bitmap — must fail HERE
    intercept[IllegalArgumentException] {
      Bloom.buildBitmap(elems, "ng", mBits = 32, kHashes = 2)
    }
    // a null element must not NPE the distributed build, and must not
    // perturb the non-null elements' bit set
    val withNull = Bloom.buildBitmap(elems, "ng", 1 << 12, kHashes = 4)
    val withoutNull = Bloom.buildBitmap(elems.filter($"ng".isNotNull),
      "ng", 1 << 12, kHashes = 4)
    assert(java.util.Arrays.equals(withNull, withoutNull))
  }

  test("screen: superset of the exact join, zero corpus-side joins in plan") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val train = docs.filter($"doc_id" % 7 =!= 0)
    val evalSh = docs.filter($"doc_id" % 7 === 0)
      .select(explode(graft.plans.exprs.wordShingles(lower($"text"), 8)).as("ng"))
      .distinct()
    val mBits = 1 << 24
    val bitmap = Bloom.buildBitmap(evalSh, "ng", mBits, kHashes = 6)
    val flagged = Bloom.screen(train, "doc_id", "text", bitmap, mBits, 6, 8)
      .filter($"bloom_hit" === 1L)
      .collect().map(_.getLong(0)).toSet
    val exact = train
      .select($"doc_id", explode(graft.plans.exprs.wordShingles(
        lower($"text"), 8)).as("ng"))
      .join(evalSh, Seq("ng"), "left_semi").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged),
      s"false negatives: ${exact -- flagged}") // bloom's defining guarantee
    // scale property: the screen is scan + bit-probe + one doc-level agg —
    // no join operator anywhere in the plan
    val plan = Bloom.screen(train, "doc_id", "text", bitmap, mBits, 6, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    // exchange shape (the scaladoc's "only exchange is the per-doc max"):
    // exactly ONE Exchange, keyed on doc_id, and no Exchange line ever
    // carries the shingle column — the corpus's n-grams never shuffle
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1, plan.take(1500))
    assert(exchanges.head.contains("doc_id"), exchanges.head)
    assert(!exchanges.head.contains("__sh"), exchanges.head)
  }

  // ---- IVFADC-R exact re-rank ----

  test("sqL2 kernel: hand value, float/double symmetry, HOF agreement") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 6.0, 3.0)))
      .toDF("a", "b")
    val v = df.select(graft.plans.exprs.sqL2($"a", $"b").as("d"))
      .head().getDouble(0)
    assert(v == 9.0 + 16.0) // (1-4)² + (2-6)² + (3-3)²
    // bit-identical to the sequential HOF formulation on real vectors
    val emb = Tables(spark, TestSpark.sf0001, "embeddings").limit(50)
    val pairs = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(broadcast(emb.filter($"vec_id" < 3)
        .select($"vec_id".as("ib"), $"embedding".as("vb"))))
    val hof = aggregate(zip_with($"va", $"vb",
      (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, z) => acc + z)
    val nDiff = pairs
      .select((graft.plans.exprs.sqL2($"va", $"vb") =!= hof).cast("int").as("ne"))
      .agg(sum($"ne")).head().getLong(0)
    assert(nDiff == 0L)
  }

  test("refineTopK with the full corpus as shortlist equals " +
       "bruteForceTopKL2 row-for-row (bit-identical distances)") {
    val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    val qs = emb.filter($"vec_id" % 101 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val fullSl = qs.select($"vec_id".as("query_id"))
      .crossJoin(emb.select($"vec_id".as("neighbor_id")))
    val refined = Similarity.refineTopK(emb, qs, fullSl, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    val exact = Similarity.bruteForceTopKL2(emb, qs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    assert(refined.nonEmpty && refined == exact)
  }

  test("refineTopK plan: shortlist broadcasts to the corpus scan, the " +
       "ranking window is the only exchange and is map-side-limited") {
    val raw = Tables(spark, TestSpark.sf0001, "embeddings")
    val emb = raw.repartition(5) // multi-partition corpus = the cluster shape
    val qs = raw.filter($"vec_id" < 3)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val sl = qs.select($"vec_id".as("query_id"))
      .crossJoin(raw.filter($"vec_id" < 40).select($"vec_id".as("neighbor_id")))
    val plan = Similarity.refineTopK(emb, qs, sl, "vec_id", "embedding", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
    assert(plan.contains("Partial"), plan.take(1500))
    // the corpus side never hash-shuffles: every Exchange is either the
    // per-query ranking partition or a broadcast of the tiny shortlist
    val badEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filterNot(_.contains("query_id")).toSeq
    assert(badEx.isEmpty, badEx.mkString("\n"))
  }

  test("ivfPqTopKRefined: recall@k vs exact L2 ground truth is >= the raw " +
       "ADC ranking's at the same nProbe") {
    val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    val (model, _) = Similarity.pqTrain(emb, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, iters = 1)
    val cents = Similarity.trainCentroidsKMeans(emb, "vec_id", "embedding",
      dim = 64, cells = 8, iters = 2)
    val qs = emb.filter($"vec_id" % 101 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val exact = Similarity.bruteForceTopKL2(emb, qs, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val rAdc = recallOf(Similarity.ivfPqTopK(emb, qs, cents, "vec_id",
      "embedding", model, k = 5, nProbe = 2))
    val rRef = recallOf(Similarity.ivfPqTopKRefined(emb, qs, cents, "vec_id",
      "embedding", model, k = 5, nProbe = 2, rFactor = 4))
    assert(rRef >= rAdc, s"refined $rRef < adc $rAdc")
    assert(rRef > 0.0)
  }
}
