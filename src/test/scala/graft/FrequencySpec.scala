package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Frequency

class FrequencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("heavyHitters: exact top-k through an m=4 sketch under planted skew") {
    import spark.implicits._
    // a/b dominate; 100 distinct rare tokens force constant evictions
    // at m=4 — the decrement path runs, yet a and b must survive
    // (count > N/(m+1): N=480, floor 96; a=200, b=150)
    val words = Seq.fill(200)("a") ++ Seq.fill(150)("b") ++
      Seq.fill(30)("c") ++ (1 to 100).map(i => s"rare$i")
    val docs = scala.util.Random.shuffle(words)
      .grouped(10).map(_.mkString(" ")).toSeq
      .toDF("text").repartition(3)
    val out = Frequency.heavyHitters(docs, "text", m = 4, k = 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("a", 200L, 1L), ("b", 150L, 2L)),
      s"got ${out.mkString(",")}")
  }

  test("heavyHitters: shuffles are bounded by candidates, never the domain") {
    import spark.implicits._
    // the scaladoc's scale claim as a plan pin: 3 shuffle exchanges —
    // the candidate distinct (≤ m·|partitions| sketch survivors), the
    // exact recount (partial-aggregated candidate counts), and the
    // 1-row token total behind the `exact` flag. The raw token stream
    // itself NEVER hits an exchange (it flows through the in-partition
    // sketch and a broadcast semi-join); a fourth exchange means
    // someone shuffled the domain.
    val docs = (1 to 200).map(i => s"w${i % 13} w${i % 7}").toDF("text")
    val df = Frequency.heavyHitters(docs, "text", m = 64, k = 5)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val shuffles = "(?<!Broadcast)Exchange \\((\\d+)\\)".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    assert(shuffles.size == 3, s"exchange budget changed:\n$txt")
    // the candidate set and the 1-row total both ride broadcasts
    assert("BroadcastExchange".r.findAllIn(txt).size >= 2,
      s"candidates + total must broadcast:\n$txt")
    // runtime sanity with the new regime flag: ample m → exact=1
    val rows = df.collect()
    assert(rows.forall(_.getAs[Long]("exact") == 1L))
  }

  test("heavyHitters: matches the exact vocabulary top-k when m is ample") {
    import spark.implicits._
    val docs = (1 to 500)
      .map(i => s"tok${i % 37} tok${i % 11} tok${i % 11} filler$i")
      .toDF("text").repartition(7)
    val got = Frequency.heavyHitters(docs, "text", m = 4096, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = docs
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(10)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), (i + 1).toLong) }
      .toSeq
    assert(got == exact)
  }

  test("countMin: overestimate invariant, per-seed mass, bounded sketch") {
    import spark.implicits._
    val docs = (1 to 300).map(i => s"w${i % 23} w${i % 5} u$i")
      .toDF("text").repartition(5)
    val sketch = Frequency.countMinBuild(docs, "text", depth = 4, width = 64)
    val cells = sketch.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // ≤ depth·width cells, seeds exactly 0..3, every counter positive
    assert(cells.size <= 4 * 64)
    assert(cells.keys.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    assert(cells.values.forall(_ > 0))
    // each seed row partitions the full token stream: mass = N per seed
    val n = 300 * 3
    (0L to 3L).foreach { s =>
      assert(cells.collect { case ((`s`, _), c) => c }.sum == n.toLong,
        s"seed $s mass")
    }
    // est >= exact for EVERY distinct token (collisions only add)
    val exact = docs.select(explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val est = Frequency.countMinEstimate(sketch, exact, "tok",
        depth = 4, width = 64).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = exact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ex.keySet == est.keySet)
    ex.foreach { case (t, c) => assert(est(t) >= c, s"underestimate on $t") }
    // a token the corpus never saw still answers (min over its cells)
    val ghost = Frequency.countMinEstimate(sketch,
      Seq("zzz-never-seen").toDF("tok"), "tok", depth = 4, width = 64)
      .collect()
    assert(ghost.length == 1 && ghost(0).getLong(1) >= 0L)
  }

  test("countMin: sketches merge by summing cells (distributive build)") {
    import spark.implicits._
    val a = (1 to 150).map(i => s"w${i % 11} x$i").toDF("text")
    val b = (151 to 300).map(i => s"w${i % 11} x$i").toDF("text")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val whole = cells(Frequency.countMinBuild(a.unionByName(b), "text",
      depth = 4, width = 32))
    val merged = cells(Frequency.countMinMerge(Seq(a, b).map(d =>
      Frequency.countMinBuild(d, "text", depth = 4, width = 32))))
    assert(whole == merged) // cell-for-cell, not just estimate-for-estimate
  }

  test("countMin: build shuffles sketch cells, never the domain") {
    import spark.implicits._
    val docs = (1 to 200).map(i => s"w${i % 13} w${i % 7}").toDF("text")
    val txt = Frequency.countMinBuild(docs, "text", depth = 4, width = 1024)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val shuffles = "(?<!Broadcast)Exchange \\((\\d+)\\)".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    // ONE exchange — the partial-aggregated cell groupBy (≤ depth·width
    // rows per partition); a second means the token stream shuffled
    assert(shuffles.size == 1, s"exchange budget changed:\n$txt")
    assert(txt.contains("partial_count") || txt.contains("Partial"),
      s"cell aggregate must combine map-side:\n$txt")
  }

  test("hll: small domain is exact; sliced sketches merge to the " +
       "monolithic estimate") {
    import spark.implicits._
    val docs = (1 to 60).map(i => (i.toLong, s"tok${i % 7} tok${i % 13}"))
      .toDF("id", "text")
    val elems = docs.select((col("id") % 3).as("part"), explode(
      graft.functions.Text.tokens(lower(col("text")))).as("tok"))
    val mono = Frequency.hllSketch(elems, "tok", Seq.empty, lgK = 12)
      .select(hll_sketch_estimate(col("sketch"))).head().getLong(0)
    val merged = Frequency.hllMergeEstimate(
        Frequency.hllSketch(elems, "tok", Seq("part"), lgK = 12))
      .head().getLong(0)
    val exact = elems.select("tok").distinct().count()
    assert(mono == exact)   // coupon mode: small sets count exactly
    assert(merged == mono)  // union == monolithic, register for register
  }

  test("hll: large open domain — grouping-invariant merge in HLL mode, " +
       "bounded estimator gap, estimate within the 3-sigma bound") {
    import spark.implicits._
    // 50k distinct synthetic keys at lgK=10 (1024 registers) forces
    // real HLL-mode estimation (sigma ~ 3.25%)
    val elems = spark.range(50000)
      .select(concat(lit("key:"), col("id")).as("tok"))
    val monoDirect = Frequency.hllSketch(elems, "tok", Seq.empty, lgK = 10)
      .select(hll_sketch_estimate(col("sketch"))).head().getLong(0)
    // two unrelated slicings must merge to the identical estimate
    val m4 = Frequency.hllMergeEstimate(Frequency.hllSketch(
      elems.withColumn("part", col("tok").substr(5, 10).cast("long") % 4),
      "tok", Seq("part"), lgK = 10)).head().getLong(0)
    val m2 = Frequency.hllMergeEstimate(Frequency.hllSketch(
      elems.withColumn("part", pmod(xxhash64(col("tok")), lit(2))),
      "tok", Seq("part"), lgK = 10)).head().getLong(0)
    assert(m4 == m2, s"grouping changed the merged estimate: $m4 vs $m2")
    // HIP (stream) vs composite (union) estimator: identical registers,
    // different estimator — bounded, not equal
    assert(math.abs(m4 - monoDirect) <= 0.01 * monoDirect,
      s"estimator gap too wide: $m4 vs direct $monoDirect")
    val sigma = 1.04 / math.sqrt(1024.0)
    assert(math.abs(monoDirect - 50000.0) <= 3 * sigma * 50000.0,
      s"estimate $monoDirect outside 3-sigma of 50000")
    assert(math.abs(m4 - 50000.0) <= 3 * sigma * 50000.0,
      s"merged estimate $m4 outside 3-sigma of 50000")
  }

  test("hll: lgK bounds are rejected at the call site") {
    import spark.implicits._
    val df = Seq("a").toDF("tok")
    intercept[IllegalArgumentException] {
      Frequency.hllSketch(df, "tok", Seq.empty, lgK = 3)
    }
    intercept[IllegalArgumentException] {
      Frequency.hllSketch(df, "tok", Seq.empty, lgK = 22)
    }
  }

  test("kmv: exact regime — union under k makes the estimate exact Jaccard") {
    import spark.implicits._
    // two slices of 4 one-shingle docs each, sharing 2 shingles:
    // |A| = |B| = 4, |A ∩ B| = 2, |A ∪ B| = 6 ≤ k=16 → W is the whole
    // union and the estimator degenerates to the true ratio 2/6
    val docs = Seq(
      ("a", "s1"), ("a", "s2"), ("a", "s3"), ("a", "s4"),
      ("b", "s3"), ("b", "s4"), ("b", "s5"), ("b", "s6"))
      .toDF("src", "text")
    val sk = Frequency.kmvSketches(docs, "src", "text", k = 16)
    val out = Frequency.kmvOverlapMatrix(sk, "src", k = 16).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("denom") == 6L && r.getAs[Long]("n_both") == 2L)
    assert(math.abs(r.getAs[Double]("j_est") - 2.0 / 6.0) < 1e-5)
  }

  test("kmv: estimate tracks exact Jaccard on the fixture (±1/√k band)") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val k = 64
    val est = Frequency.kmvOverlapMatrix(
      Frequency.kmvSketches(docs, "source", "text", k), "source", k)
    // exact per-pair Jaccard of the distinct-shingle sets, computed the
    // expensive way the sketch exists to avoid
    val sh = docs.select(col("source"),
        explode(graft.functions.Text.shingles(lower(col("text")), 3)).as("s"))
      .distinct()
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("ninter"))
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val exact = inter
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), (col("ninter").cast("double") /
        (col("na") + col("nb") - col("ninter"))).as("j_exact"))
    val joined = est.join(exact, Seq("src_a", "src_b"), "left")
      .select(col("j_est"), coalesce(col("j_exact"), lit(0.0)).as("j_exact"))
      .collect()
    assert(joined.nonEmpty)
    val errs = joined.map(r => math.abs(
      r.getAs[Double]("j_est") - r.getAs[Double]("j_exact")))
    // k=64 → σ ≈ 0.125; pin mean well under one σ and max under 3σ —
    // measured on the fixture: mean ≈ 0.02-0.05, max ≈ 0.1-0.25
    assert(errs.sum / errs.length <= 0.10,
      s"mean |err| ${errs.sum / errs.length}")
    assert(errs.max <= 0.375, s"max |err| ${errs.max}")
  }

  test("noveltyCurve: hand batches — first-seen attribution, cumulative " +
       "vocabulary, saturation to zero") {
    import spark.implicits._
    // one-shingle docs; batch 0 brings {s1,s2}, batch 1 brings {s2,s3}
    // (s3 novel), batch 2 brings {s1,s3} (nothing novel)
    val docs = Seq(
      (0L, "s1"), (0L, "s2"),
      (1L, "s2"), (1L, "s3"),
      (2L, "s1"), (2L, "s3"))
      .toDF("b", "text")
    val out = Frequency.noveltyCurve(docs, col("b"), "text").collect()
      .map(r => r.getAs[Long]("batch") ->
        ((r.getAs[Long]("n_distinct"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty_frac"), r.getAs[Long]("cum_vocab"))))
      .toMap
    assert(out(0L) == ((2L, 2L, 1.0, 2L)), out.toString)
    assert(out(1L) == ((2L, 1L, 0.5, 3L)), out.toString)
    assert(out(2L) == ((2L, 0L, 0.0, 3L)), out.toString)
  }

  test("kmv: merge == monolithic rebuild, associative, grouping-invariant") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val k = 32
    def sk(df: org.apache.spark.sql.DataFrame) =
      Frequency.kmvSketches(df, "source", "text", k)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("h"))).toSet
    val mono = rows(sk(docs))
    // 2-way slicing merges to the monolithic sketch
    val two = Frequency.kmvMergeSketches(
      sk(docs.filter(col("doc_id") % 2 === 0))
        .unionByName(sk(docs.filter(col("doc_id") % 2 === 1))), "source", k)
    assert(rows(two) == mono)
    // 3-way slicing, merged NESTED, equals the flat merge and the
    // monolithic build — associativity is what makes incremental
    // accumulation exact
    val parts = (0 to 2).map(i => sk(docs.filter(col("doc_id") % 3 === i)))
    val nested = Frequency.kmvMergeSketches(
      Frequency.kmvMergeSketches(parts(0).unionByName(parts(1)), "source", k)
        .unionByName(parts(2)), "source", k)
    val flat = Frequency.kmvMergeSketches(
      parts.reduce(_ unionByName _), "source", k)
    assert(rows(nested) == rows(flat) && rows(flat) == mono)
  }

  test("kmv: bottom-k exchange is WindowGroupLimit-bounded (plan pin)") {
    // multi-partition input (the cluster shape): the rank filter must
    // plan as a Partial WindowGroupLimit so each map task forwards at
    // most k digests per slice — sketch-bounded, never domain-bounded
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
      .repartition(5)
    val plan = Frequency.kmvSketches(docs, "source", "text", k = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    assert(plan.contains("Partial"), plan.take(1200))
  }

  test("pmiCollocations: hand corpus matches the PMI formula exactly, " +
       "minCount prunes, top-k via TakeOrderedAndProject") {
    import spark.implicits._
    // uni: a=3 b=3 c=1 (N_u=7); bi: (a,b)=3 (b,a)=1 (b,c)=1 (N_bi=5)
    val docs = Seq("a b a b", "a b c").toDF("text")
    val out = Frequency.pmiCollocations(docs, "text", minCount = 1L,
      k = 10)
    val rows = out.collect().map(r => (r.getAs[String]("x"),
      r.getAs[String]("y")) -> ((r.getAs[Long]("c_xy"),
      r.getAs[Long]("c_x"), r.getAs[Long]("c_y"),
      r.getAs[Double]("pmi")))).toMap
    // replicate Spark's exact operand order: (cxy/Nb) / ((cx/Nu)·(cy/Nu))
    def pmi(cxy: Double, cx: Double, cy: Double): Double =
      BigDecimal(math.log((cxy / 5.0) / ((cx / 7.0) * (cy / 7.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.keySet == Set(("a", "b"), ("b", "a"), ("b", "c")))
    assert(rows(("a", "b")) == ((3L, 3L, 3L, pmi(3, 3, 3))))
    assert(rows(("b", "a")) == ((1L, 3L, 3L, pmi(1, 3, 3))))
    assert(rows(("b", "c")) == ((1L, 3L, 1L, pmi(1, 3, 1))))
    // (b,a) scores lowest: rarer pair of the same frequent tokens
    assert(rows(("b", "a"))._4 < rows(("a", "b"))._4)
    // minCount 2 keeps only (a,b)
    val pruned = Frequency.pmiCollocations(docs, "text", minCount = 2L,
      k = 10).collect()
    assert(pruned.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")))
    // the global top-k must plan as a take, not a full sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
  }

  test("zipfFit: an exact power law fits slope −1 with r² 1; a " +
       "constant-count group pins the degenerate r² 0") {
    import spark.implicits._
    // zipf: counts 24/r at ranks 1..4 → ln c = ln 24 − 1·ln r
    val zipf = ("a " * 24 + "b " * 12 + "c " * 8 + "d " * 6).trim
    // flat: every token count 3 → zero count variance
    val flat = ("x " * 3 + "y " * 3 + "z " * 3).trim
    val docs = Seq(("z1", zipf), ("f1", flat)).toDF("source", "text")
    val out = Frequency.zipfFit(docs, "source", "text", topR = 10)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("z1").getAs[Long]("n_terms") == 4L)
    assert(out("z1").getAs[Double]("slope") == -1.0)
    assert(out("z1").getAs[Double]("r2") == 1.0)
    assert(math.abs(out("z1").getAs[Double]("intercept") -
      math.log(24.0)) < 1e-6)
    assert(out("f1").getAs[Double]("slope") == 0.0)
    assert(out("f1").getAs[Double]("r2") == 0.0)
  }
}
