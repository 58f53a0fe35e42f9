package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hashSample: deterministic, repartition-invariant, rate ballpark") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val a = Sampling.hashSample(docs, col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.15 && rate < 0.35, s"rate $rate far from 0.25")
  }

  test("rate 0 and 1 edge cases") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    assert(Sampling.hashSample(docs, col("text"), 0.0).count() == 0)
    assert(Sampling.hashSample(docs, col("text"), 1.0).count() == docs.count())
  }

  test("stratified: per-stratum rates apply; sample nests in larger sample") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val s = Sampling.stratifiedHashSample(docs, col("text"), col("lang"),
      Map("en" -> 0.125), defaultRate = 0.5)
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en").toDouble / total("en") < 0.3)
    assert(byLang.filterNot(_._1 == "en").map(_._2).sum.toDouble /
      total.filterNot(_._1 == "en").map(_._2).sum > 0.3)
    // prefix buckets nest: the 12.5% sample is a subset of the 50% one
    val small = Sampling.hashSample(docs, col("text"), 0.125)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(docs, col("text"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("temperatureMixture: flattens the group distribution, never shuffles the corpus") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"))
    val mixed = Sampling.temperatureMixture(docs, "doc_id", "lang",
      alpha = 0.5, targetFrac = 0.5)
    // deterministic: identical survivor set on re-run
    val ids = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Sampling.temperatureMixture(docs, "doc_id", "lang", 0.5, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(ids.nonEmpty && ids.size < docs.count())
    // flattening: every group's realized sampling rate is within the
    // hash-coin tolerance of its analytic rate, and rarer groups get
    // strictly higher rates than dominant ones
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = before.values.sum.toDouble
    val wsum = before.values.map(c => math.sqrt(c / n)).sum
    val after = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (g, c) =>
      val rate = math.min(1.0, 0.5 * (math.sqrt(c / n) / wsum) / (c / n))
      val got = after.getOrElse(g, 0L).toDouble / c
      // binomial tolerance: 4 sigma + granularity slack on small groups
      val tol = 4 * math.sqrt(rate * (1 - rate) / c) + 0.02
      assert(math.abs(got - rate) <= tol, s"$g: got $got want $rate ± $tol")
    }
    val rateOf = before.map { case (g, c) =>
      g -> math.min(1.0, 0.5 * (math.sqrt(c / n) / wsum) / (c / n)) }
    val (rare, _) = before.minBy(_._2); val (dom, _) = before.maxBy(_._2)
    assert(rateOf(rare) > rateOf(dom), s"$rateOf")
    // scale contract: the corpus side of the plan has NO exchange — the
    // only exchanges belong to the |groups|-row rate aggregate, and the
    // rates come back via a broadcast join
    val plan = mixed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }

  test("repetitionUpsample: expected blow-up, contiguous copy indices, deterministic") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"))
    val up = Sampling.repetitionUpsample(docs, "doc_id", "lang",
      alpha = 0.5, targetFactor = 1.5)
    val rows = up.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("rep_idx")))
    // deterministic
    assert(rows.sortBy(r => (r._1, r._3)).toSeq ==
      Sampling.repetitionUpsample(docs, "doc_id", "lang", 0.5, 1.5).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
          r.getAs[Long]("rep_idx"))).sortBy(r => (r._1, r._3)).toSeq)
    // total row count ≈ targetFactor × corpus (coin variance bounded)
    val n = docs.count().toDouble
    assert(math.abs(rows.length - 1.5 * n) < 0.15 * n, s"${rows.length} vs ${1.5 * n}")
    // per doc: rep_idx is exactly 0..k-1
    rows.groupBy(_._1).foreach { case (id, cs) =>
      assert(cs.map(_._3).sorted.toSeq == (0L until cs.length).toSeq, s"doc $id")
    }
    // flattening upsamples the rarest group harder than the dominant one
    val perLangFactor = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (rare, _) = before.minBy(_._2); val (dom, _) = before.maxBy(_._2)
    assert(perLangFactor(rare).toDouble / before(rare) >
      perLangFactor(dom).toDouble / before(dom))
  }

  test("repetitionUpsample → epochShuffle → pack composes: copies land apart") {
    // the scaladoc-advertised composition (epoch-shuffle on id + rep_idx
    // so repeated copies don't sit adjacent in training order) must
    // actually run END TO END — through the pack stage, not just the
    // shuffle — and separate copies: the q78 lesson, applied here
    val docs = Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val up = Sampling.repetitionUpsample(docs, "doc_id", "lang",
        alpha = 0.5, targetFactor = 2.0)
      .withColumn("copy_key", concat_ws("#",
        col("doc_id").cast("string"), col("rep_idx").cast("string")))
    val shuffledDf = graft.operators.Packing.epochShuffle(up, "copy_key",
      seed = 7L, numShards = 8)
    val shuffled = shuffledDf
      .select("doc_id", "rep_idx", "epoch_key", "epoch_shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // every copy gets a distinct position key
    assert(shuffled.map(_._3).distinct.length == shuffled.length)
    // copies of the same doc do not all share a shard: for docs with
    // >= 2 copies, at least one lands in a different shard somewhere
    // (md5 over the composite key decorrelates copies)
    val multi = shuffled.groupBy(_._1).filter(_._2.length >= 2)
    assert(multi.nonEmpty)
    assert(multi.exists { case (_, cs) => cs.map(_._4).distinct.length > 1 },
      "all copies of every doc landed in the same shard")
    // pack stage: the shuffled copies feed packGreedyNoSplit on the
    // md5 epoch_key (string id) — one row per copy, budget respected,
    // and copies of a multi-copy doc end up in distinct chunks
    val budget = 256
    val packed = graft.operators.Packing.packGreedyNoSplit(
        shuffledDf, "epoch_key", "text", "epoch_shard", budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.length == shuffled.length,
      "pack must emit exactly one row per shuffled copy")
    val chunkTotals = packed.groupBy(p => (p._2, p._4)).values
    assert(chunkTotals.forall(c => c.map(_._3).sum <= budget || c.size == 1),
      "chunk over budget with more than one doc")
    val keyToDoc = shuffled.map(c => c._3 -> c._1).toMap
    val docChunks = packed.groupBy(p => keyToDoc(p._1))
    assert(docChunks.filter(_._2.length >= 2).exists { case (_, cs) =>
      cs.map(c => (c._2, c._4)).distinct.length > 1
    }, "no multi-copy doc was split across chunks by the epoch shuffle")
  }

  test("assignSplit: integer-grid thresholds, md5 recompute, stability") {
    import spark.implicits._
    val ids = (1L to 4000L).toDF("id")
    val out = Sampling.assignSplit(ids, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent JVM recompute of the coin and the integer cuts
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def splitOf(id: Long): String = {
      val hex = mdig.digest(s"$id:split".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val v = java.lang.Integer.parseInt(hex, 16)
      if (v < 13421773) "train" else if (v < 15099494) "val" else "test"
    }
    for (id <- 1L to 4000L)
      assert(out(id) == splitOf(id), s"split mismatch for id $id")
    // ballpark proportions
    val frac = out.values.count(_ == "train").toDouble / out.size
    assert(frac > 0.77 && frac < 0.83, s"train fraction $frac")
    // growth stability: adding rows never reassigns an existing id
    val grown = Sampling.assignSplit((1L to 8000L).toDF("id"), col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 4000L).forall(id => grown(id) == out(id)))
    // malformed weights rejected
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids, col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("weightedSampleTopK: k per group, deterministic, weight-dominant") {
    import spark.implicits._
    // 50 groups × (1 heavy w=1e9 + 9 light w=1). The A-ES key u^(1/w)
    // makes this DETERMINISTIC, not just likely: the heavy key is at
    // least (3e-8)^(1e-9) ≈ 1 − 1.7e-8 (the coin's smallest u is
    // 0.5/2^24), while a light key is at most (2^24 − 0.5)/2^24 ≈
    // 1 − 3e-8 < it — so the heavy row wins rank 1 in EVERY group, for
    // any salt.
    val rows = for (g <- 0 until 50; i <- 0 until 10) yield
      (g.toLong * 100 + i, s"g$g", if (i == 0) 1e9 else 1.0)
    val df = rows.toDF("id", "grp", "w").repartition(7)
    val out = Sampling.weightedSampleTopK(df, "id", "grp", col("w"), k = 3)
    val got = out.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSeq
    // exactly k rows per group, ranks 1..k, no id repeats (no replacement)
    assert(got.length == 150)
    got.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._3).sorted == Seq(1L, 2L, 3L), s"ranks in $g")
      assert(rs.map(_._2).distinct.length == 3, s"replacement in $g")
    }
    // heavy row is rank 1 in every group
    got.filter(_._3 == 1L).foreach { case (g, id, _) =>
      assert(id % 100 == 0, s"group $g rank-1 was light row $id")
    }
    // byte-identical on re-run (deterministic coin)
    val again = Sampling.weightedSampleTopK(df, "id", "grp", col("w"), k = 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSeq
    assert(got.sorted == again.sorted)
    // non-positive / null weights are excluded, not NaN-sorted
    val bad = (Seq((900L, "gx", 0.0), (901L, "gx", -2.0)).toDF("id", "grp", "w")
      unionByName Seq((902L, "gx", 5.0)).toDF("id", "grp", "w"))
    val kept = Sampling.weightedSampleTopK(bad, "id", "grp", col("w"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(902L))
  }

  test("weightedSampleTopK: per-group top-k is map-side limited") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 5}", i.toDouble))
      .toDF("id", "grp", "w")
    val plan = Sampling.weightedSampleTopK(df, "id", "grp", col("w"), k = 4)
      .queryExecution.executedPlan.toString
    // rank<=k must plan as WindowGroupLimit so each partition forwards
    // ≤ k rows per group into the single ranking exchange
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("exactStratifiedTake: exact global count at adversarial fracs, " +
       "partitioning-invariant selection") {
    import spark.implicits._
    // strata sizes chosen so floors alone UNDERSHOOT (remainder seats
    // must be handed out): 7, 13, 23, 57 at frac=0.3 → floors 2+3+6+17
    // = 28, target round(0.3·100) = 30 → 2 remainder seats
    val rows = (0 until 7).map(i => (i.toLong, "a")) ++
      (100 until 113).map(i => (i.toLong, "b")) ++
      (200 until 223).map(i => (i.toLong, "c")) ++
      (300 until 357).map(i => (i.toLong, "d"))
    val df = rows.toDF("id", "s")
    val got = Sampling.exactStratifiedTake(df, "id", "s", frac = 0.3)
    assert(got.count() == 30L) // the exact-count contract
    // per-stratum counts: floor + at most one remainder seat
    val per = got.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per.values.sum == 30L)
    assert(per("a") >= 2 && per("a") <= 3)
    assert(per("d") >= 17 && per("d") <= 18)
    // selection is content-stable: repartitioning must not change WHICH
    // rows are selected
    val ids = got.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.exactStratifiedTake(df.repartition(13), "id", "s",
      frac = 0.3).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
  }

  test("exactStratifiedTake: NULL strata form their own stratum — " +
       "the exact global count holds with missing labels") {
    import spark.implicits._
    // 40 labeled + 20 null-stratum rows at frac=0.3 → target 18 TOTAL;
    // an equality quota join would silently drop all 20 null rows and
    // deliver only the labeled strata's seats
    val rows = (0 until 40).map(i => (i.toLong, Some(s"g${i % 2}"))) ++
      (100 until 120).map(i => (i.toLong, Option.empty[String]))
    val df = rows.toDF("id", "s")
    val got = Sampling.exactStratifiedTake(df, "id", "s", frac = 0.3)
    assert(got.count() == 18L)
    val nullTaken = got.filter(col("s").isNull).count()
    assert(nullTaken == 6L, s"null stratum took $nullTaken of its quota 6")
  }

  test("thresholdStratifiedTake: counts track the exact variant's quotas; " +
       "no corpus-grain rank window in the plan") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val frac = 0.1
    val exact = Sampling.exactStratifiedTake(docs, "doc_id", "lang", frac)
    val quotas = exact.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sampling.thresholdStratifiedTake(docs, "doc_id", "lang", frac)
    val counts = approx.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // count-error contract quantified on the harness corpus: with the
    // default sketch accuracy (10k ≥ n_g, so the sketch is exact here)
    // the residual error is grid rounding (≤ n_g/1000) + coin ties —
    // per stratum that is ≤ 1 row at this scale, and both directions
    // stay within 10% + 1 of the quota
    for ((lang, q) <- quotas) {
      val c = counts.getOrElse(lang, 0L)
      assert(math.abs(c - q) <= math.max(1L, (0.1 * q).toLong),
        s"stratum $lang: took $c vs quota $q")
    }
    val globalErr = math.abs(counts.values.sum - quotas.values.sum).toDouble /
      quotas.values.sum
    assert(globalErr <= 0.05, s"global count error $globalErr")
    // content-stable: repartitioning must not change WHICH rows are taken
    val ids = approx.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.thresholdStratifiedTake(docs.repartition(13),
      "doc_id", "lang", frac).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == ids2)
    // the scale contract: the ONLY row_number in the plan is the
    // |groups|-row quota ranking — the corpus goes through an aggregate
    // + broadcast join + filter, never a per-stratum ranking sort
    // (compare: the exact variant ranks the corpus, so it has two)
    val plan = approx.queryExecution.executedPlan.toString
    assert("row_number".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(plan.contains("percentile_approx"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val exactPlan = exact.queryExecution.executedPlan.toString
    assert("row_number".r.findAllIn(exactPlan).size == 2, exactPlan.take(2000))
  }

  test("strideInterleave: stride guarantee — every prefix realizes the " +
       "mixture within one doc per source; ranks advance in order") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val head = 120
    val sched = graft.operators.Packing
      .strideInterleave(docs, "lang", alpha = 0.5, head = head)
      .orderBy("pos").collect()
    assert(sched.length == head)
    assert(sched.map(_.getAs[Long]("pos")).toSeq == (1L to head).toSeq)
    // per-source ranks are 1,2,3,... in emission order, and r <= pos
    sched.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val rs = rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("r"))
      assert(rs.toSeq == (1L to rs.length).toSeq)
    }
    sched.foreach(r => assert(r.getAs[Long]("r") <= r.getAs[Long]("pos")))
    // stride guarantee: in every prefix, each source's count deviates
    // from its ideal share p·w_s/Σw by less than 1 + (|S|-1)·w_s/Σw —
    // the weighted-round-robin bound (each OTHER source contributes
    // < 1 boundary doc, scaled by s's share; sources never exhaust at
    // this head on the fixture)
    val w = sched.map(r => r.getAs[String]("lang") ->
      r.getAs[Double]("w_raw")).toMap
    val tw = w.values.sum
    for (p <- 1 to head; lang <- w.keys) {
      val got = sched.take(p).count(_.getAs[String]("lang") == lang)
      val ideal = p * w(lang) / tw
      val bound = 1.0 + (w.size - 1) * w(lang) / tw
      assert(math.abs(got - ideal) < bound + 1e-9,
        s"prefix $p lang $lang: got $got ideal $ideal bound $bound")
    }
  }

  test("inverseCdfDraws: every draw lands exactly one token, the " +
       "bucketized join equals the naive interval scan, frequencies " +
       "track the weights") {
    import spark.implicits._
    val vocab = Seq(("heavy", 6.0), ("mid", 3.0), ("light", 1.0))
      .toDF("token", "w")
    val draws = Sampling.inverseCdfDraws(vocab, "token", "w",
      n = 2000, salt = ":t", buckets = 8).collect()
    assert(draws.length == 2000, "each draw must land exactly one token")
    assert(draws.map(_.getLong(0)).toSet == (1L to 2000L).toSet)
    val byTok = draws.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // expected shares 0.6 / 0.3 / 0.1; 2000 draws → ±4σ ≈ ±44..88
    assert(math.abs(byTok("heavy") - 1200) < 90, byTok.toString)
    assert(math.abs(byTok("mid") - 600) < 90, byTok.toString)
    assert(math.abs(byTok("light") - 200) < 60, byTok.toString)
    // bucketization is pure routing: a 1-bucket run (the naive layout)
    // draws the identical sequence
    val naive = Sampling.inverseCdfDraws(vocab, "token", "w",
        n = 2000, salt = ":t", buckets = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    draws.foreach(r => assert(naive(r.getLong(0)) == r.getString(1)))
    // vocabulary partitioning cannot change the layout
    val re = Sampling.inverseCdfDraws(vocab.repartition(5), "token", "w",
        n = 50, salt = ":t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    re.foreach { case (i, t) => assert(naive(i) == t) }
  }

  test("strideInterleave: schedule is generated from the count rollup — " +
       "one corpus aggregate, bounded merge input") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val sched = graft.operators.Packing
      .strideInterleave(docs, "lang", alpha = 0.5, head = 50)
    val plan = sched.queryExecution.executedPlan.toString
    // the merge window consumes the exploded count rollup (an
    // aggregate sits below the window), never the corpus rows
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx, plan.take(2000))
    // truncation: a 3-source skew case caps per-source ranks at head
    import spark.implicits._
    val skew = (Seq.fill(40)("big") ++ Seq.fill(2)("tiny"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    val s2 = graft.operators.Packing.strideInterleave(skew, "g", 0.5, 10)
      .collect()
    assert(s2.length == 10)
    assert(s2.count(_.getAs[String]("g") == "tiny") <= 2)
  }

  test("lengthBucketedBatches: batches respect bucket/size bounds, " +
       "coin order is partitioning-invariant, and bucketed padding " +
       "waste undercuts a length-oblivious baseline") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val b = graft.operators.Packing.lengthBucketedBatches(
      docs, "doc_id", "text", bucketWidth = 32, batchSize = 8)
    val rows = b.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tok"), r.getAs[Long]("bucket"),
      r.getAs[Long]("batch_id"), r.getAs[Long]("rn")))
    // every doc's bucket is its length band; batches hold <= 8 docs
    rows.foreach { case (_, n, bkt, _, _) => assert(bkt == n / 32) }
    val perBatch = rows.groupBy(t => (t._3, t._4))
    perBatch.values.foreach(g => assert(g.length <= 8))
    // within a batch, lengths span < 2 bucket widths by construction
    perBatch.values.foreach { g =>
      val ns = g.map(_._2)
      assert(ns.max - ns.min < 32)
    }
    // partitioning-invariant: same assignment on a repartitioned corpus
    val re = graft.operators.Packing.lengthBucketedBatches(
        docs.repartition(7), "doc_id", "text", 32, 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("batch_id"))).toMap
    rows.foreach { case (id, _, bkt, bid, _) => assert(re(id) == (bkt, bid)) }
    // the point of the operator: padding waste strictly below the
    // length-oblivious baseline (same coin order, no length grouping)
    def waste(groups: Iterable[Iterable[Long]]): Long =
      groups.map(g => g.size.toLong * g.max - g.sum).sum
    val bucketedWaste = waste(perBatch.values.map(_.map(_._2)))
    val obliviousOrder = rows.sortBy { case (id, _, _, _, _) =>
      // same md5 coin, global order (no bucket partition)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + ":lb").getBytes("UTF-8"))
      (((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff), id)
    }
    val obliviousWaste = waste(
      obliviousOrder.map(_._2).grouped(8).map(_.toSeq).toSeq)
    assert(bucketedWaste < obliviousWaste,
      s"bucketed $bucketedWaste vs oblivious $obliviousWaste")
  }

  test("mixtureByWeights: rate arithmetic, clamp, determinism, " +
       "partitioning invariance") {
    import spark.implicits._
    // group a: 400 rows, b: 100 rows; equal target weights 0.5/0.5 at
    // targetFrac 0.5 → rate_a = 0.5*0.5/0.8 = 0.3125, rate_b clamps at 1
    val docs = (1 to 500).map(i =>
      (i.toLong, if (i <= 400) "a" else "b")).toDF("doc_id", "grp")
    val w = Seq(("a", 0.5), ("b", 0.5)).toDF("grp", "weight")
    val got = Sampling.mixtureByWeights(docs, "doc_id", "grp",
      w, "weight", targetFrac = 0.5)
    val byG = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("b") == 100L, "rate above 1 clamps — the whole group survives")
    assert(byG("a") > 80 && byG("a") < 170,
      s"group a should keep ~31%, got ${byG("a")}")
    // deterministic and layout-invariant: same survivor set on a
    // different partitioning
    val again = Sampling.mixtureByWeights(docs.repartition(13), "doc_id",
        "grp", w, "weight", targetFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("doc_id").collect().map(_.getLong(0)).toSet)
    // weight-monotone: doubling a group's weight can only grow its kept set
    val w2 = Seq(("a", 1.0), ("b", 0.5)).toDF("grp", "weight")
    val grown = Sampling.mixtureByWeights(docs, "doc_id", "grp",
        w2, "weight", targetFrac = 0.5)
      .filter(col("grp") === "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = got.filter(col("grp") === "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base.subsetOf(grown) && grown.size > base.size,
      "higher weight ⇒ superset at a higher rate (same coin, higher bar)")
  }

  test("mixtureByWeights: absent or NULL weight means zero mass, " +
       "never silent rate 1") {
    import spark.implicits._
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i <= 50) "a" else "b")).toDF("doc_id", "grp")
    // b missing from the table entirely: its group samples at rate 0
    val partial = Seq(("a", 1.0)).toDF("grp", "weight")
    val kept = Sampling.mixtureByWeights(docs, "doc_id", "grp",
      partial, "weight", targetFrac = 0.5)
    assert(kept.filter(col("grp") === "b").count() == 0,
      "absent group must contribute zero rows")
    assert(kept.filter(col("grp") === "a").count() == 50,
      "rate 0.5*1.0/0.5 = 1 keeps all of a")
    // NULL weight: same zero-mass contract (least() would skip the null
    // and silently keep the whole group at rate 1 — the guarded trap)
    val withNull = Seq(("a", Some(1.0)), ("b", Option.empty[Double]))
      .toDF("grp", "weight")
    val kept2 = Sampling.mixtureByWeights(docs, "doc_id", "grp",
      withNull, "weight", targetFrac = 0.5)
    assert(kept2.filter(col("grp") === "b").count() == 0,
      "NULL weight must contribute zero rows, not rate 1")
  }

  test("mixtureByWeights: duplicate weight rows collapse to one per " +
       "group — no join fan-out duplicating docs") {
    import spark.implicits._
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i <= 50) "a" else "b")).toDF("doc_id", "grp")
    // a's weight listed THREE times (plus a NULL): the join must see one
    // row per group — the pre-fix behavior emitted each kept doc of `a`
    // three times
    val dup = Seq(("a", Some(1.0)), ("a", Some(1.0)), ("a", Option.empty[Double]),
      ("a", Some(0.25)), ("b", Some(1.0))).toDF("grp", "weight")
    val kept = Sampling.mixtureByWeights(docs, "doc_id", "grp",
      dup, "weight", targetFrac = 0.5)
    val ids = kept.select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      "every kept doc must appear exactly once")
    // max-collapse semantics: the unique-table run with weight max(1.0,
    // 0.25)=1.0 per group is the same survivor set
    val uniq = Seq(("a", 1.0), ("b", 1.0)).toDF("grp", "weight")
    val ref = Sampling.mixtureByWeights(docs, "doc_id", "grp",
      uniq, "weight", targetFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.toSet == ref)
  }

  test("bucketBoundaryPlan: exact accounting, B=1 degenerates to " +
       "pad-to-max, waste shrinks with B, heuristic vs DP gap bounded") {
    import graft.operators.Packing
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    def plan(b: Int) = Packing.bucketBoundaryPlan(docs, "text", b).collect()
    def waste(b: Int) = plan(b).map(_.getAs[Long]("waste")).sum

    // B=1: one bucket covering the whole range, padded to global max
    val p1 = plan(1)
    assert(p1.length == 1)
    val lens = docs.select(size(split(col("text"), " ")).as("n")).collect()
      .map(_.getInt(0).toLong)
    assert(p1.head.getAs[Long]("len_hi") == lens.max)
    assert(p1.head.getAs[Long]("n_docs") == lens.length.toLong)
    assert(p1.head.getAs[Long]("waste") == lens.map(lens.max - _).sum)

    // every doc is accounted exactly once at any B
    assert(plan(8).map(_.getAs[Long]("n_docs")).sum == lens.length.toLong)

    // more buckets never pay more padding (measured on the fixture:
    // equal-count cuts are not nested across B, so this is pinned, not
    // proven — a generator change that breaks it is worth noticing)
    val w1 = waste(1); val w4 = waste(4); val w8 = waste(8)
    assert(w4 <= w1 && w8 <= w4, s"waste not shrinking: $w1, $w4, $w8")

    // true O(D²·B) segmentation DP at histogram grain: the optimal
    // boundary set can only beat the equal-count heuristic; quantify
    // the gap (heuristic within 2x of optimal on the fixture)
    val hist = lens.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1) // (len, cnt) ascending
    val d = hist.length
    def segWaste(i: Int, j: Int): Long = { // buckets hist[i..j], pad to hist(j)
      val hi = hist(j)._1
      (i to j).map { t => (hi - hist(t)._1) * hist(t)._2 }.sum
    }
    val big = Long.MaxValue / 4
    var prev = Array.tabulate(d)(j => segWaste(0, j)) // B=1
    var best = prev(d - 1)
    for (_ <- 2 to 8) {
      val nxt = Array.tabulate(d) { j =>
        (0 until j).foldLeft(segWaste(0, j)) { (acc, cut) =>
          math.min(acc, if (prev(cut) == big) big
                        else prev(cut) + segWaste(cut + 1, j))
        }
      }
      prev = nxt
      best = math.min(best, prev(d - 1))
    }
    assert(best <= w8, "DP optimum cannot lose to the heuristic")
    assert(w8 <= 2 * math.max(best, 1L),
      s"equal-count heuristic $w8 vs DP optimum $best — gap beyond 2x")
  }

  test("truncationPolicyAudit: hand histogram — exact forfeiture per " +
       "policy, min-tail rule spares whole short docs") {
    import spark.implicits._
    import graft.operators.Packing
    // lengths: 3 (under), 10 (over, tail 2 < 8/4=2? no: 2*4=8 !< 8 →
    // tail KEPT), 17 (over, tail 1, 1*4 < 8 → tail dropped), 16
    // (over, tail 0 → clean split)
    val docs = Seq(3, 10, 17, 16).map(n =>
      Tuple1((1 to n).map(i => s"t$i").mkString(" "))).toDF("text")
    val out = Packing.truncationPolicyAudit(docs, "text", Seq(8))
      .collect().map(r => r.getAs[String]("policy") ->
        ((r.getAs[Long]("n_docs_affected"), r.getAs[Long]("tokens_total"),
          r.getAs[Long]("tokens_lost")))).toMap
    // totals: 3+10+17+16 = 46
    assert(out("truncate") == ((3L, 46L, (10 - 8) + (17 - 8) + (16 - 8))),
      out.toString) // 2+9+8 = 19
    assert(out("drop") == ((3L, 46L, 10L + 17L + 16L)), out.toString)
    // split: doc 10 tail 2 (2*4=8, NOT < 8 → kept); doc 17 tail 1
    // (dropped); doc 16 tail 0; doc 3 is a whole short doc (kept)
    assert(out("split") == ((1L, 46L, 1L)), out.toString)
  }

  test("vocabCoverage: hand corpus — rates per slice, V cuts " +
       "deterministically on (count desc, token asc)") {
    import spark.implicits._
    import graft.operators.Frequency
    // counts: a=4, b=3, c=2, d=1, e=1 → V=3 vocab = {a, b, c}
    val docs = Seq(
      ("g1", "a a b c"),   // 4 tokens, 0 oov
      ("g1", "a b d"),     // d oov → 1/3
      ("g2", "a b c e"))   // e oov → 1/4
      .toDF("grp", "text")
    val out = Frequency.vocabCoverage(docs, "text", "grp", vocabSize = 3)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_frac")))).toMap
    assert(out("g1") == ((7L, 1L, 0.142857)), out.toString)
    assert(out("g2") == ((4L, 1L, 0.25)), out.toString)
    // tie at cnt=1 (d vs e): V=4 must take 'd' (token asc), so g1's
    // oov vanishes while g2 keeps one
    val out4 = Frequency.vocabCoverage(docs, "text", "grp", vocabSize = 4)
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Long]("n_oov")).toMap
    assert(out4 == Map("g1" -> 0L, "g2" -> 1L), out4.toString)
  }

  test("reservoirMergeTopK: incremental accumulation equals the " +
       "monolithic A-ES sample exactly, in any batch order") {
    import spark.implicits._
    val docs = Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(lower(col("text")), " ")).cast("double").as("w"))
    val mono = Sampling.weightedSampleTopK(docs, "doc_id", "lang",
        col("w"), k = 10)
      .select("doc_id", "lang", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // two-batch fold (parity split)
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 =!= 0)
    val s0 = Sampling.weightedSampleTopK(b0, "doc_id", "lang", col("w"), 10)
    val s1 = Sampling.reservoirMergeTopK(s0, b1, "doc_id", "lang", "w", 10)
      .select("doc_id", "lang", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(s1 == mono, "fold(parity) must equal monolithic")
    // reversed batch order gives the same reservoir (commutative fold)
    val t0 = Sampling.weightedSampleTopK(b1, "doc_id", "lang", col("w"), 10)
    val t1 = Sampling.reservoirMergeTopK(t0, b0, "doc_id", "lang", "w", 10)
      .select("doc_id", "lang", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(t1 == mono, "fold order must not matter")
    // three-way refold through an intermediate store (associative)
    val c0 = docs.filter(col("doc_id") % 3 === 0)
    val c1 = docs.filter(col("doc_id") % 3 === 1)
    val c2 = docs.filter(col("doc_id") % 3 === 2)
    val u0 = Sampling.weightedSampleTopK(c0, "doc_id", "lang", col("w"), 10)
    val u1 = Sampling.reservoirMergeTopK(u0, c1, "doc_id", "lang", "w", 10)
    val u2 = Sampling.reservoirMergeTopK(u1, c2, "doc_id", "lang", "w", 10)
      .select("doc_id", "lang", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(u2 == mono, "three-batch chain must equal monolithic")
  }

  test("contrastiveSpanPairs: offsets replay the md5 coins, spans are " +
       "in-bounds, non-overlapping, exact slices; short docs dropped") {
    import spark.implicits._
    import graft.operators.Corpus
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val L = 20
    val out = Corpus.contrastiveSpanPairs(docs, "doc_id", "text", L)
      .collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val longEnough = texts.filter(_._2.split(" ", -1).length >= 2 * L)
    assert(out.length == longEnough.size, "exactly the n ≥ 2L docs")
    def coin(id: Long, salt: String): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v = java.lang.Long.parseLong(h.take(6), 16)
      (v + 0.5) / 16777216.0
    }
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = texts(id).toLowerCase.split(" ", -1)
      val n = toks.length.toLong
      val a = r.getAs[Long]("a_start"); val p = r.getAs[Long]("p_start")
      assert(a == math.floor(coin(id, ":spanA") * (n - 2 * L + 1)).toLong)
      assert(p == a + L +
        math.floor(coin(id, ":spanB") * (n - 2 * L - a + 1)).toLong)
      assert(a >= 0 && p >= a + L && p + L <= n, s"doc $id bounds")
      assert(r.getAs[String]("anchor") ==
        toks.slice(a.toInt, a.toInt + L).mkString(" "))
      assert(r.getAs[String]("positive") ==
        toks.slice(p.toInt, p.toInt + L).mkString(" "))
    }
  }

  test("mixtureEss: identity mixture scores ESS 1.0, skew degrades by " +
       "the chi-square identity, renormalization and missing-group " +
       "hygiene hold") {
    import spark.implicits._
    val docs = (Seq.fill(4)(("a", 100)) ++ Seq.fill(2)(("b", 50)) ++
        Seq.fill(2)(("c", 250)))
      .zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
      .toDF("id", "grp", "n_tok")
    // masses: a 400, b 100, c 500, N = 1000
    // identity card w = p (fed UNnormalized as the raw masses —
    // renormalization hygiene): every ratio 1, ESS = N exactly
    val idCard = Seq(("a", 400.0), ("b", 100.0), ("c", 500.0))
      .toDF("grp", "w")
    val idRows = Sampling.mixtureEss(docs, "grp", col("n_tok"),
      idCard, "w").collect()
    assert(idRows.forall(_.getAs[Double]("is_ratio") == 1.0))
    assert(idRows.forall(_.getAs[Double]("ess_frac") == 1.0))
    assert(idRows.forall(_.getAs[Double]("ess_tokens") == 1000.0))
    // skewed card w = (0.5, 0.3, 0.2) vs p = (0.4, 0.1, 0.5):
    // chi2 + 1 = sum_g w_g^2/p_g = 0.25/0.4 + 0.09/0.1 + 0.04/0.5
    //          = 0.625 + 0.9 + 0.08 = 1.605 → ess_frac = 1/1.605
    val skew = Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)).toDF("grp", "w")
    val sk = Sampling.mixtureEss(docs, "grp", col("n_tok"), skew, "w")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(math.abs(sk("a").getAs[Double]("ess_frac") - 1.0 / 1.605)
      < 1e-6)
    assert(sk("b").getAs[Double]("is_ratio") == 3.0,
      "b's 10% of mass must carry 30% of the mixture: 3 implied epochs")
    assert(sk("a").getAs[Double]("p_frac") == 0.4 &&
      sk("a").getAs[Double]("w_target") == 0.5)
    // a group missing from the card carries mixture mass 0 (ratio 0),
    // and the card renormalizes over what remains
    val partial = Seq(("a", 0.5), ("c", 0.5)).toDF("grp", "w")
    val pt = Sampling.mixtureEss(docs, "grp", col("n_tok"), partial, "w")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(pt("b").getAs[Double]("is_ratio") == 0.0 &&
      pt("b").getAs[Double]("w_target") == 0.0)
    assert(pt("a").getAs[Double]("w_target") == 0.5)
    // duplicate card rows collapse by max before the join (the
    // mixtureByWeights grain rule)
    val dup = Seq(("a", 0.5), ("a", 0.2), ("b", 0.3), ("c", 0.2))
      .toDF("grp", "w")
    val dp = Sampling.mixtureEss(docs, "grp", col("n_tok"), dup, "w")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(dp("a").getAs[Double]("w_target") == 0.5)
    // a ZERO-MASS group must not poison the card with 0*Inf = NaN
    // (r20 review): ratio NULL; positive target weight on it pins
    // ESS to the honest unsamplable limit 0, zero weight leaves the
    // rest of the card intact
    val withEmpty = docs.unionByName(
      Seq((99L, "z", 0)).toDF("id", "grp", "n_tok"))
    val bad = Sampling.mixtureEss(withEmpty, "grp", col("n_tok"),
        Seq(("a", 0.4), ("b", 0.1), ("c", 0.4), ("z", 0.1))
          .toDF("grp", "w"), "w")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(bad("z").isNullAt(bad("z").fieldIndex("is_ratio")))
    assert(bad("a").getAs[Double]("ess_frac") == 0.0 &&
      bad("z").getAs[Double]("ess_tokens") == 0.0,
      "positive weight on a zero-mass group = unsamplable, ESS 0")
    val ok = Sampling.mixtureEss(withEmpty, "grp", col("n_tok"),
        Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)).toDF("grp", "w"), "w")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(ok("z").isNullAt(ok("z").fieldIndex("is_ratio")))
    assert(math.abs(ok("a").getAs[Double]("ess_frac") - 1.0 / 1.605)
      < 1e-6, "a weightless zero-mass group must not perturb the ESS")
  }
}
