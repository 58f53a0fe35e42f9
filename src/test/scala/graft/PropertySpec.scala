package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Clean, Text}
import graft.operators.Dedup

/** Property-based checks (SURVEY §5 test plan): invariants over
  * ScalaCheck-generated inputs, evaluated in one batch through the real
  * Spark expressions.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, rng.Seed(42L + i)))
  }

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val sentence: Gen[String] = Gen.choose(1, 30)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("mergeable eval states: aucFromState and riskCoverageFromState " +
       "of randomly-partitioned shard states equal the monolithic form") {
    // the merge-identity citizenship (q251/q252): for ANY partition of
    // the rows into shards, folding per-shard sufficient statistics by
    // addition and evaluating equals evaluating the whole — exactly
    val rowGen = for {
      s <- Gen.choose(0, 25).map(_ / 25.0) // coarse grid forces ties
      y <- Gen.oneOf(0L, 1L)
      l <- Gen.oneOf(0L, 1L)
    } yield (s, y, l)
    for (trial <- 0 until 3) {
      val nShards = 2 + trial * 3 // 2, 5, 8
      // partition assignment is itself generated, not id-derived
      val shards = samples(Gen.choose(0, nShards - 1), 300)
      val rows = samples(rowGen, 300).zipWithIndex.map { case ((s, y, l), i) =>
        (i.toLong, s, y, l, shards(i))
      }
      val df = rows.toDF("id", "s", "y", "l", "shard")
      val aucDirect = graft.operators.Classifier.aucExact(
        df, col("s"), col("y")).collect().head
      val aucState = (0 until nShards)
        .map(r => graft.operators.Classifier.labelScoreState(
          df.filter(col("shard") === r), col("s"), col("y")))
        .reduce(graft.operators.Classifier.mergeLabelScoreStates)
      val aucInc = graft.operators.Classifier.aucFromState(aucState)
        .collect().head
      assert(aucInc.toSeq == aucDirect.toSeq,
        s"$nShards-shard AUC state diverges: $aucInc vs $aucDirect")
      def curve(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Double]).toSeq
      val rcDirect = curve(graft.operators.Classifier.riskCoverageCurve(
        df, col("s"), col("l")))
      val rcState = (0 until nShards)
        .map(r => graft.operators.Classifier.lossState(
          df.filter(col("shard") === r), col("s"), col("l")))
        .reduce(graft.operators.Classifier.mergeLossStates)
      val rcInc = curve(
        graft.operators.Classifier.riskCoverageFromState(rcState))
      assert(rcInc == rcDirect, s"$nShards-shard risk-coverage diverges")
    }
  }

  test("decade: y - decade(y) in [0,10) and result divisible by 10") {
    val ys = samples(Gen.choose(-3000, 3000), 200)
    val rows = ys.toDF("y")
      .select(col("y"), Clean.decadeOf(col("y")).as("d")).collect()
    rows.foreach { r =>
      val (y, d) = (r.getInt(0), r.getLong(1))
      assert(d % 10 == 0 && y - d >= 0 && y - d < 10, s"y=$y d=$d")
    }
  }

  test("shingles: bounded count, every shingle has n tokens") {
    for (n <- 1 to 4) {
      val ss = samples(sentence, 60)
      val rows = ss.toDF("t")
        .select(col("t"), Text.shingles(col("t"), n).as("sh")).collect()
      rows.foreach { r =>
        val toks = r.getString(0).split(" ", -1)
        val sh = r.getSeq[String](1)
        if (toks.length >= n) {
          assert(sh.nonEmpty && sh.size <= toks.length - n + 1)
          assert(sh.forall(_.split(" ", -1).length == n))
        } else assert(sh.toSet == toks.toSet)
      }
    }
  }

  test("quality score always in [0,1]") {
    val rows = samples(sentence, 150).toDF("t")
      .select(Text.qualityScore(col("t"), Queries.Stopwords).as("q")).collect()
    rows.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }

  test("simhash deterministic; hamming(x,x)=0") {
    val rows = samples(sentence, 100).toDF("t")
      .select(Dedup.simhash(col("t")).as("a"), Dedup.simhash(col("t")).as("b")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("nullify idempotent; output is null xor non-nullish") {
    val gen = Gen.oneOf(Gen.const("\\N"), Gen.const(""), Gen.const("   "),
      Gen.const("\t"), word)
    val rows = samples(gen, 120).toDF("v").select(
      Clean.nullify(col("v")).as("once"),
      Clean.nullify(Clean.nullify(col("v"))).as("twice"),
      Clean.isNullish(Clean.nullify(col("v")).cast("string")).as("still_nullish"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) {
        assert(r.getString(0) == r.getString(1))
        assert(!r.getBoolean(2))
      }
    }
  }

  test("minhash jaccard estimate within 3 sigma for random set pairs") {
    val pairGen = for {
      shared <- Gen.choose(5, 30); onlyA <- Gen.choose(0, 20); onlyB <- Gen.choose(0, 20)
    } yield (shared, onlyA, onlyB)
    val k = 256
    samples(pairGen, 12).zipWithIndex.foreach { case ((sh, oa, ob), i) =>
      val a = ((0 until sh) ++ (100 until 100 + oa)).map(x => s"w${x}_$i").mkString(" ")
      val b = ((0 until sh) ++ (200 until 200 + ob)).map(x => s"w${x}_$i").mkString(" ")
      val trueJ = sh.toDouble / (sh + oa + ob)
      val r = Seq((a, b)).toDF("a", "b").select(
        graft.plans.exprs.minhashSig(Text.tokens(col("a")), k).as("sa"),
        graft.plans.exprs.minhashSig(Text.tokens(col("b")), k).as("sb"))
        .select(size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
          x => x)).as("eq")).head()
      val est = r.getInt(0).toDouble / k
      val sigma = math.sqrt(trueJ * (1 - trueJ) / k)
      assert(math.abs(est - trueJ) <= 3 * sigma + 0.02,
        s"est=$est true=$trueJ sigma=$sigma")
    }
  }

  test("asOf and asOfBucketed match a brute-force reference on random data") {
    import graft.operators.AsOfJoin
    // clustered times guarantee plenty of exact collisions (the tiebreak
    // path) and negative times exercise the bucket floor division
    val rowGen = for {
      key <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(-40L, 40L).map(_ * 5)
      v <- Gen.choose(0, 999)
    } yield (key, t, v)
    val lRows = samples(rowGen, 120).zipWithIndex
      .map { case ((k, t, v), i) => (k, t, s"L$i") }
    val rRows = samples(rowGen, 80).map { case (k, t, v) => (k, t, s"P$v") }
    val l = lRows.toDF("k", "t", "lid")
    val r = rRows.toDF("k", "t", "p")
    // brute force: max (time, payload) over right rows with t' <= t —
    // the documented tiebreak (largest payload struct wins)
    val expected = lRows.map { case (k, t, lid) =>
      val cands = rRows.filter { case (rk, rt, _) => rk == k && rt <= t }
      (k, t, lid, if (cands.isEmpty) null else cands.map { case (_, rt, p) => (rt, p) }.max._2)
    }.toSet
    val plain = AsOfJoin.asOf(l, r, "k", "t", Seq("p"), "left")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getString(3))).toSet
    assert(plain == expected)
    for (w <- Seq(1L, 13L, 64L, 1000L)) {
      val b = AsOfJoin.asOfBucketed(l, r, "k", "t", Seq("p"), w, "left")
        .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getString(3))).toSet
      assert(b == expected, s"bucketWidth=$w")
    }
  }

  test("packChunks: offsets are exact prefix sums, chunks gap-free per shard") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val budget = 64
    val rows = graft.operators.Packing
      .packChunks(docs, "doc_id", "text", "lang", budget)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("tok_offset"),
        r.getAs[Long]("first_chunk"), r.getAs[Long]("last_chunk")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, shard) =>
      val ordered = shard.sortBy(_._2)
      // offsets: exact running sum starting at 0 — no token lost or
      // double-counted anywhere in the shard's stream
      ordered.foldLeft(0L) { case (expected, (_, id, n, off, fc, lc)) =>
        assert(off == expected, s"$lang/$id: offset $off != $expected")
        assert(fc == off / budget && lc == (off + n - 1) / budget,
          s"$lang/$id: chunk ids inconsistent")
        expected + n
      }
      // chunk coverage: every chunk id up to the last is hit (gap-free)
      val tot = ordered.map(_._3).sum
      val covered = ordered.flatMap(t => t._5 to t._6).toSet
      assert(covered == (0L to (tot - 1) / budget).toSet, s"$lang: chunk gaps")
    }
  }

  test("packChunkRows: chunk sums == tokenBudget except final chunk per shard") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val budget = 64
    val df = graft.operators.Packing
      .packChunkRows(docs, "doc_id", "text", "lang", budget)
    // the explode is narrow: still only packChunks' one window exchange
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(800))
    val rows = df.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("doc_tok_start"),
        r.getAs[Long]("chunk_tok_len")))
    assert(rows.nonEmpty)
    // chunk grain: every non-final chunk of a shard holds exactly
    // tokenBudget tokens; the final one holds the remainder
    rows.groupBy(_._1).foreach { case (lang, shard) =>
      val lastChunk = shard.map(_._2).max
      shard.groupBy(_._2).foreach { case (chunk, cs) =>
        val tot = cs.map(_._5).sum
        if (chunk < lastChunk) assert(tot == budget, s"$lang/$chunk: $tot")
        else assert(tot > 0 && tot <= budget, s"$lang/$chunk (final): $tot")
      }
    }
    // doc grain: each doc's spans are contiguous, start at 0, and sum to
    // its token count — the explode loses and invents nothing
    val nTok = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1).length.toLong)
      .toMap
    rows.groupBy(_._3).foreach { case (id, cs) =>
      val ordered = cs.sortBy(_._2)
      assert(ordered.head._4 == 0L, s"doc $id: first span starts at ${ordered.head._4}")
      ordered.foldLeft(0L) { case (pos, (_, _, _, start, len)) =>
        assert(start == pos, s"doc $id: span gap at $start != $pos")
        start + len
      }
      assert(cs.map(_._5).sum == nTok(id), s"doc $id: token sum")
    }
  }

  test("packGreedyNoSplit == driver-side fold; budget respected; one shuffle") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val budget = 64
    val df = graft.operators.Packing
      .packGreedyNoSplit(docs, "doc_id", "text", "lang", budget)
    // exactly ONE exchange: the shard repartition (the stateful scan
    // itself is narrow) — same shuffle budget as packChunks
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(800))
    val rows = df.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("chunk_id")))
    assert(rows.nonEmpty)
    // reference: sequential fold per shard in doc_id order
    val byShard = rows.groupBy(_._1)
    byShard.foreach { case (lang, shard) =>
      var chunk = 0L; var fill = 0L; var empty = true
      shard.sortBy(_._2).foreach { case (_, id, n, got) =>
        if (!empty && fill + n > budget) { chunk += 1; fill = 0L }
        fill += n; empty = false
        assert(got == chunk, s"$lang/$id: chunk $got != $chunk")
      }
    }
    // invariant: a chunk over budget can only be a single oversized doc
    byShard.foreach { case (lang, shard) =>
      shard.groupBy(_._4).foreach { case (c, cs) =>
        val tot = cs.map(_._3).sum
        assert(tot <= budget || cs.length == 1, s"$lang/$c: $tot over budget")
      }
    }
  }

  test("assembleChunks: chunk texts reconstruct each shard's token stream") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val budget = 64
    val rows = graft.operators.Packing
      .assembleChunks(docs, "doc_id", "text", "lang", budget)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("chunk_text"), r.getAs[Long]("n_tok")))
    assert(rows.nonEmpty)
    val stream = docs.select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).mkString(" ")).toMap
    rows.groupBy(_._1).foreach { case (lang, chunks) =>
      val ordered = chunks.sortBy(_._2)
      // pack-then-split loses nothing: concatenating the chunks in chunk
      // order rebuilds the shard's full doc-ordered token stream
      assert(ordered.map(_._3).mkString(" ") == stream(lang),
        s"$lang: stream reconstruction mismatch")
      // every chunk is exactly the budget except the shard's final one
      ordered.init.foreach { case (_, c, _, n) =>
        assert(n == budget, s"$lang/$c: $n tokens")
      }
      assert(ordered.last._4 <= budget && ordered.last._4 > 0)
      // text length == claimed token count
      ordered.foreach { case (_, c, txt, n) =>
        assert(txt.split(" ", -1).length == n, s"$lang/$c: text/token mismatch")
      }
    }
  }

  test("epochShuffle: reproducible permutation, bounded shards, seed-sensitive") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    def run(seed: Long) = graft.operators.Packing
      .epochShuffle(docs, "doc_id", seed, 8)
      .select("doc_id", "epoch_key", "epoch_shard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = run(42L)
    // deterministic: identical on re-run
    assert(a.sortBy(_._1).sameElements(run(42L).sortBy(_._1)))
    // keys unique (it IS a permutation) and shards bounded
    assert(a.map(_._2).distinct.length == a.length)
    assert(a.forall(t => t._3 >= 0 && t._3 < 8))
    // every shard populated (uniform hash — 8 shards over 50+ docs)
    assert(a.map(_._3).distinct.length == 8, a.map(_._3).distinct.mkString(","))
    // a new seed is a new permutation (order changes for some pair)
    val b = run(43L).sortBy(_._1)
    val aSorted = a.sortBy(_._1)
    assert(aSorted.zip(b).exists { case ((_, ka, _), (_, kb, _)) => ka != kb })
  }

  test("epochShuffle: shard domain wider than 16; mod-16 assignments unchanged") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    // numShards > 16 (the pre-round-9 cap): shards bounded and populated
    val wide = graft.operators.Packing.epochShuffle(docs, "doc_id", 42L, 25)
      .select("epoch_key", "epoch_shard").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(wide.forall(t => t._2 >= 0 && t._2 < 25))
    assert(wide.map(_._2).distinct.length > 16, "wide domain unused")
    // for numShards dividing 16 the six-digit value mod numShards equals
    // the last hex digit mod numShards (16 ≡ 0) — the widened derivation
    // must not move any row across an 8-shard epoch boundary
    val got8 = graft.operators.Packing.epochShuffle(docs, "doc_id", 42L, 8)
      .select("epoch_key", "epoch_shard").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val hex = "0123456789abcdef"
    got8.foreach { case (k, s) =>
      assert(s == hex.indexOf(k.last) % 8, s"$k: $s")
    }
  }

  test("epochShuffle → packGreedyNoSplit composes (string epoch_key id)") {
    // the round-8 judge-reproduced crash: packGreedyNoSplit used to cast
    // the id column to long, so the advertised composition with the md5
    // epoch_key died with CAST_INVALID_INPUT. Ids now pass through with
    // their native type; verify the fold against a driver-side replay in
    // STRING sort order of the keys.
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val budget = 64
    val rows = graft.operators.Packing.packGreedyNoSplit(
        graft.operators.Packing.epochShuffle(docs, "doc_id", 42L, 7),
        "epoch_key", "text", "epoch_shard", budget)
      .collect()
      .map(r => (r.getAs[Long]("epoch_shard"), r.getAs[String]("epoch_key"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("chunk_id")))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).distinct.length == rows.length) // keys unique
    rows.groupBy(_._1).foreach { case (shard, sh) =>
      var chunk = 0L; var fill = 0L; var empty = true
      sh.sortBy(_._2).foreach { case (_, k, n, got) =>
        if (!empty && fill + n > budget) { chunk += 1; fill = 0L }
        fill += n; empty = false
        assert(got == chunk, s"$shard/$k: chunk $got != $chunk")
      }
    }
  }

  test("chunkWindows: every token covered; stride==window reconstructs the text") {
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // overlapping windows: the union of [start, start+len) covers [0, n)
    val over = graft.operators.Packing.chunkWindows(docs, "doc_id", "text", 16, 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("tok_len"), r.getAs[String]("chunk_text")))
    over.groupBy(_._1).foreach { case (id, cs) =>
      val n = texts(id).split(" ", -1).length.toLong
      val covered = cs.flatMap(c => c._2 until (c._2 + c._3)).toSet
      assert(covered == (0L until n).toSet, s"doc $id: uncovered tokens")
      assert(cs.forall(c => c._3 > 0 && c._3 <= 16), s"doc $id: bad lengths")
    }
    // non-overlapping: chunks concatenate back to the exact document
    val exact = graft.operators.Packing.chunkWindows(docs, "doc_id", "text", 32, 32)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_text")))
    exact.groupBy(_._1).foreach { case (id, cs) =>
      val rebuilt = cs.sortBy(_._2).map(_._3).mkString(" ")
      assert(rebuilt == texts(id), s"doc $id: reconstruction mismatch")
    }
  }

  test("blockDedup: survivors are an ordered token subsequence; block multiset shrinks to distinct") {
    // short words from a 4-letter alphabet → heavy cross-doc block
    // collisions, the adversarial case for winner selection
    val smallWord = Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val denseDoc = Gen.choose(4, 40)
      .flatMap(n => Gen.listOfN(n, smallWord).map(_.mkString(" ")))
    val texts = samples(denseDoc, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val docs = texts.toDF("doc_id", "text")
    val B = 4
    val out = Dedup.blockDedup(docs, "doc_id", "text", B).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val byId = texts.toMap
    // per doc: clean text is a prefix-aligned subsequence of WHOLE blocks
    out.foreach { case (id, (n, clean)) =>
      val orig = byId(id).split(" ", -1)
      val blocks = orig.grouped(B).map(_.mkString(" ")).toSeq
      val cleanToks = if (clean.isEmpty) Array.empty[String]
        else clean.split(" ", -1)
      assert(cleanToks.length == n, s"doc $id: count mismatch")
      // the clean text must be the concatenation of SOME ordered
      // subsequence of the doc's blocks (reachability DP — greedy
      // matching can false-fail when a dropped block equals a kept one)
      var reach = Set(0)
      blocks.foreach { b =>
        val bt = b.split(" ", -1).toSeq
        reach = reach ++ reach
          .filter(p => p + bt.size <= cleanToks.length &&
            cleanToks.slice(p, p + bt.size).toSeq == bt)
          .map(_ + bt.size)
      }
      assert(reach.contains(cleanToks.length),
        s"doc $id: clean text is not an ordered block subsequence")
    }
    // corpus-wide: every distinct (lowercased) block value survives
    // EXACTLY once — first occurrence kept, all copies dropped
    val allBlocks = texts.flatMap { case (id, t) =>
      t.toLowerCase.split(" ", -1).grouped(B).map(_.mkString(" ")).map((id, _))
    }
    val survivors = out.toSeq.filter(_._2._1 > 0).flatMap { case (id, (_, c)) =>
      c.toLowerCase.split(" ", -1).grouped(B).map(_.mkString(" ")).map((id, _))
    }
    // survivor blocks re-chunk at fresh boundaries, so compare VALUES
    // only for docs that lost nothing (their boundaries are unchanged)
    val intact = out.filter { case (id, (n, _)) =>
      n == byId(id).split(" ", -1).length }.keySet
    val distinctVals = allBlocks.map(_._2).distinct.toSet
    val intactSurvivorVals = survivors.filter(p => intact(p._1)).map(_._2)
    // an intact doc holds the FIRST occurrence of every one of its
    // blocks; two equal values can't both be first occurrences, so no
    // value may appear twice across (or within) intact docs
    assert(intactSurvivorVals.distinct.size == intactSurvivorVals.size,
      "a block value survived twice across intact docs")
    assert(intactSurvivorVals.toSet.subsetOf(distinctVals))
  }

  test("doremiWeights: on random losses the weights form a distribution " +
       "above the smoothing floor, invariant to doc partitioning") {
    import graft.operators.Selection
    val gRows = samples(for {
      g <- Gen.oneOf("a", "b", "c", "d", "e")
      p <- Gen.choose(0.5, 4.0)
      r <- Gen.choose(0.5, 4.0)
      t <- Gen.choose(1L, 200L)
    } yield (g, p, r, t), 300)
    val df = gRows.toDF("g", "proxy", "ref", "toks")
    val w = Selection.doremiWeights(df, "g", col("proxy"), col("ref"),
        col("toks"), eta = 1.0, smoothing = 0.125)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val k = w.size
    assert(math.abs(w.values.sum - 1.0) < 1e-5 * k, s"sum=${w.values.sum}")
    assert(w.values.forall(v => v >= 0.125 / k - 1e-9 && v < 1.0),
      s"floor/ceiling violated: $w")
    val w2 = Selection.doremiWeights(df.repartition(13), "g", col("proxy"),
        col("ref"), col("toks"), eta = 1.0, smoothing = 0.125)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(w == w2, "rounded weights must not depend on partitioning")
  }

  test("softDedupWeights: random corpora — weights in (0,1], exactly " +
       "the least-common docs anchor 1, commonness >= 1") {
    val ss = samples(sentence, 120)
    val docs = ss.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = Dedup.softDedupWeights(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(w.length == ss.size)
    assert(w.forall { case (_, c, v) => c >= 1.0 && v > 0.0 && v <= 1.0 })
    val cmin = w.map(_._2).min
    assert(w.filter(_._3 == 1.0).map(_._2).forall(_ == cmin),
      "weight 1 exactly at the minimum commonness")
    assert(w.exists(_._3 == 1.0))
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("kAnonymizedStats/lDiverseStats: privacy invariants on random groupings") {
    // the publication-gate contracts, executable over random data:
    // (1) mass conservation — published rows and weights sum to the
    //     corpus totals regardless of which cells suppress;
    // (2) no visible cell violates its gate (n_rows >= k / n_sv >= l);
    // (3) complementary suppression: the rollup never carries a single
    //     cell WHEN a visible row exists (zero-visible corpora are the
    //     documented exemption — no complement to infer against — and
    //     are pinned explicitly below so the generator can't miss them)
    val gen = for {
      nGroups <- Gen.choose(2, 9)
      rows <- Gen.choose(30, 120)
      seeds <- Gen.listOfN(rows, Gen.choose(0, 10000))
    } yield seeds.zipWithIndex.map { case (s0, i) =>
      (s"g${s0 % nGroups}", s"s${(s0 / 7) % 4}", (i + 1).toLong) }
    // planted degenerate corpora: a single group that fails the k gate
    // (3 rows < k) and is sensitive-homogeneous (1 distinct sv < l) —
    // zero visible rows in both gates
    val degenerate = (1 to 3).map(i => ("only", "same", i.toLong))
    for ((rows, runIdx) <- (samples(gen, 8) :+ degenerate).zipWithIndex) {
      val df = rows.toDF("a", "sv", "w")
      val k = 5L + (runIdx % 3) * 5L
      val ka = graft.operators.Quality
        .kAnonymizedStats(df, Seq("a"), k, col("w")).collect()
      assert(ka.map(_.getLong(1)).sum == rows.size.toLong)
      assert(ka.map(_.getLong(3)).sum == rows.map(_._3).sum)
      val kaVis = ka.filter(_.getString(0) != "__suppressed__")
      assert(kaVis.forall(_.getLong(1) >= k), s"k=$k visible under gate")
      ka.filter(_.getString(0) == "__suppressed__").foreach { r =>
        assert(r.getLong(2) >= 2L || kaVis.isEmpty,
          "k-anon rollup carries a lone cell beside visible rows") }
      val l = 2L + (runIdx % 2)
      val ld = graft.operators.Quality
        .lDiverseStats(df, Seq("a"), "sv", l, col("w")).collect()
      assert(ld.map(_.getLong(1)).sum == rows.size.toLong)
      assert(ld.map(_.getLong(4)).sum == rows.map(_._3).sum)
      val ldVis = ld.filter(_.getString(0) != "__suppressed__")
      assert(ldVis.forall(_.getLong(2) >= l), s"l=$l visible under gate")
      ld.filter(_.getString(0) == "__suppressed__").foreach { r =>
        assert(r.getLong(3) >= 2L || ldVis.isEmpty,
          "l-div rollup carries a lone cell beside visible rows") }
      if (rows eq degenerate) {
        // the exempt shape, pinned: exactly ONE published row — the
        // rollup with n_groups=1 carrying the whole corpus mass
        assert(kaVis.isEmpty && ka.length == 1 && ka(0).getLong(2) == 1L
          && ka(0).getLong(1) == 3L, s"k-anon degenerate: ${ka.toSeq}")
        assert(ldVis.isEmpty && ld.length == 1 && ld(0).getLong(3) == 1L
          && ld(0).getLong(1) == 3L && ld(0).getLong(2) == 1L,
          s"l-div degenerate: ${ld.toSeq}")
      }
    }
  }

  test("fuzzyDupPairs: recall-complete on random keys with random edits <= k " +
       "(sentinel + prefix-filter regimes)") {
    // the recall contract, EXECUTABLE: a corpus of random short keys
    // over a tiny alphabet (so gram collisions and the sentinel regime
    // are both dense) plus planted <=k-edit variants; the operator's
    // output must equal the full brute-force lev<=k answer — a missed
    // sentinel-regime pair (the r15 gap: both keys can lose every gram
    // instance to k edits) or a lost prefix post shows up as a missing
    // pair here
    val maxDist = 3
    val alpha = Gen.oneOf('a', 'b', 'c')
    val baseKey: Gen[String] = Gen.choose(1, 14)
      .flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    def edit(s: String, op: Int, pos: Int, c: Char): String = {
      val p = if (s.isEmpty) 0 else math.floorMod(pos, s.length)
      op match {
        case 0 => s.take(p) + c + s.drop(p)                    // insert
        case 1 => if (s.isEmpty) s else s.take(p) + s.drop(p + 1) // delete
        case _ => if (s.isEmpty) c.toString
                  else s.take(p) + c + s.drop(p + 1)           // substitute
      }
    }
    val editedPair: Gen[(String, String)] = for {
      base <- baseKey
      nEdits <- Gen.choose(0, maxDist)
      ops <- Gen.listOfN(nEdits, Gen.zip(Gen.choose(0, 2),
        Gen.choose(0, 31), alpha))
    } yield (base, ops.foldLeft(base) { case (s, (op, pos, c)) =>
      edit(s, op, pos, c) })
    val pairs = samples(editedPair, 40)
    val keys = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a), (2L * i + 1, b)) }.filter(_._2.nonEmpty)
    val docs = keys.toDF("doc_id", "text")
    val got = Dedup.fuzzyDupPairs(docs, "doc_id", "text",
        prefixTokens = 6, maxDist = maxDist, qgramLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ia, ka) <- keys; (ib, kb) <- keys if ia < ib
      d = levDist(ka, kb) if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("containmentPairs: planted shingle-subset docs always score 1.0; " +
       "all scores equal brute force") {
    // directed-score contract on random data: a doc whose shingle set
    // is a SUBSET of another's (a contiguous slice guarantees it) must
    // appear with containment exactly 1.0 toward its superset, and
    // every emitted score must equal the exact |A∩B|/|A| recompute
    val word: Gen[String] = Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val doc: Gen[Vector[String]] = Gen.choose(6, 14)
      .flatMap(n => Gen.listOfN(n, word).map(_.toVector))
    val bases = samples(doc, 25)
    val rows = bases.zipWithIndex.flatMap { case (w, i) =>
      // slice long enough to carry >= 1 3-shingle (3..|w| tokens)
      val slice = w.slice(i % 3, (i % 3) + 3 + (i % 4))
      Seq((2L * i, w.mkString(" "))) ++
        (if (slice.size >= 3) Seq((2L * i + 1, slice.mkString(" "))) else Nil)
    }
    val docs = rows.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        threshold = 0.3, shingleLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def sh(t: String): Set[String] = t.split(" ").toSeq
      .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val sets = rows.map { case (id, t) => id -> sh(t.toLowerCase) }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia != ib && sa.nonEmpty
      c = (sa & sb).size.toDouble / sa.size if c >= 0.3
    } yield (ia, ib, math.rint(c * 1e6) / 1e6)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // every planted slice with shingles scores exactly 1.0 toward its base
    for (((w, i)) <- bases.zipWithIndex) {
      val slice = w.slice(i % 3, (i % 3) + 3 + (i % 4))
      if (slice.size >= 3 && sh(slice.mkString(" ").toLowerCase).nonEmpty &&
          sh(slice.mkString(" ").toLowerCase) != sh(w.mkString(" ").toLowerCase))
        assert(got.contains((2L * i + 1, 2L * i, 1.0)),
          s"planted subset pair ${2 * i + 1}->${2 * i} missing")
    }
  }

  test("maxCoverageSelect: CELF == naive greedy on subset-heavy adversarial " +
       "corpora (n > 150, subset floods past the head fetch)") {
    // the adversarial regime the n=40 trajectory spec cannot reach
    // (round-16 verdict finding #1): 3 anchors with wide shingle spans,
    // each flooded with MORE near-full prefix-subset copies than the
    // 64-entry head fetch — their round-1 bounds crowd the head while
    // their true later-round gains collapse to ~0 — plus disjoint
    // decoys whose bounds sit just BELOW the flood's, i.e. beyond the
    // truncated head exactly when they become the true greedy winner.
    val corpusGen: Gen[Vector[Vector[String]]] = for {
      anchorLens <- Gen.listOfN(3, Gen.choose(40, 80))
      floodSizes <- Gen.listOfN(3, Gen.choose(55, 80))
      trims <- Gen.listOfN(300, Gen.choose(1, 4))
      decoyLens <- Gen.listOfN(4, Gen.choose(10, 35))
    } yield {
      val anchors = anchorLens.zipWithIndex.map { case (len, a) =>
        (1 to len + 2).map(i => s"a${a}w$i").toVector }.toVector
      val floods = anchors.zipWithIndex.flatMap { case (an, a) =>
        (0 until floodSizes(a)).map { j =>
          an.take(an.size - trims((a * 100 + j) % trims.size)) } }
      val decoys = decoyLens.zipWithIndex.map { case (len, d) =>
        (1 to len + 2).map(i => s"z${d}d$i").toVector }
      anchors ++ floods ++ decoys
    }
    for ((toks, trial) <- samples(corpusGen, 3).zipWithIndex) {
      assert(toks.size > 150, s"trial $trial corpus too small: ${toks.size}")
      val rows = toks.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) }
      val docs = rows.toDF("doc_id", "text")
      val k = 6
      val got = graft.operators.Selection
        .maxCoverageSelect(docs, "doc_id", "text", k, shingleLen = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      // driver-side naive greedy over the SAME shingle sets
      val sets = docs.select(col("doc_id"),
          Text.shingles(lower(col("text")), 3))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
        .sortBy(_._1)
      var covered = Set.empty[String]
      val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var stop = false
      for (r <- 1 to k if !stop) {
        val (wid, wgain) = sets.map { case (id, s) => (id, (s -- covered).size) }
          .maxBy { case (id, g) => (g, -id) }
        if (wgain == 0) stop = true
        else {
          covered ++= sets.find(_._1 == wid).get._2
          want += ((r.toLong, wid, wgain.toLong, covered.size.toLong))
        }
      }
      assert(got == want.toSeq, s"trial $trial: got $got want $want")
    }
  }

  test("decayed-counts merge lattice: eval(merge(parts)) == eval(whole) " +
       "exactly, over random partitions and random grouping orders") {
    // the mergeable-summaries contract, executable (round-16 verdict
    // item 6): split a random event set into random shards, build
    // per-shard decayedBucketCounts states, merge them left-fold AND
    // right-fold (associativity), evaluate — the exact dyadic units
    // make the published doubles byte-identical to evaluating the
    // whole set's state directly, not merely close.
    import graft.operators.Frequency
    val eventsGen = for {
      n <- Gen.choose(20, 120)
      keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      secs <- Gen.listOfN(n, Gen.choose(0L, 500000L))
      nShards <- Gen.choose(2, 5)
      assign <- Gen.listOfN(n, Gen.choose(0, 4))
    } yield (keys.zip(secs), nShards, assign.map(_ % nShards))
    for (((evs, nShards, assign), trial) <- samples(eventsGen, 5).zipWithIndex) {
      val half = 3600L
      def mkDf(rows: Seq[(String, Long)]) =
        rows.toDF("key", "secs")
          .withColumn("ts", timestamp_seconds(col("secs")))
      def evalRows(state: org.apache.spark.sql.DataFrame) =
        Frequency.decayedTopKFromCounts(state, 10).collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
            r.getLong(3))).toSeq
      val direct = evalRows(
        Frequency.decayedBucketCounts(mkDf(evs), "key", "ts", half))
      val shardStates = (0 until nShards).map { s =>
        Frequency.decayedBucketCounts(
          mkDf(evs.zip(assign).collect { case (e, a) if a == s => e }),
          "key", "ts", half)
      }
      val leftFold = evalRows(shardStates.reduceLeft(Frequency.mergeDecayedCounts))
      val rightFold = evalRows(shardStates.reduceRight(Frequency.mergeDecayedCounts))
      assert(leftFold == direct,
        s"trial $trial left-fold merge diverges: $leftFold vs $direct")
      assert(rightFold == direct,
        s"trial $trial right-fold merge diverges: $rightFold vs $direct")
    }
  }

  test("tCloseStats == driver brute force (exact-integer EMD gate, " +
       "complementary suppression, union-recomputed rollup)") {
    import spark.implicits._
    val corpus = for {
      n <- Gen.choose(20, 70)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("g0", "g1", "g2", "g3")
        v <- Gen.choose(0L, 3L)
        w <- Gen.choose(1L, 9L)
      } yield (g, v, w))
      tNum <- Gen.choose(0L, 4L)
      tDen <- Gen.choose(5L, 12L)
    } yield (rows, tNum, tDen)
    for (((rows, tNum, tDen), trial) <- samples(corpus, 10).zipWithIndex) {
      val dom = rows.map(_._2).distinct.sorted
      val m = dom.size
      val bigN = BigInt(rows.size)
      val dCum = dom.map(v => BigInt(rows.count(_._2 <= v)))
      case class G(name: String, nG: Long, sumW: Long, s: BigInt) {
        def small: Boolean =
          s * tDen > BigInt(tNum) * (m - 1) * nG * bigN
        def emd: Double =
          if (m <= 1) 0.0
          else (BigDecimal(s) / BigDecimal(BigInt(m - 1) * nG * bigN))
            .toDouble
      }
      val groups = rows.map(_._1).distinct.sorted.map { g =>
        val mine = rows.filter(_._1 == g)
        val cCum = dom.map(v => BigInt(mine.count(_._2 <= v)))
        val s = dCum.zip(cCum)
          .map { case (di, ci) => (bigN * ci - BigInt(mine.size) * di).abs }
          .sum
        G(g, mine.size.toLong, mine.map(_._3).sum, s)
      }
      val nSmall = groups.count(_.small)
      val ordered = groups.sortBy(g => (g.small, g.nG, g.name))
      val suppNames = (groups.filter(_.small).map(_.name) ++
        (if (nSmall == 1) Seq(ordered.head.name) else Nil)).toSet
      val expVisible = groups.filterNot(g => suppNames(g.name))
      val out = graft.operators.Quality.tCloseStats(
        rows.toDF("a", "v", "w"), Seq("a"), col("v"), tNum, tDen,
        col("w")).collect()
      val gotVisible = out.filter(_.getString(0) != "__suppressed__")
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          r.getLong(4), r.getDouble(2))).sortBy(_._1)
      assert(gotVisible.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
        expVisible.map(g => (g.name, g.nG, 1L, g.sumW)),
        s"trial $trial visible mismatch")
      gotVisible.zip(expVisible).foreach { case (got, exp) =>
        assert(math.abs(got._5 - exp.emd) < 1e-9,
          s"trial $trial emd ${got._5} vs ${exp.emd} for ${exp.name}")
      }
      val sup = out.filter(_.getString(0) == "__suppressed__")
      if (suppNames.isEmpty) assert(sup.isEmpty, s"trial $trial phantom rollup")
      else {
        val union = rows.filter(r => suppNames(r._1))
        val uCum = dom.map(v => BigInt(union.count(_._2 <= v)))
        val uS = dCum.zip(uCum)
          .map { case (di, ci) =>
            (bigN * ci - BigInt(union.size) * di).abs }.sum
        val uEmd =
          if (m <= 1) 0.0
          else (BigDecimal(uS) /
            BigDecimal(BigInt(m - 1) * union.size * bigN)).toDouble
        assert(sup.length == 1 && sup.head.getLong(1) == union.size.toLong &&
          sup.head.getLong(3) == suppNames.size.toLong &&
          sup.head.getLong(4) == union.map(_._3).sum,
          s"trial $trial rollup mass mismatch")
        assert(math.abs(sup.head.getDouble(2) - uEmd) < 1e-9,
          s"trial $trial rollup emd ${sup.head.getDouble(2)} vs $uEmd")
      }
    }
  }

  test("conformalThreshold == driver order statistic for random " +
       "multisets and alphas") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(3, 40)
      scores <- Gen.listOfN(n, Gen.choose(0, 20)
        .map(i => i.toDouble / 20.0))           // duplicates likely
      aNum <- Gen.choose(1L, 9L)
      aDen <- Gen.choose(10L, 20L)
    } yield (scores, aNum, aDen)
    for (((scores, aNum, aDen), trial) <- samples(gen, 15).zipWithIndex) {
      val n = scores.size.toLong
      val k = ((n + 1) * (aDen - aNum) + aDen - 1) / aDen
      val expected =
        if (k > n) None
        else Some(scores.sorted(Ordering[Double].reverse)(k.toInt - 1))
      val r = graft.operators.Classifier.conformalThreshold(
        scores.toDF("s"), col("s"), aNum, aDen).collect().head
      assert(r.getLong(0) == n && r.getLong(1) == k, s"trial $trial n/k")
      val got = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(got == expected,
        s"trial $trial tau $got vs $expected (n=$n k=$k)")
      // merge lattice: fold of sharded score states == monolithic
      // calibration, exactly, for a random 3-way partition
      val shard = scores.zipWithIndex
        .groupBy { case (_, i) => (i * 2654435761L) % 3 }
      val folded = (0L to 2L)
        .map(si => graft.operators.Classifier.scoreState(
          shard.getOrElse(si, Nil).map(_._1).toDF("s"), col("s")))
        .reduce(graft.operators.Classifier.mergeScoreStates)
      val rm = graft.operators.Classifier.conformalFromState(
        folded, aNum, aDen).collect().head
      assert(rm.getLong(0) == n && rm.getLong(1) == k &&
        (if (rm.isNullAt(2)) None else Some(rm.getDouble(2))) == got,
        s"trial $trial merged state diverges from monolithic")
    }
  }
}
