package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tokenizer

class TokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("applyMergesJvm == applyMerges HOF on random tables incl. " +
       "overlap chains and chained merges") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val syms = Vector("a", "b", "c")
    val rows = (1 to 60).map { _ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => syms(rnd.nextInt(3))).mkString(" ")
    } :+ "a a a a" :+ "a" :+ "b b b"
    // chained table: later merges consume earlier products
    val table = Seq(("a", "a"), ("aa", "a"), ("b", "b"), ("aaa", "bb"),
      ("c", "aaabb"))
    val df = rows.toDF("text")
    val hof = Tokenizer.toSymbols(df, "text")
      .select(Tokenizer.applyMerges(col("sym"), table).as("sym"))
      .collect().map(_.getSeq[String](0).mkString("|")).toList.sorted
    val jvm = Tokenizer.toSymbols(df, "text")
      .collect().map { r =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        buf ++= r.getSeq[String](0)
        graft.operators.Tokenizer.applyMergesJvm(buf, table.toArray)
          .mkString("|")
      }.toList.sorted
    assert(jvm == hof)
  }

  test("trainMerges: hand-traced BPE on a tiny corpus — merge order, " +
       "greedy overlap resolution, final tokenization") {
    import spark.implicits._
    // corpus: aaab ×2, ab ×1
    //   iter 1 pairs: (a,a)=4, (a,b)=3            → merge (a,a)
    //   "aaab" → [aa, a, b] (greedy leftmost), "ab" → [a, b]
    //   iter 2 pairs: (aa,a)=2, (a,b)=3           → merge (a,b)
    //   "aaab" → [aa, ab], "ab" → [ab]
    //   iter 3 pairs: (aa,ab)=2                   → merge (aa,ab)
    val docs = Seq("aaab aaab ab").toDF("text")
    val merges = Tokenizer.trainMerges(docs, "text", nMerges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // inference: replaying the merge table tokenizes both words fully
    val toks = Tokenizer.toSymbols(docs, "text")
      .select(Tokenizer.applyMerges(col("sym"), merges).as("sym"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(toks.sortBy(_.mkString) ==
      List(List("aaab"), List("aaab"), List("ab")))
    // early stop: asking for more merges than pairs exist terminates
    val m5 = Tokenizer.trainMerges(docs, "text", nMerges = 10)
    assert(m5.take(3) == merges && m5.length <= 10)
  }

  test("trainMergesBatched: reproduces the strict merge table in ONE " +
       "round (10x fewer scans) when top pairs are symbol-disjoint") {
    import spark.implicits._
    // 10 two-letter words over disjoint alphabet slices with strictly
    // decreasing counts 20..11: strict BPE merges them in count order,
    // one corpus scan per merge (10 rounds); every word is exactly its
    // pair, so merging creates NO new pairs and the shield blocks
    // nothing — the batched trainer must reproduce the identical
    // table from a single round
    val words = "ab cd ef gh ij kl mn op qr st".split(" ")
    val corpus = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(20 - i)(w) }.mkString(" ")
    val docs = Seq(corpus).toDF("text")
    val strict = Tokenizer.trainMerges(docs, "text", nMerges = 10)
    assert(strict == words.toSeq.map(w => (w.substring(0, 1), w.substring(1))))
    val (batched, rounds) =
      Tokenizer.trainMergesBatchedWithRounds(docs, "text", 10, maxBatch = 10)
    assert(batched == strict)
    // strict cost: 10 count+apply rounds; batched: 1 — >= 10x fewer
    assert(rounds == 1, s"expected 1 round, got $rounds")
  }

  test("trainMergesBatched: maxBatch=1 degenerates to exactly the " +
       "strict trainer on the real fixture") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val strict = Tokenizer.trainMerges(docs, "text", nMerges = 6)
    val batched = Tokenizer.trainMergesBatched(docs, "text", 6, maxBatch = 1)
    assert(batched == strict)
  }

  test("trainMergesBatched: divergence vs strict is the documented " +
       "order-deferral — shielded batch defers created pairs one round") {
    import spark.implicits._
    // "the"x10, "xy"x6: pairs (h,e)=10, (t,h)=10, (x,y)=6; argmax by
    // (cnt desc, a, b) is (h,e). Strict recounts after merging it and
    // immediately takes the CREATED pair (t,he)=10; the shielded batch
    // blocks (t,h) (shares h) and takes (x,y)=6 in the same round,
    // deferring (t,he) to round 2 — same merges, different order (the
    // scaladoc's divergence contract, pinned)
    val docs = Seq((Seq.fill(10)("the") ++ Seq.fill(6)("xy"))
      .mkString(" ")).toDF("text")
    val strict = Tokenizer.trainMerges(docs, "text", nMerges = 3)
    assert(strict == Seq(("h", "e"), ("t", "he"), ("x", "y")))
    val (batched, rounds) =
      Tokenizer.trainMergesBatchedWithRounds(docs, "text", 3, maxBatch = 3)
    assert(batched == Seq(("h", "e"), ("x", "y"), ("t", "he")))
    assert(rounds == 2)
  }

  test("encode: bit-identical to the applyMerges HOF on the hand-traced " +
       "corpus and the fixture; chained-symbol merges gate correctly; " +
       "a vocabulary-scale table runs where the HOF cannot") {
    import spark.implicits._
    // hand-traced corpus + the chained case: ("a","b") creates "ab",
    // which ("ab","c") must then see through the presence gate
    val docs = Seq((1L, "aaab aaab ab"), (2L, "abc cab"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("ab", "c"))
    val fast = Tokenizer.encode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(fast(1L) == List("aaab", "aaab", "ab"))
    assert(fast(2L) == List("abc", "c", "ab"))
    assert(fast(3L) == Nil)
    // fixture equivalence vs the HOF replay, trained merges
    val fix = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
    val trained = Tokenizer.trainMergesBatched(fix, "text", 12, maxBatch = 6)
    val f2 = Tokenizer.encode(fix, "doc_id", "text", trained)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val hof = fix.select(col("doc_id"),
        flatten(transform(
          filter(split(col("text"), " "), w => length(w) > 0),
          w => Tokenizer.applyMerges(
            transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
            trained))).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(f2 == hof)
    // vocabulary scale: a 2000-merge table encodes instantly through
    // the broadcast path (the HOF would plan a 2000-deep expression);
    // unused merges cost O(1) via the presence gate
    val big = trained ++ (1 to 2000).map(i => (s"<$i>", s"<$i>'"))
    val f3 = Tokenizer.encode(fix, "doc_id", "text", big)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(f3 == hof) // inert merges change nothing
    // NULL text: the HOF path propagates NULL (split(NULL) is NULL);
    // encode must match instead of NPE-ing the executor
    val withNull = Seq((1L, "ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val nf = Tokenizer.encode(withNull, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
    assert(nf(1L) == List("ab") && nf(2L) == null,
      "NULL text must encode to a NULL token array, like the HOF replay")
  }

  test("encode: non-BMP text — code-point symbol grain matches the SQL " +
       "substr path (no lone surrogates)") {
    import spark.implicits._
    // U+1F600 (😀) and U+20BB7 (𠮷) are astral: 2 UTF-16 chars each but
    // ONE Spark substr character. A char-grain seeding would split them
    // into unmergeable lone surrogates; the merge table below must see
    // whole code points on both paths
    val smile = new String(Character.toChars(0x1F600))
    val jp = new String(Character.toChars(0x20BB7))
    val docs = Seq((1L, s"$smile$smile a$jp"), (2L, s"x$smile y"))
      .toDF("doc_id", "text")
    val merges = Seq((smile, smile), ("a", jp), ("x", smile))
    val fast = Tokenizer.encode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(fast(1L) == List(smile + smile, "a" + jp))
    assert(fast(2L) == List("x" + smile, "y"))
    val hof = docs.select(col("doc_id"),
        flatten(transform(
          filter(split(col("text"), " "), w => length(w) > 0),
          w => Tokenizer.applyMerges(
            transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
            merges))).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(fast == hof, "encode must stay bit-identical to the SQL replay " +
      "on astral text")
  }

  test("trainMergesBatched: large-vocabulary request — terminates at " +
       "vocabulary exhaustion with a batched scan curve, rounds well " +
       "under the strict trainer's") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    // request far more merges than the fixture vocabulary supports:
    // the trainer must stop when no pairs remain (every word a single
    // symbol), and the ROUND count — 2 scans each — must track
    // merges/batch, not merges (the ~nMerges/maxBatch claim; measured
    // at sf0.1: 512 merges in 44 rounds at maxBatch=16 vs strict's
    // 512 — the SCALE.md table row)
    val (merges, rounds) = Tokenizer.trainMergesBatchedWithRounds(
      docs, "text", nMerges = 512, maxBatch = 16)
    assert(merges.nonEmpty && merges.size < 512,
      s"fixture vocabulary must exhaust below 512, got ${merges.size}")
    // scan curve: average >= 4 merges per round (empirically ~7 at
    // word grain; a per-merge trainer would need merges.size rounds)
    assert(rounds <= math.max(2, merges.size / 4),
      s"${merges.size} merges took $rounds rounds — batching degraded")
    // exhaustion is real: the exhausted table encodes the corpus to
    // fully-merged words — every doc's token count equals its word
    // count (possible only when no un-merged pair remains anywhere)
    val enc = Tokenizer.encode(docs, "doc_id", "text", merges)
    val toks = enc.select(explode(col("toks"))).count()
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(toks == words, s"fully-merged encode: $toks tokens vs $words words")
  }

  test("applyMerge: greedy leftmost on overlap runs; no cross-word state") {
    import spark.implicits._
    val sym = Seq(Seq("a", "a", "a"), Seq("b", "a", "a"), Seq("a"))
      .toDF("sym")
    val merged = sym.select(Tokenizer.applyMerge(col("sym"), "a", "a")
      .as("m")).collect().map(_.getSeq[String](0).toList).toList
    assert(merged == List(List("aa", "a"), List("b", "aa"), List("a")))
  }

  test("pairCounts: exchange carries aggregated pairs, not the corpus; " +
       "counts match a direct recount on the fixture") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .repartition(3)
    val pc = Tokenizer.pairCounts(Tokenizer.toSymbols(docs, "text"))
    // map-side combine: the partial aggregate sits BELOW the pair
    // exchange, so the exchange carries aggregated (a, b, cnt) rows,
    // not one row per character position
    val plan = pc.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val partIdx = lines.indexWhere(_.contains("partial_count"))
    val exIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning"))
    assert(partIdx >= 0 && exIdx >= 0 && exIdx < partIdx,
      s"expected map-side partial aggregate under the exchange:\n$plan")
    // spot-check one pair count against a driver-side recount
    val rows = docs.select("text").collect().map(_.getString(0))
    val expected = rows.flatMap(_.split(" "))
      .flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = pc.collect()
      .map(r => (r.getString(0) + r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("fimTransform: applied rows reconstruct the original token " +
       "stream; pass-through rows are untouched; rate and determinism") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = graft.operators.Packing
      .fimTransform(docs, "doc_id", "text", rateNum = 1 << 23)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fim"),
        r.getAs[String]("text_out"), r.getAs[String]("text"))).toSeq
    val applied = out.filter(_._2 == 1L)
    assert(applied.nonEmpty && applied.size < out.size)
    // rate ~0.5
    assert(math.abs(applied.size.toDouble / out.size - 0.5) < 0.25)
    // PSM framing: prefix + middle + suffix == original tokens
    val Psm = """^<PRE> (.*) <SUF> (.*) <MID> (.*)$""".r
    for ((_, _, t, orig) <- applied) {
      t match {
        case Psm(pfx, sfx, mid) =>
          val rebuilt = (pfx.split(" ").filter(_.nonEmpty) ++
            mid.split(" ").filter(_.nonEmpty) ++
            sfx.split(" ").filter(_.nonEmpty)).toSeq
          assert(rebuilt == orig.split(" ").filter(_.nonEmpty).toSeq,
            s"reconstruction failed for: $t")
        case _ => fail(s"bad PSM framing: $t")
      }
    }
    // pass-through rows are byte-identical
    out.filter(_._2 == 0L).foreach { case (_, _, t, orig) =>
      assert(t == orig)
    }
    // layout-independent: same output on a repartitioned corpus
    val re = graft.operators.Packing
      .fimTransform(docs.repartition(7), "doc_id", "text", 1 << 23)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_out")).toMap
    out.foreach { case (id, _, t, _) => assert(re(id) == t) }
  }

  test("t5SpanCorrupt: input+target splice back to the original, " +
       "sentinels are ordered, counts consistent, rate in band") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = graft.operators.Packing
      .t5SpanCorrupt(docs, "doc_id", "text", pNum = 838861)
      .collect()
    val Sent = """^<X(\d+)>$""".r
    var totTok = 0L
    var totMasked = 0L
    for (r <- out) {
      val orig = r.getAs[String]("text").split(" ").toSeq
      val input = r.getAs[String]("input_text").split(" ").toSeq
      val target = r.getAs[String]("target_text")
      val nSpans = r.getAs[Long]("n_spans")
      val nMasked = r.getAs[Long]("n_masked")
      totTok += orig.size; totMasked += nMasked
      // parse target into run -> tokens
      val runs = scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[String]]
      var cur = -1
      if (target.nonEmpty) target.split(" ").foreach {
        case Sent(k) => cur = k.toInt
          runs(cur) = scala.collection.mutable.ArrayBuffer.empty
        case t => runs(cur) += t
      }
      assert(runs.keys.toSeq == (0 until nSpans.toInt), s"doc ${r.get(0)}")
      assert(runs.values.map(_.size).sum == nMasked)
      // splice: replace each sentinel in the input by its run
      val rebuilt = input.flatMap {
        case Sent(k) => runs(k.toInt).toSeq
        case t => Seq(t)
      }
      assert(rebuilt == orig, s"doc ${r.get(0)} failed to splice back")
      // input sentinels appear in ascending order exactly once
      val sentsInInput = input.collect { case Sent(k) => k.toInt }
      assert(sentsInInput == (0 until nSpans.toInt))
    }
    // ~15% corruption (5% starts × mean len 3); generous band
    val rate = totMasked.toDouble / totTok
    assert(rate > 0.05 && rate < 0.30, s"corruption rate $rate")
  }
}
