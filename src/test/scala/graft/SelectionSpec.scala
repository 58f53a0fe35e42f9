package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Selection}
import graft.sources.Tables

class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("takeByBudget: phased prefix sum equals the global window exactly") {
    import spark.implicits._
    // enough rows to span many range partitions, adversarial ordering
    val rows = (1 to 5000).map(i => ((i * 2654435761L) % 997, i.toLong, (i % 37) + 1L))
    val df = rows.toDF("score", "id", "cost").repartition(17)
    val got = Selection.takeByBudget(df,
        Seq(col("score").desc, col("id")), col("cost"), 40000L)
      .select("id", "cum_cost").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the naive global window
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cum", sum(col("cost")).over(w))
      .filter(col("cum") <= 40000L)
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, s"phased ${got.size} rows vs global ${ref.size}")
    assert(got.nonEmpty && got.size < rows.size, "budget should bite")
  }

  test("takeByBudget: inclusive boundary — a row is kept only if fully funded") {
    import spark.implicits._
    val df = Seq((3L, 1L, 10L), (2L, 2L, 10L), (1L, 3L, 10L))
      .toDF("score", "id", "cost")
    val keep = Selection.takeByBudget(df,
      Seq(col("score").desc, col("id")), col("cost"), 20L)
    assert(keep.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L), "exactly two rows fit a budget of 20")
    // budget 19: the second row would overrun — only the first survives
    val tight = Selection.takeByBudget(df,
      Seq(col("score").desc, col("id")), col("cost"), 19L)
    assert(tight.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(Selection.takeByBudget(df,
      Seq(col("score").desc, col("id")), col("cost"), 9L).count() == 0)
  }

  test("takeByBudget: selections nest — smaller budget is a prefix of larger") {
    import spark.implicits._
    val rows = (1 to 1000).map(i => ((i * 48271L) % 211, i.toLong, (i % 13) + 1L))
    val df = rows.toDF("score", "id", "cost").repartition(7)
    val small = Selection.takeByBudget(df,
        Seq(col("score").desc, col("id")), col("cost"), 1000L)
      .select("id").collect().map(_.getLong(0)).toSet
    val large = Selection.takeByBudget(df,
        Seq(col("score").desc, col("id")), col("cost"), 3000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "greedy prefix: smaller budget ⊆ larger")
    assert(small.size < large.size)
  }

  test("takeByBudgetPerGroup: equals the naive partitioned window; groups independent") {
    import spark.implicits._
    val rows = (1 to 4000).map(i =>
      (s"g${i % 5}", (i * 2654435761L) % 997, i.toLong, (i % 29) + 1L))
    val df = rows.toDF("grp", "score", "id", "cost").repartition(11)
    val got = Selection.takeByBudgetPerGroup(df, "grp",
        Seq(col("score").desc, col("id")), col("cost"), 3000L)
      .select("id", "cum_cost").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cum", sum(col("cost")).over(w))
      .filter(col("cum") <= 3000L)
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, s"phased ${got.size} rows vs naive ${ref.size}")
    assert(got.nonEmpty && got.size < rows.size, "budget should bite")
    // independence: dropping every other group leaves g0's selection alone
    val solo = Selection.takeByBudgetPerGroup(df.filter(col("grp") === "g0"),
        "grp", Seq(col("score").desc, col("id")), col("cost"), 3000L)
      .select("id").collect().map(_.getLong(0)).toSet
    val g0ids = df.filter(col("grp") === "g0")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(solo == got.keySet.intersect(g0ids))
  }

  test("takeByBudget: no unbounded single-task window in the plan") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toLong, 1L))
      .toDF("score", "id", "cost")
    val plan = Selection.takeByBudget(df,
        Seq(col("score").desc, col("id")), col("cost"), 50L)
      .queryExecution.executedPlan.toString
    // every Window over row data must be partitioned (by __pid); the one
    // empty-partitionSpec window may only run over the |partitions|-row
    // subtotal aggregate (identified by __psum), never the input rows
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.exists(_.contains("__pid")),
      s"expected the pid-partitioned cumsum window:\n$plan")
    val unbounded = windows.filterNot(_.contains("partitionBy"))
      .filterNot(w => w.contains("__pid") || w.contains("__psum"))
    assert(unbounded.isEmpty,
      s"global window over row data (single-task bottleneck):\n$unbounded")
  }

  test("takeByBudgetPerGroup: NULL group values are a kept group, not dropped") {
    import spark.implicits._
    val df = Seq((Some("g1"), 5L, 1L, 10L), (None, 4L, 2L, 10L),
      (None, 3L, 3L, 10L), (Some("g1"), 2L, 4L, 10L))
      .toDF("grp", "score", "id", "cost")
    val got = Selection.takeByBudgetPerGroup(df, "grp",
        Seq(col("score").desc, col("id")), col("cost"), 15L)
      .select("id").collect().map(_.getLong(0)).toSet
    // each group's budget of 15 funds exactly its best row — including
    // the NULL group's (a plain equality join would lose ids 2 and 3)
    assert(got == Set(1L, 2L))
  }

  test("blockDedup: NULL text comes back as (0, \"\"), not nulls") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (2L, "alpha beta"))
    assert(out(2L) == (0L, ""))
  }

  test("quotaPerGroup: caps each group, WindowGroupLimit plan shape") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val capped = Selection.quotaPerGroup(
      docs.select(col("doc_id"), col("source"), col("n_chars")),
      "source", Seq(col("n_chars").desc, col("doc_id")), 5)
    val counts = capped.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= 5))
    // top-5 of a 20-source corpus: the best n_chars per source survive
    val best = docs.orderBy(col("n_chars").desc, col("doc_id"))
      .select("doc_id").limit(1).collect().head.getLong(0)
    assert(capped.filter(col("doc_id") === best).count() == 1,
      "the globally best row must survive its group cap")
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"row_number<=n should rewrite to WindowGroupLimit:\n$plan")
  }

  test("blockDedup: first occurrence wins, casing preserved, empty-doc contract") {
    import spark.implicits._
    val blk1 = (1 to 4).map(i => s"alpha$i").mkString(" ")   // 4-token block
    val blk2 = (1 to 4).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, s"$blk1 $blk2"),                 // doc 1: both blocks original
      (2L, s"${blk1.toUpperCase} gamma1 gamma2 gamma3 gamma4"), // case-insensitive dup of blk1
      (3L, s"$blk2"),                       // fully duplicated doc
      (4L, "delta1 delta2")                 // short doc, one partial block
    ).toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (8L, s"$blk1 $blk2"))
    // doc 2 loses the upper-cased copy of blk1 but keeps ITS casing rules:
    // the surviving gamma block is untouched original text
    assert(out(2L) == (4L, "gamma1 gamma2 gamma3 gamma4"))
    // doc 3's only block is a repeat of doc 1's second block → empty, kept
    assert(out(3L) == (0L, ""))
    assert(out(4L) == (2L, "delta1 delta2"))
  }

  test("takeByBudgets: per-group budget table, null-safe group key") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), 1L, 10L), (Option("a"), 2L, 10L), (Option("a"), 3L, 10L),
      (Option("b"), 4L, 5L), (Option("b"), 5L, 5L),
      (Option.empty[String], 6L, 7L), (Option.empty[String], 7L, 7L)
    ).toDF("g", "id", "cost")
    val budgets = Seq((Option("a"), 20L), (Option("b"), 100L),
      (Option.empty[String], 7L)).toDF("g", "budget")
    val out = Selection.takeByBudgets(df, "g", Seq(col("id")), col("cost"),
        budgets)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // a: ids 1,2 (third overruns 20); b: both fit 100; NULL group's
    // NULL-keyed budget row funds exactly its first row
    assert(out == Seq(1L, 2L, 4L, 5L, 6L), s"got $out")
    spark.catalog.clearCache()
  }

  test("waterFillBudget: closed-form water level on hand caps") {
    import spark.implicits._
    // groups a/b/c hold 10/20/100 tokens; maxEpochs=2 → caps 20/40/200
    val docs = Seq(("a", 4L), ("a", 6L), ("b", 20L), ("c", 60L), ("c", 40L))
      .toDF("g", "cost")
    def run(budget: Long) =
      Selection.waterFillBudget(docs, "g", col("cost"), budget, maxEpochs = 2)
        .collect().map(r => r.getString(0) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // budget 100: a saturates (cap 20), b saturates EXACTLY at the
    // boundary (40·2 = 80 ≤ 100−20), c gets the θ=40 remainder
    val m = run(100L)
    assert(m("a") == ((20L, 20.0, 2.0)), s"a got ${m("a")}")
    assert(m("b") == ((40L, 40.0, 2.0)), s"b got ${m("b")}")
    assert(m("c") == ((200L, 40.0, 0.4)), s"c got ${m("c")}")
    assert(m.values.map(_._2).sum == 100.0, "allocs must spend the budget")
    // budget 1000: everything saturates at its cap
    val all = run(1000L)
    assert(all.values.map(_._2).toSeq.sorted == Seq(20.0, 40.0, 200.0))
    // budget 30: nothing saturates — pure equal split θ=10
    val none = run(30L)
    assert(none.values.map(_._2).forall(_ == 10.0), s"θ split: $none")
    assert(none("c")._3 == 0.1, "epochs = alloc / group_tokens")
    spark.catalog.clearCache()
  }

  test("importanceSelect: target-like docs dominate, deterministic top-k") {
    import spark.implicits._
    // 10 target-vocab docs vs 10 disjoint-vocab junk docs, both long
    // enough that the per-occurrence log-ratio sum dwarfs Gumbel noise
    val targetText = Seq.fill(30)("alpha beta").mkString(" ")
    val junkText = Seq.fill(30)("zzz qqq").mkString(" ")
    val raw = ((1L to 10L).map(i => (i, targetText)) ++
      (11L to 20L).map(i => (i, junkText))).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 5) // held-out style subset
    val out = Selection.importanceSelect(raw, target, "doc_id", "text",
      k = 10)
    // global top-k must be TakeOrderedAndProject, not a full sort
    assert(out.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val rows = out.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 10L).toSeq,
      "ranks must be 1..k")
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 10L).toSeq,
      "every target-like doc must beat every junk doc")
    val byRank = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
      "gkey must be non-increasing in rank")
    // logw sign: target-like positive, junk negative
    val junkScored = Selection.importanceSelect(raw, target, "doc_id",
      "text", k = 20).collect()
    assert(junkScored.filter(_.getLong(0) <= 10).forall(_.getDouble(1) > 0))
    assert(junkScored.filter(_.getLong(0) > 10).forall(_.getDouble(1) < 0))
    // reproducible: same corpus, same coin, same selection
    val again = Selection.importanceSelect(raw, target, "doc_id", "text",
      k = 10).collect()
    assert(again.map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
      .toSet == rows.map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
      .toSet)
    spark.catalog.clearCache()
  }

  test("importanceSelect: paper-scale B=65536 keeps the broadcast plan shape") {
    // DSIR's published configs hash into 10^4-10^5 buckets; the q108
    // oracle runs B=256 for SQL-replay brevity. The scale contract is
    // that B only changes the ≤B-row log-ratio table's SIZE, never the
    // plan: the LR table still broadcasts (65536 rows is nowhere near
    // executor memory) and the corpus still shuffles exactly as often.
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val target = docs.filter(col("lang") === "en")
    def planOf(b: Int): String = {
      val df = Selection.importanceSelect(docs, target, "doc_id", "text",
        k = 50, numBuckets = b)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      spark.catalog.clearCache()
      txt
    }
    def shuffles(plan: String): Int =
      "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(plan)
        .matchData.map(_.matched).toSet.size
    val big = planOf(65536)
    // the bucket-count log-ratio join rides a broadcast, not a shuffle
    assert(big.contains("BroadcastHashJoin"),
      s"LR table must broadcast at B=65536:\n${big.take(2000)}")
    assert(big.contains("TakeOrderedAndProject"),
      "top-k must stay TakeOrderedAndProject at B=65536")
    // plan shape is B-invariant: same shuffle-exchange count as B=256
    assert(shuffles(big) == shuffles(planOf(256)),
      "B must size the broadcast table, never add an exchange")
  }

  test("blockDedup: token conservation across the corpus") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val out = Dedup.blockDedup(docs, "doc_id", "text", 16)
    assert(out.count() == docs.count(), "one row per input doc")
    val cleanTok = out.agg(sum("n_tok_clean")).collect().head.getLong(0)
    val origTok = docs.select(functions.Text.tokenCount(col("text")).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(cleanTok <= origTok && cleanTok > 0)
    // rebuilt text token counts agree with the reported n_tok_clean
    val mismatch = out.filter(col("n_tok_clean") =!= 0 &&
      size(split(col("text_clean"), " ")).cast("long") =!= col("n_tok_clean"))
    assert(mismatch.isEmpty, "text_clean must carry exactly n_tok_clean tokens")
  }

  test("doremiWeights: hand-computed Group-DRO update, clamp, smoothing floor") {
    import spark.implicits._
    // domain a: one 10-token doc with excess 1.0; domain b: one 30-token
    // doc with zero excess; domain c: proxy BELOW ref — must clamp to 0
    val perDoc = Seq(
      ("a", 2.0, 1.0, 10L),
      ("b", 1.5, 1.5, 30L),
      ("c", 1.0, 3.0, 20L)
    ).toDF("src", "proxy", "ref", "n_tok")
    val got = Selection.doremiWeights(perDoc, "src",
        col("proxy"), col("ref"), col("n_tok"), eta = 1.0, smoothing = 0.125)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val aA = 10.0 / 60; val aB = 30.0 / 60; val aC = 20.0 / 60
    val uA = aA * math.exp(1.0); val uB = aB; val uC = aC
    val sum = uA + uB + uC
    def w(u: Double) = math.rint((0.875 * (u / sum) + 0.125 / 3) * 1e6) / 1e6
    assert(got("a") == ((10L, math.rint(aA * 1e6) / 1e6, 1.0, w(uA))))
    assert(got("b")._3 == 0.0 && got("b")._4 == w(uB))
    assert(got("c")._3 == 0.0, "negative excess must clamp to zero")
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-5,
      "weights form a distribution")
    assert(got.values.forall(_._4 >= 0.125 / 3 - 1e-9),
      "smoothing keeps every domain above the uniform floor c/|G|")
    assert(got("a")._4 / got("a")._2 > got("b")._4 / got("b")._2,
      "high-excess domain upweights relative to its baseline share")
  }

  test("doremiWeights: smoothing=0 is the pure exponentiated update; " +
       "fixed-loss T-step composition = one step at eta*T") {
    import spark.implicits._
    val perDoc = Seq(("a", 2.0, 1.0, 10L), ("b", 1.5, 1.5, 30L))
      .toDF("src", "proxy", "ref", "n_tok")
    val pure = Selection.doremiWeights(perDoc, "src",
        col("proxy"), col("ref"), col("n_tok"), eta = 1.0, smoothing = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val aA = 0.25 * math.exp(1.0)
    assert(pure("a") == math.rint(aA / (aA + 0.75) * 1e6) / 1e6)
    // three fixed-loss steps compound to eta*3 (the scaladoc contract):
    // alpha * exp(3*excess) arises equally from one eta=3 update
    val three = Selection.doremiWeights(perDoc, "src",
        col("proxy"), col("ref"), col("n_tok"), eta = 3.0, smoothing = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val a3 = 0.25 * math.exp(3.0)
    assert(three("a") == math.rint(a3 / (a3 + 0.75) * 1e6) / 1e6)
    assert(three("a") > pure("a"), "longer horizon sharpens toward learnable domains")
  }

  test("epochPlan: alpha=1 reproduces budgetFactor epochs everywhere; " +
       "alpha=0 hand case pins cap, epochs, and exact deficit") {
    import spark.implicits._
    // group a: 2 docs x 100 tok; group b: 1 doc x 800 tok → N = 1000
    val docs = Seq(("a", 100L), ("a", 100L), ("b", 800L))
      .toDF("grp", "n_tok")
    // alpha=1: w ∝ n → epochs = budgetFactor for every group, no cap
    val p1 = Selection.epochPlan(docs, "grp", col("n_tok"),
        alpha = 1.0, budgetFactor = 2.0, maxEpochs = 4.0)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(p1("a").getAs[Double]("epochs") == 2.0)
    assert(p1("b").getAs[Double]("epochs") == 2.0)
    assert(p1("a").getAs[Long]("capped") == 0L)
    assert(p1("a").getAs[Double]("tokens_deficit") == 0.0)
    assert(p1("a").getAs[Long]("n_docs") == 2L)
    assert(p1("a").getAs[Long]("n_avail") == 200L)
    // alpha=0: uniform weights 0.5/0.5, budget 2000 → wanted 1000 each;
    // a: raw 5 > cap 4 → epochs 4, deficit 1000 − 4·200 = 200
    // b: raw 1.25 → uncapped, deficit exactly 0
    val p0 = Selection.epochPlan(docs, "grp", col("n_tok"),
        alpha = 0.0, budgetFactor = 2.0, maxEpochs = 4.0)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(p0("a").getAs[Double]("weight") == 0.5)
    assert(p0("a").getAs[Double]("tokens_wanted") == 1000.0)
    assert(p0("a").getAs[Long]("capped") == 1L)
    assert(p0("a").getAs[Double]("epochs") == 4.0)
    assert(p0("a").getAs[Double]("tokens_deficit") == 200.0)
    assert(p0("b").getAs[Long]("capped") == 0L)
    assert(p0("b").getAs[Double]("epochs") == 1.25)
    assert(p0("b").getAs[Double]("tokens_deficit") == 0.0)
  }

  test("unimaxAllocation: closed-form capped prefix equals the paper's " +
       "sequential redistribution; hand case, conservation, all-capped " +
       "surplus, and uniform share across the uncapped") {
    import spark.implicits._
    // hand case: masses 100/200/700, budget = floor(1.5*1000) = 1500,
    // cap 2 epochs → capacities 200/400/1400. Ascending walk:
    //   a: 200*3=600 <= 1500        → capped, alloc 200
    //   b: 400*2=800 <= 1300        → capped, alloc 400
    //   c: 1400*1=1400 > 900        → open,  alloc 900 (epochs 9/7)
    val docs = ((1 to 1) .map(_ => ("a", 100)) ++
                (1 to 1).map(_ => ("b", 200)) ++
                (1 to 1).map(_ => ("c", 700)))
      .toDF("grp", "n_tok")
    val m = Selection.unimaxAllocation(docs, "grp", col("n_tok"),
        budgetNum = 3L, budgetDen = 2L, epochNum = 2L, epochDen = 1L)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(m("a").getAs[Double]("allocation") == 200.0 &&
      m("a").getAs[Long]("capped") == 1L &&
      m("a").getAs[Double]("epochs") == 2.0)
    assert(m("b").getAs[Double]("allocation") == 400.0 &&
      m("b").getAs[Long]("capped") == 1L)
    assert(m("c").getAs[Double]("allocation") == 900.0 &&
      m("c").getAs[Long]("capped") == 0L &&
      math.abs(m("c").getAs[Double]("epochs") - 1.285714) < 1e-9)
    assert(m.values.map(_.getAs[Double]("allocation")).sum == 1500.0,
      "open groups absorb the capped surplus exactly")
    assert(m.values.forall(_.getAs[Double]("budget_left") == 0.0))
    // all-capped: budget 3x total, cap 1 epoch → every group capped at
    // its mass, surplus = B - total reported
    val ac = Selection.unimaxAllocation(docs, "grp", col("n_tok"),
        budgetNum = 3L, budgetDen = 1L, epochNum = 1L, epochDen = 1L)
      .collect()
    assert(ac.forall(_.getAs[Long]("capped") == 1L))
    assert(ac.forall(_.getAs[Double]("budget_left") == 2000.0))
    assert(ac.map(_.getAs[Double]("allocation")).sum == 1000.0)
    // a zero-mass group: capacity 0 → capped at allocation 0, epochs
    // explicitly NULL (not 0/0 = NaN — r20 review)
    val z = Selection.unimaxAllocation(
        docs.unionByName(Seq(("z", 0)).toDF("grp", "n_tok")),
        "grp", col("n_tok"), 3L, 2L, 2L, 1L)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(z("z").getAs[Double]("allocation") == 0.0 &&
      z("z").getAs[Long]("capped") == 1L &&
      z("z").isNullAt(z("z").fieldIndex("epochs")))
    assert(z("c").getAs[Long]("capped") == 0L,
      "the zero-mass group must not disturb the water-fill")
    // randomized pools: the one-window closed form must equal a driver
    // replay of the sequential uniform-redistribution algorithm
    val rnd = new scala.util.Random(8812)
    for (trial <- 1 to 8) {
      val masses = Seq.tabulate(3 + rnd.nextInt(8))(g =>
        (s"g$g", 1 + rnd.nextInt(500)))
      val (bn, bd, en, ed) = (1 + rnd.nextInt(4).toLong,
        1 + rnd.nextInt(2).toLong, 1 + rnd.nextInt(4).toLong,
        1 + rnd.nextInt(3).toLong)
      val df = masses.toDF("grp", "n_tok")
      val got = Selection.unimaxAllocation(df, "grp", col("n_tok"),
          bn, bd, en, ed)
        .collect()
        .map(r => r.getAs[String]("grp") ->
          (r.getAs[Double]("allocation"), r.getAs[Long]("capped")))
        .toMap
      // sequential replay (Chung et al. alg.): ascending capacity,
      // equal share of the remaining budget, cap-and-redistribute —
      // exact integer arithmetic in 1/ed token units; once a group is
      // open every later (larger-capacity) group gets the SAME share
      val sorted = masses.sortBy(p => (p._2, p._1))
      var r2 = masses.map(_._2.toLong).sum * bn / bd * ed
      var left = sorted.size
      val exp2 = scala.collection.mutable.Map.empty[String, (Double, Long)]
      var stillCapping = true
      for ((gname, mass) <- sorted) {
        val capUnits = mass.toLong * en
        if (stillCapping && capUnits * left <= r2) {
          exp2(gname) = (capUnits.toDouble / ed, 1L)
          r2 -= capUnits
          left -= 1
        } else {
          stillCapping = false
          exp2(gname) = (r2.toDouble / (ed.toDouble * left), 0L)
        }
      }
      for ((gname, (alloc, capped)) <- exp2) {
        val (ga, gc) = got(gname)
        assert(gc == capped && math.abs(ga -
          math.rint(alloc * 1e6) / 1e6) < 1e-9,
          s"trial $trial $gname: got ($ga, $gc) vs sequential " +
            s"($alloc, $capped)")
      }
    }
  }
}
