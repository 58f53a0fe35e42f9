package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency summaries over UNBOUNDED token domains.
  *
  * An exact vocabulary count ([[graft.plans.VectorOps]]' n-gram path,
  * q77) shuffles one row per distinct term — fine for word vocabularies,
  * ruinous when the domain is open (URLs, n-grams, user ids: 10^10+
  * distinct keys at 100 TB). The sketch path here bounds the exchange by
  * the SKETCH size instead of the domain size, at the price of a
  * frequency threshold below which items may be missed — the classic
  * heavy-hitters trade (Misra & Gries 1982; the merge argument is the
  * standard distributed summaries result, e.g. Agarwal et al. 2013,
  * "Mergeable Summaries").
  */
object Frequency {

  /** Top-k tokens by EXACT count, found via a per-partition Misra-Gries
    * sketch of `m` counters + an exact recount of the surviving
    * candidates. Guarantee: an item with global count > N/(m+1) must
    * exceed N_p/(m+1) in at least one partition p (if it lost everywhere,
    * summing the per-partition bounds caps its total at N/(m+1)), and
    * MG(m) never evicts a local (m+1)-fraction item — so the candidate
    * union contains every global heavy hitter, and after the exact
    * recount the returned top-k IS the true top-k whenever the k-th true
    * count clears N/(m+1). Size `m` accordingly: m ≈ k/θ for the
    * smallest expected k-th frequency share θ (Zipf corpora clear this
    * with small m; a uniform domain is the adversarial case and needs
    * m ≈ domain size — at which point use the exact path).
    *
    * Scale shape: the token stream is touched twice, both times
    * narrowly — once through the in-partition sketch (bounded memory: m
    * counters, no matter how many distinct tokens stream past), once
    * through a broadcast semi-join against the ≤ m·|partitions|
    * candidates. The only shuffles move candidate rows: the distinct on
    * the sketch output and the partially-aggregated recount, both
    * bounded by the candidate set, never the domain. Top-k is
    * TakeOrderedAndProject; the rank window sees k rows. Output:
    * (tok, cnt, rank, exact) — counts are exact, not sketch
    * estimates, and `exact` (0/1, same value on every row) is the
    * RUNTIME check of the guarantee's precondition: 1 iff the
    * smallest returned count clears N/(m+1) (compared as
    * cnt·(m+1) > N — integer arithmetic, no division ulp). When it
    * is 0, the returned rows are still exactly-counted candidates,
    * but an undiscovered token could in principle outrank them —
    * callers gate on the flag instead of trusting the guarantee
    * blind. The total-N aggregate rides the existing token pass
    * (1-row broadcast gate); the min rides the k-row rank window. */
  def heavyHitters(docs: DataFrame, textCol: String, m: Int,
                   k: Int): DataFrame = {
    require(m >= 1, "m must be positive")
    require(k >= 1, "k must be positive")
    import docs.sparkSession.implicits._
    val toks = docs.select(explode(
      graft.functions.Text.tokens(lower(col(textCol)))).as("tok"))
    val candidates = toks.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counts.get(t) match {
          case Some(v) => counts(t) = v + 1
          case None if counts.size < m => counts(t) = 1L
          case None => // full table, new item: the MG decrement step
            counts.mapValuesInPlace((_, v) => v - 1)
            counts.filterInPlace((_, v) => v > 0)
        }
      }
      counts.keysIterator
    }.toDF("tok").distinct()
    val total = toks.agg(count(lit(1)).as("__n"))
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    toks.join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
      .crossJoin(broadcast(total))
      .withColumn("exact",
        (min(col("cnt")).over(wAll) * (m + 1) > col("__n")).cast("long"))
      .drop("__n")
  }

  /** The d×(seed,bucket) cell coordinates of one token — the fan-out
    * shared by [[countMinBuild]] and [[countMinEstimate]] (build and
    * probe MUST hash identically or estimates are garbage). Buckets go
    * through [[Sampling.hexInt]] (the package's single md5-hex6 coin),
    * so an external SQL engine replays every cell address exactly. */
  /** Fan a row out to its `depth` (seed, bucket) cells. The md5-coin
    * buckets are computed in a PROJECT step (`bucketCols`) and only then
    * exploded: expressions placed inside a Generate are evaluated
    * without whole-stage codegen's subexpression elimination, which made
    * the original explode(array(struct(..hexInt..))) formulation ~17×
    * slower than the identical arithmetic in a projection (measured
    * 14.5 s vs 0.86 s on a 270k-token corpus) — the generator must fan
    * out pre-computed columns, never compute under the generator. */
  private def cmsCells(df: DataFrame, tokCol: String, keep: Seq[String],
                       depth: Int, width: Int): DataFrame = {
    val buckets = (0 until depth).map { s =>
      pmod(Sampling.hexInt(col(tokCol), ":cms" + s), lit(width)).cast("long")
        .as(s"__b$s")
    }
    df.select(keep.map(col) ++ buckets: _*)
      .select(keep.map(col) :+ explode(array((0 until depth).map { s =>
        struct(lit(s.toLong).as("seed"), col(s"__b$s").as("bucket"))
      }: _*)).as("c"): _*)
      .select(keep.map(col) :+ col("c.seed").as("seed") :+
        col("c.bucket").as("bucket"): _*)
  }

  /** Count-Min sketch build (Cormode & Muthukrishnan 2005): `depth`
    * hash rows × `width` counters over the token stream. Where
    * [[heavyHitters]] answers "which items are frequent", the CMS
    * answers point queries — "how often did THIS item occur" — for any
    * item, with a bounded overestimate, in O(depth·width) space.
    *
    * Scale shape: one narrow pass — each token instance fans out to its
    * `depth` cells as a codegen'd projection, then a partial-aggregated
    * groupBy whose exchange carries at most depth·width counter rows no
    * matter how many distinct tokens stream past (the same
    * domain-vs-sketch bound as the MG sketch above). Guarantee:
    * estimate ≥ true count always (collisions only add), and
    * ≤ true + e·N/width with probability 1 − e^−depth per query.
    * Returns (seed, bucket, cnt) — mergeable across corpora by summing
    * cells, the property that makes the sketch a streaming/incremental
    * citizen. */
  def countMinBuild(docs: DataFrame, textCol: String, depth: Int,
                    width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    val toks = docs.select(explode(
      graft.functions.Text.tokens(lower(col(textCol)))).as("tok"))
    cmsCells(toks, "tok", Seq.empty, depth, width)
      .groupBy("seed", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinBuild]] sketch: for each
    * query token, min over its `depth` cells. The sketch (≤ depth·width
    * rows — counters, not corpus) is BROADCAST, so probing any number of
    * query tokens is a map-side join plus a |queries|-bounded aggregate;
    * the corpus is not touched at all. Tokens absent from the corpus
    * estimate as ≥ 0 (empty cells count 0 via the left join). */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame,
                       tokCol: String, depth: Int, width: Int): DataFrame =
    cmsCells(queries.select(col(tokCol).as("tok")).distinct(),
        "tok", Seq("tok"), depth, width)
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Merge [[countMinBuild]] sketches by CELL-WISE SUM — the linearity
    * that makes the CMS a streaming/incremental citizen: counters are
    * per-cell token tallies, so sketches built over DISJOINT corpus
    * slices sum to exactly the sketch of their union (same md5-coin
    * cell addresses on every engine and batch — not approximately, cell
    * for cell), and estimates from the merged sketch equal monolithic
    * estimates. Per-batch cost is the batch's own build; the merge
    * exchange is bounded by depth·width counters per input sketch
    * regardless of corpus size. All inputs MUST share (depth, width)
    * and the cell-address salt — summing differently-shaped sketches is
    * meaningless, so mismatched schemas fail the union. */
  def countMinMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy("seed", "bucket").agg(sum(col("cnt")).as("cnt"))
  }

  /** HyperLogLog distinct-count sketch per group (Flajolet et al. 2007,
    * via Spark's built-in DataSketches HLL aggregates) — the
    * CARDINALITY member of the sketch family: [[heavyHitters]] answers
    * "which items are frequent", [[countMinBuild]] "how often did this
    * item occur", this one "how many DISTINCT items are there" — in
    * 2^lgK registers no matter how many distinct values stream past.
    * The open-domain case from the scaladoc above (n-grams, URLs,
    * user ids: 10^10+ keys at 100 TB) is exactly where the exact
    * `countDistinct` path's one-row-per-key exchange dies; the HLL
    * exchange is one 2^lgK-register blob per group, relative error
    * ≈ 1.04/√2^lgK.
    *
    * Output: (groupCols…, sketch BINARY). Sketches over corpus SLICES
    * merge by register-wise max ([[hllMergeEstimate]]) to exactly the
    * union's sketch — the same mergeable-summaries citizenship as the
    * CMS, proved under oracle by q134. */
  def hllSketch(elems: DataFrame, elemCol: String, groupCols: Seq[String],
                lgK: Int): DataFrame = {
    require(lgK >= 4 && lgK <= 21, "lgK must be in [4, 21] (DataSketches bound)")
    if (groupCols.isEmpty)
      elems.agg(hll_sketch_agg(col(elemCol), lit(lgK)).as("sketch"))
    else
      elems.groupBy(groupCols.map(col): _*)
        .agg(hll_sketch_agg(col(elemCol), lit(lgK)).as("sketch"))
  }

  /** Merge [[hllSketch]] blobs (register-wise max — the HLL union) and
    * estimate the union's cardinality. What merging guarantees (q134
    * pins each under oracle; found by measurement, not assumed):
    * GROUPING INVARIANCE — any way of slicing the corpus into ≥2
    * sketches merges to the identical estimate (register max is order-
    * and shape-free), and ASSOCIATIVITY — union of unions equals the
    * flat union byte-for-byte, which is what makes incremental
    * accumulation exact. What it does NOT guarantee: estimate equality
    * with the monolithic STREAM-built sketch — DataSketches estimates
    * a stream build with its HIP accumulator but a multi-input union
    * with the composite estimator (~0.1% apart on identical registers;
    * a 1-input union even passes HIP through, so the boundary is
    * "did ≥2 sketches actually merge", not "did it pass the union
    * operator"). All inputs must share lgK — a width mismatch fails
    * loudly rather than silently degrading precision. */
  def hllMergeEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(hll_sketch_estimate(
      hll_union_agg(col("sketch"), lit(false))).as("estimate"))

  /** CONTENT NOVELTY CURVE over an ordered sequence of corpus batches —
    * the data-collection saturation readout: how many of each batch's
    * distinct shingles were never seen in ANY earlier batch, and the
    * cumulative vocabulary the crawl has accumulated. When
    * novelty_frac flattens toward 0, new data is re-collecting old
    * content — the signal to stop paying for a source (and the
    * corpus-level cousin of the per-pair overlap question q183
    * answers).
    *
    * Scale shape: shingles hash to 64-bit ids before any shuffle (the
    * jaccardPairs discipline); first-seen batch is ONE map-side-
    * combined min aggregate at hash grain; per-batch distinct counts
    * ride the same hashed stream; the cumulative sum is a window over
    * the bounded |batches|-row result (the doremiWeights discipline).
    * Output per batch: (batch, n_distinct, n_novel, novelty_frac,
    * cum_vocab). */
  def noveltyCurve(docs: DataFrame, batchCol: Column, textCol: String,
                   shingleLen: Int = 3): DataFrame = {
    val sh = docs.select(batchCol.cast("long").as("batch"),
        explode(graft.functions.Text.shingles(
          lower(col(textCol)), shingleLen)).as("s"))
      .select(col("batch"), xxhash64(col("s")).as("h"))
      .distinct()
    val novel = sh.groupBy("h").agg(min("batch").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("n_novel"))
    val totals = sh.groupBy("batch").agg(count(lit(1)).as("n_distinct"))
    val w = Window.orderBy("batch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals.join(novel, Seq("batch"), "left")
      .select(col("batch"), col("n_distinct"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_frac",
        round(col("n_novel").cast("double") / col("n_distinct"), 6))
      .withColumn("cum_vocab", sum(col("n_novel")).over(w))
  }

  /** K-minimum-values sketch of each corpus slice's distinct-shingle
    * set (Beyer et al. 2007, "On Synopses for Distinct-Value Estimation
    * Under Multiset Operations") — the SET-RESEMBLANCE member of the
    * sketch family: HLL answers "how many distinct", this one answers
    * "how ALIKE are two slices" ([[kmvOverlapMatrix]]), the
    * source-curation question (is src_a just a re-crawl of src_b?
    * which pairs of corpus snapshots share material?) that pairwise
    * MinHash dedup is too fine-grained for and exact distinct-set
    * intersection cannot afford (one row per distinct shingle per
    * pair at 100 TB).
    *
    * The sketch is the k lexicographically-smallest distinct
    * `md5(shingle)` digests per slice. md5's hex form orders
    * identically as a string and as the 128-bit value (fixed-width
    * lowercase hex), which is what lets the DuckDB oracle replay the
    * chain byte-for-byte — a seeded 64-bit hash would be
    * engine-private (the q25 problem) where md5 is common ground.
    *
    * Scale shape: one corpus scan → shingle kernel → hash projection;
    * the bottom-k is a rank window WHOSE FILTER SPARK PUSHES INTO A
    * PARTIAL WindowGroupLimit — each map task forwards at most k
    * digests per slice, so the exchange moves ≤ k·|tasks| rows per
    * slice, never the shingle domain (the [[heavyHitters]] discipline:
    * sketch-bounded, not domain-bounded). dense_rank (not row_number)
    * so pre-exchange duplicates of one digest cannot crowd distinct
    * values out of the k; the post-filter distinct then collapses
    * them. Output: (`groupCol`, h) with ≤ k rows per group. */
  /** Vocabulary-coverage / out-of-vocabulary report per corpus slice:
    * build the top-`vocabSize` token vocabulary over the WHOLE corpus
    * (count desc, token asc — fully deterministic), then measure what
    * fraction of each slice's token stream falls outside it. This is
    * the tokenizer-design question ("what vocab size covers 99.x% of
    * each language?") and the per-language fairness audit (a shared
    * vocab under-serves low-resource slices first — their OOV rate is
    * where it shows).
    *
    * Scale shape: one token-grain aggregate builds the count table
    * (word vocabularies are the bounded-domain case of the scaladoc
    * above — the exact path is right here); top-V is
    * TakeOrderedAndProject (map-side limited, V rows to the driver
    * plan, not the domain); membership is a BROADCAST left join of the
    * V-row vocab against a second narrow token pass; per-slice rates
    * are one group aggregate. Output: (`groupCol`, n_tokens, n_oov,
    * oov_frac). */
  def vocabCoverage(docs: DataFrame, textCol: String, groupCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val toks = docs.select(col(groupCol),
      explode(graft.functions.Text.tokens(lower(col(textCol)))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1L).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  def kmvSketches(docs: DataFrame, groupCol: String, textCol: String,
                  k: Int, shingleLen: Int = 3): DataFrame = {
    require(k >= 1, "k must be positive")
    val hashed = docs.select(col(groupCol),
        explode(graft.functions.Text.shingles(
          lower(col(textCol)), shingleLen)).as("s"))
      .select(col(groupCol), md5(col("s").cast("binary")).as("h"))
    val w = Window.partitionBy(groupCol).orderBy("h")
    hashed.withColumn("rnk", dense_rank().over(w))
      .filter(col("rnk") <= k).drop("rnk")
      .distinct()
  }

  /** Merge [[kmvSketches]] blobs from corpus SLICES into the union's
    * sketch — the mergeable-summaries citizenship the CMS
    * ([[countMinMerge]], q129) and HLL ([[hllMergeEstimate]], q134)
    * members already carry: bottom-k of a union is the bottom-k of the
    * concatenated bottom-k's (any digest outside a part's bottom-k is
    * outside the union's), so incremental corpus builds maintain the
    * sketch per batch and NEVER rescan history. Exactly the
    * [[kmvSketches]] output schema — composes with
    * [[kmvOverlapMatrix]] unchanged. Grouping-invariant and
    * associative by the same argument (set union is), spec-pinned
    * equal to the monolithic rebuild. */
  def kmvMergeSketches(sketches: DataFrame, groupCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = Window.partitionBy(groupCol).orderBy("h")
    sketches.distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k).drop("rnk")
  }

  /** Pairwise corpus-overlap matrix from [[kmvSketches]]: for every
    * slice pair a < b, the KMV Jaccard estimate of their distinct-
    * shingle sets. Estimator (Beyer et al. 2007 §4): merge the two
    * bottom-k sketches, keep the k smallest distinct digests W of the
    * union; J ≈ |W ∩ S_a ∩ S_b| / |W|. When both slices hold fewer
    * than k distinct shingles the sketches ARE the sets and the
    * estimate is exact; otherwise standard error ≈ 1/√k.
    *
    * Scale shape: everything below runs at SKETCH grain — the corpus
    * is never touched. |G| slices → |G|·(|G|−1)/2 pair rows (model
    * grain: slices are sources/snapshots, counted in tens); each
    * sketch row is replicated once per pair containing its slice
    * (≤ k·|G|·(|G|−1) rows total), merged by (pair, digest), ranked,
    * and aggregated. The pair enumeration is a broadcast nested-loop
    * over the |G|-row distinct-slice set — the audited bounded-cross
    * pattern, not a data cross. Output: (src_a, src_b, denom, n_both,
    * j_est) — denom = |W| = min(k, |union observed|), j_est an exact
    * IEEE ratio of the two BIGINTs, rounded at 6. */
  def kmvOverlapMatrix(sketches: DataFrame, groupCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val g = sketches.select(col(groupCol)).distinct()
    val pairs = g.select(col(groupCol).as("src_a"))
      .join(g.select(col(groupCol).as("src_b")),
        col("src_a") < col("src_b"))
    val sa = sketches.select(col(groupCol).as("src_a"), col("h"))
    val sb = sketches.select(col(groupCol).as("src_b"), col("h"))
    val tagged = pairs.join(sa, Seq("src_a"))
        .select(col("src_a"), col("src_b"), col("h"), lit(1).as("in_a"),
          lit(0).as("in_b"))
      .unionByName(pairs.join(sb, Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("h"), lit(0).as("in_a"),
          lit(1).as("in_b")))
    val merged = tagged.groupBy("src_a", "src_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy("src_a", "src_b").orderBy("h")
    merged.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("denom"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_both"))
      .withColumn("j_est",
        round(col("n_both").cast("double") / col("denom"), 6))
  }

  /** Top-k collocations by pointwise mutual information — the phrase/
    * multi-word-expression miner behind tokenizer-vocabulary and
    * quality audits (Church & Hanks 1990): for adjacent token pairs,
    * PMI = ln( (c_xy/N_bi) / ((c_x/N_u)(c_y/N_u)) ), with a minimum
    * pair count to kill the low-frequency PMI explosion.
    *
    * Scale shape: one shuffle at BIGRAM grain with map-side combine
    * (the classic open-domain exchange — at 10^10 distinct bigrams
    * this is the cost center and nothing larger moves: pairs are
    * (2 strings, long)); unigram counts ride a token-grain aggregate
    * of the same projection; the two joins are bigram-table ×
    * unigram-table at key grain; totals are 1-row broadcast gates;
    * top-k plans as TakeOrderedAndProject, never a full sort.
    *
    * Determinism: PMI is ln of a ratio of exact integer products —
    * identical counts give bit-identical doubles in any engine with a
    * correctly-rounded ln, so the ranking (pmi desc, then x, y asc)
    * replays exactly; output pmi rounded at 6. Overflow note:
    * c_xy·N_u² caps at ~(10^11)³ >> 2^63, so the ratio is formed in
    * DOUBLE space as (c_xy/N_bi)/((c_x/N_u)·(c_y/N_u)) — each factor
    * an exact-int ratio. */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    val toks = docs.select(
      graft.functions.Text.tokens(lower(col(textCol))).as("__ts"))
    val uni = toks.select(explode(col("__ts")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c_tok"))
    val bi = toks.select(explode(
        zip_with(
          slice(col("__ts"), lit(1), greatest(size(col("__ts")) - 1, lit(0))),
          slice(col("__ts"), lit(2), greatest(size(col("__ts")) - 1, lit(0))),
          (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val nu = uni.agg(sum(col("c_tok")).as("n_uni"))
    val nb = bi.agg(sum(col("c_xy")).as("n_bi"))
    val scored = bi.filter(col("c_xy") >= minCount)
      .join(uni.select(col("tok").as("x"), col("c_tok").as("c_x")), Seq("x"))
      .join(uni.select(col("tok").as("y"), col("c_tok").as("c_y")), Seq("y"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .withColumn("pmi", log(
        (col("c_xy").cast("double") / col("n_bi").cast("double")) /
          ((col("c_x").cast("double") / col("n_uni").cast("double")) *
           (col("c_y").cast("double") / col("n_uni").cast("double")))))
    scored.orderBy(col("pmi").desc, col("x"), col("y")).limit(k)
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        round(col("pmi"), 6).as("pmi"))
  }

  /** Per-group Zipf fit — closed-form OLS of ln(count) on ln(rank)
    * over each group's top-R tokens: natural language sits near slope
    * −1 (Zipf 1949); machine-generated or templated sources flatten or
    * steepen, making the slope (with its r²) a cheap source-quality
    * signal that needs no reference corpus.
    *
    * Scale shape: the corpus collapses to (group, token) counts in one
    * map-side-combined shuffle; the rank window runs per group at
    * VOCAB grain with a map-side WindowGroupLimit (each partition
    * forwards ≤ R rows per group); the five OLS moments are one
    * |groups|·R → |groups| aggregate. Nothing corpus-sized moves
    * after the first exchange.
    *
    * Determinism: ranks tie-break by token; ln inputs are exact
    * integer counts/ranks so both engines see identical doubles; the
    * moment sums follow the established ordering + 6dp-rounding
    * convention. r² is pinned to 0 when the count variance is zero
    * (all top-R counts equal — the 0/0 case). */
  def zipfFit(docs: DataFrame, groupCol: String, textCol: String,
              topR: Int): DataFrame = {
    require(topR >= 2, "need at least two rank points")
    val cnt = docs.select(col(groupCol), explode(
        graft.functions.Text.tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("c"))
    val ranked = cnt.withColumn("r", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("c").desc, col("tok"))))
      .filter(col("r") <= topR)
      .select(col(groupCol), log(col("r").cast("double")).as("lx"),
        log(col("c").cast("double")).as("ly"))
    val m = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
      sum(col("lx") * col("lx")).as("sxx"),
      sum(col("lx") * col("ly")).as("sxy"),
      sum(col("ly") * col("ly")).as("syy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    val slope = covN / varX
    m.select(col(groupCol), col("n").cast("long").as("n_terms"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"),
      round(when(varY > 0, covN * covN / (varX * varY))
        .otherwise(lit(0.0)), 6).as("r2"))
  }

  /** Per-document top-k TF-IDF keywords — the corpus-indexing /
    * doc-summarization readout (what q150's per-GROUP distinctive terms
    * are at document grain). IDF is the BM25 rational form
    * (N − df + 0.5)/(df + 0.5) rather than a logarithm, deliberately:
    * it is order-equivalent to log-idf for ranking (both strictly
    * decrease in df), and it makes every score a product of one
    * correctly-rounded IEEE division and one multiplication of exact
    * operands — bit-identical on every engine, so the RANKING (ties →
    * token) hash-replays with no epsilon anywhere, where a libm log
    * ulp could flip a rank.
    *
    * Scale shape: one (doc, token)-grain count, one token-grain df
    * aggregate joined back (token ids could be hashed at 100 TB; kept
    * as strings here because the output IS the token), N as a 1-row
    * broadcast, and the per-doc top-k plans as WindowGroupLimit —
    * map-side limit k before the rank exchange. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val tok = docs.select(col(idCol).as("id"),
      explode(graft.functions.Text.tokens(lower(col(textCol)))).as("tok"))
    val tf = tok.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfTab, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        (((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("score").desc, col("tok"))))
      .filter(col("rank") <= k)
      .select(col("id"), col("tok"), col("tf"),
        round(col("score"), 6).as("score"), col("rank").cast("long").as("rank"))
  }

  /** Exponentially-DECAYED top-k — the "trending now" counter every
    * event pipeline keeps: each event weighs 2^−age_buckets where
    * age_buckets = ⌊(t_max − ts) / halflife⌋, so one halflife ago counts
    * half. Bucketed (integer) decay instead of continuous exp() is
    * deliberate: weights are exact powers of two on a 2^−40 grid
    * (buckets clamp at 40 — beyond that a weight is below any
    * realizable ulp), ACCUMULATED AS INTEGER UNITS of 2^−40 in
    * DECIMAL(38,0) — a double sum is only exact while a key's mass
    * stays under 2^13 (53-bit significand over the 2^−40 grid); a hot
    * key with ~8k near-full-weight events would make the sum rounding-
    * and order-dependent. Decimal units make per-key sums EXACT for
    * any event count (2^40 units/event × 10^25 events fits 38 digits),
    * independent of partial-aggregation order; the RANK compares the
    * exact unit sums, and only the published `decayed_w` converts to
    * double (one IEEE rounding of an exact integer — identical in any
    * engine) — so the ranking hash-replays, the same determinism
    * device as the md5 hex grid (Sampling.hexInt). t_max comes from
    * the data in-plan (1-row broadcast gate), so the operator is a
    * pure function of its input — streaming deployments pin it to the
    * watermark instead.
    *
    * Scale shape: one key-grain aggregate (map-side partials — weights
    * add) + TakeOrderedAndProject for the top-k; the rank window runs
    * over k rows, not the corpus. */
  def decayedTopK(events: DataFrame, keyCol: String, tsCol: String,
                  halflifeSec: Long, k: Int): DataFrame = {
    require(halflifeSec >= 1, "halflifeSec must be positive")
    require(k >= 1, "k must be positive")
    val mx = events.agg(max(unix_micros(col(tsCol))).as("mx"))
    val top = events
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("us"))
      .crossJoin(broadcast(mx))
      .withColumn("bucket",
        least(expr(s"(mx - us) div ${halflifeSec * 1000000L}"), lit(40L)))
      // integer units of 2^-40: weight 2^-bucket = 2^(40-bucket) units
      .withColumn("wu", expr("shiftleft(1L, cast(40 - bucket as int))")
        .cast("decimal(38,0)"))
      .groupBy("key")
      .agg(sum(col("wu")).as("wu_sum"), count(lit(1)).as("n_events"))
      .orderBy(col("wu_sum").desc, col("key"))
      .limit(k)
    top.withColumn("rank", row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("wu_sum").desc, col("key"))).cast("long"))
      .withColumn("decayed_w",
        col("wu_sum").cast("double") / lit(1099511627776.0))
      .select(col("key"), col("decayed_w"), col("n_events"), col("rank"))
  }

  /** GRID-ALIGNED decayed counts — the MERGEABLE form of
    * [[decayedTopK]] (the mergeable-summaries citizenship the KMV /
    * CMS / HLL stores have): state is (key, grid_bucket, n) where
    * grid_bucket = ⌊ts / halflife⌋ — a pure function of the EVENT, not
    * of t_max — so two batches' states merge by (key, bucket) addition
    * and history is never rescanned. [[decayedTopK]] cannot be
    * maintained incrementally: its age buckets move with t_max, so
    * every arrival re-ages all history. The price is grid-aligned
    * decay (weight 2^−(b_max − b) steps at halflife GRID boundaries
    * rather than exactly t_max − halflife) — the standard sliding-
    * window-counter trade, semantics documented, not hidden.
    *
    * Scale shape: one (key, bucket)-grain aggregate per batch (state ∝
    * keys × active buckets, and buckets older than 40 halflives all
    * weigh exactly 2^−40 — the clamp bounds the evaluation, the state
    * stays exact). All-integer. */
  def decayedBucketCounts(events: DataFrame, keyCol: String, tsCol: String,
                          halflifeSec: Long): DataFrame = {
    require(halflifeSec >= 1, "halflifeSec must be positive")
    events.select(col(keyCol).as("key"),
        expr(s"unix_micros(`$tsCol`) div ${halflifeSec * 1000000L}")
          .as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Merge two [[decayedBucketCounts]] states — (key, bucket) addition;
    * associative and commutative, so shard/batch/epoch groupings all
    * produce the identical state. */
  def mergeDecayedCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("key", "bucket").agg(sum(col("n")).as("n"))

  /** Evaluate a [[decayedBucketCounts]] state to the same table
    * [[decayedTopK]] publishes (grid-aligned semantics): weight
    * 2^−min(b_max − b, 40) per event, accumulated as exact integer
    * units of 2^−40 in DECIMAL(38,0), ranked on the exact unit sum;
    * b_max comes from the state in-plan (1-row broadcast) — streaming
    * deployments pin it to the watermark bucket instead. */
  def decayedTopKFromCounts(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val mx = counts.agg(max(col("bucket")).as("bmax"))
    val top = counts.crossJoin(broadcast(mx))
      .withColumn("age", least(col("bmax") - col("bucket"), lit(40L)))
      .withColumn("wu", (col("n").cast("decimal(38,0)") *
        expr("shiftleft(1L, cast(40 - age as int))").cast("decimal(38,0)"))
        .cast("decimal(38,0)"))
      .groupBy("key")
      .agg(sum(col("wu")).as("wu_sum"), sum(col("n")).as("n_events"))
      .orderBy(col("wu_sum").desc, col("key"))
      .limit(k)
    top.withColumn("rank", row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("wu_sum").desc, col("key"))).cast("long"))
      .withColumn("decayed_w",
        col("wu_sum").cast("double") / lit(1099511627776.0))
      .select(col("key"), col("decayed_w"), col("n_events"), col("rank"))
  }
}
