package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training corpora.
  *
  * Unlike `df.sample()` (RNG-seeded per partition split — resample on
  * repartition, not reproducible across engines), hash sampling keys the
  * decision on the ROW CONTENT: the same document lands in the sample on
  * every run, on every engine, at any partitioning — which is what makes
  * train/eval splits and cross-system audits reproducible. Rate
  * granularity is 1/256 (first two hex chars of md5).
  */
object Sampling {

  /** Hex prefixes covering round(rate·256) of the 256 two-char buckets. */
  private[operators] def prefixes(rate: Double): Seq[String] = {
    require(rate >= 0 && rate <= 1)
    val n = math.round(rate * 256).toInt
    (0 until n).map(i => f"$i%02x")
  }

  /** Keep rows whose md5(keyCol) falls in the first round(rate·256)
    * buckets. Non-string keys are cast to their canonical string form
    * first (md5 takes binary/string input only). */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    val p = prefixes(rate)
    if (p.isEmpty) df.limit(0)
    else df.filter(substring(md5(keyCol.cast("string")), 1, 2).isin(p: _*))
  }

  /** Per-stratum rates (e.g. downsample dominant languages harder):
    * unlisted strata keep `defaultRate`. */
  def stratifiedHashSample(df: DataFrame, keyCol: Column, strataCol: Column,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    val bucket = substring(md5(keyCol.cast("string")), 1, 2)
    val pred = rates.toSeq.sortBy(_._1).foldRight(
      bucket.isin(prefixes(defaultRate): _*): Column) { case ((s, r), els) =>
      when(strataCol === s, bucket.isin(prefixes(r): _*)).otherwise(els)
    }
    df.filter(pred)
  }

  /** The integer behind the coin: the first six hex digits of
    * md5(key + salt) as an int in [0, 16^6) — digit→int goes through
    * `ascii` (identical in Spark and DuckDB, so a SQL oracle replays
    * the value exactly — the Packing.epochShuffle replayability
    * discipline). Gates that can phrase their thresholds as integers
    * on this grid ([[assignSplit]]) compare HERE and never touch a
    * float. This is the package's SINGLE definition of the
    * replay-critical digit arithmetic — [[Selection]]'s openCoin and
    * featureBucket derive from it rather than restating it. */
  private[operators] def hexInt(keyCol: Column, salt: String): Column = {
    val h = md5(concat(keyCol.cast("string"), lit(salt)))
    (0 until 6).map { i =>
      val c = ascii(substring(h, i + 1, 1))
      (when(c >= 97, c - 87).otherwise(c - 48)) * lit(1 << (4 * (5 - i)))
    }.reduce(_ + _)
  }

  /** Deterministic train/val/test split assignment — the corpus-split
    * step every training pipeline runs before anything else. Each row's
    * content-hash coin is compared against the splits' CUMULATIVE
    * weights, but the comparison happens on the 16^6 integer grid:
    * thresholds are `round(cum·16^6)` computed ONCE at plan build, so
    * any weight vector (0.8/0.1/0.1 included — sums that are not exact
    * binary doubles) is realized exactly, identically on every run,
    * engine, and partitioning, with quantization error ≤ 6e-8 per
    * split. Pure narrow filter — no shuffle touches the corpus, and a
    * row's assignment never depends on other rows, so splits stay
    * stable under corpus growth (the property that keeps eval sets
    * uncontaminated across dataset versions). Appends `split`. */
  def assignSplit(df: DataFrame, keyCol: Column,
                  splits: Seq[(String, Double)],
                  salt: String = ":split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = cums.init.map(c => math.round(c * (1 << 24)))
    val v = hexInt(keyCol, salt)
    val split = splits.init.zip(thresholds).foldRight(
      lit(splits.last._1)) { case (((name, _), t), els) =>
      when(v < t, name).otherwise(els)
    }
    df.withColumn("split", split)
  }

  /** Uniform-in-[0,1) derived from the first six hex digits of
    * md5(key + salt) — the deterministic coin for rate gates whose rates
    * are computed IN-PLAN (the 1/256 prefix trick needs a driver-side
    * rate). Granularity 16^-6 ≈ 6e-8. */
  private[operators] def hashUniform(keyCol: Column, salt: String): Column =
    hexInt(keyCol, salt).cast("double") / lit((1 << 24).toDouble)

  /** [[hashUniform]] shifted off the closed endpoint — uniform in
    * (0, 1), so ln(u) / u^(1/w) are finite: (v + 0.5)/16^6, every term
    * an exact binary double ((2v+1)/2^25 has a 25-bit significand).
    * The coin for transforms that blow up at 0 (Gumbel, A-ES keys). */
  private[operators] def openCoin(keyCol: Column, salt: String): Column =
    (hexInt(keyCol, salt).cast("double") + lit(0.5)) /
      lit((1 << 24).toDouble)

  /** TEMPERATURE-REWEIGHTED mixture resampling — the data-mixing step of
    * training-corpus assembly: group proportions p_g are flattened to
    * q_g ∝ p_g^alpha (alpha < 1 upweights rare languages/sources — the
    * multilingual-sampling rule of the XLM-R / mT5 recipes), and the
    * corpus is downsampled to `targetFrac` of its rows with the flattened
    * distribution, via per-group rates r_g = min(1, targetFrac·q_g/p_g)
    * and a deterministic content-hash coin (same row kept on every run,
    * engine, and partitioning).
    *
    * Scale shape: the corpus is NEVER shuffled — one tiny per-group
    * count aggregate (|groups| rows) broadcasts its rates back onto the
    * scan, and the gate itself is a narrow filter. At 100 TB this is a
    * single pass. alpha = 0.5 routes through `sqrt` (correctly-rounded
    * IEEE on every engine — exact oracle parity); other alphas use `pow`
    * (≤ 1 ulp, boundary-flip odds vs the 16^-6 coin grid ≈ 0).
    *
    * Note r_g is exact only when rows-per-group ≫ 1/r_g (hash-gate
    * binomial variance; the q52 contract). Groups needing UPsampling
    * (r_g > 1) are clamped — repetition factors are a separate op. */
  /** Per-group temperature rates rate_g = targetFactor·q_g/p_g
    * (UNclamped), with q_g ∝ p_g^alpha — the shared derivation behind
    * [[temperatureMixture]] (which clamps at 1) and
    * [[repetitionUpsample]] (which materializes rates above 1 as
    * copies). ONE corpus aggregate: the total and the q-normalizer are
    * windows over the |groups|-row result (a deliberate single-task
    * window — the group domain is languages/sources, bounded by design,
    * not data). alpha = 0.5 routes through `sqrt` (correctly-rounded
    * IEEE on every engine — exact oracle parity); other alphas use
    * `pow` (≤ 1 ulp; boundary-flip odds against the 16^-6 coin grid
    * are measure-zero). */
  private def temperatureRates(docs: DataFrame, groupCol: String,
                               alpha: Double, targetFactor: Double): DataFrame = {
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
      .withColumn("p_g", col("n_g") / sum(col("n_g")).over(all).cast("double"))
      .withColumn("w_g",
        if (alpha == 0.5) sqrt(col("p_g")) else pow(col("p_g"), lit(alpha)))
      .withColumn("rate_g",
        lit(targetFactor) * (col("w_g") / sum(col("w_g")).over(all)) / col("p_g"))
      .select(col(groupCol), col("rate_g"))
  }

  def temperatureMixture(docs: DataFrame, idCol: String, groupCol: String,
                         alpha: Double, targetFrac: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac must be in (0, 1]")
    val rates = temperatureRates(docs, groupCol, alpha, targetFrac)
      .withColumn("rate_g", least(lit(1.0), col("rate_g")))
    docs.join(broadcast(rates), Seq(groupCol))
      .filter(hashUniform(col(idCol), ":mix") < col("rate_g"))
      .drop("rate_g")
  }

  /** Mixture materialization from an EXPLICIT weight distribution —
    * the apply step that turns optimized domain weights (e.g.
    * [[Selection.doremiWeights]]) into an actual corpus:
    * per-group rates r_g = min(1, targetFrac·w_g/p_g) against the
    * corpus's OWN row shares p_g, gated by the deterministic content
    * coin. [[temperatureMixture]] is the special case w ∝ p^alpha;
    * this is the general form every published mixture card reduces to
    * once its weights are decided.
    *
    * Same no-corpus-shuffle shape as [[temperatureMixture]]: a
    * |groups|-row count aggregate meets the broadcast weight table
    * (|groups| rows — model parameters, never data), rates broadcast
    * back onto the scan, the gate is a narrow filter. Determinism:
    * p_g is a ratio of exact integer counts, the supplied weights
    * should be pre-rounded (doremiWeights' are), and the coin
    * comparison replays exactly — boundary landings against the
    * 16^-6 grid are measure-zero.
    *
    * Missing-mass contract: a group ABSENT from the weight table (or
    * carrying a NULL weight) samples at rate 0 — absent means zero
    * mixture mass, explicitly, not "keep at some default". The rate
    * is pinned to 0.0 rather than left NULL because Spark's `least`
    * SKIPS nulls (least(1.0, NULL) = 1.0 — the whole group would
    * silently survive at rate 1).
    *
    * Weight-table grain: the table is aggregated to ONE row per group
    * (max over supplied weights, NULLs ignored) BEFORE the join — a
    * weight table with duplicate rows for a group would otherwise fan
    * out through the join and silently duplicate every doc of that
    * group in the output. Well-formed tables (doremiWeights' are
    * unique by construction) pass through unchanged: max of a single
    * value is the value. */
  def mixtureByWeights(docs: DataFrame, idCol: String, groupCol: String,
                       weights: DataFrame, weightCol: String,
                       targetFrac: Double,
                       salt: String = ":wmix"): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac must be in (0, 1]")
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
      .withColumn("p_g",
        col("n_g") / sum(col("n_g")).over(all).cast("double"))
      .join(weights.groupBy(col(groupCol))
          .agg(max(col(weightCol)).as("__w")),
        Seq(groupCol), "left")
      .withColumn("rate_g", when(col("__w").isNotNull,
        least(lit(1.0), lit(targetFrac) * col("__w") / col("p_g")))
        .otherwise(lit(0.0)))
      .select(col(groupCol), col("rate_g"))
    docs.join(broadcast(rates), Seq(groupCol))
      .filter(hashUniform(col(idCol), salt) < col("rate_g"))
      .drop("rate_g")
  }

  /** MIXTURE FEASIBILITY / EFFECTIVE-SAMPLE-SIZE card — "if this corpus
    * is resampled to mixture w, how much data do we effectively have,
    * and what repetition does it demand": the importance-sampling ESS
    * (Kong 1992; the 1/(1+χ²(w‖p)) identity) of reweighting the
    * corpus's token mass p_g = n_g/N to a TARGET mixture w_g — the
    * evaluation step every optimized mixture card
    * ([[Selection.doremiWeights]], [[Selection.unimaxAllocation]],
    * temperature weights) should pass before materialization. Per
    * group: the IS ratio r_g = w_g/p_g, which at a one-corpus-mass
    * budget IS the implied epochs over that group (the repetition the
    * mixture demands); corpus-level: ess_tokens =
    * (Σ_g n_g·r_g)²/Σ_g n_g·r_g² and ess_frac = ess_tokens/N — the
    * fraction of the corpus that still carries independent signal
    * under the reweighting (1.0 iff w = p; χ²-degraded as the mixture
    * departs from the data).
    *
    * Weight hygiene follows [[mixtureByWeights]]: the weight table is
    * aggregated to one row per group (max, NULLs ignored) before the
    * join; a group absent from the table carries mixture mass 0
    * (ratio 0, contributes nothing); weights are RENORMALIZED over the
    * groups present in the corpus, so a pre-rounded card (doremiWeights'
    * round-6 rows) or one mentioning absent groups still yields a
    * proper distribution. Determinism: n_g/N are exact integer ratios;
    * the |G|-row double sums sit ~1e-12 under the 1e-6 output grid
    * (the doremiWeights argument).
    *
    * Zero-mass groups (r20): a group whose rows carry NO token mass
    * has p_g = 0 — its ratio w_g/p_g is undefined, and left alone the
    * 0·∞ = NaN would poison every output row through the sums. The
    * row reports `is_ratio` NULL; a zero-mass group with POSITIVE
    * target weight makes the mixture UNSAMPLABLE from this corpus
    * (infinite repetition demanded), so the card reports ess_tokens =
    * ess_frac = 0.0 — the honest limit; with zero weight the group
    * simply contributes nothing.
    *
    * Scale shape: ONE corpus aggregate to (group, n_docs, n_avail);
    * the weight table and the two totals are |G|-row/1-row broadcasts;
    * zero corpus shuffle beyond the aggregate. */
  def mixtureEss(docs: DataFrame, groupCol: String, tokCol: Column,
                 weights: DataFrame, weightCol: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = docs.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(tokCol.cast("long")).as("n_avail"))
      .join(weights.groupBy(col(groupCol))
          .agg(max(col(weightCol)).as("__w0")),
        Seq(groupCol), "left")
      .withColumn("__w1", coalesce(col("__w0"), lit(0.0)))
      .withColumn("__N", sum(col("n_avail")).over(all))
      .withColumn("__w", col("__w1") / sum(col("__w1")).over(all))
      .withColumn("__p", col("n_avail").cast("double") / col("__N"))
      // a zero-mass group's ratio is undefined (NULL, not 0/0 = NaN)
      .withColumn("__r", when(col("n_avail") === 0,
        lit(null).cast("double")).otherwise(col("__w") / col("__p")))
    val g = base
      // zero-mass rows contribute nothing to the sums (their true
      // n·r limit is 0); a zero-mass group with POSITIVE weight makes
      // the mixture unsamplable — ESS pins to the honest limit 0
      .withColumn("__unsamplable", max(graft.functions.Clean.flag(
        col("n_avail") === 0 && col("__w") > 0)).over(all))
      .withColumn("__s1",
        sum(coalesce(col("n_avail") * col("__r"), lit(0.0))).over(all))
      .withColumn("__s2", sum(coalesce(
        col("n_avail") * col("__r") * col("__r"), lit(0.0))).over(all))
      .withColumn("__ess", when(col("__unsamplable") === 1L, lit(0.0))
        .otherwise(col("__s1") * col("__s1") / col("__s2")))
    g.select(col(groupCol), col("n_docs"), col("n_avail"),
      round(col("__p"), 6).as("p_frac"),
      round(col("__w"), 6).as("w_target"),
      round(col("__r"), 6).as("is_ratio"),
      round(col("__ess"), 2).as("ess_tokens"),
      round(col("__ess") / col("__N").cast("double"), 6).as("ess_frac"))
  }

  /** Repetition-factor UPSAMPLING — the other half of mixture assembly
    * ([[temperatureMixture]] clamps rates at 1): each row of group g is
    * materialized `rate_g = targetFactor·q_g/p_g` times in expectation,
    * as floor(rate_g) guaranteed copies plus one more when the row's
    * deterministic coin lands under the fractional part. Output carries
    * `rep_idx` (0-based copy index) so downstream epoch shuffling can
    * keep copies apart ([[graft.operators.Packing.epochShuffle]] on
    * id + rep_idx gives each copy its own position).
    *
    * Same no-corpus-shuffle shape as [[temperatureMixture]]: a
    * |groups|-row rate aggregate broadcasts back, then a NARROW
    * sequence-explode fans each row out n_copies times — no exchange
    * touches the corpus, and the fan-out is exactly the emitted rows. */
  def repetitionUpsample(docs: DataFrame, idCol: String, groupCol: String,
                         alpha: Double, targetFactor: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    require(targetFactor > 0, "targetFactor must be positive")
    val rates = temperatureRates(docs, groupCol, alpha, targetFactor)
    docs.join(broadcast(rates), Seq(groupCol))
      .withColumn("n_copies", floor(col("rate_g")).cast("long") +
        (hashUniform(col(idCol), ":rep") < (col("rate_g") - floor(col("rate_g"))))
          .cast("long"))
      .filter(col("n_copies") > 0)
      .select(docs.columns.map(col) :+
        explode(sequence(lit(0L), col("n_copies") - 1)).as("rep_idx"): _*)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): the `k` rows per group with the largest keys
    * u^(1/w) — u the row's deterministic [[openCoin]], w its weight —
    * are distributed exactly as sequential weighted draws without
    * replacement. The probabilistic-quality step of curation pipelines
    * ([[hashSample]] is the uniform special case w ≡ 1): sample by
    * quality score without the deterministic-top-k failure mode of
    * always keeping the same head.
    *
    * Scale shape: the key is a NARROW projection (coin + one pow); the
    * per-group top-k plans as a rank window with a map-side partial
    * WindowGroupLimit, so each input partition forwards at most k rows
    * per group into the single ranking exchange — never the corpus.
    * Determinism: u replays exactly cross-engine (exact binary
    * doubles); pow agrees to ≤ 1 ulp, and distinct u on the 6e-8 coin
    * grid keep key gaps orders above ulp, so the selected set and
    * ranks replay exactly (rank ties broken by `idCol`). Rows with
    * weight ≤ 0 or NULL are excluded up front — A-ES is undefined
    * there, and silently keying them NaN would sort them
    * nondeterministically. Appends `rank` (1-based, by key desc). */
  def weightedSampleTopK(df: DataFrame, idCol: String, groupCol: String,
                         weightCol: Column, k: Int,
                         salt: String = ":aes"): DataFrame = {
    require(k >= 1, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val key = pow(openCoin(col(idCol), salt),
      lit(1.0) / weightCol.cast("double"))
    df.filter(weightCol.isNotNull && weightCol.cast("double") > 0)
      .withColumn("__key", key)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("__key").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= k)
      .drop("__key")
  }

  /** Incremental maintenance of the [[weightedSampleTopK]] reservoir:
    * fold a new batch into the running per-group sample by re-taking
    * top-k of (store ∪ batch) under the SAME deterministic key
    * u(id)^(1/w). Because the key is a pure function of (id, w),
    * per-group top-k is an associative, commutative, idempotent fold —
    * topK(topK(A) ∪ B) = topK(A ∪ B) — so the accumulated reservoir is
    * EXACTLY the monolithic A-ES sample of everything ever ingested
    * (zero approximation debt; the bottom-k-merge identity of the KMV
    * sketches, applied to weighted reservoirs).
    *
    * Scale shape: per-merge cost ∝ |batch| + k·|groups| (the store
    * side is already ≤ k rows per group); history is never rescanned.
    * The store carries only (id, group, weight) plus the recomputed
    * `rank` — never payloads. The batch must be id-disjoint from
    * prior batches (each row ingested once), the usual exactly-once
    * ingest contract. */
  def reservoirMergeTopK(store: DataFrame, batch: DataFrame,
                         idCol: String, groupCol: String, wCol: String,
                         k: Int, salt: String = ":aes"): DataFrame =
    weightedSampleTopK(
      store.select(col(idCol), col(groupCol), col(wCol))
        .unionByName(batch.select(col(idCol), col(groupCol), col(wCol))),
      idCol, groupCol, col(wCol), k, salt)

  /** EXACT stratified sample: select round(frac·N) rows TOTAL with
    * per-stratum counts allocated by the largest-remainder method
    * (floor(frac·n_g) each, the remainder seats going to the largest
    * fractional parts, ties → stratum order) — the eval-set carving
    * rule when "10% of the corpus, proportionally by language" must
    * mean an exact row count, not a coin-flip expectation like
    * [[assignSplit]]/[[stratifiedHashSample]]. Within a stratum the coin
    * (hexInt, id tie-break) picks WHICH rows — content-stable, so a
    * row's selection never depends on partitioning.
    *
    * Scale shape: stratum counts are a \|groups\|-row aggregate;
    * quotas derive from windows over that \|groups\|-row table (the
    * UniMax bounded-single-task discipline) and broadcast back; the
    * one corpus-grain exchange is the per-stratum coin ranking. Its
    * rank window can't WindowGroupLimit (the cutoff varies per
    * stratum), so at extreme scale swap the exact rank for a coin
    * THRESHOLD at the quota quantile — approximate counts, zero
    * ranking sort ([[thresholdStratifiedTake]] is that operator);
    * this one is the exact-count contract. NULL strata form a stratum
    * of their own (null-safe quota join; the count aggregate and the
    * rank window already treat null as a group), so the exact global
    * count holds on corpora with missing stratum labels too.
    * Appends `rnk` (1-based coin order within stratum). */
  def exactStratifiedTake(df: DataFrame, idCol: String, strataCol: String,
                          frac: Double, salt: String = ":est"): DataFrame = {
    require(frac > 0 && frac < 1, "frac must be in (0, 1)")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val quotas = largestRemainderQuotas(counts, strataCol, frac)
      .select(col(strataCol).as("__strat"), col("__quota"))
    df.join(broadcast(quotas), col(strataCol) <=> col("__strat"))
      .drop("__strat")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(hexInt(col(idCol), salt), col(idCol))).cast("long"))
      .filter(col("rnk") <= col("__quota"))
      .drop("__quota")
  }

  /** Largest-remainder seat allocation over a per-stratum count table:
    * appends `__quota` to a (`strataCol`, `__n`, …) DataFrame —
    * floor(frac·n_g) each, remainder seats to the largest fractional
    * parts (ties → stratum order), totalling round(frac·N) exactly.
    * All windows run over the \|groups\|-row table (the UniMax
    * bounded-single-task discipline), never the corpus; extra input
    * columns pass through untouched. */
  private def largestRemainderQuotas(counts: DataFrame, strataCol: String,
                                     frac: Double): DataFrame = {
    val all = Window.orderBy(col(strataCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("__floor", floor(lit(frac) * col("__n")))
      .withColumn("__rem", lit(frac) * col("__n") - col("__floor"))
      .withColumn("__target",
        round(lit(frac) * sum(col("__n")).over(all)).cast("long"))
      .withColumn("__extra",
        (col("__target") - sum(col("__floor")).over(all)).cast("long"))
      .withColumn("__rrank", row_number().over(
        Window.orderBy(col("__rem").desc, col(strataCol))))
      .withColumn("__quota",
        col("__floor") + when(col("__rrank") <= col("__extra"), 1L).otherwise(0L))
      .drop("__floor", "__rem", "__target", "__extra", "__rrank")
  }

  /** APPROXIMATE stratified take — [[exactStratifiedTake]]'s documented
    * extreme-scale sibling: same largest-remainder quotas, but instead
    * of the per-stratum rank window (which cannot WindowGroupLimit —
    * the cutoff varies by stratum — so every stratum's rows pass
    * through a full ranking sort), each stratum takes a coin THRESHOLD
    * at its quota quantile and the corpus is selected by a narrow
    * filter. Counts are approximate (quantile-sketch rank error
    * ≤ n_g/`accuracy`, quantile-grid rounding ≤ n_g/`gridSteps`, coin
    * ties); WHICH rows are taken stays content-stable — the same
    * coin-ordered prefix property as the exact variant, up to the
    * threshold's resolution.
    *
    * Scale shape: ONE bounded-state aggregate (per stratum: a count
    * plus one `percentile_approx` sketch over the `gridSteps+1`
    * fraction grid — the per-stratum quota fraction isn't known until
    * the counts exist and `percentile_approx`'s fraction argument must
    * be foldable, so the grid is evaluated once and the threshold
    * picked from it on the \|groups\|-row table), quota arithmetic on
    * \|groups\| rows, broadcast back, narrow filter. The corpus is
    * never sorted, rank-windowed, or shuffled at row grain — the only
    * corpus-wide exchange carries per-partition quantile summaries
    * bounded by \|strata\| × sketch size. NULL strata form their own
    * stratum (null-safe join), as in the exact variant. */
  def thresholdStratifiedTake(df: DataFrame, idCol: String, strataCol: String,
                              frac: Double, salt: String = ":est",
                              gridSteps: Int = 1000,
                              accuracy: Int = 10000): DataFrame = {
    require(frac > 0 && frac < 1, "frac must be in (0, 1)")
    require(gridSteps >= 2, "gridSteps must be >= 2")
    require(accuracy >= 1, "accuracy must be >= 1")
    val coin = hexInt(col(idCol), salt)
    val grid = typedLit((0 to gridSteps).map(_.toDouble / gridSteps))
    val stats = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("__n"),
      percentile_approx(coin, grid, lit(accuracy)).as("__qs"))
    val thr = largestRemainderQuotas(stats, strataCol, frac)
      // the sketch resolves fraction p to the value at rank ceil(p·n)
      // (measured: p=0.105 over 1..100 → 11), so any UPWARD grid
      // rounding of quota/n bumps a rank — target (quota−0.5)/n and
      // FLOOR to the grid instead: ceil(p_grid·n) == quota exactly
      // while n_g < gridSteps/2, and undershoots by ≤ n_g/gridSteps
      // rows beyond that (the documented grid error). quota 0 → a
      // sentinel below the coin's range so the stratum takes nothing
      // (percentile at 0.0 would return the min coin and take its row)
      .withColumn("__gi",
        floor((col("__quota").cast("double") - lit(0.5)) / col("__n")
          * gridSteps).cast("int"))
      .withColumn("__thr", when(col("__quota") === 0, lit(-1))
        .otherwise(element_at(col("__qs"), col("__gi") + 1)))
      .select(col(strataCol).as("__strat"), col("__thr"))
    df.join(broadcast(thr), col(strataCol) <=> col("__strat"))
      .filter(coin <= col("__thr"))
      .drop("__strat", "__thr")
  }

  /** INVERSE-CDF categorical sampling — n deterministic draws from an
    * arbitrary weighted vocabulary (the word2vec/NCE negative-sampling
    * distribution freq^α, and the general "draw from this table of
    * weights" primitive behind mixture draws). The vocabulary is laid
    * out as cumulative intervals [lo, hi) in (weight desc, token)
    * order; draw i's open coin u (the [[openCoin]] grid) maps to
    * target u·total, and the owning interval is found by a BUCKETIZED
    * equi-join: each interval registers in the ⌈·⌉ `buckets`-grid
    * cells it overlaps (one cell for most tokens, +1 per boundary
    * crossing), draws compute their cell as floor(u·buckets) and
    * equi-join, and the exact interval filter picks the one token — no
    * draws×vocab comparison anywhere.
    *
    * Scale: the cumulative layout is a single-partition window over
    * the VOCABULARY — model grain (the sampling table word2vec holds
    * in RAM), not corpus grain — and broadcasts; the draw side is
    * embarrassingly parallel. Determinism: coins and interval bounds
    * are exact-or-≤1-ulp arithmetic; a draw landing within an ulp of a
    * boundary is the established measure-zero risk.
    *
    * Returns one row per draw: (i, token, u). */
  def inverseCdfDraws(vocab: DataFrame, tokenCol: String, weightCol: String,
                      n: Int, salt: String, buckets: Int = 1024): DataFrame = {
    require(n > 0 && buckets > 0, "need n > 0 and buckets > 0")
    val spark = vocab.sparkSession
    // vocabulary-grain (model-sized) single-partition window
    val win = Window.orderBy(col(weightCol).desc, col(tokenCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = vocab.select(col(tokenCol).as("token"),
        col(weightCol).cast("double").as("w"))
      .withColumn("hi", sum(col("w")).over(win))
      .withColumn("lo", col("hi") - col("w"))
    val tot = v.agg(max(col("hi")).as("total"))
    // registration is widened ONE cell each side: lo/total and u are
    // both rounded doubles, so at a cell boundary a draw's
    // floor(u·buckets) can land one cell outside its owning interval's
    // exact range — the widened registration guarantees the owning
    // interval is present in the draw's cell and the exact
    // lo <= target < hi filter below still picks exactly one token
    val vb = v.crossJoin(broadcast(tot))
      .withColumn("b", explode(sequence(
        greatest(floor(col("lo") / col("total") * buckets).cast("long")
          - 1, lit(0L)),
        least(floor(col("hi") / col("total") * buckets).cast("long")
          + 1, lit(buckets - 1L)))))
    val draws = spark.range(1, n + 1).toDF("i")
      .withColumn("u", openCoin(col("i"), salt))
      .crossJoin(broadcast(tot))
      .withColumn("target", col("u") * col("total"))
      .withColumn("b", floor(col("u") * buckets).cast("long"))
    draws.join(broadcast(vb.select(col("b"), col("token"),
        col("lo"), col("hi"))), Seq("b"))
      .filter(col("target") >= col("lo") && col("target") < col("hi"))
      .select(col("i"), col("token"), col("u"))
  }
}
