package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint with host-contention defense.
  *
  * Measurement protocol (evolved over rounds 7-11):
  *   - every sample is recorded and emitted (r8): a poisoned sample is
  *     visible in the artifact instead of silently deciding a min;
  *   - per-query settle (r9): a query's two fastest samples must agree
  *     within 1.3x or it is re-measured (bounded);
  *   - stall windows that actually trip (r11): a fixed CPU-bound probe
  *     interleaved every `calEvery` queries is compared against the
  *     run's *fastest* probe — the probe's work is invariant, so only
  *     host interference can inflate it. A probe >1.5x the baseline
  *     marks the segment it closes (everything measured since the
  *     previous probe) as a stall window; samples inside it are
  *     QUARANTINED (kept in the artifact under `tainted_samples`,
  *     excluded from the reported min) and their queries are requeued
  *     for clean samples. Classification is RETROACTIVE: the baseline
  *     is the min over all probes so far, and every segment is
  *     re-judged whenever the baseline drops — a stall at the START of
  *     the run (before the true baseline is known) still quarantines.
  *     The r10 artifact ran passes 60% apart with `stall_windows: []`
  *     because the old rule (3x median AND +1s) never fired — the
  *     median itself was contaminated and the absolute guard was sized
  *     for r7's 10-100x stalls, not 2-9x contention.
  *
  * The artifact self-reports trustworthiness: `artifact_ok` is false
  * when >25% of measurement attempts landed in stall windows, any
  * query ended with only tainted samples, or any query errored — a
  * contended-only run can no longer masquerade as a clean one.
  *
  * Limit: a PERFECTLY uniform stall spanning the whole run inflates
  * the baseline too and is undetectable from inside; `pass_totals`
  * divergence and cross-round comparison remain the backstop for that
  * case. SPARK_GRAFT_PROBE_BASELINE pins the baseline externally
  * (seconds) when a cross-run reference is available.
  *
  * Provenance (r12): the artifact fingerprints its fixture inputs
  * (per-table byte-md5 + size + rows, one combined `fixtures_digest`)
  * and flags `fixtures_changed_since_prev` against the artifact it
  * overwrites — cross-artifact per-query deltas are only code-vs-code
  * when the digests match. Pass 1 is labeled `warmup` in `pass_roles`:
  * its totals carry per-query first-run JIT (~40% measured), which the
  * min-over-samples protocol discounts but pass-total readers before
  * r12 could not.
  *
  * Budget + crash safety (r17 — the r16 rc=124 lesson, where a driver
  * timeout left NO artifact and a stopped-SparkContext stack):
  *   - a WALL-CLOCK budget (SPARK_GRAFT_DEADLINE_SEC; defaults to
  *     2700 s for a full parent suite run, unlimited for standalone
  *     floor children and dev single-query filters, 0 = unlimited)
  *     degrades the protocol gracefully instead of dying mid-run:
  *     later suite passes are skipped first, then settle reruns, then
  *     floor children get fewer passes, then floors are skipped
  *     entirely — every degradation is recorded in `degraded` and any
  *     of them forces window_ok scrutiny downstream (unfloored flags
  *     already make tools/lock.py refuse);
  *   - a shutdown hook flushes the partial artifact (per-query minima,
  *     probes, stall classification — all in memory when SIGTERM
  *     lands) as parsable JSON with `"partial":true` and
  *     artifact_ok=false, so even a hard timeout yields data instead
  *     of a stack trace. Samples in the probe-unclosed tail segment
  *     are classified tainted (no closing probe ever validated them).
  *   - probe cadence relaxes from every 10 queries (pass 1 — the
  *     baseline-discovery pass) to every 15 on later passes, and a
  *     single-query floor child exits its pass loop once the sample
  *     curve flattens (settled-tail detection used to EXIT, not just
  *     to extend) — together they buy the driver budget back without
  *     coarsening pass-1 quarantine granularity.
  *
  * Per-query min-window provenance (r17 — the five-refusals lesson;
  * dual-probe r18): the global clean-probe spread refuses a lock when
  * ANY window in a 45-minute run strayed past 1.5x, even though the
  * published minima may all have been measured at baseline speed (the
  * +0.25 s absolute stall guard keeps 1.5-2.8x windows "clean" on a
  * fast host). Each query therefore records the window its published
  * minimum ran in, as probe ratios to the baseline — BOTH bounding
  * probes since r18 (the closing probe alone certifies a window whose
  * mid-window burst subsided before the closing calibrate):
  * `min_windows[q]` = max(opening, closing)/baseline — the
  * CERTIFICATION ratio (≤1.3 ⇒ the sample verifiably ran at baseline
  * speed; -1 = floor-published, the forked fresh-JVM protocol) — and
  * `min_windows_lo[q]` = min(opening, closing)/baseline — the
  * CONSERVATIVE normalization divisor (dividing a slow-window sample
  * by the smaller ratio under-normalizes, so a normalized lock entry
  * can never be faster than the code warrants). Granularity limit: a
  * burst that rises and fully subsides strictly between the two
  * bounding probes is invisible to both; the settle band and
  * cross-round anchors remain the backstop for that case. Fast-window
  * CHASE sweeps re-measure queries whose minima lack ≤1.3x
  * certification; `minima_window_ok` = every query certified.
  * tools/lock.py accepts a blown global spread when the per-sample
  * evidence certifies every locked number, and since r18 can
  * alternatively NORMALIZE a slow-window minimum into the baseline
  * probe unit (raw ÷ min_windows_lo) at lock time — the same
  * probe-unit rescaling the two-verdict adjudication already trusts,
  * applied when it helps instead of after a refusal. Cross-run flag
  * comparisons normalize symmetrically: suspectsOf divides the
  * current minimum by ITS window ratio before comparing against an
  * anchor, so a slow-window sample is judged in the unit the anchors
  * are expressed in.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val tWall0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.sources.Tables.nanosConf._1, graft.sources.Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen, shuffle service, file index) so the
    // first measured query doesn't absorb one-time init
    spark.range(1000000).selectExpr("sum(id)").collect()

    val only = args.toSet // optional query-name filter (dev use)
    val queries = Queries.all.filter(q => only.isEmpty || only(q.name))
    // a forked single-query floor child (SPARK_GRAFT_STANDALONE) skips
    // parent-artifact bookkeeping (fixture hashing) and runs unbudgeted
    // — the parent bounds it with the fork timeout
    val standalone = sys.env.contains("SPARK_GRAFT_STANDALONE")

    // ── wall-clock budget (r17) ───────────────────────────────────────
    // The driver's per-round bench run has a hard external timeout; the
    // r16 run hit it at rc=124 with zero artifact. Degrade inside the
    // budget instead: 2700 s default for the full parent suite
    // (override with SPARK_GRAFT_DEADLINE_SEC; <= 0 disables — a lock
    // run that wants full rigor on a slow window should disable and
    // accept the wall time).
    val deadlineSec: Option[Double] =
      sys.env.get("SPARK_GRAFT_DEADLINE_SEC").map(_.toDouble) match {
        case Some(d) if d <= 0 => None
        case Some(d) => Some(d)
        case None => if (standalone || only.nonEmpty) None else Some(2700.0)
      }
    def elapsedWall: Double = (System.nanoTime() - tWall0) / 1e9
    def remainingSec: Double =
      deadlineSec.map(_ - elapsedWall).getOrElse(Double.MaxValue)
    val degraded = scala.collection.mutable.ArrayBuffer.empty[String]

    // ── fixture provenance ────────────────────────────────────────────
    // The artifact fingerprints its INPUTS: per-table byte-md5 + size +
    // row count, plus one combined digest. A testdata regeneration
    // changes the digest, so cross-run per-query comparisons are only
    // valid between artifacts whose `fixtures_digest` match — the r11
    // regeneration silently shifted every pre-r11 comparison, and
    // nothing in the artifact recorded it. Byte-level hashing is
    // deliberate: even a logically-identical rewrite changes parquet
    // layout/metadata and therefore scan timings.
    val fixtureTables = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents", "embeddings")
    val fixtures =
      if (standalone) Seq.empty[(String, Long, Long, String)]
      else fixtureTables.flatMap { t =>
        val p = java.nio.file.Paths.get(sfDir, s"$t.parquet")
        if (!java.nio.file.Files.isRegularFile(p)) None
        else {
          val bytes = java.nio.file.Files.readAllBytes(p)
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
          val rows = spark.read.parquet(p.toString).count()
          Some((t, rows, bytes.length.toLong, md5))
        }
      }
    val fixturesDigest = java.security.MessageDigest.getInstance("MD5")
      .digest(fixtures.map(f => s"${f._1}:${f._4}").mkString("|")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    // loud annotation against the PREVIOUS artifact in the working copy:
    // if its digest differs, every cross-artifact per-query delta is
    // fixture-shape, not code — say so in the artifact and on stderr
    val benchOutPath = java.nio.file.Paths.get(sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_OUT", "docs/bench_full.json"))
    val prevDigest: Option[String] =
      if (!java.nio.file.Files.isRegularFile(benchOutPath)) None
      else {
        val txt = java.nio.file.Files.readString(benchOutPath)
        "\"fixtures_digest\":\"([0-9a-f]{32})\"".r
          .findFirstMatchIn(txt).map(_.group(1))
      }
    val fixturesChanged = prevDigest.exists(_ != fixturesDigest)
    if (fixturesChanged)
      System.err.println(s"[bench] FIXTURES CHANGED since the previous " +
        s"artifact (${prevDigest.get} -> $fixturesDigest): per-query " +
        "comparisons against it measure fixture shape, not code")

    // ── cross-round regression references (r13, anchored r14) ─────────
    // TWO priors gate every query:
    //  - the LAST lock (docs/bench_locked.json; SPARK_GRAFT_PREV_BENCH
    //    overrides, benchOutPath is the fallback for older layouts) —
    //    catches within-round drift;
    //  - the previous ROUND's final lock (docs/bench_round_prev.json,
    //    snapshotted at each round boundary; SPARK_GRAFT_ROUND_BENCH
    //    overrides) — the r13 false-negative fix: gating only against
    //    the artifact being overwritten let CHAINED mid-round locks
    //    ratchet a query up ≤30% per lock (q132 went 0.68 → 1.13 s at
    //    identical probe across r12→r13 with no flag). A query is
    //    suspect when it exceeds EITHER prior's allowance.
    // Any suspect gets a STANDALONE floor measured in a freshly forked
    // idle JVM — the r12 lesson: mid-suite JVM state (block-manager
    // pressure, contention windows) can inflate a family of queries ~2x
    // and the suite protocol alone cannot tell that from a code
    // regression.
    def loadRef(path: java.nio.file.Path)
        : Option[(String, Map[String, Double], Double, String)] =
      if (!java.nio.file.Files.isRegularFile(path)) None
      else {
        val txt = java.nio.file.Files.readString(path)
        for {
          body <- "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(txt)
            .map(_.group(1))
          probe <- "\"probe_baseline\":([0-9.eE+]+)".r
            .findFirstMatchIn(txt).map(_.group(1).toDouble)
          digest <- "\"fixtures_digest\":\"([0-9a-f]{32})\"".r
            .findFirstMatchIn(txt).map(_.group(1))
        } yield (path.toString,
          "\"([A-Za-z0-9_]+)\":(-?[0-9.eE+]+)".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap,
          probe, digest)
      }
    val prevRefPath = sys.env.get("SPARK_GRAFT_PREV_BENCH")
      .map(java.nio.file.Paths.get(_))
      .orElse(Some(java.nio.file.Paths.get("docs/bench_locked.json"))
        .filter(java.nio.file.Files.isRegularFile(_)))
      .getOrElse(benchOutPath)
    val prevRef = loadRef(prevRefPath)
    val roundRefPath = sys.env.get("SPARK_GRAFT_ROUND_BENCH")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get("docs/bench_round_prev.json"))
    val roundRef = loadRef(roundRefPath)
    val prevProbe: Option[Double] = prevRef.map(_._3)
    val prevComparable = prevRef.exists(_._4 == fixturesDigest)

    // every measurement is (query, seconds, closing-probe label): the
    // probe that CLOSES a segment decides — retroactively re-decidable —
    // whether its samples were clean or contended. ALL mutations go
    // through `stateLock`: the shutdown hook snapshots these buffers
    // from another thread while the main thread may still be appending.
    val stateLock = new Object
    val measurements = scala.collection.mutable.ArrayBuffer.empty[(String, Double, String)]
    val errors = scala.collection.mutable.Map.empty[String, String]
    val reruns = scala.collection.mutable.Map.empty[String, Int]
    val segment = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val calSamples = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val passTotals = scala.collection.mutable.ArrayBuffer.empty[Double]
    // floors accumulate INCREMENTALLY so a shutdown mid-floor-stage
    // still flushes the floors already measured
    val floorsAcc = scala.collection.mutable.Map.empty[String, (Double, String)]

    def runOnce(q: Queries.Q): Double = {
      // cold plans only: queries that persist() intermediates (q35, q51)
      // register them in the CacheManager, so later samples of the
      // identical plan would otherwise read an earlier sample's cache and
      // report warm-cache times, not steady-state
      spark.catalog.clearCache()
      // clearCache only drops Dataset-level cache entries; RDD-level
      // persists (eager localCheckpoint blocks from the CC loops and
      // store pipelines) wait for the ContextCleaner's GC-triggered
      // sweep and accumulate block-manager state across a 130-query
      // suite — release them explicitly between samples
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      try {
        // noop sink materializes every row (count() would let parquet
        // count-star shortcuts skip the actual work)
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        stateLock.synchronized {
          segment += q.name -> dt
          errors.remove(q.name) // a later success supersedes an earlier failure
        }
        dt
      } catch {
        case e: Throwable => // a failed attempt must NOT count as a time
          stateLock.synchronized {
            errors(q.name) = e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("")
                .map(c => if (c >= ' ' && c <= '~' && c != '"' && c != '\\') c else ' ')
                .take(200)
          }
          0.0
      }
    }

    // host-stall calibration: a fixed CPU-bound probe, INTERLEAVED every
    // `calEvery` queries (not just at pass boundaries — round 7's
    // mid-pass stall sat invisibly between 3 boundary probes in a
    // 17-minute run). Sized ~0.5 s so scheduler jitter is small RELATIVE
    // to the probe (the old 0.2 s probe showed 1.7x jitter on an idle
    // host — indistinguishable from real 1.5x contention).
    val pinnedBaseline = sys.env.get("SPARK_GRAFT_PROBE_BASELINE").map(_.toDouble)
    def timeProbeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(1200000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // each probe is the MIN of two back-to-back runs: a transient JVM
    // event (a GC pause right after a heavy query — measured: an
    // otherwise-idle full run flagged 45% of its probes, pass totals
    // agreeing within 5%, because heap pressure peaks exactly at the
    // probe points) hits one run and not the other, while genuine host
    // contention — the thing the probe exists to catch — spans both
    def timeProbe(): Double = math.min(timeProbeOnce(), timeProbeOnce())
    // probe plan codegen + C2 compilation are one-time; warm untimed
    // (twice — the second run typically lands the steady-state tier) so
    // timed probes measure host state, not JIT state
    timeProbeOnce(); timeProbeOnce()

    /** Close the pending segment under `label`'s probe. */
    def calibrate(label: String): Unit = {
      val t = timeProbe()
      stateLock.synchronized {
        calSamples += label -> t
        for ((name, dt) <- segment) measurements += ((name, dt, label))
        segment.clear()
      }
    }

    def probeBaseline: Double = {
      val m = if (calSamples.isEmpty) Double.MaxValue else calSamples.map(_._2).min
      math.min(pinnedBaseline.getOrElse(Double.MaxValue), m)
    }
    /** Labels of probes currently judged contended (vs the running-min
      * baseline — monotonically tightens, so a clean verdict can flip to
      * stalled later, never the reverse once the min is final). The
      * sentinel "unclosed" label (samples flushed by the shutdown hook
      * with no closing probe) is ALWAYS tainted: nothing validated the
      * window they ran in. */
    def stalledOf(cals: Seq[(String, Double)], base: Double): Set[String] =
      cals.filter { case (_, t) => t > 1.5 * base && t > base + 0.25 }
        .map(_._1).toSet + "unclosed"
    def stalledLabels: Set[String] = stalledOf(calSamples.toSeq, probeBaseline)
    def classifyOf(meas: Seq[(String, Double, String)], bad: Set[String])
        : (Map[String, Seq[Double]], Map[String, Seq[Double]]) = {
      val (t, c) = meas.partition { case (_, _, l) => bad(l) }
      (c.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq },
       t.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq })
    }
    /** (clean, tainted) samples per query under the current baseline. */
    def classify(): (Map[String, Seq[Double]], Map[String, Seq[Double]]) =
      classifyOf(measurements.toSeq, stalledLabels)
    def needingClean(want: Int): Seq[Queries.Q] = {
      val clean = classify()._1
      queries.filter(q => !errors.contains(q.name) &&
        clean.get(q.name).map(_.size).getOrElse(0) < want)
    }

    /** Window provenance of each query's current clean minimum
      * (r18 dual-probe): the minimum's segment is bounded by the probe
      * that OPENED it (the previous calibration) and the probe that
      * CLOSED it. Returns q -> (minSec, hi, lo) with
      * hi = max(open, close)/pb (the certification ratio) and
      * lo = min(open, close)/pb (the conservative normalization
      * divisor). Queries with no clean samples are absent. */
    def minWindowRatiosOf(meas: Seq[(String, Double, String)],
                          cals: Seq[(String, Double)], pb: Double)
        : Map[String, (Double, Double, Double)] = {
      val idx = cals.map(_._1).zipWithIndex.toMap
      val bad = stalledOf(cals, pb)
      meas.filterNot(m => bad(m._3)).groupBy(_._1).flatMap {
        case (n, ms) =>
          val mn = ms.minBy(_._2)
          idx.get(mn._3).map { i =>
            val close = cals(i)._2
            val open = if (i > 0) cals(i - 1)._2 else close
            n -> ((mn._2, math.max(open, close) / pb,
              math.min(open, close) / pb))
          }
      }
    }

    // per-query settle defense: until the two FASTEST clean samples of a
    // query agree within 1.3x, at least one of them is not a steady-state
    // number (JIT warm-up, cache population, or a sub-probe-resolution
    // stall) — re-measure, bounded at 2 extra samples per query. The
    // 0.05 s absolute guard keeps sub-tenth-second timer jitter on
    // trivial queries from eating the rerun budget.
    def divergent(ts: Seq[Double]): Boolean = {
      val best = ts.sorted.take(2)
      best.size == 2 && best(1) > 1.3 * best(0) && best(1) - best(0) > 0.05
    }
    // still-improving chase: iterative driver-bound queries (q63's CC
    // loop plans ~10 rounds per run) keep JIT-improving for ~5 in-JVM
    // runs — each consecutive pair agrees within 1.3x, so the divergence
    // rule alone freezes them ~20% above their floor (measured: q63
    // samples 6.2, 2.5, 2.0, 2.1, 1.8, 1.74, 1.71, 1.77 — r10 shipped
    // the 2.1 and flagged a phantom regression vs r8's 1.69). While the
    // LATEST sample improves the running min by >7%, the query has not
    // settled; keep measuring.
    def stillImproving(ts: Seq[Double]): Boolean =
      ts.size >= 2 && ts.last < ts.init.min * 0.93 && ts.init.min - ts.last > 0.05

    // ── anchor/flag machinery, parameterized by the probe baseline so
    // both the main flow and the (possibly partial) emission compute
    // identically ─────────────────────────────────────────────────────
    // the flag threshold CLAMPS each anchor's ratio at 1.0: the CPU
    // probe and a full query don't speed up in lockstep, so a
    // faster-probing host must not shrink the allowance below
    // prior x 1.3 — the r13 shakeout run (probe ratio 0.81) flagged 25
    // queries whose forked floors all came back within ±20% of prev:
    // band noise, not regressions.
    // each anchor carries BOTH ratios: the clamped one decides the flag
    // (allowances must not shrink on a fast-probing host) and the RAW
    // one annotates it — on an oscillating host (r15: min-probe 0.149
    // describing the fastest window of a 0.20-0.55 s run) the clamped
    // gate manufactures flags, and the unclamped severity is the
    // secondary verdict a judge reads to separate window from code
    // without a worktree rebuild
    def anchorsOf(pb: Double): Seq[(String, Map[String, Double], Double, Double)] =
      Seq(("last_lock", prevRef), ("round_lock", roundRef)).flatMap {
        case (label, Some((_, qs, probe, digest)))
            if digest == fixturesDigest && probe > 0 =>
          val raw = pb / probe
          Some((label, qs, math.max(raw, 1.0), raw))
        case _ => None
      }
    // a query violates an anchor when it exceeds that anchor's prior ×
    // clamped host ratio × 1.3 (plus the 0.2 s absolute guard); checking
    // EVERY anchor is what breaks the chained-lock ratchet — a query can
    // drift ≤30% past the last lock yet still trip the round-boundary
    // prior. The reported prior/anchor is the WORST violation.
    // r18: the compared value is the current minimum NORMALIZED into the
    // baseline probe unit (v ÷ its window's conservative lo ratio) —
    // the anchors are expressed at their run's probe_baseline (lock.py
    // normalizes slow-window entries at promotion), so a slow-window
    // sample must be judged in the same unit or every host oscillation
    // manufactures a flag (then a wasted floor fork). The lo ratio
    // under-normalizes by construction, so a real regression cannot
    // hide behind it.
    // Tuple: (anchor, prior, sevClamped, rawRatio, vNorm).
    def suspectsOf(results0: Seq[(String, Double)], pb: Double,
                   ratiosLo: Map[String, Double] = Map.empty)
        : Seq[(String, (String, Double, Double, Double, Double))] = {
      val anchors = anchorsOf(pb)
      if (standalone || only.nonEmpty || anchors.isEmpty) Seq.empty
      else results0.flatMap { case (n, v) =>
        if (v <= 0) None
        else {
          val vn = v / math.max(1.0, ratiosLo.getOrElse(n, 1.0))
          val vio = anchors.flatMap { case (label, qs, ratio, raw) =>
            qs.get(n)
              .filter(p => p > 0 && vn > p * ratio * 1.3 &&
                vn - p * ratio > 0.2)
              .map(p => (label, p, vn / (p * ratio), raw, vn))
          }
          if (vio.isEmpty) None else Some(n -> vio.maxBy(_._3))
        }
      }
    }

    // ── artifact emission — callable from the normal end of run AND
    // from the shutdown hook on SIGTERM/timeout (r17). Snapshots all
    // mutable state under the lock, then computes the full artifact
    // from the snapshot; `partial` marks a crash flush and forces
    // artifact_ok=false. ──────────────────────────────────────────────
    def emit(partial: Boolean): String = {
      val (meas, cals, errs, rrs, pts, flrs) = stateLock.synchronized {
        (measurements.toVector ++
           segment.toVector.map { case (n, d) => (n, d, "unclosed") },
         calSamples.toVector, errors.toMap, reruns.toMap,
         passTotals.toVector, floorsAcc.toMap)
      }
      val pb = {
        val m = if (cals.isEmpty) Double.MaxValue else cals.map(_._2).min
        math.min(pinnedBaseline.getOrElse(Double.MaxValue), m)
      }
      val stalls = stalledOf(cals, pb)
      val (clean, taintedM) = classifyOf(meas, stalls)
      val requeuedCounts = taintedM.map { case (k, v) => k -> v.size }
      // a query with zero clean samples falls back to its tainted min so
      // the artifact still covers it — flagged in `tainted_only` AND it
      // forces artifact_ok=false
      val taintedOnly = queries.map(_.name).filter(n =>
        !errs.contains(n) && clean.get(n).forall(_.isEmpty) &&
          taintedM.get(n).exists(_.nonEmpty))
      val results0 = queries.map { q =>
        val c = clean.get(q.name).filter(_.nonEmpty).map(_.min)
        val d = taintedM.get(q.name).filter(_.nonEmpty).map(_.min)
        q.name -> c.orElse(d).getOrElse(-1.0)
      }
      // the floor REPLACES the suite min in `queries` when faster (both
      // are clean measurements of the same code+data; the suite number
      // stays in `regressed_vs_prev.suite_min`)
      val results = results0.map { case (n, v) =>
        n -> flrs.get(n).map(_._1).filter(f => f > 0 && f < v).getOrElse(v)
      }
      val winRatios = minWindowRatiosOf(meas, cals, pb)
      val suspectsAll = suspectsOf(results0, pb,
        winRatios.map { case (n, (_, _, lo)) => n -> lo })
      val hostRatio: Option[Double] =
        if (prevComparable && prevProbe.exists(_ > 0)) Some(pb / prevProbe.get)
        else None
      val attempts = meas.size
      val taintedCount = taintedM.values.map(_.size).sum
      val taintedPct = if (attempts == 0) 0.0 else 100.0 * taintedCount / attempts
      val artifactOk = !partial && taintedPct <= 25.0 && taintedOnly.isEmpty &&
        errs.isEmpty
      if (!artifactOk)
        System.err.println(f"[bench] ARTIFACT NOT OK: partial=$partial, " +
          f"$taintedPct%.1f%% samples contended, ${taintedOnly.size} " +
          f"queries tainted-only, ${errs.size} errors")
      if (stalls.size > 1) // "unclosed" is always present
        System.err.println(s"[bench] stall windows: ${(stalls - "unclosed").mkString(", ")}")

      def fmtMap(entries: Seq[(String, String)]): String =
        entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val qs = fmtMap(results.map { case (k, v) => k -> v.toString })
      def samplesOf(m: Map[String, Seq[Double]]) =
        fmtMap(queries.flatMap(q => m.get(q.name).filter(_.nonEmpty).map(ts =>
          q.name -> ts.map(v => f"$v%.3f").mkString("[", ",", "]"))))
      val samplesJson = samplesOf(clean)
      val taintedJson = samplesOf(taintedM)
      val rerunsJson = fmtMap(rrs.toSeq.sortBy(_._1).map { case (k, v) => k -> v.toString })
      val requeuedJson = fmtMap(requeuedCounts.toSeq.sortBy(_._1).map { case (k, v) => k -> v.toString })
      val errJson = errs.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      val calJson = cals
        .map { case (l, v) => "{\"at\":\"" + l + "\",\"sec\":" + f"$v%.3f" + "}" }
        .mkString("[", ",", "]")
      val stallJson = cals.map(_._1).filter(stalls)
        .map(l => "\"" + l + "\"").mkString("[", ",", "]")
      val taintedOnlyJson = taintedOnly.map(l => "\"" + l + "\"").mkString("[", ",", "]")
      val passJson = pts.map(v => f"$v%.2f").mkString("[", ",", "]")
      // pass 1 is WARMUP by construction: its samples absorb per-query
      // first-run JIT (~40% inflation measured r11) and the min-over-
      // samples protocol already discounts them — labeling the role makes
      // pass totals self-consistent instead of looking like a regression
      val passRolesJson = pts.indices
        .map(i => if (i == 0) "\"warmup\"" else "\"measure\"")
        .mkString("[", ",", "]")
      val fixturesJson = fmtMap(fixtures.map { case (t, rows, bytes, md5) =>
        t -> s"""{"rows":$rows,"bytes":$bytes,"md5":"$md5"}"""
      })
      val regressedJson = fmtMap(suspectsAll.sortBy(_._1).map {
        case (n, (anchor, prior, sevClamped, rawRatio, vNorm)) =>
          val f = flrs.get(n)
          // two verdicts per flag (r16): sev_clamped fired the gate;
          // sev_unclamped rescales by the RAW probe ratio — on a slow
          // window raw > 1 widens the denominator, so a flag whose
          // unclamped severity falls ≤1.3 is window, not code. The floor
          // variants re-state both against the forked-JVM floor (the
          // cleanest number this run has for the query). r18: the gate
          // fired on the window-NORMALIZED minimum (suite_min_norm);
          // the raw suite_min stays for cross-checking.
          val suiteMin = results0.toMap.apply(n)
          val sevUnclamped = vNorm / (prior * rawRatio)
          val floorPart = f.map { case (v, m) =>
            f""""floor":$v%.3f,"floor_mode":"$m","floor_sev_clamped":${v / (prior * math.max(rawRatio, 1.0))}%.3f,"floor_sev_unclamped":${v / (prior * rawRatio)}%.3f}"""
          }.getOrElse(""""floor":null,"floor_mode":"none"}""")
          n -> (f"""{"prev":$prior%.3f,"anchor":"$anchor","suite_min":$suiteMin%.3f,"suite_min_norm":$vNorm%.3f,"sev_clamped":$sevClamped%.3f,"sev_unclamped":$sevUnclamped%.3f,""" +
            floorPart)
      })
      val hostRatioJson = hostRatio.map(r => f"$r%.3f").getOrElse("null")
      // ── window quality (r16) ────────────────────────────────────────
      // The stall gate only quarantines probes >1.5x baseline AND
      // +0.25 s absolute — so a host oscillating 1.2-2.5x can pass every
      // probe as "clean" while the run's min-probe describes only its
      // fastest window (the r15 incident: lock probe-min 0.149 on a
      // 0.20-0.55 s window; 26 manufactured flags). The artifact
      // self-reports the spread of its CLEAN probes: a lock whose spread
      // exceeds 1.5x is a low-trust window and tools/lock.py refuses to
      // promote it.
      val cleanProbes = cals.filterNot { case (l, _) => stalls(l) }.map(_._2)
      val probeSpread =
        if (cleanProbes.isEmpty) 0.0 else cleanProbes.max / cleanProbes.min
      val probeSpreadAll =
        if (cals.isEmpty) 0.0 else cals.map(_._2).max / cals.map(_._2).min
      // median clean probe: on an oscillating host the MIN-probe
      // describes the fastest window while most samples ran elsewhere —
      // the median is the representative host unit a reader should
      // normalize per-query minima by when window_ok is false
      val probeP50 = if (cleanProbes.isEmpty) 0.0 else {
        val s = cleanProbes.sorted
        s((s.size - 1) / 2)
      }
      val windowOk = cleanProbes.nonEmpty && probeSpread <= 1.5
      if (!windowOk)
        System.err.println(f"[bench] WINDOW QUALITY LOW: clean-probe " +
          f"spread $probeSpread%.2fx (>1.5x) — minima describe the " +
          "fastest window, not the run; do not lock this artifact")
      // ── per-query min-window PROVENANCE (r17; dual-probe r18) ───────
      // The global spread refuses a run when ANY clean probe strayed
      // past 1.5x — even when every published minimum was measured in a
      // fast window (the stall gate's +0.25 s absolute guard lets
      // 1.5-2.8x windows stay "clean" on a ~0.15 s baseline, so one
      // slow stretch anywhere in a 45-minute run blows the max). What a
      // lock actually needs is narrower: THE SAMPLES BEING LOCKED must
      // come from windows comparable to the baseline. So each query
      // records the window its published minimum ran in, via BOTH
      // bounding probes (closing alone certified windows whose
      // mid-window burst subsided before the closing calibrate):
      // `min_windows` = max(open, close)/baseline — the certification
      // ratio (≤ 1.3, the settle band, means the locked value was
      // verifiably measured at baseline speed); `min_windows_lo` =
      // min(open, close)/baseline — the conservative divisor lock.py
      // uses to NORMALIZE a slow-window minimum into the baseline
      // probe unit (under-normalizing by construction). -1 in both
      // marks a floor-published value (fresh forked JVM — the stronger
      // r13 standalone protocol, provenanced by construction).
      // `minima_window_ok` = every query certified fast — the
      // per-sample criterion tools/lock.py accepts when the global
      // spread is blown by windows no locked sample ran in.
      // ANY successful floor certifies its query (-1), not only a
      // faster-than-suite one: the published value is min(suite, floor)
      // ≤ the floor, and the floor is a fresh-JVM standalone
      // measurement with its own quarantine — contention only ever
      // INFLATES a sample, so a suite minimum at or below a clean
      // standalone measurement cannot be window-inflated, whatever its
      // window's probes said (the r18 q161 case: a quarantined stall
      // probe OPENED the min's window and blew the certification ratio
      // to 3.1x while the sample itself was fine).
      def floorCertified(q: String): Boolean =
        flrs.get(q).exists(_._1 > 0)
      val minWindows: Map[String, Double] = winRatios.map {
        case (n, (_, hi, _)) =>
          n -> (if (floorCertified(n)) -1.0 else hi)
      }
      val minWindowsLo: Map[String, Double] = winRatios.map {
        case (n, (_, _, lo)) =>
          n -> (if (floorCertified(n)) -1.0 else lo)
      }
      val minimaWindowOk = !partial && queries.forall(q =>
        errs.contains(q.name) ||
          minWindows.get(q.name).exists(r => r == -1.0 || r <= 1.3))
      if (!windowOk && minimaWindowOk)
        System.err.println("[bench] minima window provenance OK: every " +
          "published minimum was measured in a <=1.3x-of-baseline " +
          "window (both bounding probes) or a forked floor — " +
          "per-sample evidence supersedes the global spread")
      val minWindowsJson = fmtMap(queries.flatMap(q =>
        minWindows.get(q.name).map(r => q.name -> f"$r%.3f")))
      val minWindowsLoJson = fmtMap(queries.flatMap(q =>
        minWindowsLo.get(q.name).map(r => q.name -> f"$r%.3f")))
      val prevRefJson =
        if (prevRef.isEmpty) "null"
        else "\"" + prevRefPath.toString + (if (prevComparable) "" else " (incomparable)") + "\""
      val roundRefJson = roundRef match {
        case None => "null"
        case Some((p, _, _, digest)) =>
          "\"" + p + (if (digest == fixturesDigest) "" else " (incomparable)") + "\""
      }
      val degradedJson = degraded.toSeq
        .map(d => "\"" + d + "\"").mkString("[", ",", "]")
      val deadlineJson = deadlineSec.map(d => f"$d%.0f").getOrElse("null")
      val json = s"""{"metric":"total","value":$total,"unit":"sec","partial":$partial,"artifact_ok":$artifactOk,"tainted_pct":${f"$taintedPct%.1f"},"queries":$qs,"samples":$samplesJson,"tainted_samples":$taintedJson,"tainted_only":$taintedOnlyJson,"reruns":$rerunsJson,"requeued":$requeuedJson,"errors":$errJson,"calibration":$calJson,"probe_baseline":${f"$pb%.3f"},"probe_p50":${f"$probeP50%.3f"},"probe_spread":${f"$probeSpread%.3f"},"probe_spread_all":${f"$probeSpreadAll%.3f"},"window_ok":$windowOk,"min_windows":$minWindowsJson,"min_windows_lo":$minWindowsLoJson,"minima_window_ok":$minimaWindowOk,"stall_windows":$stallJson,"pass_totals":$passJson,"pass_roles":$passRolesJson,"deadline_sec":$deadlineJson,"elapsed_sec":${f"$elapsedWall%.1f"},"degraded":$degradedJson,"fixtures":$fixturesJson,"fixtures_digest":"$fixturesDigest","fixtures_changed_since_prev":$fixturesChanged,"prev_ref":$prevRefJson,"round_ref":$roundRefJson,"host_ratio":$hostRatioJson,"regressed_vs_prev":$regressedJson,"sf":"$sfDir"}"""
      println(json)
      // the driver's per-round artifact keeps only the run's last 2000
      // output chars, which truncates the per-query JSON every round — so
      // the complete line is ALSO written into the repo, making the bench
      // artifact self-contained regardless of driver capture limits
      try {
        // repo-relative default: the bench runs from the checkout root
        // (both the harness driver and the verify recipe do), so the
        // artifact follows the working copy instead of a hardcoded machine
        // path; override with SPARK_GRAFT_BENCH_OUT for other layouts
        Option(benchOutPath.getParent)
          .foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(benchOutPath, json + "\n")
        System.err.println(s"[bench] full JSON written to $benchOutPath" +
          (if (partial) " (PARTIAL — crash flush)" else ""))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not persist full JSON: ${e.getMessage}")
      }
      // ── compact driver-channel summary (r18) ────────────────────────
      // The driver tail-captures only the last ~2000 chars of stdout, so
      // the full artifact line above has NEVER parsed on the driver side
      // (BENCH_r13/r15/r17 all rc=0 yet parsed:null). The FINAL stdout
      // line is therefore a <1 KiB summary that survives any tail
      // window: totals, the window verdict, and the worst-3 normalized
      // severities — the full per-query artifact stays in benchOutPath.
      val p50Scale =
        if (!windowOk && probeP50 > 0 && pb > 0) pb / probeP50 else 1.0
      val worst = suspectsAll.map { case (n, (_, prior, _, raw, vNorm)) =>
        val sevUn = vNorm / (prior * raw)
        val best = flrs.get(n).map(_._1 / (prior * raw))
          .map(math.min(_, sevUn)).getOrElse(sevUn)
        n -> best * p50Scale
      }.sortBy(-_._2).take(3)
      val worstJson = worst
        .map { case (n, s) => s"""{"q":"$n","sev_p50":${f"$s%.3f"}}""" }
        .mkString("[", ",", "]")
      val compact = s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","summary":true,"n_queries":${results.count(_._2 >= 0)},"artifact_ok":$artifactOk,"partial":$partial,"window_ok":$windowOk,"minima_window_ok":$minimaWindowOk,"probe_baseline":${f"$pb%.3f"},"probe_p50":${f"$probeP50%.3f"},"probe_spread":${f"$probeSpread%.3f"},"tainted_pct":${f"$taintedPct%.1f"},"errors_n":${errs.size},"flags_n":${suspectsAll.size},"worst":$worstJson,"degraded":$degradedJson,"elapsed_sec":${f"$elapsedWall%.1f"},"full":"$benchOutPath"}"""
      println(compact)
      json
    }

    // crash-robust flush: on SIGTERM (the driver's timeout sends it
    // before SIGKILL) the hook writes whatever passes completed as a
    // parsable partial artifact — the r16 run died at rc=124 with the
    // per-query minima all in memory and nothing on disk
    // the flag is CLAIMED (compareAndSet) by whichever emission path
    // runs first, so a SIGTERM racing the normal end of run cannot
    // overwrite the complete artifact with a partial one
    val emittedFinal = new java.util.concurrent.atomic.AtomicBoolean(false)
    val flushHook = new Thread(() => {
      if (emittedFinal.compareAndSet(false, true)) {
        System.err.println(f"[bench] shutdown at $elapsedWall%.0f s before " +
          "completion — flushing partial artifact")
        try { emit(partial = true); () }
        catch { case e: Throwable =>
          System.err.println(s"[bench] partial flush failed: ${e.getMessage}")
        }
      }
    }, "bench-partial-flush")
    Runtime.getRuntime.addShutdownHook(flushHook)

    // ── measurement passes ────────────────────────────────────────────
    // dev knob: floor-finding runs (e.g. root-causing one query's settle
    // point) want more in-JVM passes than the 2-pass default
    var maxPasses = sys.env.get("SPARK_GRAFT_MIN_PASSES").map(_.toInt).getOrElse(2)
    var pass = 0
    var budgetStop = false
    // r18 ladder state: lowBudget drops floors + settle + probe density
    // to protect the first MEASURE pass; measureComplete tracks whether
    // a full non-warmup pass finished — an artifact without one is
    // emitted partial:true (lock.py's existing refusal names it) instead
    // of masquerading as a complete warmup-only measurement (the r17
    // driver artifact: passes_capped_at_1 + floors_skipped_10, its
    // totals 1.4-3.6x inflated vs the same code at full rigor).
    var lowBudget = false
    var measureComplete = maxPasses <= 1 // an explicit 1-pass dev run is intentional
    while (pass < maxPasses && !budgetStop) {
      pass += 1
      // probe cadence: every 10 queries on pass 1 (the pass that
      // discovers the baseline and carries first-run JIT — fine
      // quarantine granularity matters most there), every 15 after —
      // ~1 s per calibration point × ~24 points × passes is real driver
      // budget on a 236-query suite; 20 under lowBudget (the probe-
      // density rung of the ladder)
      val calEvery = if (pass == 1) 10 else if (lowBudget) 20 else 15
      calibrate(s"p$pass.start")
      var passTotal = 0.0
      var i = 0
      while (i < queries.size && !budgetStop) {
        val q = queries(i)
        System.err.println(s"[bench] pass $pass ${q.name}")
        passTotal += runOnce(q)
        if ((i + 1) % calEvery == 0 && i + 1 < queries.size)
          calibrate(s"p$pass.q${i + 1}")
        // hard mid-pass budget stop: close the open segment with a real
        // probe so its samples classify normally, then fall through to
        // emission with whatever was measured
        if (remainingSec <= 0) {
          budgetStop = true
          degraded += s"pass$pass.stopped_at_q${i + 1}"
          System.err.println(s"[bench] BUDGET exhausted mid-pass $pass " +
            s"(query ${i + 1}/${queries.size}) — stopping measurements")
        }
        i += 1
      }
      calibrate(s"p$pass.end")
      if (!budgetStop && pass >= 2) measureComplete = true
      stateLock.synchronized { passTotals += passTotal }
      // two passes that disagree >1.25x mean one pass absorbed a broad
      // stall or pass-1 JIT never settled — buy one clean pass (bounded:
      // at most one extra). The r9 artifact's 1.31 pass ratio slipped
      // under the old 1.5 trigger and shipped 2-3x per-query regressions
      // on untouched code, so the trigger sits just above same-host
      // pass-to-pass noise (~1.1x) instead.
      if (pass == 2 && maxPasses == 2 &&
          passTotals.max > 1.25 * passTotals.min) {
        System.err.println(s"[bench] pass totals diverge ${passTotals.mkString(", ")} — running a third pass")
        maxPasses = 3
      }
      // settled-tail EXIT for a single-query floor child (r17): the
      // 8-pass floor exists to chase iterative queries' JIT descent, but
      // most floors flatten by pass 3-4 — once the samples neither
      // diverge nor still-improve, more passes only burn the parent's
      // fork budget (measured: q216's 8-pass floor spends 130+ s on a
      // query that settles by pass 4)
      if (standalone && only.size == 1 && pass >= 3 && pass < maxPasses) {
        val settled = classify()._1.get(queries.head.name).exists(ts =>
          ts.size >= 3 && !divergent(ts) && !stillImproving(ts))
        if (settled) {
          System.err.println(s"[bench] floor settled after $pass passes " +
            s"(samples ${classify()._1(queries.head.name).map(v => f"$v%.2f").mkString(", ")}) — exiting early")
          maxPasses = pass
        }
      }
      // ── budget gate between passes (r18 degradation ladder) ─────────
      // Rungs drop in order of information value: floors and settle
      // reruns FIRST, then probe density, and only then measure passes
      // — never below one completed measure pass. The pre-r18 ladder
      // capped passes first while reserving 300 s for floors, so a
      // tight budget kept the floors and sacrificed the only measure
      // pass: a warmup-only artifact whose totals carry ~40% first-run
      // JIT, useless for regression reading (the r17 driver run).
      if (!budgetStop && pass < maxPasses) {
        val nextCost = passTotal * 1.1
        if (pass == 1) {
          if (remainingSec < nextCost + 300 && !lowBudget) {
            lowBudget = true
            degraded += "floors_and_settle_dropped_for_measure_pass"
            degraded += "probe_cadence_relaxed"
            System.err.println(f"[bench] BUDGET: $remainingSec%.0f s " +
              f"left < measure pass (~$nextCost%.0f s) + 300 s reserve " +
              "— dropping floors + settle reruns and relaxing probe " +
              "cadence to protect the measure pass")
          }
        } else if (remainingSec < nextCost + 300) {
          degraded += s"passes_capped_at_$pass"
          System.err.println(f"[bench] BUDGET: $remainingSec%.0f s left " +
            f"< next pass (~$nextCost%.0f s) + 300 s reserve — " +
            s"capping at $pass passes")
          maxPasses = pass
        }
      }
    }

    // requeue sweeps: queries whose samples were quarantined by a stall
    // window get re-measured until each has at least one clean sample —
    // bounded at 2 sweeps so sustained contention terminates with the
    // artifact honestly marked not-ok rather than looping forever
    var sweep = 0
    while (sweep < 2 && needingClean(1).nonEmpty && remainingSec > 120) {
      sweep += 1
      val todo = needingClean(1)
      System.err.println(s"[bench] requeue sweep $sweep (${todo.size} contended): ${todo.map(_.name).mkString(", ")}")
      for ((q, i) <- todo.zipWithIndex if remainingSec > 60) {
        runOnce(q)
        if ((i + 1) % 5 == 0 || i + 1 == todo.size)
          calibrate(s"requeue$sweep.${q.name}")
      }
    }

    // fast-window CHASE sweeps (r17): a query whose current minimum was
    // measured only in a slow-but-unquarantined window (closing probe
    // > 1.3x baseline — "clean" under the stall gate's absolute guard,
    // but not comparable to the baseline the lock normalizes by) gets
    // re-measured until its minimum carries fast-window provenance.
    // This converts the global window lottery (45 straight clean
    // minutes or no lock) into a per-query completion criterion: the
    // host may oscillate BETWEEN measurements as long as every locked
    // minimum itself ran at baseline speed. Bounded sweeps — sustained
    // contention terminates with minima_window_ok=false, the honest
    // outcome.
    def slowMinQueries(): Seq[Queries.Q] = {
      val (measSnap, cals2) = stateLock.synchronized(
        (measurements.toVector, calSamples.toVector))
      val ratios = minWindowRatiosOf(measSnap, cals2, probeBaseline)
      // r18: chase on the CERTIFICATION ratio (max of the two bounding
      // probes) so the sweeps chase exactly what minima_window_ok
      // requires
      queries.filter(q => !errors.contains(q.name) &&
        ratios.get(q.name).exists(_._2 > 1.3))
    }
    var chase = 0
    while (chase < 3 && slowMinQueries().nonEmpty && remainingSec > 120) {
      chase += 1
      val todo = slowMinQueries()
      System.err.println(s"[bench] fast-window chase $chase " +
        s"(${todo.size} slow-window minima): " +
        todo.map(_.name).mkString(", "))
      for ((q, i) <- todo.zipWithIndex if remainingSec > 60) {
        runOnce(q)
        if ((i + 1) % 5 == 0 || i + 1 == todo.size)
          calibrate(s"chase$chase.${q.name}")
      }
    }

    // per-query settle reruns (see divergent/stillImproving above) —
    // bounded at 4 extra samples per query, each rerun closed by its own
    // probe so a contended rerun quarantines instead of committing.
    // Budget: the settle stage degrades SECOND (after pass capping) —
    // skipping it leaves first-sample minima that the floor stage or the
    // next round's anchors still catch
    var settleSkipped = false
    for (q <- queries if !lowBudget) {
      var extra = 0
      while (extra < 4 && remainingSec > 90 && classify()._1.get(q.name).exists(ts =>
          divergent(ts) || stillImproving(ts)) &&
          (extra < 2 || classify()._1.get(q.name).exists(stillImproving))) {
        System.err.println(s"[bench] re-running ${q.name}: clean samples ${classify()._1(q.name).mkString(", ")} (diverge >1.3x or still improving)")
        runOnce(q)
        calibrate(s"rerun.${q.name}.$extra")
        extra += 1
        stateLock.synchronized { reruns(q.name) = extra }
      }
      if (remainingSec <= 90 && !settleSkipped &&
          classify()._1.get(q.name).exists(ts => divergent(ts) || stillImproving(ts))) {
        settleSkipped = true
        degraded += "settle_reruns_skipped"
        System.err.println("[bench] BUDGET: skipping remaining settle reruns")
      }
    }

    // ── standalone floors for cross-round regressions (r13) ──────────
    // a query past an anchor's 1.3x band (and >0.2 s absolute — timer
    // jitter on trivial queries is not a regression) is suspect. Its
    // floor is measured in a FORKED fresh JVM (the SCALE.md standalone
    // protocol, automated): same classpath, same JVM flags, one query,
    // its own multi-pass protocol — immune to this process's
    // accumulated heap/block-manager state. If the fork cannot run
    // (classpath quirks), an in-process quiesced re-measure is the
    // labeled fallback.
    val resultsLive: Seq[(String, Double)] = {
      val (clean, taintedM) = classify()
      queries.map { q =>
        val c = clean.get(q.name).filter(_.nonEmpty).map(_.min)
        val d = taintedM.get(q.name).filter(_.nonEmpty).map(_.min)
        q.name -> c.orElse(d).getOrElse(-1.0)
      }
    }
    val suspectsAll = {
      val (measSnap, cals2) = stateLock.synchronized(
        (measurements.toVector, calSamples.toVector))
      val ratiosLo = minWindowRatiosOf(measSnap, cals2, probeBaseline)
        .map { case (n, (_, _, lo)) => n -> lo }
      suspectsOf(resultsLive, probeBaseline, ratiosLo)
    }
    // fork cost is ~1-2 min per query; bound a pathological run (e.g. a
    // global slowdown the probe missed) at the 10 worst offenders by
    // default — the rest still land in `regressed_vs_prev` with
    // floor_mode "none". A LOCK run should raise the cap
    // (SPARK_GRAFT_MAX_FLOORS) so no flagged query enters the lock
    // without floor provenance: unfloored inflated minima become the
    // next round's anchors, which is exactly the q132 contamination
    // mode the two-anchor gate exists to stop
    val floorCap = sys.env.get("SPARK_GRAFT_MAX_FLOORS").map(_.toInt)
      .getOrElse(10)
    val suspects = suspectsAll
      .sortBy { case (_, (_, _, sev, _, _)) => -sev }
      .take(floorCap).map(_._1)
    if (suspectsAll.nonEmpty)
      System.err.println(s"[bench] ${suspectsAll.size} queries past an " +
        "anchor prior x clamped-host x 1.3 (window-normalized): " +
        suspectsAll.map { case (n, (a, _, sev, _, _)) =>
          f"$n($a,${sev}%.2fx)" }.mkString(", ") +
        s" - measuring standalone floors for ${suspects.size}")

    def forkFloor(name: String, childPasses: Int, timeoutMin: Long): Option[Double] = {
      import scala.jdk.CollectionConverters._
      try {
        val javaBin = java.nio.file.Paths
          .get(sys.props("java.home"), "bin", "java").toString
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments.asScala.toSeq
          .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
        val cmd = Seq(javaBin) ++ jvmArgs ++
          Seq("-cp", sys.props("java.class.path"), "graft.Bench", name)
        val pb = new ProcessBuilder(cmd.asJava)
        pb.environment().put("SPARK_GRAFT_STANDALONE", "1")
        pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
        pb.environment().put("SPARK_GRAFT_CPUS", cpus)
        // iterative driver-bound queries JIT-improve for ~5 in-JVM runs
        // (the q63 lesson, re-measured r13: a 2-pass fork froze its
        // floor at 2.24 s where 6 passes settle to 1.63; the r15 judge's
        // standalone q179 was STILL descending at sample 5:
        // 28.8 → 18.97 → 12.94 → 10.85 → 11.57) — a 4-pass fork
        // systematically over-floors loop-shaped queries, so the child
        // gets 8 passes by default, its own still-improving chase
        // (bounded +4), AND the settled-tail early exit (r17) so flat
        // queries stop at pass 3 instead of burning all 8
        pb.environment().put("SPARK_GRAFT_MIN_PASSES", childPasses.toString)
        pb.environment().put("SPARK_GRAFT_BENCH_OUT",
          s"/tmp/graft_floor_$name.json")
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        // stdout goes to a FILE, not a pipe we drain inline: reading
        // the pipe to EOF before waitFor would block for as long as a
        // hung child holds stdout open, making the timeout dead code
        // exactly when the fork exists to bound a hang
        val outFile = java.nio.file.Files
          .createTempFile(s"graft_floor_out_$name", ".txt")
        pb.redirectOutput(outFile.toFile)
        val p = pb.start()
        try {
          if (!p.waitFor(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)) {
            p.destroyForcibly(); None
          } else {
            val out = new String(
              java.nio.file.Files.readAllBytes(outFile), "UTF-8")
            ("\"" + name + "\":(-?[0-9.eE+]+)").r.findFirstMatchIn(out)
              .map(_.group(1).toDouble).filter(_ > 0)
          }
        } finally { java.nio.file.Files.deleteIfExists(outFile); () }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] fork floor for $name failed: ${e.getMessage}")
        None
      }
    }
    // isolated bookkeeping: floor re-measures must not write the shared
    // errors map (a flaky floor attempt would mark a suite-clean query
    // errored and flip artifact_ok) nor land in `measurements` (which
    // would inflate `attempts` and skew tainted_pct) — so this times
    // the query directly instead of going through runOnce/calibrate
    def inprocFloor(q: Queries.Q): Option[Double] = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(1000)
      val ts = (1 to 3).flatMap { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] in-process floor attempt for " +
            s"${q.name} failed: ${e.getClass.getSimpleName}")
          None
        }
      }.filter(_ > 0)
      if (ts.isEmpty) None else Some(ts.min)
    }
    // budget-aware floor stage (degrades THIRD): floors run newest-
    // worst-first; per-fork child passes shrink as the budget tightens
    // (8 → 4 → 2), and floors are skipped entirely (the LAST resort —
    // an unfloored flag makes tools/lock.py refuse, which is the honest
    // outcome for a run that ran out of time) below 120 s remaining
    var floorsSkipped = 0
    for ((n, idx) <- suspects.zipWithIndex) {
      val perFloorBudget = remainingSec / math.max(1, suspects.size - idx)
      if (lowBudget || remainingSec <= 120) {
        floorsSkipped += 1
      } else {
        val childPasses =
          if (perFloorBudget >= 300 || deadlineSec.isEmpty) 8
          else if (perFloorBudget >= 150) 4
          else 2
        if (childPasses < 8)
          degraded += s"floor_$n.passes_$childPasses"
        val timeoutMin = math.max(2L,
          math.min(20L, (remainingSec * 0.9 / 60).toLong))
        val floor = forkFloor(n, childPasses, timeoutMin)
          .map((_, "forked-jvm"))
          .orElse(Queries.byName.get(n).flatMap(q =>
            inprocFloor(q).map((_, "in-process"))))
        floor.foreach { case (f, mode) =>
          stateLock.synchronized { floorsAcc(n) = (f, mode) }
          System.err.println(f"[bench] standalone floor $n = $f%.2f s ($mode; " +
            f"suite min ${resultsLive.toMap.apply(n)}%.2f)")
        }
      }
    }
    if (floorsSkipped > 0) {
      degraded += s"floors_skipped_$floorsSkipped"
      System.err.println(s"[bench] BUDGET: skipped $floorsSkipped floors " +
        "(<=120 s remaining) — their flags stay unfloored in the artifact")
    }

    // ── provenance floors (r18) ──────────────────────────────────────
    // A query whose minimum's window certification is beyond lock.py's
    // 3x rescale bound (a quarantined stall probe bounding the window
    // blows max(open, close) even when the sample itself was fine)
    // cannot be certified OR normalized from suite evidence — but a
    // standalone floor certifies it absolutely (published value ≤ a
    // clean fresh-JVM measurement ⟹ not window-inflated). Take floors
    // for the few such queries so one unlucky probe cannot hold the
    // whole lock hostage. Bounded; skipped under lowBudget like the
    // flag floors.
    if (!standalone && only.isEmpty && !lowBudget) {
      val needProv = {
        val (measSnap, cals2) = stateLock.synchronized(
          (measurements.toVector, calSamples.toVector))
        val ratios = minWindowRatiosOf(measSnap, cals2, probeBaseline)
        // two tiers, worst-first WITHIN each (r19 — the advisor's
        // no-silent-caps finding: the old alphabetical take(6) could
        // drop the worst offender and leave lock.py refusing with no
        // hint the CAP, not the evidence, was the cause):
        //  1. hi > RescaleBound (= lock.py's RMAX = 3.0) —
        //     uncertifiable AND unnormalizable (lock.py refuses the
        //     whole run without a floor here);
        //  2. lo > ManufacturedFlagBand (1.45) — normalizable, but in
        //     the measured band (r18: 1.49-1.76x divisors, inflated by
        //     mid-window fast dips) where a normalized anchor
        //     manufactures flags on a slow host. A floor certifies the
        //     query absolutely and takes it out of normalization
        //     entirely.
        // PAIRED THRESHOLDS: lock.py's floor-corroboration block caps
        // normalized anchors at floor/RMAX — it consumes exactly the
        // floors this stage emits, sized by these two bands. Retune
        // RescaleBound together with lock.py RMAX, and
        // ManufacturedFlagBand together with the residual it encodes
        // (re-measure the lo-divisor distribution before moving it).
        val RescaleBound = 3.0       // == tools/lock.py RMAX
        val ManufacturedFlagBand = 1.45
        val all = ratios.toSeq
          .filterNot { case (n, _) =>
            floorsAcc.contains(n) || errors.contains(n) }
          .collect {
            case (n, (_, hi, _)) if hi > RescaleBound => (n, 0, hi)
            case (n, (_, hi, lo)) if lo > ManufacturedFlagBand =>
              (n, 1, lo)
          }
          .sortBy { case (_, tier, sev) => (tier, -sev) }
        val kept = all.take(6)
        if (all.size > kept.size)
          System.err.println(s"[bench] provenance-floor cap: taking " +
            s"${kept.size} of ${all.size} candidates, DROPPED: " +
            all.drop(kept.size).map { case (n, t, s) =>
              f"$n(${if (t == 0) "hi" else "lo"}=$s%.2f)" }
              .mkString(", "))
        kept.map(_._1)
      }
      for (n <- needProv if remainingSec > 120) {
        val timeoutMin = math.max(2L,
          math.min(20L, (remainingSec * 0.9 / 60).toLong))
        val floor = forkFloor(n, 8, timeoutMin).map((_, "forked-jvm"))
          .orElse(Queries.byName.get(n).flatMap(q =>
            inprocFloor(q).map((_, "in-process"))))
        floor.foreach { case (f, mode) =>
          stateLock.synchronized { floorsAcc(n) = (f, mode) }
          System.err.println(f"[bench] provenance floor $n = $f%.2f s " +
            s"($mode; window uncertifiable or lo-divisor in the " +
            "manufactured-flag band)")
        }
      }
    }

    if (emittedFinal.compareAndSet(false, true)) {
      try Runtime.getRuntime.removeShutdownHook(flushHook)
      catch { case _: IllegalStateException => () } // already shutting down
      // no completed measure pass ⇒ the minima are warmup samples;
      // partial:true is the honest label (lock.py refuses it by name)
      if (!measureComplete)
        System.err.println("[bench] no completed measure pass — " +
          "emitting partial:true (warmup-only minima are not a " +
          "measurement)")
      emit(partial = !measureComplete)
    }
    spark.stop()
  }
}
