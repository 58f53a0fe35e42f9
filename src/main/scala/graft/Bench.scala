package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
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

    // ALL samples are recorded and emitted (not just the min): a
    // stall-poisoned sample is then visible in the artifact itself
    // instead of silently deciding a query's reported time (round 7's
    // artifact recorded 10-100x-poisoned minimums with no way to tell
    // from the JSON — the round-8 top task)
    val samples = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    val errors = scala.collection.mutable.Map.empty[String, String]
    val reruns = scala.collection.mutable.Map.empty[String, Int]

    def runOnce(q: Queries.Q): Unit = {
      // cold plans only: queries that persist() intermediates (q35, q51)
      // register them in the CacheManager, so later samples of the
      // identical plan would otherwise read an earlier sample's cache and
      // report warm-cache times, not steady-state
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        // noop sink materializes every row (count() would let parquet
        // count-star shortcuts skip the actual work)
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        samples.getOrElseUpdate(q.name, scala.collection.mutable.ArrayBuffer.empty) += dt
        errors.remove(q.name) // a later success supersedes an earlier failure
      } catch {
        case e: Throwable => // a failed attempt must NOT count as a time
          errors(q.name) = e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("")
              .map(c => if (c >= ' ' && c <= '~' && c != '"' && c != '\\') c else ' ')
              .take(200)
      }
    }

    // host-stall calibration: a fixed CPU-bound probe, INTERLEAVED every
    // `calEvery` queries (not just at pass boundaries — round 7's
    // mid-pass stall sat invisibly between 3 boundary probes in a
    // 17-minute run). The probe's cost is invariant across rounds, so a
    // slow sample pins host interference to a specific window of the run,
    // making a stall-poisoned artifact identifiable AND localizable from
    // the JSON alone.
    val calEvery = 10
    val calSamples = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def calibrate(label: String): Unit = {
      val t0 = System.nanoTime()
      spark.range(400000000L).selectExpr("sum(id * 3 + 1)").collect()
      calSamples += label -> (System.nanoTime() - t0) / 1e9
    }

    val passTotals = scala.collection.mutable.ArrayBuffer.empty[Double]
    var maxPasses = 2
    var pass = 0
    while (pass < maxPasses) {
      pass += 1
      calibrate(s"p$pass.start")
      var passTotal = 0.0
      for ((q, i) <- queries.zipWithIndex) {
        System.err.println(s"[bench] pass $pass ${q.name}")
        val before = samples.get(q.name).map(_.sum).getOrElse(0.0)
        runOnce(q)
        passTotal += samples.get(q.name).map(_.sum).getOrElse(0.0) - before
        if ((i + 1) % calEvery == 0 && i + 1 < queries.size)
          calibrate(s"p$pass.q${i + 1}")
      }
      calibrate(s"p$pass.end")
      passTotals += passTotal
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
    }

    // per-query settle defense: until the two FASTEST samples of a query
    // agree within 1.3x, at least one of them is not a steady-state
    // number (JIT warm-up, cache population, or a host stall) —
    // re-measure, bounded at 2 extra samples per query. r9 shipped with
    // a 3x threshold and four queries regressed 2-3x on untouched code
    // purely because their pass-1/pass-2 samples never settled; 1.3x is
    // the judged "two fastest agree within 30%" criterion. The 0.05 s
    // absolute guard keeps sub-tenth-second timer jitter on trivial
    // queries from eating the rerun budget. The emitted JSON keeps every
    // sample, so an unexplained divergent pair stays self-evident.
    def divergent(ts: Seq[Double]): Boolean = {
      val best = ts.sorted.take(2)
      best.size == 2 && best(1) > 1.3 * best(0) && best(1) - best(0) > 0.05
    }
    for (q <- queries) {
      var extra = 0
      while (extra < 2 && samples.get(q.name).exists(s => divergent(s.toSeq))) {
        System.err.println(s"[bench] re-running ${q.name}: samples ${samples(q.name).mkString(", ")} diverge >1.3x")
        calibrate(s"rerun.${q.name}.before")
        runOnce(q)
        extra += 1
        reruns(q.name) = extra
      }
    }

    val results = queries.map(q => q.name ->
      samples.get(q.name).map(_.min).getOrElse(-1.0))
    def fmtMap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = fmtMap(results.map { case (k, v) => k -> v.toString })
    val samplesJson = fmtMap(queries.flatMap(q => samples.get(q.name).map(ts =>
      q.name -> ts.map(v => f"$v%.3f").mkString("[", ",", "]"))))
    val rerunsJson = fmtMap(reruns.toSeq.sortBy(_._1).map { case (k, v) => k -> v.toString })
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val calJson = calSamples
      .map { case (l, v) => "{\"at\":\"" + l + "\",\"sec\":" + f"$v%.3f" + "}" }
      .mkString("[", ",", "]")
    // stall windows flagged in-artifact: any probe >3x the MEDIAN probe
    // AND at least 1 s over it — the median is robust to the probe's own
    // sub-second jitter (a min baseline flagged ordinary 0.1→0.5 s
    // variance), while a genuine host stall (the r7 poison was 10-100x
    // on multi-second queries) shows up as a multi-second probe
    val calSorted = calSamples.map(_._2).sorted
    val calMed = if (calSorted.isEmpty) 0.0 else calSorted(calSorted.size / 2)
    val stallJson = calSamples
      .filter { case (_, v) => v > 3 * calMed && v > calMed + 1.0 }
      .map { case (l, _) => "\"" + l + "\"" }.mkString("[", ",", "]")
    val passJson = passTotals.map(v => f"$v%.2f").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$samplesJson,"reruns":$rerunsJson,"errors":$errJson,"calibration":$calJson,"stall_windows":$stallJson,"pass_totals":$passJson,"sf":"$sfDir"}"""
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
      val out = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "docs/bench_full.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, json + "\n")
      System.err.println(s"[bench] full JSON written to $out")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist full JSON: ${e.getMessage}")
    }
    spark.stop()
  }
}
