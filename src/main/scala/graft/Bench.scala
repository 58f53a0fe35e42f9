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
    // noop sink materializes every row (count() would let parquet
    // count-star shortcuts skip the actual work)
    val only = args.toSet // optional query-name filter (dev use)
    // best-of-2 per query, INTERLEAVED (full pass over all queries, then
    // a second pass): a single multi-minute host-interference stall can
    // poison at most one sample of any query, so the per-query min stays
    // a steady-state number (round-1 recorded 187 s for a ~42 s suite
    // because back-to-back repeats put both samples inside one stall)
    val queries = Queries.all.filter(q => only.isEmpty || only(q.name))
    val times = scala.collection.mutable.Map.empty[String, Double]
    val errors = scala.collection.mutable.Map.empty[String, String]
    // host-stall calibration: a fixed CPU-bound probe timed at every pass
    // boundary. The probe's cost is invariant across rounds, so a slow
    // sample pins host interference to a specific window of the run —
    // making a stall-poisoned artifact identifiable from the JSON alone
    // (round-4's artifact was uniformly 1.5-4x inflated and unfalsifiable)
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(400000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passTotals = scala.collection.mutable.ArrayBuffer.empty[Double]
    var maxPasses = 2
    var round = 0
    while (round < maxPasses) {
      round += 1
      calSamples += calibrate()
      var passTotal = 0.0
      for (q <- queries) {
        System.err.println(s"[bench] round $round ${q.name}")
        // cold plans only: queries that persist() intermediates (q35, q51)
        // register them in the CacheManager, so round-2 samples of the
        // identical plan would otherwise read round-1's cache and min-of-2
        // would report warm-cache times, not steady-state
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          // noop sink materializes every row (count() would let parquet
          // count-star shortcuts skip the actual work)
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          passTotal += dt
          times(q.name) = math.min(dt, times.getOrElse(q.name, Double.MaxValue))
          errors.remove(q.name) // a later success supersedes an earlier failure
        } catch {
          case e: Throwable => // a failed attempt must NOT count as a time
            errors(q.name) = e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("")
                .map(c => if (c >= ' ' && c <= '~' && c != '"' && c != '\\') c else ' ')
                .take(200)
        }
      }
      passTotals += passTotal
      // two samples that disagree >1.5x mean one pass absorbed a stall and
      // min-of-2 may still hold poisoned samples for queries hit in BOTH
      // passes — buy one clean pass (bounded: at most one extra)
      if (round == 2 && maxPasses == 2 &&
          passTotals.max > 1.5 * passTotals.min) {
        System.err.println(s"[bench] pass totals diverge ${passTotals.mkString(", ")} — running a third pass")
        maxPasses = 3
      }
    }
    calSamples += calibrate()
    val results = queries.map(q => q.name -> times.getOrElse(q.name, -1.0))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val calJson = calSamples.map(v => f"$v%.3f").mkString("[", ",", "]")
    val passJson = passTotals.map(v => f"$v%.2f").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"calibration":$calJson,"pass_totals":$passJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
