package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 scale-point probe (dev tool, run by hand): measured rows
  * for the SCALE.md claims that were argued-but-unmeasured after r15 —
  * CELF maxCoverageSelect per-round cost + re-evaluation counts at
  * growing k, fuzzyDupPairs bucket-size behavior across SF, and
  * kmvOverlapMatrix sketch-grain cost across SF.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   java -cp ... graft.ScaleProbeMain [celf|fuzzy|kmv]
  */
object ScaleProbeMain {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.sources.Tables.nanosConf._1, graft.sources.Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val which = a.headOption.getOrElse("all")

    if (which == "celf" || which == "all") {
      // CELF at growing k: total seconds, re-evaluations, re-evals/round
      // after the round-1 full sweep (the flat-per-round claim)
      for (k <- Seq(4, 16, 48)) {
        // fresh run each k (no warm sharing beyond the JVM)
        val t0 = System.nanoTime()
        val (out, reevals) = graft.operators.Selection
          .maxCoverageSelectCounted(docs, "doc_id", "text", k)
        val rows = out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val n = docs.count()
        println(f"CELF k=$k%-3d rounds=$rows%-3d total=$dt%7.2f s " +
          f"reevals=$reevals (n=$n, naive would be ${n * rows}); " +
          f"tail reevals/round=${if (rows > 1) (reevals - n) / (rows - 1) else 0}")
      }
    }

    if (which == "fuzzy" || which == "all") {
      // two sweeps: the first absorbs JIT, report the second (warm)
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val d = graft.sources.Tables(spark, sf, "documents")
        val t0 = System.nanoTime()
        val pairs = graft.operators.Dedup
          .fuzzyDupPairs(d, "doc_id", "text").count()
        val dt = (System.nanoTime() - t0) / 1e9
        // candidate-bucket skew: posts per gram bucket (the inverted
        // index the self-join runs over) — max and p99
        val posts = {
          val q = 2; val maxDist = 4; val prefixTokens = 6
          val keyed = d.select(col("doc_id").as("id"), concat_ws(" ",
            slice(graft.functions.Text.tokens(lower(col("text"))), 1,
              prefixTokens)).as("k"))
            .withColumn("klen", length(col("k")))
          val grams = keyed.withColumn("gs",
            when(col("klen") >= q, array_distinct(expr(
              s"transform(sequence(1, length(k) - ${q - 1}), i -> substr(k, i, $q))")))
              .otherwise(array().cast("array<string>")))
            .select(col("id"), explode(col("gs")).as("g"))
          val dfTab = grams.groupBy("g").agg(count(lit(1)).as("df"))
          val ranked = grams.join(dfTab, Seq("g"))
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
                .orderBy(col("df"), col("g"))))
            .filter(col("rn") <= maxDist * q + 1)
          ranked.groupBy("g").agg(count(lit(1)).as("b"))
            .agg(max("b").as("mx"),
              expr("percentile(b, 0.99)").as("p99"),
              count(lit(1)).as("nbuckets")).collect()(0)
        }
        val n = d.count()
        println(f"FUZZY sf=$sf docs=$n pairs=$pairs wall=$dt%7.2f s " +
          s"bucketMax=${posts.get(0)} bucketP99=${posts.get(1)} " +
          s"buckets=${posts.get(2)}")
      }
    }

    if (which == "kmv" || which == "all") {
      // two sweeps: the first absorbs JIT, report the second (warm)
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val d = graft.sources.Tables(spark, sf, "documents")
        val n = d.count()
        val t0 = System.nanoTime()
        val sk = graft.operators.Frequency.kmvSketches(d, "source", "text", k = 128)
          .localCheckpoint(true)
        val skRows = sk.count()
        val t1 = System.nanoTime()
        val m = graft.operators.Frequency.kmvOverlapMatrix(sk, "source", k = 128).count()
        val t2 = System.nanoTime()
        println(f"KMV sf=$sf docs=$n sketchRows=$skRows matrixRows=$m " +
          f"sketchBuild=${(t1 - t0) / 1e9}%7.2f s matrix=${(t2 - t1) / 1e9}%7.3f s")
        graft.operators.Checkpoints.release(sk)
      }
    }
    spark.stop()
  }
}
