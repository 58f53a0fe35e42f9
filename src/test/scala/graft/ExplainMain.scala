package graft

/** Dev tool: dump formatted physical plans for named queries.
  * `sbt "Test/runMain graft.ExplainMain q11_agg_rollup ..."` */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = if (args.nonEmpty) args.toSeq else Queries.all.map(_.name)
    names.foreach { name =>
      println(s"===== $name =====")
      Queries.byName(name).run(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
