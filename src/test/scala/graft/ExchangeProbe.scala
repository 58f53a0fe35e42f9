package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: distinct shuffle-exchange ids for scale-claim specs. */
object ExchangeProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    implicit val s = spark
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    def count(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(FormattedMode)
      val sh = "(?<!Broadcast)Exchange \\((\\d+)\\)".r
        .findAllMatchIn(txt).map(_.group(1)).toSet
      println(s"$name -> ${sh.size} shuffle exchanges: ${sh.toSeq.map(_.toInt).sorted}")
      val lines = txt.linesIterator.toSeq
      for (i <- lines.indices
           if sh.exists(id => lines(i).startsWith(s"($id) Exchange"))) {
        val arg = lines.drop(i).find(_.trim.startsWith("Arguments:"))
        println("   " + lines(i) + " | " + arg.getOrElse("").trim.take(120))
      }
    }
    count("bigram", operators.Quality.bigramPerplexityBuckets(docs, "doc_id", "text"))
    spark.catalog.clearCache()
    count("kn", operators.Quality.knTrigramPerplexityBuckets(docs, "doc_id", "text"))
    spark.catalog.clearCache()
    count("hh", operators.Frequency.heavyHitters(docs, "text", 4096, 20))
    spark.stop()
  }
}
