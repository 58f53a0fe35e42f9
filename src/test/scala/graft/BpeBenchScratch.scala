package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BpeBenchScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), regexp_replace(col("text"), " ", "_").as("text"))
    docs.cache().count()
    for (mb <- Seq(16, 64)) {
      val t0 = System.nanoTime()
      val (m, rounds) = graft.operators.Tokenizer
        .trainMergesBatchedWithRounds(docs, "text", 512, maxBatch = mb)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val enc = graft.operators.Tokenizer.encode(docs, "doc_id", "text", m)
      val nTok = enc.select(explode(col("toks"))).count()
      val tEnc = (System.nanoTime() - t1) / 1e9
      println(f"BP maxBatch=$mb merges=${m.size} rounds=$rounds scans=${2*rounds} train=$tTrain%.1f s encode=$tEnc%.2f s (${tEnc/5000*1000}%.3f ms/doc, $nTok toks)")
    }
    spark.stop()
  }
}
