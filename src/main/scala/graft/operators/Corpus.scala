package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Composed training-corpus preparation: the end-to-end shape of an LLM
  * data pipeline — quality gate → language gate → exact dedup → near-dup
  * dedup — as one declarative plan.
  *
  * Dedup survivor policy: per exact-duplicate group keep min(id); then
  * drop any doc that has a near-duplicate (3-gram Jaccard ≥ threshold)
  * with a smaller id — the smallest member of each near-dup cluster
  * survives (transitively greedy, deterministic).
  *
  * Scale: each stage is one narrow projection or one keyed shuffle; the
  * near-dup stage reuses [[Dedup.jaccardPairs]]' inverted index (no O(n²)
  * scan). Stages compose lazily — Catalyst fuses the projections.
  */
object Corpus {

  def prepare(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String], langMarkers: Seq[(String, Seq[String])],
              keepLangs: Set[String], minQuality: Double,
              nearDupThreshold: Double): DataFrame = {
    val id = col(idCol); val text = col(textCol)

    val gated = docs
      .withColumn("quality", Text.qualityScore(text, stopwords))
      .withColumn("lang_pred", Text.langId(lower(text), langMarkers))
      .filter(col("quality") >= minQuality &&
        col("lang_pred").isin(keepLangs.toSeq.map(lit): _*))

    // exact dedup: min id per content hash
    val exactKeep = gated.groupBy(md5(text).as("__h"))
      .agg(min(id).as(idCol))
      .select(idCol)
    val exact = gated.join(exactKeep, Seq(idCol), "left_semi")

    // near-dup dedup: drop docs with a smaller-id near-duplicate
    val dupOf = Dedup.jaccardPairs(exact, idCol, textCol,
        nearDupThreshold, shingleLen = 3)
      .select(col("id_b").as(idCol)).distinct()
    exact.join(dupOf, Seq(idCol), "left_anti")
      .select(id, Text.tokenCount(text).as("n_tokens"), col("quality"),
        col("lang_pred"))
  }
}
