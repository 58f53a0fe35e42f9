package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a distributed corpus
  * (Sennrich, Haddow & Birch, ACL 2016 — the subword algorithm behind
  * GPT/Llama-family vocabularies).
  *
  * Division of labor (the [[Similarity.CentroidSet]] / [[Embeddings]]
  * pattern): the corpus-sized work per iteration — counting adjacent
  * symbol pairs — is ONE scan feeding a partial aggregate whose
  * exchange is bounded by the number of DISTINCT pairs (≤ current
  * vocab², in practice the live-pair set), never by corpus size; the
  * argmax pick is a 1-row collect and the merge table is MODEL
  * PARAMETERS on the driver. Applying a merge is a narrow per-word
  * array fold (no shuffle); each training iteration materializes its
  * symbol table (persist + count) so the plan stays one-fold deep
  * instead of nesting n HOFs — and so the lineage doesn't recompute
  * every prior merge per iteration.
  *
  * Word-boundary convention: words are whitespace tokens, pairs never
  * cross a boundary, and no end-of-word marker is appended (the
  * marker-free variant; adding one is a projection on [[toSymbols]]).
  */
object Tokenizer {

  /** Words → initial symbol arrays (one row per word, chars as
    * symbols). Narrow: split + explode + per-char slice. */
  def toSymbols(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("sym"))

  /** Adjacent-pair counts over a symbol table: the BPE training
    * statistic. One explode of in-word adjacencies into a partial
    * aggregate — the exchange carries distinct (a, b) pairs only. */
  def pairCounts(symbols: DataFrame): DataFrame =
    symbols.filter(size(col("sym")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("sym")) - 1),
        i => struct(element_at(col("sym"), i).as("a"),
          element_at(col("sym"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** One merge applied to a symbol array: the standard greedy
    * left-to-right pass (overlaps resolve leftmost: a,a,a under (a,a)
    * → [aa, a]) as a single `aggregate` fold — pure narrow compute. */
  def applyMerge(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** The trained artifact: ordered merges. Inference = replaying them
    * in order ([[applyMerges]]) — exactly how BPE vocabularies ship. */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (c, (a, b)) => applyMerge(c, a, b) }

  /** Train `nMerges` BPE merges: per iteration, count pairs (corpus
    * scan #i), pick the most frequent (ties: lexicographic (a, b) —
    * deterministic across runs and partitionings), apply it, and
    * materialize the new symbol table. Stops early when no pair
    * remains. Returns the ordered merge table. */
  def trainMerges(docs: DataFrame, textCol: String,
                  nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cached = toSymbols(docs, textCol).persist()
    cached.count()
    try {
      var continue = true
      var i = 0
      while (i < nMerges && continue) {
        val top = pairCounts(cached)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) continue = false
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          val next = cached
            .select(applyMerge(col("sym"), a, b).as("sym")).persist()
          next.count()
          cached.unpersist()
          cached = next
        }
        i += 1
      }
    } finally cached.unpersist()
    merges.toSeq
  }
}
