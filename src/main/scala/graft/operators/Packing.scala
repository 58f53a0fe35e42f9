package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Sequence packing for training-data preparation: concatenate documents
  * in a deterministic shard order and cut the token stream into
  * fixed-budget chunks (the "pack then split" regime — no token is
  * wasted; a doc may straddle a chunk boundary, recorded by its
  * first/last chunk ids).
  *
  * Scale: ONE shuffle — the per-shard window (shard = a bounded-width
  * key like language or a hash bucket, the production sharding). A
  * GLOBAL packing order would collapse the window to a single partition
  * (the classic running-total scale-killer, same reason q43 partitions
  * by user); sharding bounds every partition and packs shards
  * independently, which is exactly how multi-worker training shards its
  * corpus anyway.
  */
object Packing {

  /** Per-doc packing coordinates: token count, the shard-local token
    * offset where the doc starts, and the first/last chunk ids it lands
    * in under `tokenBudget`-sized chunks. Deterministic: shard order is
    * (orderCol) — pass a unique id. */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
                 shardCol: String, tokenBudget: Int): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(shardCol),
        Text.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("tok_offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("first_chunk", expr(s"tok_offset div $tokenBudget"))
      .withColumn("last_chunk",
        expr(s"(tok_offset + n_tok - 1) div $tokenBudget"))
  }

  /** Overlapping token-window chunking (the RAG/embedding grain change):
    * one row per `window`-token chunk every `stride` tokens, with the
    * chunk text re-materialized from the token slice. Pure narrow ops —
    * tokenize, arithmetic, explode, slice — no shuffle at any scale; the
    * fan-out factor is ~n_tok/stride per doc. Every token is covered
    * (the final chunk is short rather than dropped), and with
    * stride == window the chunks concatenate back to the document
    * (spec-asserted). */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        lit(1L) + greatest(lit(0L),
          expr(s"(n_tok - $window + $stride - 1) div $stride")))
      .select(col(idCol), col("toks"), col("n_tok"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_len", least(lit(window.toLong), col("n_tok") - col("tok_start")))
      .select(col(idCol), col("chunk_idx"), col("tok_start"), col("tok_len"),
        array_join(slice(col("toks"), (col("tok_start") + 1).cast("int"),
          col("tok_len").cast("int")), " ").as("chunk_text"))
  }
}
