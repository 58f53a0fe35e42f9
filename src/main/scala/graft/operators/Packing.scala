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

  /** Chunk-GRAIN packing output: one row per (shard, chunk, doc) with the
    * doc-local token span that chunk takes — the materialized composition
    * a training pipeline reads to assemble each fixed-budget sequence
    * (q66's [[packChunks]] coordinates, exploded to the chunk grain).
    *
    * For a doc at shard offset o with n tokens, chunk c covers the
    * doc-local half-open span [max(0, c·B − o), min(n, (c+1)·B − o)).
    * Narrow on top of packChunks' one window shuffle — the explode fans
    * out ~n_tok/tokenBudget rows per doc with no further exchange.
    * Invariant (spec-asserted): per (shard, chunk), chunk_tok_len sums to
    * exactly `tokenBudget` except the final chunk of each shard. */
  def packChunkRows(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, tokenBudget: Int): DataFrame =
    packChunks(docs, idCol, textCol, shardCol, tokenBudget)
      .select(col(idCol), col(shardCol), col("n_tok"), col("tok_offset"),
        explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk_id"))
      .withColumn("doc_tok_start",
        greatest(lit(0L), col("chunk_id") * tokenBudget - col("tok_offset")))
      .withColumn("chunk_tok_len",
        least(col("n_tok"), (col("chunk_id") + 1) * tokenBudget - col("tok_offset"))
          - col("doc_tok_start"))
      .select(col(shardCol), col("chunk_id"), col(idCol),
        col("doc_tok_start"), col("chunk_tok_len"))

  /** Materialized training sequences: [[packChunkRows]]' spans re-joined
    * with the document text, each span sliced out of its doc's token
    * array, and the pieces concatenated in doc order per (shard, chunk) —
    * one row per chunk with the exact `tokenBudget`-token text a trainer
    * reads (final chunk of each shard shorter). This is the output
    * artifact of the packing pipeline.
    *
    * Scale: the span join ships each doc's text ONCE (id-keyed join, the
    * verify-re-join discipline); the per-chunk ordered concat is the
    * [[Relational.orderedStringAgg]] shape — group size is bounded by
    * tokenBudget (a chunk holds at most tokenBudget one-token docs), so
    * per-group memory is O(budget) regardless of corpus size. Two
    * shuffles total: the packing window and the chunk groupBy. */
  def assembleChunks(docs: DataFrame, idCol: String, textCol: String,
                     shardCol: String, tokenBudget: Int): DataFrame =
    packChunkRows(docs, idCol, textCol, shardCol, tokenBudget)
      .join(docs.select(col(idCol), split(col(textCol), " ").as("toks")), Seq(idCol))
      .withColumn("piece",
        array_join(slice(col("toks"), (col("doc_tok_start") + 1).cast("int"),
          col("chunk_tok_len").cast("int")), " "))
      .groupBy(col(shardCol), col("chunk_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col(idCol), col("piece")))),
          x => x.getField("piece")), " ").as("chunk_text"),
        sum(col("chunk_tok_len")).as("n_tok"))

  /** Deterministic EPOCH SHUFFLE: every row gets a reproducible
    * pseudo-random sort key (md5 over id + seed — engine-reproducible,
    * so an oracle can replay the exact permutation) and a shard from the
    * key's LAST SIX hex digits (a 16^6 = 16.7M domain, so `numShards`
    * can track executor count at any cluster size — the per-shard
    * packing window sorts one shard per task, and a wide shard domain is
    * what keeps that task bounded as the corpus grows). This is the
    * "globally shuffle the corpus before packing" step of a training
    * pipeline WITHOUT a global sort bottleneck: downstream packing
    * windows on (epoch_shard, epoch_key), so the permutation is realized
    * as `numShards` independent sorted streams — exactly the
    * multi-worker data-order contract, and the key hash balances shards
    * uniformly. Uniformity needs `numShards` well under the 16^6 hash
    * domain — pmod over a finite domain gives some shards one extra
    * residue class, a max/min load ratio of ⌈D/n⌉/⌊D/n⌋ — so the cap is
    * 16^5: the worst case (n just above a divisor of D) is then 17/16 ≈
    * 6% imbalance, and for realistic shard counts (≤ 10^4 workers) the
    * bias is < 0.1%. A shard-per-core cluster bigger than 16^5 would
    * need more hash digits, which is a breaking change to the
    * replayable shard arithmetic — widen deliberately, not silently.
    * A new seed is a new epoch permutation; columns pass
    * through, so the output feeds [[packChunks]]/[[packGreedyNoSplit]]
    * directly with idCol = "epoch_key", shardCol = "epoch_shard".
    *
    * The digit→int map goes through `locate` over the literal hex
    * alphabet (not conv/unhex) so a SQL oracle on another engine can
    * replay the shard assignment exactly; for numShards dividing 16 the
    * value mod numShards equals the last digit mod numShards (16 ≡ 0),
    * so pre-widening assignments are unchanged. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
                   numShards: Int): DataFrame = {
    require(numShards >= 1 && numShards <= (1 << 20),
      "numShards must be in [1, 16^5]: pmod over the 16^6 hash domain " +
        "keeps modulo bias under 17/16 only while numShards <= 16^5")
    val hexVal = (0 until 6).map(i =>
      s"(locate(substring(epoch_key, ${32 - i}, 1), '0123456789abcdef') - 1) * ${1 << (4 * i)}")
      .mkString(" + ")
    docs
      .withColumn("epoch_key",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .withColumn("epoch_shard",
        pmod(expr(hexVal), lit(numShards)).cast("long"))
  }

  /** NO-SPLIT greedy packing: docs in shard order are appended to the
    * current chunk unless they would overflow `tokenBudget`, in which
    * case a new chunk starts — the packing regime for training recipes
    * that never straddle a document across sequences (a doc longer than
    * the budget gets a chunk of its own). Returns one row per doc:
    * (id, shard, n_tok, chunk_id).
    *
    * The sequential fold (chunk fill carries across rows with a reset)
    * is NOT window-expressible — a running sum can't reset on overflow —
    * so this is the documented `mapPartitions` case: repartition by
    * shard, sort within partitions by (shard, id), then a per-partition
    * stateful scan. ONE shuffle, same as [[packChunks]]; a partition
    * holds whole shards (hash-partitioned), the scan resets its state at
    * each shard boundary, and rows stream through without materializing
    * the partition. Skew bound: the hottest shard bounds a task — the
    * same shard-width knob as [[packChunks]] (documented there).
    *
    * Id and shard columns pass through with their ORIGINAL types (the
    * scan is Row-encoded, sorted on the raw columns) — a long doc_id and
    * an [[epochShuffle]] md5 `epoch_key` both work; the sort order is
    * whatever the column's native ordering is. */
  def packGreedyNoSplit(docs: DataFrame, idCol: String, textCol: String,
                        shardCol: String, tokenBudget: Int): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val prepared = docs
      .select(col(idCol), col(shardCol),
        Text.tokenCount(col(textCol)).as("n_tok"))
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(idCol))
    val outSchema = StructType(prepared.schema.fields :+
      StructField("chunk_id", LongType, nullable = false))
    prepared.mapPartitions { it =>
      var shard: Any = null
      var started = false // distinguishes "no shard yet" from a null shard
      var chunk = 0L
      var fill = 0L
      var empty = true // nothing packed yet in the current shard
      it.map { r =>
        val sh = r.get(1)
        // deepEquals: structural comparison for every shard type — a
        // BinaryType shard deserializes to a fresh Array[Byte] per row,
        // and Any.!= would compare those by reference (every row would
        // look like a new shard and silently reset the fold)
        if (!started || !java.util.Objects.deepEquals(sh, shard)) {
          started = true; shard = sh; chunk = 0L; fill = 0L; empty = true
        }
        val n = r.getLong(2)
        if (!empty && fill + n > tokenBudget) { chunk += 1; fill = 0L }
        fill += n; empty = false
        Row(r.get(0), sh, n, chunk)
      }
    }(Encoders.row(outSchema))
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

  /** FILL-IN-THE-MIDDLE transform (the FIM objective of Bavarian et
    * al. 2022, standard in code-model pretraining): with probability
    * `rateNum/2^24`, a document's token stream splits at two
    * deterministic cut points and re-emits in PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — teaching the model to
    * infill; otherwise the text passes through unchanged. The
    * apply-coin and both cuts are content coins on the 16^6 grid
    * ([[Sampling.hexInt]]), so the transformed corpus is bit-identical
    * on any partitioning, cluster, or ANSI-SQL replay (q154). Pure
    * narrow ops — split, three slices, concat — zero shuffle at any
    * scale. Segment reconstruction (prefix+middle+suffix == original
    * tokens) is spec-asserted. */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   rateNum: Int): DataFrame = {
    require(rateNum >= 0 && rateNum <= (1 << 24),
      "rateNum must be on the 16^6 grid")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val applied = Sampling.hexInt(col(idCol), ":fimr") < rateNum
    val a = Sampling.hexInt(col(idCol), ":fima") % (n + 1)
    val b = Sampling.hexInt(col(idCol), ":fimb") % (n + 1)
    val c1 = least(a, b)
    val c2 = greatest(a, b)
    val pfx = array_join(slice(toks, lit(1), c1), " ")
    val mid = array_join(slice(toks, c1 + 1, c2 - c1), " ")
    val sfx = array_join(slice(toks, c2 + 1, n - c2), " ")
    // plain concat, not concat_ws: engines disagree on whether ws-join
    // skips EMPTY segments (DuckDB does, Spark does not), and an empty
    // prefix/middle/suffix is a legitimate cut outcome
    docs
      .withColumn("fim", when(applied, 1L).otherwise(0L))
      .withColumn("text_out", when(applied,
        concat(lit("<PRE> "), pfx, lit(" <SUF> "), sfx,
          lit(" <MID> "), mid))
        .otherwise(col(textCol)))
  }

  /** T5 SPAN CORRUPTION (Raffel et al., JMLR 2020 — the masked-span
    * denoising objective, [[fimTransform]]'s sibling): ~`pNum/2^24` of
    * positions start spans of `minLen..minLen+lenRange−1` tokens;
    * covered tokens are replaced in the INPUT by one sentinel per
    * maximal run (`<X0>`, `<X1>`, …) and emitted in the TARGET as
    * sentinel-prefixed runs. Span starts are independent position
    * coins (stateless — overlapping spans merge into a run), which is
    * what keeps the rule a bounded-lookback EXISTS on both engines:
    * the mask is a codegen'd kernel pass ([[graft.plans.VectorOps
    * .t5SpanMask]] — two md5 coins per token in JIT-compiled code, not
    * interpreted HOF lambdas, and no token-grain shuffle), and the
    * input/target assembly is cheap per-row array folds. Zero shuffle
    * at any scale. */
  def t5SpanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                    pNum: Int, minLen: Int = 2,
                    lenRange: Int = 3): DataFrame = {
    val base = docs
      .withColumn("__t", split(col(textCol), " "))
      .withColumn("__r", graft.plans.exprs.t5SpanMask(
        col(idCol).cast("long"), col("__t"), pNum, minLen, lenRange))
      .withColumn("__n", size(col("__t")))
    def tok(j: Column) = element_at(col("__t"), j)
    def run(j: Column) = element_at(col("__r"), j)
    def isStart(j: Column) =
      run(j) =!= -1 && (j === 1 || run(j - 1) =!= run(j))
    def sentinel(j: Column) =
      concat(lit("<X"), run(j).cast("string"), lit(">"))
    val inputPieces = transform(sequence(lit(1), col("__n")), j =>
      when(run(j) === -1, tok(j))
        .when(isStart(j), sentinel(j))
        .otherwise(lit(null)))
    val targetPieces = transform(sequence(lit(1), col("__n")), j =>
      when(run(j) === -1, lit(null))
        .when(isStart(j), concat(sentinel(j), lit(" "), tok(j)))
        .otherwise(tok(j)))
    base
      .withColumn("input_text",
        array_join(filter(inputPieces, p => p.isNotNull), " "))
      .withColumn("target_text",
        array_join(filter(targetPieces, p => p.isNotNull), " "))
      .withColumn("n_spans",
        (coalesce(array_max(col("__r")), lit(-1)) + 1).cast("long"))
      .withColumn("n_masked",
        size(filter(col("__r"), x => x =!= -1)).cast("long"))
      .drop("__t", "__r", "__n")
  }

  /** Stride-scheduled mixture interleave — the ORDER side of mixture
    * assembly ([[Sampling.temperatureMixture]] decides how MUCH of each
    * source; this decides WHEN): the r-th document of source s is
    * scheduled at virtual time r / w_s and the global stream is the
    * merge of all sources by ascending vt — stride scheduling
    * (Waldspurger & Weihl, OSDI '94), the interleaving shape of
    * multi-corpus training loaders. Consecutive emissions of s sit
    * ~1/w_s apart, so EVERY prefix of the stream realizes the target
    * mixture to within 1 + (|S|-1)·w_s/Σw documents per source (the
    * weighted-round-robin deviation bound, spec-asserted) — no coin
    * flips, no end-of-epoch composition bias.
    *
    * Cross-engine determinism: vt uses the UNNORMALIZED weight
    * n_s^alpha — normalizing would divide every vt by the same positive
    * constant and cannot change the merge order, so no cross-source
    * float sum enters the ordering; alpha = 0.5 routes through
    * correctly-rounded `sqrt` (exact parity, the
    * [[Sampling.temperatureMixture]] discipline), and r/w_s is one
    * correctly-rounded division of bit-identical operands.
    *
    * Scale: a loader consults the schedule HEAD (`head` positions), and
    * the head is generated from the |sources|-row count rollup alone —
    * sequence-exploded to ≤ |sources|·head rows (the r-th emission of s
    * can sit no earlier than global position r, so ranks ≤ head per
    * source suffice) — so the corpus is touched ONCE (the count
    * aggregate) and the merge window ranks a bounded, data-independent
    * row set, never the data. Feeding the schedule forward is a
    * broadcast join on (source, rank-within-source).
    *
    * Returns one row per scheduled position: `pos` (1..head), the
    * source, `r` (rank within source), `n_src`, `w_raw`. */
  /** LENGTH-BUCKETED BATCHING — the padding-waste minimizer of a
    * fixed-shape training loop: a batch's compute cost is
    * `batchSize × max(len)` (every sequence pads to the batch max), so
    * batching docs of SIMILAR length together reclaims the padding a
    * length-oblivious batcher burns (the public bucketing-by-sequence-
    * length recipe of the major training frameworks). Docs bucket by
    * `n_tok / bucketWidth`, order within a bucket by the md5 content
    * coin (deterministic, partitioning-invariant, SQL-replayable — the
    * q126 discipline; a coin order also keeps batches i.i.d. WITHIN a
    * bucket instead of correlated by ingest order), and chunk into
    * `batchSize`-doc batches by rank division.
    *
    * One row per doc: (id, n_tok, bucket, batch_id, rn). Per-batch
    * padding accounting is a rollup: waste = n·max(len) − Σlen
    * (q167 puts it under the hash oracle; the spec asserts bucketed
    * waste ≤ a length-oblivious baseline's on the fixture).
    *
    * Scale shape: ONE shuffle (the per-bucket rank window); per-task
    * cost is bounded by the hottest bucket — `bucketWidth` is the
    * width/parallelism knob, and a length-skewed corpus (most docs in
    * one bucket) calls for sub-bucketing by a second hash digit, the
    * [[Sessionize]] shard discipline. The last partial batch of each
    * bucket is emitted (callers drop or merge it per recipe). */
  def lengthBucketedBatches(docs: DataFrame, idCol: String, textCol: String,
                            bucketWidth: Int, batchSize: Int,
                            salt: String = ":lb"): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      "bucketWidth and batchSize must be >= 1")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(Sampling.hexInt(col(idCol), salt), col(idCol))
    docs
      .select(col(idCol), Text.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("bucket", (col("n_tok") / lit(bucketWidth)).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", ((col("rn") - 1) / lit(batchSize)).cast("long"))
  }

  /** LENGTH-BUCKET BOUNDARY PLANNER — the tuning sibling of
    * [[lengthBucketedBatches]] (the q180/q182 pattern: measure the
    * corpus, choose the knob, let the runtime op consume it): split
    * the token-length distribution into `nBuckets` equal-count ranges
    * and account, EXACTLY, the padding each bucket pays when its
    * batches pad to the bucket max — the quantity pad-to-longest
    * training wastes and bucketing exists to reclaim.
    *
    * Scale shape: the corpus collapses to a LENGTH HISTOGRAM in one
    * map-side-combined aggregate (distinct token counts ≪ corpus —
    * thousands of rows at any corpus size); every window below runs at
    * that bounded histogram grain (the doremiWeights single-task
    * discipline, bounded by design); the 1-row total rides a broadcast
    * gate. The corpus is never sorted.
    *
    * Boundaries are equal-COUNT (quantile) cuts computed by exact
    * integer arithmetic — bucket = (cum−1)·B div N + 1 — so the plan
    * is deterministic and engine-replayable; docs sharing a length
    * never split across buckets. Equal-count is the standard heuristic,
    * not the DP optimum — the spec quantifies the gap against the true
    * O(D²·B) segmentation DP at histogram grain. Output per bucket:
    * (bucket, len_lo, len_hi, n_docs, padded_tokens = len_hi·n_docs,
    * waste = padded − real, waste_frac). */
  def bucketBoundaryPlan(docs: DataFrame, textCol: String,
                         nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val hist = docs.select(Text.tokenCount(col(textCol)).as("n_tok"))
      .groupBy("n_tok").agg(count(lit(1)).as("cnt"))
    val total = hist.agg(sum("cnt").as("n"))
    val w = Window.orderBy("n_tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(total))
      .withColumn("bucket",
        expr(s"((cum - 1) * $nBuckets) div n") + 1)
      .groupBy("bucket")
      .agg(min("n_tok").as("len_lo"), max("n_tok").as("len_hi"),
        sum("cnt").as("n_docs"),
        sum(col("n_tok") * col("cnt")).as("tok_sum"))
      .select(col("bucket"), col("len_lo").cast("long").as("len_lo"),
        col("len_hi").cast("long").as("len_hi"), col("n_docs"),
        (col("len_hi") * col("n_docs")).as("padded_tokens"),
        (col("len_hi") * col("n_docs") - col("tok_sum")).as("waste"),
        round((col("len_hi") * col("n_docs") - col("tok_sum"))
          .cast("double") / (col("len_hi") * col("n_docs")), 6)
          .as("waste_frac"))
  }

  /** OVER-LENGTH POLICY AUDIT — the "what does a context limit cost"
    * table every pretraining recipe needs before fixing max_seq_len:
    * for each candidate limit L and each of the three standard
    * policies, exactly how many tokens (and docs) are forfeited.
    *   - `truncate`: docs over L keep their first L tokens; loss =
    *     Σ (n−L)⁺ — cheap, biases against document tails.
    *   - `drop`: docs over L are removed whole; loss = Σ n·[n>L] —
    *     unbiased per-doc, ruinous when long docs carry the mass.
    *   - `split`: docs chunk into ⌈n/L⌉ pieces and a tail shorter
    *     than L/4 is dropped (the standard min-chunk rule); loss =
    *     Σ (n mod L)·[0 < n mod L < L/4].
    *
    * Scale shape: the corpus collapses to the [[bucketBoundaryPlan]]
    * length histogram in one map-side aggregate; the |L|×|hist| audit
    * is pure integer arithmetic at that bounded grain. Output per
    * (max_len, policy): (n_docs_affected, tokens_total, tokens_lost,
    * loss_frac). */
  def truncationPolicyAudit(docs: DataFrame, textCol: String,
                            maxLens: Seq[Int]): DataFrame = {
    require(maxLens.nonEmpty && maxLens.forall(_ >= 4),
      "maxLens must be non-empty, each >= 4 (the L/4 tail rule)")
    val hist = docs.select(Text.tokenCount(col(textCol)).as("n_tok"))
      .groupBy("n_tok").agg(count(lit(1)).as("cnt"))
    val spine = hist.sparkSession
      .createDataFrame(maxLens.map(Tuple1(_))).toDF("max_len")
      .select(col("max_len").cast("long"))
    val x = hist.crossJoin(broadcast(spine))
      .withColumn("over", (col("n_tok") > col("max_len")).cast("long"))
      .withColumn("tail", pmod(col("n_tok"), col("max_len")))
    def policy(name: String, affected: Column, lost: Column) =
      x.groupBy("max_len")
        .agg(sum(col("cnt") * affected).as("n_docs_affected"),
          sum(col("cnt") * col("n_tok")).as("tokens_total"),
          sum(col("cnt") * lost).as("tokens_lost"))
        .select(col("max_len"), lit(name).as("policy"),
          col("n_docs_affected"), col("tokens_total"), col("tokens_lost"),
          round(col("tokens_lost").cast("double") / col("tokens_total"), 6)
            .as("loss_frac"))
    val truncate = policy("truncate", col("over"),
      greatest(col("n_tok") - col("max_len"), lit(0L)))
    val drop = policy("drop", col("over"), col("n_tok") * col("over"))
    // the min-chunk rule applies only to docs that actually split
    // (n > L): a whole short doc is a kept sequence, not a tail
    val shortTail = (col("n_tok") > col("max_len") && col("tail") > 0 &&
      col("tail") * 4 < col("max_len")).cast("long")
    val split = policy("split", shortTail, col("tail") * shortTail)
    truncate.unionByName(drop).unionByName(split)
  }

  def strideInterleave(docs: DataFrame, groupCol: String, alpha: Double,
                       head: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(head > 0, "head must be positive")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_src"))
    val w = if (alpha == 0.5) sqrt(col("n_src").cast("double"))
            else pow(col("n_src").cast("double"), lit(alpha))
    counts
      .withColumn("w_raw", w)
      .withColumn("r", explode(
        sequence(lit(1L), least(lit(head.toLong), col("n_src")))))
      .withColumn("vt", col("r").cast("double") / col("w_raw"))
      // bounded single-partition merge: ≤ |sources|·head schedule rows
      .withColumn("pos", row_number().over(
        Window.orderBy(col("vt").asc, col(groupCol).asc, col("r").asc))
        .cast("long"))
      .filter(col("pos") <= head)
      .select(col("pos"), col(groupCol), col("r"), col("n_src"), col("w_raw"))
  }
}
