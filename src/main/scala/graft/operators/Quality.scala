package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-quality CURATION gates — the accept/reject decision layer
  * of a pretraining pipeline, downstream of the raw signals
  * (`functions.Text`) and upstream of selection (`Selection`): the
  * Gopher-style rule gate (Rae et al. 2021 §A1.1: hard per-rule
  * bounds, a document fails if ANY rule fires) and CCNet-style
  * perplexity bucketing (Wenzek et al. 2020: language-model scores
  * split the corpus into head/middle/tail terciles). Both published,
  * both the standard knobs behind released pretraining corpora.
  * (Ref analogue: the reference's vote/quality threshold gates,
  * `docs/top_movies.sql:4-9`, applied to corpus curation.)
  */
object Quality {

  /** Gopher-style rule gate: per-document hard bounds, each emitted as
    * its own 0/1 flag plus the conjunction (`passes`) — the per-rule
    * flags are what corpus cards report (what fraction failed which
    * rule) and what lets downstream stages relax one rule without
    * re-running the gate. Rules (defaults = the published Gopher
    * bounds where one exists, adapted to the word grain):
    *   - `r_words`:    word count in [minWords, maxWords]
    *   - `r_word_len`: mean word length in [minMeanLen, maxMeanLen]
    *   - `r_stop`:     at least `minStopwords` stopword occurrences
    *   - `r_rep`:      top-2-gram token coverage <= maxTop2Frac
    *     (the [[graft.plans.exprs.topNgramFrac]] repetition kernel)
    *   - `r_dup`:      duplicate-token fraction <= maxDupFrac
    *
    * Every metric is emitted ROUNDED (6 places) and every flag is
    * derived from the rounded value, so a SQL oracle replaying the
    * same integer-count arithmetic compares bit-equal — no threshold
    * sits on an ulp. One narrow codegen'd projection per row: no
    * shuffle, no UDF, embarrassingly parallel at any corpus size
    * (the repetition kernel is the one non-built-in — a native
    * one-pass Catalyst expression). */
  def gopherGate(docs: DataFrame, idCol: String, textCol: String,
                 stopwords: Seq[String],
                 minWords: Int = 30, maxWords: Int = 80,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 minStopwords: Int = 2,
                 maxTop2Frac: Double = 0.1,
                 maxDupFrac: Double = 0.55): DataFrame = {
    import graft.functions.{Clean, Text}
    val toks = Text.tokens(lower(col(textCol)))
    val nTok = size(toks).cast("long")
    val sw = array(stopwords.map(lit): _*)
    val meanLen = round(
      length(translate(col(textCol), " ", "")).cast("double") / nTok, 6)
    val top2 = round(Text.topNgramFrac(lower(col(textCol)), 2), 6)
    val dupFrac = round(
      (nTok - size(array_distinct(toks))).cast("double") / nTok, 6)
    val nStop = size(filter(toks, t => array_contains(sw, t))).cast("long")
    docs.select(col(idCol).as("id"), nTok.as("n_words"),
        meanLen.as("mean_word_len"), top2.as("top2_frac"),
        dupFrac.as("dup_frac"), nStop.as("n_stop"))
      .withColumn("r_words",
        Clean.flag(col("n_words").between(minWords, maxWords)))
      .withColumn("r_word_len",
        Clean.flag(col("mean_word_len").between(minMeanLen, maxMeanLen)))
      .withColumn("r_stop", Clean.flag(col("n_stop") >= minStopwords))
      .withColumn("r_rep", Clean.flag(col("top2_frac") <= maxTop2Frac))
      .withColumn("r_dup", Clean.flag(col("dup_frac") <= maxDupFrac))
      .withColumn("passes", Clean.flag(
        col("r_words") + col("r_word_len") + col("r_stop") +
          col("r_rep") + col("r_dup") === 5L))
  }

  /** CCNet-style perplexity bucketing: score every document under a
    * corpus-trained unigram language model (perplexity = exp of the
    * mean token surprisal), then split into head/middle/tail at the
    * corpus terciles — LOW perplexity is "head", the slice CCNet
    * treats as highest quality. A unigram LM stands in for CCNet's
    * KenLM 5-gram (no external model artifacts in this environment);
    * the SHAPE — train on the corpus, score per doc, bucket at
    * quantiles — is the published pipeline, and a higher-order LM
    * drops into the same plan (the vocab table keys on the n-gram
    * instead of the token).
    *
    * Scale plan: ONE corpus-sized shuffle (the vocab count, token-
    * keyed, map-side partial agg) and one id-keyed doc aggregate; the
    * vocab joins back by BROADCAST (a natural-language vocabulary is
    * executor-memory-bounded; switch the hint to a sort-merge join on
    * the token if it ever is not), the token total rides the vocab
    * table as a 1-row aggregate, and the tercile boundaries come back
    * through the broadcast-1-row gate — the scored corpus is never
    * reshuffled to be bucketed. THREE tables persist, each with two
    * consumers: the exploded tokens (the vocab aggregate and the
    * scoring join — unpersisted, the corpus would tokenize twice; the
    * [[Retrieval]] `scores` convention), the vocab (|V| rows — the
    * 1-row total and the broadcast join), and the scored set (|docs|
    * rows — the boundary aggregate and the final projection). The
    * caller's between-query `clearCache()` reclaims them (the
    * q76/q86 contract). Perplexities
    * are ROUNDED (6 places) before the boundary quantile AND the
    * comparison, so both engines interpolate identical inputs (R-7 on
    * both, exact IEEE on equal inputs — the q87 argument) and no
    * bucket boundary sits on a float-sum ulp. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(graft.functions.Text.tokens(lower(col(textCol)))).as("tok"))
      .persist()
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt")).persist()
    val total = vocab.agg(sum("cnt").as("total"))
    val scored = toks.join(broadcast(vocab), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(round(exp(-avg(log(col("cnt").cast("double") / col("total")))), 6)
        .as("ppl"))
      .persist()
    val bounds = scored.agg(
      percentile(col("ppl"), lit(1.0 / 3)).as("t33"),
      percentile(col("ppl"), lit(2.0 / 3)).as("t66"))
    scored.crossJoin(broadcast(bounds))
      .select(col("id"), col("ppl"),
        when(col("ppl") <= col("t33"), "head")
          .when(col("ppl") <= col("t66"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
