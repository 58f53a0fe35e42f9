package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership over the deterministic md5-hex6 coin
  * ([[Sampling.hexInt]] — the package's single replay-critical digit
  * recipe), for eval-set decontamination at corpus scale.
  *
  * Scale design: the eval side — small by definition (benchmark suites)
  * — compresses to a FIXED-SIZE bit array (`mBits/64` longs, ≤ 2 MB at
  * the 2^24 ceiling) that ships to every task as a plan literal, so the
  * 100 TB training corpus is decontaminated by a narrow, codegen'd
  * bit-test projection: no shuffle of corpus n-grams, no join against
  * the eval set, no state that grows with the corpus. Compare q59's
  * inverted-index containment join, which shuffles candidate n-grams —
  * exact, but exchange-bound; the bloom path trades a deterministic,
  * oracle-replayable false-positive rate for zero corpus exchanges
  * (Bloom 1970; the standard pretraining-pipeline screen before an
  * exact verify pass).
  *
  * Determinism contract: position `s` of element `e` is
  * `hexInt(e, ":bf" + s) % mBits` — six md5 hex digits, exactly
  * replayable in ANSI SQL (the q116 Count-Min discipline), so an oracle
  * rebuilds the identical bit set and replays every membership verdict,
  * false positives included. `mBits` must divide 16^6 (the coin's
  * range) for uniformity, capping it at 2^24.
  */
object Bloom {

  private val WordMasks: Array[Long] = Array.tabulate(64)(1L << _)

  /** The `kHashes` bit positions of `elem`, as columns. */
  private[operators] def positions(elem: Column, mBits: Int,
                                   kHashes: Int): Seq[Column] =
    (0 until kHashes).map(s => pmod(Sampling.hexInt(elem, s":bf$s"), lit(mBits)))

  /** Build the bit array from the eval-side elements. The bitmap is
    * assembled DISTRIBUTED — positions fold into ≤ mBits/64 per-word
    * `bit_or` groups — so the driver collects at most mBits/64 rows (the
    * model itself), never a row per element: eval sets of any
    * cardinality build the same bounded state. */
  def buildBitmap(elems: DataFrame, elemCol: String, mBits: Int,
                  kHashes: Int): Array[Long] = {
    require(mBits > 0 && (1 << 24) % mBits == 0,
      s"mBits $mBits must divide 16^6 for a uniform md5-hex6 coin")
    // < 64 bits would make the bitmap mBits/64 == 0 words long and fail
    // far from here on the first set bit — reject at the call site
    require(mBits % 64 == 0, s"mBits $mBits must be a multiple of 64")
    require(kHashes >= 1, "kHashes must be >= 1")
    // positions are computed in a PROJECT, then exploded: expressions
    // under a Generate miss whole-stage codegen's subexpression
    // elimination (the Frequency.cmsCells lesson — ~17× slower there)
    // a NULL element would propagate a null word key and NPE at the
    // collect — nulls carry no n-gram content, so they are excluded
    // from the set (mightContain(null) is null-false on probe, matching)
    val pos = elems.filter(col(elemCol).isNotNull)
      .select(positions(col(elemCol), mBits, kHashes).zipWithIndex
        .map { case (p, i) => p.as(s"__p$i") }: _*)
      .select(explode(array((0 until kHashes).map(i => col(s"__p$i")): _*)).as("pos"))
    val words = pos
      .select((col("pos") / lit(64)).cast("int").as("w"),
        element_at(typedlit(WordMasks.toSeq), pmod(col("pos"), lit(64)) + 1).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("bits"))
      .collect()
    val bitmap = new Array[Long](mBits / 64)
    words.foreach { r =>
      val w = r.getInt(0)
      require(w >= 0 && w < bitmap.length, s"bit word $w out of range")
      bitmap(w) = r.getLong(1)
    }
    bitmap
  }

  /** Narrow membership test: true iff ALL `kHashes` bit positions of
    * `elem` are set in `bitmap`. No false negatives; false positives at
    * the standard (1 - e^{-kn/m})^k rate, deterministically — the same
    * element gets the same verdict on every run and engine. */
  def mightContain(elem: Column, bitmap: Array[Long], mBits: Int,
                   kHashes: Int): Column = {
    require(bitmap.length == mBits / 64, "bitmap length != mBits/64")
    val words = typedlit(bitmap.toSeq)
    positions(elem, mBits, kHashes).map { pos =>
      (element_at(words, (pos / lit(64)).cast("int") + 1)
        .bitwiseAND(element_at(typedlit(WordMasks.toSeq), pmod(pos, lit(64)) + 1))) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Doc-level decontamination screen: flag every document any of whose
    * `shingleLen`-gram shingles might be in the eval set's bloom filter.
    * Appends nothing to unflagged rows' cost: the corpus is scanned
    * once, the per-shingle test is a codegen'd bit probe, and the only
    * exchange is the per-doc `max` over flagged bits (shuffling one
    * boolean per doc — not the shingles). Returns (idCol, bloom_hit). */
  def screen(docs: DataFrame, idCol: String, textCol: String,
             bitmap: Array[Long], mBits: Int, kHashes: Int,
             shingleLen: Int): DataFrame =
    docs.select(col(idCol), explode(graft.plans.exprs.wordShingles(
        lower(col(textCol)), shingleLen)).as("__sh"))
      .withColumn("__hit",
        when(mightContain(col("__sh"), bitmap, mBits, kHashes), 1L).otherwise(0L))
      .groupBy(idCol).agg(max(col("__hit")).as("bloom_hit"))
}
