package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Independent reference: the same md5-hex6 gram coin and
    * rightmost-window-min selection, written directly against
    * java.security — validates the kernel, not itself. */
  private def refWinnow(text: String, k: Int, w: Int): Seq[(Int, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cps = text.codePointCount(0, text.length)
    val n = cps - k + 1
    if (n < w) return Seq.empty
    def cpSubstr(from: Int, len: Int): String = {
      val s = text.offsetByCodePoints(0, from)
      val e = text.offsetByCodePoints(0, math.min(from + len, cps))
      text.substring(s, e)
    }
    val hashes = (0 until n).map { i =>
      md.reset()
      val d = md.digest((cpSubstr(i, k) + ":win").getBytes("UTF-8"))
      ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var last = -1
    for (p <- 0 to n - w) {
      var best = p
      for (j <- p + 1 until p + w) if (hashes(j) <= hashes(best)) best = j
      if (best != last) { out += ((best + 1, hashes(best))); last = best }
    }
    out.toSeq
  }

  test("winnow kernel matches the independent reference, including " +
       "multibyte text; short text yields no fingerprints") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",
      "多字节中文文本也必须按码点切分才能与替换引擎一致工作",
      "short", // < w+k-1
      "exactly11ch")
    val got = texts.toDF("text")
      .select(col("text"), graft.plans.exprs.winnowFingerprints(
        col("text"), ":win", 8, 4).as("pk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Long](1).map(x => ((x >> 24).toInt, (x & 0xFFFFFF).toInt)))
      .toMap
    for (t <- texts) {
      assert(got(t) == refWinnow(t, 8, 4), s"mismatch on '$t'")
    }
    assert(got("short").isEmpty)
    assert(got("exactly11ch").size == 1) // n = 4 = w: exactly one window
    // density: ~2/(w+1) of positions on natural text
    val fox = got(texts.head)
    assert(fox.nonEmpty && fox.size <= texts.head.length * 2 / 4)
    // positions ascending, hashes < 2^24
    assert(fox.map(_._1) == fox.map(_._1).sorted)
    assert(fox.forall(_._2 < (1 << 24)))
  }

  test("winnowing guarantee: a shared run of w+k-1 chars always lands " +
       "a shared fingerprint hash") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def randText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val common = randText(11) // w+k-1 with k=8, w=4
    val pairs = (0 until 20).map { i =>
      val a = randText(40) + common + randText(40)
      val b = randText(35) + common + randText(45)
      (i.toLong, a, b)
    }
    val df = pairs.flatMap { case (i, a, b) =>
      Seq((i * 2, a), (i * 2 + 1, b)) }.toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", 8, 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("h")).toSet).toMap
    for ((i, _, _) <- pairs) {
      assert(fp(i * 2).intersect(fp(i * 2 + 1)).nonEmpty,
        s"pair $i: guarantee violated")
    }
  }

  test("winnowDupPairs: planted copy detected, ubiquitous fingerprints " +
       "cut by maxDocs, id-grain shuffle discipline") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def randText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val base = (0L until 12L).map(i => (i, randText(120)))
    val copy = (99L, base.head._2.substring(10, 90)) // 80-char run of doc 0
    val boiler = "common boilerplate header everywhere "
    val noisy = base.map { case (i, t) => (i, boiler + t) } :+
      (99L, boiler + copy._2)
    val got = Dedup.winnowDupPairs(noisy.toDF("doc_id", "text"),
        "doc_id", "text", 8, 4, maxDocs = 8L, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the only ≥3-shared pair is the planted copy: boilerplate hashes
    // appear in all 13 docs (> maxDocs) and are cut
    assert(got == Set((0L, 99L)), s"got $got")
    // without the cut the boilerplate links everything
    val loose = Dedup.winnowDupPairs(noisy.toDF("doc_id", "text"),
        "doc_id", "text", 8, 4, maxDocs = 100L, minShared = 3L)
      .collect()
    assert(loose.length > 1)
  }
}
