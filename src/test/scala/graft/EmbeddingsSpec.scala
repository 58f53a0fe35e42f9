package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Embeddings

class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("gram: hand-checked on a 2×2, one bounded exchange in the plan") {
    import spark.implicits._
    val df = Seq(Array(1f, 2f), Array(3f, 4f)).toDF("embedding")
      .repartition(3)
    val got = Embeddings.gram(df, "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // Σ v·vᵀ over [1,2],[3,4]: (0,0)=1+9, (0,1)=2+12, (1,1)=4+16
    assert(got == Map((0L, 0L) -> 10.0, (0L, 1L) -> 14.0, (1L, 1L) -> 20.0))
    val txt = Embeddings.gram(df, "embedding").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val shuffles = "(?<!Broadcast)Exchange \\((\\d+)\\)".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    // one exchange — the dim²-bounded cell aggregate (plus the test's
    // own repartition); the row fan-out itself must never shuffle
    assert(shuffles.size <= 2, s"exchange budget changed:\n$txt")
    assert(txt.contains("HashAggregate"), txt.take(800))
  }

  test("jacobiEigen: known symmetric matrices") {
    val (e1, v1) = Embeddings.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(e1.sorted.zip(Array(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // eigenvector of λ=3 is (1,1)/√2 up to sign
    val i3 = e1.indexWhere(x => math.abs(x - 3.0) < 1e-12)
    val ax = Array(v1(0)(i3), v1(1)(i3))
    assert(math.abs(math.abs(ax(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(ax(0) - ax(1)) < 1e-12 || math.abs(ax(0) + ax(1)) < 1e-12)
    // diagonal matrix: eigenvalues are the diagonal, vectors axis-aligned
    val (e2, _) = Embeddings.jacobiEigen(
      Array(Array(5.0, 0.0, 0.0), Array(0.0, -1.0, 0.0), Array(0.0, 0.0, 2.0)))
    assert(e2.sorted.zip(Array(-1.0, 2.0, 5.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("pcaFit/pcaProject: recovers the principal axis of collinear data") {
    import spark.implicits._
    // points along (1,1): covariance [[v,v],[v,v]] → λ1=2v (axis
    // (1,1)/√2, sign fixed positive), λ2=0
    val ts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    val df = ts.map(t => Array(t.toFloat, t.toFloat)).toDF("embedding")
    val m = Embeddings.pcaFit(df, "embedding", p = 2)
    val v = ts.map(t => t * t).sum / ts.length // population variance of t
    assert(math.abs(m.eigenvalues(0) - 2 * v) < 1e-9, m.eigenvalues.toSeq.toString)
    assert(math.abs(m.eigenvalues(1)) < 1e-9)
    assert(math.abs(m.components(0)(0) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(m.components(0)(1) - math.sqrt(0.5)) < 1e-9)
    // projections: pc1 = t·√2 (mean is 0), pc2 ≈ 0
    val pcs = Embeddings.pcaProject(df, "embedding", m)
      .select(col("pc")).collect().map(_.getSeq[Double](0))
    pcs.zip(ts).foreach { case (pc, t) =>
      assert(math.abs(pc(0) - t * math.sqrt(2)) < 1e-6, s"pc1 of $t: ${pc(0)}")
      assert(math.abs(pc(1)) < 1e-6)
    }
    // projected variance equals the eigenvalue (the eigenpair property)
    val varPc = Embeddings.pcaProject(df, "embedding", m)
      .agg(var_pop(element_at(col("pc"), 1))).head().getDouble(0)
    assert(math.abs(varPc - m.eigenvalues(0)) < 1e-9)
  }

  test("pcaFit: mean-centering — a constant offset changes nothing") {
    import spark.implicits._
    val base = Seq(Array(1f, 0f), Array(-1f, 0f), Array(0f, 2f), Array(0f, -2f))
    val shifted = base.map(v => Array(v(0) + 10f, v(1) - 7f))
    val m1 = Embeddings.pcaFit(base.toDF("embedding"), "embedding", p = 2)
    val m2 = Embeddings.pcaFit(shifted.toDF("embedding"), "embedding", p = 2)
    m1.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
    m1.components.zip(m2.components).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }

  test("pcaWhiten: identity covariance on anisotropic data, dead-direction " +
       "floor, zero-exchange projection") {
    import spark.implicits._
    // anisotropic 2-d data (variances 1 and 4 along rotated axes)
    val df = Seq(Array(1f, 1f), Array(-1f, -1f), Array(2f, -2f),
      Array(-2f, 2f), Array(3f, 3f), Array(-3f, -3f)).toDF("embedding")
      .repartition(3)
    val m = Embeddings.pcaFit(df, "embedding", p = 2)
    val w = Embeddings.pcaWhiten(df, "embedding", m)
    val stats = w.agg(
      avg(element_at(col("white"), 1)), var_pop(element_at(col("white"), 1)),
      avg(element_at(col("white"), 2)), var_pop(element_at(col("white"), 2)),
      covar_pop(element_at(col("white"), 1), element_at(col("white"), 2)))
      .head()
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-9, s"var1 ${stats.getDouble(1)}")
    assert(math.abs(stats.getDouble(2)) < 1e-9)
    assert(math.abs(stats.getDouble(3) - 1.0) < 1e-9, s"var2 ${stats.getDouble(3)}")
    assert(math.abs(stats.getDouble(4)) < 1e-9)
    // a numerically dead direction (λ ≈ 0) must not amplify noise: the
    // floor caps its scale at 1/√floor instead of 1/√0
    val degenerate = Seq(Array(1f, 0f), Array(2f, 0f), Array(3f, 0f))
      .toDF("embedding")
    val md = Embeddings.pcaFit(degenerate, "embedding", p = 2)
    val wd = Embeddings.pcaWhiten(degenerate, "embedding", md, floor = 1e-6)
      .select(col("white")).collect().map(_.getSeq[Double](0))
    assert(wd.forall(v => v.forall(x => math.abs(x) < 1e6)),
      s"dead direction exploded: ${wd.map(_.mkString(",")).mkString(";")}")
    // scale contract: whitening is one narrow projection — no Exchange
    // (beyond the input's own repartition, so use the raw df)
    val plan = Embeddings.pcaWhiten(Seq(Array(1f, 1f)).toDF("embedding"),
        "embedding", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("meanPairwiseCosine: sum-vector identity equals brute force; " +
       "zero vectors excluded; n<2 yields NULL; plan is join-free") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 24).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else "b",
        Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val df = vecs.toDF("id", "grp", "embedding")
    val got = Embeddings.meanPairwiseCosine(df, "embedding", Seq("grp"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // brute force per group
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum))
    }
    for (g <- Seq("a", "b")) {
      val vs = vecs.filter(_._2 == g).map(_._3)
      val pairs = for (i <- vs.indices; j <- i + 1 until vs.length)
        yield cos(vs(i), vs(j))
      val expected = pairs.sum / pairs.length
      assert(got(g)._1 == vs.length)
      assert(math.abs(got(g)._2 - expected) < 1e-9,
        s"group $g: identity ${got(g)._2} vs brute $expected")
    }
    // a zero vector carries no direction: excluded from n and the mean
    val withZero = (vecs :+ ((99L, "a", Array.fill(8)(0.0f)))).toDF(
      "id", "grp", "embedding")
    val gz = Embeddings.meanPairwiseCosine(withZero, "embedding", Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gz("a") == vecs.count(_._2 == "a"))
    // n = 1 → no pairs → NULL mean
    val one = Seq((1L, "solo", Array(1.0f, 2.0f))).toDF("id", "grp", "embedding")
    val r1 = Embeddings.meanPairwiseCosine(one, "embedding", Seq("grp")).head
    assert(r1.getLong(1) == 1L && r1.isNullAt(2))
    // the 100 TB contract: no pair is ever formed — the plan has no
    // join of any kind, and the first exchange carries (grp, dim) sums
    val plan = Embeddings.meanPairwiseCosine(df, "embedding", Seq("grp"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }

  test("centroidShift: identical snapshots give cos 1, orthogonal give 0, " +
       "missing side gives NULL; join-free plan") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val df = Seq(
      // group "same": both snapshots centered on e1 → cos_shift 1
      (0L, "same", "a", v(1, 0, 0)), (1L, "same", "a", v(1, 0.2, 0)),
      (2L, "same", "b", v(1, 0.1, 0)), (3L, "same", "b", v(1, 0.1, 0)),
      // group "orth": snapshot a on e1, b on e2 → cos_shift 0
      (4L, "orth", "a", v(2, 0, 0)), (5L, "orth", "b", v(0, 3, 0)),
      // group "half": only snapshot a present → NULL shift, n_b = 0
      (6L, "half", "a", v(1, 1, 1)),
      // a foreign snapshot label is ignored entirely
      (7L, "same", "zzz", v(9, 9, 9))
    ).toDF("vec_id", "grp", "snap", "embedding")
    val got = Embeddings.centroidShift(df, "embedding", Seq("grp"),
      "snap", "a", "b").collect()
      .map(r => r.getString(0) -> r).toMap
    val same = got("same")
    assert(same.getLong(1) == 2 && same.getLong(2) == 2)
    // centroid a = (1, 0.1, 0), centroid b = (1, 0.1, 0): cos exactly 1
    assert(math.abs(same.getDouble(3) - 1.0) < 1e-12)
    val orth = got("orth")
    assert(orth.getLong(1) == 1 && orth.getLong(2) == 1)
    assert(math.abs(orth.getDouble(3)) < 1e-12)
    val half = got("half")
    assert(half.getLong(1) == 1 && half.getLong(2) == 0 && half.isNullAt(3))
    val plan = Embeddings.centroidShift(df, "embedding", Seq("grp"),
        "snap", "a", "b")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }
}
