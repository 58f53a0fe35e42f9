package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("trainLogistic: separable data — weights move the right way and " +
       "training reduces log-loss") {
    import spark.implicits._
    // y = 1 iff x > 0.5, bias + one feature
    val df = (0 until 200).map { i =>
      val x = i / 200.0
      (x, if (x > 0.5) 1.0 else 0.0)
    }.toDF("x", "y")
    val feats = Seq(lit(1.0), col("x"))
    def loss(w: Array[Double]): Double = {
      val p = Classifier.predictProb(feats, w)
      df.agg(avg(-(col("y") * log(p) +
        (lit(1.0) - col("y")) * log(lit(1.0) - p)))).head.getDouble(0)
    }
    val w0 = Array(0.0, 0.0)
    val w = Classifier.trainLogistic(df, feats, col("y"), iters = 20, lr = 2.0)
    assert(w(1) > 0, s"feature weight should be positive, got ${w.mkString(",")}")
    assert(loss(w) < loss(w0), s"training must reduce loss")
    // gradient-descent first step from zeros is analytic: sig = 0.5, so
    // w1 = -lr * mean((0.5 - y) * x_i)
    val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length.toDouble
    val exp0 = -2.0 * (rows.map { case (_, y) => 0.5 - y }.sum / n)
    val exp1 = -2.0 * (rows.map { case (x, y) => (0.5 - y) * x }.sum / n)
    val w1 = Classifier.trainLogistic(df, feats, col("y"), iters = 1, lr = 2.0)
    assert(math.abs(w1(0) - exp0) < 1e-9 && math.abs(w1(1) - exp1) < 1e-9,
      s"first step ${w1.mkString(",")} vs analytic $exp0, $exp1")
  }

  test("trainLogistic: partition-layout independent to float noise; " +
       "gradient step is one bounded aggregate") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 300).map { _ =>
      val a = rnd.nextDouble(); val b = rnd.nextDouble()
      (a, b, if (a + 0.3 * b > 0.6) 1.0 else 0.0)
    }.toDF("a", "b", "y")
    val feats = Seq(lit(1.0), col("a"), col("b"))
    val w1 = Classifier.trainLogistic(df, feats, col("y"), 3, 0.5)
    val w2 = Classifier.trainLogistic(df.repartition(7), feats, col("y"), 3, 0.5)
    w1.zip(w2).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"partitioning changed weights: $x vs $y")
    }
    // the per-step aggregate exchanges dim+1 partial sums, not rows:
    // partial aggregate below the single-partition exchange
    val err = Classifier.predictProb(feats, w1) - col("y")
    val aggs = feats.zipWithIndex.map { case (x, i) =>
      sum(err * x).as(s"g$i") } :+ count(lit(1)).as("n")
    val plan = df.repartition(7).agg(aggs.head, aggs.tail: _*)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val partIdx = lines.indexWhere(_.contains("partial_sum"))
    val exIdx = lines.indexWhere(_.contains("Exchange"))
    assert(exIdx >= 0 && partIdx > exIdx,
      s"expected partial sums below the exchange:\n$plan")
  }

  test("trainLogisticSgd: partition-independent batches, convergence, " +
       "and per-step batch rotation") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (0 until 400).map { i =>
      val x = rnd.nextDouble()
      (i.toLong, x, if (x > 0.5) 1.0 else 0.0)
    }.toDF("id", "x", "y")
    val feats = Seq(lit(1.0), col("x"))
    val w = Classifier.trainLogisticSgd(df, feats, col("y"), col("id"),
      iters = 10, lr = 2.0, thresholdNum = 1 << 23)
    // batch membership is keyed on content, so a different layout gives
    // the same batches — weights agree to float-sum noise
    val w2 = Classifier.trainLogisticSgd(df.repartition(9), feats,
      col("y"), col("id"), iters = 10, lr = 2.0, thresholdNum = 1 << 23)
    w.zip(w2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // SGD moves the separating weight the right way and reduces loss
    assert(w(1) > 0)
    def loss(wt: Array[Double]): Double = {
      val p = Classifier.predictProb(feats, wt)
      df.agg(avg(-(col("y") * log(p) +
        (lit(1.0) - col("y")) * log(lit(1.0) - p)))).head.getDouble(0)
    }
    assert(loss(w) < loss(Array(0.0, 0.0)))
    // the salt rotates per step: a 1-step and a 2-step run trained on
    // DIFFERENT batches, so step 2's update differs from re-running
    // step 1's batch (regression guard for a frozen salt)
    val w1a = Classifier.trainLogisticSgd(df, feats, col("y"), col("id"),
      1, 2.0, 1 << 23)
    val w1b = Classifier.trainLogisticSgd(df, feats, col("y"), col("id"),
      1, 2.0, 1 << 22)
    assert(!w1a.sameElements(w1b), "threshold must change the batch")
  }

  test("confusionAt: hand-computed confusion, PR and F1 per threshold") {
    import spark.implicits._
    // identity model over a logit column: p = sigmoid(logit)
    def logit(p: Double) = math.log(p / (1 - p))
    val df = Seq(
      (logit(0.9), 1.0), (logit(0.6), 0.0),
      (logit(0.4), 1.0), (logit(0.1), 0.0)
    ).toDF("z", "y")
    val got = Classifier.confusionAt(df, Seq(col("z")), col("y"),
        Array(1.0), Seq(0.25, 0.5))
      .collect().map(r => r.getDouble(0) -> r).toMap
    val at5 = got(0.5)
    assert((at5.getLong(1), at5.getLong(2), at5.getLong(3), at5.getLong(4))
      == ((1L, 1L, 1L, 1L)))
    assert(math.abs(at5.getAs[Double]("precision") - 0.5) < 1e-12)
    assert(math.abs(at5.getAs[Double]("recall") - 0.5) < 1e-12)
    assert(math.abs(at5.getAs[Double]("f1") - 0.5) < 1e-12)
    val at25 = got(0.25)
    assert((at25.getLong(1), at25.getLong(2), at25.getLong(3), at25.getLong(4))
      == ((2L, 1L, 0L, 1L)))
    assert(math.abs(at25.getAs[Double]("precision") - 2.0 / 3) < 1e-12)
    assert(math.abs(at25.getAs[Double]("recall") - 1.0) < 1e-12)
    assert(math.abs(at25.getAs[Double]("f1") - 0.8) < 1e-12)
    // degenerate slice: no positives predicted → NULL precision/F1
    val none = Classifier.confusionAt(
      Seq((logit(0.1), 0.0)).toDF("z", "y"),
      Seq(col("z")), col("y"), Array(1.0), Seq(0.5)).head
    assert(none.isNullAt(5) && none.isNullAt(7))
  }
}
