package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Second-moment statistics and PCA over an embedding column — the
  * linear-algebra step of embedding curation (whitening / dimension
  * reduction before dedup, ANN indexing, or clustering; e.g. the PCA
  * rotation most IVF-PQ pipelines apply first).
  *
  * Division of labor (the [[Similarity.CentroidSet]] pattern): the
  * CORPUS-sized work — accumulating the dim×dim Gram/covariance and
  * projecting rows — is distributed and shuffle-bounded by dim², never
  * by row count; the dim×dim eigensolve is MODEL-PARAMETER work and
  * runs on the driver (a 64×64 symmetric eigenproblem is microseconds —
  * distributing it would ship more bytes in task metadata than the
  * matrix itself).
  */
object Embeddings {

  /** Upper-triangle Gram matrix Σ v·vᵀ as (i, j, g) rows, 0-based,
    * j ≥ i. Declarative formulation: each row fans out to its
    * dim·(dim+1)/2 index pairs through two stacked `posexplode`
    * generators feeding a partial hash aggregate — the generator
    * streams into the map-side combine (never materialized per row),
    * the aggregate holds dim²/2 cells, and the ONLY exchange carries
    * ≤ dim²/2 rows per partition regardless of corpus size. The
    * arithmetic (dim² multiply-adds per row) is the Gram matrix's own
    * lower bound; all accumulation in double. */
  def gram(emb: DataFrame, vecCol: String): DataFrame = {
    val rows = emb.select(Vectors.toDouble(col(vecCol)).as("__v"))
      .select(col("__v"), posexplode(col("__v")).as(Seq("i", "x")))
      .select(col("i"), col("x"), posexplode(col("__v")).as(Seq("j", "y")))
      .filter(col("j") >= col("i"))
    rows.groupBy("i", "j")
      .agg(sum(col("x") * col("y")).as("g"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("g"))
  }

  /** PCA model: top-p principal axes of the covariance (rows of
    * `components`, unit-norm, variance-descending), their eigenvalues,
    * and the data mean. Driver-held model parameters, shipped into the
    * projection as literals. */
  final case class PcaModel(components: Array[Array[Double]],
                            eigenvalues: Array[Double],
                            mean: Array[Double]) {
    def p: Int = components.length
    def dim: Int = mean.length
  }

  /** Classical cyclic-Jacobi eigendecomposition of a symmetric matrix
    * (public-domain numerics, e.g. Golub & Van Loan §8.5): rotate away
    * the largest off-diagonal entries sweep by sweep until the
    * off-diagonal Frobenius mass is ~0. Deterministic: fixed sweep
    * order, no pivoting randomness. Returns (eigenvalues, eigenvectors
    * as columns of v). O(dim³) per sweep — driver-side by design. */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-22 && sweep < 64) {
      sweep += 1
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) match {
              case 0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Fit PCA: ONE distributed pass builds the Gram matrix and the mean
    * (dim² + dim doubles reach the driver — model parameters, the same
    * bytes a broadcast would ship), covariance = Gram/n − mean·meanᵀ,
    * then the driver Jacobi-solves it and keeps the top `p` axes.
    * Sign fixed deterministically (largest-|entry| coordinate made
    * positive, ties → lowest index) so the model replays bit-stable
    * across refits of identical data. */
  def pcaFit(emb: DataFrame, vecCol: String, p: Int): PcaModel = {
    val g = gram(emb, vecCol)
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    require(g.nonEmpty, "pcaFit: empty corpus")
    val dim = g.keys.map(_._2).max + 1
    require(p >= 1 && p <= dim, s"p must be in [1, $dim]")
    val mn = emb.agg(Vectors.centroid(col(vecCol), dim).as("m"))
      .select(col("m")).head().getSeq[Double](0).toArray
    val n = emb.count().toDouble
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val key = if (i <= j) (i, j) else (j, i)
      g(key) / n - mn(i) * mn(j)
    }
    val (eig, vecs) = jacobiEigen(cov)
    val order = eig.indices.sortBy(i => (-eig(i), i)).take(p)
    val comps = order.map { c =>
      val axis = Array.tabulate(dim)(r => vecs(r)(c))
      val lead = axis.indices.maxBy(i => (math.abs(axis(i)), -i))
      if (axis(lead) < 0) axis.map(-_) else axis
    }.toArray
    PcaModel(comps, order.map(eig).toArray, mn)
  }

  /** Project rows onto the model's axes: appends `pc`, an array of
    * `model.p` doubles, pc_c = (v − mean)·axis_c — computed as
    * v·axis_c − (mean·axis_c) with the scalar offsets folded at plan
    * build, so the whole projection is ONE narrow codegen'd kernel
    * ([[graft.plans.VectorOps.matVec]] — the per-axis HOF dot-product
    * formulation it replaces interpreted a lambda per element per axis
    * and cost ~1.4 s per pass on a 2000×64 corpus; the kernel is
    * p·dim fused multiply-adds inside whole-stage codegen, measured
    * ~100× faster, bit-identical accumulation order), zero shuffle,
    * zero state. */
  def pcaProject(emb: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val offsets = model.components.map(axis =>
      axis.zip(model.mean).map { case (a, m) => a * m }.sum)
    emb.withColumn("pc", graft.plans.exprs.matVec(col(vecCol),
      model.components.flatten, offsets, model.dim))
  }

  /** PCA WHITENING: project onto the model's axes and scale each
    * component by 1/√eigenvalue, so the output has identity covariance
    * — the calibration step embedding-curation pipelines apply before
    * cosine dedup / ANN when the raw space is anisotropic (dominant
    * directions otherwise dominate every inner product; after
    * whitening, distance is Mahalanobis distance in the original
    * space). Same plan shape as [[pcaProject]]: the 1/√λ scales fold
    * into the axis matrix at plan build, so the whole transform stays
    * ONE narrow codegen'd kernel — zero shuffle, zero state.
    * Components with eigenvalue ≤ `floor` (numerically dead directions
    * — dividing by √λ would amplify float noise unboundedly) are
    * scaled by 1/√floor instead; appends `white`. */
  def pcaWhiten(emb: DataFrame, vecCol: String, model: PcaModel,
                floor: Double = 1e-12): DataFrame = {
    require(floor > 0, "floor must be positive")
    val scaled = model.components.zip(model.eigenvalues).map { case (axis, eig) =>
      val s = 1.0 / math.sqrt(math.max(eig, floor))
      axis.map(_ * s)
    }
    val offsets = scaled.map(axis =>
      axis.zip(model.mean).map { case (a, m) => a * m }.sum)
    emb.withColumn("white", graft.plans.exprs.matVec(col(vecCol),
      scaled.flatten, offsets, model.dim))
  }

  /** Embedding-distribution DRIFT between two corpus snapshots — the
    * vector-modality sibling of the token/categorical drift monitors
    * (q135/q138): per group, the cosine between snapshot centroids,
    * reported as `cos_shift` plus both snapshot counts. A centroid that
    * rotates away from its predecessor (cos_shift dropping below ~1)
    * flags a semantic shift in what a source is contributing between
    * crawls — the retrain/re-curate trigger embedding pipelines watch.
    *
    * Scale: one narrow projection + a (group, snapshot, dim) partial
    * mean — the only exchange carries 2·|groups|·dim rows; the
    * centroid-pair cosine then runs at |groups|·dim grain. Snapshots
    * whose group is missing a side report NULL (no centroid to compare).
    */
  def centroidShift(emb: DataFrame, vecCol: String, groupCols: Seq[String],
                    snapCol: String, snapA: String, snapB: String): DataFrame = {
    val keys = groupCols.map(col)
    val perDim = emb
      .filter(col(snapCol).isin(snapA, snapB))
      .withColumn("__vd", Vectors.toDouble(col(vecCol)))
      .select(keys ++ Seq(col(snapCol).as("__snap"),
        posexplode(col("__vd")).as(Seq("dim", "x"))): _*)
      .groupBy(keys ++ Seq(col("__snap"), col("dim")): _*)
      .agg(avg(col("x")).as("m"), count(lit(1)).as("cnt"))
    val paired = perDim.groupBy(keys :+ col("dim"): _*)
      .agg(max(when(col("__snap") === snapA, col("m"))).as("ma"),
        max(when(col("__snap") === snapB, col("m"))).as("mb"),
        max(when(col("__snap") === snapA, col("cnt"))).as("na"),
        max(when(col("__snap") === snapB, col("cnt"))).as("nb"))
    paired.groupBy(keys: _*)
      .agg(sum(col("ma") * col("mb")).as("dot"),
        sum(col("ma") * col("ma")).as("sa"),
        sum(col("mb") * col("mb")).as("sb"),
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"))
      .select(keys ++ Seq(
        coalesce(col("n_a"), lit(0L)).cast("long").as("n_a"),
        coalesce(col("n_b"), lit(0L)).cast("long").as("n_b"),
        when(col("n_a").isNotNull && col("n_b").isNotNull &&
            col("sa") > 0 && col("sb") > 0,
          col("dot") / (sqrt(col("sa")) * sqrt(col("sb"))))
          .as("cos_shift")): _*)
  }

  /** Exact corpus DIVERSITY: the mean pairwise cosine similarity over
    * all n·(n−1)/2 vector pairs of each group — computed WITHOUT ever
    * forming a pair. With u_i = v_i/‖v_i‖ and S = Σ u_i,
    * ‖S‖² = n + 2·Σ_{i<j} u_i·u_j, so
    * mean pairwise cos = (‖S‖² − n) / (n(n−1)) — the quadratic
    * statistic collapses to one linear pass. This is the datasheet
    * diversity number (high mean cosine = dup-heavy / mode-collapsed
    * corpus; the signal SemDeDup-style pruning acts on), and the
    * identity is the 100 TB story: the all-pairs formulation is
    * O(n²·dim) with an n×n shuffle, this is one narrow normalize
    * projection plus a per-(group, dim) partial sum whose ONLY exchange
    * carries |groups|·dim rows. Plan-asserted join-free in
    * EmbeddingsSpec.
    *
    * Zero vectors carry no direction and are excluded (documented
    * contract); groups with n < 2 have no pairs and report NULL.
    * Returns groupCols :+ (n, mean_cos); groupCols may be empty for the
    * whole-corpus number. */
  def meanPairwiseCosine(emb: DataFrame, vecCol: String,
                         groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(col)
    val unit = emb
      .withColumn("__vd", Vectors.toDouble(col(vecCol)))
      .withColumn("__nm", sqrt(aggregate(col("__vd"), lit(0.0),
        (acc, x) => acc + x * x)))
      .filter(col("__nm") > 0)
      .withColumn("__u", transform(col("__vd"), x => x / col("__nm")))
    val perDim = unit.select(
      keys :+ posexplode(col("__u")).as(Seq("dim", "x")): _*)
    val sums = perDim.groupBy(keys :+ col("dim"): _*)
      .agg(sum(col("x")).as("sv"), count(lit(1)).as("cnt"))
    sums.groupBy(keys: _*)
      .agg(sum(col("sv") * col("sv")).as("ssq"), max(col("cnt")).as("n"))
      .select(keys ++ Seq(col("n").cast("long").as("n"),
        when(col("n") > 1,
          (col("ssq") - col("n")) /
            (col("n") * (col("n") - 1)).cast("double"))
          .as("mean_cos")): _*)
  }

  /** The ±1 Johnson-Lindenstrauss sign matrix, derived from md5 parity
    * of (salt:j:i) — data-independent, seedless, and REPLAYABLE in any
    * engine that has md5 (the [[Sampling.hexInt]] philosophy applied to
    * a projection matrix: determinism comes from content hashing, never
    * an RNG). Achlioptas 2003 showed ±1 entries satisfy the JL lemma
    * with the same guarantees as Gaussians. */
  def jlSignMatrix(outDim: Int, dim: Int, salt: String): Array[Array[Double]] =
    Array.tabulate(outDim, dim) { (j, i) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$j:$i".getBytes("UTF-8"))
      // first hex digit = high nibble of byte 0 — the HexIntSql digit
      if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
    }

  /** Johnson-Lindenstrauss projection to `outDim` dims: appends `jl` =
    * S·v with the [[jlSignMatrix]] signs. ONE narrow codegen'd matVec
    * kernel (bit-identical sequential accumulation per output axis —
    * the [[pcaProject]] plan shape), zero shuffle, zero state, and the
    * matrix is plan-time literals: at 100 TB this is a pure map over
    * the corpus. Distance preservation: E‖Sv‖² = outDim·‖v‖², so
    * downstream consumers compare d²_jl / (outDim · d²) against the JL
    * distortion band (the q225 audit). */
  def jlProject(emb: DataFrame, vecCol: String, outDim: Int, dim: Int,
                salt: String = "jl"): DataFrame = {
    require(outDim >= 1 && dim >= 1, "dims must be positive")
    emb.withColumn("jl", graft.plans.exprs.matVec(col(vecCol),
      jlSignMatrix(outDim, dim, salt).flatten, Array.fill(outDim)(0.0), dim))
  }
}
