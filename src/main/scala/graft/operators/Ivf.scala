package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** IVF (inverted-file) approximate nearest-neighbor index: k-means
  * coarse quantizer + cell-restricted search — the classic scale path for
  * billion-vector ANN (IVF-Flat). Complements the hyperplane-LSH variant
  * in [[Similarity]]:
  *
  *  - build: one k-means fit (sampled), then one codegen'd pass assigning
  *    every vector to its nearest centroid. Persist `indexed` partitioned
  *    by `cell` and searches read only probed cells (partition pruning —
  *    at 100 TB the scan cost drops to ~nProbe/nCells of the corpus).
  *  - search: centroid ranking happens driver-side on the tiny centroid
  *    table; the data-side work is a filter + brute-force top-k within
  *    probed cells using the codegen'd dot product.
  */
object Ivf {

  final case class IvfModel(centroids: Array[Array[Double]], indexed: DataFrame)

  /** Fit the coarse quantizer and assign cells. Deterministic for a fixed
    * seed. `indexed` = input + `cell` int column.
    */
  def build(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      seed: Long = 42L): IvfModel = {
    val withVec = embeddings.withColumn("__features", array_to_vector(col(vecCol)))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__features").setPredictionCol("cell")
      .fit(withVec)
    val indexed = model.transform(withVec).drop("__features")
    IvfModel(model.clusterCenters.map(_.toArray), indexed)
  }

  /** Top-k by cosine among the `nProbe` cells whose centroids are nearest
    * (by Euclidean distance) to the query.
    */
  def search(
      model: IvfModel,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      nProbe: Int,
      topK: Int): DataFrame = {
    val probed = model.centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2)
      .take(nProbe)
      .map(_._1)
    model.indexed
      .filter(col("cell").isin(probed.toIndexedSeq: _*))
      .select(
        col(idCol),
        Vectors.cosineToConst(col(vecCol), query).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(topK)
  }
}
