package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Squared-norm of a centroid, sequential fold (bit-equal to the
    * engine-side `list_sum`/DotProduct order — required for exact
    * cross-engine argmin agreement).
    */
  private def normSq(c: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Centroid-affinity score: `-2·(v·c) + |c|²` — argmin-equivalent to
    * squared Euclidean distance (the `|v|²` term is constant per row) but
    * one dot product per centroid instead of an elementwise subtract.
    */
  private def score(q: Seq[Double], c: Seq[Double]): Double = {
    var d = 0.0; var i = 0
    val n = math.min(q.length, c.length)
    while (i < n) { d += q(i) * c(i); i += 1 }
    d * -2.0 + normSq(c)
  }

  /** Nearest-centroid cell id (LongType) for a vector column, ties broken
    * toward the lower cell id. One codegen'd [[graft.plans.DotProduct]]
    * per centroid; the argmin is a `least` over (score, cell) structs so
    * the whole assignment stays inside whole-stage codegen.
    */
  def assignCell(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val dv = Vectors.toDoubleVec(v)
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (Vectors.dot(dv, array(c.map(lit): _*)) * lit(-2.0) + lit(normSq(c)))
          .as("score"),
        lit(i.toLong).as("cell"))
    }
    least(scored: _*).getField("cell")
  }

  /** IVF with caller-supplied deterministic centroids (e.g. a fixed sample
    * of the corpus, or centroids loaded from a previous build). Unlike the
    * k-means [[build]], every step is an exact pure function of the input —
    * reproducible across engines and oracle-checkable.
    */
  def buildWithCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Double]]): IvfModel =
    IvfModel(
      centroids.map(_.toArray).toArray,
      embeddings.withColumn("cell", assignCell(col(vecCol), centroids)))

  /** The `nProbe` cells ranked nearest to the query (same scoring as
    * [[assignCell]], ties toward lower cell id) — driver-side on the tiny
    * centroid table.
    */
  def probeCells(model: IvfModel, query: Seq[Double], nProbe: Int): Seq[Long] =
    model.centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, score(query, c.toIndexedSeq)) }
      .sortBy { case (i, d) => (d, i) }
      .take(nProbe)
      .map(_._1)
      .toIndexedSeq

  /** Like [[search]] but keeps the `cell` column (assignment provenance)
    * and uses the exact deterministic probe ranking of [[probeCells]].
    */
  def searchDetailed(
      model: IvfModel,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      nProbe: Int,
      topK: Int): DataFrame = {
    val probed = probeCells(model, query, nProbe)
    model.indexed
      .filter(col("cell").isin(probed: _*))
      .select(
        col(idCol),
        col("cell"),
        Vectors.cosineToConst(col(vecCol), query).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(topK)
  }

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
