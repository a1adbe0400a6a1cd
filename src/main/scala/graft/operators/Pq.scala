package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Product quantization (PQ) for approximate nearest-neighbor search —
  * the compressed-domain scale path beyond IVF-Flat ([[Ivf]]): vectors
  * split into `m` subspaces, each subvector replaced by the id of its
  * nearest codeword, so a D-dim float vector compresses to `m` small
  * codes (64 floats → 8 bytes here). Query-time ranking is ADC
  * (asymmetric distance computation): one `m × k` lookup table computed
  * driver-side from the query, then per-row distance is `m` table
  * lookups — no float vector is touched until the exact rerank of the
  * shortlist.
  *
  * At 100 TB this is what makes ANN storage-bound instead of
  * compute-bound: the encoded table is ~1% the size of the float
  * corpus, the ADC scan is codegen'd integer indexing, and only
  * `rerank` rows per query read the original vectors.
  *
  * Codebooks here are DETERMINISTIC (subvectors of a fixed sample, rank
  * order) — same design as [[Ivf.buildWithCentroids]] — so encoding,
  * ADC ranking, and rerank are pure functions of the input and an
  * oracle on another engine reproduces them EXACTLY (q82). Swap in
  * k-means-trained codebooks per subspace for production recall.
  *
  * All distance math uses the `-2·(v·c) + |c|²` form with LEFT-TO-RIGHT
  * summation folds, bit-matching the DuckDB oracle's `list_sum`.
  */
object Pq {

  /** codebooks(m)(k) = k-th codeword of subspace m. encoded = input +
    * `codes` (array<long>, one code per subspace).
    */
  final case class PqModel(
      codebooks: Seq[Seq[Seq[Double]]],
      subDim: Int,
      encoded: DataFrame)

  private def normSq(c: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Split sample vectors into per-subspace codebooks:
    * codebooks(m)(k) = subvector m of sample vector k.
    */
  def codebooksFromSample(sample: Seq[Seq[Double]], m: Int): Seq[Seq[Seq[Double]]] = {
    require(sample.nonEmpty && sample.head.length % m == 0,
      s"dim ${sample.headOption.fold(0)(_.length)} not divisible into $m subspaces")
    val subDim = sample.head.length / m
    (0 until m).map(mi => sample.map(_.slice(mi * subDim, (mi + 1) * subDim)))
  }

  /** Production codebooks: one k-means fit PER SUBSPACE (the standard PQ
    * training), deterministic for a fixed seed. Spec-covered rather than
    * oracle-covered — the k-means iteration order is engine-private, so
    * cross-engine replay isn't possible; [[codebooksFromSample]] is the
    * oracle-exact variant (q82). At 100 TB, fit on a driver-sized
    * SAMPLE of the corpus (`embeddings.sample(...)`) — codebook quality
    * converges long before the full data would be needed — then
    * [[encode]] streams the full corpus in one codegen'd pass.
    */
  def trainCodebooks(
      embeddings: DataFrame,
      vecCol: String,
      m: Int,
      k: Int,
      seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val dv = Vectors.toDoubleVec(col(vecCol))
    (0 until m).map { mi =>
      val sub = embeddings.select(
        array_to_vector(slice(dv, mi * subDim + 1, subDim)).as("__features"))
      new KMeans()
        .setK(k).setSeed(seed).setMaxIter(20)
        .setFeaturesCol("__features").setPredictionCol("__code")
        .fit(sub)
        .clusterCenters.map(_.toArray.toSeq).toSeq
    }
  }

  /** Nearest-codeword id for one subspace: `least` over (score, k)
    * structs — codegen'd, ties toward the lower code id.
    */
  private def assignCode(sub: Column, codewords: Seq[Seq[Double]]): Column = {
    val scored = codewords.zipWithIndex.map { case (c, k) =>
      struct(
        (Vectors.dot(sub, array(c.map(lit): _*)) * lit(-2.0) + lit(normSq(c)))
          .as("score"),
        lit(k.toLong).as("k"))
    }
    least(scored: _*).getField("k")
  }

  /** Encode every vector: one `codes` array column, `codes[m]` = nearest
    * codeword of subspace m. One pass, fully codegen'd (m × k dot
    * products per row on `slice`d subvectors).
    */
  def encode(
      embeddings: DataFrame,
      vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): PqModel = {
    val subDim = codebooks.head.head.length
    val dv = Vectors.toDoubleVec(col(vecCol))
    val codes = codebooks.zipWithIndex.map { case (cb, mi) =>
      assignCode(slice(dv, mi * subDim + 1, subDim), cb)
    }
    PqModel(codebooks, subDim,
      embeddings.withColumn("codes", array(codes: _*)))
  }

  /** ADC lookup table for a query: lut(m)(k) = `-2·(q_m·c) + |c|²`
    * (rank-equivalent to `|q_m - c|²`; the dropped `|q_m|²` term is
    * constant per subspace so totals shift uniformly). Left-to-right
    * folds, same as the codegen'd scan side.
    */
  def adcTable(query: Seq[Double], model: PqModel): Seq[Seq[Double]] =
    model.codebooks.zipWithIndex.map { case (cb, mi) =>
      val qSub = query.slice(mi * model.subDim, (mi + 1) * model.subDim)
      cb.map { c =>
        var d = 0.0; var i = 0
        while (i < model.subDim) { d += qSub(i) * c(i); i += 1 }
        d * -2.0 + normSq(c)
      }
    }

  /** ADC-ranked shortlist + exact cosine rerank. The scan cost is `m`
    * literal-array lookups per row; only the `rerank`-row shortlist
    * touches the float vectors.
    */
  def search(
      model: PqModel,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      rerank: Int,
      topK: Int): DataFrame = {
    val lut = adcTable(query, model)
    // Σ_m lut[m][codes[m]] as a left-assoc fold of literal-array lookups.
    val adc = lut.zipWithIndex
      .map { case (row, mi) =>
        element_at(typedLit(row), element_at(col("codes"), mi + 1).cast("int") + 1)
      }
      .reduce(_ + _)
    model.encoded
      .withColumn("adc_score", adc)
      .orderBy(col("adc_score"), col(idCol))
      .limit(rerank)
      .select(col(idCol),
        Vectors.cosineToConst(col(vecCol), query).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(topK)
  }
}
