package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial kernels over plain (lat, lon) double columns.
  *
  * The engine has no geo columns in its test tables, so spatial queries
  * derive deterministic coordinates from entity keys via the md5 unit
  * hash (the same derivation is inlined in the DuckDB oracles, so both
  * engines see bit-identical doubles). Coordinates are confined to
  * lat ∈ [−58, 58), lon ∈ [−170, 170): away from the poles, so
  * cos(lat) ≥ cos 58° bounds the longitude spread of any radius.
  *
  * Scale contract: the only all-pairs surface is WITHIN a 3×3 grid-cell
  * neighborhood — candidate volume is density-bounded (points per cell),
  * never corpus². The grid is EXHAUSTIVE for the radius:
  *  - latitude: sin(Δφ/2) ≤ sin(d/2R), so Δφ ≤ d/111 ° < d/110 ° = cell;
  *  - longitude: sin²(d/2R) ≥ cos²(58°)·sin²(Δλ/2) inside the band, so
  *    Δλ ≤ 2·asin(sin(d/2R)/cos 58°) — the cell width is ≥ that bound
  *    AND divides 360 evenly, with neighbor indices taken modulo the
  *    cell count, so pairs whose short arc crosses the ±180 seam are
  *    found too (the first cut skipped the wrap and silently missed
  *    cap-3000 km pairs at high latitude — caught by the oracle).
  *
  * Cross-engine float contract: lat/lon are bit-identical by the unit-
  * hash parity spec; haversine is spelled with the SAME textual
  * operation order as the oracle SQL (sin/cos/asin may differ from
  * DuckDB's libm by an ulp — ~1e-13 km absolute — so every distance is
  * rounded to 6 dp before it is compared or emitted; see NOTES.md).
  */
object Geo {

  /** Deterministic latitude in [−58, 58) for a key (md5 unit hash). */
  def latOf(key: Column): Column =
    graft.plans.TextKernels.unitHashNative(concat(lit("glat_"), key.cast("string"))) *
      lit(116.0) - lit(58.0)

  /** Deterministic longitude in [−170, 170) for a key. */
  def lonOf(key: Column): Column =
    graft.plans.TextKernels.unitHashNative(concat(lit("glon_"), key.cast("string"))) *
      lit(340.0) - lit(170.0)

  /** Great-circle distance in km. Textual operation order is mirrored
    * verbatim by the oracle SQL: d = 2·R·asin(√h),
    * h = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2), R = 6371.0088.
    */
  def haversineKm(latA: Column, lonA: Column, latB: Column, lonB: Column): Column = {
    val sdlat = sin(radians(latB - latA) / lit(2.0))
    val sdlon = sin(radians(lonB - lonA) / lit(2.0))
    val h = sdlat * sdlat + cos(radians(latA)) * cos(radians(latB)) * sdlon * sdlon
    lit(2.0) * lit(6371.0088) * asin(sqrt(h))
  }

  /** Density-normalized radius — the rows-derived default policy for the
    * fixed-radius operators (the geo analog of SemDeDup's
    * nCells ≈ n/targetPerCell). On a FIXED-AREA domain a fixed radius is
    * density-quadratic: per-point neighbor count grows ∝ n, so the pair
    * stream grows ∝ n² (the r8 sf10 probe measured q254 at 56×/decade²
    * and q256 DBSCAN OOM'd outright). Shrinking the radius as
    * eps(n) = eps0·√(nRef/n) keeps the expected points per eps-disc —
    * and with it cell occupancy and the per-point pair work — CONSTANT:
    * the grid cell area is ∝ eps² ∝ 1/density, so the candidate stream
    * is n-linear at every scale. At n = nRef the radius is exactly eps0
    * (√1 = 1.0, an exact IEEE identity), so the scaled face reproduces
    * the fixed face bit-for-bit at the reference scale — which is what
    * lets it share the fixed face's oracle semantics at the gate sf.
    *
    * The clamp keeps tiny corpora inside the grid's feasible band
    * (6000 km < the nLon ≥ 3 bound of 6074 km; see [[gridSpec]]).
    * All three ops (·, √, min) are IEEE-exact or correctly rounded, so
    * DuckDB's textual mirror `least(eps0*sqrt(nRef/n), 6000.0)` computes
    * the identical double.
    */
  def scaledEps(eps0: Double, nRef: Long, n: Long, maxEps: Double = 6000.0): Double = {
    require(n > 0, "scaledEps needs a nonempty point set")
    math.min(eps0 * math.sqrt(nRef.toDouble / n.toDouble), maxEps)
  }

  /** Grid geometry for a radius: latitude cell size in degrees (no
    * wrap — poles are outside the band) and the modular longitude cell
    * count. The longitude bound gets a 0.1% safety factor (covers the
    * 6-dp rounding slack on compared distances many times over) and the
    * floor only ever WIDENS cells — both err toward more candidates,
    * never fewer.
    */
  private[graft] def gridSpec(epsKm: Double): (Double, Int) = {
    val sinHalf = math.sin(epsKm / (2.0 * 6371.0088)) / math.cos(math.toRadians(58.0))
    require(sinHalf < 1.0, s"radius $epsKm km exceeds the band's longitude bound")
    val dlonMax = math.toDegrees(2.0 * math.asin(sinHalf)) * 1.001
    val nLon = math.floor(360.0 / dlonMax).toInt
    require(nLon >= 3, s"radius $epsKm km needs < 3 longitude cells; " +
      "the 3-cell ring would double-count — use a smaller radius")
    (epsKm / 110.0, nLon)
  }

  private def withCells(df: DataFrame, latCell: Double, nLon: Int): DataFrame = {
    val lonCell = 360.0 / nLon
    df.withColumn("ci", floor(col("lat") / lit(latCell)))
      .withColumn("cj", floor((col("lon") + lit(180.0)) / lit(lonCell)).cast("long"))
  }

  private def explodeRing(df: DataFrame, nLon: Int): DataFrame = {
    val offsets = Seq(-1L, 0L, 1L)
    val ring = array(offsets.flatMap(di => offsets.map(dj =>
      struct(lit(di).as("di"), lit(dj).as("dj")))): _*)
    df.withColumn("o", explode(ring))
      .withColumn("ci", col("ci") + col("o.di"))
      .withColumn("cj", pmod(col("cj") + col("o.dj"), lit(nLon.toLong)))
      .drop("o")
  }

  /** All unordered point pairs within `epsKm`, via the modular grid: the
    * LEFT side explodes to its 3×3 neighbor cells, the right side stays
    * in its home cell, the join key is the cell — so the shuffle carries
    * 9×|points| + |points| rows and the per-task pair work is
    * (cell occupancy)², bounded by point density × eps², never corpus².
    *
    * Input: (`idCol`, `lat`, `lon`); output: (id_a, id_b, d_km) with
    * id_a < id_b and round(d_km, 6) ≤ epsKm. `d_km` is the 6-dp-rounded
    * distance (the cross-engine comparable form).
    */
  def gridNeighborPairs(points: DataFrame, idCol: String, epsKm: Double,
      maxPerCell: Option[Int] = None): DataFrame = {
    val (latCell, nLon) = gridSpec(epsKm)
    val cells0 = withCells(
      points.select(col(idCol).as("id"), col("lat"), col("lon")), latCell, nLon)
    // Density cap (the q121 / keyedPairs discipline, motivated by the
    // r8 sf10 probe: at fixed eps on a fixed-area domain, density grows
    // linearly with corpus and the pair stream QUADRATICALLY — q254
    // measured 56×/decade, q256 OOM'd). Points whose HOME cell exceeds
    // the cap are DROPPED entirely (skip, never sample — partial pair
    // streams would silently bias neighbor counts); the dropped mass is
    // enumerable via [[overDenseCells]] per the no-silent-caps rule.
    // Default None → plan and results bit-identical to the uncapped op.
    val cells = maxPerCell match {
      case None => cells0
      case Some(cap) =>
        val occ = cells0.groupBy(col("ci"), col("cj"))
          .agg(count(lit(1)).as("__occ"))
        cells0.join(occ, Seq("ci", "cj"))
          .filter(col("__occ") <= cap).drop("__occ")
    }
    val left = explodeRing(cells, nLon)
      .select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"),
        col("ci"), col("cj"))
    val right = cells.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"), col("ci"), col("cj"))
    left.join(right, Seq("ci", "cj"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(haversineKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")), 6)
          .as("d_km"))
      .filter(col("d_km") <= lit(epsKm))
  }

  /** Bipartite within-radius join: every (left, right) pair within
    * `capKm`. Same modular grid as [[gridNeighborPairs]], but the RIGHT
    * side (pass the smaller table — e.g. suppliers vs customers)
    * explodes to its 3×3 neighbor ring while the left stays in its home
    * cell, so the shuffle is |left| + 9×|right|. Output:
    * (id_a from left, id_b from right, d_km 6-dp-rounded ≤ capKm).
    */
  def gridJoinWithin(
      left: DataFrame, right: DataFrame, idA: String, idB: String,
      capKm: Double): DataFrame = {
    val (latCell, nLon) = gridSpec(capKm)
    val l = withCells(
      left.select(col(idA).as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a")
        ).withColumnRenamed("lat_a", "lat").withColumnRenamed("lon_a", "lon"),
      latCell, nLon)
      .withColumnRenamed("lat", "lat_a").withColumnRenamed("lon", "lon_a")
    val r = explodeRing(withCells(
      right.select(col(idB).as("id_b"), col("lat"), col("lon")), latCell, nLon), nLon)
      .withColumnRenamed("lat", "lat_b").withColumnRenamed("lon", "lon_b")
    l.join(r, Seq("ci", "cj"))
      .select(col("id_a"), col("id_b"),
        round(haversineKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")), 6)
          .as("d_km"))
      .filter(col("d_km") <= lit(capKm))
  }

  /** The cells a `maxPerCell` cap on [[gridNeighborPairs]] would drop —
    * the no-silent-caps report surface: (ci, cj, n_points) for every
    * home cell over the cap, so a capped run can account for exactly
    * which mass it skipped.
    */
  def overDenseCells(points: DataFrame, idCol: String, epsKm: Double,
      maxPerCell: Int): DataFrame = {
    val (latCell, nLon) = gridSpec(epsKm)
    withCells(points.select(col(idCol).as("id"), col("lat"), col("lon")),
        latCell, nLon)
      .groupBy(col("ci"), col("cj")).agg(count(lit(1)).as("n_points"))
      .filter(col("n_points") > maxPerCell)
  }

  /** The q337 geofence polygon — ONE definition shared by the batch
    * query, the streaming face, and (via interpolation) the DuckDB
    * oracle, so the three can never drift. Vertices are integral-valued
    * doubles: decimal→double conversion is exact in both engines.
    */
  val fencePoly: Seq[(Double, Double)] = Seq((-100.0, -40.0), (-20.0, -50.0),
    (60.0, -10.0), (100.0, 40.0), (0.0, 55.0), (-120.0, 30.0))

  /** Ray-cast parity against [[fencePoly]], unrolled as one codegen'd
    * scalar expression chain (no join, no shuffle). The crossing
    * comparisons are pure double ops on bit-identical inputs, so the
    * boolean agrees exactly with the oracle's textual mirror.
    */
  def insideFence(lat: Column, lon: Column): Column = {
    val crossings = fencePoly.indices.map { i =>
      val (x1, y1) = fencePoly(i)
      val (x2, y2) = fencePoly((i + 1) % fencePoly.size)
      when((lit(y1) > lat) =!= (lit(y2) > lat),
        when(lon < (lit(x2) - lit(x1)) * (lat - lit(y1))
          / (lit(y2) - lit(y1)) + lit(x1), 1).otherwise(0))
        .otherwise(0)
    }.reduce(_ + _)
    pmod(crossings, lit(2)) === 1
  }
}
