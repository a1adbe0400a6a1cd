package graft

/** DuckDB oracles for the spatial tier. The oracle enumerates pairs
  * inside a provably-exhaustive latitude band (see [[latBand]] — the
  * engine is grid-pruned instead, same results by the grid-exhaustiveness
  * argument in [[graft.spatial.Geo]]). Coordinates and the haversine are
  * spelled with the engine's exact operation order; distances compare
  * 6-dp-rounded.
  */
private[graft] object OracleSpatial {

  /** unit hash of a salted key expression, as inline SQL. */
  private def unit(expr: String): String =
    s"""CAST(CAST(concat('0x', substr(md5($expr), 1, 8)) AS BIGINT) AS DOUBLE)
           / 4294967296.0"""

  private def lat(key: String): String =
    s"${unit(s"'glat_' || $key")} * 116.0 - 58.0"
  private def lon(key: String): String =
    s"${unit(s"'glon_' || $key")} * 340.0 - 170.0"

  /** d = 2·R·asin(√h) rounded to 6 dp — textual mirror of Geo.haversineKm. */
  private def dkm(la: String, lo: String, lb: String, lnb: String): String =
    s"""round(2.0 * 6371.0088 * asin(sqrt(
         sin(radians($lb - $la) / 2.0) * sin(radians($lb - $la) / 2.0)
         + cos(radians($la)) * cos(radians($lb))
           * sin(radians($lnb - $lo) / 2.0) * sin(radians($lnb - $lo) / 2.0))), 6)"""

  private val custPts =
    s"""SELECT c_custkey AS id, ${lat("CAST(c_custkey AS VARCHAR)")} AS lat,
         ${lon("CAST(c_custkey AS VARCHAR)")} AS lon FROM customer"""

  /** Redundant-but-exhaustive latitude band: great-circle distance is
    * bounded below by the meridian arc, d ≥ R·Δφ_rad = 111.19 km/°·Δφ,
    * so d ≤ eps ⇒ |Δlat| ≤ eps/111.19 < eps/110 (the engine grid's own
    * latitude bound, Geo.gridSpec; the 6-dp rounding slack on compared
    * distances is covered ~10⁴×). Adding it never changes a result — it
    * only lets DuckDB plan the pair stage as an inequality band join
    * instead of a full n² nested loop, which is what makes the sf0.1/sf1
    * sweeps of this tier tractable oracle-side.
    */
  private def latBand(la: String, lb: String, eps: String): String =
    s"abs($la - $lb) <= ($eps) / 110.0"

  /** DBSCAN oracle body, generated: edges from the band-pruned pair
    * stream, then cluster labels by `rounds` unrolled min-label rounds
    * (self ∪ neighbor labels ∪ one pointer-jump hop l(l(v)) per round —
    * each round is a linear join over the core edge list, label state is
    * node-sized). The r9 form materialized the full transitive CLOSURE
    * in a recursive CTE — component²-sized, 2.25·10⁸ rows on the one
    * giant sf0.1 component, the third sf0.1 sweep TIMEOUT.
    *
    * Exactness is not assumed from the round count: the generator emits
    * one EXTRA round and a `chk` CTE that counts labels still moving; a
    * nonzero count injects a `NOT_CONVERGED` poison row no engine output
    * contains, so an under-provisioned unroll fails the compare loudly
    * instead of passing with a wrong fixpoint. (Neighbor spread alone
    * reaches the component min in diameter rounds; the jump hop
    * short-cuts far below that — measured 36 rounds on the sf0.1 giant
    * component — and `rounds` = 96 carries margin.)
    */
  private def dbscanSql(epsCte: String, rounds: Int = 96): String = {
    val roundCtes = (1 to rounds + 1).map { i =>
      s"""l$i AS MATERIALIZED (SELECT v, min(l) AS l FROM (
           SELECT t.v, p2.l FROM l${i - 1} t JOIN l${i - 1} p2 ON p2.v = t.l
           UNION ALL SELECT ce.b AS v, t.l FROM l${i - 1} t JOIN ce ON ce.a = t.v
           UNION ALL SELECT v, l FROM l${i - 1}) GROUP BY v)"""
    }.mkString(",\n         ")
    s"""WITH p AS ($custPts),
         eps AS ($epsCte),
         e AS MATERIALIZED (
           SELECT id_a, id_b FROM (
             SELECT a.id AS id_a, b.id AS id_b, eps.e AS e,
               ${dkm("a.lat", "a.lon", "b.lat", "b.lon")} AS d6
             FROM p a JOIN p b ON a.id < b.id CROSS JOIN eps
             WHERE ${latBand("a.lat", "b.lat", "eps.e")})
           WHERE d6 <= e),
         sym AS MATERIALIZED (SELECT id_a AS id, id_b AS nb FROM e
                 UNION ALL SELECT id_b, id_a FROM e),
         core AS MATERIALIZED (
           SELECT id FROM sym GROUP BY id HAVING count(*) + 1 >= 4),
         ce AS MATERIALIZED (SELECT s.id AS a, s.nb AS b FROM sym s
                JOIN core c1 ON s.id = c1.id JOIN core c2 ON s.nb = c2.id),
         l0 AS MATERIALIZED (
           SELECT c.id AS v, least(c.id, coalesce(min(ce.b), c.id)) AS l
           FROM core c LEFT JOIN ce ON ce.a = c.id GROUP BY c.id),
         $roundCtes,
         chk AS (SELECT count(*) AS nch FROM l$rounds a
           JOIN l${rounds + 1} b ON a.v = b.v AND a.l <> b.l),
         comp AS (SELECT v AS id, l AS cluster FROM l$rounds),
         border AS (SELECT s.id, min(comp.cluster) AS cluster
                    FROM sym s JOIN comp ON s.nb = comp.id
                    WHERE s.id NOT IN (SELECT id FROM core)
                    GROUP BY s.id)
         SELECT id, 'core' AS role, cluster FROM comp
         UNION ALL
         SELECT id, 'border' AS role, cluster FROM border
         UNION ALL
         SELECT id, 'NOT_CONVERGED' AS role, id AS cluster
         FROM (SELECT -1 * nch AS id FROM chk WHERE nch > 0)"""
  }

  val map: Map[String, String] = Map(

    "q254_geo_neighbors" ->
      s"""WITH p AS ($custPts),
         d AS (SELECT a.id AS ia, b.id AS ib,
             ${dkm("a.lat", "a.lon", "b.lat", "b.lon")} AS d6
           FROM p a JOIN p b ON a.id <> b.id
           WHERE ${latBand("a.lat", "b.lat", "500.0")})
         SELECT ia AS id, CAST(count(*) AS BIGINT) AS n_neighbors,
           min(d6) AS nn_km
         FROM d WHERE d6 <= 500.0 GROUP BY 1""",

    "q255_geo_knn" ->
      s"""WITH p AS ($custPts),
         s AS (SELECT s_suppkey AS sid,
             ${lat("'s' || CAST(s_suppkey AS VARCHAR)")} AS lat,
             ${lon("'s' || CAST(s_suppkey AS VARCHAR)")} AS lon FROM supplier),
         d AS (SELECT p.id AS c_id, s.sid AS s_id,
             ${dkm("p.lat", "p.lon", "s.lat", "s.lon")} AS d_km
           FROM p JOIN s ON ${latBand("p.lat", "s.lat", "3000.0")}),
         r AS (SELECT c_id, s_id, d_km,
             row_number() OVER (PARTITION BY c_id ORDER BY d_km, s_id) AS rn
           FROM d WHERE d_km <= 3000.0)
         SELECT c_id, s_id, d_km FROM r WHERE rn <= 3""",

    "q256_geo_dbscan" -> dbscanSql("SELECT 400.0 AS e"),

    // Density-normalized twins (q356–q358): the SAME bodies with eps
    // re-derived in SQL — least(eps0*sqrt(nRef/n), 6000.0) is
    // the textual mirror of Geo.scaledEps (·, sqrt, min are IEEE-exact /
    // correctly rounded in both engines), so these oracles track the
    // engine at EVERY sf: at the sf0.01 gate n = nRef and eps = eps0
    // exactly; at other sfs both engines shrink/grow the radius by the
    // identical double.

    "q356_geo_neighbors_scaled" ->
      s"""WITH p AS ($custPts),
         eps AS (SELECT least(500.0 * sqrt(1500.0 / CAST(count(*) AS DOUBLE)),
             6000.0) AS e FROM customer),
         d AS (SELECT a.id AS ia, b.id AS ib, eps.e AS e,
             ${dkm("a.lat", "a.lon", "b.lat", "b.lon")} AS d6
           FROM p a JOIN p b ON a.id <> b.id CROSS JOIN eps
           WHERE ${latBand("a.lat", "b.lat", "eps.e")})
         SELECT ia AS id, CAST(count(*) AS BIGINT) AS n_neighbors,
           min(d6) AS nn_km
         FROM d WHERE d6 <= e GROUP BY 1""",

    "q357_geo_knn_scaled" ->
      s"""WITH p AS ($custPts),
         cap AS (SELECT least(3000.0 * sqrt(100.0 / CAST(count(*) AS DOUBLE)),
             6000.0) AS e FROM supplier),
         s AS (SELECT s_suppkey AS sid,
             ${lat("'s' || CAST(s_suppkey AS VARCHAR)")} AS lat,
             ${lon("'s' || CAST(s_suppkey AS VARCHAR)")} AS lon FROM supplier),
         d AS (SELECT p.id AS c_id, s.sid AS s_id, cap.e AS e,
             ${dkm("p.lat", "p.lon", "s.lat", "s.lon")} AS d_km
           FROM p CROSS JOIN cap
           JOIN s ON ${latBand("p.lat", "s.lat", "cap.e")}),
         r AS (SELECT c_id, s_id, d_km,
             row_number() OVER (PARTITION BY c_id ORDER BY d_km, s_id) AS rn
           FROM d WHERE d_km <= e)
         SELECT c_id, s_id, d_km FROM r WHERE rn <= 3""",

    "q358_geo_dbscan_scaled" -> dbscanSql(
      """SELECT least(400.0 * sqrt(1500.0 / CAST(count(*) AS DOUBLE)),
             6000.0) AS e FROM customer"""),

    "q266_geohash_cells" -> {
      // Generated bit-exact mirror of Geohash.cell for chars = 2
      // (bits 10, lonBits 5, latBits 5): closed-form ids, then the
      // MSB-first interleave as a sum of shifted bit extracts.
      val chars = 2
      val bits = chars * 5
      val lonBits = (bits + 1) / 2
      val latBits = bits / 2
      val lonTerms = (0 until lonBits).map(i =>
        s"(((lon_id >> ${lonBits - 1 - i}) & 1) << ${bits - 1 - 2 * i})")
      val latTerms = (0 until latBits).map(i =>
        s"(((lat_id >> ${latBits - 1 - i}) & 1) << ${bits - 2 - 2 * i})")
      val cellExpr = (lonTerms ++ latTerms).mkString(" + ")
      val alpha = graft.spatial.Geohash.Alphabet
      s"""WITH p AS ($custPts),
         ids AS (SELECT
             least(${(1L << lonBits) - 1},
               CAST(floor((lon + 180.0) / 360.0 * ${1L << lonBits}.0) AS BIGINT))
               AS lon_id,
             least(${(1L << latBits) - 1},
               CAST(floor((lat + 90.0) / 180.0 * ${1L << latBits}.0) AS BIGINT))
               AS lat_id
           FROM p),
         c AS (SELECT $cellExpr AS cell FROM ids),
         g AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_points
           FROM c GROUP BY 1)
         SELECT concat(
             substr('$alpha', CAST(((cell >> 5) % 32) + 1 AS INT), 1),
             substr('$alpha', CAST(((cell >> 0) % 32) + 1 AS INT), 1)) AS geohash,
           cell, n_points
         FROM g"""
    },

    "q337_geofence" -> {
      // Textual mirror of QueriesStats q337: the polygon comes from the
      // SHARED Geo.fencePoly definition (no drift possible), each edge's
      // ray-cast crossing unrolled with CAST AS DOUBLE constants (the
      // pageRankSql literal discipline).
      val poly = graft.spatial.Geo.fencePoly
      val edges = poly.indices.map { i =>
        val (x1, y1) = poly(i)
        val (x2, y2) = poly((i + 1) % poly.size)
        s"""CASE WHEN (CAST($y1 AS DOUBLE) > lat)
             <> (CAST($y2 AS DOUBLE) > lat)
           THEN CASE WHEN lon < (CAST($x2 AS DOUBLE) - CAST($x1 AS DOUBLE))
               * (lat - CAST($y1 AS DOUBLE))
               / (CAST($y2 AS DOUBLE) - CAST($y1 AS DOUBLE))
               + CAST($x1 AS DOUBLE) THEN 1 ELSE 0 END
           ELSE 0 END"""
      }.mkString("(", "\n           + ", ")")
      s"""WITH p AS (SELECT c_custkey, c_nationkey,
           ${lat("CAST(c_custkey AS VARCHAR)")} AS lat,
           ${lon("CAST(c_custkey AS VARCHAR)")} AS lon FROM customer),
         f AS (SELECT c_nationkey, $edges % 2 = 1 AS inside FROM p)
         SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inside,
           round(CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS share
         FROM f JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1"""
    },
  )
}
