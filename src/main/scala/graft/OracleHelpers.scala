package graft

import QueryDsl.{langMarkers, ngramProfiles}

/** Shared SQL fragments and builders for the oracle maps (moved
  * verbatim from SparkEntry). Declaration ORDER is load-bearing: several
  * vals reference earlier vals; defs (curationSql, qualityWithSourceSql)
  * stay defs because they read vals declared after them.
  */
private[graft] object OracleHelpers {
  val tokSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** q161 oracle: the identical fixed power iteration the Scala driver
    * runs, unrolled as SQL — Gram via the flat self-join, x₀ = 1/√d, then
    * `iters` rounds of normalize(G·x) as chained CTEs. Both sides do the
    * same IEEE operations on the same full-precision Gram, so 4-dp
    * loadings agree.
    */
  def pcaPowerSql(d: Int, iters: Int): String = {
    // MATERIALIZED: without it DuckDB inlines every CTE reference, so
    // each of the `iters` steps re-expands the corpus self-join — the
    // plan (and its file-handle count) explodes combinatorially.
    val steps = (1 to iters).map { k =>
      s"""y$k AS MATERIALIZED (SELECT f.i, sum(f.g * x.v) AS y
           FROM gfull f JOIN x${k - 1} x ON f.j = x.i GROUP BY f.i),
         x$k AS MATERIALIZED (
           SELECT i, y / (SELECT sqrt(sum(y*y)) FROM y$k) AS v FROM y$k)"""
    }.mkString(",\n         ")
    s"""WITH flat AS MATERIALIZED (
           SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
         gu AS MATERIALIZED (
           SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS g
           FROM flat a JOIN flat b USING (vec_id) WHERE a.i <= b.i
           GROUP BY 1, 2),
         gfull AS MATERIALIZED (
           SELECT i, j, g FROM gu
           UNION ALL SELECT j, i, g FROM gu WHERE i <> j),
         x0 AS (SELECT DISTINCT i, 1.0 / sqrt(${d}.0) AS v FROM gfull),
         $steps
         SELECT xf.i AS component, round(xf.v, 4) AS loading,
           round((SELECT sum(f.g * a.v * b.v)
                  FROM gfull f JOIN x$iters a ON f.i = a.i
                  JOIN x$iters b ON f.j = b.i), 3) AS eigenvalue
         FROM x$iters xf"""
  }

  /** Unrolled damped PageRank over the supplier co-purchase graph —
    * same MATERIALIZED discipline as [[pcaPowerSql]] (DuckDB inlines
    * non-materialized CTEs, re-expanding the edge build per iteration).
    * Constants are CAST AS DOUBLE so DuckDB's decimal literals don't
    * shift the math off Spark's IEEE doubles (1.0-0.85 differs from a
    * literal 0.15 by one ulp in binary64).
    */
  def pageRankSql(iters: Int): String = {
    val d = "CAST(0.85 AS DOUBLE)"
    val one = "CAST(1.0 AS DOUBLE)"
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
           SELECT n.node, ($one - $d) / (SELECT n FROM nn)
               + $d * coalesce(c.s, CAST(0.0 AS DOUBLE)) AS pr
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(r.pr * e.w) AS s
             FROM ew e JOIN r${k - 1} r ON e.src = r.node
             GROUP BY e.dst) c USING (node))"""
    }.mkString(",\n         ")
    s"""WITH li AS MATERIALIZED (SELECT l_orderkey, l_suppkey FROM lineitem),
         edges AS MATERIALIZED (
           SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey <> b.l_suppkey),
         deg AS MATERIALIZED (
           SELECT src, count(*) AS deg FROM edges GROUP BY src),
         ew AS MATERIALIZED (
           SELECT e.src, e.dst, $one / CAST(d.deg AS DOUBLE) AS w
           FROM edges e JOIN deg d USING (src)),
         nodes AS MATERIALIZED (SELECT DISTINCT s_suppkey AS node FROM supplier),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         r0 AS MATERIALIZED (
           SELECT node, $one / (SELECT n FROM nn) AS pr FROM nodes),
         $steps
         SELECT node AS s_suppkey, round(pr, 8) AS pagerank FROM r$iters"""
  }

  /** Personalized-PageRank mirror of [[pageRankSql]]: the teleport mass
    * lands on the seed set (s_suppkey ≤ 5, indicator inlined on the
    * node frame), ranks start from the seed distribution, and each of
    * the unrolled MATERIALIZED iterations computes
    * (1−d)·s(v) + d·Σ contrib — the exact double sequence
    * PageRank.runPersonalized produces.
    */
  def pprSql(iters: Int): String = {
    val d = "CAST(0.85 AS DOUBLE)"
    val one = "CAST(1.0 AS DOUBLE)"
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
           SELECT n.node, ($one - $d) * n.s
               + $d * coalesce(c.c, CAST(0.0 AS DOUBLE)) AS pr
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(r.pr * e.w) AS c
             FROM ew e JOIN r${k - 1} r ON e.src = r.node
             GROUP BY e.dst) c USING (node))"""
    }.mkString(",\n         ")
    s"""WITH li AS MATERIALIZED (SELECT l_orderkey, l_suppkey FROM lineitem),
         edges AS MATERIALIZED (
           SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey <> b.l_suppkey),
         deg AS MATERIALIZED (
           SELECT src, count(*) AS deg FROM edges GROUP BY src),
         ew AS MATERIALIZED (
           SELECT e.src, e.dst, $one / CAST(d.deg AS DOUBLE) AS w
           FROM edges e JOIN deg d USING (src)),
         ns AS MATERIALIZED (
           SELECT CAST(count(*) AS DOUBLE) AS k FROM supplier
           WHERE s_suppkey <= 5),
         nodes AS MATERIALIZED (
           SELECT DISTINCT s_suppkey AS node,
             CASE WHEN s_suppkey <= 5 THEN $one / (SELECT k FROM ns)
               ELSE CAST(0.0 AS DOUBLE) END AS s
           FROM supplier),
         r0 AS MATERIALIZED (SELECT node, s AS pr FROM nodes),
         $steps
         SELECT node AS s_suppkey, round(pr, 8) AS ppr FROM r$iters"""
  }

  /** Unrolled bounded-hop Bellman–Ford over the weighted (1/shared-
    * orders) co-purchase graph — same MATERIALIZED/unroll discipline as
    * [[pageRankSql]]; all relaxations replay the engine's doubles
    * exactly because both sides build candidate costs with the same
    * `dist + w` recursion over the same 6-dp weight grid.
    */
  def ssspSql(rounds: Int): String = {
    val steps = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (
           SELECT node, min(cand) AS dist FROM (
             SELECT node, dist AS cand FROM d${k - 1}
             UNION ALL
             SELECT e.sb AS node, r.dist + e.w AS cand
             FROM und e JOIN d${k - 1} r ON e.sa = r.node)
           GROUP BY node)"""
    }.mkString(",\n         ")
    s"""WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
             round(CAST(1.0 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS w
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 5),
         und AS MATERIALIZED (
           SELECT sa, sb, w FROM e UNION ALL SELECT sb, sa, w FROM e),
         d0 AS (SELECT s_suppkey AS node, CAST(0.0 AS DOUBLE) AS dist
           FROM supplier WHERE s_suppkey <= 3),
         $steps
         SELECT node AS s_suppkey, round(dist, 6) AS dist FROM d$rounds"""
  }

  /** Unrolled deterministic label propagation over the same supplier
    * co-purchase graph as [[pageRankSql]] — integer-only math, so every
    * sweep replays exactly. Argmax-with-min-tie-break is the two-step
    * max-count / min-label form (≡ the engine's min(struct(-cnt, label))).
    */
  def labelPropagationSql(rounds: Int): String = {
    val steps = (1 to rounds).map { k =>
      s"""cnt$k AS MATERIALIZED (
           SELECT e.dst AS node, r.label, CAST(count(*) AS BIGINT) AS c
           FROM edges e JOIN l${k - 1} r ON e.src = r.node GROUP BY 1, 2),
         mx$k AS (SELECT node, max(c) AS mc FROM cnt$k GROUP BY node),
         pick$k AS (SELECT c.node, min(c.label) AS nbr
           FROM cnt$k c JOIN mx$k m ON c.node = m.node AND c.c = m.mc
           GROUP BY 1),
         l$k AS MATERIALIZED (
           SELECT p.node, coalesce(k.nbr, p.label) AS label
           FROM l${k - 1} p LEFT JOIN pick$k k USING (node))"""
    }.mkString(",\n         ")
    s"""WITH li AS MATERIALIZED (SELECT l_orderkey, l_suppkey FROM lineitem),
         edges AS MATERIALIZED (
           SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey <> b.l_suppkey),
         l0 AS MATERIALIZED (
           SELECT DISTINCT s_suppkey AS node, s_suppkey AS label FROM supplier),
         $steps
         SELECT node AS s_suppkey, label AS community FROM l$rounds"""
  }

  def vocabHitsSql(words: Seq[String]): String =
    s"len(list_filter(w, t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t)))"

  val langIdSql: String = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (l, ws) => s"${vocabHitsSql(ws)} AS ${l}_hits" }
    val mx = s"greatest(${langs.map(_._1 + "_hits").mkString(", ")})"
    val caseChain = langs.map { case (l, _) => s"WHEN ${l}_hits = $mx THEN '$l'" }
      .mkString("CASE ", " ", " END")
    s"""SELECT doc_id, actual_lang, $caseChain AS pred_lang FROM (
       SELECT doc_id, lang AS actual_lang, ${hitCols.mkString(", ")} FROM (
         SELECT doc_id, lang, $tokSql AS w FROM documents))"""
  }

  val ngramLangSql: String = {
    val langs = ngramProfiles.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (l, ps) =>
      val listLit = ps.map(p => "'" + p + "'").mkString(",")
      s"len(list_filter(grams, g -> list_contains([$listLit], g))) AS ${l}_hits"
    }
    val mx = s"greatest(${langs.map(_._1 + "_hits").mkString(", ")})"
    val caseChain = langs.map { case (l, _) => s"WHEN ${l}_hits = $mx THEN '$l'" }
      .mkString("CASE ", " ", " END")
    s"""SELECT doc_id, actual_lang, $caseChain AS pred_lang FROM (
       SELECT doc_id, actual_lang, ${hitCols.mkString(", ")} FROM (
         SELECT doc_id, lang AS actual_lang,
           CASE WHEN length(t) >= 3
             THEN list_transform(range(1, length(t)-1), i -> substr(t, i, 3))
             ELSE [] END AS grams
         FROM (SELECT doc_id, lang, lower(text) AS t FROM documents)))"""
  }

  val winnowingSql: String =
    """WITH h AS (SELECT doc_id,
         list_transform(
           CASE WHEN length(t) >= 5
             THEN list_transform(range(1, length(t)-3), i -> substr(t, i, 5))
             ELSE [] END,
           g -> md5(g)) AS hs
         FROM (SELECT doc_id, lower(text) AS t FROM documents)),
       f AS (SELECT doc_id,
         CASE WHEN len(hs) >= 4
           THEN list_sort(list_distinct(list_transform(range(1, len(hs)-2),
                i -> list_aggregate(hs[i:i+3], 'min'))))
           WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')]
           ELSE [] END AS fp FROM h)
       SELECT doc_id, len(fp) AS n_fp, md5(array_to_string(fp, ',')) AS fp_hash
       FROM f"""

  val minhashSql: String = {
    val sigElems = (0 until 8).map(seed =>
      s"list_aggregate(list_transform(shingles, x -> md5('$seed|' || x)), 'min')")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
       sh AS (SELECT doc_id, list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' ')) AS shingles FROM toks WHERE len(w) >= 3),
       sig AS (SELECT doc_id, [$sigElems] AS sig FROM sh),
       bands AS (SELECT doc_id, unnest([
         md5(concat_ws('|', 'band0', sig[1], sig[2], sig[3], sig[4])),
         md5(concat_ws('|', 'band1', sig[5], sig[6], sig[7], sig[8]))]) AS band_key FROM sig)
       SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id"""
  }

  /** q193 oracle: the q31 signature recipe (seeded md5-min per
    * component) evaluated per adjacent-id pair against the exact
    * distinct-trigram Jaccard — same 6-dp error grid, id-ordered fold.
    */
  val minhashAccuracySql: String = {
    val sigElems = (0 until 8).map(seed =>
      s"list_aggregate(list_transform(shingles, x -> md5('$seed|' || x)), 'min')")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
       sh AS (SELECT doc_id,
           list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
             AS shingles
         FROM toks WHERE len(w) >= 3),
       d AS (SELECT doc_id, list_distinct(shingles) AS g,
           [$sigElems] AS sig FROM sh),
       pairs AS (SELECT a.doc_id AS id_a,
           round(abs(
             CAST(len(list_filter(range(1, 9), i -> a.sig[i] = b.sig[i]))
               AS DOUBLE) / CAST(8.0 AS DOUBLE)
             - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE)), 6)
             AS err
         FROM d a JOIN d b ON b.doc_id = a.doc_id + 1)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         round(list_sum(list(err ORDER BY id_a)) / CAST(count(*) AS DOUBLE), 6)
           AS avg_abs_err,
         max(err) AS max_abs_err
       FROM pairs"""
  }

  /** q196 oracle: exact all-pairs Jaccard as ground truth (proving the
    * engine's PPJoin-derived truth exact), the q31 signature pairs as
    * the candidate set, and per-threshold integer re-filters.
    *
    * Truth via the inverted index, not a doc×doc list_intersect loop
    * (the r9 form — O(n²·|s|) — was the sf0.1 sweep's TIMEOUT here):
    * every threshold is positive, so a pair counts toward n_truth only
    * with inter ≥ 1, i.e. only when it shares a distinct shingle — the
    * pairs the shingle-equality self-join generates, at Σ_t df(t)² cost.
    * Candidate pairs absent from `truth` (possible only if a band
    * collision carried no shared shingle) are restored with inter = 0 by
    * the LEFT join, so `hits` filters the identical pair set.
    */
  val lshPrCurveSql: String = {
    val sigElems = (0 until 8).map(seed =>
      s"list_aggregate(list_transform(shingles, x -> md5('$seed|' || x)), 'min')")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
       sh AS (SELECT doc_id,
           list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
             AS shingles
         FROM toks WHERE len(w) >= 3),
       t AS MATERIALIZED (SELECT doc_id, list_distinct(shingles) AS s FROM sh),
       tsz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS sz FROM t),
       tex AS (SELECT doc_id, unnest(s) AS g FROM t),
       tiv AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS inter
         FROM tex a JOIN tex b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       truth AS (SELECT tiv.id_a, tiv.id_b, tiv.inter,
           sa.sz + sb.sz - tiv.inter AS uni
         FROM tiv JOIN tsz sa ON sa.doc_id = tiv.id_a
         JOIN tsz sb ON sb.doc_id = tiv.id_b),
       sig AS (SELECT doc_id, [$sigElems] AS sig FROM sh),
       bands AS (SELECT doc_id, unnest([
         md5(concat_ws('|', 'band0', sig[1], sig[2], sig[3], sig[4])),
         md5(concat_ws('|', 'band1', sig[5], sig[6], sig[7], sig[8]))]) AS bk
         FROM sig),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
       th AS (SELECT * FROM (VALUES (3, 10), (1, 2), (7, 10)) AS v(tn, td)),
       tc AS (SELECT tn, td, CAST(count(*) AS BIGINT) AS n_truth
         FROM th, truth WHERE inter * td >= uni * tn GROUP BY 1, 2),
       ct AS (SELECT c.id_a, c.id_b, coalesce(tr.inter, 0) AS inter,
           coalesce(tr.uni, 1) AS uni
         FROM cand c LEFT JOIN truth tr USING (id_a, id_b)),
       hits AS (SELECT tn, td, CAST(count(*) AS BIGINT) AS hits
         FROM th, ct WHERE inter * td >= uni * tn GROUP BY 1, 2),
       nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand)
       SELECT th.tn, th.td, coalesce(tc.n_truth, 0) AS n_truth, nc.n_cand,
         coalesce(hits.hits, 0) AS hits,
         round(CAST(coalesce(hits.hits, 0) AS DOUBLE)
           / CAST(nc.n_cand AS DOUBLE), 6) AS prec,
         round(CAST(coalesce(hits.hits, 0) AS DOUBLE)
           / CAST(tc.n_truth AS DOUBLE), 6) AS recall
       FROM th LEFT JOIN tc USING (tn, td) LEFT JOIN hits USING (tn, td)
       CROSS JOIN nc"""
  }

  val simhashSql: String = {
    val hexHigh = "('8','9','a','b','c','d','e','f')"
    val bitTerms = (0 until 16).map { bit =>
      s"""(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN substr(h, ${bit + 1}, 1) IN $hexHigh THEN 1 ELSE -1 END)) > 0 THEN ${1 << bit} ELSE 0 END)"""
    }.mkString(" + ")
    s"""SELECT doc_id, $bitTerms AS simhash FROM (
       SELECT doc_id, list_transform(list_distinct($tokSql), x -> md5(x)) AS hs FROM documents)"""
  }

  /** DuckDB replica of [[Similarity.hyperplanes]] + [[graft.functions.Vectors.hyperplaneBucket]]:
    * the LCG plane values are pure integer math (`(p·2654435761 + d·40503
    * + 12345) mod 2^32`, scaled to [-1,1)) and the dot is the same
    * sequential fold as the DotProduct kernel, so bucket ids agree
    * bit-for-bit across engines.
    */
  def lshBucketCtes(nPlanes: Int): String =
    s"""ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       planes AS (SELECT p, list_transform(
           range(0, (SELECT len(embedding) FROM embeddings WHERE vec_id = 0)),
           d -> ((p*2654435761 + d*40503 + 12345) % 4294967296) / 2147483648.0 - 1.0) AS plane
         FROM range(0, $nPlanes) tp(p)),
       bucketed AS (SELECT vec_id,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS INTEGER) AS bucket
         FROM (SELECT e.vec_id, pl.p,
                 list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * pl.plane[i])) AS dp
               FROM ev e CROSS JOIN planes pl) GROUP BY vec_id)"""

  val lshAnnSql: String =
    s"""WITH ${lshBucketCtes(6)},
       qb AS (SELECT bucket AS b0 FROM bucketed WHERE vec_id = 0),
       probes AS (SELECT b0 AS pb FROM qb
                  UNION SELECT xor(b0, 1<<p) FROM qb, range(0, 6) tp(p)),
       q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
       scored AS (SELECT vec_id,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END AS cos
         FROM (SELECT e.vec_id,
                 list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*q.qv[i])) AS dp,
                 sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) AS na,
                 sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*q.qv[i]))) AS nb
               FROM ev e JOIN bucketed b USING (vec_id), q
               WHERE b.bucket IN (SELECT pb FROM probes)))
       SELECT vec_id, round(cos, 4) AS cosine_sim FROM scored
       ORDER BY cos DESC, vec_id LIMIT 10"""

  /** Shared CTE chain ending in `pairs(id_a, id_b, cos)` — the bucketed
    * near-duplicate candidate pairs above `threshold`.
    */
  def bucketedPairCtes(nPlanes: Int, threshold: Double): String =
    s"""${lshBucketCtes(nPlanes)},
       wn AS (SELECT e.vec_id, e.v, bk.bucket,
           sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) AS nrm
         FROM ev e JOIN bucketed bk USING (vec_id)),
       cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) AS dp,
           a.nrm AS na, b.nrm AS nb
         FROM wn a JOIN wn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       scored_pairs AS (SELECT id_a, id_b,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END AS cos FROM cand),
       pairs AS (SELECT id_a, id_b, cos FROM scored_pairs WHERE cos >= $threshold)"""

  val bucketedNearPairsSql: String =
    s"""WITH ${bucketedPairCtes(4, 0.3)}
       SELECT id_a, id_b, round(cos, 4) AS cosine_sim FROM pairs"""

  /** Triangles a<b<c over the same pair graph (q108). */
  val trianglesSql: String =
    s"""WITH ${bucketedPairCtes(4, 0.3)}
       SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
       FROM pairs p1
       JOIN pairs p2 ON p2.id_a = p1.id_b
       JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b"""

  /** Min-label connected components over an in-scope SYMMETRIZED
    * `edges(a, b)` CTE (define it AS MATERIALIZED — every round reads
    * it), produced as `cc(vertex, component)`. Generated unrolled
    * min-label sweeps with one pointer-jump hop per round (the
    * OracleSpatial DBSCAN generator's scheme, node-sized state per
    * round) replace the recursive transitive closure whose component²
    * row count was the r10 sf1 sweep's grinder on every near-dup
    * clustering oracle. One EXTRA round feeds a convergence check that
    * poisons every component id when labels are still moving — an
    * under-provisioned unroll is a loud compare-red, never a silent
    * wrong fixpoint.
    */
  def minLabelCcCtes(rounds: Int = 48): String = {
    val roundCtes = (1 to rounds + 1).map { i =>
      s"""ml$i AS MATERIALIZED (SELECT v, min(l) AS l FROM (
           SELECT t.v, p2.l FROM ml${i - 1} t JOIN ml${i - 1} p2 ON p2.v = t.l
           UNION ALL SELECT edges.b AS v, t.l FROM ml${i - 1} t
             JOIN edges ON edges.a = t.v
           UNION ALL SELECT v, l FROM ml${i - 1}) GROUP BY v)"""
    }.mkString(",\n       ")
    s"""ml0 AS MATERIALIZED (SELECT a AS v, least(a, min(b)) AS l
         FROM edges GROUP BY a),
       $roundCtes,
       mlchk AS (SELECT count(*) AS nch FROM ml$rounds x
         JOIN ml${rounds + 1} y ON x.v = y.v AND x.l <> y.l),
       cc AS (SELECT v AS vertex,
           CASE WHEN nch > 0 THEN -999999999 ELSE l END AS component
         FROM ml$rounds CROSS JOIN mlchk)"""
  }

  /** Near-dup clusters: min-label components over the pair graph
    * (component = min id in the component, matching the engine's
    * propagation).
    */
  val neardupComponentsSql: String =
    s"""WITH ${bucketedPairCtes(4, 0.3)},
       edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       ${minLabelCcCtes()}
       SELECT vertex AS vec_id, component FROM cc"""

  // def, not val: qualitySql/langIdSql are declared later in the object
  // and a val here would capture null at initialization order.
  def curationSql: String =
    s"""WITH qual AS ($qualitySql),
       lid AS ($langIdSql),
       f AS (SELECT d.doc_id, d.text, lid.pred_lang, qual.quality_score
             FROM documents d
             JOIN qual ON d.doc_id = qual.doc_id
             JOIN lid ON d.doc_id = lid.doc_id
             WHERE qual.quality_score >= 40 AND lid.pred_lang = lid.actual_lang),
       k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text))
       SELECT f.doc_id, f.pred_lang, f.quality_score
       FROM f JOIN k ON f.doc_id = k.doc_id"""

  /** DuckDB replica of the deterministic-centroid IVF (q67): centroids =
    * first 16 vectors; cell = argmin of `-2·(v·c)+|c|²` (ties → lower
    * cell); probe the 2 best cells for the query (= vector 0); exact
    * cosine top-10 inside them.
    */
  val ivfSearchSql: String =
    """WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c,
           list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i])) AS nsq
         FROM ev WHERE vec_id < 16),
       scores AS (SELECT e.vec_id, ct.cell,
           -2 * list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*ct.c[i])) + ct.nsq AS score
         FROM ev e CROSS JOIN cents ct),
       assign AS (SELECT vec_id, cell FROM (
           SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
           FROM scores) WHERE rn = 1),
       q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
       probed AS (SELECT cell FROM (
           SELECT ct.cell, row_number() OVER (ORDER BY
               -2 * list_sum(list_transform(range(1, len(ct.c)+1), i -> ct.c[i]*q.qv[i])) + ct.nsq,
               ct.cell) AS rn
           FROM cents ct, q) WHERE rn <= 2),
       scored AS (SELECT vec_id, cell,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END AS cos
         FROM (SELECT e.vec_id, a.cell,
                 list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*q.qv[i])) AS dp,
                 sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) AS na,
                 sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*q.qv[i]))) AS nb
               FROM ev e JOIN assign a USING (vec_id), q
               WHERE a.cell IN (SELECT cell FROM probed)))
       SELECT vec_id, cell, round(cos, 4) AS cosine_sim FROM scored
       ORDER BY cos DESC, vec_id LIMIT 10"""

  /** q122 oracle building blocks: one Lloyd assignment (argmin of
    * `-2·dot + |c|²` over the centroid table, ties toward the lower
    * cell — the exact [[graft.operators.Ivf.assignCell]] order) and one
    * centroid update (per-dimension mean rounded to 6 dp; an emptied
    * cell keeps its previous centroid). Unrolled once per iteration —
    * SQL has no loop, and the fixed iteration count IS the determinism
    * contract (see Dedup.semanticDedup).
    */
  def semAssignSql(cents: String, out: String): String =
    s"""$out AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, ct.cell, row_number() OVER (PARTITION BY e.vec_id
            ORDER BY -2 * list_sum(list_transform(range(1, 65), i -> e.v[i]*ct.c[i]))
              + list_sum(list_transform(range(1, 65), i -> ct.c[i]*ct.c[i])), ct.cell) AS rn
          FROM ev e CROSS JOIN $cents ct) WHERE rn = 1)"""

  def semStepSql(assign: String, prev: String, m: String, next: String): String =
    s"""$m AS (SELECT a.cell, t.i, round(avg(e.v[t.i]), 6) AS m
          FROM $assign a JOIN ev e USING (vec_id) CROSS JOIN range(1, 65) t(i)
          GROUP BY a.cell, t.i),
        $next AS (SELECT p.cell, coalesce(n.c, p.c) AS c
          FROM $prev p LEFT JOIN (SELECT cell, list(m ORDER BY i) AS c
            FROM $m GROUP BY cell) n USING (cell))"""

  val semanticDedupSql: String =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c
         FROM (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT 8) s),
       ${semAssignSql("c0", "a1")},
       ${semStepSql("a1", "c0", "m1", "c1")},
       ${semAssignSql("c1", "a2")},
       ${semStepSql("a2", "c1", "m2", "c2")},
       ${semAssignSql("c2", "af")},
       pr AS (SELECT id_b AS id, min(id_a) AS dup_of FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, 65), i -> ea.v[i]*eb.v[i])) AS dp,
             sqrt(list_sum(list_transform(range(1, 65), i -> ea.v[i]*ea.v[i]))) AS na,
             sqrt(list_sum(list_transform(range(1, 65), i -> eb.v[i]*eb.v[i]))) AS nb
           FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
           JOIN ev ea ON ea.vec_id = a.vec_id
           JOIN ev eb ON eb.vec_id = b.vec_id)
         WHERE (CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END)
           >= CAST(0.42 AS DOUBLE)
         GROUP BY id_b)
       SELECT e.vec_id, af.cell, p.dup_of, p.dup_of IS NOT NULL AS removed
       FROM ev e JOIN af USING (vec_id) LEFT JOIN pr p ON p.id = e.vec_id"""

  /** q123 oracle: same tokenize → tf/df/dl/avgdl → BM25 component →
    * ordered-fold sum pipeline as the Spark side; components rounded to
    * 6 dp before the term-ordered list_sum so both engines fold the same
    * grid in the same order (see the q123 scaladoc in `queries`).
    */
  val bm25Sql: String =
    """WITH toks AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
         FROM documents),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       comp AS (SELECT t.doc_id, t.term,
           round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS comp
         FROM tf t JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
       SELECT doc_id, list_sum(list(comp ORDER BY term)) AS bm25
       FROM comp GROUP BY doc_id
       ORDER BY bm25 DESC, doc_id LIMIT 10"""

  /** q125 oracle: same unigram-LM pipeline; the per-position fold reuses
    * the q119 position idiom (generate_subscripts) and the q123 ordered
    * list_sum so both engines sum the 6-dp grid in position order.
    */
  val perplexityFilterSql: String =
    """WITH pos AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term,
           generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
         FROM documents),
       lm AS (SELECT term, count(*) AS cnt FROM pos GROUP BY 1),
       tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM lm),
       lp AS (SELECT term, round(-ln(CAST(cnt AS DOUBLE) / total), 6) AS lp
         FROM lm CROSS JOIN tot),
       sc AS (SELECT doc_id, count(*) AS n_tokens,
           list_sum(list(lp ORDER BY pos)) AS nll
         FROM pos JOIN lp USING (term) GROUP BY doc_id)
       SELECT doc_id, n_tokens, nll / n_tokens AS avg_neg_logp,
         nll / n_tokens <= 3.45 AS keep
       FROM sc"""

  /** q126 oracle: unigram and adjacent-bigram counts, PMI as one
    * round(ln(ratio-of-exact-counts), 4), top-20 by (pmi desc, bigram).
    */
  val pmiCollocationsSql: String =
    """WITH tk AS (SELECT regexp_split_to_array(trim(text), '\s+') AS w
         FROM documents),
       uc AS (SELECT tok, count(*) AS cnt
         FROM (SELECT unnest(w) AS tok FROM tk) GROUP BY 1),
       bc AS (SELECT bigram, count(*) AS cnt_ab
         FROM (SELECT unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1])) AS bigram FROM tk) GROUP BY 1),
       tu AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot_u FROM uc),
       tb AS (SELECT CAST(sum(cnt_ab) AS BIGINT) AS tot_b FROM bc)
       SELECT b.bigram, b.cnt_ab,
         round(ln((CAST(b.cnt_ab AS DOUBLE) / tot_b) /
           ((CAST(a.cnt AS DOUBLE) / tot_u) * (CAST(c.cnt AS DOUBLE) / tot_u))), 4)
           AS pmi
       FROM bc b
       JOIN uc a ON a.tok = string_split(b.bigram, ' ')[1]
       JOIN uc c ON c.tok = string_split(b.bigram, ' ')[2]
       CROSS JOIN tu CROSS JOIN tb
       WHERE b.cnt_ab >= 5
       ORDER BY pmi DESC, bigram LIMIT 20"""

  /** q127 oracle: same (source, term) partial agg feeding corpus counts
    * and per-source totals; contributions on the 6-dp grid summed in
    * term order (list_sum ORDER BY term ≡ the engine's ordered fold).
    */
  val klDriftSql: String =
    """WITH st AS (SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
         FROM documents),
       sc AS (SELECT source, term, count(*) AS cnt FROM st GROUP BY 1, 2),
       corpus AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS ccnt
         FROM sc GROUP BY 1),
       ct AS (SELECT CAST(sum(ccnt) AS BIGINT) AS ctot FROM corpus),
       stt AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS stot
         FROM sc GROUP BY 1),
       comp AS (SELECT s.source, s.term, stot,
           round((CAST(s.cnt AS DOUBLE) / stot) *
             ln((CAST(s.cnt AS DOUBLE) / stot) /
                (CAST(ccnt AS DOUBLE) / ctot)), 6) AS kc
         FROM sc s JOIN corpus USING (term) JOIN stt USING (source)
         CROSS JOIN ct)
       SELECT source, count(*) AS n_terms,
         CAST(max(stot) AS BIGINT) AS n_tokens,
         list_sum(list(kc ORDER BY term)) AS kl_vs_corpus
       FROM comp GROUP BY source"""

  /** q128 oracle: top-10 vocabulary by (count desc, term), coverage as a
    * ratio of exact counts.
    */
  val vocabCoverageSql: String =
    """WITH st AS (SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
         FROM documents),
       sc AS (SELECT source, term, count(*) AS cnt FROM st GROUP BY 1, 2),
       vocab AS (SELECT term FROM
         (SELECT term, sum(cnt) AS tc FROM sc GROUP BY 1)
         ORDER BY tc DESC, term LIMIT 10),
       j AS (SELECT s.source, s.cnt,
           CASE WHEN v.term IS NOT NULL THEN s.cnt ELSE 0 END AS cov
         FROM sc s LEFT JOIN vocab v USING (term))
       SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         round(CAST(sum(cov) AS DOUBLE) / sum(cnt), 6) AS coverage,
         round(1.0 - CAST(sum(cov) AS DOUBLE) / sum(cnt), 6) AS oov_rate
       FROM j GROUP BY source"""

  /** q129 oracle: trigram instances per doc, document frequency from the
    * per-doc-distinct frame, novelty = df=1 instance fraction.
    */
  val ngramNoveltySql: String =
    """WITH tk AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS w
         FROM documents),
       sh AS (SELECT doc_id, g, count(*) AS cnt FROM
         (SELECT doc_id,
            unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
          FROM tk WHERE len(w) >= 3)
         GROUP BY 1, 2),
       df AS (SELECT g, count(*) AS df FROM sh GROUP BY 1)
       SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_shingles,
         round(CAST(sum(CASE WHEN df = 1 THEN cnt ELSE 0 END) AS DOUBLE)
           / sum(cnt), 6) AS novelty
       FROM sh JOIN df USING (g) GROUP BY doc_id"""

  /** q130 oracle: md5 hex prefix bands — identical lowercase hex and
    * ASCII ordering in both engines.
    */
  val hashSplitSql: String =
    """SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
              ELSE 'train' END AS split
       FROM documents"""

  /** q124 oracle: q72's recursive-CTE connected components over the
    * LSH-bucketed pair graph, joined to the q36 quality score, with the
    * survivor argmax as the same min-of-struct idiom the engine uses.
    */
  def dedupSurvivorsSql: String =
    s"""WITH ${bucketedPairCtes(4, 0.3)},
       edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       ${minLabelCcCtes()},
       qual AS ($qualitySql),
       j AS (SELECT cc.component, cc.vertex AS doc_id, q.quality_score AS q
             FROM cc JOIN qual q ON q.doc_id = cc.vertex),
       m AS (SELECT component, count(*) AS n_members,
               min({'nq': -q, 'id': doc_id}) AS ms
             FROM j GROUP BY component)
       SELECT component, struct_extract(ms, 'id') AS survivor_doc_id,
         n_members, -struct_extract(ms, 'nq') AS survivor_quality
       FROM m"""

  /** q139 oracle: water-filling allocation over per-source token counts
    * (also embedded as a CTE by q141's mix-apply oracle).
    */
  val budgetAllocSql: String =
    """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
           FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                 FROM documents)
           GROUP BY source),
         o AS (SELECT source, n_tokens,
             CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS i,
             CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_i,
             CAST(count(*) OVER () AS BIGINT) AS n
           FROM st),
         p AS (SELECT *,
             CASE WHEN n_tokens * (n - i + 1) <= 26000 - (s_i - n_tokens)
                  THEN i END AS pi,
             CASE WHEN n_tokens * (n - i + 1) <= 26000 - (s_i - n_tokens)
                  THEN s_i END AS psi
           FROM o),
         kk AS (SELECT *, max(pi) OVER () AS k, max(psi) OVER () AS sk FROM p)
         SELECT source, n_tokens,
           round(CASE WHEN k IS NOT NULL AND i <= k THEN CAST(n_tokens AS DOUBLE)
                      WHEN k IS NULL THEN CAST(26000 AS DOUBLE) / n
                      ELSE (26000 - sk) / CAST(n - k AS DOUBLE) END, 4)
             AS alloc_tokens,
           (k IS NOT NULL AND i <= k) AS fully_used
         FROM kk"""

  /** q83 oracle (also the CTE of q143's repetition gate): per-doc
    * top-/duplicated-gram fractions at word and bigram granularity.
    */
  val repetitionSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents),
         words AS (SELECT doc_id, unnest(t) AS g FROM toks),
         wc AS (SELECT doc_id, g, count(*) AS cnt FROM words GROUP BY doc_id, g),
         ws AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total,
                  CAST(max(cnt) AS BIGINT) AS top,
                  CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup
                FROM wc GROUP BY doc_id),
         bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)),
                    i -> array_to_string(t[i:i+1], ' '))) AS g
                FROM toks WHERE len(t) >= 2),
         bc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY doc_id, g),
         bs AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total,
                  CAST(max(cnt) AS BIGINT) AS top,
                  CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup
                FROM bc GROUP BY doc_id)
         SELECT w.doc_id, w.total AS n_words,
           CAST(w.top AS DOUBLE) / CAST(w.total AS DOUBLE) AS top_word_frac,
           CAST(w.dup AS DOUBLE) / CAST(w.total AS DOUBLE) AS dup_word_frac,
           CAST(b.top AS DOUBLE) / CAST(b.total AS DOUBLE) AS top_bigram_frac,
           CAST(b.dup AS DOUBLE) / CAST(b.total AS DOUBLE) AS dup_bigram_frac
         FROM ws w JOIN bs b ON w.doc_id = b.doc_id"""

  /** The q36 quality projection with `source` carried through (q142's
    * per-source quantile gate needs it).
    */
  def qualityWithSourceSql: String = qualitySql
    .replace("SELECT doc_id, len(w) AS n_tokens,",
      "SELECT doc_id, source, len(w) AS n_tokens,")
    .replace("FROM (SELECT doc_id, regexp_split_to_array",
      "FROM (SELECT doc_id, source, regexp_split_to_array")

  /** q136 oracle: q124's component/survivor CTEs, applied as a keep-list
    * against the corpus (untouched docs kept as 'unique', survivors kept,
    * all other component members dropped).
    */
  /** Shared CTE chain for the q124/q136/q155 family: LSH pair graph →
    * reachability components → per-component quality-argmax survivor.
    */
  def dedupKeepCtes: String =
    s"""${bucketedPairCtes(4, 0.3)},
       edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       ${minLabelCcCtes()},
       qual AS ($qualitySql),
       j AS (SELECT cc.component, cc.vertex AS doc_id, q.quality_score AS q
             FROM cc JOIN qual q ON q.doc_id = cc.vertex),
       m AS (SELECT component, min({'nq': -q, 'id': doc_id}) AS ms
             FROM j GROUP BY component),
       surv AS (SELECT struct_extract(ms, 'id') AS sid FROM m)"""

  def dedupApplySql: String =
    s"""WITH $dedupKeepCtes
       SELECT d.doc_id,
         CASE WHEN cc.vertex IS NULL THEN 'unique' ELSE 'survivor' END AS status
       FROM documents d
       LEFT JOIN cc ON d.doc_id = cc.vertex
       LEFT JOIN surv ON d.doc_id = surv.sid
       WHERE cc.vertex IS NULL OR surv.sid IS NOT NULL"""

  val cosineSqlBody =
    """list_sum(list_transform(range(1, len(ev)+1), i -> ev[i]*qv[i]))
       / (sqrt(list_sum(list_transform(range(1, len(ev)+1), i -> ev[i]*ev[i])))
        * sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i]))))"""

  val qualitySql: String =
    """SELECT doc_id, len(w) AS n_tokens,
       CAST(CASE WHEN nc >= 100 AND nc <= 20000 THEN 40.0 WHEN nc >= 20 THEN 20.0 ELSE 0.0 END
      + CASE WHEN (CASE WHEN len(w) > 0 THEN nc / CAST(len(w) AS DOUBLE) ELSE 0.0 END) >= 3
              AND (CASE WHEN len(w) > 0 THEN nc / CAST(len(w) AS DOUBLE) ELSE 0.0 END) <= 12
             THEN 30.0 ELSE 10.0 END
      + CASE WHEN (CASE WHEN nc > 0 THEN np / nc ELSE 1.0 END) <= 0.1 THEN 30.0
             WHEN (CASE WHEN nc > 0 THEN np / nc ELSE 1.0 END) <= 0.3 THEN 15.0
             ELSE 0.0 END AS DOUBLE) AS quality_score
       FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
                    CAST(length(text) AS DOUBLE) AS nc,
                    CAST(length(text) - length(regexp_replace(text, '[.,;:!?()-]', '', 'g')) AS DOUBLE) AS np
             FROM documents)"""

  /** q262: one CTE chain per feature (category-grid counts → binary-
    * entropy terms → 10-dp ordered fold), mirroring the engine's
    * expression structure; the binary entropy h(p) is spelled once per
    * use with identical texture so the doubles agree bit-for-bit.
    */
  private def igBranch(tag: String, from: String, x: String): String = {
    def h(p: String): String =
      s"""(-(CASE WHEN $p > 0 THEN $p * log2($p) ELSE 0.0 END)
          - (CASE WHEN $p < 1 THEN (1.0 - $p) * log2(1.0 - $p) ELSE 0.0 END))"""
    s"""g_$tag AS (SELECT $x AS x, CAST(count(*) AS BIGINT) AS nx,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS px
         FROM $from GROUP BY 1),
       t_$tag AS (SELECT CAST(sum(nx) AS BIGINT) AS n,
           CAST(sum(px) AS BIGINT) AS p FROM g_$tag),
       m_$tag AS (SELECT x,
           (CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)) * ${h("pr")} AS term,
           CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS py
         FROM (SELECT x, nx, n, p,
             CAST(px AS DOUBLE) / CAST(nx AS DOUBLE) AS pr
           FROM g_$tag CROSS JOIN t_$tag) q_$tag),
       r_$tag AS (SELECT '$tag' AS feature, max(py) AS py,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY x)),
             (acc, t) -> round(acc + t, 10)) AS hc
         FROM m_$tag),
       f_$tag AS (SELECT feature, round(${h("py")}, 6) AS h_y,
           round(hc, 6) AS h_y_given_x,
           round(${h("py")} - hc, 6) AS info_gain
         FROM r_$tag)"""
  }

  /** Unrolled weighted PageRank over the adjacent-word co-occurrence
    * graph (q271) — same MATERIALIZED/unroll discipline and the same
    * CAST AS DOUBLE constant hygiene as [[pageRankSql]]; the only
    * difference is caller-count edge weights normalized by exact
    * integer out-weight totals instead of 1/outdegree.
    */
  def textRankSql(iters: Int): String = {
    val d = "CAST(0.85 AS DOUBLE)"
    val one = "CAST(1.0 AS DOUBLE)"
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
           SELECT n.node, ($one - $d) / (SELECT n FROM nn)
               + $d * coalesce(c.s, CAST(0.0 AS DOUBLE)) AS pr
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(r.pr * e.w) AS s
             FROM ew e JOIN r${k - 1} r ON e.src = r.node
             GROUP BY e.dst) c USING (node))"""
    }.mkString(",\n         ")
    s"""WITH toks AS MATERIALIZED (SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(trim(lower(text)), '\\s+'), 1)
             - 1 AS pos
         FROM documents),
         pairs AS MATERIALIZED (
           SELECT least(a.w, b.w) AS wa, greatest(a.w, b.w) AS wb
           FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           WHERE length(a.w) >= 4 AND length(b.w) >= 4 AND a.w <> b.w),
         und AS MATERIALIZED (SELECT wa, wb, CAST(count(*) AS BIGINT) AS cnt
           FROM pairs GROUP BY 1, 2),
         ew0 AS MATERIALIZED (SELECT wa AS src, wb AS dst, cnt FROM und
           UNION ALL SELECT wb, wa, cnt FROM und),
         tot AS MATERIALIZED (SELECT src, CAST(sum(cnt) AS BIGINT) AS tw
           FROM ew0 GROUP BY 1),
         ew AS MATERIALIZED (SELECT e.src, e.dst,
             CAST(e.cnt AS DOUBLE) / CAST(t.tw AS DOUBLE) AS w
           FROM ew0 e JOIN tot t USING (src)),
         nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ew0),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         r0 AS MATERIALIZED (
           SELECT node, $one / (SELECT n FROM nn) AS pr FROM nodes),
         $steps
         SELECT node AS word, round(pr, 8) AS textrank FROM r$iters
         ORDER BY textrank DESC, word LIMIT 15"""
  }

  /** Unrolled absorbing-chain reachability (q273) — p_k over the
    * event-type grid with the engine's 12-dp ordered fold spelled as
    * list_reduce ORDER BY dst; MATERIALIZED per the [[pageRankSql]]
    * discipline.
    */
  def markovAbsorptionSql(steps: Int): String = {
    val rounds = (1 to steps).map { k =>
      s"""p$k AS MATERIALIZED (
           SELECT s.state,
             CASE WHEN s.state = 'purchase' THEN CAST(1.0 AS DOUBLE)
                  ELSE coalesce(r.reach, CAST(0.0 AS DOUBLE)) END AS p
           FROM states s LEFT JOIN (
             SELECT t.src AS state,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(t.w * q.p ORDER BY t.dst)),
                 (acc, x) -> round(acc + x, 12)) AS reach
             FROM tm t JOIN p${k - 1} q ON t.dst = q.state
             GROUP BY t.src) r ON s.state = r.state)"""
    }.mkString(",\n         ")
    s"""WITH ev AS MATERIALIZED (
           SELECT user_id, ts, event_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
           FROM events),
         trans AS MATERIALIZED (
           SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS c
           FROM ev WHERE nxt IS NOT NULL GROUP BY 1, 2),
         tot AS MATERIALIZED (
           SELECT src, CAST(sum(c) AS BIGINT) AS tc FROM trans GROUP BY 1),
         tm AS MATERIALIZED (
           SELECT t.src, t.dst, CAST(t.c AS DOUBLE) / CAST(o.tc AS DOUBLE) AS w
           FROM trans t JOIN tot o USING (src)),
         states AS MATERIALIZED (SELECT DISTINCT src AS state FROM tm),
         p0 AS MATERIALIZED (
           SELECT state, CASE WHEN state = 'purchase' THEN CAST(1.0 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END AS p FROM states),
         $rounds
         SELECT state, round(p, 8) AS p_reach_5 FROM p$steps"""
  }

  /** Unrolled removal-effect attribution (q274): one [[markovAbsorptionSql]]
    * -style chain per removal (none + 4 channels) over the start-rooted
    * transition grid; effects and the normalizer fold over 8-dp/6-dp
    * ROUNDED probabilities (both engines), so exp-free exactness holds.
    */
  def removalAttributionSql(steps: Int): String = {
    val channels = Seq("click", "error", "signup", "view")
    def chain(tag: String, filter: String): String = {
      val rounds = (1 to steps).map { k =>
        s"""p${tag}_$k AS MATERIALIZED (
             SELECT s.state,
               CASE WHEN s.state = 'purchase' THEN CAST(1.0 AS DOUBLE)
                    ELSE coalesce(r.reach, CAST(0.0 AS DOUBLE)) END AS p
             FROM st_$tag s LEFT JOIN (
               SELECT t.src AS state,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(t.w * q.p ORDER BY t.dst)),
                   (acc, x) -> round(acc + x, 12)) AS reach
               FROM tm_$tag t JOIN p${tag}_${k - 1} q ON t.dst = q.state
               GROUP BY t.src) r ON s.state = r.state)"""
      }.mkString(",\n         ")
      s"""tm_$tag AS MATERIALIZED (SELECT * FROM tm WHERE $filter),
         st_$tag AS MATERIALIZED (SELECT DISTINCT src AS state FROM tm_$tag),
         p${tag}_0 AS MATERIALIZED (
           SELECT state, CASE WHEN state = 'purchase' THEN CAST(1.0 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END AS p FROM st_$tag),
         $rounds,
         pb_$tag AS (SELECT round(coalesce(
             (SELECT p FROM p${tag}_$steps WHERE state = 'start'),
             CAST(0.0 AS DOUBLE)), 8) AS p)"""
    }
    val chains = chain("base", "1=1") +: channels.map(ch =>
      chain(ch, s"src <> '$ch' AND dst <> '$ch'"))
    val effRows = channels.map(ch =>
      s"""SELECT '$ch' AS channel, (SELECT p FROM pb_base) AS p_base,
         (SELECT p FROM pb_$ch) AS p_removed,
         round(1.0 - (SELECT p FROM pb_$ch) / (SELECT p FROM pb_base), 6)
           AS removal_effect""").mkString("\n         UNION ALL\n         ")
    s"""WITH ev AS MATERIALIZED (
           SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
           FROM events),
         tr AS MATERIALIZED (
           SELECT 'start' AS src, event_type AS dst FROM ev WHERE rn = 1
           UNION ALL
           SELECT event_type, nxt FROM ev WHERE nxt IS NOT NULL),
         trans AS MATERIALIZED (
           SELECT src, dst, CAST(count(*) AS BIGINT) AS c
           FROM tr GROUP BY 1, 2),
         tot AS MATERIALIZED (
           SELECT src, CAST(sum(c) AS BIGINT) AS tc FROM trans GROUP BY 1),
         tm AS MATERIALIZED (
           SELECT t.src, t.dst, CAST(t.c AS DOUBLE) / CAST(o.tc AS DOUBLE) AS w
           FROM trans t JOIN tot o USING (src)),
         ${chains.mkString(",\n         ")},
         eff AS MATERIALIZED ($effRows),
         nrm AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(removal_effect ORDER BY channel)),
             (acc, x) -> round(acc + x, 12)) AS sre FROM eff)
         SELECT channel, p_base, p_removed, removal_effect,
           round(removal_effect / sre, 6) AS attribution
         FROM eff CROSS JOIN nrm"""
  }

  val infoGainSql: String =
    s"""WITH ${igBranch("linestatus", "lineitem", "l_linestatus")},
       ${igBranch("priority",
        "lineitem JOIN orders ON l_orderkey = o_orderkey", "o_orderpriority")},
       ${igBranch("brand",
        "lineitem JOIN part ON l_partkey = p_partkey", "p_brand")}
       SELECT * FROM f_linestatus
       UNION ALL SELECT * FROM f_priority
       UNION ALL SELECT * FROM f_brand"""

  /** q329 oracle: the identical deterministic Lloyd iterations the Scala
    * side runs, unrolled as chained MATERIALIZED CTEs (the pageRankSql
    * discipline). Seeds = 4 smallest md5 unit hashes; distances are
    * dimension-ordered list folds (list_sum ≡ the engine's zip_with +
    * aggregate, the q149-proven equivalence); centroid means fold
    * vec_id-ordered; argmin ties break on cid via struct ordering.
    */
  def kmeansSql(iters: Int): String = {
    def distCte(name: String, centTable: String) =
      s"""$name AS MATERIALIZED (SELECT e.vec_id, c.cid,
           list_sum(list_transform(range(1, len(e.v)+1),
             i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
           FROM ev e CROSS JOIN $centTable c)"""
    val steps = (1 to iters).map { k =>
      s"""${distCte(s"d$k", s"c${k - 1}")},
         a$k AS MATERIALIZED (SELECT vec_id,
           (min(struct_pack(d := dist, cid := cid))).cid AS cid
           FROM d$k GROUP BY 1),
         c$k AS MATERIALIZED (SELECT cid, list(c ORDER BY dim) AS cv FROM (
           SELECT t.cid, t.i - 1 AS dim,
             list_sum(list(t.x ORDER BY t.vec_id)) / count(*) AS c
           FROM (SELECT a.vec_id, a.cid, i, e.v[i] AS x
                 FROM a$k a JOIN ev e USING (vec_id),
                 UNNEST(range(1, len(e.v)+1)) AS u(i)) t
           GROUP BY t.cid, t.i) GROUP BY cid)"""
    }.mkString(",\n         ")
    s"""WITH ev AS MATERIALIZED (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         sd AS (SELECT vec_id, v,
           CAST(CAST(concat('0x', substr(md5(concat('km_',
             CAST(vec_id AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS h
           FROM ev ORDER BY h ASC, vec_id ASC LIMIT 4),
         c0 AS MATERIALIZED (SELECT CAST(row_number()
             OVER (ORDER BY h ASC, vec_id ASC) AS BIGINT) AS cid, v AS cv
           FROM sd),
         $steps,
         ${distCte("df", s"c$iters")},
         af AS (SELECT vec_id,
           (min(struct_pack(d := dist, cid := cid))).cid AS cid,
           (min(struct_pack(d := dist, cid := cid))).d AS dist
           FROM df GROUP BY 1)
         SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
           round(list_sum(list(round(dist, 9) ORDER BY vec_id)), 4)
             AS inertia
         FROM af GROUP BY 1"""
  }
}
