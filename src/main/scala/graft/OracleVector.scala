package graft

import OracleHelpers._

/** DuckDB oracle SQL for the QueriesVector tier (cross-engine determinism
  * rules in the SparkEntry scaladoc). Moved verbatim from SparkEntry.
  */
private[graft] object OracleVector {
  def map: Map[String, String] = Map(
    "q38_embed_topk" ->
      s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings)
         SELECT vec_id, round($cosineSqlBody, 4) AS cosine_sim
         FROM e, q ORDER BY cosine_sim DESC, vec_id LIMIT 10""",
    "q88_rerank" ->
      s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
         cand AS (SELECT vec_id, $cosineSqlBody AS s1
           FROM e, q ORDER BY s1 DESC, vec_id LIMIT 50),
         rr AS (SELECT vec_id, s1,
             0.9 * s1 + 0.1 * (CAST(CAST(concat('0x', substr(md5(
               concat('0|', CAST(vec_id AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0) AS s2
           FROM cand)
         SELECT vec_id, round(s1, 4) AS cosine_sim, round(s2, 4) AS rerank_score
         FROM rr ORDER BY s2 DESC, vec_id LIMIT 10""",
    "q84_int8_ann" ->
      """WITH q0 AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         q1 AS (SELECT qv,
             list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qscale FROM q0),
         q AS (SELECT qscale, CASE WHEN qscale > 0
             THEN list_transform(qv, x -> CAST(round(x / qscale) AS BIGINT))
             ELSE list_transform(qv, x -> CAST(0 AS BIGINT)) END AS qcodes FROM q1),
         e0 AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
         e1 AS (SELECT vec_id, ev,
             list_max(list_transform(ev, x -> abs(x))) / 127.0 AS vscale FROM e0),
         e AS (SELECT vec_id, vscale, CASE WHEN vscale > 0
             THEN list_transform(ev, x -> CAST(round(x / vscale) AS BIGINT))
             ELSE list_transform(ev, x -> CAST(0 AS BIGINT)) END AS codes FROM e1),
         s AS (SELECT vec_id, vscale, qscale,
             CAST(list_sum(list_transform(range(1, len(codes)+1),
               i -> codes[i] * qcodes[i])) AS BIGINT) AS q_dot
           FROM e, q)
         SELECT vec_id, q_dot,
           round(vscale * qscale * CAST(q_dot AS DOUBLE), 4) AS approx_dot
         FROM s
         ORDER BY vscale * qscale * CAST(q_dot AS DOUBLE) DESC, vec_id LIMIT 10""",
    "q40_near_pairs_demo" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 300)
         SELECT id_a, id_b, cosine_sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
             / (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i])))
              * sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))), 4) AS cosine_sim
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         WHERE cosine_sim >= 0.35""",
    "q41_label_stats" ->
      """SELECT label, count(*) AS n, min(len(embedding)) AS min_dim,
         max(len(embedding)) AS max_dim FROM embeddings GROUP BY label""",
    "q39_lsh_ann" -> lshAnnSql,
    "q108_triangles" -> trianglesSql,
    "q67_ivf_search" -> ivfSearchSql,
    "q122_semantic_dedup" -> semanticDedupSql,
    "q147_knn_label_agreement" ->
      s"""WITH ${bucketedPairCtes(4, 0.3)},
         sym AS (SELECT id_a AS v, id_b AS nb, cos FROM pairs
                 UNION ALL SELECT id_b AS v, id_a AS nb, cos FROM pairs),
         nn AS (SELECT v, struct_extract(min({'nc': -cos, 'nb': nb}), 'nb') AS nb
                FROM sym GROUP BY v),
         nnl AS (SELECT a.label AS label, b.label AS nb_label
                 FROM nn JOIN embeddings a ON a.vec_id = nn.v
                         JOIN embeddings b ON b.vec_id = nn.nb),
         agg AS (SELECT label, CAST(count(*) AS BIGINT) AS n_matched,
                   CAST(sum(CASE WHEN label = nb_label THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_agree
                 FROM nnl GROUP BY label),
         tot AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors
                 FROM embeddings GROUP BY label)
         SELECT t.label, n_vectors,
           coalesce(n_matched, 0) AS n_matched,
           coalesce(n_agree, 0) AS n_agree,
           CASE WHEN coalesce(n_matched, 0) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE round(CAST(n_agree AS DOUBLE) / n_matched, 6)
           END AS agree_rate
         FROM tot t LEFT JOIN agg USING (label)""",
    "q148_hard_negatives" ->
      s"""WITH ${bucketedPairCtes(4, 0.3)},
         sym AS (SELECT id_a AS v, id_b AS nb, cos FROM pairs
                 UNION ALL SELECT id_b AS v, id_a AS nb, cos FROM pairs),
         crossp AS (SELECT v, nb, a.label AS label, b.label AS nb_label, cos
                 FROM sym JOIN embeddings a ON a.vec_id = sym.v
                          JOIN embeddings b ON b.vec_id = sym.nb
                 WHERE a.label <> b.label),
         rk AS (SELECT v, nb, label, nb_label, cos,
                  row_number() OVER (PARTITION BY v
                    ORDER BY cos DESC, nb) AS rn
                FROM crossp)
         SELECT v, nb, label, nb_label, round(cos, 6) AS cos
         FROM rk WHERE rn <= 2""",
    "q149_label_centroids" ->
      """WITH ev AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         ei AS (SELECT vec_id, label, v,
             unnest(range(1, len(v)+1)) AS i FROM ev),
         ed AS (SELECT vec_id, label, i - 1 AS dim, v[i] AS x FROM ei),
         cent AS (SELECT label, dim,
             list_sum(list(x ORDER BY vec_id)) / count(*) AS c
           FROM ed GROUP BY label, dim),
         cv AS (SELECT label, list(c ORDER BY dim) AS cv
                FROM cent GROUP BY label)
         SELECT a.label AS label_a, b.label AS label_b,
           round(list_sum(list_transform(range(1, len(a.cv)+1),
               i -> a.cv[i]*b.cv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(a.cv)+1),
                 i -> a.cv[i]*a.cv[i])))
                * sqrt(list_sum(list_transform(range(1, len(b.cv)+1),
                 i -> b.cv[i]*b.cv[i])))), 6) AS centroid_cos
         FROM cv a JOIN cv b ON a.label < b.label""",
    "q159_gram_matrix" ->
      """WITH flat AS (
           SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i))
         SELECT a.i AS i, b.i AS j, round(sum(a.x * b.x), 4) AS gram
         FROM flat a JOIN flat b USING (vec_id) WHERE a.i <= b.i
         GROUP BY 1, 2""",
    "q161_pca_power" -> pcaPowerSql(d = 64, iters = 10),
    "q163_pagerank" -> pageRankSql(iters = 10),
    "q169_label_propagation" -> labelPropagationSql(rounds = 5),
    "q171_triangle_count" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_suppkey AS a, b.l_suppkey AS b
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 5),
         deg AS MATERIALIZED (
           SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
             SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
         o AS MATERIALIZED (
           SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
             CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v,
             CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dv
           FROM (SELECT e.a, e.b, x.deg AS da, y.deg AS db
             FROM e JOIN deg x ON e.a = x.node JOIN deg y ON e.b = y.node)),
         tri AS MATERIALIZED (
           SELECT w.u, w.v1, w.v2 FROM (
             SELECT e1.u, e1.v AS v1, e2.v AS v2
             FROM o e1 JOIN o e2 ON e1.u = e2.u
               AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))) w
           JOIN o c ON c.u = w.v1 AND c.v = w.v2),
         cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
           SELECT u AS node FROM tri UNION ALL SELECT v1 FROM tri
           UNION ALL SELECT v2 FROM tri) GROUP BY 1)
         SELECT s.s_suppkey, coalesce(d.deg, 0) AS degree,
           coalesce(c.t, 0) AS n_triangles,
           CASE WHEN coalesce(d.deg, 0) >= 2
             THEN round(CAST(2 * coalesce(c.t, 0) AS DOUBLE)
               / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6)
             ELSE 0.0 END AS clustering_coef
         FROM supplier s
         LEFT JOIN deg d ON s.s_suppkey = d.node
         LEFT JOIN cnt c ON s.s_suppkey = c.node""",
    "q174_rrf_fusion" ->
      s"""WITH toks AS (SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
           FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         comp AS (SELECT t.doc_id, t.term,
             round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
               (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS comp
           FROM tf t JOIN df USING (term) JOIN dl USING (doc_id)
           CROSS JOIN stats),
         bm AS (SELECT doc_id,
             round(list_sum(list(comp ORDER BY term)), 4) AS bm25
           FROM comp GROUP BY doc_id),
         lex AS (SELECT doc_id, bm25 FROM bm
           ORDER BY bm25 DESC, doc_id LIMIT 50),
         lexr AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS r_lex
           FROM lex),
         q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
           FROM embeddings),
         sem AS (SELECT vec_id AS doc_id, $cosineSqlBody AS cos
           FROM e, q ORDER BY cos DESC, doc_id LIMIT 50),
         semr AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
               AS r_sem
           FROM sem),
         f AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             l.r_lex, s.r_sem,
             coalesce(CAST(1.0 AS DOUBLE) / (60 + l.r_lex),
               CAST(0.0 AS DOUBLE)) +
             coalesce(CAST(1.0 AS DOUBLE) / (60 + s.r_sem),
               CAST(0.0 AS DOUBLE)) AS rrf0
           FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
         SELECT doc_id, round(rrf0, 8) AS rrf, r_lex, r_sem
         FROM f ORDER BY rrf DESC, doc_id LIMIT 20""",
    "q179_link_prediction" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_suppkey AS sa, b.l_suppkey AS sb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 20),
         und AS MATERIALIZED (
           SELECT sa, sb FROM e UNION ALL SELECT sb, sa FROM e),
         deg AS (SELECT sa AS node, CAST(count(*) AS BIGINT) AS deg
           FROM und GROUP BY 1),
         compz AS (SELECT node AS z,
             round(CAST(1.0 AS DOUBLE) / ln(CAST(deg AS DOUBLE)), 6) AS comp
           FROM deg WHERE deg >= 2),
         w AS (SELECT e1.sa AS u, e1.sb AS z, e2.sb AS v
           FROM und e1 JOIN und e2 ON e1.sb = e2.sa AND e1.sa < e2.sb),
         cand AS (SELECT u, z, v FROM w
           ANTI JOIN e ON w.u = e.sa AND w.v = e.sb)
         SELECT u AS s_a, v AS s_b, CAST(count(*) AS BIGINT) AS cn,
           round(list_sum(list(c.comp ORDER BY c.z)), 4) AS adamic_adar
         FROM cand JOIN compz c USING (z)
         GROUP BY u, v
         ORDER BY adamic_adar DESC, s_a, s_b LIMIT 20""",
    "q183_retrieval_eval" ->
      s"""WITH q8 AS (SELECT vec_id AS qid, label AS qlabel,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < 8),
         e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
           FROM embeddings),
         sc AS (SELECT q8.qid, q8.qlabel, e.vec_id, e.label,
             $cosineSqlBody AS cos
           FROM e CROSS JOIN q8),
         top AS (SELECT * FROM (
             SELECT qid, qlabel, vec_id, label, cos,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
             FROM sc) WHERE rank <= 10),
         comp AS (SELECT qid, qlabel, rank,
             CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
             round(CAST(CASE WHEN label = qlabel THEN 1 ELSE 0 END AS DOUBLE)
               / log2(CAST(rank AS DOUBLE) + 1.0), 6) AS comp
           FROM top),
         ag AS (SELECT qid, qlabel, CAST(sum(rel) AS BIGINT) AS n_rel_top10,
             list_sum(list(comp ORDER BY rank)) AS dcg,
             min(CASE WHEN rel = 1 THEN rank END) AS first_rel
           FROM comp GROUP BY 1, 2),
         nl AS (SELECT label AS qlabel, CAST(count(*) AS BIGINT) AS n_label
           FROM embeddings GROUP BY 1),
         fin AS (SELECT ag.qid, ag.n_rel_top10, ag.dcg, ag.first_rel,
             least(10, nl.n_label) AS m
           FROM ag JOIN nl USING (qlabel))
         SELECT qid, n_rel_top10,
           round(dcg / list_sum(list_transform(range(1, m + 1),
             i -> round(CAST(1.0 AS DOUBLE)
               / log2(CAST(i AS DOUBLE) + 1.0), 6))), 6) AS ndcg10,
           coalesce(round(CAST(1.0 AS DOUBLE) / CAST(first_rel AS DOUBLE), 6),
             CAST(0.0 AS DOUBLE)) AS mrr
         FROM fin""",
    "q184_sssp" -> ssspSql(rounds = 6),
    "q193_minhash_accuracy" -> minhashAccuracySql,
    "q196_lsh_pr_curve" -> lshPrCurveSql,
    "q74_media_features" ->
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         CAST(4 AS INTEGER) AS n_features
         FROM documents""",
    // PQ/ADC replica: deterministic rank-order codebooks, the same
    // -2·dot+|c|² scoring with ordered list_sum folds, ADC totals summed
    // in subspace order (list(... ORDER BY m) -> list_sum), exact rerank.
    "q82_pq_adc" ->
      """WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         samp AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v
           FROM ev WHERE vec_id < 16),
         ms AS (SELECT unnest(range(0, 8)) AS m),
         cwn AS (SELECT s.k, ms.m, s.v[ms.m*8+1 : ms.m*8+8] AS c,
             list_sum(list_transform(range(1, 9),
               i -> s.v[ms.m*8+i]*s.v[ms.m*8+i])) AS nsq
           FROM samp s CROSS JOIN ms),
         enc AS (SELECT vec_id, m, k AS code FROM (
             SELECT e.vec_id, cn.m, cn.k,
               row_number() OVER (PARTITION BY e.vec_id, cn.m ORDER BY
                 -2 * list_sum(list_transform(range(1, 9),
                   i -> e.v[cn.m*8+i]*cn.c[i])) + cn.nsq, cn.k) AS rn
             FROM ev e CROSS JOIN cwn cn) WHERE rn = 1),
         q AS (SELECT v AS qv FROM (
             SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
             FROM ev WHERE vec_id < 16) WHERE rn = 1),
         lut AS (SELECT cn.m, cn.k,
             -2 * list_sum(list_transform(range(1, 9),
               i -> q.qv[cn.m*8+i]*cn.c[i])) + cn.nsq AS lv
           FROM cwn cn, q),
         adc AS (SELECT vec_id, list_sum(lvs) AS adc_score FROM (
             SELECT en.vec_id, list(l.lv ORDER BY en.m) AS lvs
             FROM enc en JOIN lut l ON l.m = en.m AND l.k = en.code
             GROUP BY en.vec_id)),
         cand AS (SELECT vec_id FROM (
             SELECT vec_id, row_number() OVER (ORDER BY adc_score, vec_id) AS rn
             FROM adc) WHERE rn <= 50),
         rer AS (SELECT e.vec_id,
             list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*q.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i])))
              * sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*q.qv[i])))) AS cos
           FROM ev e JOIN cand USING (vec_id), q)
         SELECT vec_id, round(cos, 4) AS cosine_sim FROM rer
         ORDER BY cos DESC, vec_id LIMIT 10""",
    // Image round-trip: the decode must recover the encoded gray exactly,
    // so the oracle predicts it arithmetically.
    "q81_image_decode" ->
      """SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
         CAST(p_partkey * 10 % 256 AS INT) AS gray_decoded
         FROM part WHERE p_partkey < 24""",
    "q95_video_frames" ->
      """WITH v AS (SELECT CAST(p_partkey AS BIGINT) AS media_id,
             CAST(p_partkey % 4 + 2 AS INT) AS n_frames
           FROM part WHERE p_partkey < 24),
         f AS (SELECT media_id, n_frames,
             CAST(unnest(generate_series(0, n_frames - 1, 2)) AS INT) AS frame_idx
           FROM v)
         SELECT media_id, frame_idx, n_frames,
                CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
                CAST((media_id * 10 + frame_idx * 40) % 256 AS INT) AS gray_decoded
         FROM f""",
    "q91_audio_decode" ->
      """SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(8000 AS INT) AS sample_rate,
         CAST(50 + p_partkey % 10 AS BIGINT) AS n_samples,
         CAST(p_partkey * 7 % 120 + 1 AS DOUBLE) / 128.0 AS rms,
         CAST(49 + p_partkey % 10 AS BIGINT) AS zero_crossings
         FROM part WHERE p_partkey < 24""",

    // Pure-arithmetic replay of the decode→aHash→band→verify chain: the
    // gradient pixel formula gives the bits (p·64 > total, gray factor
    // cancels), halves rebuilt with integer shifts, same band union.
    "q215_phash_neardup" ->
      """WITH ids AS (SELECT CAST(p_partkey AS BIGINT) AS id
           FROM part WHERE p_partkey < 48),
         grid AS (SELECT x.x, y.y
           FROM (SELECT unnest(generate_series(0, 7)) AS x) x,
                (SELECT unnest(generate_series(0, 7)) AS y) y),
         px AS (SELECT id, (y * 8 + x) AS i,
             (id * 7 + x * 3 + y * 5) % 256 AS p
           FROM ids, grid),
         s AS (SELECT id, sum(p) AS tot FROM px GROUP BY 1),
         h AS (SELECT px.id,
             CAST(sum(CASE WHEN i < 32 AND p * 64 > tot
               THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS h_lo,
             CAST(sum(CASE WHEN i >= 32 AND p * 64 > tot
               THEN 1::BIGINT << (i - 32) ELSE 0 END) AS BIGINT) AS h_hi
           FROM px JOIN s USING (id) GROUP BY 1),
         cand AS (
           SELECT a.id AS id_a, b.id AS id_b,
             CAST(bit_count(xor(a.h_hi, b.h_hi)) +
                  bit_count(xor(a.h_lo, b.h_lo)) AS INTEGER) AS hamming
           FROM h a JOIN h b
             ON a.id < b.id AND (a.h_hi = b.h_hi OR a.h_lo = b.h_lo))
         SELECT DISTINCT id_a, id_b, hamming FROM cand WHERE hamming <= 12""",

    // q437: the engine decodes the synthetic WAV and counts real sign
    // changes per frame; the oracle replays each frame's crossing count
    // in closed form — a crossing sits at sample i iff p | (i + phase),
    // so the count over frame f's span [max(1, 16f), 16f+15] is one
    // integer floor difference. Amplitude never appears: the fingerprint
    // is sign-only, which is exactly why the (2k, 2k+1) amplitude twins
    // collide. Bands and the L1 verify bit-unpack with the same shifts
    // as the Spark side.
    "q437_audio_fp_neardup" ->
      """WITH ids AS (SELECT CAST(p_partkey AS BIGINT) AS id
           FROM part WHERE p_partkey < 48),
         par AS (SELECT id, 1 + (id // 2) % 7 AS p, id % 3 AS ph FROM ids),
         fr AS (SELECT id, f,
             (16 * f + 15 + ph) // p
               - ((CASE WHEN f = 0 THEN 0 ELSE 16 * f - 1 END) + ph) // p AS c
           FROM par, (SELECT unnest(generate_series(0, 7)) AS f) t),
         fp AS (SELECT id,
             CAST(sum(c * (1::BIGINT << CAST(8 * f AS INT))) AS BIGINT) AS fp
           FROM fr GROUP BY 1),
         hv AS (SELECT id, fp, fp >> 32 AS fp_hi,
             fp & 4294967295 AS fp_lo FROM fp),
         cand AS (
           SELECT a.id AS id_a, b.id AS id_b, a.fp AS fa, b.fp AS fb
           FROM hv a JOIN hv b
             ON a.id < b.id AND (a.fp_hi = b.fp_hi OR a.fp_lo = b.fp_lo)),
         l1 AS (SELECT id_a, id_b,
             CAST(sum(abs(((fa >> CAST(8 * f AS INT)) & 255)
               - ((fb >> CAST(8 * f AS INT)) & 255))) AS BIGINT) AS l1
           FROM cand, (SELECT unnest(generate_series(0, 7)) AS f) t
           GROUP BY 1, 2)
         SELECT id_a, id_b, l1 FROM l1 WHERE l1 <= 2""",

    // Exact replay of KCore.peel(k=4, rounds=4): each sweep is one
    // unrolled MATERIALIZED CTE pair (degrees -> surviving edges).
    "q450_modularity" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         lab AS MATERIALIZED (SELECT e.pa, e.pb,
             x.p_brand AS ba, y.p_brand AS bb
           FROM e JOIN part x ON e.pa = x.p_partkey
           JOIN part y ON e.pb = y.p_partkey),
         m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
         intra AS (SELECT ba AS brand, CAST(count(*) AS BIGINT) AS mc
           FROM lab WHERE ba = bb GROUP BY 1),
         degs AS (SELECT brand, CAST(count(*) AS BIGINT) AS dc FROM (
             SELECT ba AS brand FROM lab
             UNION ALL SELECT bb FROM lab) GROUP BY 1),
         per AS (SELECT degs.brand, dc, coalesce(mc, 0) AS mc, m,
             CAST(coalesce(mc, 0) AS DOUBLE) / CAST(m AS DOUBLE)
               - (CAST(dc AS DOUBLE)
                   / (CAST(2.0 AS DOUBLE) * CAST(m AS DOUBLE)))
                 * (CAST(dc AS DOUBLE)
                   / (CAST(2.0 AS DOUBLE) * CAST(m AS DOUBLE))) AS term
           FROM degs LEFT JOIN intra ON degs.brand = intra.brand
           CROSS JOIN m)
         SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(max(m) AS BIGINT) AS n_edges,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(term ORDER BY brand)), (p, q) -> p + q), 6) AS modularity
         FROM per""",

    "q451_assortativity" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         lab AS (SELECT da.deg AS ja, db.deg AS jb
           FROM e JOIN deg da ON e.pa = da.node
           JOIN deg db ON e.pb = db.node),
         ends AS (SELECT ja AS j, jb AS k FROM lab
           UNION ALL SELECT jb, ja FROM lab),
         sums AS (SELECT CAST(count(*) AS BIGINT) AS m2,
             sum(j * k) AS sjk, sum(j) AS sj, sum(j * j) AS sjj
           FROM ends)
         SELECT m2 AS n_edge_ends,
           round(CASE WHEN CAST(sjj AS DOUBLE) / CAST(m2 AS DOUBLE)
               - (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE))
                 * (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE)) > 0
             THEN (CAST(sjk AS DOUBLE) / CAST(m2 AS DOUBLE)
               - (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE))
                 * (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE)))
               / (CAST(sjj AS DOUBLE) / CAST(m2 AS DOUBLE)
                 - (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE))
                   * (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE))) END, 6)
             AS assortativity
         FROM sums""",

    "q452_rich_club" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
           GROUP BY 1),
         ks AS (SELECT CAST(k AS BIGINT) AS k
           FROM (VALUES (4), (8), (16), (32)) v(k)),
         lab AS (SELECT da.deg AS ja, db.deg AS jb
           FROM e JOIN deg da ON e.pa = da.node
           JOIN deg db ON e.pb = db.node),
         ek AS (SELECT k, CAST(count(*) AS BIGINT) AS ek
           FROM lab JOIN ks ON ja > k AND jb > k GROUP BY 1),
         nk AS (SELECT k, CAST(count(*) AS BIGINT) AS nk
           FROM deg JOIN ks ON deg > k GROUP BY 1)
         SELECT ks.k, coalesce(nk.nk, 0) AS n_club,
           coalesce(ek.ek, 0) AS club_edges,
           round(CASE WHEN coalesce(nk.nk, 0) > 1
             THEN CAST(2.0 AS DOUBLE) * CAST(coalesce(ek.ek, 0) AS DOUBLE)
               / CAST(nk.nk * (nk.nk - 1) AS DOUBLE) END, 6) AS phi
         FROM ks LEFT JOIN nk ON ks.k = nk.k LEFT JOIN ek ON ks.k = ek.k""",

    "q211_kcore" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         k1 AS MATERIALIZED (SELECT node FROM (
             SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)
           GROUP BY node HAVING count(*) >= 4),
         e1 AS MATERIALIZED (SELECT src, dst FROM e0
           WHERE src IN (SELECT node FROM k1) AND dst IN (SELECT node FROM k1)),
         k2 AS MATERIALIZED (SELECT node FROM (
             SELECT src AS node FROM e1 UNION ALL SELECT dst FROM e1)
           GROUP BY node HAVING count(*) >= 4),
         e2 AS MATERIALIZED (SELECT src, dst FROM e1
           WHERE src IN (SELECT node FROM k2) AND dst IN (SELECT node FROM k2)),
         k3 AS MATERIALIZED (SELECT node FROM (
             SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)
           GROUP BY node HAVING count(*) >= 4),
         e3 AS MATERIALIZED (SELECT src, dst FROM e2
           WHERE src IN (SELECT node FROM k3) AND dst IN (SELECT node FROM k3)),
         k4 AS MATERIALIZED (SELECT node FROM (
             SELECT src AS node FROM e3 UNION ALL SELECT dst FROM e3)
           GROUP BY node HAVING count(*) >= 4),
         e4 AS MATERIALIZED (SELECT src, dst FROM e3
           WHERE src IN (SELECT node FROM k4) AND dst IN (SELECT node FROM k4))
         SELECT node AS p_partkey, CAST(count(*) AS BIGINT) AS core_degree
         FROM (SELECT src AS node FROM e4 UNION ALL SELECT dst FROM e4)
         GROUP BY node""",
    "q225_item_cf_topk" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
           FROM lineitem),
         ci AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY 1),
         co AS (SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS cij
           FROM li x JOIN li y ON x.ok = y.ok AND x.item <> y.item
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sc AS (SELECT a, b, cij,
             round(CAST(cij AS DOUBLE)
               / sqrt(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS cosine
           FROM co JOIN ci ca ON ca.item = co.a JOIN ci cb ON cb.item = co.b),
         r AS (SELECT a, b, cij, cosine,
             row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rn
           FROM sc)
         SELECT a, b, cij, cosine FROM r WHERE rn <= 3""",
    "q234_jl_projection" -> {
      // The SAME deterministic sign matrix as the Spark side, embedded
      // as inline list literals (QueryDsl.jlSigns is the single source).
      def sgn(k: Int): String =
        QueryDsl.jlSigns.map(r => r(k)).mkString("[", ", ", "]")
      val projCols = (0 until 8).map(k =>
        s"list_sum(list_transform(range(1, 65), i -> v[i] * (${sgn(k)})[i]))" +
          s" / sqrt(8.0) AS p$k").mkString(",\n             ")
      val dp2 = (0 until 8)
        .map(k => s"(a.p$k - b.p$k) * (a.p$k - b.p$k)").mkString(" + ")
      s"""WITH e AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 100),
         p AS (SELECT vec_id, v,
             $projCols
           FROM e),
         pr AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
             list_sum(list_transform(range(1, 65),
               i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS do2,
             $dp2 AS dp2
           FROM p a JOIN p b ON a.vec_id < b.vec_id),
         d AS (SELECT ai, bi, sqrt(dp2) / sqrt(do2) AS dist
           FROM pr WHERE do2 > 0.0)
         SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(list_sum(list(dist ORDER BY ai, bi))
             / CAST(count(*) AS DOUBLE), 6) AS mean_distortion,
           round(min(dist), 6) AS min_distortion,
           round(max(dist), 6) AS max_distortion
         FROM d"""
    },
    "q243_hits" -> {
      // 5 unrolled HITS iterations, max-normalized half-steps — same
      // MATERIALIZED/unroll discipline as pageRankSql.
      val steps = (1 to 5).map { k =>
        s"""ar$k AS MATERIALIZED (
             SELECT v.node, coalesce(s.s, CAST(0.0 AS DOUBLE)) AS a
             FROM v LEFT JOIN (
               SELECT e.dst AS node, sum(h.h) AS s
               FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY e.dst) s
               USING (node)),
           a$k AS MATERIALIZED (
             SELECT node, a / (SELECT max(a) FROM ar$k) AS a FROM ar$k),
           hr$k AS MATERIALIZED (
             SELECT v.node, coalesce(s.s, CAST(0.0 AS DOUBLE)) AS h
             FROM v LEFT JOIN (
               SELECT e.src AS node, sum(a.a) AS s
               FROM e JOIN a$k a ON e.dst = a.node GROUP BY e.src) s
               USING (node)),
           h$k AS MATERIALIZED (
             SELECT node, h / (SELECT max(h) FROM hr$k) AS h FROM hr$k)"""
      }.mkString(",\n         ")
      s"""WITH e AS MATERIALIZED (
           SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         v AS MATERIALIZED (SELECT src AS node FROM e
           UNION SELECT dst FROM e),
         h0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM v),
         $steps
         SELECT h.node, round(h.h, 8) AS hub, round(a.a, 8) AS authority
         FROM h5 h JOIN a5 a USING (node)"""
    },
    "q248_assortativity" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS sa, b.l_partkey AS sb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         d2 AS (SELECT sa, sb FROM e UNION ALL SELECT sb, sa FROM e),
         deg AS (SELECT sa AS node, CAST(count(*) AS BIGINT) AS d
           FROM d2 GROUP BY 1),
         samp AS (SELECT da.d AS x, db.d AS y FROM d2
           JOIN deg da ON d2.sa = da.node JOIN deg db ON d2.sb = db.node),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy,
             CAST(sum(x*x) AS BIGINT) AS sx2,
             CAST(sum(y*y) AS BIGINT) AS sy2
           FROM samp)
         SELECT n // 2 AS n_edges,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS assortativity
         FROM m""",
    "q249_rich_club" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS sa, b.l_partkey AS sb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
           (SELECT sa AS node FROM e UNION ALL SELECT sb FROM e)
           GROUP BY 1),
         ks AS (SELECT CAST(unnest([2, 4, 8]) AS BIGINT) AS k),
         nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich
           FROM ks CROSS JOIN deg WHERE d > k GROUP BY 1),
         ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_rich
           FROM ks CROSS JOIN (SELECT da.d AS da, db.d AS db FROM e
             JOIN deg da ON e.sa = da.node JOIN deg db ON e.sb = db.node) t
           WHERE da > k AND db > k GROUP BY 1)
         SELECT ks.k, CAST(coalesce(nk.n_rich, 0) AS BIGINT) AS n_rich,
           CAST(coalesce(ek.e_rich, 0) AS BIGINT) AS e_rich,
           CASE WHEN coalesce(nk.n_rich, 0) >= 2 THEN
             round(CAST(2 * coalesce(ek.e_rich, 0) AS DOUBLE)
               / CAST(nk.n_rich * (nk.n_rich - 1) AS DOUBLE), 6) END AS phi
         FROM ks LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)""",
    "q250_modularity" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS sa, b.l_partkey AS sb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         com AS (SELECT p_partkey AS node, p_brand AS community FROM part),
         wc AS MATERIALIZED (SELECT ca.community AS ca, cb.community AS cb
           FROM e JOIN com ca ON e.sa = ca.node
             JOIN com cb ON e.sb = cb.node),
         mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM wc),
         ein AS (SELECT ca AS community, CAST(count(*) AS BIGINT) AS e_in
           FROM wc WHERE ca = cb GROUP BY 1),
         ds AS (SELECT community, CAST(count(*) AS BIGINT) AS d_sum FROM
           (SELECT ca AS community FROM wc UNION ALL SELECT cb FROM wc)
           GROUP BY 1)
         SELECT ds.community, CAST(coalesce(e_in, 0) AS BIGINT) AS e_in,
           d_sum,
           round(CAST(coalesce(e_in, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
             - (CAST(d_sum AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE)))
             * (CAST(d_sum AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE))), 6)
             AS q_contrib
         FROM ds LEFT JOIN ein USING (community) CROSS JOIN mm""",
    "q251_eccentricity" -> {
      val steps = (1 to 6).map { k =>
        s"""d$k AS MATERIALIZED (
             SELECT probe, node, min(cand) AS dist FROM (
               SELECT probe, node, dist AS cand FROM d${k - 1}
               UNION ALL
               SELECT r.probe, u.sb AS node, r.dist + u.w AS cand
               FROM und u JOIN d${k - 1} r ON u.sa = r.node)
             GROUP BY 1, 2)"""
      }.mkString(",\n         ")
      s"""WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS sa, b.l_partkey AS sb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         und AS MATERIALIZED (
           SELECT sa, sb, CAST(1.0 AS DOUBLE) AS w FROM e
           UNION ALL SELECT sb, sa, CAST(1.0 AS DOUBLE) FROM e),
         d0 AS (SELECT p_partkey AS probe, p_partkey AS node,
             CAST(0.0 AS DOUBLE) AS dist
           FROM part WHERE p_partkey BETWEEN 1 AND 3),
         $steps
         SELECT probe, CAST(max(dist) AS BIGINT) AS ecc,
           CAST(count(*) AS BIGINT) AS n_reached
         FROM d6 GROUP BY 1"""
    },

    "q279_image_quality" ->
      """WITH ids AS (SELECT CAST(p_partkey AS BIGINT) AS id
           FROM part WHERE p_partkey < 48),
         grid AS (SELECT x.x, y.y
           FROM (SELECT unnest(generate_series(0, 7)) AS x) x,
                (SELECT unnest(generate_series(0, 7)) AS y) y),
         px AS (SELECT id, x, y,
             3 * (CASE WHEN id % 5 = 0 THEN id * 10 % 256
                  ELSE (id * 7 + x * 3 + y * 5) % 256 END) AS p
           FROM ids, grid),
         st AS (SELECT id, CAST(count(*) AS BIGINT) AS n_px,
             CAST(sum(p) AS BIGINT) AS s, CAST(sum(p * p) AS BIGINT) AS s2
           FROM px GROUP BY 1),
         tvh AS (SELECT a.id, CAST(sum(abs(b.p - a.p)) AS BIGINT) AS tvx
           FROM px a JOIN px b ON a.id = b.id AND b.y = a.y AND b.x = a.x + 1
           GROUP BY 1),
         tvv AS (SELECT a.id, CAST(sum(abs(b.p - a.p)) AS BIGINT) AS tvy
           FROM px a JOIN px b ON a.id = b.id AND b.x = a.x AND b.y = a.y + 1
           GROUP BY 1)
         SELECT st.id AS media_id, n_px,
           round(CAST(s AS DOUBLE) / CAST(n_px AS DOUBLE), 6) AS mean_lum,
           round(CAST(s2 AS DOUBLE) / CAST(n_px AS DOUBLE)
             - (CAST(s AS DOUBLE) / CAST(n_px AS DOUBLE))
               * (CAST(s AS DOUBLE) / CAST(n_px AS DOUBLE)), 6) AS var_lum,
           CAST(tvx + tvy AS BIGINT) AS tv,
           (tvx + tvy) = 0 AS is_flat
         FROM st JOIN tvh ON st.id = tvh.id JOIN tvv ON st.id = tvv.id""",

    "q263_gini_stump" ->
      """WITH grid AS (SELECT CAST(th AS BIGINT) AS threshold
           FROM range(1000, 1901, 50) t(th)),
         p AS (SELECT CAST(p_retailprice AS DECIMAL(18,2)) AS price,
             p_size >= 26 AS y FROM part),
         g AS (SELECT threshold,
             CAST(sum(CASE WHEN price <= CAST(threshold AS DECIMAL(18,2))
               THEN 1 ELSE 0 END) AS BIGINT) AS nl,
             CAST(sum(CASE WHEN price <= CAST(threshold AS DECIMAL(18,2)) AND y
               THEN 1 ELSE 0 END) AS BIGINT) AS pl,
             CAST(sum(CASE WHEN price > CAST(threshold AS DECIMAL(18,2))
               THEN 1 ELSE 0 END) AS BIGINT) AS nr,
             CAST(sum(CASE WHEN price > CAST(threshold AS DECIMAL(18,2)) AND y
               THEN 1 ELSE 0 END) AS BIGINT) AS pr
           FROM p CROSS JOIN grid GROUP BY 1),
         sc AS (SELECT threshold, nl AS n_left, nr AS n_right,
             round((CASE WHEN nl > 0 THEN
                 (CAST(nl AS DOUBLE) / (CAST(nl AS DOUBLE) + CAST(nr AS DOUBLE)))
                 * (2.0 * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                    * (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
               ELSE 0.0 END)
             + (CASE WHEN nr > 0 THEN
                 (CAST(nr AS DOUBLE) / (CAST(nl AS DOUBLE) + CAST(nr AS DOUBLE)))
                 * (2.0 * (CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))
                    * (1.0 - CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE)))
               ELSE 0.0 END), 6) AS gini
           FROM g),
         b AS (SELECT min(gini) AS gmin FROM sc)
         SELECT threshold, n_left, n_right, gini, gini = gmin AS is_best
         FROM sc CROSS JOIN b""",

    "q329_kmeans_lloyd" -> kmeansSql(iters = 3),

    "q330_silhouette" ->
      """WITH ev AS MATERIALIZED (SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
         ei AS (SELECT vec_id, label, v,
           unnest(range(1, len(v)+1)) AS i FROM ev),
         ed AS (SELECT vec_id, label, i - 1 AS dim, v[i] AS x FROM ei),
         cent AS (SELECT label, dim,
             list_sum(list(x ORDER BY vec_id)) / count(*) AS c
           FROM ed GROUP BY 1, 2),
         cv AS MATERIALIZED (SELECT label AS clabel,
             list(c ORDER BY dim) AS cv
           FROM cent GROUP BY 1),
         dists AS MATERIALIZED (SELECT e.vec_id, e.label, c.clabel,
             sqrt(list_sum(list_transform(range(1, len(e.v)+1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))) AS dist
           FROM ev e CROSS JOIN cv c),
         ad AS (SELECT vec_id, label, dist AS a FROM dists
           WHERE label = clabel),
         bd AS (SELECT vec_id, min(dist) AS b FROM dists
           WHERE label <> clabel GROUP BY 1),
         sil AS (SELECT ad.vec_id, ad.label,
             (b - a) / greatest(a, b) AS sil
           FROM ad JOIN bd ON ad.vec_id = bd.vec_id)
         SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(list_sum(list(round(sil, 9) ORDER BY vec_id))
             / CAST(count(*) AS DOUBLE), 6) AS mean_silhouette
         FROM sil GROUP BY 1""",

    "q371_edge_truss_support" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         edges AS MATERIALIZED (
           SELECT a.l_suppkey AS sa, b.l_suppkey AS sb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 5),
         sym AS (SELECT sa AS id, sb AS nb FROM edges
                 UNION ALL SELECT sb, sa FROM edges),
         sup AS (SELECT e.sa, e.sb, CAST(count(*) AS BIGINT) AS support
           FROM edges e
           JOIN sym x ON x.id = e.sa
           JOIN sym y ON y.id = e.sb AND y.nb = x.nb
           GROUP BY 1, 2)
         SELECT e.sa, e.sb,
           CAST(coalesce(s.support, 0) AS BIGINT) AS support,
           coalesce(s.support, 0) >= 2 AS in_4truss
         FROM edges e LEFT JOIN sup s ON e.sa = s.sa AND e.sb = s.sb""",

    "q372_ppr_seeded" -> OracleHelpers.pprSql(iters = 10),

    "q383_matryoshka_recall" -> {
      val dims = Seq(64, 32, 16, 8)
      val blocks = dims.map { d =>
        s"""e$d AS (SELECT vec_id, fv[1:$d] AS ev FROM e),
           q$d AS (SELECT fq[1:$d] AS qv FROM q),
           t$d AS (SELECT vec_id FROM (
             SELECT vec_id, round($cosineSqlBody, 4) AS cs
             FROM e$d, q$d ORDER BY cs DESC, vec_id LIMIT 10)),
           r$d AS (SELECT CAST($d AS INT) AS dim,
               CAST(count(*) AS BIGINT) AS n_overlap
             FROM t$d WHERE vec_id IN (SELECT vec_id FROM t64))"""
      }.mkString(",\n         ")
      val union = dims.map(d => s"SELECT * FROM r$d").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fv
           FROM embeddings WHERE vec_id <> 0),
         q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fq
           FROM embeddings WHERE vec_id = 0),
         $blocks
         SELECT dim, n_overlap,
           round(CAST(n_overlap AS DOUBLE) / 10.0, 2) AS recall_at_10
         FROM ($union)"""
    },

    "q407_sign_quant_recall" ->
      s"""WITH q AS (SELECT
           list_transform(embedding, x ->
             CASE WHEN CAST(x AS DOUBLE) > 0.0 THEN 1 ELSE 0 END) AS qb,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id,
             list_transform(embedding, x ->
               CASE WHEN CAST(x AS DOUBLE) > 0.0 THEN 1 ELSE 0 END) AS eb,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
           FROM embeddings WHERE vec_id <> 0),
         st AS (SELECT vec_id, ham FROM (
           SELECT vec_id,
             CAST(list_sum(list_transform(range(1, len(eb)+1),
               i -> abs(eb[i] - qb[i]))) AS BIGINT) AS ham
           FROM e, q ORDER BY ham ASC, vec_id LIMIT 10)),
         et AS (SELECT vec_id FROM (
           SELECT vec_id, round($cosineSqlBody, 4) AS cs
           FROM e, q ORDER BY cs DESC, vec_id LIMIT 10)),
         ov AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap
           FROM st WHERE vec_id IN (SELECT vec_id FROM et))
         SELECT n_overlap,
           round(CAST(n_overlap AS DOUBLE) / 10.0, 2) AS recall_at_10,
           (SELECT CAST(max(ham) AS BIGINT) FROM st) AS max_ham
         FROM ov""",

    "q408_calinski_harabasz" ->
      """WITH ev AS MATERIALIZED (SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
         ei AS (SELECT vec_id, label, v,
           unnest(range(1, len(v)+1)) AS i FROM ev),
         ed AS (SELECT vec_id, label, i - 1 AS dim, v[i] AS x FROM ei),
         cent AS (SELECT label, dim,
             list_sum(list(x ORDER BY vec_id)) / count(*) AS c
           FROM ed GROUP BY 1, 2),
         cv AS MATERIALIZED (SELECT label, list(c ORDER BY dim) AS cv
           FROM cent GROUP BY 1),
         gc AS (SELECT dim, list_sum(list(x ORDER BY vec_id)) / count(*) AS g
           FROM ed GROUP BY 1),
         gv AS (SELECT list(g ORDER BY dim) AS gv FROM gc),
         nj AS (SELECT label, CAST(count(*) AS BIGINT) AS nj
           FROM ev GROUP BY 1),
         d2 AS (SELECT e.vec_id, e.label,
             round(list_sum(list_transform(range(1, len(e.v)+1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 9) AS d2
           FROM ev e JOIN cv c USING (label)),
         wj AS (SELECT label, list_sum(list(d2 ORDER BY vec_id)) AS w
           FROM d2 GROUP BY 1),
         bj AS (SELECT c.label,
             round(CAST(nj.nj AS DOUBLE)
               * list_sum(list_transform(range(1, len(c.cv)+1),
                 i -> (c.cv[i] - gv.gv[i]) * (c.cv[i] - gv.gv[i]))), 9) AS b
           FROM cv c JOIN nj USING (label) CROSS JOIN gv),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT label) AS BIGINT) AS k FROM ev),
         sums AS (SELECT list_sum(list(w ORDER BY label)) AS wcss,
             list_sum(list(b ORDER BY label)) AS bcss
           FROM wj JOIN bj USING (label))
         SELECT n AS n_vecs, k AS n_clusters,
           bcss, wcss,
           round((bcss / CAST(k - 1 AS DOUBLE))
             / (wcss / CAST(n - k AS DOUBLE)), 4) AS ch_index
         FROM sums CROSS JOIN tot""",

    "q409_davies_bouldin" ->
      """WITH ev AS MATERIALIZED (SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
         ei AS (SELECT vec_id, label, v,
           unnest(range(1, len(v)+1)) AS i FROM ev),
         ed AS (SELECT vec_id, label, i - 1 AS dim, v[i] AS x FROM ei),
         cent AS (SELECT label, dim,
             list_sum(list(x ORDER BY vec_id)) / count(*) AS c
           FROM ed GROUP BY 1, 2),
         cv AS MATERIALIZED (SELECT label, list(c ORDER BY dim) AS cv
           FROM cent GROUP BY 1),
         d AS (SELECT e.label, e.vec_id,
             round(sqrt(list_sum(list_transform(range(1, len(e.v)+1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))), 9) AS d
           FROM ev e JOIN cv c USING (label)),
         sig AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             list_sum(list(d ORDER BY vec_id)) / count(*) AS sigma
           FROM d GROUP BY 1),
         cd AS (SELECT a.label AS li, b.label AS lj,
             sqrt(list_sum(list_transform(range(1, len(a.cv)+1),
               i -> (a.cv[i] - b.cv[i]) * (a.cv[i] - b.cv[i])))) AS dc
           FROM cv a JOIN cv b ON a.label <> b.label),
         r AS (SELECT li, si.n_vecs, si.sigma,
             (si.sigma + sj.sigma) / dc AS r
           FROM cd
           JOIN sig si ON si.label = li
           JOIN sig sj ON sj.label = lj)
         SELECT li AS label, n_vecs, round(sigma, 6) AS sigma,
           round(max(r), 6) AS db_term
         FROM r GROUP BY 1, 2, sigma""",

    "q430_mmr_diversity" -> {
      // Pairwise candidate cosine — same op structure as cosineSqlBody
      // but over two candidate vectors (va, vb).
      val pairCos =
        """list_sum(list_transform(range(1, len(va)+1), i -> va[i]*vb[i]))
           / (sqrt(list_sum(list_transform(range(1, len(va)+1),
               i -> va[i]*va[i])))
             * sqrt(list_sum(list_transform(range(1, len(vb)+1),
               i -> vb[i]*vb[i]))))"""
      def stepSql(t: Int): String =
        s"""p$t AS (SELECT CAST($t AS BIGINT) AS rank, vec_id, rel, score
           FROM (SELECT c.vec_id, c.rel,
               0.7 * c.rel - 0.3 * max(s.sim) AS score
             FROM cand c
             JOIN sim s ON s.vi = c.vec_id
               AND s.vj IN (SELECT vec_id FROM sel${t - 1})
             WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
             GROUP BY c.vec_id, c.rel
             ORDER BY score DESC, c.vec_id LIMIT 1)),
         sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM p$t)"""
      val steps = (2 to 5).map(stepSql).mkString(",\n         ")
      s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
             AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
           FROM embeddings WHERE vec_id <> 0),
         cand AS (SELECT vec_id, rel, ev FROM (
           SELECT vec_id, round($cosineSqlBody, 4) AS rel, ev
           FROM e, q ORDER BY rel DESC, vec_id LIMIT 50)),
         sim AS (SELECT a.vec_id AS vi, b.vec_id AS vj,
             round($pairCos, 4) AS sim
           FROM (SELECT vec_id, ev AS va FROM cand) a
           JOIN (SELECT vec_id, ev AS vb FROM cand) b
             ON a.vec_id <> b.vec_id),
         sel1 AS (SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel,
             rel AS score
           FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
         $steps
         SELECT rank, vec_id, rel, round(score, 4) AS score FROM sel5"""
    },

    "q431_centroid_drift" ->
      """WITH ev AS MATERIALIZED (SELECT vec_id, label, vec_id % 2 AS half,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
         ei AS (SELECT vec_id, label, half, v,
           unnest(range(1, len(v)+1)) AS i FROM ev),
         ed AS (SELECT vec_id, label, half, i - 1 AS dim, v[i] AS x FROM ei),
         cent AS (SELECT label, half, dim,
             list_sum(list(x ORDER BY vec_id)) / count(*) AS c,
             CAST(count(*) AS BIGINT) AS nv
           FROM ed GROUP BY 1, 2, 3),
         cv AS (SELECT label, half, list(c ORDER BY dim) AS cv,
             first(nv) AS n_vecs
           FROM cent GROUP BY 1, 2),
         j AS (SELECT a.label, a.cv AS c0, a.n_vecs AS n_even,
             b.cv AS c1, b.n_vecs AS n_odd
           FROM (SELECT * FROM cv WHERE half = 0) a
           JOIN (SELECT * FROM cv WHERE half = 1) b USING (label))
         SELECT label, n_even, n_odd,
           round(list_sum(list_transform(range(1, len(c0)+1),
               i -> c0[i]*c1[i]))
             / (sqrt(list_sum(list_transform(range(1, len(c0)+1),
                 i -> c0[i]*c0[i])))
               * sqrt(list_sum(list_transform(range(1, len(c1)+1),
                 i -> c1[i]*c1[i])))), 6) AS centroid_cosine,
           round(sqrt(list_sum(list_transform(range(1, len(c0)+1),
             i -> (c0[i] - c1[i]) * (c0[i] - c1[i])))), 6) AS centroid_l2
         FROM j""",

    // ── Graph link-prediction / clusterability tier (round 11) ──────────

    "q469_adamic_adar" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         und AS (SELECT pa AS u, pb AS v FROM e0
           UNION ALL SELECT pb, pa FROM e0),
         deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg
           FROM und GROUP BY 1),
         wz AS (SELECT und.u AS z, und.v AS n,
             CAST(round(1000000000.0 / ln(CAST(dg AS DOUBLE))) AS BIGINT)
               AS wn
           FROM und JOIN deg USING (u) WHERE dg >= 2),
         cand AS (SELECT a.n AS a, b.n AS b, a.wn AS wn
           FROM wz a JOIN wz b ON a.z = b.z AND a.n < b.n
           WHERE NOT EXISTS (SELECT 1 FROM e0
             WHERE e0.pa = a.n AND e0.pb = b.n)),
         aa AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(wn) AS BIGINT) AS aan
           FROM cand GROUP BY 1, 2)
         SELECT a, b, n_common,
           CAST(aan AS DOUBLE) / 1000000000.0 AS aa FROM aa
         ORDER BY aan DESC, a, b LIMIT 20""",

    "q470_local_clustering" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         und AS (SELECT pa AS u, pb AS v FROM e0
           UNION ALL SELECT pb, pa FROM e0),
         deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg
           FROM und GROUP BY 1),
         ed AS (SELECT
             CASE WHEN d1.dg < d2.dg OR (d1.dg = d2.dg AND pa < pb)
               THEN pa ELSE pb END AS src,
             CASE WHEN d1.dg < d2.dg OR (d1.dg = d2.dg AND pa < pb)
               THEN pb ELSE pa END AS dst
           FROM e0 JOIN deg d1 ON pa = d1.u JOIN deg d2 ON pb = d2.u),
         tri AS (SELECT a.src AS ctr, a.dst AS x, b.dst AS y
           FROM ed a JOIN ed b ON a.src = b.src AND a.dst < b.dst
           WHERE EXISTS (SELECT 1 FROM e0
             WHERE e0.pa = a.dst AND e0.pb = b.dst)),
         pern AS (SELECT w, CAST(count(*) AS BIGINT) AS tri FROM (
             SELECT ctr AS w FROM tri
             UNION ALL SELECT x FROM tri
             UNION ALL SELECT y FROM tri)
           GROUP BY 1)
         SELECT u AS node, dg AS degree,
           CAST(coalesce(tri, 0) AS BIGINT) AS triangles,
           CAST(coalesce(tri, 0) AS DOUBLE) * 2.0
             / CAST(dg * (dg - 1) AS DOUBLE) AS lcc
         FROM deg LEFT JOIN pern ON u = w
         WHERE dg >= 2
         ORDER BY lcc DESC, node LIMIT 20""",

    "q471_hopkins" -> {
      // The 16 probe-fraction vectors are the SAME md5 unit hashes the
      // Spark side bakes in as literals (TextKernels.unitHash of
      // "hop_<probe>_<dim>") — rendered here from the same function, so
      // neither engine re-derives them. dim pinned at the corpus's 64
      // (the jlSigns precedent).
      val probeRows = (0 until 16).map { j =>
        val fr = (0 until 64).map(i => graft.plans.TextKernels.unitHash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"hop_${j}_$i")))
        s"($j, [${fr.mkString(", ")}])"
      }.mkString(",\n           ")
      s"""WITH ev AS MATERIALIZED (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
         ed AS (SELECT vec_id, i - 1 AS dim, v[i] AS x
           FROM ev, UNNEST(range(1, len(v)+1)) AS u(i)),
         rng AS (SELECT dim, min(x) AS mn, max(x) AS mx
           FROM ed GROUP BY 1),
         probes AS (SELECT * FROM (VALUES
           $probeRows) t(pid, fr)),
         synth AS (SELECT pid,
             list(mn + fr[dim + 1] * (mx - mn) ORDER BY dim) AS sv
           FROM probes CROSS JOIN rng GROUP BY pid, fr),
         u AS (SELECT pid, min(list_sum(list_transform(range(1, 65),
             i -> (sv[i] - v[i]) * (sv[i] - v[i])))) AS du
           FROM synth CROSS JOIN ev GROUP BY 1),
         samp AS (SELECT vec_id AS sid, v AS svv FROM ev WHERE vec_id < 16),
         w AS (SELECT sid, min(list_sum(list_transform(range(1, 65),
             i -> (svv[i] - v[i]) * (svv[i] - v[i])))) AS dw
           FROM samp CROSS JOIN ev WHERE ev.vec_id <> samp.sid GROUP BY 1),
         su AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(sqrt(du) ORDER BY pid)), (p, q) -> p + q) AS su FROM u),
         sw AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(sqrt(dw) ORDER BY sid)), (p, q) -> p + q) AS sw FROM w)
         SELECT CAST(16 AS BIGINT) AS m, su / (su + sw) AS hopkins
         FROM su CROSS JOIN sw"""
    },

    "q482_source_dispersion" ->
      """WITH ev AS MATERIALIZED (SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
         nsq AS (SELECT label, vec_id,
             list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i]))
               AS n2
           FROM ev),
         en2 AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(n2 ORDER BY vec_id)), (p, q) -> p + q)
               / CAST(count(*) AS DOUBLE) AS en2
           FROM nsq GROUP BY 1),
         ed AS (SELECT label, vec_id, i - 1 AS dim, v[i] AS x
           FROM ev, UNNEST(range(1, len(v)+1)) AS u(i)),
         cent AS (SELECT label, dim,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(x ORDER BY vec_id)), (p, q) -> p + q)
               / CAST(count(*) AS DOUBLE) AS c
           FROM ed GROUP BY 1, 2),
         cn2 AS (SELECT label,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(c * c ORDER BY dim)), (p, q) -> p + q) AS cn2
           FROM cent GROUP BY 1)
         SELECT label, n_vecs, en2 - cn2 AS dispersion
         FROM en2 JOIN cn2 USING (label)""",
  )
}
