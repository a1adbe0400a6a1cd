package graft

/** DuckDB oracles for the statistics/evaluation tier II (q275+). */
private[graft] object OracleStats {

  /** Exact per-customer spend cents per nation — textual mirror of
    * QueriesStats.spendPerCustomer (the q377–q379 inequality base).
    */
  private val spendSql: String =
    """spend AS (SELECT n_name AS nation, o_custkey,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS BIGINT) AS x
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1, 2)"""

  /** The decile probe points, rendered from the SAME Scala doubles the
    * Spark side interpolates at — no literal drift possible.
    */
  private val decileList: String =
    (0 to 9).map(i => 0.05 + 0.1 * i).mkString("[", ", ", "]")

  val map: Map[String, String] = Map(

    "q275_forecast_backtest" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, x
           FROM daily),
         nn AS (SELECT max(t) AS n FROM idx),
         lagd AS (SELECT a.t, a.x AS actual, b.x AS pred, nn.n
           FROM idx a JOIN idx b ON a.t = b.t + 7 CROSS JOIN nn),
         hold AS (SELECT * FROM lagd WHERE t > n - 28),
         ins AS (SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(abs(actual - pred)) AS BIGINT) AS inae
           FROM lagd WHERE t <= n - 28),
         h AS (SELECT CAST(count(*) AS BIGINT) AS h,
             CAST(sum(abs(actual - pred)) AS BIGINT) AS sae,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(abs(CAST(actual AS DOUBLE) - CAST(pred AS DOUBLE))
                 / ((CAST(actual AS DOUBLE) + CAST(pred AS DOUBLE)) / 2.0)
                 ORDER BY t)), (acc, x) -> round(acc + x, 12)) AS smsum,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(abs(CAST(actual AS DOUBLE) - CAST(pred AS DOUBLE))
                 / CAST(actual AS DOUBLE) ORDER BY t)),
               (acc, x) -> round(acc + x, 12)) AS mapesum
           FROM hold)
         SELECT h AS n_holdout,
           mapesum / CAST(h AS DOUBLE) AS mape,
           smsum / CAST(h AS DOUBLE) AS smape,
           (CAST(sae AS DOUBLE) / CAST(h AS DOUBLE))
             / (CAST(inae AS DOUBLE) / CAST(m AS DOUBLE)) AS mase
         FROM h CROSS JOIN ins""",

    "q276_theil_sen" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS t,
             x FROM m),
         sl AS (SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
             AS slope
           FROM idx a JOIN idx b ON b.t > a.t),
         r AS (SELECT slope, CAST(row_number() OVER (ORDER BY slope) AS BIGINT)
             AS rn, CAST(count(*) OVER () AS BIGINT) AS cnt FROM sl),
         k AS (SELECT max(CASE WHEN rn <= (cnt + 1) // 2 THEN slope END) AS s1,
             max(CASE WHEN rn <= cnt // 2 + 1 THEN slope END) AS s2,
             max(cnt) AS n_slopes FROM r)
         SELECT CAST(n_slopes AS BIGINT) AS n_slopes,
           round((s1 + s2) / 2.0, 6) AS slope_cents_per_month FROM k""",

    "q277_heaps_law" ->
      """WITH toks AS (SELECT doc_id, w
           FROM (SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
             FROM documents)
           WHERE length(w) > 0),
         pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok
           FROM toks GROUP BY 1),
         nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nnew
           FROM (SELECT w, min(doc_id) AS doc_id FROM toks GROUP BY 1)
           GROUP BY 1),
         grid AS (SELECT pd.doc_id, ntok, coalesce(nnew, 0) AS nnew
           FROM pd LEFT JOIN nw ON pd.doc_id = nw.doc_id),
         cum AS (SELECT doc_id,
             CAST(sum(ntok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumtok,
             CAST(sum(nnew) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumvoc,
             CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
           FROM grid),
         nd AS (SELECT max(rn) AS nd FROM cum),
         sel AS (SELECT rn, ln(CAST(cumtok AS DOUBLE)) AS lx,
             ln(CAST(cumvoc AS DOUBLE)) AS ly
           FROM cum CROSS JOIN nd
           WHERE rn % ((nd + 19) // 20) = 0 OR rn = nd),
         f AS (SELECT CAST(count(*) AS BIGINT) AS np,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx ORDER BY rn)), (acc, x) -> round(acc + x, 12)) AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ly ORDER BY rn)), (acc, x) -> round(acc + x, 12)) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx * ly ORDER BY rn)), (acc, x) -> round(acc + x, 12))
               AS sxy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx * lx ORDER BY rn)), (acc, x) -> round(acc + x, 12))
               AS sx2
           FROM sel)
         SELECT np AS n_points,
           round((CAST(np AS DOUBLE) * sxy - sx * sy)
             / (CAST(np AS DOUBLE) * sx2 - sx * sx), 6) AS beta,
           round(exp((sy - ((CAST(np AS DOUBLE) * sxy - sx * sy)
               / (CAST(np AS DOUBLE) * sx2 - sx * sx)) * sx)
             / CAST(np AS DOUBLE)), 4) AS k
         FROM f""",

    "q280_kendall_tau" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
           least(CAST(floor(l_extendedprice / 4000.0) AS BIGINT), 25) AS pb
         FROM lineitem),
         cells AS (SELECT q, pb, CAST(count(*) AS BIGINT) AS c
           FROM li GROUP BY 1, 2),
         conc AS (SELECT sum(CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS cc
           FROM cells a JOIN cells b ON b.q > a.q AND b.pb > a.pb),
         disc AS (SELECT sum(CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS dd
           FROM cells a JOIN cells b ON b.q > a.q AND b.pb < a.pb),
         n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
         tq AS (SELECT sum(CAST(tc AS HUGEINT) * CAST(tc - 1 AS HUGEINT)) AS t1
           FROM (SELECT q, CAST(sum(c) AS BIGINT) AS tc FROM cells GROUP BY 1)),
         tp AS (SELECT sum(CAST(tc AS HUGEINT) * CAST(tc - 1 AS HUGEINT)) AS t2
           FROM (SELECT pb, CAST(sum(c) AS BIGINT) AS tc FROM cells GROUP BY 1)),
         f AS (SELECT cc, dd, n.n, t1, t2,
             CAST(n.n AS HUGEINT) * CAST(n.n - 1 AS HUGEINT) AS n0
           FROM conc CROSS JOIN disc CROSS JOIN n CROSS JOIN tq CROSS JOIN tp)
         SELECT n,
           round((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
             / sqrt((CAST(n0 AS DOUBLE) / 2.0 - CAST(t1 AS DOUBLE) / 2.0)
               * (CAST(n0 AS DOUBLE) / 2.0 - CAST(t2 AS DOUBLE) / 2.0)), 6)
             AS tau_b
         FROM f""",

    "q281_cohens_kappa" -> {
      s"""WITH lid AS (${OracleHelpers.langIdSql}),
         nid AS (${OracleHelpers.ngramLangSql}),
         cm AS (SELECT lid.pred_lang AS r1, nid.pred_lang AS r2,
             CAST(count(*) AS BIGINT) AS c
           FROM lid JOIN nid ON lid.doc_id = nid.doc_id GROUP BY 1, 2),
         n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cm),
         po AS (SELECT CAST(sum(c) AS BIGINT) AS agree FROM cm WHERE r1 = r2),
         m1 AS (SELECT r1, CAST(sum(c) AS BIGINT) AS c1 FROM cm GROUP BY 1),
         m2 AS (SELECT r2, CAST(sum(c) AS BIGINT) AS c2 FROM cm GROUP BY 1),
         pe AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list((CAST(c1 AS DOUBLE) / CAST(n.n AS DOUBLE))
               * (CAST(c2 AS DOUBLE) / CAST(n.n AS DOUBLE)) ORDER BY r1)),
             (acc, x) -> round(acc + x, 12)) AS pe
           FROM m1 JOIN m2 ON m1.r1 = m2.r2 CROSS JOIN n)
         SELECT n.n AS n,
           round(CAST(agree AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS p_observed,
           round(pe, 6) AS p_expected,
           round((CAST(agree AS DOUBLE) / CAST(n.n AS DOUBLE) - pe)
             / (1.0 - pe), 6) AS kappa
         FROM po CROSS JOIN n CROSS JOIN pe"""
    },

    "q282_anova_f" ->
      """WITH c AS (SELECT c_nationkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM customer),
         g AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(v) AS BIGINT) AS sg,
             sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS qg
           FROM c GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
             sum(qg) AS q FROM g),
         terms AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
               ORDER BY c_nationkey)), (acc, x) -> round(acc + x, 6)) AS sgg
           FROM g),
         f AS (SELECT k, n,
             sgg - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               AS ssb,
             CAST(q AS DOUBLE) - sgg AS ssw
           FROM tot CROSS JOIN terms)
         SELECT k, n,
           round((ssb / (CAST(k AS DOUBLE) - 1.0))
             / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat
         FROM f""",

    "q283_multiclass_f1" -> {
      s"""WITH nid AS (${OracleHelpers.ngramLangSql}),
         labels AS (SELECT actual_lang AS lang FROM nid
           UNION SELECT pred_lang FROM nid),
         tpx AS (SELECT actual_lang AS lang, CAST(count(*) AS BIGINT) AS tp
           FROM nid WHERE actual_lang = pred_lang GROUP BY 1),
         ap AS (SELECT actual_lang AS lang, CAST(count(*) AS BIGINT) AS na
           FROM nid GROUP BY 1),
         pp AS (SELECT pred_lang AS lang, CAST(count(*) AS BIGINT) AS np
           FROM nid GROUP BY 1),
         base AS (SELECT l.lang, coalesce(tp, 0) AS tp, coalesce(na, 0) AS na,
             coalesce(np, 0) AS np
           FROM labels l LEFT JOIN tpx ON l.lang = tpx.lang
           LEFT JOIN ap ON l.lang = ap.lang LEFT JOIN pp ON l.lang = pp.lang),
         pr AS (SELECT lang, tp, na, np,
             CASE WHEN np > 0 THEN CAST(tp AS DOUBLE) / CAST(np AS DOUBLE)
                  ELSE 0.0 END AS precision,
             CASE WHEN na > 0 THEN CAST(tp AS DOUBLE) / CAST(na AS DOUBLE)
                  ELSE 0.0 END AS recall
           FROM base),
         per AS (SELECT lang, tp, na, np, precision, recall,
             CASE WHEN precision + recall > 0
                  THEN 2.0 * precision * recall / (precision + recall)
                  ELSE 0.0 END AS f1
           FROM pr),
         mac AS (SELECT '__macro__' AS lang, CAST(sum(tp) AS BIGINT) AS tp,
             CAST(sum(na) AS BIGINT) AS na, CAST(sum(np) AS BIGINT) AS np,
             0.0 AS precision, 0.0 AS recall,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(f1 ORDER BY lang)), (acc, x) -> round(acc + x, 12))
               / CAST(count(*) AS DOUBLE) AS f1
           FROM per)
         SELECT lang, tp, na, np, round(precision, 6) AS precision,
           round(recall, 6) AS recall, round(f1, 6) AS f1 FROM per
         UNION ALL
         SELECT lang, tp, na, np, round(precision, 6), round(recall, 6),
           round(f1, 6) FROM mac"""
    },

    "q284_clustering_eval" -> {
      s"""WITH comp AS MATERIALIZED (${OracleHelpers.neardupComponentsSql}),
         grid AS (SELECT coalesce(component, e.vec_id) AS community, label,
             CAST(count(*) AS BIGINT) AS c
           FROM embeddings e LEFT JOIN comp ON e.vec_id = comp.vec_id
           GROUP BY 1, 2),
         n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
         byc AS (SELECT community, CAST(sum(c) AS BIGINT) AS nc,
             CAST(max(c) AS BIGINT) AS mx FROM grid GROUP BY 1),
         byn AS (SELECT label, CAST(sum(c) AS BIGINT) AS nn
           FROM grid GROUP BY 1),
         hc AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(-(CAST(nc AS DOUBLE) / CAST(n.n AS DOUBLE))
               * ln(CAST(nc AS DOUBLE) / CAST(n.n AS DOUBLE))
               ORDER BY community)), (acc, x) -> round(acc + x, 12)) AS hc
           FROM byc CROSS JOIN n),
         hn AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(-(CAST(nn AS DOUBLE) / CAST(n.n AS DOUBLE))
               * ln(CAST(nn AS DOUBLE) / CAST(n.n AS DOUBLE))
               ORDER BY label)), (acc, x) -> round(acc + x, 12)) AS hn
           FROM byn CROSS JOIN n),
         mi AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
               * ln(CAST(n.n AS DOUBLE) * CAST(c AS DOUBLE)
                 / (CAST(nc AS DOUBLE) * CAST(nn AS DOUBLE)))
               ORDER BY community, label)),
             (acc, x) -> round(acc + x, 12)) AS mi
           FROM grid JOIN byc USING (community) JOIN byn USING (label)
           CROSS JOIN n),
         pur AS (SELECT CAST(sum(mx) AS DOUBLE) / CAST(max(n.n) AS DOUBLE)
             AS purity, CAST(count(*) AS BIGINT) AS n_communities,
             CAST(max(n.n) AS BIGINT) AS n
           FROM byc CROSS JOIN n)
         SELECT pur.n AS n, n_communities, round(purity, 6) AS purity,
           round(CASE WHEN hc > 0 AND hn > 0 THEN mi / sqrt(hc * hn)
                 ELSE 0.0 END, 6) AS nmi
         FROM pur CROSS JOIN hc CROSS JOIN hn CROSS JOIN mi"""
    },

    "q285_mcc" -> {
      s"""WITH nid AS (${OracleHelpers.ngramLangSql}),
         b AS (SELECT actual_lang = 'en' AS t, pred_lang = 'en' AS p FROM nid),
         cm AS (SELECT
             CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS BIGINT)
               AS tn,
             CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS fn
           FROM b)
         SELECT tp, tn, fp, fn,
           round(CAST(CAST(tp AS HUGEINT) * CAST(tn AS HUGEINT)
               - CAST(fp AS HUGEINT) * CAST(fn AS HUGEINT) AS DOUBLE)
             / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))
               * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE))),
             6) AS mcc
         FROM cm"""
    },

    "q286_psi" ->
      """WITH e AS (SELECT event_id % 2 = 0 AS h,
           least(CAST(floor(value / 100.0) AS BIGINT), 9) AS band
         FROM events),
         g AS (SELECT band,
             CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN h THEN 0 ELSE 1 END) AS BIGINT) AS c2
           FROM e GROUP BY 1),
         tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
             CAST(sum(c2) AS BIGINT) AS t2 FROM g),
         terms AS (SELECT band, c1, c2,
             CASE WHEN c1 > 0 AND c2 > 0 THEN
               (CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                 - CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE))
               * ln((CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                 / (CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE)))
             ELSE 0.0 END AS term
           FROM g CROSS JOIN tot),
         p AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(term ORDER BY band)), (acc, x) -> round(acc + x, 12)) AS psi
           FROM terms)
         SELECT band, c1, c2, round(term, 6) AS term, round(psi, 6) AS psi
         FROM terms CROSS JOIN p""",

    "q292_mcnemar" -> {
      s"""WITH lid AS (${OracleHelpers.langIdSql}),
         nid AS (${OracleHelpers.ngramLangSql}),
         b0 AS (SELECT lid.pred_lang = lid.actual_lang AS c1,
             nid.pred_lang = nid.actual_lang AS c2
           FROM lid JOIN nid ON lid.doc_id = nid.doc_id),
         cm AS (SELECT
             CAST(sum(CASE WHEN c1 AND NOT c2 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS c
           FROM b0)
         SELECT b, c,
           round((CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
             * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
             / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)), 6) AS chi2,
           round((abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
             * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
             / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)), 6) AS chi2_cc
         FROM cm"""
    },

    "q293_power_analysis" ->
      """WITH b AS (SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS pos
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
         p AS (SELECT brand, n,
             CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS p1,
             (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) * 1.1 AS p2
           FROM b),
         f AS (SELECT brand, n, p1, p2, (p1 + p2) / 2.0 AS pbar FROM p)
         SELECT brand, n, round(p1, 6) AS base_rate,
           CASE WHEN p1 = 0 OR p2 >= 1 THEN NULL
             ELSE CAST(ceil(((1.96 * sqrt(2.0 * pbar * (1.0 - pbar))
               + 0.8416 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
             * (1.96 * sqrt(2.0 * pbar * (1.0 - pbar))
               + 0.8416 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))))
             / ((p2 - p1) * (p2 - p1))) AS BIGINT) END AS n_per_arm
         FROM f""",

    "q294_xbar_control_chart" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, x
           FROM daily),
         weeks AS (SELECT (t - 1) // 7 AS wk, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(x) AS BIGINT) AS sx, CAST(max(x) AS BIGINT) AS mx,
             CAST(min(x) AS BIGINT) AS mn
           FROM idx GROUP BY 1),
         ws AS (SELECT wk, CAST(sx AS DOUBLE) / 7.0 AS xbar,
             CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE) AS r
           FROM weeks WHERE nd = 7),
         ctr AS (SELECT
             CAST(sum(sx) AS DOUBLE) / 7.0 / CAST(count(*) AS DOUBLE) AS cl,
             CAST(sum(mx - mn) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rbar
           FROM weeks WHERE nd = 7)
         SELECT wk, xbar, cl AS center,
           cl + 0.419 * rbar AS ucl,
           cl - 0.419 * rbar AS lcl,
           (xbar > cl + 0.419 * rbar OR xbar < cl - 0.419 * rbar)
             AS out_of_control
         FROM ws CROSS JOIN ctr""",

    "q289_grubbs_test" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s1,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS s2 FROM m),
         w AS (SELECT month, n,
             abs(CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt((CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
                 * ((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
               / (CAST(n AS DOUBLE) - 1.0)) AS dev
           FROM m CROSS JOIN g)
         SELECT n, month AS outlier_month, round(dev, 6) AS g_stat
         FROM w ORDER BY dev DESC, month LIMIT 1""",

    "q290_runs_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, x
           FROM daily),
         rk AS (SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS cnt FROM idx),
         med AS (SELECT (CAST(max(CASE WHEN rn <= (cnt + 1) // 2 THEN x END)
               AS DOUBLE)
             + CAST(max(CASE WHEN rn <= cnt // 2 + 1 THEN x END) AS DOUBLE))
             / 2.0 AS med FROM rk),
         signs AS (SELECT t, CAST(x AS DOUBLE) > med AS up
           FROM idx CROSS JOIN med WHERE CAST(x AS DOUBLE) <> med),
         rr AS (SELECT up, CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS r
           FROM signs),
         fl AS (SELECT CAST(sum(CASE WHEN a.up <> b.up THEN 1 ELSE 0 END)
             AS BIGINT) AS fl
           FROM rr a JOIN rr b ON b.r = a.r + 1),
         nn AS (SELECT CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS n2 FROM rr),
         f AS (SELECT fl + 1 AS runs, n1, n2,
             2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0 AS mu,
             (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
               * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
               * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)) AS s2
           FROM fl CROSS JOIN nn)
         SELECT n1, n2, CAST(runs AS BIGINT) AS runs,
           round((CAST(runs AS DOUBLE) - mu) / sqrt(s2), 6) AS z
         FROM f""",

    "q291_gains_table" ->
      """WITH li AS (SELECT l_returnflag = 'R' AS y,
           CAST(CAST(concat('0x', substr(md5('auc_' || CAST(l_orderkey AS VARCHAR)
             || '_' || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS score
         FROM lineitem),
         bins AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS decile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
           FROM li GROUP BY 1),
         cum AS (SELECT decile, n, pos,
             CAST(sum(n) OVER (ORDER BY decile DESC ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
             CAST(sum(pos) OVER (ORDER BY decile DESC ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cpos
           FROM bins),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
             CAST(sum(pos) AS BIGINT) AS tp FROM bins)
         SELECT decile, n, pos,
           round(CAST(cpos AS DOUBLE) / CAST(tp AS DOUBLE), 6) AS cum_capture,
           round((CAST(cpos AS DOUBLE) / CAST(cn AS DOUBLE))
             / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS lift
         FROM cum CROSS JOIN tot""",

    "q287_apportionment" ->
      """WITH counts AS (SELECT source,
           CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
             AS tok
         FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(tok) AS BIGINT) AS tt FROM counts),
         q AS (SELECT source, tok, (tok * 1000) // tt AS fl,
             tok * 1000 - ((tok * 1000) // tt) * tt AS rem
           FROM counts CROSS JOIN tot),
         r AS (SELECT source, tok, fl,
             CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT)
               AS rk
           FROM q),
         lo AS (SELECT 1000 - CAST(sum(fl) AS BIGINT) AS extra FROM q)
         SELECT source, tok, fl AS floor_quota,
           CAST(fl + (CASE WHEN rk <= extra THEN 1 ELSE 0 END) AS BIGINT)
             AS allocated
         FROM r CROSS JOIN lo""",

    "q288_er_survivorship" ->
      s"""WITH dn AS (SELECT p_name, min(p_partkey) AS k,
             CAST(count(*) AS BIGINT) AS n,
             max(CAST(p_retailprice AS DECIMAL(18,2))) AS mx
           FROM part GROUP BY 1),
         t AS (SELECT p_name, k, n, mx,
             string_split(p_name, ' ')[1] AS blk FROM dn),
         pr AS (SELECT a.k AS key_a, b.k AS key_b
           FROM t a JOIN t b ON a.blk = b.blk AND a.k < b.k
           WHERE levenshtein(a.p_name, b.p_name) <= 3),
         edges AS MATERIALIZED (SELECT key_a AS a, key_b AS b FROM pr
                   UNION SELECT key_b, key_a FROM pr),
         ${OracleHelpers.minLabelCcCtes()},
         lab AS (SELECT coalesce(component, t.k) AS cluster, p_name, n, mx
           FROM t LEFT JOIN cc ON t.k = cc.vertex)
         SELECT cluster, CAST(count(*) AS BIGINT) AS n_names,
           CAST(sum(n) AS BIGINT) AS n_rows,
           min(p_name) AS canonical_name,
           CAST(max(mx) AS DOUBLE) AS max_retail
         FROM lab GROUP BY 1 HAVING count(*) >= 2""",

    "q278_calibration_ece" ->
      """WITH li AS (SELECT l_returnflag = 'R' AS y,
           CAST(CAST(concat('0x', substr(md5('auc_' || CAST(l_orderkey AS VARCHAR)
             || '_' || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS score
         FROM lineitem),
         b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
             CAST(score * 4294967296.0 AS BIGINT) AS v, y FROM li),
         g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             sum(CAST(v AS HUGEINT)) AS sv FROM b GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM g),
         wc AS (SELECT bin, n, pos,
             CAST(sv AS DOUBLE) / CAST(4294967296.0 AS DOUBLE)
               / CAST(n AS DOUBLE) AS conf,
             CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc, tn
           FROM g CROSS JOIN t),
         e AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list((CAST(n AS DOUBLE) / CAST(tn AS DOUBLE)) * abs(acc - conf)
               ORDER BY bin)), (a2, x) -> round(a2 + x, 12)) AS ece
           FROM wc)
         SELECT bin, n, round(conf, 6) AS mean_score, round(acc, 6) AS frac_pos,
           round(ece, 6) AS ece
         FROM wc CROSS JOIN e""",

    // ── r8 economics / industrial-statistics tier ──────────────────────

    "q296_herfindahl" ->
      """WITH rev AS (SELECT n_name AS nation, l_suppkey,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS r
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1, 2)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(CAST(r AS DECIMAL(19,0)) * CAST(r AS DECIMAL(19,0)))
               AS DOUBLE)
             / (CAST(sum(r) AS DOUBLE) * CAST(sum(r) AS DOUBLE)), 6) AS hhi
         FROM rev GROUP BY 1""",

    "q297_price_elasticity" ->
      """WITH cells AS (SELECT p_brand AS brand,
           strftime(l_shipdate, '%Y-%m') AS month,
           round(ln(
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
             / CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)), 9) AS x,
           round(ln(
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
             / 100.0), 9) AS y
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2),
         f AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(x ORDER BY month)), (a, e) -> a + e) AS sx,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(y ORDER BY month)), (a, e) -> a + e) AS sy,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(x * y ORDER BY month)), (a, e) -> a + e) AS sxy,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(x * x ORDER BY month)), (a, e) -> a + e) AS sxx
         FROM cells GROUP BY 1)
         SELECT brand, n AS n_months,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS elasticity
         FROM f""",

    "q298_gini_by_nation" ->
      """WITH spend AS (SELECT o_custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         ranked AS (SELECT n_name AS nation, x,
           CAST(row_number() OVER (PARTITION BY n_name
             ORDER BY x ASC, o_custkey ASC) AS BIGINT) AS i
         FROM spend
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_customers,
           round((2.0 * CAST(sum(CAST(i AS DECIMAL(19,0))
               * CAST(x AS DECIMAL(19,0))) AS DOUBLE)
             - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(x) AS DOUBLE))
             / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE)), 6) AS gini
         FROM ranked GROUP BY 1""",

    "q299_newsvendor" ->
      """WITH rows_ AS (SELECT p_brand AS brand,
           CAST(l_shipdate AS DATE) AS day,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
           CASE WHEN l_returnflag = 'R'
             THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END AS rq
         FROM lineitem JOIN part ON l_partkey = p_partkey),
         daily AS (SELECT brand, day, CAST(sum(q) AS BIGINT) AS x
           FROM rows_ GROUP BY 1, 2),
         rates AS (SELECT brand, CAST(sum(q) AS BIGINT) AS tot,
             CAST(sum(rq) AS BIGINT) AS ret
           FROM rows_ GROUP BY 1),
         nd AS (SELECT brand, CAST(count(*) AS BIGINT) AS nd
           FROM daily GROUP BY 1),
         ranked AS (SELECT brand, x,
           CAST(row_number() OVER (PARTITION BY brand
             ORDER BY x ASC, day ASC) AS BIGINT) AS rn
         FROM daily)
         SELECT r.brand, CAST(min(r.x) AS BIGINT) AS stock_qty_cents,
           CAST(max(n.nd) AS BIGINT) AS n_days,
           round(1.0 - CAST(max(t.ret) AS DOUBLE) / CAST(max(t.tot) AS DOUBLE), 6)
             AS critical_fractile
         FROM ranked r
         JOIN rates t ON r.brand = t.brand
         JOIN nd n ON r.brand = n.brand
         WHERE r.rn * t.tot >= (t.tot - t.ret) * n.nd
         GROUP BY 1""",

    "q300_ks_two_sample" ->
      """WITH v AS (SELECT
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
           c_mktsegment = 'BUILDING' AS g1
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         grid AS (SELECT v,
           CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
         FROM v GROUP BY 1),
         cum AS (SELECT v,
           CAST(sum(c1) OVER (ORDER BY v ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
           CAST(sum(c2) OVER (ORDER BY v ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
         FROM grid),
         tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
           CAST(sum(c2) AS BIGINT) AS n2 FROM grid)
         SELECT n1, n2,
           round(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks_d,
           round(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))), 6) AS ks_scaled
         FROM cum CROSS JOIN tot GROUP BY 1, 2""",

    "q301_kendall_grid" ->
      """WITH g AS (SELECT p_brand AS brand,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS sp,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS ret
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
         pr AS (SELECT
           CASE WHEN CAST(a.sp AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))
               > CAST(b.sp AS DECIMAL(19,0)) * CAST(a.cnt AS DECIMAL(19,0))
             THEN 1.0 WHEN CAST(a.sp AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))
               < CAST(b.sp AS DECIMAL(19,0)) * CAST(a.cnt AS DECIMAL(19,0))
             THEN -1.0 ELSE 0.0 END AS sx,
           CASE WHEN CAST(a.ret AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))
               > CAST(b.ret AS DECIMAL(19,0)) * CAST(a.cnt AS DECIMAL(19,0))
             THEN 1.0 WHEN CAST(a.ret AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))
               < CAST(b.ret AS DECIMAL(19,0)) * CAST(a.cnt AS DECIMAL(19,0))
             THEN -1.0 ELSE 0.0 END AS sy
         FROM g a JOIN g b ON a.brand < b.brand)
         SELECT CAST(count(*) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
           CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
           round(CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
               - sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / sqrt(CAST(count(*) - sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               * CAST(count(*) - sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS DOUBLE)),
             6) AS tau_b
         FROM pr""",

    "q302_levene_bf" ->
      """WITH x AS (SELECT c_mktsegment AS g, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
         FROM orders JOIN customer ON o_custkey = c_custkey),
         ranked AS (SELECT g, o_orderkey, x,
           CAST(row_number() OVER (PARTITION BY g
             ORDER BY x ASC, o_orderkey ASC) AS BIGINT) AS rn
         FROM x),
         cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY 1),
         meds AS (SELECT r.g,
           CASE WHEN count(*) = 1 THEN CAST(sum(r.x) AS BIGINT) * 2
             ELSE CAST(sum(r.x) AS BIGINT) END AS med2
         FROM ranked r JOIN cnt c ON r.g = c.g
         WHERE r.rn = (c.n + 1) // 2 OR r.rn = c.n // 2 + 1
         GROUP BY 1),
         z AS (SELECT x.g, abs(x.x * 2 - m.med2) AS z
           FROM x JOIN meds m ON x.g = m.g),
         grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ni,
           CAST(sum(z) AS BIGINT) AS sz,
           sum(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))) AS szz
         FROM z GROUP BY 1),
         k AS (SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(ni) AS BIGINT) AS nn,
           CAST(sum(sz) AS BIGINT) AS gz FROM grp),
         terms AS (SELECT g, ni, k.k, k.nn,
           CAST(sz AS DOUBLE) / CAST(ni AS DOUBLE)
             - CAST(k.gz AS DOUBLE) / CAST(k.nn AS DOUBLE) AS dm,
           CAST(szz AS DOUBLE)
             - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(ni AS DOUBLE) AS wss
         FROM grp CROSS JOIN k),
         f AS (SELECT k, nn,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(ni AS DOUBLE) * dm * dm ORDER BY g)),
             (a, e) -> a + e) AS bss,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(wss ORDER BY g)),
             (a, e) -> a + e) AS wss
         FROM terms GROUP BY 1, 2)
         SELECT k AS n_groups, nn AS n_obs,
           round((bss / CAST(k - 1 AS DOUBLE))
             / (wss / CAST(nn - k AS DOUBLE)), 6) AS levene_w
         FROM f""",

    "q303_jarque_bera" ->
      """WITH daily AS (SELECT
           (CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) + 50000) // 100000 AS x
         FROM orders GROUP BY CAST(o_orderdate AS DATE)),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS s1,
           CAST(sum(x * x) AS BIGINT) AS s2,
           sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
             * CAST(x AS DECIMAL(19,0))) AS s3,
           sum((CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
             * (CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))) AS s4
         FROM daily),
         c AS (SELECT n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
           CAST(n AS DOUBLE) AS nd, CAST(s2 AS DOUBLE) AS d2,
           CAST(s3 AS DOUBLE) AS d3, CAST(s4 AS DOUBLE) AS d4
         FROM m),
         mom AS (SELECT n, mu, nd,
           (d2 / nd) - mu * mu AS m2,
           d3 / nd - 3.0 * mu * (d2 / nd) + 2.0 * mu * mu * mu AS m3,
           d4 / nd - 4.0 * mu * (d3 / nd) + 6.0 * mu * mu * (d2 / nd)
             - 3.0 * mu * mu * mu * mu AS m4
         FROM c)
         SELECT n AS n_days,
           round(m3 / sqrt(m2 * m2 * m2), 6) AS skewness,
           round(m4 / (m2 * m2), 6) AS kurtosis,
           round(nd / 6.0
             * (pow(m3 / sqrt(m2 * m2 * m2), 2)
               + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0), 6) AS jarque_bera
         FROM mom""",

    "q304_poisson_dispersion" ->
      """WITH daily AS (SELECT p_brand AS brand, CAST(l_shipdate AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS c
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2)
         SELECT brand, CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS mean_count,
           round((CAST(count(*) AS DOUBLE) * CAST(sum(c * c) AS DOUBLE)
             - CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
             / ((CAST(count(*) AS DOUBLE) - 1.0) * CAST(sum(c) AS DOUBLE)), 6)
             AS dispersion
         FROM daily GROUP BY 1""",

    "q305_cohens_kappa" ->
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F'
             THEN 1 ELSE 0 END) AS BIGINT) AS n11,
           CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linestatus <> 'F'
             THEN 1 ELSE 0 END) AS BIGINT) AS n10,
           CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_linestatus = 'F'
             THEN 1 ELSE 0 END) AS BIGINT) AS n01,
           CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_linestatus <> 'F'
             THEN 1 ELSE 0 END) AS BIGINT) AS n00
         FROM lineitem),
         p AS (SELECT n, n11, n10, n01, n00,
           (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE) AS po,
           ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE))
             * (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE))
             + (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE))
             * (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE)))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
         FROM m)
         SELECT n, n11, n10, n01, n00,
           round(po, 6) AS observed_agreement,
           round((po - pe) / (1.0 - pe), 6) AS kappa
         FROM p""",

    "q306_partial_corr" ->
      """WITH per AS (SELECT l_orderkey,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y,
           CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))
             AS BIGINT) AS z
         FROM lineitem GROUP BY 1),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(z) AS BIGINT) AS sz,
           sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
           sum(CAST(x AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))) AS sxz,
           sum(CAST(y AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))) AS syz,
           sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
           sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
           sum(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0))) AS szz
         FROM per),
         r AS (SELECT n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
           (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                 - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
           (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                 - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
         FROM m)
         SELECT n AS n_orders,
           round(rxy, 6) AS r_value_lines,
           round(rxz, 6) AS r_value_discount,
           round(ryz, 6) AS r_lines_discount,
           round((rxy - rxz * ryz)
             / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6) AS partial_r
         FROM r""",

    "q307_cooks_distance" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, x
           FROM daily),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(t) AS BIGINT) AS st, CAST(sum(x) AS BIGINT) AS sx,
           sum(CAST(t AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS stx,
           CAST(sum(t * t) AS BIGINT) AS stt,
           sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx
         FROM idx),
         fit AS (SELECT n, CAST(n AS DOUBLE) AS nd,
           CAST(st AS DOUBLE) AS std, CAST(sx AS DOUBLE) AS sxd,
           CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
             / CAST(n AS DOUBLE) AS Stt,
           CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE)
             / CAST(n AS DOUBLE) AS Stx,
           CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             / CAST(n AS DOUBLE) AS Sxx2
         FROM m),
         fit2 AS (SELECT nd, std, sxd, Stt, Stx / Stt AS b1,
           (Sxx2 - Stx * Stx / Stt) / (nd - 2.0) AS s2
         FROM fit),
         rows_ AS (SELECT t, x,
           1.0 / nd + (CAST(t AS DOUBLE) - std / nd)
             * (CAST(t AS DOUBLE) - std / nd) / Stt AS h,
           CAST(x AS DOUBLE) - (sxd / nd
             + b1 * (CAST(t AS DOUBLE) - std / nd)) AS e,
           s2
         FROM idx CROSS JOIN fit2)
         SELECT t, x, round(h, 6) AS leverage,
           round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6) AS cooks_d
         FROM rows_
         ORDER BY cooks_d DESC, t ASC LIMIT 10""",

    "q308_zipf_slope" ->
      """WITH tc AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
               FROM documents)
         GROUP BY 1),
         top AS (SELECT term, cnt FROM tc
           ORDER BY cnt DESC, term ASC LIMIT 500),
         ranked AS (SELECT
           CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) AS BIGINT)
             AS rank, cnt
         FROM top),
         lr AS (SELECT rank,
           round(ln(CAST(rank AS DOUBLE)), 9) AS lx,
           round(ln(CAST(cnt AS DOUBLE)), 9) AS ly
         FROM ranked),
         f AS (SELECT CAST(count(*) AS BIGINT) AS n,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(lx ORDER BY rank)), (a, e) -> round(a + e, 12)) AS sx,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(ly ORDER BY rank)), (a, e) -> round(a + e, 12)) AS sy,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(lx * ly, 12) ORDER BY rank)),
             (a, e) -> round(a + e, 12)) AS sxy,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(lx * lx, 12) ORDER BY rank)),
             (a, e) -> round(a + e, 12)) AS sxx
         FROM lr)
         SELECT n AS n_terms,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope
         FROM f""",

    "q309_burstiness" ->
      """WITH td AS (SELECT t AS term, doc_id, CAST(count(*) AS BIGINT) AS c
         FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS t
               FROM documents)
         GROUP BY 1, 2),
         top AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM td GROUP BY 1 ORDER BY df DESC, term ASC LIMIT 20),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         g AS (SELECT td.term, top.df,
           CAST(sum(td.c) AS BIGINT) AS sc,
           CAST(sum(td.c * td.c) AS BIGINT) AS scc
         FROM td JOIN top ON td.term = top.term
         GROUP BY 1, 2)
         SELECT term, df,
           round(CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE), 6) AS mean_count,
           round((CAST(scc AS DOUBLE) / CAST(nd AS DOUBLE)
             - (CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE))
               * (CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE)))
             / (CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE)), 6) AS fano
         FROM g CROSS JOIN nd""",

    "q310_source_pair_kl" ->
      """WITH st AS (SELECT source, t AS term, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT source,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS t
               FROM documents)
         GROUP BY 1, 2),
         vocab AS (SELECT term FROM
           (SELECT term, CAST(sum(cnt) AS BIGINT) AS tc FROM st GROUP BY 1)
           ORDER BY tc DESC, term ASC LIMIT 200),
         sources AS (SELECT DISTINCT source FROM st),
         grid AS (SELECT s.source, v.term, coalesce(st.cnt, 0) AS c
           FROM sources s CROSS JOIN vocab v
           LEFT JOIN st ON st.source = s.source AND st.term = v.term),
         totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS v
           FROM grid GROUP BY 1),
         g AS (SELECT grid.source, grid.term, grid.c, totals.tot, totals.v
           FROM grid JOIN totals ON grid.source = totals.source),
         pair AS (SELECT a.source AS source_a, b.source AS source_b, a.term,
           round(((CAST(a.c AS DOUBLE) + 1.0) / (CAST(a.tot AS DOUBLE) + CAST(a.v AS DOUBLE)))
             * ln(((CAST(a.c AS DOUBLE) + 1.0) / (CAST(a.tot AS DOUBLE) + CAST(a.v AS DOUBLE)))
               / ((CAST(b.c AS DOUBLE) + 1.0) / (CAST(b.tot AS DOUBLE) + CAST(b.v AS DOUBLE)))),
             12) AS kterm
         FROM g a JOIN g b ON a.term = b.term AND a.source <> b.source)
         SELECT source_a, source_b,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(kterm ORDER BY term)), (a, e) -> round(a + e, 12)) AS kl
         FROM pair GROUP BY 1, 2""",

    "q311_mann_kendall" ->
      """WITH monthly AS (SELECT strftime(o_orderdate, '%Y-%m') AS m,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         pr AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
           FROM monthly a JOIN monthly b ON a.m < b.m),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM monthly),
         ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
             AS BIGINT) AS tie_corr
           FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM monthly
                 GROUP BY x HAVING count(*) > 1)),
         c AS (SELECT n.n AS n_months, pr.s_stat,
           (CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1.0)
             * (2.0 * CAST(n.n AS DOUBLE) + 5.0)
             - CAST(ties.tie_corr AS DOUBLE)) / 18.0 AS v
         FROM pr CROSS JOIN n CROSS JOIN ties)
         SELECT n_months, s_stat,
           round(CASE WHEN v <= 0 THEN NULL
             WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(v)
             WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(v)
             ELSE 0.0 END, 6) AS z,
           CASE WHEN s_stat > 0 THEN 'increasing'
             WHEN s_stat < 0 THEN 'decreasing'
             ELSE 'no trend' END AS trend
         FROM c""",

    "q312_wilcoxon_brand" ->
      """WITH cells AS (SELECT p_brand AS brand,
           CAST(month(l_shipdate) AS INTEGER) AS moy,
           CAST(year(l_shipdate) AS INTEGER) AS yr,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS c
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE year(l_shipdate) IN (1995, 1996)
         GROUP BY 1, 2, 3),
         paired AS (SELECT brand, moy,
           CAST(sum(CASE WHEN yr = 1996 THEN c ELSE 0 END)
             - sum(CASE WHEN yr = 1995 THEN c ELSE 0 END) AS BIGINT) AS dd
         FROM cells GROUP BY 1, 2 HAVING count(*) = 2),
         nz AS (SELECT brand, dd, abs(dd) AS absd FROM paired WHERE dd <> 0),
         ranked AS (SELECT brand, dd, absd,
           CAST(rank() OVER (PARTITION BY brand ORDER BY absd ASC) AS BIGINT)
             AS minrank
         FROM nz),
         tiesz AS (SELECT brand, absd, CAST(count(*) AS BIGINT) AS tsz,
             CAST(max(minrank) AS BIGINT) AS mr
           FROM ranked GROUP BY 1, 2),
         withavg AS (SELECT r.brand, r.dd, t.mr * 2 + t.tsz - 1 AS avg2, t.tsz
           FROM ranked r JOIN tiesz t ON r.brand = t.brand AND r.absd = t.absd),
         stats AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN dd > 0 THEN avg2 ELSE 0 END) AS BIGINT) AS w2p
           FROM withavg GROUP BY 1),
         tc AS (SELECT brand,
             CAST(sum(tsz * tsz * tsz - tsz) AS BIGINT) AS t3
           FROM tiesz GROUP BY 1)
         SELECT s.brand, s.n AS n_pairs, s.w2p,
           round((CAST(s.w2p AS DOUBLE) / 2.0
             - CAST(s.n AS DOUBLE) * (CAST(s.n AS DOUBLE) + 1.0) / 4.0)
             / sqrt(CAST(s.n AS DOUBLE) * (CAST(s.n AS DOUBLE) + 1.0)
               * (2.0 * CAST(s.n AS DOUBLE) + 1.0) / 24.0
               - CAST(tc.t3 AS DOUBLE) / 48.0), 6) AS z
         FROM stats s JOIN tc ON s.brand = tc.brand""",

    "q313_seasonality_strength" ->
      """WITH daily AS (SELECT
           (CAST(day AS DATE) - DATE '1970-01-01') % 7 AS w, x
         FROM (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS x
           FROM orders GROUP BY 1)),
         byw AS (SELECT w, CAST(count(*) AS BIGINT) AS nw,
           CAST(sum(x) AS BIGINT) AS sw,
           sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sww
         FROM daily GROUP BY 1),
         tot AS (SELECT CAST(sum(nw) AS BIGINT) AS n,
           CAST(sum(sw) AS BIGINT) AS sx,
           CAST(sum(sww) AS DOUBLE) AS sxx,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
               / CAST(nw AS DOUBLE), 6) ORDER BY w)),
             (a, e) -> round(a + e, 6)) AS fitss
         FROM byw)
         SELECT n AS n_days,
           round(greatest(0.0,
             1.0 - (sxx - fitss)
               / (sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE))), 6) AS seasonal_strength
         FROM tot""",

    "q314_kruskal_wallis" ->
      """WITH v AS (SELECT c_mktsegment AS g,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM orders JOIN customer ON o_custkey = c_custkey),
         cells AS (SELECT v, g, CAST(count(*) AS BIGINT) AS cgv
           FROM v GROUP BY 1, 2),
         grid AS (SELECT v, CAST(sum(cgv) AS BIGINT) AS cnt
           FROM cells GROUP BY 1),
         cum AS (SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           FROM grid),
         a2 AS (SELECT v, 2 * cum - cnt + 1 AS avg2 FROM cum),
         gr AS (SELECT g, CAST(sum(cgv) AS BIGINT) AS ng,
             sum(CAST(cgv AS DECIMAL(19,0)) * CAST(avg2 AS DECIMAL(19,0)))
               AS r2
           FROM cells JOIN a2 USING (v) GROUP BY 1),
         ties AS (SELECT sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)
             * CAST(cnt AS HUGEINT) - CAST(cnt AS HUGEINT)) AS t3 FROM grid),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng) AS BIGINT) AS n FROM gr),
         terms AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
               / (4.0 * CAST(ng AS DOUBLE)), 6) ORDER BY g)),
             (a, e) -> round(a + e, 6)) AS sr FROM gr)
         SELECT k AS n_groups, n AS n_obs,
           round(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * sr
             - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h_stat,
           round((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * sr
             - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             / (1.0 - CAST(t3 AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(n AS DOUBLE))), 6) AS h_tie_corrected
         FROM tot CROSS JOIN terms CROSS JOIN ties""",

    "q315_friedman" ->
      """WITH rev AS (SELECT n_name AS nat, CAST(month(o_orderdate) AS INT)
             AS m,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         WHERE year(o_orderdate) = 1995 GROUP BY 1, 2),
         full_g AS (SELECT n.nat, m.m, coalesce(r.x, 0) AS x
           FROM (SELECT n_name AS nat FROM nation) n
           CROSS JOIN (SELECT CAST(unnest(range(1, 13)) AS INT) AS m) m
           LEFT JOIN rev r ON r.nat = n.nat AND r.m = m.m),
         ranked AS (SELECT nat, m, x,
             CAST(rank() OVER (PARTITION BY m ORDER BY x ASC) AS BIGINT)
               AS minrank
           FROM full_g),
         tz AS (SELECT m, x, CAST(count(*) AS BIGINT) AS tsz,
             max(minrank) AS mr
           FROM ranked GROUP BY 1, 2),
         avg2 AS (SELECT r.nat, r.m, t.mr * 2 + t.tsz - 1 AS avg2
           FROM ranked r JOIN tz t ON r.m = t.m AND r.x = t.x),
         pn AS (SELECT nat, CAST(sum(avg2) AS BIGINT) AS r2j,
             CAST(count(*) AS BIGINT) AS nb FROM avg2 GROUP BY 1),
         aa AS (SELECT CAST(sum(avg2 * avg2) AS BIGINT) AS a2 FROM avg2),
         k AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(max(nb) AS BIGINT) AS n FROM pn),
         num AS (SELECT CAST(sum((r2j - k.n * (k.k + 1))
             * (r2j - k.n * (k.k + 1))) AS BIGINT) AS snum
           FROM pn CROSS JOIN k)
         SELECT k.k AS k_treatments, k.n AS n_blocks,
           round((CAST(k.k AS DOUBLE) - 1.0) * CAST(snum AS DOUBLE)
             / (CAST(a2 AS DOUBLE) - CAST(k.n AS DOUBLE) * CAST(k.k AS DOUBLE)
               * (CAST(k.k AS DOUBLE) + 1.0) * (CAST(k.k AS DOUBLE) + 1.0)),
             6) AS q_stat
         FROM k CROSS JOIN num CROSS JOIN aa""",

    "q316_durbin_watson" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS HUGEINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             x FROM daily),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS st,
             sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS stt,
             sum(x) AS sx, sum(x * x) AS sxx,
             sum(CAST(t AS HUGEINT) * x) AS stx
           FROM idx),
         dd AS (SELECT sum(a.x - b.x) AS sd,
             sum((a.x - b.x) * (a.x - b.x)) AS sdd
           FROM idx a JOIN idx b ON a.t = b.t + 1),
         f AS (SELECT *, (CAST(n AS DOUBLE) * CAST(stx AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
           FROM m CROSS JOIN dd),
         g AS (SELECT *, (CAST(sx AS DOUBLE) - b * CAST(st AS DOUBLE))
             / CAST(n AS DOUBLE) AS a FROM f)
         SELECT n AS n_days, round(b, 6) AS slope_cents,
           round((CAST(sdd AS DOUBLE) - 2.0 * b * CAST(sd AS DOUBLE)
               + (CAST(n AS DOUBLE) - 1.0) * b * b)
             / (CAST(sxx AS DOUBLE) - 2.0 * a * CAST(sx AS DOUBLE)
               - 2.0 * b * CAST(stx AS DOUBLE)
               + CAST(n AS DOUBLE) * a * a
               + 2.0 * a * b * CAST(st AS DOUBLE)
               + b * b * CAST(stt AS DOUBLE)), 6) AS dw
         FROM g""",

    "q317_ljung_box" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS HUGEINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             x FROM daily),
         g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
             sum(x * x) AS sxx FROM idx),
         p AS (SELECT l.lag, sum(a.x) AS s1, sum(b.x) AS s2,
             sum(a.x * b.x) AS s12, CAST(count(*) AS BIGINT) AS nl
           FROM range(1, 8) l(lag)
           CROSS JOIN idx a JOIN idx b ON a.t + l.lag = b.t
           GROUP BY 1),
         rho AS (SELECT lag, g.n,
             (CAST(s12 AS DOUBLE) - (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE))
               + CAST(nl AS DOUBLE)
                 * ((CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
                   * (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))))
             / (CAST(g.sxx AS DOUBLE) - CAST(g.n AS DOUBLE)
                 * ((CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
                   * (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)))) AS rho
           FROM p CROSS JOIN g),
         f AS (SELECT n, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(rho * rho
               / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE)), 12)
               ORDER BY lag)),
             (a, e) -> round(a + e, 12)) AS srho FROM rho GROUP BY 1)
         SELECT n AS n_days, CAST(7 AS BIGINT) AS n_lags,
           round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * srho, 6)
             AS q_lb
         FROM f""",

    "q318_page_hinkley" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
           SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             day, x
           FROM (SELECT date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS day,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1)),
         rec AS (
           SELECT t, CAST(1 AS BIGINT) AS i, x AS sx,
             CAST(0.0 AS DOUBLE) AS m, CAST(0.0 AS DOUBLE) AS mn,
             CAST(0.0 AS DOUBLE) AS ph, day AS argd
           FROM daily WHERE t = 1
           UNION ALL
           SELECT d.t, r.i + 1 AS i, r.sx + d.x AS sx,
             round(r.m + (CAST(d.x AS DOUBLE)
               - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
               / 1.0e8, 6) AS m,
             least(r.mn, round(r.m + (CAST(d.x AS DOUBLE)
               - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
               / 1.0e8, 6)) AS mn,
             CASE WHEN round(round(r.m + (CAST(d.x AS DOUBLE)
                   - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
                   / 1.0e8, 6)
                 - least(r.mn, round(r.m + (CAST(d.x AS DOUBLE)
                   - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
                   / 1.0e8, 6)), 6) > r.ph
               THEN round(round(r.m + (CAST(d.x AS DOUBLE)
                   - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
                   / 1.0e8, 6)
                 - least(r.mn, round(r.m + (CAST(d.x AS DOUBLE)
                   - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
                   / 1.0e8, 6)), 6)
               ELSE r.ph END AS ph,
             CASE WHEN round(round(r.m + (CAST(d.x AS DOUBLE)
                   - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
                   / 1.0e8, 6)
                 - least(r.mn, round(r.m + (CAST(d.x AS DOUBLE)
                   - CAST(r.sx + d.x AS DOUBLE) / CAST(r.i + 1 AS DOUBLE))
                   / 1.0e8, 6)), 6) > r.ph
               THEN d.day ELSE r.argd END AS argd
           FROM rec r JOIN daily d ON d.t = r.t + 1)
         SELECT i AS n_days, ph AS max_ph, argd AS day_at_max
         FROM rec WHERE t = (SELECT max(t) FROM daily)""",

    "q319_odds_ratio" ->
      """WITH cells AS (SELECT p_brand AS brand,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS a,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT)
             AS b
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
         tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
             CAST(sum(b) AS BIGINT) AS tb FROM cells),
         f AS (SELECT brand, a, b, ta - a AS c, tb - b AS d
           FROM cells CROSS JOIN tot),
         g AS (SELECT brand, a, b,
             CAST(CAST(a AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))
               AS DOUBLE)
               / CAST(CAST(b AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
                 AS DOUBLE) AS orv,
             sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
               + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)) AS se
           FROM f WHERE a > 0 AND b > 0 AND c > 0 AND d > 0)
         SELECT brand, a AS n_ret, b AS n_kept,
           round(orv, 6) AS odds_ratio,
           round(exp(ln(orv) - 1.96 * se), 6) AS ci_lo,
           round(exp(ln(orv) + 1.96 * se), 6) AS ci_hi
         FROM g""",

    "q320_price_index" ->
      """WITH li AS (SELECT p_brand AS brand, year(l_shipdate) AS yr,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS rev,
           CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE year(l_shipdate) IN (1995, 1996) GROUP BY 1, 2),
         wide AS (SELECT brand,
             CAST(sum(CASE WHEN yr = 1995 THEN rev ELSE 0 END) AS BIGINT)
               AS r0,
             CAST(sum(CASE WHEN yr = 1995 THEN qty ELSE 0 END) AS BIGINT)
               AS q0,
             CAST(sum(CASE WHEN yr = 1996 THEN rev ELSE 0 END) AS BIGINT)
               AS r1,
             CAST(sum(CASE WHEN yr = 1996 THEN qty ELSE 0 END) AS BIGINT)
               AS q1
           FROM li GROUP BY 1),
         w2 AS (SELECT * FROM wide WHERE q0 > 0 AND q1 > 0),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_brands,
             CAST(sum(r0) AS BIGINT) AS sr0, CAST(sum(r1) AS BIGINT) AS sr1
           FROM w2),
         folds AS (SELECT
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                 * CAST(q0 AS DOUBLE) ORDER BY brand)),
               (a, e) -> a + e) AS lnum,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)
                 * CAST(q1 AS DOUBLE) ORDER BY brand)),
               (a, e) -> a + e) AS pden
           FROM w2)
         SELECT n_brands, round(lnum / CAST(sr0 AS DOUBLE), 6) AS laspeyres,
           round(CAST(sr1 AS DOUBLE) / pden, 6) AS paasche,
           round(sqrt((lnum / CAST(sr0 AS DOUBLE))
             * (CAST(sr1 AS DOUBLE) / pden)), 6) AS fisher
         FROM tot CROSS JOIN folds""",

    "q321_eoq" ->
      """WITH demand AS (SELECT p_brand AS brand,
           CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS d100
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE year(l_shipdate) = 1995 GROUP BY 1),
         price AS (SELECT p_brand AS brand,
             CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS pc,
             CAST(count(*) AS BIGINT) AS np
           FROM part GROUP BY 1),
         f AS (SELECT d.brand, CAST(d100 AS DOUBLE) / 100.0 AS dd,
             0.2 * (CAST(pc AS DOUBLE) / 100.0 / CAST(np AS DOUBLE)) AS h
           FROM demand d JOIN price p ON d.brand = p.brand)
         SELECT brand, round(dd, 2) AS annual_demand,
           round(h, 6) AS holding_cost,
           round(sqrt(2.0 * dd * 100.0 / h), 4) AS eoq
         FROM f""",

    "q322_lorenz_curve" ->
      """WITH spend AS (SELECT o_custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS v
         FROM orders GROUP BY 1),
         grid AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(v AS HUGEINT) * count(*) AS sv
           FROM spend GROUP BY 1),
         cum AS (SELECT v, cnt, sv,
             CAST(sum(cnt) OVER (ORDER BY v ASC ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn,
             sum(sv) OVER (ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cums
           FROM grid),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, sum(sv) AS stot
           FROM grid),
         d AS (SELECT unnest(range(1, 11)) AS k)
         SELECT k AS decile, (k * n) // 10 AS n_cust,
           round(CAST(cums - (cumn - (k * n) // 10) * CAST(v AS HUGEINT)
             AS DOUBLE) / CAST(stot AS DOUBLE), 6) AS cum_spend_share
         FROM cum CROSS JOIN tot CROSS JOIN d
         WHERE cumn - cnt < (k * n) // 10 AND (k * n) // 10 <= cumn""",

    "q323_kde_grid" ->
      """WITH x AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             AS BIGINT) AS x FROM orders),
         mm AS (SELECT CAST(min(x) AS BIGINT) AS lo,
             CAST(max(x) AS BIGINT) AS hi, CAST(count(*) AS BIGINT) AS n
           FROM x),
         bins AS (SELECT (x - lo) * 400 // (hi - lo) AS b,
             CAST(count(*) AS BIGINT) AS cnt
           FROM x CROSS JOIN mm GROUP BY 1),
         params AS (SELECT lo, hi, n,
             (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) / 20.0 AS h,
             (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) / 400.0 AS w
           FROM mm),
         grid AS (SELECT unnest(range(0, 41)) AS i),
         t1 AS (SELECT g.i, p.n, p.h, p.w, p.lo,
             CAST(p.lo AS DOUBLE) + CAST(g.i AS DOUBLE)
               * (CAST(p.hi AS DOUBLE) - CAST(p.lo AS DOUBLE)) / 40.0 AS gp
           FROM grid g CROSS JOIN params p),
         t2 AS (SELECT t1.i, t1.n, t1.h, t1.gp, b.b,
             (t1.gp - (CAST(t1.lo AS DOUBLE)
               + (CAST(b.b AS DOUBLE) + 0.5) * t1.w)) / t1.h AS u,
             b.cnt
           FROM t1 JOIN bins b
             ON abs(t1.gp - (CAST(t1.lo AS DOUBLE)
               + (CAST(b.b AS DOUBLE) + 0.5) * t1.w)) < t1.h),
         t3 AS (SELECT i, n, h, gp, b,
             CAST(cnt AS DOUBLE) * 0.75 * (1.0 - u * u) AS kv
           FROM t2),
         f AS (SELECT i, gp,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(kv ORDER BY b)), (a, e) -> a + e) AS ks,
             max(n) AS n, max(h) AS h
           FROM t3 GROUP BY 1, 2)
         SELECT i AS grid_i, round(gp, 4) AS g_cents,
           round(ks / (CAST(n AS DOUBLE) * h), 12) AS density
         FROM f""",

    "q324_gof_weekday" ->
      """WITH cells AS (SELECT date_diff('day', DATE '1970-01-01',
             CAST(o_orderdate AS DATE)) % 7 AS w,
           CAST(count(*) AS BIGINT) AS o
         FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
         t AS (SELECT w, n,
             round((CAST(o AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
               * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
               / (CAST(n AS DOUBLE) / 7.0), 9) AS t
           FROM cells CROSS JOIN tot)
         SELECT n AS n_obs, CAST(6 AS BIGINT) AS df,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(t ORDER BY w)), (a, e) -> round(a + e, 9)) AS chi2
         FROM t GROUP BY 1""",

    "q325_effect_size" ->
      """WITH v AS (SELECT c_mktsegment = 'BUILDING' AS g1,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         m AS (SELECT g1, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
           FROM v GROUP BY 1),
         wide AS (SELECT
             CAST(sum(CASE WHEN g1 THEN n ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g1 THEN s ELSE 0 END) AS BIGINT) AS s1,
             sum(CASE WHEN g1 THEN q ELSE 0 END) AS q1,
             CAST(sum(CASE WHEN NOT g1 THEN n ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN NOT g1 THEN s ELSE 0 END) AS BIGINT) AS s2,
             sum(CASE WHEN NOT g1 THEN q ELSE 0 END) AS q2
           FROM m),
         f AS (SELECT n1, n2,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
             CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(n1 AS DOUBLE) AS ss1,
             CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
               / CAST(n2 AS DOUBLE) AS ss2
           FROM wide),
         g AS (SELECT n1, n2, (m1 - m2) / sqrt((ss1 + ss2)
             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) AS cd
           FROM f)
         SELECT n1, n2, round(cd, 6) AS cohens_d,
           round(cd * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE)
             + CAST(n2 AS DOUBLE)) - 9.0)), 6) AS hedges_g
         FROM g""",

    "q332_hurst_rs" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             x FROM daily),
         nn AS (SELECT max(t) AS nn FROM idx),
         sizes AS (SELECT CAST(unnest([16, 32, 64, 128]) AS INT) AS bs),
         blocks AS (SELECT i.t, i.x, s.bs, (i.t - 1) // s.bs AS blk
           FROM idx i CROSS JOIN sizes s CROSS JOIN nn
           WHERE ((i.t - 1) // s.bs + 1) * s.bs <= nn.nn),
         btot AS (SELECT bs, blk, CAST(sum(x) AS BIGINT) AS sx,
             sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx
           FROM blocks GROUP BY 1, 2),
         wc AS (SELECT b.bs, b.blk,
             CAST(sum(b.x) OVER (PARTITION BY b.bs, b.blk ORDER BY b.t ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             b.t - b.blk * b.bs AS k, bt.sx, bt.sxx
           FROM blocks b JOIN btot bt ON b.bs = bt.bs AND b.blk = bt.blk),
         bstats AS (SELECT bs, blk, max(sx) AS sx, max(sxx) AS sxx,
             max(CAST(bs AS DECIMAL(19,0)) * CAST(cum AS DECIMAL(19,0))
               - CAST(k AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)))
               AS devmax,
             min(CAST(bs AS DECIMAL(19,0)) * CAST(cum AS DECIMAL(19,0))
               - CAST(k AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)))
               AS devmin
           FROM wc GROUP BY 1, 2),
         rs AS (SELECT bs, blk,
             round(((CAST(devmax AS DOUBLE) - CAST(devmin AS DOUBLE))
                 / CAST(bs AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(bs AS DOUBLE))
                 / CAST(bs AS DOUBLE)), 9) AS rs
           FROM bstats),
         ps AS (SELECT bs, CAST(count(*) AS BIGINT) AS nb,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(rs ORDER BY blk)), (a, e) -> round(a + e, 9)) AS srs
           FROM rs GROUP BY 1),
         pts AS (SELECT bs, round(ln(CAST(bs AS DOUBLE)), 9) AS lx,
             round(ln(srs / CAST(nb AS DOUBLE)), 9) AS ly FROM ps),
         fit AS (SELECT CAST(count(*) AS BIGINT) AS n_sizes,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx ORDER BY bs)), (a, e) -> round(a + e, 12)) AS slx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ly ORDER BY bs)), (a, e) -> round(a + e, 12)) AS sly,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx * ly ORDER BY bs)), (a, e) -> round(a + e, 12)) AS sxy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx * lx ORDER BY bs)), (a, e) -> round(a + e, 12)) AS sxx
           FROM pts)
         SELECT n_sizes,
           round((CAST(n_sizes AS DOUBLE) * sxy - slx * sly)
             / (CAST(n_sizes AS DOUBLE) * sxx - slx * slx), 6) AS hurst
         FROM fit""",

    "q333_binseg_split" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             day, x,
             CAST(sum(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cum
           FROM daily),
         tot AS (SELECT max(t) AS nn, CAST(sum(x) AS BIGINT) AS ss FROM idx),
         g AS (SELECT t, day, cum, nn, ss,
             CAST(cum AS DOUBLE) * CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)
               + (CAST(ss AS DOUBLE) - CAST(cum AS DOUBLE))
                 * (CAST(ss AS DOUBLE) - CAST(cum AS DOUBLE))
                 / (CAST(nn AS DOUBLE) - CAST(t AS DOUBLE))
               - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)
               AS gain
           FROM idx CROSS JOIN tot WHERE t < nn),
         b AS (SELECT (max(struct_pack(g := gain, negt := -t))).negt AS negt
           FROM g)
         SELECT nn AS n_days, t AS split_t,
           strftime(day, '%Y-%m-%d') AS split_day,
           gain,
           CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) AS mean_before,
           (CAST(ss AS DOUBLE) - CAST(cum AS DOUBLE))
             / (CAST(nn AS DOUBLE) - CAST(t AS DOUBLE)) AS mean_after
         FROM g JOIN b ON g.t = -b.negt""",

    "q334_weibull_fit" ->
      """WITH grid AS (SELECT date_diff('day', CAST(o_orderdate AS DATE),
             CAST(l_shipdate AS DATE)) AS dur,
           CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE date_diff('day', CAST(o_orderdate AS DATE),
           CAST(l_shipdate AS DATE)) > 0
         GROUP BY 1),
         cum AS (SELECT dur, cnt, CAST(sum(cnt) OVER (ORDER BY dur ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum
           FROM grid),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn FROM grid),
         pts AS (SELECT dur, round(ln(CAST(dur AS DOUBLE)), 9) AS lx,
             round(ln(-ln(1.0 - CAST(cum AS DOUBLE)
               / (CAST(nn AS DOUBLE) + 1.0))), 9) AS ly
           FROM cum CROSS JOIN tot),
         fit AS (SELECT CAST(count(*) AS BIGINT) AS n_grid,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx ORDER BY dur)), (a, e) -> round(a + e, 12)) AS slx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ly ORDER BY dur)), (a, e) -> round(a + e, 12)) AS sly,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx * ly ORDER BY dur)), (a, e) -> round(a + e, 12))
               AS sxy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lx * lx ORDER BY dur)), (a, e) -> round(a + e, 12))
               AS sxx
           FROM pts),
         sh AS (SELECT n_grid, slx, sly,
             (CAST(n_grid AS DOUBLE) * sxy - slx * sly)
               / (CAST(n_grid AS DOUBLE) * sxx - slx * slx) AS shape
           FROM fit)
         SELECT n_grid, round(shape, 6) AS shape,
           round(exp(-((sly - shape * slx) / CAST(n_grid AS DOUBLE))
             / shape), 6) AS scale_days
         FROM sh""",

    "q335_gumbel_maxima" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         maxima AS (SELECT strftime(day, '%Y-%m') AS month,
             CAST(max(x) AS BIGINT) AS mx
           FROM daily GROUP BY 1),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mx) AS BIGINT) AS sx,
             sum(CAST(mx AS DECIMAL(19,0)) * CAST(mx AS DECIMAL(19,0)))
               AS sxx
           FROM maxima),
         f AS (SELECT n, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0)) AS sd
           FROM m),
         g AS (SELECT n, mean, sd,
             sd * sqrt(6.0) / CAST(3.141592653589793 AS DOUBLE) AS beta
           FROM f),
         h AS (SELECT n, beta,
             mean - CAST(0.5772156649015329 AS DOUBLE) * beta AS mu
           FROM g)
         SELECT n AS n_months, round(mu, 4) AS mu_cents,
           round(beta, 4) AS beta_cents,
           round(mu - beta * ln(-ln(1.0 - 1.0 / 12.0)), 4)
             AS return_level_12m
         FROM h""",

    "q336_bass_diffusion" ->
      """WITH firsts AS (SELECT o_custkey,
           min(strftime(o_orderdate, '%Y-%m')) AS month
         FROM orders GROUP BY 1),
         mt AS (SELECT month, CAST(count(*) AS BIGINT) AS nt
           FROM firsts GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY month) AS BIGINT)
             AS t, nt,
             CAST(sum(nt) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) - nt AS cprev
           FROM mt),
         mom AS (SELECT CAST(count(*) AS BIGINT) AS s0,
             CAST(sum(cprev) AS BIGINT) AS s1,
             sum(CAST(cprev AS HUGEINT) * CAST(cprev AS HUGEINT)) AS s2,
             sum(CAST(cprev AS HUGEINT) * CAST(cprev AS HUGEINT)
               * CAST(cprev AS HUGEINT)) AS s3,
             sum(CAST(cprev AS HUGEINT) * CAST(cprev AS HUGEINT)
               * CAST(cprev AS HUGEINT) * CAST(cprev AS HUGEINT)) AS s4,
             CAST(sum(nt) AS BIGINT) AS sy,
             sum(CAST(cprev AS HUGEINT) * CAST(nt AS HUGEINT)) AS sxy,
             sum(CAST(cprev AS HUGEINT) * CAST(cprev AS HUGEINT)
               * CAST(nt AS HUGEINT)) AS sx2y
           FROM idx),
         f1 AS (SELECT *,
             CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)
               - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)
               - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) AS det
           FROM mom),
         f2 AS (SELECT *,
             (CAST(sy AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)
               - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)
               - CAST(sx2y AS DOUBLE) * CAST(s3 AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE)
               - CAST(sx2y AS DOUBLE) * CAST(s2 AS DOUBLE))) / det AS a,
             (CAST(s0 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)
               - CAST(s3 AS DOUBLE) * CAST(sx2y AS DOUBLE))
             - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)
               - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE)
               * CAST(sx2y AS DOUBLE)
               - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE))) / det AS b,
             (CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE)
               * CAST(sx2y AS DOUBLE)
               - CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE)
               * CAST(sx2y AS DOUBLE)
               - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))) / det AS c
           FROM f1),
         f3 AS (SELECT *, b * b - 4.0 * a * c AS disc FROM f2),
         f4 AS (SELECT *, CASE WHEN disc >= 0 AND c <> 0.0
             THEN (-b - sqrt(disc)) / (2.0 * c) ELSE NULL END AS m
           FROM f3),
         f5 AS (SELECT *, a / m AS p FROM f4)
         SELECT s0 AS n_months, round(a, 6) AS a, round(b, 6) AS b,
           round(c, 9) AS c, round(m, 2) AS m_total,
           round(p, 6) AS p_innov, round(b + p, 6) AS q_imit
         FROM f5""",

    "q338_sprt" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
           SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             day, n, k
           FROM (SELECT date_diff('day', DATE '1970-01-01',
               CAST(l_shipdate AS DATE)) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS k
           FROM lineitem GROUP BY 1)),
         rec AS (
           SELECT t,
             round(0.0 + (CAST(k AS DOUBLE)
               * CAST(0.26236426446749106 AS DOUBLE)
               + CAST(n - k AS DOUBLE)
                 * CAST(-0.07796154146971193 AS DOUBLE)), 6) AS llr,
             CASE WHEN round(0.0 + (CAST(k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(n - k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 >= CAST(2.9444389791664403 AS DOUBLE) THEN 1
               WHEN round(0.0 + (CAST(k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(n - k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 <= -CAST(2.9444389791664403 AS DOUBLE) THEN -1
               ELSE 0 END AS dec,
             CASE WHEN round(0.0 + (CAST(k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(n - k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 >= CAST(2.9444389791664403 AS DOUBLE)
                 OR round(0.0 + (CAST(k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(n - k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 <= -CAST(2.9444389791664403 AS DOUBLE)
               THEN day ELSE 0 END AS decday
           FROM daily WHERE t = 1
           UNION ALL
           SELECT d.t,
             round(r.llr + (CAST(d.k AS DOUBLE)
               * CAST(0.26236426446749106 AS DOUBLE)
               + CAST(d.n - d.k AS DOUBLE)
                 * CAST(-0.07796154146971193 AS DOUBLE)), 6) AS llr,
             CASE WHEN r.dec <> 0 THEN r.dec
               WHEN round(r.llr + (CAST(d.k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(d.n - d.k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 >= CAST(2.9444389791664403 AS DOUBLE) THEN 1
               WHEN round(r.llr + (CAST(d.k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(d.n - d.k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 <= -CAST(2.9444389791664403 AS DOUBLE) THEN -1
               ELSE 0 END AS dec,
             CASE WHEN r.dec <> 0 THEN r.decday
               WHEN round(r.llr + (CAST(d.k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(d.n - d.k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 >= CAST(2.9444389791664403 AS DOUBLE)
                 OR round(r.llr + (CAST(d.k AS DOUBLE)
                   * CAST(0.26236426446749106 AS DOUBLE)
                   + CAST(d.n - d.k AS DOUBLE)
                     * CAST(-0.07796154146971193 AS DOUBLE)), 6)
                 <= -CAST(2.9444389791664403 AS DOUBLE)
               THEN d.day ELSE 0 END AS decday
           FROM rec r JOIN daily d ON d.t = r.t + 1)
         SELECT t AS n_days, dec AS decision, decday AS day_at_decision,
           llr AS final_llr
         FROM rec WHERE t = (SELECT max(t) FROM daily)""",

    "q339_markov_entropy" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         nx AS (SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY us,
               event_id) AS nxt
           FROM ev),
         pairs AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
           FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2),
         marg AS (SELECT cur, CAST(sum(cnt) AS BIGINT) AS rt
           FROM pairs GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS gt FROM pairs),
         terms AS (SELECT p.cur, p.nxt,
             round((CAST(m.rt AS DOUBLE) / CAST(gt AS DOUBLE))
               * (CAST(p.cnt AS DOUBLE) / CAST(m.rt AS DOUBLE))
               * ln(CAST(p.cnt AS DOUBLE) / CAST(m.rt AS DOUBLE)), 12)
               AS term
           FROM pairs p JOIN marg m USING (cur) CROSS JOIN tot)
         SELECT CAST(count(DISTINCT cur) AS BIGINT) AS n_states,
           -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(term ORDER BY cur, nxt)), (a, e) -> round(a + e, 12))
             AS entropy_rate_nats
         FROM terms""",

    "q341_cochran_armitage" ->
      """WITH lv AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
             AS w,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
         FROM orders),
         g AS (SELECT w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS r FROM lv GROUP BY 1),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n_levels,
             CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr,
             CAST(sum(w * r) AS BIGINT) AS swr,
             CAST(sum(w * n) AS BIGINT) AS swn,
             CAST(sum(w * w * n) AS BIGINT) AS sw2n
           FROM g)
         SELECT n_levels, nn AS n_obs,
           round((CAST(swr AS DOUBLE) - CAST(swn AS DOUBLE)
               * (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)))
             / sqrt((CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
               * (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
               * (CAST(sw2n AS DOUBLE) - CAST(swn AS DOUBLE)
                 * CAST(swn AS DOUBLE) / CAST(nn AS DOUBLE))), 6) AS z_trend
         FROM t""",

    "q342_capture_recapture" ->
      """WITH byc AS (SELECT o_custkey,
           CAST(max(CASE WHEN year(o_orderdate) = 1994 THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
           CAST(max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
             AS BIGINT) AS b
         FROM orders WHERE year(o_orderdate) IN (1994, 1995) GROUP BY 1)
         SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
           CAST(sum(a * b) AS BIGINT) AS m,
           round((CAST(sum(a) AS DOUBLE) + 1.0)
             * (CAST(sum(b) AS DOUBLE) + 1.0)
             / (CAST(sum(a * b) AS DOUBLE) + 1.0) - 1.0, 2) AS chapman_n
         FROM byc""",

    "q345_series_outliers" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             day, x FROM daily),
         nn AS (SELECT max(t) AS nn FROM idx),
         ctr AS (SELECT t AS tc, day, x AS x0 FROM idx CROSS JOIN nn
           WHERE t >= 4 AND t <= nn - 3),
         win AS (SELECT c.tc, c.day, c.x0, (list_sort(list(i.x)))[4] AS med
           FROM ctr c JOIN idx i ON i.t >= c.tc - 3 AND i.t <= c.tc + 3
           GROUP BY 1, 2, 3),
         md AS (SELECT c.tc, (list_sort(list(abs(i.x - w.med))))[4] AS mad
           FROM ctr c JOIN idx i ON i.t >= c.tc - 3 AND i.t <= c.tc + 3
           JOIN win w ON w.tc = c.tc
           GROUP BY 1)
         SELECT strftime(w.day, '%Y-%m-%d') AS day, w.x0 AS x_cents,
           w.med AS med_cents, m.mad AS mad_cents
         FROM win w JOIN md m ON w.tc = m.tc
         WHERE abs(w.x0 - w.med) > 5 * m.mad""",

    "q347_energy_distance" ->
      """WITH v AS (SELECT c_mktsegment = 'BUILDING' AS g1,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         grid AS (SELECT v,
             CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS cb,
             CAST(v AS HUGEINT)
               * sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS sa,
             CAST(v AS HUGEINT)
               * sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS sb
           FROM v GROUP BY 1),
         cum AS (SELECT v, ca, cb, sa, sb,
             CAST(sum(ca) OVER win AS BIGINT) AS cca,
             CAST(sum(cb) OVER win AS BIGINT) AS ccb,
             sum(sa) OVER win AS csa, sum(sb) OVER win AS csb
           FROM grid WINDOW win AS (ORDER BY v ASC ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW)),
         tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
             CAST(sum(cb) AS BIGINT) AS m,
             sum(sa) AS sat, sum(sb) AS sbt FROM grid),
         t AS (SELECT
             sum(CAST(ca AS HUGEINT) * (CAST(v AS HUGEINT)
               * CAST(ccb - cb AS HUGEINT) - (csb - sb)
               + (sbt - (csb - sb) - sb)
               - CAST(v AS HUGEINT)
                 * CAST(m - (ccb - cb) - cb AS HUGEINT))) AS tab,
             sum(CAST(ca AS HUGEINT) * (CAST(v AS HUGEINT)
               * CAST(cca - ca AS HUGEINT) - (csa - sa)
               + (sat - (csa - sa) - sa)
               - CAST(v AS HUGEINT)
                 * CAST(n - (cca - ca) - ca AS HUGEINT))) AS taa,
             sum(CAST(cb AS HUGEINT) * (CAST(v AS HUGEINT)
               * CAST(ccb - cb AS HUGEINT) - (csb - sb)
               + (sbt - (csb - sb) - sb)
               - CAST(v AS HUGEINT)
                 * CAST(m - (ccb - cb) - cb AS HUGEINT))) AS tbb,
             max(n) AS n, max(m) AS m
           FROM cum CROSS JOIN tot)
         SELECT n, m,
           round(2.0 * CAST(tab AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE))
             - CAST(taa AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             - CAST(tbb AS DOUBLE)
               / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 4)
             AS energy_d2_cents
         FROM t""",

    "q350_crps" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders WHERE year(o_orderdate) IN (1995, 1996) GROUP BY 1),
         v AS (SELECT year(day) = 1995 AS g1, x AS v FROM daily),
         grid AS (SELECT v,
             CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS cb,
             CAST(v AS HUGEINT)
               * sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS sa,
             CAST(v AS HUGEINT)
               * sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS sb
           FROM v GROUP BY 1),
         cum AS (SELECT v, ca, cb, sa, sb,
             CAST(sum(ca) OVER win AS BIGINT) AS cca,
             CAST(sum(cb) OVER win AS BIGINT) AS ccb,
             sum(sa) OVER win AS csa, sum(sb) OVER win AS csb
           FROM grid WINDOW win AS (ORDER BY v ASC ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW)),
         tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
             CAST(sum(cb) AS BIGINT) AS m,
             sum(sa) AS sat, sum(sb) AS sbt FROM grid),
         t AS (SELECT
             sum(CAST(ca AS HUGEINT) * (CAST(v AS HUGEINT)
               * CAST(ccb - cb AS HUGEINT) - (csb - sb)
               + (sbt - (csb - sb) - sb)
               - CAST(v AS HUGEINT)
                 * CAST(m - (ccb - cb) - cb AS HUGEINT))) AS tab,
             sum(CAST(ca AS HUGEINT) * (CAST(v AS HUGEINT)
               * CAST(cca - ca AS HUGEINT) - (csa - sa)
               + (sat - (csa - sa) - sa)
               - CAST(v AS HUGEINT)
                 * CAST(n - (cca - ca) - ca AS HUGEINT))) AS taa,
             max(n) AS n, max(m) AS m
           FROM cum CROSS JOIN tot)
         SELECT n AS n_ensemble, m AS n_outcomes,
           round(CAST(tab AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE))
             - CAST(taa AS DOUBLE)
               / (2.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4)
             AS mean_crps_cents
         FROM t""",

    "q351_cond_entropy" ->
      """WITH cells AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
           CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1, 2),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
         hxy AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(-(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
               * ln(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)), 12)
               ORDER BY x, y)),
             (a, e) -> round(a + e, 12)) AS hxy
           FROM cells CROSS JOIN tot),
         cx AS (SELECT x, CAST(sum(n) AS BIGINT) AS n FROM cells GROUP BY 1),
         hx AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(-(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
               * ln(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)), 12)
               ORDER BY x)),
             (a, e) -> round(a + e, 12)) AS hx
           FROM cx CROSS JOIN tot),
         cy AS (SELECT y, CAST(sum(n) AS BIGINT) AS n FROM cells GROUP BY 1),
         hy AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(round(-(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
               * ln(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)), 12)
               ORDER BY y)),
             (a, e) -> round(a + e, 12)) AS hy
           FROM cy CROSS JOIN tot)
         SELECT hxy AS h_joint,
           hxy - hy AS h_x_given_y,
           hx + hy - hxy AS mutual_info
         FROM hxy CROSS JOIN hx CROSS JOIN hy""",

    "q352_turning_points" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             x FROM daily),
         trip AS (SELECT (l.x < c.x AND c.x > r.x)
             OR (l.x > c.x AND c.x < r.x) AS turn
           FROM idx c JOIN idx l ON c.t = l.t + 1
           JOIN idx r ON c.t = r.t - 1),
         nn AS (SELECT max(t) AS n FROM idx),
         t AS (SELECT CAST(sum(CASE WHEN turn THEN 1 ELSE 0 END) AS BIGINT)
             AS turns FROM trip)
         SELECT n AS n_days, turns,
           round(2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0, 4)
             AS expected_turns,
           round((CAST(turns AS DOUBLE)
               - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
             / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6) AS z
         FROM t CROSS JOIN nn""",

    "q348_business_days" ->
      """WITH li AS (SELECT o_orderpriority AS priority,
           date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS a,
           date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
             AS b
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         w AS (SELECT priority,
             (5 * ((b - 4) // 7) + least((b - 4) % 7 + 1, 5))
             - (5 * ((a - 4) // 7) + least((a - 4) % 7 + 1, 5)) AS bd
           FROM li)
         SELECT priority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(bd) AS BIGINT) AS total_busdays,
           round(CAST(sum(bd) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS avg_busdays
         FROM w GROUP BY 1""",

    "q346_theil_u" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS HUGEINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             x FROM daily),
         p AS (SELECT a.x AS act, b.x AS pred
           FROM idx a JOIN idx b ON a.t = b.t + 7),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum((act - pred) * (act - pred)) AS se,
             sum(act * act) AS sa, sum(pred * pred) AS sp
           FROM p)
         SELECT n AS n_days,
           round(sqrt(CAST(se AS DOUBLE) / CAST(n AS DOUBLE))
             / (sqrt(CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
               + sqrt(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))), 6)
             AS theil_u1
         FROM t""",

    // ── Homogeneity / association tier (q359–q364, round 9) ────────────

    "q359_bartlett" ->
      """WITH g AS (SELECT o_orderpriority AS grp,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s,
           sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS m2
           FROM orders GROUP BY 1),
         per AS (SELECT grp, n,
             (CAST(m2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS v
           FROM g),
         f AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n_total,
             list_sum(list(CAST(n - 1 AS DOUBLE) * v ORDER BY grp)) AS sw,
             list_sum(list(round(CAST(n - 1 AS DOUBLE) * ln(v), 6)
               ORDER BY grp)) AS st,
             list_sum(list(1.0 / CAST(n - 1 AS DOUBLE) ORDER BY grp)) AS sr
           FROM per)
         SELECT k, n_total,
           round(1.0 + (sr - 1.0 / CAST(n_total - k AS DOUBLE))
             / (3.0 * CAST(k - 1 AS DOUBLE)), 6) AS c_factor,
           round((CAST(n_total - k AS DOUBLE)
               * ln(sw / CAST(n_total - k AS DOUBLE)) - st)
             / (1.0 + (sr - 1.0 / CAST(n_total - k AS DOUBLE))
               / (3.0 * CAST(k - 1 AS DOUBLE))), 4) AS t_bartlett
         FROM f""",

    "q360_mood_median" ->
      """WITH o AS (SELECT o_custkey, CAST(o_totalprice AS DOUBLE) AS v
           FROM orders),
         med AS (SELECT quantile_cont(v, 0.5) AS med FROM o),
         cells AS (SELECT n_name,
             CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above,
             CAST(count(*) AS BIGINT) AS n_total
           FROM o CROSS JOIN med
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1),
         tot AS (SELECT CAST(sum(n_above) AS BIGINT) AS ga,
             CAST(sum(n_total) AS BIGINT) AS gn FROM cells)
         SELECT n_name AS nation, n_above, n_total,
           round(CAST(n_total AS DOUBLE) * CAST(ga AS DOUBLE)
             / CAST(gn AS DOUBLE), 4) AS exp_above,
           round((CAST(n_above AS DOUBLE) - CAST(n_total AS DOUBLE)
               * CAST(ga AS DOUBLE) / CAST(gn AS DOUBLE))
             * (CAST(n_above AS DOUBLE) - CAST(n_total AS DOUBLE)
               * CAST(ga AS DOUBLE) / CAST(gn AS DOUBLE))
             / (CAST(n_total AS DOUBLE) * CAST(ga AS DOUBLE)
               / CAST(gn AS DOUBLE))
             + (CAST(n_total - n_above AS DOUBLE)
               - (CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)
                 * CAST(ga AS DOUBLE) / CAST(gn AS DOUBLE)))
             * (CAST(n_total - n_above AS DOUBLE)
               - (CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)
                 * CAST(ga AS DOUBLE) / CAST(gn AS DOUBLE)))
             / (CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)
               * CAST(ga AS DOUBLE) / CAST(gn AS DOUBLE)), 4) AS chi2_part
         FROM cells CROSS JOIN tot""",

    "q361_cramers_v" ->
      """WITH cells AS (SELECT c_nationkey AS nk, o_orderpriority AS prio,
           CAST(count(*) AS BIGINT) AS n_obs
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         rm AS (SELECT nk, CAST(sum(n_obs) AS BIGINT) AS rt
           FROM cells GROUP BY 1),
         cm AS (SELECT prio, CAST(sum(n_obs) AS BIGINT) AS ct
           FROM cells GROUP BY 1),
         rc AS (SELECT CAST(count(DISTINCT nk) AS BIGINT) AS r,
             CAST(count(DISTINCT prio) AS BIGINT) AS cc,
             CAST(sum(n_obs) AS BIGINT) AS n FROM cells),
         parts AS (SELECT nk, prio, r, cc, n,
             round((CAST(n_obs AS DOUBLE) - CAST(rt AS DOUBLE)
                 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n_obs AS DOUBLE) - CAST(rt AS DOUBLE)
                 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                 / CAST(n AS DOUBLE)), 6) AS p2
           FROM cells JOIN rm USING (nk) JOIN cm USING (prio) CROSS JOIN rc),
         s AS (SELECT r, cc, n,
             list_sum(list(p2 ORDER BY nk, prio)) AS chi2
           FROM parts GROUP BY 1, 2, 3)
         SELECT n, r AS r_levels, cc AS c_levels,
           chi2,
           round(sqrt(chi2 / (CAST(n AS DOUBLE)
             * CAST(least(r - 1, cc - 1) AS DOUBLE))), 6) AS cramers_v
         FROM s""",

    "q362_diversity_profile" ->
      """WITH cnt AS (SELECT n_name, p_brand,
           CAST(count(*) AS BIGINT) AS cnt
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
         tot AS (SELECT n_name, CAST(sum(cnt) AS BIGINT) AS tot
           FROM cnt GROUP BY 1),
         terms AS (SELECT cnt.n_name, p_brand, tot,
             round(-(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
               * ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 6) AS hterm,
             round((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
               * (CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 6) AS p2,
             CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS p
           FROM cnt JOIN tot USING (n_name)),
         f AS (SELECT n_name, tot,
             CAST(count(*) AS BIGINT) AS s_brands,
             list_sum(list(hterm ORDER BY p_brand)) AS h,
             list_sum(list(p2 ORDER BY p_brand)) AS sp2,
             max(p) AS bp
           FROM terms GROUP BY 1, 2)
         SELECT n_name AS nation, tot AS n_items, s_brands,
           h AS shannon_h,
           round(1.0 - sp2, 6) AS gini_simpson,
           round(bp, 6) AS berger_parker,
           round(h / ln(CAST(s_brands AS DOUBLE)), 6) AS pielou_j
         FROM f""",

    "q363_cronbach_alpha" ->
      """WITH per AS (SELECT o_custkey AS ck,
           CAST(sum(CASE WHEN quarter(o_orderdate) = 1
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS i1,
           CAST(sum(CASE WHEN quarter(o_orderdate) = 2
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS i2,
           CAST(sum(CASE WHEN quarter(o_orderdate) = 3
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS i3,
           CAST(sum(CASE WHEN quarter(o_orderdate) = 4
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS i4
           FROM orders GROUP BY 1),
         sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum(i1) AS s1, sum(i1 * i1) AS q1,
             sum(i2) AS s2, sum(i2 * i2) AS q2,
             sum(i3) AS s3, sum(i3 * i3) AS q3,
             sum(i4) AS s4, sum(i4 * i4) AS q4,
             sum(i1 + i2 + i3 + i4) AS st,
             sum((i1 + i2 + i3 + i4) * (i1 + i2 + i3 + i4)) AS qt
           FROM per)
         SELECT n AS n_customers, CAST(4 AS BIGINT) AS k_items,
           round((4.0 / 3.0) * (1.0 -
             (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
              + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
              + ((CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
              + ((CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)))
             / ((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))), 6) AS alpha
         FROM sums""",

    "q377_atkinson_grid" ->
      s"""WITH $spendSql,
         grid AS (SELECT nation,
             quantile_cont(CAST(x AS DOUBLE), $decileList) AS g,
             CAST(count(*) AS BIGINT) AS n_customers
           FROM spend GROUP BY 1)
         SELECT nation, n_customers,
           round(list_sum(g) / 10.0, 4) AS grid_mean,
           round(1.0 - (list_sum(list_transform(g, x -> sqrt(x))) / 10.0)
             * (list_sum(list_transform(g, x -> sqrt(x))) / 10.0)
             / (list_sum(g) / 10.0), 6) AS atkinson_05
         FROM grid""",

    "q378_theil_grid" ->
      s"""WITH $spendSql,
         grid AS (SELECT nation,
             quantile_cont(CAST(x AS DOUBLE), $decileList) AS g,
             CAST(count(*) AS BIGINT) AS n_customers
           FROM spend GROUP BY 1)
         SELECT nation, n_customers,
           round(list_sum(g) / 10.0, 4) AS grid_mean,
           round(list_sum(list_transform(g, x ->
             round((x / (list_sum(g) / 10.0))
               * ln(x / (list_sum(g) / 10.0)), 9))) / 10.0, 6) AS theil_t
         FROM grid""",

    "q379_hoover_index" ->
      s"""WITH $spendSql,
         agg1 AS (SELECT nation, CAST(count(*) AS BIGINT) AS n, sum(x) AS st
           FROM spend GROUP BY 1)
         SELECT s.nation, a.n AS n_customers,
           round(CAST(sum(abs(a.n * s.x - a.st)) AS DOUBLE)
             / (2.0 * CAST(a.n AS DOUBLE) * CAST(a.st AS DOUBLE)), 6)
             AS hoover
         FROM spend s JOIN agg1 a USING (nation)
         GROUP BY 1, 2, a.st""",

    "q386_simpson_reversal" ->
      """WITH base AS (SELECT p_brand, CAST(l_quantity AS BIGINT) AS x,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         per AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sx2
           FROM base GROUP BY 1),
         pl AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sx2
           FROM base),
         pb AS (SELECT p_brand, per.n,
             round((CAST(per.n AS DOUBLE) * CAST(per.sxy AS DOUBLE)
                 - CAST(per.sx AS DOUBLE) * CAST(per.sy AS DOUBLE))
               / (CAST(per.n AS DOUBLE) * CAST(per.sx2 AS DOUBLE)
                 - CAST(per.sx AS DOUBLE) * CAST(per.sx AS DOUBLE)), 6)
               AS slope_brand
           FROM per),
         pp AS (SELECT
             round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS slope_pooled
           FROM pl)
         SELECT p_brand AS brand, n AS n_items, slope_brand, slope_pooled,
           sign(slope_brand) <> sign(slope_pooled) AS reversed
         FROM pb CROSS JOIN pp""",

    "q388_negbin_fit" ->
      """WITH d AS (SELECT coalesce(o.d0, 0) AS d
           FROM customer
           LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS d0
             FROM orders GROUP BY 1) o ON c_custkey = o.o_custkey),
         sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS sd, sum(d * d) AS sd2 FROM d)
         SELECT n AS n_customers,
           round(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_orders,
           round((CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
             / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE), 6) AS var_orders,
           CASE WHEN ((CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE)
               * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               / CAST(n - 1 AS DOUBLE))
             > (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
             THEN round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               / (((CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE)
                   * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                   / CAST(n - 1 AS DOUBLE))
                 - (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           END AS nb_r,
           CASE WHEN ((CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE)
               * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               / CAST(n - 1 AS DOUBLE))
             > (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
             THEN round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               / ((CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE)
                   * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n - 1 AS DOUBLE)), 6)
           END AS nb_p
         FROM sums""",

    "q389_lorenz_dominance" ->
      s"""WITH $spendSql,
         grid AS (SELECT nation,
             quantile_cont(CAST(x AS DOUBLE), $decileList) AS g
           FROM spend GROUP BY 1),
         lor AS (SELECT nation, list_transform(range(1, 11),
             i -> list_sum(g[1:CAST(i AS INT)]) / list_sum(g)) AS lz
           FROM grid)
         SELECT a.nation AS na, b.nation AS nb,
           len(list_filter(range(1, 11), i -> a.lz[i] >= b.lz[i])) = 10
             AS a_dominates,
           len(list_filter(range(1, 11), i -> b.lz[i] >= a.lz[i])) = 10
             AS b_dominates,
           NOT (len(list_filter(range(1, 11), i -> a.lz[i] >= b.lz[i])) = 10)
             AND NOT (len(list_filter(range(1, 11), i -> b.lz[i] >= a.lz[i])) = 10)
             AS curves_cross
         FROM lor a JOIN lor b ON a.nation < b.nation""",

    "q393_theil_decomposition" ->
      s"""WITH $spendSql,
         g AS (SELECT nation, CAST(count(*) AS BIGINT) AS ng,
             sum(x) AS sg FROM spend GROUP BY 1),
         tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS st FROM g),
         grid AS (SELECT nation,
             quantile_cont(CAST(x AS DOUBLE), $decileList) AS gl
           FROM spend GROUP BY 1)
         SELECT g.nation, ng AS n_customers,
           round((CAST(ng AS DOUBLE) / CAST(n AS DOUBLE))
             * ((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
               / (CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
             * ln((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
               / (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))), 6)
             AS between_term,
           round((CAST(ng AS DOUBLE) / CAST(n AS DOUBLE))
             * ((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
               / (CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
             * (list_sum(list_transform(gl, x ->
                 round((x / (list_sum(gl) / 10.0))
                   * ln(x / (list_sum(gl) / 10.0)), 9))) / 10.0), 6)
             AS within_term
         FROM g CROSS JOIN tot JOIN grid ON g.nation = grid.nation""",

    "q394_weighted_jaccard" ->
      """WITH cnt AS (SELECT n_name, p_brand, CAST(count(*) AS BIGINT) AS cnt
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
         tot AS (SELECT n_name, CAST(sum(cnt) AS BIGINT) AS tot
           FROM cnt GROUP BY 1),
         smin AS (SELECT a.n_name AS na, b.n_name AS nb,
             CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS smin
           FROM cnt a JOIN cnt b ON a.p_brand = b.p_brand
             AND a.n_name < b.n_name
           GROUP BY 1, 2)
         SELECT na, nb, smin,
           CAST(ta.tot + tb.tot - smin AS BIGINT) AS smax,
           round(CAST(smin AS DOUBLE)
             / CAST(ta.tot + tb.tot - smin AS DOUBLE), 6)
             AS weighted_jaccard
         FROM smin
         JOIN tot ta ON smin.na = ta.n_name
         JOIN tot tb ON smin.nb = tb.n_name""",

    "q391_tail_dependence" ->
      """WITH li AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
           CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
         q AS (SELECT quantile_cont(x, 0.95) AS qx,
             quantile_cont(y, 0.95) AS qy FROM li)
         SELECT CAST(count(*) AS BIGINT) AS n_items,
           round(qx, 4) AS q95_x, round(qy, 4) AS q95_y,
           CAST(sum(CASE WHEN x > qx AND y > qy THEN 1 ELSE 0 END)
             AS BIGINT) AS n_joint,
           CAST(sum(CASE WHEN y > qy THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ytail,
           round(CAST(sum(CASE WHEN x > qx AND y > qy THEN 1 ELSE 0 END)
               AS DOUBLE)
             / CAST(sum(CASE WHEN y > qy THEN 1 ELSE 0 END) AS DOUBLE), 6)
             AS lambda_u
         FROM li CROSS JOIN q GROUP BY qx, qy""",

    "q364_hodges_lehmann" ->
      s"""WITH grid AS (SELECT p_brand,
           quantile_cont(CAST(p_retailprice AS DOUBLE), $decileList) AS g,
           CAST(count(*) AS BIGINT) AS n
           FROM part GROUP BY 1),
         idx AS (SELECT unnest(range(0, 10)) AS i),
         w AS (SELECT p_brand, n,
             (g[a.i + 1] + g[b.i + 1]) / 2 AS w
           FROM grid, idx a, idx b WHERE a.i <= b.i)
         SELECT p_brand AS brand, n AS n_parts,
           round(quantile_cont(w, 0.5), 6) AS hl_estimate
         FROM w GROUP BY 1, 2""",

    "q396_welch_ttest" ->
      """WITH li AS (SELECT l_returnflag AS g,
           CAST(l_quantity AS BIGINT) AS x
           FROM lineitem WHERE l_returnflag IN ('R', 'A')),
         g AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
           FROM li GROUP BY 1),
         j AS (SELECT r.n AS n1, r.sx AS sx1, r.sxx AS sxx1,
             a.n AS n2, a.sx AS sx2, a.sxx AS sxx2
           FROM (SELECT * FROM g WHERE g = 'R') r
           CROSS JOIN (SELECT * FROM g WHERE g = 'A') a),
         m AS (SELECT n1, n2,
             CAST(CAST(n1 AS HUGEINT) * sxx1 - CAST(sx1 AS HUGEINT) * sx1
                 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
               / CAST(n1 AS DOUBLE) AS se1,
             CAST(CAST(n2 AS HUGEINT) * sxx2 - CAST(sx2 AS HUGEINT) * sx2
                 AS DOUBLE)
               / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))
               / CAST(n2 AS DOUBLE) AS se2,
             CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS md
           FROM j)
         SELECT n1, n2, round(md, 6) AS mean_diff,
           round(md / sqrt(se1 + se2), 4) AS t_stat,
           round((se1 + se2) * (se1 + se2)
             / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
               + se2 * se2 / CAST(n2 - 1 AS DOUBLE)), 2) AS welch_df
         FROM m""",

    "q397_hotelling_t2" ->
      """WITH li AS (SELECT l_returnflag AS g,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           FROM lineitem WHERE l_returnflag IN ('R', 'A')),
         g AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
           FROM li GROUP BY 1),
         j AS (SELECT r.n AS n1, r.sx AS sx1, r.sy AS sy1, r.sxx AS sxx1,
             r.syy AS syy1, r.sxy AS sxy1,
             a.n AS n2, a.sx AS sx2, a.sy AS sy2, a.sxx AS sxx2,
             a.syy AS syy2, a.sxy AS sxy2
           FROM (SELECT * FROM g WHERE g = 'R') r
           CROSS JOIN (SELECT * FROM g WHERE g = 'A') a),
         m AS (SELECT n1, n2, CAST(n1 + n2 AS DOUBLE) AS nn,
             (CAST(CAST(n1 AS HUGEINT) * sxx1 - CAST(sx1 AS HUGEINT) * sx1
                   AS DOUBLE) / CAST(n1 AS DOUBLE)
               + CAST(CAST(n2 AS HUGEINT) * sxx2 - CAST(sx2 AS HUGEINT) * sx2
                   AS DOUBLE) / CAST(n2 AS DOUBLE))
               / (CAST(n1 + n2 AS DOUBLE) - 2.0) AS pxx,
             (CAST(CAST(n1 AS HUGEINT) * syy1 - CAST(sy1 AS HUGEINT) * sy1
                   AS DOUBLE) / CAST(n1 AS DOUBLE)
               + CAST(CAST(n2 AS HUGEINT) * syy2 - CAST(sy2 AS HUGEINT) * sy2
                   AS DOUBLE) / CAST(n2 AS DOUBLE))
               / (CAST(n1 + n2 AS DOUBLE) - 2.0) AS pyy,
             (CAST(CAST(n1 AS HUGEINT) * sxy1 - CAST(sx1 AS HUGEINT) * sy1
                   AS DOUBLE) / CAST(n1 AS DOUBLE)
               + CAST(CAST(n2 AS HUGEINT) * sxy2 - CAST(sx2 AS HUGEINT) * sy2
                   AS DOUBLE) / CAST(n2 AS DOUBLE))
               / (CAST(n1 + n2 AS DOUBLE) - 2.0) AS pxy,
             CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS dx,
             CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS dy
           FROM j),
         t AS (SELECT n1, n2, nn,
             CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / nn
               * (dx * (pyy * dx - pxy * dy) + dy * (pxx * dy - pxy * dx))
               / (pxx * pyy - pxy * pxy) AS t2
           FROM m)
         SELECT n1, n2, round(t2, 4) AS t2,
           round(t2 * (nn - 3.0) / (2.0 * (nn - 2.0)), 4) AS f_stat
         FROM t""",

    "q398_mahalanobis_outliers" ->
      """WITH per AS (SELECT o_custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y
           FROM orders GROUP BY 1),
         base AS (SELECT n_name AS nation, x, y
           FROM per
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
           FROM base),
         m AS (SELECT n,
             CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vxx,
             CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vyy,
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vxy,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
           FROM st),
         d AS (SELECT nation,
             CASE WHEN ((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)
                   * vyy
                 - 2.0 * (CAST(x AS DOUBLE) - mx) * (CAST(y AS DOUBLE) - my)
                   * vxy
                 + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my)
                   * vxx)
                 / (vxx * vyy - vxy * vxy) > 9.21
               THEN 1 ELSE 0 END AS o
           FROM base CROSS JOIN m)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(o) AS BIGINT) AS n_outliers,
           round(CAST(sum(o) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS outlier_rate
         FROM d GROUP BY 1""",

    "q399_winsorized_trimmed" ->
      """WITH p AS (SELECT p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM part),
         b AS (SELECT p_brand,
             quantile_cont(CAST(c AS DOUBLE), 0.05) AS lo,
             quantile_cont(CAST(c AS DOUBLE), 0.95) AS hi
           FROM p GROUP BY 1)
         SELECT p.p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
           CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
           round((CAST(sum(CASE WHEN c >= lo AND c <= hi THEN c ELSE 0 END)
                 AS DOUBLE)
               + CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS DOUBLE) * lo
               + CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS DOUBLE) * hi)
             / CAST(count(*) AS DOUBLE) / 100.0, 4) AS wins_mean,
           round(CAST(sum(CASE WHEN c >= lo AND c <= hi THEN c ELSE 0 END)
               AS DOUBLE)
             / CAST(sum(CASE WHEN c >= lo AND c <= hi THEN 1 ELSE 0 END)
               AS DOUBLE) / 100.0, 4) AS trim_mean
         FROM p JOIN b USING (p_brand) GROUP BY 1, lo, hi""",

    "q403_box_cox" ->
      s"""WITH $spendSql,
         grid AS (SELECT nation,
             quantile_cont(CAST(x AS DOUBLE), $decileList) AS gl,
             CAST(count(*) AS BIGINT) AS n_customers
           FROM spend GROUP BY 1),
         z AS (SELECT nation, n_customers,
             list_transform(gl, x -> x / (list_sum(gl) / 10.0)) AS zl
           FROM grid),
         t AS (SELECT nation, n_customers,
             list_transform(zl, v -> round((1.0 / v - 1.0) / (-1.0), 9))
               AS ym10,
             list_transform(zl, v -> round((1.0 / sqrt(v) - 1.0) / (-0.5), 9))
               AS ym05,
             list_transform(zl, v -> round(ln(v), 9)) AS y00,
             list_transform(zl, v -> round((sqrt(v) - 1.0) / 0.5, 9)) AS y05,
             list_transform(zl, v -> round(v - 1.0, 9)) AS y10,
             list_sum(list_transform(zl, v -> round(ln(v), 9))) AS slnz
           FROM z),
         m AS (SELECT nation, n_customers, slnz,
             ym10, ym05, y00, y05, y10,
             list_sum(ym10) / 10.0 AS mm10, list_sum(ym05) / 10.0 AS mm05,
             list_sum(y00) / 10.0 AS m00, list_sum(y05) / 10.0 AS m05,
             list_sum(y10) / 10.0 AS m10
           FROM t),
         v AS (SELECT nation, n_customers, slnz,
             list_sum(list_transform(ym10, v -> (v - mm10) * (v - mm10)))
               / 10.0 AS s2m10,
             list_sum(list_transform(ym05, v -> (v - mm05) * (v - mm05)))
               / 10.0 AS s2m05,
             list_sum(list_transform(y00, v -> (v - m00) * (v - m00)))
               / 10.0 AS s200,
             list_sum(list_transform(y05, v -> (v - m05) * (v - m05)))
               / 10.0 AS s205,
             list_sum(list_transform(y10, v -> (v - m10) * (v - m10)))
               / 10.0 AS s210
           FROM m),
         l AS (SELECT nation, n_customers,
             round(-5.0 * ln(s2m10) + -2.0 * slnz, 4) AS ll_m10,
             round(-5.0 * ln(s2m05) + -1.5 * slnz, 4) AS ll_m05,
             round(-5.0 * ln(s200) + -1.0 * slnz, 4) AS ll_00,
             round(-5.0 * ln(s205) + -0.5 * slnz, 4) AS ll_05,
             round(-5.0 * ln(s210) + 0.0 * slnz, 4) AS ll_10
           FROM v)
         SELECT nation, n_customers, ll_m10, ll_m05, ll_00, ll_05, ll_10,
           CAST(CASE
             WHEN ll_m10 >= ll_m05 AND ll_m10 >= ll_00 AND ll_m10 >= ll_05
               AND ll_m10 >= ll_10 THEN -1.0
             WHEN ll_m05 >= ll_00 AND ll_m05 >= ll_05 AND ll_m05 >= ll_10
               THEN -0.5
             WHEN ll_00 >= ll_05 AND ll_00 >= ll_10 THEN 0.0
             WHEN ll_05 >= ll_10 THEN 0.5
             ELSE 1.0 END AS DOUBLE) AS best_lambda
         FROM l""",

    "q413_icc" ->
      """WITH p AS (SELECT p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
           FROM part),
         g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS nj,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
           FROM p GROUP BY 1),
         terms AS (SELECT p_brand,
             CAST(CAST(nj AS HUGEINT) * sxx - sx * sx AS DOUBLE)
               / CAST(nj AS DOUBLE) AS wj,
             CAST(sx * sx AS DOUBLE) / CAST(nj AS DOUBLE) AS bj
           FROM g),
         folded AS (SELECT list_sum(list(wj ORDER BY p_brand)) AS ssw,
             list_sum(list(bj ORDER BY p_brand)) AS sbj
           FROM terms),
         tot AS (SELECT CAST(sum(nj) AS BIGINT) AS n, sum(sx) AS sxall,
             sum(CAST(nj AS HUGEINT) * CAST(nj AS HUGEINT)) AS sn2,
             CAST(count(*) AS BIGINT) AS j
           FROM g),
         m AS (SELECT n, j,
             (sbj - CAST(sxall * sxall AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(j AS DOUBLE) - 1.0) AS msb,
             ssw / (CAST(n AS DOUBLE) - CAST(j AS DOUBLE)) AS msw,
             (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(j AS DOUBLE) - 1.0) AS k0
           FROM folded CROSS JOIN tot)
         SELECT n AS n_parts, j AS n_groups,
           round(msb, 4) AS ms_between, round(msw, 4) AS ms_within,
           round((msb - msw) / (msb + (k0 - 1.0) * msw), 6) AS icc1
         FROM m""",

    "q416_jsd_matrix" -> {
      val pa = """((CAST(a.c AS DOUBLE) + 1.0)
        / (CAST(a.tot AS DOUBLE) + CAST(a.v AS DOUBLE)))"""
      val pb = """((CAST(b.c AS DOUBLE) + 1.0)
        / (CAST(b.tot AS DOUBLE) + CAST(b.v AS DOUBLE)))"""
      val m = s"(($pa + $pb) / 2.0)"
      s"""WITH st AS (SELECT source, t AS term, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT source,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
               FROM documents)
         GROUP BY 1, 2),
         vocab AS (SELECT term FROM
           (SELECT term, CAST(sum(cnt) AS BIGINT) AS tc FROM st GROUP BY 1)
           ORDER BY tc DESC, term ASC LIMIT 200),
         sources AS (SELECT DISTINCT source FROM st),
         grid AS (SELECT s.source, v.term, coalesce(st.cnt, 0) AS c
           FROM sources s CROSS JOIN vocab v
           LEFT JOIN st ON st.source = s.source AND st.term = v.term),
         totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS v
           FROM grid GROUP BY 1),
         g AS (SELECT grid.source, grid.term, grid.c, totals.tot, totals.v
           FROM grid JOIN totals ON grid.source = totals.source),
         pair AS (SELECT a.source AS source_a, b.source AS source_b, a.term,
           round(0.5 * ($pa * ln($pa / $m)) + 0.5 * ($pb * ln($pb / $m)),
             12) AS jterm
         FROM g a JOIN g b ON a.term = b.term AND a.source < b.source)
         SELECT source_a, source_b,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(jterm ORDER BY term)), (a, e) -> round(a + e, 12))
             AS jsd
         FROM pair GROUP BY 1, 2"""
    },

    "q420_pacf" ->
      s"""WITH daily AS (${OracleWarehouse.dailyRevenueSql}),
         led AS (SELECT nation, c,
             lead(c, 1) OVER (PARTITION BY nation ORDER BY d) AS y1,
             lead(c, 2) OVER (PARTITION BY nation ORDER BY d) AS y2,
             lead(c, 3) OVER (PARTITION BY nation ORDER BY d) AS y3
           FROM daily),
         m0 AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(c AS HUGEINT)) AS sy,
             sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy,
             sum(CASE WHEN y1 IS NOT NULL
               THEN CAST(c AS HUGEINT) * CAST(y1 AS HUGEINT) ELSE 0 END) AS p1,
             sum(CASE WHEN y1 IS NOT NULL
               THEN CAST(c AS HUGEINT) ELSE 0 END) AS h1,
             sum(coalesce(CAST(y1 AS HUGEINT), 0)) AS t1,
             sum(CASE WHEN y2 IS NOT NULL
               THEN CAST(c AS HUGEINT) * CAST(y2 AS HUGEINT) ELSE 0 END) AS p2,
             sum(CASE WHEN y2 IS NOT NULL
               THEN CAST(c AS HUGEINT) ELSE 0 END) AS h2,
             sum(coalesce(CAST(y2 AS HUGEINT), 0)) AS t2,
             sum(CASE WHEN y3 IS NOT NULL
               THEN CAST(c AS HUGEINT) * CAST(y3 AS HUGEINT) ELSE 0 END) AS p3,
             sum(CASE WHEN y3 IS NOT NULL
               THEN CAST(c AS HUGEINT) ELSE 0 END) AS h3,
             sum(coalesce(CAST(y3 AS HUGEINT), 0)) AS t3
           FROM led GROUP BY 1),
         mm AS (SELECT m0.*,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS m FROM m0),
         cks AS (SELECT nation, n,
             CAST(syy AS DOUBLE) - CAST(n AS DOUBLE) * m * m AS c0,
             CAST(p1 AS DOUBLE) - m * CAST(t1 AS DOUBLE)
               - m * CAST(h1 AS DOUBLE)
               + (CAST(n AS DOUBLE) - 1.0) * m * m AS c1,
             CAST(p2 AS DOUBLE) - m * CAST(t2 AS DOUBLE)
               - m * CAST(h2 AS DOUBLE)
               + (CAST(n AS DOUBLE) - 2.0) * m * m AS c2,
             CAST(p3 AS DOUBLE) - m * CAST(t3 AS DOUBLE)
               - m * CAST(h3 AS DOUBLE)
               + (CAST(n AS DOUBLE) - 3.0) * m * m AS c3
           FROM mm),
         rr AS (SELECT nation, n, c1 / c0 AS r1, c2 / c0 AS r2,
             c3 / c0 AS r3 FROM cks),
         ph AS (SELECT nation, n, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS f22 FROM rr),
         ph2 AS (SELECT ph.*, r1 - f22 * r1 AS f21 FROM ph)
         SELECT nation, n AS n_days, round(r1, 6) AS pacf1,
           round(f22, 6) AS pacf2,
           round((r3 - f21 * r2 - f22 * r1)
             / (1.0 - f21 * r1 - f22 * r2), 6) AS pacf3
         FROM ph2""",

    "q422_cuped" ->
      """WITH per AS (SELECT o_custkey,
           CAST(sum(CASE WHEN year(o_orderdate) = 1996
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS y
           FROM orders WHERE year(o_orderdate) IN (1996, 1997)
           GROUP BY 1),
         base AS (SELECT c_custkey, coalesce(x, 0) AS x, coalesce(y, 0) AS y,
             c_custkey % 2 AS arm
           FROM customer LEFT JOIN per ON c_custkey = o_custkey),
         pooled AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
           FROM base),
         arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS na,
             sum(CAST(x AS HUGEINT)) AS ax, sum(CAST(y AS HUGEINT)) AS ay
           FROM base GROUP BY 1),
         j AS (SELECT a0.na AS n_a, a0.ax AS ax0, a0.ay AS ay0,
             a1.na AS n_b, a1.ax AS ax1, a1.ay AS ay1
           FROM (SELECT * FROM arms WHERE arm = 0) a0
           CROSS JOIN (SELECT * FROM arms WHERE arm = 1) a1),
         cv AS (SELECT n,
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS cxy,
             CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS cxx,
             CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS cyy
           FROM pooled),
         f AS (SELECT n_a, n_b,
             CAST(ay0 AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(ay1 AS DOUBLE) / CAST(n_b AS DOUBLE) AS raw,
             CAST(ax0 AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(ax1 AS DOUBLE) / CAST(n_b AS DOUBLE) AS xd,
             cxy / cxx AS theta, cxy * cxy / (cxx * cyy) AS rho2
           FROM cv CROSS JOIN j)
         SELECT n_a, n_b, round(raw / 100.0, 4) AS raw_diff_dollars,
           round((raw - theta * xd) / 100.0, 4) AS cuped_diff_dollars,
           round(theta, 6) AS theta, round(rho2, 6) AS rho2
         FROM f""",

    "q428_stratified_ate" ->
      """WITH per AS (SELECT o_custkey,
           CAST(sum(CASE WHEN year(o_orderdate) = 1996
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS y
           FROM orders WHERE year(o_orderdate) IN (1996, 1997)
           GROUP BY 1),
         base AS (SELECT c_custkey, coalesce(x, 0) AS x, coalesce(y, 0) AS y,
             c_custkey % 2 AS arm
           FROM customer LEFT JOIN per ON c_custkey = o_custkey),
         bounds AS (SELECT
             quantile_cont(CAST(x AS DOUBLE), 0.2) AS b1,
             quantile_cont(CAST(x AS DOUBLE), 0.4) AS b2,
             quantile_cont(CAST(x AS DOUBLE), 0.6) AS b3,
             quantile_cont(CAST(x AS DOUBLE), 0.8) AS b4
           FROM base),
         strat AS (SELECT y, arm,
             CASE WHEN x <= b1 THEN 1 WHEN x <= b2 THEN 2
               WHEN x <= b3 THEN 3 WHEN x <= b4 THEN 4 ELSE 5 END AS stratum
           FROM base CROSS JOIN bounds),
         cells AS (SELECT stratum,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0
           FROM strat GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS ty1,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tn1,
             CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS ty0,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn0
           FROM base),
         terms AS (SELECT stratum,
             CAST(n1 + n0 AS DOUBLE) / CAST(n AS DOUBLE)
               * (CASE WHEN n1 > 0 AND n0 > 0
                 THEN CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                 ELSE 0.0 END) AS t
           FROM cells CROSS JOIN tot),
         ate AS (SELECT list_sum(list(t ORDER BY stratum)) AS ate FROM terms)
         SELECT n AS n_customers,
           round((CAST(ty1 AS DOUBLE) / CAST(tn1 AS DOUBLE)
             - CAST(ty0 AS DOUBLE) / CAST(tn0 AS DOUBLE)) / 100.0, 4)
             AS raw_diff_dollars,
           round(ate / 100.0, 4) AS stratified_ate_dollars
         FROM ate CROSS JOIN tot""",

    "q429_meta_analysis" ->
      """WITH li AS (SELECT l_orderkey, l_returnflag AS g,
           CAST(l_quantity AS BIGINT) AS x
           FROM lineitem WHERE l_returnflag IN ('R', 'A')),
         gs AS (SELECT n_name AS nation, g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
           FROM li
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2),
         study AS (SELECT nation,
             CAST(r.sx AS DOUBLE) / CAST(r.n AS DOUBLE)
               - CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS d,
             CAST(CAST(r.n AS HUGEINT) * r.sxx - CAST(r.sx AS HUGEINT) * r.sx
                 AS DOUBLE)
               / (CAST(r.n AS DOUBLE) * CAST(r.n - 1 AS DOUBLE))
               / CAST(r.n AS DOUBLE)
             + CAST(CAST(a.n AS HUGEINT) * a.sxx - CAST(a.sx AS HUGEINT) * a.sx
                 AS DOUBLE)
               / (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE))
               / CAST(a.n AS DOUBLE) AS v
           FROM (SELECT * FROM gs WHERE g = 'R') r
           JOIN (SELECT * FROM gs WHERE g = 'A') a USING (nation)
           WHERE r.n > 1 AND a.n > 1),
         pooled AS (SELECT CAST(count(*) AS BIGINT) AS k,
             list_sum(list(1.0 / v * d ORDER BY nation))
               / list_sum(list(1.0 / v ORDER BY nation)) AS pooled
           FROM study),
         q AS (SELECT k, pooled,
             list_sum(list(1.0 / v * (d - pooled) * (d - pooled)
               ORDER BY nation)) AS q
           FROM study CROSS JOIN pooled GROUP BY k, pooled)
         SELECT k AS k_nations, round(pooled, 6) AS pooled_diff,
           round(q, 4) AS q_cochran,
           round(greatest(0.0, (q - CAST(k - 1 AS DOUBLE)) / q), 6)
             AS i_squared
         FROM q""",

    "q434_cpk" ->
      """WITH li AS (SELECT p_brand, CAST(l_quantity AS BIGINT) AS x
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
           FROM li GROUP BY 1),
         m AS (SELECT p_brand, n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                 AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd
           FROM g)
         SELECT p_brand AS brand, n AS n_items,
           round(mean, 4) AS mean_qty,
           round((50.0 - 1.0) / (6.0 * sd), 4) AS cp,
           round(least(50.0 - mean, mean - 1.0) / (3.0 * sd), 4) AS cpk
         FROM m""",

    "q435_youden_grid" ->
      s"""WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS score,
           CAST(sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS y97
           FROM orders GROUP BY 1),
         med AS (SELECT quantile_cont(CAST(y97 AS DOUBLE), 0.5) AS md
           FROM per),
         lab AS (SELECT score, y97 > md AS pos FROM per CROSS JOIN med),
         grid AS (SELECT quantile_cont(CAST(score AS DOUBLE),
             [${(1 to 9).map(i => 0.1 * i).mkString(", ")}]) AS ts
           FROM lab),
         th AS (SELECT CAST(i AS BIGINT) AS decile, ts[i] AS t
           FROM grid, unnest(range(1, 10)) AS u(i))
         SELECT decile, round(t, 2) AS threshold,
           round(CASE WHEN sum(CASE WHEN pos THEN 1 ELSE 0 END) > 0
             THEN CAST(sum(CASE WHEN pos AND score > t THEN 1 ELSE 0 END)
               AS DOUBLE)
             / CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) END, 6)
             AS tpr,
           round(CASE WHEN sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) > 0
             THEN CAST(sum(CASE WHEN NOT pos AND score > t THEN 1 ELSE 0 END)
               AS DOUBLE)
             / CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS DOUBLE) END, 6)
             AS fpr,
           round(CASE WHEN sum(CASE WHEN pos THEN 1 ELSE 0 END) > 0
               AND sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) > 0
             THEN CAST(sum(CASE WHEN pos AND score > t THEN 1 ELSE 0 END)
               AS DOUBLE)
             / CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
             - CAST(sum(CASE WHEN NOT pos AND score > t THEN 1 ELSE 0 END)
               AS DOUBLE)
             / CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS DOUBLE) END, 6)
             AS youden_j
         FROM lab CROSS JOIN th GROUP BY 1, 2""",

    // q447: planes replayed by the SAME integer LCG as
    // Similarity.hyperplanes (the lshBucketCtes discipline); both
    // distance folds are position-ordered.
    "q459_isotonic_calibration" ->
      """WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS y97
           FROM orders GROUP BY 1),
         mx AS (SELECT CAST(max(cnt) AS BIGINT) AS mc,
             quantile_cont(CAST(y97 AS DOUBLE), 0.5) AS md FROM per),
         bins AS (SELECT least(9, cnt * 10 // mc) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y97 > md THEN 1 ELSE 0 END) AS BIGINT)
               AS npos
           FROM per CROSS JOIN mx GROUP BY 1),
         ivals AS (SELECT j.bin AS j, k.bin AS k,
             CAST(sum(b.npos) AS DOUBLE) / CAST(sum(b.n) AS DOUBLE) AS r
           FROM bins j JOIN bins k ON j.bin <= k.bin
           JOIN bins b ON b.bin BETWEEN j.bin AND k.bin
           GROUP BY 1, 2),
         iso AS (SELECT bin, max(mi) AS iso FROM (
             SELECT bins.bin, ivals.j, min(r) AS mi
             FROM bins JOIN ivals
               ON ivals.j <= bins.bin AND ivals.k >= bins.bin
             GROUP BY 1, 2) GROUP BY 1)
         SELECT bins.bin, n,
           round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy,
           round(iso, 6) AS iso_accuracy
         FROM bins JOIN iso ON bins.bin = iso.bin""",

    "q460_conformal_naive" ->
      s"""WITH daily AS (${OracleWarehouse.dailyRevenueSql}),
         deltas AS (SELECT nation, t, abs(c - prev) AS ad FROM (
             SELECT nation, c,
               lag(c) OVER (PARTITION BY nation ORDER BY d) AS prev,
               CAST(row_number() OVER (PARTITION BY nation ORDER BY d)
                 AS BIGINT) AS t
             FROM daily) WHERE prev IS NOT NULL),
         qhat AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_cal,
             quantile_cont(CAST(ad AS DOUBLE), 0.9) AS qh
           FROM deltas WHERE t % 2 = 0 GROUP BY 1)
         SELECT d.nation, n_cal, CAST(count(*) AS BIGINT) AS n_test,
           round(qh, 4) AS q_hat_cents,
           round(CAST(sum(CASE WHEN CAST(ad AS DOUBLE) <= qh
             THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS coverage
         FROM deltas d JOIN qhat ON d.nation = qhat.nation
         WHERE t % 2 = 1 GROUP BY 1, 2, qh""",

    "q447_jl_distortion" ->
      """WITH ev AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         planes AS (SELECT p, list_transform(range(0, 64),
             d -> ((p * 2654435761 + d * 40503 + 12345) % 4294967296)
               / 2147483648.0 - 1.0) AS plane
           FROM range(0, 8) tp(p)),
         proj AS (SELECT e.vec_id, p.p,
             list_sum(list_transform(range(1, 65),
               i -> e.v[i] * p.plane[i])) AS pv
           FROM ev e CROSS JOIN planes p),
         pw AS (SELECT vec_id, list(pv ORDER BY p) AS pvs
           FROM proj GROUP BY 1),
         pair AS (SELECT a.vec_id AS id_a, a.v AS va, b.v AS vb,
             pa.pvs AS pva, pb.pvs AS pvb
           FROM ev a JOIN ev b ON b.vec_id = a.vec_id + 1
           JOIN pw pa ON pa.vec_id = a.vec_id
           JOIN pw pb ON pb.vec_id = b.vec_id),
         d AS (SELECT id_a,
             list_sum(list_transform(range(1, 9),
               i -> (pva[i] - pvb[i]) * (pva[i] - pvb[i]))) AS dp,
             list_sum(list_transform(range(1, 65),
               i -> (va[i] - vb[i]) * (va[i] - vb[i]))) AS dn
           FROM pair)
         SELECT id_a, round(CASE WHEN dn > 0
           THEN CAST(8.0 AS DOUBLE) * dp / dn END, 6) AS distortion
         FROM d""",

    "q448_ece_calibration" ->
      """WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS y97
           FROM orders GROUP BY 1),
         mx AS (SELECT CAST(max(cnt) AS BIGINT) AS mc,
             quantile_cont(CAST(y97 AS DOUBLE), 0.5) AS md FROM per),
         binned AS (SELECT least(9, cnt * 10 // mc) AS bin, cnt,
             CASE WHEN y97 > md THEN 1 ELSE 0 END AS pos, mc
           FROM per CROSS JOIN mx),
         bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cnt) AS BIGINT) AS scnt,
             CAST(sum(pos) AS BIGINT) AS npos, max(mc) AS mc
           FROM binned GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM bins),
         ece AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
               * abs(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
                 - CAST(scnt AS DOUBLE) / CAST(n * mc AS DOUBLE))
               ORDER BY bin)), (p, q) -> p + q) AS ece
           FROM bins CROSS JOIN tot)
         SELECT bin, n,
           round(CAST(scnt AS DOUBLE) / CAST(n * mc AS DOUBLE), 6)
             AS avg_conf,
           round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy,
           round(ece, 6) AS ece
         FROM bins CROSS JOIN tot CROSS JOIN ece""",

    "q449_abc_classes" ->
      """WITH per AS (SELECT l_partkey,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS rev
           FROM lineitem GROUP BY 1),
         cum AS (SELECT l_partkey, rev,
             CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC)
               AS BIGINT) AS cum
           FROM per),
         tot AS (SELECT CAST(sum(rev) AS BIGINT) AS trev FROM per),
         cls AS (SELECT CASE WHEN cum * 100 <= trev * 80 THEN 'A'
             WHEN cum * 100 <= trev * 95 THEN 'B' ELSE 'C' END AS abc, rev
           FROM cum CROSS JOIN tot)
         SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS revenue_cents,
           round(CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE)
             / CAST(trev AS DOUBLE), 6) AS share
         FROM cls CROSS JOIN tot GROUP BY abc, trev""",

    "q444_zipf_fit" -> {
      val folds = Seq("x" -> "sx", "y" -> "sy", "x * x" -> "sxx",
        "x * y" -> "sxy", "y * y" -> "syy").map { case (e, nm) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list($e ORDER BY rank)), (p, q) -> p + q) AS $nm"""
      }.mkString(",\n             ")
      s"""WITH tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
             AS tok FROM documents) WHERE length(tok) > 0 GROUP BY 1),
         top AS (SELECT freq, CAST(row_number() OVER (ORDER BY freq DESC,
             tok ASC) AS BIGINT) AS rank
           FROM tf ORDER BY freq DESC, tok ASC LIMIT 200),
         xy AS (SELECT rank,
             round(ln(CAST(rank AS DOUBLE)), 6) AS x,
             round(ln(CAST(freq AS DOUBLE)), 6) AS y
           FROM top),
         sums AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             $folds
           FROM xy)
         SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             + CAST(0.0 AS DOUBLE) AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) + CAST(0.0 AS DOUBLE) AS intercept,
           round(CASE WHEN n * syy - sy * sy > 0
             THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
             + CAST(0.0 AS DOUBLE) AS r2
         FROM sums"""
    },

    "q445_benford" -> {
      val pCase = "CASE digit " + QueryDsl.benfordExpected.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN CAST($p AS DOUBLE)" }
        .mkString(" ") + " END"
      s"""WITH obs AS (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
             AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT)
             AS digit, CAST(count(*) AS BIGINT) AS n_obs
           FROM orders GROUP BY 1),
         grid AS (SELECT CAST(d AS INT) AS digit, $pCase AS p_expected
           FROM (SELECT unnest(generate_series(1, 9)) AS d)),
         dense AS (SELECT grid.digit, p_expected,
             coalesce(n_obs, 0) AS n_obs
           FROM grid LEFT JOIN obs ON grid.digit = obs.digit),
         tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS nn FROM dense),
         chi AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list((CAST(n_obs AS DOUBLE) - CAST(nn AS DOUBLE) * p_expected)
               * (CAST(n_obs AS DOUBLE) - CAST(nn AS DOUBLE) * p_expected)
               / (CAST(nn AS DOUBLE) * p_expected) ORDER BY digit)),
             (p, q) -> p + q) AS chi2
           FROM dense CROSS JOIN tot)
         SELECT digit, n_obs, round(p_expected, 6) AS p_expected,
           round(CAST(n_obs AS DOUBLE) / CAST(nn AS DOUBLE), 6)
             AS obs_share,
           round(chi2, 6) AS chi2
         FROM dense CROSS JOIN tot CROSS JOIN chi"""
    },

    "q446_hhi" ->
      """WITH li AS (SELECT l_orderkey, l_partkey,
           CAST(year(l_shipdate) AS INT) AS yr,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r
           FROM lineitem WHERE CAST(year(l_shipdate) AS INT)
             IN (1995, 1996, 1997)),
         cell AS (SELECT n_name AS nation, yr, p_brand,
             CAST(sum(r) AS BIGINT) AS rev
           FROM li
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2, 3),
         tot AS (SELECT nation, yr, CAST(sum(rev) AS BIGINT) AS trev
           FROM cell GROUP BY 1, 2),
         sh AS (SELECT cell.nation, cell.yr, p_brand,
             (CAST(rev AS DOUBLE) / CAST(trev AS DOUBLE))
               * (CAST(rev AS DOUBLE) / CAST(trev AS DOUBLE)) AS s2
           FROM cell JOIN tot ON cell.nation = tot.nation
             AND cell.yr = tot.yr)
         SELECT nation, yr, CAST(count(*) AS BIGINT) AS n_brands,
           round(CAST(10000.0 AS DOUBLE)
             * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(s2 ORDER BY p_brand)), (p, q) -> p + q), 4) AS hhi
         FROM sh GROUP BY 1, 2""",

    // Survival tier (q438–q440): the shared lifetime derivation is the
    // textual mirror of QueriesStats.lifetimes; every folded term is an
    // exact-integer division (identical IEEE doubles), ordered by event
    // time, with list_reduce replaying the prefix product.
    "q438_kaplan_meier" ->
      s"""WITH $lifetimeCtes,
         ar AS (SELECT t, d, n_risk FROM grid WHERE d > 0),
         fac AS (SELECT t, CAST(1.0 AS DOUBLE)
             - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f FROM ar),
         srv AS (SELECT a.t,
             list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
               list(b.f ORDER BY b.t)), (x, y) -> x * y) AS s
           FROM ar a JOIN fac b ON b.t <= a.t GROUP BY a.t)
         SELECT ar.t, ar.n_risk, ar.d, round(srv.s, 6) AS survival
         FROM ar JOIN srv ON ar.t = srv.t""",

    "q439_nelson_aalen" ->
      s"""WITH $lifetimeCtes,
         ar AS (SELECT t, d, n_risk FROM grid WHERE d > 0),
         fac AS (SELECT t,
             CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h FROM ar),
         hz AS (SELECT a.t,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(b.h ORDER BY b.t)), (x, y) -> x + y) AS s
           FROM ar a JOIN fac b ON b.t <= a.t GROUP BY a.t)
         SELECT ar.t, ar.n_risk, ar.d, round(hz.s, 6) AS cum_hazard
         FROM ar JOIN hz ON ar.t = hz.t""",

    "q440_logrank" ->
      s"""WITH $lifetimeBase,
         lt2 AS (SELECT lt.*, c_mktsegment = 'BUILDING' AS a1
           FROM lt JOIN customer ON ck = c_custkey),
         g AS (SELECT t,
             CAST(sum(CASE WHEN a1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN a1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN NOT a1 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN NOT a1 THEN ev ELSE 0 END) AS BIGINT) AS d2
           FROM lt2 GROUP BY 1),
         nt AS (SELECT CAST(sum(CASE WHEN a1 THEN 1 ELSE 0 END) AS BIGINT)
             AS nn1,
             CAST(sum(CASE WHEN NOT a1 THEN 1 ELSE 0 END) AS BIGINT) AS nn2
           FROM lt2),
         cum AS (SELECT t, c1, d1, c2, d2,
             CAST(sum(c1) OVER (ORDER BY t) AS BIGINT) AS cum1,
             CAST(sum(c2) OVER (ORDER BY t) AS BIGINT) AS cum2
           FROM g),
         ev AS (SELECT t, d1, d2,
             nn1 - (cum1 - c1) AS n1, nn2 - (cum2 - c2) AS n2,
             d1 + d2 AS d,
             (nn1 - (cum1 - c1)) + (nn2 - (cum2 - c2)) AS n
           FROM cum CROSS JOIN nt WHERE d1 + d2 > 0),
         terms AS (SELECT t, d1,
             CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
               / CAST(n AS DOUBLE) AS ome,
             CASE WHEN n > 1 THEN CAST(d AS DOUBLE)
               * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(1.0 AS DOUBLE)
                 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))
               ELSE CAST(0.0 AS DOUBLE) END AS vterm
           FROM ev)
         SELECT CAST(count(*) AS BIGINT) AS n_event_times,
           CAST(sum(d1) AS BIGINT) AS o1,
           round(CAST(CAST(sum(d1) AS BIGINT) AS DOUBLE)
             - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(ome ORDER BY t)), (x, y) -> x + y), 6) AS e1,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(vterm ORDER BY t)), (x, y) -> x + y), 6) AS variance,
           round(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(vterm ORDER BY t)), (x, y) -> x + y) > 0
             THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(ome ORDER BY t)), (x, y) -> x + y)
               * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(ome ORDER BY t)), (x, y) -> x + y)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(vterm ORDER BY t)), (x, y) -> x + y) END, 6) AS chi2
         FROM terms""",

    // ── Structural-break / robust-trend tier (round 11) ─────────────────

    "q468_cusum_squares" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum2
           FROM daily),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ss FROM daily),
         dt AS (SELECT t, CAST(cum2 AS DOUBLE) / CAST(ss AS DOUBLE)
               - CAST(t AS DOUBLE) / CAST(nn AS DOUBLE) AS dstat, nn
           FROM idx CROSS JOIN tot)
         SELECT CAST(max(nn) AS BIGINT) AS n_days,
           -(max(struct_pack(a := abs(dstat), negt := -t))).negt AS split_t,
           (max(struct_pack(a := abs(dstat), negt := -t))).a AS max_cusum_sq
         FROM dt""",

    "q472_breusch_pagan" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS y
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY month) AS BIGINT)
             AS t, y FROM m),
         mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS st, CAST(sum(t * t) AS BIGINT) AS stt,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(t AS HUGEINT) * CAST(y AS HUGEINT)) AS sty
           FROM idx),
         wb AS (SELECT t, y, n, st, stt,
             (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
             (CAST(sy AS DOUBLE)
               - (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                 * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS a
           FROM idx CROSS JOIN mom),
         g AS (SELECT t, n, st, stt,
             (CAST(y AS DOUBLE) - a - b * CAST(t AS DOUBLE))
               * (CAST(y AS DOUBLE) - a - b * CAST(t AS DOUBLE)) AS g
           FROM wb),
         f AS (SELECT n, st, stt,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(g ORDER BY t)), (p, q) -> p + q) AS sg,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(g * CAST(t AS DOUBLE) ORDER BY t)), (p, q) -> p + q)
               AS sgt,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(g * g ORDER BY t)), (p, q) -> p + q) AS sgg
           FROM g GROUP BY 1, 2, 3)
         SELECT n AS n_months,
           CAST(n AS DOUBLE)
             * (CAST(n AS DOUBLE) * sgt - CAST(st AS DOUBLE) * sg)
             * (CAST(n AS DOUBLE) * sgt - CAST(st AS DOUBLE) * sg)
             / ((CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
               * (CAST(n AS DOUBLE) * sgg - sg * sg)) AS bp_lm
         FROM f""",

    "q473_cvm_weekday" ->
      """WITH o AS (SELECT n_name AS nation,
           date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 7
             AS w
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey),
         cells AS (SELECT nation, w, CAST(count(*) AS BIGINT) AS c1
           FROM o GROUP BY 1, 2),
         corp AS (SELECT w, CAST(sum(c1) AS BIGINT) AS cc
           FROM cells GROUP BY 1),
         grid AS (SELECT n.nation, corp.w, corp.cc,
             CAST(coalesce(c1, 0) AS BIGINT) AS c1
           FROM (SELECT DISTINCT nation FROM cells) n
           CROSS JOIN corp
           LEFT JOIN cells ON cells.nation = n.nation AND cells.w = corp.w),
         n1 AS (SELECT nation, CAST(sum(c1) AS BIGINT) AS n1
           FROM grid GROUP BY 1),
         nc AS (SELECT CAST(sum(cc) AS BIGINT) AS nc FROM corp),
         wc AS (SELECT nation, w, c1, cc,
             CAST(sum(c1) OVER (PARTITION BY nation ORDER BY w) AS BIGINT)
               AS f1,
             CAST(sum(cc) OVER (PARTITION BY nation ORDER BY w) AS BIGINT)
               AS fc
           FROM grid),
         terms AS (SELECT wc.nation, n1.n1, wc.w,
             (CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(fc AS DOUBLE) / CAST(nc AS DOUBLE))
             * (CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(fc AS DOUBLE) / CAST(nc AS DOUBLE))
             * (CAST(c1 AS DOUBLE) + CAST(cc AS DOUBLE))
             / (CAST(n1 AS DOUBLE) + CAST(nc AS DOUBLE)) AS tm
           FROM wc JOIN n1 USING (nation) CROSS JOIN nc)
         SELECT nation, n1 AS n_orders,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(tm ORDER BY w)), (p, q) -> p + q) AS cvm
         FROM terms GROUP BY 1, 2""",

    "q474_siegel_slopes" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS y
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY month) AS BIGINT)
             AS t, y FROM m),
         sl AS (SELECT a.t AS i,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
           FROM idx a JOIN idx b ON a.t <> b.t),
         med AS (SELECT i, quantile_cont(s, 0.5) AS mi FROM sl GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS n_months,
           round(quantile_cont(mi, 0.5), 4) AS siegel_slope
         FROM med""",

    "q477_jackknife_ratio" ->
      """WITH g AS (SELECT n_name AS nation,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS r,
           CAST(count(*) AS BIGINT) AS n
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1),
         tot AS (SELECT CAST(sum(r) AS BIGINT) AS tr,
             CAST(sum(n) AS BIGINT) AS tn,
             CAST(count(*) AS BIGINT) AS gg FROM g),
         reps AS (SELECT nation, gg,
             (CAST(tr AS DOUBLE) - CAST(r AS DOUBLE))
               / (CAST(tn AS DOUBLE) - CAST(n AS DOUBLE)) AS th
           FROM g CROSS JOIN tot),
         f AS (SELECT gg,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(th ORDER BY nation)), (p, q) -> p + q) AS sth,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(th * th ORDER BY nation)), (p, q) -> p + q) AS sth2
           FROM reps GROUP BY 1)
         SELECT f.gg AS n_groups,
           CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE) AS theta,
           (CAST(f.gg AS DOUBLE) - 1.0) / CAST(f.gg AS DOUBLE)
             * (sth2 - sth * sth / CAST(f.gg AS DOUBLE)) AS jk_var
         FROM f CROSS JOIN tot""",

    "q481_mmd_rbf" ->
      """WITH mx AS (SELECT CAST(max(n_chars) AS BIGINT) AS mx
           FROM documents),
         two AS (SELECT source FROM (SELECT DISTINCT source FROM documents)
           ORDER BY source LIMIT 2),
         banded AS (SELECT source,
             CAST(least(floor(n_chars * 64 / (mx + 1)), 63) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
           FROM documents CROSS JOIN mx
           WHERE source IN (SELECT source FROM two)
           GROUP BY 1, 2),
         s1 AS (SELECT min(source) AS s1 FROM two),
         s2 AS (SELECT max(source) AS s2 FROM two),
         pair AS (SELECT a.source AS sa, b.source AS sb, a.b AS ba,
             b.b AS bb, CAST(a.c * b.c AS BIGINT) AS cc,
             round(exp(CAST(a.b - b.b AS DOUBLE) * CAST(a.b - b.b AS DOUBLE)
               * -0.5 / 16.0), 6) AS k
           FROM banded a CROSS JOIN banded b),
         kxx AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(k * CAST(cc AS DOUBLE) ORDER BY ba, bb)),
               (p, q) -> p + q) AS kxx,
             CAST(sum(cc) AS BIGINT) AS kxx_n
           FROM pair, s1 WHERE sa = s1 AND sb = s1),
         kyy AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(k * CAST(cc AS DOUBLE) ORDER BY ba, bb)),
               (p, q) -> p + q) AS kyy,
             CAST(sum(cc) AS BIGINT) AS kyy_n
           FROM pair, s2 WHERE sa = s2 AND sb = s2),
         kxy AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(k * CAST(cc AS DOUBLE) ORDER BY ba, bb)),
               (p, q) -> p + q) AS kxy,
             CAST(sum(cc) AS BIGINT) AS kxy_n
           FROM pair, s1, s2 WHERE sa = s1 AND sb = s2)
         SELECT s1 AS source_a, s2 AS source_b,
           kxx / CAST(kxx_n AS DOUBLE) + kyy / CAST(kyy_n AS DOUBLE)
             - 2.0 * kxy / CAST(kxy_n AS DOUBLE) AS mmd2
         FROM kxx CROSS JOIN kyy CROSS JOIN kxy CROSS JOIN s1 CROSS JOIN s2""",

    "q483_seasonal_mk" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x,
           date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 7
             AS w
         FROM orders GROUP BY 1, 3),
         sper AS (SELECT a.w,
             CAST(sum(CASE WHEN b.x > a.x THEN 1
               WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS sw
           FROM daily a JOIN daily b ON a.w = b.w AND a.day < b.day
           GROUP BY 1),
         nper AS (SELECT w, CAST(count(*) AS BIGINT) AS nw
           FROM daily GROUP BY 1),
         agg AS (SELECT CAST(sum(sw) AS BIGINT) AS s,
             CAST(sum(nw * (nw - 1) * (nw * 2 + 5)) AS BIGINT) AS v18,
             CAST(sum(nw) AS BIGINT) AS n_days
           FROM sper JOIN nper USING (w))
         SELECT n_days, s AS s_stat,
           (CASE WHEN s > 0 THEN CAST(s AS DOUBLE) - 1.0
             WHEN s < 0 THEN CAST(s AS DOUBLE) + 1.0 ELSE 0.0 END)
             / sqrt(CAST(v18 AS DOUBLE) / 18.0) AS z
         FROM agg""",

    // ── Round-12 tier ───────────────────────────────────────────────────

    "q484_kendall_tau" ->
      """WITH b AS (SELECT p_brand AS brand,
           CAST(sum(CASE WHEN year(l_shipdate) = 1995
             THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS r95,
           CAST(sum(CASE WHEN year(l_shipdate) = 1996
             THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS r96
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE year(l_shipdate) IN (1995, 1996) GROUP BY 1),
         p AS (SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN (a.r95 < b.r95 AND a.r96 < b.r96)
               OR (a.r95 > b.r95 AND a.r96 > b.r96) THEN 1 ELSE 0 END)
               AS BIGINT) AS nc,
             CAST(sum(CASE WHEN (a.r95 < b.r95 AND a.r96 > b.r96)
               OR (a.r95 > b.r95 AND a.r96 < b.r96) THEN 1 ELSE 0 END)
               AS BIGINT) AS nd,
             CAST(sum(CASE WHEN a.r95 = b.r95 THEN 1 ELSE 0 END) AS BIGINT)
               AS tx,
             CAST(sum(CASE WHEN a.r96 = b.r96 THEN 1 ELSE 0 END) AS BIGINT)
               AS ty
           FROM b a JOIN b b ON a.brand < b.brand)
         SELECT n0 AS n_pairs, nc AS concordant, nd AS discordant,
           (CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
             / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE))
               * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE))) AS tau_b
         FROM p""",

    "q485_page_hinkley" ->
      s"""WITH daily AS (${OracleWarehouse.dailyRevenueSql}),
         tot AS (SELECT nation, CAST(count(*) AS BIGINT) AS nn,
             CAST(sum(c) AS BIGINT) AS ss FROM daily GROUP BY 1),
         st AS (SELECT d.nation, nn, ss,
             CAST(row_number() OVER (PARTITION BY d.nation ORDER BY d.d)
               AS BIGINT) AS t,
             CAST(sum(c) OVER (PARTITION BY d.nation ORDER BY d.d
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM daily d JOIN tot ON d.nation = tot.nation),
         m AS (SELECT nation, nn, ss, t,
             CAST(nn AS HUGEINT) * CAST(cum AS HUGEINT)
               - CAST(t AS HUGEINT) * CAST(ss AS HUGEINT) AS m2
           FROM st),
         ph AS (SELECT nation, nn, ss, m2
             - min(m2) OVER (PARTITION BY nation ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS ph
           FROM m)
         SELECT nation, nn AS n_days,
           CAST(sum(CASE WHEN ph > CAST(nn AS HUGEINT)
             * CAST(ss * 5 AS HUGEINT) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms,
           CAST(max(ph) AS DOUBLE) / CAST(nn AS DOUBLE) AS max_ph_cents
         FROM ph GROUP BY 1, 2""",

    "q486_theil_index" ->
      """WITH spend AS (SELECT n_name AS nation, o_custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1, 2),
         tot AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx FROM spend GROUP BY 1),
         terms AS (SELECT s.nation, t.n,
             CAST(round(CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
               / CAST(sx AS DOUBLE)
               * ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
                 / CAST(sx AS DOUBLE)) * 1000000.0) AS BIGINT) AS tm
           FROM spend s JOIN tot t ON s.nation = t.nation)
         SELECT nation, n AS n_customers,
           CAST(CAST(sum(tm) AS BIGINT) AS DOUBLE) / 1000000.0
             / CAST(n AS DOUBLE) AS theil_t
         FROM terms GROUP BY 1, 2""",

    "q487_cochran_armitage" ->
      """WITH cells AS (SELECT
           date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 7
             AS w,
           CAST(count(*) AS BIGINT) AS nw,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             AS BIGINT) AS rw
         FROM orders GROUP BY 1),
         m AS (SELECT CAST(sum(nw) AS BIGINT) AS n,
             CAST(sum(rw) AS BIGINT) AS r,
             CAST(sum(nw * w) AS BIGINT) AS snw,
             CAST(sum(nw * w * w) AS BIGINT) AS snww,
             CAST(sum(rw * w) AS BIGINT) AS srw
           FROM cells)
         SELECT n AS n_obs,
           (CAST(n AS DOUBLE) * CAST(srw AS DOUBLE)
             - CAST(r AS DOUBLE) * CAST(snw AS DOUBLE))
           / sqrt((CAST(r AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(r AS DOUBLE))
               / CAST(n AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(snww AS DOUBLE)
               - CAST(snw AS DOUBLE) * CAST(snw AS DOUBLE))
             / CAST(n AS DOUBLE)) AS ca_z
         FROM m""",

    "q488_kruskal_wallis" ->
      """WITH x AS (SELECT c_mktsegment AS g,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM orders JOIN customer ON o_custkey = c_custkey),
         grid AS (SELECT v, CAST(count(*) AS BIGINT) AS t
           FROM x GROUP BY 1),
         cum AS (SELECT v, t,
             (CAST(sum(t) OVER (ORDER BY v) AS BIGINT) - t) * 2 + t + 1
               AS mr2
           FROM grid),
         segv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cg
           FROM x GROUP BY 1, 2),
         rj AS (SELECT g, CAST(sum(cg) AS BIGINT) AS nj,
             sum(CAST(cg AS HUGEINT) * CAST(mr2 AS HUGEINT)) AS r2j
           FROM segv JOIN cum USING (v) GROUP BY 1),
         ties AS (SELECT CAST(sum(t) AS BIGINT) AS n,
             sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
               - CAST(t AS HUGEINT)) AS t3
           FROM grid),
         ht AS (SELECT g, n, t3,
             CAST(r2j AS DOUBLE) / 2.0 * (CAST(r2j AS DOUBLE) / 2.0)
               / CAST(nj AS DOUBLE) AS rr
           FROM rj CROSS JOIN ties)
         SELECT n AS n_obs, CAST(count(*) - 1 AS BIGINT) AS df,
           (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(rr ORDER BY g)), (p, q) -> p + q)
             - 3.0 * (CAST(n AS DOUBLE) + 1.0))
           / (1.0 - CAST(t3 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               - CAST(n AS DOUBLE))) AS h_corrected
         FROM ht GROUP BY 1, t3""",

    "q489_friedman" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS c,
           date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) // 7
             AS wk,
           date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 7
             AS w
         FROM orders GROUP BY 1, 3, 4),
         full_ AS (SELECT wk FROM daily GROUP BY 1 HAVING count(*) = 7),
         ranked AS (SELECT d.w,
             CAST(row_number() OVER (PARTITION BY d.wk
               ORDER BY d.c ASC, d.w ASC) AS BIGINT) AS rk
           FROM daily d JOIN full_ USING (wk)),
         rj AS (SELECT w, CAST(sum(rk) AS BIGINT) AS rj,
             CAST(count(*) AS BIGINT) AS nb
           FROM ranked GROUP BY 1)
         SELECT max(nb) AS n_blocks,
           12.0 / (CAST(max(nb) AS DOUBLE) * 7.0 * 8.0)
             * CAST(sum(rj * rj) AS DOUBLE)
             - 3.0 * CAST(max(nb) AS DOUBLE) * 8.0 AS friedman_chi2
         FROM rj""",

    "q490_ks_two_sample" ->
      """WITH x AS (SELECT c_mktsegment = 'BUILDING' AS g1,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM orders JOIN customer ON o_custkey = c_custkey),
         grid AS (SELECT v,
             CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
           FROM x GROUP BY 1),
         cum AS (SELECT v,
             CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
             CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum2
           FROM grid),
         tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2 FROM grid),
         scored AS (SELECT v, n1, n2,
             abs(CAST(cum1 AS HUGEINT) * CAST(n2 AS HUGEINT)
               - CAST(cum2 AS HUGEINT) * CAST(n1 AS HUGEINT)) AS dnum
           FROM cum CROSS JOIN tot)
         SELECT n1, n2,
           CAST((max(struct_pack(dnum := dnum, negv := -v))).dnum AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d,
           -(max(struct_pack(dnum := dnum, negv := -v))).negv AS at_cents
         FROM scored GROUP BY 1, 2""",

    "q495_sprt_daily" ->
      s"""WITH daily AS (${OracleWarehouse.dailyRevenueSql}),
         ranked AS (SELECT nation, d, c,
             CAST(row_number() OVER (PARTITION BY nation
               ORDER BY c ASC, d ASC) AS BIGINT) AS rn
           FROM daily),
         cnt AS (SELECT nation, CAST(count(*) AS BIGINT) AS n
           FROM daily GROUP BY 1),
         meds AS (SELECT r.nation,
             CASE WHEN count(*) = 1 THEN CAST(sum(r.c) AS BIGINT) * 2
               ELSE CAST(sum(r.c) AS BIGINT) END AS med2
           FROM ranked r JOIN cnt ON r.nation = cnt.nation
           WHERE r.rn = (cnt.n + 1) // 2 OR r.rn = cnt.n // 2 + 1
           GROUP BY 1),
         walk AS (SELECT d.nation,
             CAST(row_number() OVER (PARTITION BY d.nation ORDER BY d.d)
               AS BIGINT) AS t,
             CAST(sum(CASE WHEN d.c * 2 > m.med2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY d.nation ORDER BY d.d
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k
           FROM daily d JOIN meds m ON d.nation = m.nation),
         cross_ AS (SELECT nation,
             (min(struct_pack(t := t, s := k * 2 - t))).t AS decided_at_day,
             CASE WHEN (min(struct_pack(t := t, s := k * 2 - t))).s >= 8
               THEN 'accept_h1' ELSE 'accept_h0' END AS decision
           FROM walk WHERE abs(k * 2 - t) >= 8 GROUP BY 1)
         SELECT cnt.nation, cnt.n AS n_days,
           CAST(coalesce(decided_at_day, -1) AS BIGINT) AS decided_at_day,
           coalesce(decision, 'undecided') AS decision
         FROM cnt LEFT JOIN cross_ ON cnt.nation = cross_.nation""",

    "q498_gumbel_maxima" ->
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS c
         FROM orders GROUP BY 1),
         mx AS (SELECT strftime(day, '%Y-%m') AS month,
             CAST(max(c) AS BIGINT) AS m FROM daily GROUP BY 1),
         mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(m) AS BIGINT) AS s1,
             sum(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS s2 FROM mx),
         f AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_max,
             sqrt((CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0))
               * CAST(${QueryDsl.Sqrt6OverPi} AS DOUBLE) AS beta
           FROM mom)
         SELECT n AS n_months, mean_max, beta,
           mean_max - CAST(${QueryDsl.EulerGamma} AS DOUBLE) * beta AS mu
         FROM f""",

    "q499_runs_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS c
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
             AS t, c FROM daily),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM idx),
         med AS (SELECT CASE WHEN count(*) = 1
               THEN CAST(sum(c) AS BIGINT) * 2
               ELSE CAST(sum(c) AS BIGINT) END AS med2
           FROM idx CROSS JOIN nn
           WHERE t = (nn + 1) // 2 OR t = nn // 2 + 1),
         signed AS (SELECT t, c * 2 > med2 AS up
           FROM idx CROSS JOIN med WHERE c * 2 <> med2),
         re AS (SELECT CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i,
             up FROM signed),
         sw AS (SELECT CAST(sum(CASE WHEN a.up <> b.up THEN 1 ELSE 0 END)
             AS BIGINT) AS sw
           FROM re a JOIN re b ON a.i = b.i - 1),
         counts AS (SELECT
             CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS n2
           FROM signed)
         SELECT n1, n2, CAST(sw + 1 AS BIGINT) AS runs,
           (CAST(sw AS DOUBLE) + 1.0
             - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
           / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
               * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
               * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))) AS z
         FROM counts CROSS JOIN sw""",

    "q500_spearman_brands" ->
      """WITH b AS (SELECT p_brand AS brand,
           CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS sq,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS sp,
           CAST(count(*) AS BIGINT) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
         rq AS (SELECT a.brand,
             CAST(count(o.brand) + 1 AS BIGINT) AS rkq
           FROM b a LEFT JOIN b o ON o.sq > a.sq
             OR (o.sq = a.sq AND o.brand < a.brand)
           GROUP BY 1),
         rp AS (SELECT a.brand,
             CAST(count(o.brand) + 1 AS BIGINT) AS rkp
           FROM b a LEFT JOIN b o
             ON CAST(o.sp AS HUGEINT) * CAST(a.n AS HUGEINT)
               > CAST(a.sp AS HUGEINT) * CAST(o.n AS HUGEINT)
             OR (CAST(o.sp AS HUGEINT) * CAST(a.n AS HUGEINT)
               = CAST(a.sp AS HUGEINT) * CAST(o.n AS HUGEINT)
               AND o.brand < a.brand)
           GROUP BY 1),
         dd AS (SELECT (rkq - rkp) * (rkq - rkp) AS d2
           FROM rq JOIN rp USING (brand))
         SELECT CAST(count(*) AS BIGINT) AS n_brands,
           CAST(sum(d2) AS BIGINT) AS sum_d2,
           1.0 - 6.0 * CAST(sum(d2) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE)
               * (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) - 1.0))
             AS rho
         FROM dd""",
  )

  /** Shared lifetime CTEs (q438–q440): per-customer first/last order
    * dates, 90-day right-censoring against the corpus max date.
    */
  private def lifetimeBase: String =
    """per AS (SELECT o_custkey AS ck,
           min(CAST(o_orderdate AS DATE)) AS fd,
           max(CAST(o_orderdate AS DATE)) AS ld
         FROM orders GROUP BY 1),
       mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
       lt AS (SELECT ck, CAST(date_diff('day', fd, ld) AS BIGINT) AS t,
           CASE WHEN ld < md - 90 THEN 1 ELSE 0 END AS ev
         FROM per CROSS JOIN mx)"""

  private def lifetimeCtes: String =
    s"""$lifetimeBase,
       g0 AS (SELECT t, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(ev) AS BIGINT) AS d FROM lt GROUP BY 1),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM lt),
       grid AS (SELECT t, c, d,
           nn - (CAST(sum(c) OVER (ORDER BY t) AS BIGINT) - c) AS n_risk
         FROM g0 CROSS JOIN nn)"""
}
