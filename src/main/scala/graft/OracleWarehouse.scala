package graft

import OracleHelpers._

/** DuckDB oracle SQL for the QueriesWarehouse tier (cross-engine determinism
  * rules in the SparkEntry scaladoc). Moved verbatim from SparkEntry.
  */
private[graft] object OracleWarehouse {
  def map: Map[String, String] = Map(
    "q85_bloom_pruned_join" ->
      """SELECT p_brand, count(*) AS n_items,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 1 GROUP BY p_brand""",
    "q89_heavy_hitters" ->
      """WITH c AS (SELECT lang, source, count(*) AS cnt
           FROM documents GROUP BY lang, source),
         r AS (SELECT lang, source, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rk
           FROM c)
         SELECT lang, source, CAST(cnt AS BIGINT) AS cnt FROM r WHERE rk <= 3""",
    "q97_zorder_box" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events
         WHERE user_id >= 10 AND user_id <= 40
           AND value >= 20.0 AND value <= 60.0
         GROUP BY 1""",
    "q93_manifest_scan" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events WHERE value >= 10.0 AND value <= 20.0
         GROUP BY 1""",
    "q107_decile_bins" ->
      """WITH b AS (
           SELECT quantile_cont(o_totalprice,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
           FROM orders),
         t AS (
           SELECT o_totalprice,
             1 + (SELECT count(*) FROM unnest((SELECT qs FROM b)) AS u(q)
                  WHERE o_totalprice > q) AS decile
           FROM orders)
         SELECT CAST(decile AS INT) AS decile, count(*) AS n,
                min(o_totalprice) AS min_price,
                max(o_totalprice) AS max_price
         FROM t GROUP BY decile""",
    "q106_transitions" ->
      """WITH t AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events)
         SELECT event_type, next_type, count(*) AS n
         FROM t WHERE next_type IS NOT NULL
         GROUP BY 1, 2""",
    "q104_funnel" ->
      """WITH f AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
           FROM events GROUP BY user_id)
         SELECT CASE
             WHEN first_view IS NULL THEN 'no_view'
             WHEN first_click IS NULL OR first_click <= first_view THEN 'view'
             WHEN first_purchase IS NULL OR first_purchase <= first_click
               THEN 'view_click'
             ELSE 'view_click_purchase' END AS stage,
           count(*) AS n_users
         FROM f GROUP BY 1""",
    "q105_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
         SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
                datediff('day', c.cohort_day, e.day) AS day_offset,
                count(DISTINCT e.user_id) AS n_active
         FROM e JOIN c USING (user_id)
         WHERE datediff('day', c.cohort_day, e.day) <= 7
         GROUP BY 1, 2""",
    "q103_time_travel" ->
      """SELECT 'v1' AS snapshot, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events WHERE event_id % 2 = 0
         UNION ALL
         SELECT 'v2', count(*),
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events
         UNION ALL
         SELECT 'delta', count(*),
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events WHERE event_id % 2 = 1""",
    "q102_bloom_point_scan" ->
      """SELECT user_id, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events WHERE user_id IN (3, 77, 142)
         GROUP BY user_id""",
    "q111_sliding_distinct" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, event_type,
                  list(DISTINCT user_id) AS users
           FROM events GROUP BY 1, 2)
         SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
           len(users) AS n_today,
           len(list_distinct(flatten(list(users) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)))) AS n_trailing_3d
         FROM daily""",
    "q110_stratum_topk" ->
      """WITH h AS (SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang ORDER BY
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0, doc_id) AS rn
           FROM documents)
         SELECT doc_id, lang FROM h WHERE rn <= 20""",
    "q101_quarantine" ->
      """SELECT event_id,
         concat_ws(',',
           CASE WHEN value > 95.0 THEN 'extreme_value' END,
           CASE WHEN user_id >= 140 THEN 'suspect_user' END,
           CASE WHEN event_type IS NULL THEN 'null_type' END) AS violations
         FROM events
         WHERE value > 95.0 OR user_id >= 140 OR event_type IS NULL""",
    "q92_count_min" ->
      """WITH params(i, a, b) AS (VALUES
           (0, 1103515245, 12345), (1, 1229782938, 1013904223),
           (2, 1103581, 7919), (3, 48271, 11)),
         counters AS (
           -- Reduce the key mod the Mersenne prime BEFORE the multiply
           -- (mirrors CountMinCore.bucket): a_max * (p-1) < 2^62, so the
           -- product never overflows INT64 even for sf1+ shifted keys
           -- (raw a * user_id blew past INT64 at user_id ~ 8e9).
           SELECT p.i,
                  ((p.a * (e.user_id % 2147483647) + p.b) % 2147483647) % 64
                    AS bucket,
                  count(*) AS c
           FROM events e CROSS JOIN params p GROUP BY 1, 2),
         keys AS (SELECT range AS user_id FROM range(0, 10)),
         est AS (
           SELECT k.user_id, min(coalesce(c.c, 0)) AS cm_est
           FROM keys k CROSS JOIN params p
           LEFT JOIN counters c
             ON c.i = p.i
            AND c.bucket =
              ((p.a * (k.user_id % 2147483647) + p.b) % 2147483647) % 64
           GROUP BY 1),
         truth AS (SELECT user_id, count(*) AS true_cnt FROM events GROUP BY 1)
         SELECT e.user_id, CAST(coalesce(t.true_cnt, 0) AS BIGINT) AS true_cnt,
                CAST(e.cm_est AS BIGINT) AS cm_est
         FROM est e LEFT JOIN truth t USING (user_id)""",
    "q160_scd2_dimension" ->
      """WITH snap AS (SELECT c_custkey, c_acctbal FROM customer),
         upd AS (
           SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
           FROM snap WHERE c_custkey % 7 = 0
           UNION ALL
           SELECT c_custkey + 10000000, 0.0 FROM snap WHERE c_custkey % 13 = 0),
         chg AS (
           SELECT u.c_custkey, u.c_acctbal, CAST(2 AS BIGINT) AS version
           FROM upd u JOIN snap b USING (c_custkey)
           WHERE u.c_acctbal IS DISTINCT FROM b.c_acctbal),
         ins AS (
           SELECT u.c_custkey, u.c_acctbal, CAST(1 AS BIGINT) AS version
           FROM upd u ANTI JOIN snap b USING (c_custkey)),
         closed AS (
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             false AS is_current, '2026-01-01' AS valid_from,
             '2026-06-01' AS valid_to
           FROM snap b SEMI JOIN chg c USING (c_custkey)),
         carried AS (
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             true AS is_current, '2026-01-01' AS valid_from,
             '9999-12-31' AS valid_to
           FROM snap b ANTI JOIN chg c USING (c_custkey)),
         opened AS (
           SELECT c_custkey, c_acctbal, version, true AS is_current,
             '2026-06-01' AS valid_from, '9999-12-31' AS valid_to
           FROM (SELECT * FROM chg UNION ALL SELECT * FROM ins))
         SELECT * FROM closed UNION ALL SELECT * FROM carried
         UNION ALL SELECT * FROM opened""",
    "q162_pit_join" ->
      """WITH snap AS (SELECT c_custkey, c_acctbal FROM customer),
         upd AS (
           SELECT c_custkey, c_acctbal + 500.0 AS c_acctbal
           FROM snap WHERE c_custkey % 3 = 0),
         chg AS (
           SELECT u.c_custkey, u.c_acctbal, CAST(2 AS BIGINT) AS version
           FROM upd u JOIN snap b USING (c_custkey)
           WHERE u.c_acctbal IS DISTINCT FROM b.c_acctbal),
         dim AS (
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             '1990-01-01' AS valid_from, '1995-06-17' AS valid_to
           FROM snap b SEMI JOIN chg c USING (c_custkey)
           UNION ALL
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             '1990-01-01', '9999-12-31'
           FROM snap b ANTI JOIN chg c USING (c_custkey)
           UNION ALL
           SELECT c_custkey, c_acctbal, version, '1995-06-17', '9999-12-31'
           FROM chg)
         SELECT o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           d.c_acctbal AS acctbal_asof, d.version
         FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
           AND CAST(o.o_orderdate AS DATE) >= CAST(d.valid_from AS DATE)
           AND CAST(o.o_orderdate AS DATE) < CAST(d.valid_to AS DATE)""",
    "q164_assoc_rules" ->
      """WITH items AS MATERIALIZED (
           SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
         marg AS (SELECT brand, CAST(count(*) AS BIGINT) AS cnt
           FROM items GROUP BY brand),
         pairs AS (
           SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS pair_cnt
           FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
           GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT p.brand_a, p.brand_b, p.pair_cnt,
           round(CAST(p.pair_cnt AS DOUBLE) / CAST(t.n_baskets AS DOUBLE), 6)
             AS support,
           round(CAST(p.pair_cnt AS DOUBLE) / CAST(ma.cnt AS DOUBLE), 6)
             AS confidence,
           round(CAST(p.pair_cnt * t.n_baskets AS DOUBLE)
             / CAST(ma.cnt * mb.cnt AS DOUBLE), 6) AS lift
         FROM pairs p
         JOIN marg ma ON p.brand_a = ma.brand
         JOIN marg mb ON p.brand_b = mb.brand
         CROSS JOIN tot t""",
    "q165_hopping_window" ->
      """WITH e AS (
           SELECT time_bucket(INTERVAL '15 minutes', ts) AS b, event_type, value
           FROM events),
         w AS (
           SELECT b AS ws, event_type, value FROM e
           UNION ALL
           SELECT b - INTERVAL '15 minutes', event_type, value FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
         FROM w GROUP BY 1, 2""",
    "q166_funnel_steps" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, min(us) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.us) AS t2 FROM ev e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY 1),
         p AS (SELECT e.user_id, min(e.us) AS t3 FROM ev e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY 1),
         s AS (SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_after_view,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_after_click)
         SELECT n_view, n_click_after_view, n_purchase_after_click,
           round(CAST(n_click_after_view AS DOUBLE)
             / CAST(n_view AS DOUBLE), 6) AS click_rate,
           round(CAST(n_purchase_after_click AS DOUBLE)
             / CAST(n_view AS DOUBLE), 6) AS purchase_rate
         FROM s""",
    "q168_k_anonymity" ->
      """WITH g AS (
           SELECT c.c_mktsegment AS segment, n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2)
         SELECT segment, nation, n, false AS suppressed FROM g WHERE n >= 5
         UNION ALL
         SELECT '*' AS segment, '*' AS nation,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS n, true AS suppressed
         FROM g WHERE n < 5 HAVING coalesce(sum(n), 0) > 0""",
    "q172_markov_transitions" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         nx AS (SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS nxt
           FROM ev),
         pairs AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
           FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2),
         marg AS (SELECT cur, CAST(sum(cnt) AS BIGINT) AS tot
           FROM pairs GROUP BY 1)
         SELECT p.cur, p.nxt, p.cnt,
           round(CAST(p.cnt AS DOUBLE) / CAST(m.tot AS DOUBLE), 6) AS prob
         FROM pairs p JOIN marg m USING (cur)""",
    "q177_moment_profile" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS s1,
           CAST(sum(n_chars * n_chars) AS BIGINT) AS s2,
           CAST(sum(n_chars * n_chars * n_chars) AS BIGINT) AS s3,
           CAST(sum(n_chars * n_chars * n_chars * n_chars) AS BIGINT) AS s4
           FROM documents GROUP BY source),
         e AS (SELECT source, n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
           CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
           CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
           CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
           FROM g),
         v AS (SELECT source, n, m, e2, e3, e4, e2 - m * m AS v FROM e)
         SELECT source, n, round(m, 4) AS mean, round(sqrt(v), 4) AS stddev,
           round((e3 - m * 3.0 * v - m * m * m) / (v * sqrt(v)), 4)
             AS skewness,
           round((e4 - 4.0 * m * e3 + 6.0 * m * m * e2
             - 3.0 * m * m * m * m) / (v * v), 4) AS kurtosis
         FROM v""",
    "q180_frequent_triples" ->
      """WITH items AS MATERIALIZED (
           SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
           FROM items),
         l2 AS MATERIALIZED (
           SELECT x.brand AS pa, y.brand AS pb
           FROM items x JOIN items y ON x.ok = y.ok AND x.brand < y.brand
           CROSS JOIN tot
           GROUP BY 1, 2, n_baskets HAVING count(*) * 200 >= n_baskets),
         cand AS (
           SELECT m.pa AS a, m.pb AS b, n.pb AS c
           FROM l2 m JOIN l2 n ON m.pa = n.pa AND m.pb < n.pb
           SEMI JOIN l2 z ON z.pa = m.pb AND z.pb = n.pb),
         tri AS (
           SELECT i1.brand AS a, i2.brand AS b, i3.brand AS c
           FROM items i1
           JOIN items i2 ON i1.ok = i2.ok AND i1.brand < i2.brand
           JOIN items i3 ON i1.ok = i3.ok AND i2.brand < i3.brand
           SEMI JOIN cand ON cand.a = i1.brand AND cand.b = i2.brand
             AND cand.c = i3.brand)
         SELECT a, b, c, CAST(count(*) AS BIGINT) AS cnt,
           round(CAST(count(*) AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)
             AS support
         FROM tri CROSS JOIN tot
         GROUP BY a, b, c, n_baskets HAVING count(*) * 200 >= n_baskets""",
    "q181_skyline" ->
      """WITH p AS (
           SELECT doc_id, CAST(len(w) AS BIGINT) AS nt,
             round(CAST(len(list_distinct(w)) AS DOUBLE)
               / CAST(len(w) AS DOUBLE), 6) AS ttr
           FROM (SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS w FROM documents))
         SELECT doc_id, nt AS n_tokens, ttr FROM p a
         WHERE NOT EXISTS (
           SELECT 1 FROM p b WHERE b.nt >= a.nt AND b.ttr >= a.ttr
             AND (b.nt > a.nt OR b.ttr > a.ttr))""",
    "q185_noisy_counts" ->
      """WITH g AS (
           SELECT c.c_mktsegment AS segment, n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2),
         u AS (SELECT segment, nation, n,
             (CAST(CAST(concat('0x', substr(md5(concat(segment, '|', nation)),
               1, 8)) AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
           FROM g)
         SELECT segment, nation, n,
           round(-CAST(2.0 AS DOUBLE) * sign(u - 0.5)
             * ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs(u - 0.5)), 4)
             AS noise,
           round(CAST(n AS DOUBLE) + (-CAST(2.0 AS DOUBLE) * sign(u - 0.5)
             * ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs(u - 0.5))), 4)
             AS noisy_n
         FROM u""",
    "q186_cdc_compact" ->
      """WITH chg AS (
           SELECT o_custkey AS ckey, o_orderkey AS seq,
             CASE WHEN o_orderkey % 10 = 9 THEN 'D'
               WHEN o_orderkey % 10 >= 6 THEN 'U' ELSE 'I' END AS op,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS val
           FROM orders),
         lst AS (SELECT ckey, max(seq) AS seq FROM chg GROUP BY 1)
         SELECT c.ckey, c.seq, c.op, c.val
         FROM chg c JOIN lst USING (ckey, seq) WHERE c.op <> 'D'""",
    "q187_path_trigrams" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         x AS (SELECT event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS e3
           FROM ev)
         SELECT concat_ws('>', e1, e2, e3) AS path,
           CAST(count(*) AS BIGINT) AS cnt
         FROM x WHERE e3 IS NOT NULL
         GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20""",
    "q188_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, min(us) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         pu AS (SELECT e.user_id, v.t1, min(e.us) AS t2
           FROM ev e JOIN v USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > v.t1 GROUP BY 1, 2),
         d AS (SELECT t2 - t1 AS delay_us FROM pu)
         SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           round(CAST(sum(delay_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1000000.0, 4) AS avg_s,
           round(median(delay_us) / 1000000.0, 4) AS median_s,
           round(quantile_cont(delay_us, 0.9) / 1000000.0, 4) AS p90_s
         FROM d""",
    "q189_ewma_daily" ->
      """WITH daily AS MATERIALIZED (
           SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
           FROM (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1)),
         comp AS (SELECT b.day, b.x, a.t AS ti,
             round((CASE WHEN a.t = 1
               THEN pow(CAST(0.7 AS DOUBLE), CAST(b.t - 1 AS DOUBLE))
               ELSE CAST(0.3 AS DOUBLE)
                 * pow(CAST(0.7 AS DOUBLE), CAST(b.t - a.t AS DOUBLE)) END)
               * CAST(a.x AS DOUBLE), 6) AS c
           FROM daily b JOIN daily a ON a.t <= b.t)
         SELECT day, x, round(list_sum(list(c ORDER BY ti)), 4) AS ewma
         FROM comp GROUP BY day, x""",
    "q190_seasonality" ->
      """WITH s AS (
           SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
             CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM s)
         SELECT dow, hour, cnt,
           round(CAST(cnt * 168 AS DOUBLE) / CAST(total AS DOUBLE), 4) AS lift
         FROM s CROSS JOIN t""",
    "q191_cusum_changepoint" ->
      """WITH daily AS MATERIALIZED (
           SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(sum(x) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
           FROM (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1)),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
           CAST(sum(x) AS BIGINT) AS tot FROM daily),
         cv AS (SELECT d.day, d.t, d.cum,
             CAST(d.cum AS DOUBLE) - CAST(d.t AS DOUBLE)
               * (CAST(st.tot AS DOUBLE) / CAST(st.nd AS DOUBLE)) AS cusum,
             st.nd
           FROM daily d CROSS JOIN st),
         cp AS (SELECT day AS cp_day, cusum AS cp_cusum, nd
           FROM cv ORDER BY abs(cusum) DESC, day LIMIT 1)
         SELECT cp.cp_day, round(cp.cp_cusum, 4) AS cusum, cp.nd AS n_days,
           round(CAST(sum(CASE WHEN d.day <= cp.cp_day THEN d.x END) AS DOUBLE)
             / CAST(count(CASE WHEN d.day <= cp.cp_day THEN 1 END) AS DOUBLE),
             4) AS mean_before,
           round(CAST(sum(CASE WHEN d.day > cp.cp_day THEN d.x END) AS DOUBLE)
             / CAST(count(CASE WHEN d.day > cp.cp_day THEN 1 END) AS DOUBLE),
             4) AS mean_after
         FROM daily d CROSS JOIN cp
         GROUP BY cp.cp_day, cp.cp_cusum, cp.nd""",
    "q192_rfm" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           CAST(o_totalprice AS DECIMAL(18,2)) AS tp FROM orders),
         mx AS (SELECT max(d) AS dmax FROM o),
         cust AS (SELECT o_custkey,
             CAST(date_diff('day', max(d), (SELECT dmax FROM mx)) AS BIGINT)
               AS r,
             CAST(count(*) AS BIGINT) AS f, sum(tp) AS m
           FROM o GROUP BY 1),
         th AS (SELECT
             quantile_cont(CAST(r AS DOUBLE), 0.25) AS r1,
             quantile_cont(CAST(r AS DOUBLE), 0.5) AS r2,
             quantile_cont(CAST(r AS DOUBLE), 0.75) AS r3,
             quantile_cont(CAST(f AS DOUBLE), 0.25) AS f1,
             quantile_cont(CAST(f AS DOUBLE), 0.5) AS f2,
             quantile_cont(CAST(f AS DOUBLE), 0.75) AS f3,
             quantile_cont(CAST(m AS DOUBLE), 0.25) AS m1,
             quantile_cont(CAST(m AS DOUBLE), 0.5) AS m2,
             quantile_cont(CAST(m AS DOUBLE), 0.75) AS m3
           FROM cust),
         coded AS (SELECT
             5 - (CASE WHEN CAST(r AS DOUBLE) <= r1 THEN 1
               WHEN CAST(r AS DOUBLE) <= r2 THEN 2
               WHEN CAST(r AS DOUBLE) <= r3 THEN 3 ELSE 4 END) AS r_code,
             CASE WHEN CAST(f AS DOUBLE) <= f1 THEN 1
               WHEN CAST(f AS DOUBLE) <= f2 THEN 2
               WHEN CAST(f AS DOUBLE) <= f3 THEN 3 ELSE 4 END AS f_code,
             CASE WHEN CAST(m AS DOUBLE) <= m1 THEN 1
               WHEN CAST(m AS DOUBLE) <= m2 THEN 2
               WHEN CAST(m AS DOUBLE) <= m3 THEN 3 ELSE 4 END AS m_code,
             m
           FROM cust CROSS JOIN th)
         SELECT r_code, f_code, m_code,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE), 2)
             AS avg_monetary
         FROM coded GROUP BY 1, 2, 3""",
    "q197_skew_report" ->
      """WITH kc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
           FROM lineitem GROUP BY 1),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows FROM kc)
         SELECT l_partkey, cnt,
           round(CAST(cnt AS DOUBLE)
             / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 4)
             AS rel_load
         FROM kc CROSS JOIN st
         ORDER BY cnt DESC, l_partkey LIMIT 10""",
    "q198_catalog_stats" ->
      Seq(
        "region" -> "r_regionkey", "nation" -> "n_nationkey",
        "customer" -> "c_custkey", "supplier" -> "s_suppkey",
        "part" -> "p_partkey", "orders" -> "o_orderkey",
        "lineitem" -> "l_orderkey", "events" -> "event_id",
        "documents" -> "doc_id", "embeddings" -> "vec_id")
        .map { case (t, pk) =>
          s"""SELECT '$t' AS table_name, '$pk' AS pk,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT $pk) AS BIGINT) AS n_distinct_pk FROM $t"""
        }.mkString("\n UNION ALL \n"),
    "q199_yoy_growth" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1)
         SELECT month, CAST(rev AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE)
             / CAST(lag(rev, 12) OVER (ORDER BY month) AS DOUBLE)
             - CAST(1.0 AS DOUBLE), 6) AS yoy_growth
         FROM m""",
    "q200_pareto_revenue" ->
      """WITH cust AS (SELECT o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS rev_c
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c,
           CAST(count(*) AS BIGINT) AS n FROM cust),
         ranked AS (SELECT rev_c,
             CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_c
           FROM cust)
         SELECT n AS n_customers,
           CAST(sum(CASE WHEN (cum_c - rev_c) * 10 < total_c * 8
             THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
           round(CAST(sum(CASE WHEN (cum_c - rev_c) * 10 < total_c * 8
             THEN 1 ELSE 0 END) AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS top80_frac,
           round(CAST(total_c AS DOUBLE) / 100.0, 2) AS total_revenue
         FROM ranked CROSS JOIN tot
         GROUP BY n, total_c""",
    "q201_top_brands_per_nation" ->
      """WITH rolled AS (
           SELECT n.n_name AS nation, p.p_brand AS brand,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (CAST(1 AS DECIMAL(18,2))
                 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2)
         SELECT nation, brand, CAST(rev AS DOUBLE) AS revenue
         FROM (SELECT nation, brand, rev,
             row_number() OVER (PARTITION BY nation
               ORDER BY rev DESC, brand) AS rn
           FROM rolled) WHERE rn <= 3""",
    "q202_fk_audit" ->
      """SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST(count(*) AS BIGINT) AS n_orphans,
           CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys
         FROM (SELECT l_orderkey AS k FROM lineitem) f
         ANTI JOIN (SELECT o_orderkey AS k FROM orders) p USING (k)
         UNION ALL
         SELECT 'lineitem.l_partkey -> part',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
         FROM (SELECT l_partkey AS k FROM lineitem) f
         ANTI JOIN (SELECT p_partkey AS k FROM part) p USING (k)
         UNION ALL
         SELECT 'lineitem.l_suppkey -> supplier',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
         FROM (SELECT l_suppkey AS k FROM lineitem) f
         ANTI JOIN (SELECT s_suppkey AS k FROM supplier) p USING (k)
         UNION ALL
         SELECT 'orders.o_custkey -> customer',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
         FROM (SELECT o_custkey AS k FROM orders) f
         ANTI JOIN (SELECT c_custkey AS k FROM customer) p USING (k)""",
    "q140_topk_per_key" ->
      """SELECT event_type, event_id, value FROM (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value DESC, event_id) AS rn
           FROM events) t
         WHERE rn <= 3""",
    "q75_kmv_sketch" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
           CAST(CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS hv
         FROM lineitem),
         r AS (SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS nd
           FROM h)
         SELECT l_returnflag,
           CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
                ELSE 63.0 / max(CASE WHEN rn = 64 THEN hv END) END AS distinct_est
         FROM r GROUP BY l_returnflag""",
    "q73_salted_agg" ->
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
    "q116_bucketed_join" ->
      """SELECT o.o_custkey, count(1) AS n_items,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY o.o_custkey""",
    "q117_partitioned_scan" ->
      """SELECT event_type, count(1) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events WHERE event_type IN ('purchase', 'error')
         GROUP BY event_type""",
    "q96_profile" ->
      """SELECT 'o_orderstatus' AS "column", count(*) AS n_rows,
           count(*) - count(o_orderstatus) AS n_nulls,
           count(DISTINCT o_orderstatus) AS n_distinct,
           CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
           CAST(max(o_orderstatus) AS VARCHAR) AS max_value FROM orders
         UNION ALL
         SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR),
           CAST(max(o_custkey) AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           CAST(min(o_orderdate) AS VARCHAR),
           CAST(max(o_orderdate) AS VARCHAR) FROM orders""",
    // Sketch validation contract: the oracle's exact side plus the
    // always-TRUE error-bound flags the Spark side must reproduce.
    "q59_sketches" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
         TRUE AS approx_parts_ok, TRUE AS p50_ok
         FROM lineitem GROUP BY l_returnflag""",

    "q205_gap_fill" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
           FROM orders GROUP BY 1),
         bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
         spine AS (
           SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
             CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
         filled AS (
           SELECT s.day, max(dd.d) AS src_day
           FROM spine s JOIN daily dd ON dd.d <= s.day GROUP BY s.day)
         SELECT strftime(f.day, '%Y-%m-%d') AS day, dl.rev AS rev_filled,
           (f.src_day <> f.day) AS is_gap
         FROM filled f JOIN daily dl ON dl.d = f.src_day""",

    "q206_attribution" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type, value FROM events),
         fp AS (
           SELECT user_id, ts AS p_ts, event_id AS p_id, value AS p_value FROM (
             SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM e WHERE event_type = 'purchase') WHERE rn = 1),
         ft AS (
           SELECT user_id, event_type AS first_ch FROM (
             SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM e) WHERE rn = 1),
         lt AS (
           SELECT user_id, event_type AS last_ch FROM (
             SELECT e.user_id, e.event_type,
               row_number() OVER (PARTITION BY e.user_id
                 ORDER BY e.ts DESC, e.event_id DESC) AS rn
             FROM e JOIN fp ON e.user_id = fp.user_id
             WHERE e.ts < fp.p_ts OR (e.ts = fp.p_ts AND e.event_id < fp.p_id))
           WHERE rn = 1),
         fta AS (
           SELECT first_ch AS channel, CAST(count(*) AS BIGINT) AS n_first,
             CAST(sum(CAST(p_value AS DECIMAL(18,2))) AS DOUBLE) AS val_first
           FROM ft JOIN fp USING (user_id) GROUP BY 1),
         lta AS (
           SELECT last_ch AS channel, CAST(count(*) AS BIGINT) AS n_last
           FROM lt GROUP BY 1)
         SELECT coalesce(fta.channel, lta.channel) AS channel,
           coalesce(n_first, 0) AS n_first,
           coalesce(val_first, 0.0) AS val_first,
           coalesce(n_last, 0) AS n_last
         FROM fta FULL JOIN lta ON fta.channel = lta.channel""",

    "q209_weighted_median" ->
      """WITH items AS (
           SELECT l_orderkey, CAST(count(*) AS BIGINT) AS w
           FROM lineitem GROUP BY 1),
         o AS (
           SELECT o_custkey, o_totalprice, o_orderkey, w
           FROM orders JOIN items ON o_orderkey = l_orderkey),
         c AS (
           SELECT o_custkey, o_totalprice, w,
             sum(w) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey ROWS UNBOUNDED PRECEDING) AS cumw,
             sum(w) OVER (PARTITION BY o_custkey) AS totw
           FROM o)
         SELECT o_custkey, min(o_totalprice) AS w_median,
           CAST(max(totw) AS BIGINT) AS total_weight
         FROM c WHERE cumw * 2 >= totw GROUP BY o_custkey""",

    // Exact replay of DdSketch (γ = 101/99): same 6-dp-rounded log
    // bucketing, same integer rank walk, same 4-dp midpoint estimate.
    "q213_ddsketch_quantiles" ->
      """WITH li AS (SELECT l_returnflag,
             CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
         b AS (SELECT l_returnflag,
             CAST(ceil(round(ln(v) / ln(101.0/99.0), 6)) AS BIGINT) AS idx,
             CAST(count(*) AS BIGINT) AS c
           FROM li GROUP BY 1, 2),
         cum AS (SELECT l_returnflag, idx, c,
             sum(c) OVER (PARTITION BY l_returnflag ORDER BY idx
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY l_returnflag) AS n
           FROM b),
         p50 AS (SELECT l_returnflag, min(idx) AS i50 FROM cum
           WHERE cum * 2 >= n GROUP BY 1),
         p90 AS (SELECT l_returnflag, min(idx) AS i90 FROM cum
           WHERE cum * 10 >= n * 9 GROUP BY 1),
         ex AS (SELECT l_returnflag,
             quantile_cont(v, 0.5) AS e50, quantile_cont(v, 0.9) AS e90,
             CAST(count(*) AS BIGINT) AS n_rows
           FROM li GROUP BY 1)
         SELECT ex.l_returnflag, n_rows,
           round(2.0 * pow(101.0/99.0, i50) / (101.0/99.0 + 1.0), 4) AS p50_est,
           round(2.0 * pow(101.0/99.0, i90) / (101.0/99.0 + 1.0), 4) AS p90_est,
           (abs(round(2.0 * pow(101.0/99.0, i50) / (101.0/99.0 + 1.0), 4) - e50)
             <= e50 * 0.02) AS p50_ok,
           (abs(round(2.0 * pow(101.0/99.0, i90) / (101.0/99.0 + 1.0), 4) - e90)
             <= e90 * 0.02) AS p90_ok
         FROM ex JOIN p50 USING (l_returnflag) JOIN p90 USING (l_returnflag)""",
    "q218_retention_cohorts" ->
      """WITH o AS (SELECT o_custkey AS cust,
           CAST(year(o_orderdate)*12 + month(o_orderdate) - 1 AS BIGINT) AS m
           FROM orders),
         f AS (SELECT cust, min(m) AS cohort_m FROM o GROUP BY 1),
         a AS (SELECT DISTINCT f.cohort_m, o.m - f.cohort_m AS offset_m, o.cust
           FROM o JOIN f USING (cust)),
         c AS (SELECT cohort_m, offset_m, CAST(count(*) AS BIGINT) AS n_active
           FROM a GROUP BY 1, 2),
         sz AS (SELECT cohort_m, n_active AS cohort_size FROM c
           WHERE offset_m = 0)
         SELECT c.cohort_m, c.offset_m, c.n_active, sz.cohort_size,
           round(CAST(c.n_active AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE), 4)
             AS retention
         FROM c JOIN sz USING (cohort_m)""",
    "q219_association_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         t AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
         c1 AS (SELECT brand, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
         pairs AS (SELECT x.brand AS pa, y.brand AS pb,
             CAST(count(*) AS BIGINT) AS pc, any_value(t.n_baskets) AS n_baskets
           FROM items x JOIN items y ON x.ok = y.ok AND x.brand < y.brand
           CROSS JOIN t GROUP BY 1, 2
           HAVING CAST(count(*) AS BIGINT) * 200 >= any_value(t.n_baskets)),
         rules AS (SELECT pa AS ante, pb AS cons, pc, n_baskets FROM pairs
           UNION ALL SELECT pb, pa, pc, n_baskets FROM pairs)
         SELECT ante, cons, pc AS pair_n,
           round(CAST(pc AS DOUBLE) / CAST(ca.c AS DOUBLE), 4) AS confidence,
           round(CAST(pc * n_baskets AS DOUBLE)
             / CAST(ca.c * cb.c AS DOUBLE), 4) AS lift
         FROM rules JOIN c1 ca ON ca.brand = rules.ante
           JOIN c1 cb ON cb.brand = rules.cons""",
    "q220_streak_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
           epoch_us(ts) // 86400000000 AS day FROM events),
         g AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
           FROM d),
         st AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
           FROM g GROUP BY 1, 2),
         lg AS (SELECT user_id, max(len) AS streak_days FROM st GROUP BY 1)
         SELECT streak_days, CAST(count(*) AS BIGINT) AS n_users
         FROM lg GROUP BY 1""",
    "q221_ols_price_qty" ->
      """WITH base AS (SELECT n_name,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100
             AS y
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey),
         m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sx2,
             CAST(sum(y*y) AS BIGINT) AS sy2
           FROM base GROUP BY 1),
         f AS (SELECT n_name, n_lines,
             CAST(n_lines AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
             CAST(sy AS DOUBLE) AS dsy, CAST(sxy AS DOUBLE) AS dsxy,
             CAST(sx2 AS DOUBLE) AS dsx2, CAST(sy2 AS DOUBLE) AS dsy2
           FROM m)
         SELECT n_name, n_lines,
           round((dn*dsxy - dsx*dsy) / (dn*dsx2 - dsx*dsx), 6) AS slope,
           round((dsy - ((dn*dsxy - dsx*dsy) / (dn*dsx2 - dsx*dsx)) * dsx) / dn,
             4) AS intercept,
           round((dn*dsxy - dsx*dsy) * (dn*dsxy - dsx*dsy)
             / ((dn*dsx2 - dsx*dsx) * (dn*dsy2 - dsy*dsy)), 6) AS r2
         FROM f""",
    "q222_ab_value_ztest" ->
      """WITH spend AS (SELECT user_id % 2 AS variant, user_id,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS cu
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         per AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cu) AS BIGINT) AS s1, CAST(sum(cu*cu) AS BIGINT) AS s2
           FROM spend GROUP BY 1),
         one AS (SELECT
             max(CASE WHEN variant = 0 THEN n END) AS n0,
             max(CASE WHEN variant = 0 THEN s1 END) AS a1,
             max(CASE WHEN variant = 0 THEN s2 END) AS a2,
             max(CASE WHEN variant = 1 THEN n END) AS n1,
             max(CASE WHEN variant = 1 THEN s1 END) AS b1,
             max(CASE WHEN variant = 1 THEN s2 END) AS b2
           FROM per),
         f AS (SELECT n0, n1,
             CAST(a1 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
             CAST(b1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
             (CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)
               / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0) AS v0,
             (CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE)
               / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1
           FROM one)
         SELECT n0, n1, round(m0 / 100.0, 4) AS mean0,
           round(m1 / 100.0, 4) AS mean1,
           round((m1 - m0) / sqrt(v0 / CAST(n0 AS DOUBLE)
             + v1 / CAST(n1 AS DOUBLE)), 4) AS z_stat,
           abs(round((m1 - m0) / sqrt(v0 / CAST(n0 AS DOUBLE)
             + v1 / CAST(n1 AS DOUBLE)), 4)) > 1.96 AS significant
         FROM f""",
    "q223_benford_digits" ->
      """WITH obs AS (SELECT
           substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS VARCHAR), 1, 1) AS digit,
           CAST(count(*) AS BIGINT) AS n_obs
           FROM orders GROUP BY 1),
         t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
         f AS (SELECT digit, n_obs,
             log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS exp_p_raw,
             CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))
               AS exp_n
           FROM obs CROSS JOIN t)
         SELECT digit, n_obs, round(exp_p_raw, 6) AS exp_p,
           round((CAST(n_obs AS DOUBLE) - exp_n) * (CAST(n_obs AS DOUBLE) - exp_n)
             / exp_n, 4) AS chi2_part
         FROM f""",
    "q226_holt_forecast" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
           SELECT day, CAST(x AS DOUBLE) AS x,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
           FROM (SELECT epoch_us(ts) // 86400000000 AS day,
             count(*) AS x FROM events GROUP BY 1)),
         rec AS (
           SELECT t, round(x, 6) AS l, CAST(0.0 AS DOUBLE) AS b
           FROM daily WHERE t = 1
           UNION ALL
           SELECT d.t,
             round(0.3 * d.x + 0.7 * (r.l + r.b), 6) AS l,
             round(0.2 * (round(0.3 * d.x + 0.7 * (r.l + r.b), 6) - r.l)
               + 0.8 * r.b, 6) AS b
           FROM rec r JOIN daily d ON d.t = r.t + 1)
         SELECT t AS n_days, l AS level, b AS trend,
           round(l + 7.0 * b, 4) AS forecast_7
         FROM rec WHERE t = (SELECT max(t) FROM daily)""",
    "q228_chi2_independence" ->
      """WITH cells AS (SELECT o_orderpriority AS prio, o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_obs FROM orders GROUP BY 1, 2),
         rm AS (SELECT prio, CAST(sum(n_obs) AS BIGINT) AS rt
           FROM cells GROUP BY 1),
         cm AS (SELECT status, CAST(sum(n_obs) AS BIGINT) AS ct
           FROM cells GROUP BY 1),
         t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM cells)
         SELECT prio, status, n_obs,
           round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE), 4)
             AS exp_n,
           round((CAST(n_obs AS DOUBLE)
               - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n_obs AS DOUBLE)
               - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)), 4)
             AS chi2_part
         FROM cells JOIN rm USING (prio) JOIN cm USING (status) CROSS JOIN t""",
    "q229_hill_tail_index" ->
      """WITH deg AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS d
           FROM orders GROUP BY 1),
         grid AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt
           FROM deg WHERE d >= 10 GROUP BY 1),
         s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tail,
             list_sum(list(round(CAST(cnt AS DOUBLE)
               * ln(CAST(d AS DOUBLE) / 10.0), 6) ORDER BY d)) AS s
           FROM grid)
         SELECT n_tail, CAST(10 AS BIGINT) AS d_min,
           round(1.0 + CAST(n_tail AS DOUBLE) / s, 4) AS alpha
         FROM s""",
    "q230_bootstrap_ci" ->
      """WITH o AS (SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM orders),
         rep AS (SELECT o_orderkey, cents, b,
             CAST(CAST(concat('0x', substr(md5(concat(
               CAST(o_orderkey AS VARCHAR), '_', CAST(b AS VARCHAR))), 1, 8))
               AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
           FROM o CROSS JOIN (SELECT unnest(range(0, 32)) AS b)),
         rep2 AS (SELECT b, cents,
             CAST(CASE WHEN u < 0.36787944117144233 THEN 0
               WHEN u < 0.7357588823428847 THEN 1
               WHEN u < 0.9196986029286058 THEN 2 ELSE 3 END AS BIGINT) AS m
           FROM rep),
         means AS (SELECT b,
             CAST(CAST(sum(m * cents) AS BIGINT) AS DOUBLE)
               / CAST(CAST(sum(m) AS BIGINT) AS DOUBLE) / 100.0 AS mean_b
           FROM rep2 GROUP BY 1),
         e AS (SELECT CAST(count(*) AS BIGINT) AS n_boot,
             round(quantile_cont(mean_b, 0.025), 4) AS ci_lo,
             round(quantile_cont(mean_b, 0.975), 4) AS ci_hi FROM means),
         f AS (SELECT CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0 AS mean_full FROM o)
         SELECT n_boot, ci_lo, ci_hi, round(mean_full, 4) AS mean_full
         FROM e CROSS JOIN f""",
    "q231_ordered_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         t1 AS (SELECT user_id, min(us) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(e.us) AS t2 FROM ev e JOIN t1 USING (user_id)
           WHERE e.event_type = 'click' AND e.us > t1.t1 GROUP BY 1),
         t3 AS (SELECT e.user_id, min(e.us) AS t3 FROM ev e JOIN t2 USING (user_id)
           WHERE e.event_type = 'signup' AND e.us > t2.t2 GROUP BY 1),
         t4 AS (SELECT e.user_id, min(e.us) AS t4 FROM ev e JOIN t3 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > t3.t3 GROUP BY 1),
         c AS (SELECT
             (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_view,
             (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_click,
             (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_signup,
             (SELECT CAST(count(*) AS BIGINT) FROM t4) AS n_purchase)
         SELECT n_view, n_click, n_signup, n_purchase,
           round(CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE), 4) AS r_click,
           round(CAST(n_signup AS DOUBLE) / CAST(n_click AS DOUBLE), 4)
             AS r_signup,
           round(CAST(n_purchase AS DOUBLE) / CAST(n_signup AS DOUBLE), 4)
             AS r_purchase,
           round(CAST(n_purchase AS DOUBLE) / CAST(n_view AS DOUBLE), 4)
             AS r_overall
         FROM c""",
    "q232_wallet_balance" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) AS us, event_id,
           CASE WHEN event_type = 'signup' THEN CAST(10000 AS BIGINT)
                ELSE -CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
           END AS delta
           FROM events WHERE event_type IN ('signup', 'purchase')),
         c AS (SELECT user_id, us, event_id,
             CAST(sum(delta) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
           FROM d),
         b AS (SELECT user_id, us, event_id,
             cum - least(CAST(0 AS BIGINT),
               CAST(min(cum) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
               AS bal
           FROM c)
         SELECT user_id,
           CAST((max(struct_pack(us := us, event_id := event_id,
             bal := bal))).bal AS DOUBLE) / 100.0 AS final_balance
         FROM b GROUP BY user_id""",
    "q233_truncated_mean" ->
      """WITH li AS (SELECT l_returnflag,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS cents
           FROM lineitem),
         b AS (SELECT l_returnflag,
             quantile_cont(cents, 0.1) AS lo, quantile_cont(cents, 0.9) AS hi
           FROM li GROUP BY 1),
         k AS (SELECT li.l_returnflag, cents, lo, hi
           FROM li JOIN b USING (l_returnflag)
           WHERE CAST(cents AS DOUBLE) > lo AND CAST(cents AS DOUBLE) < hi)
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
           round(max(lo) / 100.0, 4) AS p10,
           round(max(hi) / 100.0, 4) AS p90,
           round(CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0, 4) AS truncated_mean
         FROM k GROUP BY 1""",
    "q235_spearman_rho" ->
      """WITH base AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS x,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS y
           FROM orders GROUP BY 1),
         gx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1),
         cx AS (SELECT x, 2 * (CAST(sum(cnt) OVER (ORDER BY x ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - cnt) + cnt + 1
             AS r2x FROM gx),
         gy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1),
         cy AS (SELECT y, 2 * (CAST(sum(cnt) OVER (ORDER BY y ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - cnt) + cnt + 1
             AS r2y FROM gy),
         r AS (SELECT r2x, r2y FROM base JOIN cx USING (x) JOIN cy USING (y)),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r2x) AS BIGINT) AS sx, CAST(sum(r2y) AS BIGINT) AS sy,
             CAST(sum(r2x * r2y) AS BIGINT) AS sxy,
             CAST(sum(r2x * r2x) AS BIGINT) AS sx2,
             CAST(sum(r2y * r2y) AS BIGINT) AS sy2
           FROM r)
         SELECT n AS n_cust,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
         FROM m""",
    "q236_kaplan_meier" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         t0 AS (SELECT user_id, min(us) AS t0 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         fp AS (SELECT e.user_id, min(e.us) AS tp FROM ev e JOIN t0 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > t0.t0 GROUP BY 1),
         la AS (SELECT e.user_id, max(e.us) AS tl FROM ev e JOIN t0 USING (user_id)
           GROUP BY 1),
         times AS (SELECT t0.user_id,
             CASE WHEN tp IS NOT NULL THEN (tp - t0.t0) // 86400000000
                  ELSE (tl - t0.t0) // 86400000000 END AS day,
             tp IS NOT NULL AS is_event
           FROM t0 LEFT JOIN fp USING (user_id) JOIN la USING (user_id)),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM times),
         grid AS (SELECT day,
             CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT) AS c
           FROM times GROUP BY 1),
         cumt AS (SELECT day, d, c,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(sum(d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cumd,
             CAST(sum(c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cumc
           FROM grid),
         risk AS (SELECT day, t, d,
             nt.ntot - (cumd - d) - (cumc - c) AS n_risk
           FROM cumt CROSS JOIN nt),
         eventd AS (SELECT t, day, n_risk, d,
             1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
           FROM risk WHERE d > 0)
         SELECT b.day, b.n_risk, b.d AS d_events,
           list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
             list(a.f ORDER BY a.t)), (acc, x) -> round(acc * x, 8)) AS surv
         FROM eventd b JOIN eventd a ON a.t <= b.t
         GROUP BY b.day, b.n_risk, b.d""",
    "q237_logrank_test" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         t0 AS (SELECT user_id, min(us) AS t0 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         fp AS (SELECT e.user_id, min(e.us) AS tp FROM ev e JOIN t0 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > t0.t0 GROUP BY 1),
         la AS (SELECT e.user_id, max(e.us) AS tl FROM ev e JOIN t0 USING (user_id)
           GROUP BY 1),
         times AS (SELECT t0.user_id % 2 AS g,
             CASE WHEN tp IS NOT NULL THEN (tp - t0.t0) // 86400000000
                  ELSE (tl - t0.t0) // 86400000000 END AS day,
             tp IS NOT NULL AS is_event
           FROM t0 LEFT JOIN fp USING (user_id) JOIN la USING (user_id)),
         grid AS (SELECT day,
             CAST(sum(CASE WHEN is_event AND g = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d0,
             CAST(sum(CASE WHEN is_event AND g = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(sum(CASE WHEN NOT is_event AND g = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS c0,
             CAST(sum(CASE WHEN NOT is_event AND g = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS c1
           FROM times GROUP BY 1),
         tt AS (SELECT CAST(sum(d0 + c0) AS BIGINT) AS m0,
             CAST(sum(d1 + c1) AS BIGINT) AS m1 FROM grid),
         cumt AS (SELECT day, d0, d1, c0, c1,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(sum(d0) OVER w AS BIGINT) AS cd0,
             CAST(sum(d1) OVER w AS BIGINT) AS cd1,
             CAST(sum(c0) OVER w AS BIGINT) AS cc0,
             CAST(sum(c1) OVER w AS BIGINT) AS cc1
           FROM grid
           WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)),
         risk AS (SELECT t, d0, d1,
             tt.m0 - (cd0 - d0) - (cc0 - c0) AS n0,
             tt.m1 - (cd1 - d1) - (cc1 - c1) AS n1,
             d0 + d1 AS d,
             (tt.m0 - (cd0 - d0) - (cc0 - c0))
               + (tt.m1 - (cd1 - d1) - (cc1 - c1)) AS n
           FROM cumt CROSS JOIN tt),
         terms AS (SELECT t,
             round(CAST(d0 AS DOUBLE)
               - CAST(d AS DOUBLE) * CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE), 8)
               AS oe,
             round(CAST(d AS DOUBLE) * (CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0), 8) AS v
           FROM risk WHERE d > 0 AND n > 1)
         SELECT CAST(count(*) AS BIGINT) AS n_event_days,
           round(list_sum(list(oe ORDER BY t)), 4) AS observed_minus_expected,
           round(list_sum(list(oe ORDER BY t)) * list_sum(list(oe ORDER BY t))
             / list_sum(list(v ORDER BY t)), 4) AS chi2
         FROM terms""",
    "q238_time_decay_attribution" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
           FROM events),
         conv AS (SELECT user_id, min(us) AS tc FROM ev
           WHERE event_type = 'purchase' GROUP BY 1),
         touches AS (SELECT e.user_id, e.event_type, e.us, e.event_id,
             round(pow(0.5, CAST(tc - e.us AS DOUBLE) / 86400000000.0), 8)
               AS w
           FROM ev e JOIN conv USING (user_id)
           WHERE e.us < conv.tc AND e.event_type <> 'purchase'),
         norms AS (SELECT user_id,
             list_sum(list(w ORDER BY us, event_id)) AS norm
           FROM touches GROUP BY 1),
         shares AS (SELECT t.user_id, t.event_type, t.us, t.event_id,
             round(t.w / n.norm, 8) AS share
           FROM touches t JOIN norms n USING (user_id))
         SELECT event_type AS channel, CAST(count(*) AS BIGINT) AS n_touches,
           round(list_sum(list(share ORDER BY user_id, us, event_id)), 4)
             AS credit
         FROM shares GROUP BY 1""",
    "q239_conversion_paths" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
           FROM events),
         conv AS (SELECT user_id, min(us) AS tc FROM ev
           WHERE event_type = 'purchase' GROUP BY 1),
         seqs AS (SELECT e.user_id,
             list(e.event_type ORDER BY e.us, e.event_id) AS sq
           FROM ev e JOIN conv USING (user_id)
           WHERE e.us < conv.tc AND e.event_type <> 'purchase'
           GROUP BY 1),
         paths AS (SELECT array_to_string(
             sq[greatest(len(sq) - 3, 1):len(sq)], '->') AS path
           FROM seqs)
         SELECT path, CAST(count(*) AS BIGINT) AS n_users
         FROM paths GROUP BY 1
         ORDER BY n_users DESC, path LIMIT 10""",
    "q240_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey AS cust,
           CAST(year(o_orderdate)*12 + month(o_orderdate) - 1 AS BIGINT) AS m,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT cust, min(m) AS cohort_m FROM o GROUP BY 1),
         base AS (SELECT f.cohort_m, o.m - f.cohort_m AS offset_m, o.cust,
             o.cents
           FROM o JOIN f USING (cust)),
         sz AS (SELECT cohort_m, CAST(count(DISTINCT cust) AS BIGINT) AS sz
           FROM base WHERE offset_m = 0 GROUP BY 1),
         grid AS (SELECT cohort_m, offset_m, CAST(sum(cents) AS BIGINT) AS sp
           FROM base GROUP BY 1, 2),
         c AS (SELECT cohort_m, offset_m,
             CAST(sum(sp) OVER (PARTITION BY cohort_m ORDER BY offset_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
           FROM grid)
         SELECT c.cohort_m, c.offset_m,
           CAST(cum // sz.sz AS DOUBLE) / 100.0 AS ltv_per_user
         FROM c JOIN sz USING (cohort_m)""",
    "q241_recursive_closure" -> QueryDsl.recursiveClosureSql("part", "//"),
    "q242_fifo_allocation" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events),
         lots AS (SELECT user_id,
             CAST(sum(10000) OVER w AS BIGINT) - 10000 AS in_lo,
             CAST(sum(10000) OVER w AS BIGINT) AS in_hi
           FROM ev WHERE event_type = 'signup'
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         outs AS (SELECT user_id, cents,
             CAST(sum(cents) OVER w AS BIGINT) - cents AS out_lo,
             CAST(sum(cents) OVER w AS BIGINT) AS out_hi
           FROM ev WHERE event_type = 'purchase'
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         m AS (SELECT l.user_id, CAST(count(*) AS BIGINT) AS nm,
             CAST(sum(least(in_hi, out_hi) - greatest(in_lo, out_lo))
               AS BIGINT) AS mc
           FROM lots l JOIN outs o ON l.user_id = o.user_id
             AND in_lo < out_hi AND out_lo < in_hi
           GROUP BY 1),
         t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(cents) AS BIGINT) AS pc FROM outs GROUP BY 1),
         nl AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_lots
           FROM lots GROUP BY 1)
         SELECT t.user_id, CAST(coalesce(nl.n_lots, 0) AS BIGINT) AS n_lots,
           t.n_purchases, CAST(coalesce(m.nm, 0) AS BIGINT) AS n_matches,
           CAST(coalesce(m.mc, 0) AS DOUBLE) / 100.0 AS funded,
           CAST(t.pc - coalesce(m.mc, 0) AS DOUBLE) / 100.0 AS unfunded
         FROM t LEFT JOIN nl USING (user_id) LEFT JOIN m USING (user_id)""",
    "q244_diff_in_diff" ->
      """WITH ev AS (SELECT user_id, event_type,
           epoch_us(ts) // 86400000000 AS day,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events),
         b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
         cells AS (SELECT user_id % 2 AS g,
             day > b.mn + (b.mx - b.mn) // 2 AS post,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sc
           FROM ev CROSS JOIN b WHERE event_type = 'purchase'
           GROUP BY 1, 2),
         one AS (SELECT
             max(CASE WHEN g = 0 AND NOT post THEN sc END) AS s00,
             max(CASE WHEN g = 0 AND NOT post THEN n END) AS n00,
             max(CASE WHEN g = 0 AND post THEN sc END) AS s01,
             max(CASE WHEN g = 0 AND post THEN n END) AS n01,
             max(CASE WHEN g = 1 AND NOT post THEN sc END) AS s10,
             max(CASE WHEN g = 1 AND NOT post THEN n END) AS n10,
             max(CASE WHEN g = 1 AND post THEN sc END) AS s11,
             max(CASE WHEN g = 1 AND post THEN n END) AS n11
           FROM cells)
         SELECT
           round(CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / 100.0, 4)
             AS ctrl_pre,
           round(CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / 100.0, 4)
             AS ctrl_post,
           round(CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / 100.0, 4)
             AS treat_pre,
           round(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / 100.0, 4)
             AS treat_post,
           round((CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / 100.0
               - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / 100.0)
             - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / 100.0
               - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / 100.0), 4)
             AS did_estimate
         FROM one""",
    "q246_l_diversity" ->
      """WITH c AS (SELECT c_mktsegment, c_nationkey,
           CAST(CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0 THEN 0
             WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 3000 THEN 1
             WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 7000 THEN 2
             ELSE 3 END AS BIGINT) AS band
           FROM customer),
         gb AS (SELECT c_mktsegment AS segment, n_name AS nation, band,
             CAST(count(*) AS BIGINT) AS bn
           FROM c JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2, 3)
         SELECT segment, nation, CAST(sum(bn) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_sensitive,
           count(*) >= 3 AS l3_ok
         FROM gb GROUP BY 1, 2""",
    "q247_t_closeness" ->
      """WITH c AS (SELECT c_mktsegment, c_nationkey,
           CAST(CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0 THEN 0
             WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 3000 THEN 1
             WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 7000 THEN 2
             ELSE 3 END AS BIGINT) AS band
           FROM customer),
         g AS (SELECT c_mktsegment AS segment, n_name AS nation,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN band = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
           FROM c JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
             CAST(sum(c0) AS BIGINT) AS t0, CAST(sum(c1) AS BIGINT) AS t1,
             CAST(sum(c2) AS BIGINT) AS t2 FROM g),
         f AS (SELECT segment, nation, n,
             CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(t0 AS DOUBLE) / CAST(tn AS DOUBLE) AS d0,
             CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(t1 AS DOUBLE) / CAST(tn AS DOUBLE) AS d1,
             CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(t2 AS DOUBLE) / CAST(tn AS DOUBLE) AS d2
           FROM g CROSS JOIN t)
         SELECT segment, nation, n,
           round((abs(d0) + abs(d0 + d1) + abs(d0 + d1 + d2)) / 3.0, 6)
             AS t_dist,
           round((abs(d0) + abs(d0 + d1) + abs(d0 + d1 + d2)) / 3.0, 6) <= 0.2
             AS t_ok
         FROM f""",

    "q257_acf" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS HUGEINT) AS x
         FROM orders GROUP BY 1),
         idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, x
           FROM daily),
         g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
             sum(x * x) AS sxx FROM idx),
         p AS (SELECT l.lag, sum(a.x) AS s1, sum(b.x) AS s2,
             sum(a.x * b.x) AS s12, CAST(count(*) AS BIGINT) AS nl
           FROM range(1, 8) l(lag)
           CROSS JOIN idx a JOIN idx b ON a.t + l.lag = b.t
           GROUP BY 1),
         f AS (SELECT p.*, g.n, g.sxx,
             CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE) AS xb
           FROM p CROSS JOIN g)
         SELECT CAST(lag AS BIGINT) AS lag,
           round((CAST(s12 AS DOUBLE) - xb * (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE))
               + CAST(nl AS DOUBLE) * (xb * xb))
             / (CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) * (xb * xb)), 6) AS acf
         FROM f""",

    "q258_wilson_lcb" ->
      """WITH b AS (SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS pos
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
         f AS (SELECT brand, n, pos, CAST(n AS DOUBLE) AS nd,
             CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM b)
         SELECT brand, n, pos,
           round((p + 1.96 * 1.96 / (2.0 * nd)
               - 1.96 * sqrt((p * (1.0 - p) + 1.96 * 1.96 / (4.0 * nd)) / nd))
             / (1.0 + 1.96 * 1.96 / nd), 6) AS wilson_lcb
         FROM f""",

    "q259_auc_brier" ->
      """WITH li AS (SELECT l_orderkey * 10 + l_linenumber AS pk,
           l_returnflag = 'R' AS y,
           CAST(CAST(concat('0x', substr(md5('auc_' || CAST(l_orderkey AS VARCHAR)
             || '_' || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS score
         FROM lineitem),
         r AS (SELECT y, CAST(row_number() OVER (ORDER BY score, pk) AS BIGINT)
             AS rank,
           CAST(score * 4294967296.0 AS BIGINT)
             - (CASE WHEN y THEN 4294967296 ELSE 0 END) AS dev
           FROM li),
         a AS (SELECT sum(CAST(CASE WHEN y THEN rank ELSE 0 END AS HUGEINT))
             AS rpos,
           CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS npos,
           CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nneg,
           sum(CAST(dev AS HUGEINT) * CAST(dev AS HUGEINT)) AS ss,
           CAST(count(*) AS BIGINT) AS n FROM r)
         SELECT npos, nneg,
           round((CAST(rpos AS DOUBLE)
               - CAST(npos AS DOUBLE) * (CAST(npos AS DOUBLE) + 1.0) / 2.0)
             / (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)), 6) AS auc,
           round(CAST(ss AS DOUBLE)
             / (CAST(4294967296.0 AS DOUBLE) * CAST(4294967296.0 AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS brier
         FROM a""",

    "q260_nelson_aalen" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         t0 AS (SELECT user_id, min(us) AS t0 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         fp AS (SELECT e.user_id, min(e.us) AS tp FROM ev e JOIN t0 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > t0.t0 GROUP BY 1),
         la AS (SELECT e.user_id, max(e.us) AS tl FROM ev e JOIN t0 USING (user_id)
           GROUP BY 1),
         times AS (SELECT t0.user_id,
             CASE WHEN tp IS NOT NULL THEN (tp - t0.t0) // 86400000000
                  ELSE (tl - t0.t0) // 86400000000 END AS day,
             tp IS NOT NULL AS is_event
           FROM t0 LEFT JOIN fp USING (user_id) JOIN la USING (user_id)),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM times),
         grid AS (SELECT day,
             CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT) AS c
           FROM times GROUP BY 1),
         cumt AS (SELECT day, d, c,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(sum(d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cumd,
             CAST(sum(c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cumc
           FROM grid),
         risk AS (SELECT day, t, d,
             nt.ntot - (cumd - d) - (cumc - c) AS n_risk
           FROM cumt CROSS JOIN nt),
         eventd AS (SELECT t, day, n_risk, d,
             CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h
           FROM risk WHERE d > 0)
         SELECT b.day, b.n_risk, b.d AS d_events,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(a.h ORDER BY a.t)), (acc, x) -> round(acc + x, 8)) AS cumhaz
         FROM eventd b JOIN eventd a ON a.t <= b.t
         GROUP BY b.day, b.n_risk, b.d""",

    "q261_market_concentration" ->
      """WITH rev AS (SELECT l_suppkey,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS cents
         FROM lineitem GROUP BY 1),
         g AS (SELECT n_name AS nation, s_suppkey, cents
           FROM rev JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey),
         tot AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(cents) AS BIGINT) AS tc,
             sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sq
           FROM g GROUP BY 1),
         rk AS (SELECT nation, cents,
             row_number() OVER (PARTITION BY nation
               ORDER BY cents DESC, s_suppkey) AS rn
           FROM g),
         t4 AS (SELECT nation, CAST(sum(cents) AS BIGINT) AS c4
           FROM rk WHERE rn <= 4 GROUP BY 1)
         SELECT tot.nation, n_suppliers,
           round(CAST(sq AS DOUBLE) / (CAST(tc AS DOUBLE) * CAST(tc AS DOUBLE)), 6)
             AS hhi,
           round(CAST(c4 AS DOUBLE) / CAST(tc AS DOUBLE), 6) AS cr4
         FROM tot JOIN t4 ON tot.nation = t4.nation""",

    "q262_info_gain" -> OracleHelpers.infoGainSql,

    "q264_seq_brand_pairs" ->
      """WITH seqo AS (SELECT o_custkey, o_orderkey,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS next_ok
         FROM orders),
         ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
           FROM lineitem JOIN part ON l_partkey = p_partkey)
         SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(count(DISTINCT s.o_custkey) AS BIGINT) AS support
         FROM seqo s JOIN ob a ON s.o_orderkey = a.ok
         JOIN ob b ON s.next_ok = b.ok
         GROUP BY 1, 2 HAVING count(DISTINCT s.o_custkey) >= 3""",

    "q267_order_backlog" ->
      """WITH arr AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS arrivals
         FROM orders GROUP BY 1),
         done AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS day
           FROM lineitem GROUP BY 1),
         dep AS (SELECT day, CAST(count(*) AS BIGINT) AS completions
           FROM done GROUP BY 1),
         grid AS (SELECT coalesce(arr.day, dep.day) AS day,
             coalesce(arrivals, 0) AS arrivals,
             coalesce(completions, 0) AS completions
           FROM arr FULL OUTER JOIN dep ON arr.day = dep.day)
         SELECT strftime(day, '%Y-%m-%d') AS day, arrivals, completions,
           CAST(sum(arrivals) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW)
             - sum(completions) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders
         FROM grid""",

    "q268_empirical_bayes" ->
      """WITH b AS (SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS pos
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
         g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
             CAST(sum(pos) AS BIGINT) AS gp FROM b),
         f AS (SELECT brand, n, pos,
             CAST(gp AS DOUBLE) / CAST(gn AS DOUBLE) AS p0
           FROM b CROSS JOIN g)
         SELECT brand, n,
           round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
           round((CAST(pos AS DOUBLE) + 50.0 * p0)
             / (CAST(n AS DOUBLE) + 50.0), 6) AS shrunk_rate
         FROM f""",

    "q272_bh_fdr" ->
      """WITH b AS (SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS pos
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
         g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
             CAST(sum(pos) AS BIGINT) AS gp FROM b),
         z AS (SELECT brand, n,
             (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(gp AS DOUBLE) / CAST(gn AS DOUBLE))
             / sqrt((CAST(gp AS DOUBLE) / CAST(gn AS DOUBLE))
                 * (1.0 - CAST(gp AS DOUBLE) / CAST(gn AS DOUBLE))
                 / CAST(n AS DOUBLE)) AS z
           FROM b CROSS JOIN g),
         e AS (SELECT brand, n, z,
             1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t,
             abs(z) / sqrt(2.0) AS x
           FROM z),
         p AS (SELECT brand, n, z,
             round(2.0 * (1.0 - 0.5 * (1.0 + (1.0
               - ((((1.061405429 * t - 1.453152027) * t
                   + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t
                 * exp(-(x * x))))), 10) AS p
           FROM e),
         r AS (SELECT brand, n, z, p,
             CAST(row_number() OVER (ORDER BY p, brand) AS BIGINT) AS bh_rank
           FROM p),
         k AS (SELECT coalesce(max(CASE WHEN p <= 0.10
               * CAST(bh_rank AS DOUBLE) / CAST(m AS DOUBLE)
               THEN bh_rank END), 0) AS kmax
           FROM r CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS m FROM r) mm)
         SELECT brand, n, round(z, 4) AS z, round(p, 6) AS p_value, bh_rank,
           bh_rank <= kmax AS rejected
         FROM r CROSS JOIN k""",

    "q273_markov_absorption" -> OracleHelpers.markovAbsorptionSql(steps = 5),

    "q274_removal_attribution" ->
      OracleHelpers.removalAttributionSql(steps = 6),

    "q328_abc_xyz" ->
      """WITH li AS (SELECT p_brand AS brand, month(l_shipdate) AS m,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS rev,
           CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE year(l_shipdate) = 1995 GROUP BY 1, 2),
         grid AS (SELECT b.brand, m.m, coalesce(li.rev, 0) AS rev,
             coalesce(li.qty, 0) AS qty
           FROM (SELECT DISTINCT p_brand AS brand FROM part) b
           CROSS JOIN (SELECT CAST(unnest(range(1, 13)) AS INT) AS m) m
           LEFT JOIN li ON li.brand = b.brand AND li.m = m.m),
         byb AS (SELECT brand, CAST(sum(rev) AS BIGINT) AS trev,
             CAST(sum(qty) AS BIGINT) AS sq,
             sum(CAST(qty AS DECIMAL(19,0)) * CAST(qty AS DECIMAL(19,0)))
               AS sqq
           FROM grid GROUP BY 1),
         rk AS (SELECT brand, trev, sq, sqq,
             CAST(sum(trev) OVER (ORDER BY trev DESC, brand ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumrev
           FROM byb),
         tot AS (SELECT CAST(sum(trev) AS BIGINT) AS gt FROM byb),
         cl AS (SELECT brand, trev,
             CASE WHEN CAST(cumrev AS DOUBLE) / CAST(gt AS DOUBLE) <= 0.7
                 THEN 'A'
               WHEN CAST(cumrev AS DOUBLE) / CAST(gt AS DOUBLE) <= 0.9
                 THEN 'B' ELSE 'C' END AS abc,
             CASE WHEN sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)
                   * CAST(sq AS DOUBLE) / 12.0) / 12.0)
                   / (CAST(sq AS DOUBLE) / 12.0) <= 0.5 THEN 'X'
               WHEN sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)
                   * CAST(sq AS DOUBLE) / 12.0) / 12.0)
                   / (CAST(sq AS DOUBLE) / 12.0) <= 1.0 THEN 'Y'
               ELSE 'Z' END AS xyz
           FROM rk CROSS JOIN tot),
         agg AS (SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_brands,
             CAST(sum(trev) AS BIGINT) AS crev
           FROM cl GROUP BY 1, 2)
         SELECT abc, xyz, n_brands,
           round(CAST(crev AS DOUBLE) / CAST(gt AS DOUBLE), 6) AS rev_share
         FROM agg CROSS JOIN tot""",

    // ── Finance-series tier (q365–q367, round 9): shared daily grid ────

    "q365_max_drawdown" ->
      s"""WITH daily AS ($dailyRevenueSql)
         , w AS (SELECT nation, d,
             sum(c) OVER (PARTITION BY nation ORDER BY d) AS cum
           FROM daily),
         p AS (SELECT nation,
             cum - max(cum) OVER (PARTITION BY nation ORDER BY d) AS dd
           FROM w)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
           CAST(min(dd) AS BIGINT) AS max_drawdown_cents
         FROM p GROUP BY 1""",

    "q465_newsvendor" ->
      s"""WITH daily AS ($dailyRevenueSql),
         st AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
             quantile_cont(CAST(c AS DOUBLE), 0.75) AS sstar
           FROM daily GROUP BY 1),
         t AS (SELECT daily.nation, n_days, sstar,
             CAST(sum(CASE WHEN CAST(c AS DOUBLE) > sstar THEN c ELSE 0 END)
               AS BIGINT) AS ss,
             CAST(sum(CASE WHEN CAST(c AS DOUBLE) > sstar THEN 1 ELSE 0 END)
               AS BIGINT) AS ns,
             CAST(sum(CASE WHEN CAST(c AS DOUBLE) < sstar THEN c ELSE 0 END)
               AS BIGINT) AS so,
             CAST(sum(CASE WHEN CAST(c AS DOUBLE) < sstar THEN 1 ELSE 0 END)
               AS BIGINT) AS no
           FROM daily JOIN st ON daily.nation = st.nation
           GROUP BY 1, 2, 3)
         SELECT nation, n_days, round(sstar, 4) AS s_star_cents,
           round((CAST(ss AS DOUBLE) - CAST(ns AS DOUBLE) * sstar)
             / CAST(n_days AS DOUBLE), 4) AS exp_shortage,
           round((CAST(no AS DOUBLE) * sstar - CAST(so AS DOUBLE))
             / CAST(n_days AS DOUBLE), 4) AS exp_overage
         FROM t""",

    "q457_stl_strength" ->
      s"""WITH daily AS ($dailyRevenueSql),
         base AS (SELECT nation, d, c, CAST(c AS DOUBLE) AS x,
             (CAST(d AS DATE) - DATE '1970-01-01') % 7 AS wd
           FROM daily),
         mu AS (SELECT nation,
             CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu
           FROM base GROUP BY 1),
         sw AS (SELECT nation, wd,
             CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS wmu
           FROM base GROUP BY 1, 2),
         comp AS (SELECT base.nation, d, x,
             CAST(count(*) OVER fr AS BIGINT) AS nw,
             CAST(sum(c) OVER fr AS DOUBLE) / CAST(7.0 AS DOUBLE) AS tr,
             wmu - mu AS sc
           FROM base JOIN mu USING (nation) JOIN sw USING (nation, wd)
           WINDOW fr AS (PARTITION BY base.nation ORDER BY d
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         ev AS (SELECT nation, x, tr, sc, x - tr - sc AS r,
             CAST(row_number() OVER (PARTITION BY nation ORDER BY d)
               AS BIGINT) AS t2
           FROM comp WHERE nw = 7),
         sums AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(r * r ORDER BY t2)), (p, q) -> p + q) AS rr,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(r ORDER BY t2)), (p, q) -> p + q) AS rs,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((sc + r) * (sc + r) ORDER BY t2)), (p, q) -> p + q)
               AS srr,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(sc + r ORDER BY t2)), (p, q) -> p + q) AS srs,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((tr + r) * (tr + r) ORDER BY t2)), (p, q) -> p + q)
               AS trr,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(tr + r ORDER BY t2)), (p, q) -> p + q) AS trs
           FROM ev GROUP BY 1)
         SELECT nation, n AS n_days,
           round(CASE WHEN (srr - srs * srs / CAST(n AS DOUBLE))
               / CAST(n AS DOUBLE) > 0
             THEN greatest(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)
               - ((rr - rs * rs / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
               / ((srr - srs * srs / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE))) END, 6) AS f_seasonal,
           round(CASE WHEN (trr - trs * trs / CAST(n AS DOUBLE))
               / CAST(n AS DOUBLE) > 0
             THEN greatest(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)
               - ((rr - rs * rs / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
               / ((trr - trs * trs / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE))) END, 6) AS f_trend
         FROM sums""",

    "q458_hill_tail" ->
      """WITH cents AS (SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM orders),
         top AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC,
             o_orderkey ASC) AS BIGINT) AS rk
           FROM cents ORDER BY c DESC, o_orderkey ASC LIMIT 101),
         xk AS (SELECT c AS ck FROM top WHERE rk = 101),
         terms AS (SELECT rk,
             round(ln(CAST(c AS DOUBLE) / CAST(ck AS DOUBLE)), 6) AS t, ck
           FROM top CROSS JOIN xk WHERE rk <= 100)
         SELECT CAST(count(*) AS BIGINT) AS k_exceedances, ck AS xk_cents,
           round(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(t ORDER BY rk)), (p, q) -> p + q) > 0
             THEN CAST(count(*) AS DOUBLE)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(t ORDER BY rk)), (p, q) -> p + q) END, 6)
             AS hill_alpha
         FROM terms GROUP BY ck""",

    "q453_durbin_watson" ->
      s"""WITH daily AS ($dailyRevenueSql),
         t AS MATERIALIZED (SELECT nation, d, c,
             CAST(row_number() OVER (PARTITION BY nation ORDER BY d)
               AS BIGINT) AS t
           FROM daily),
         mom AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(t AS HUGEINT)) AS st,
             sum(CAST(t AS HUGEINT) * t) AS stt,
             sum(CAST(c AS HUGEINT)) AS sx,
             sum(CAST(t AS HUGEINT) * c) AS stx
           FROM t GROUP BY 1),
         ab AS (SELECT nation, n,
             (CAST(n AS DOUBLE) * CAST(stx AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
           FROM mom),
         ab2 AS (SELECT ab.nation, ab.n, b,
             (CAST(sx AS DOUBLE) - b * CAST(st AS DOUBLE))
               / CAST(ab.n AS DOUBLE) AS a
           FROM ab JOIN mom ON ab.nation = mom.nation),
         fit AS (SELECT t.nation, t.t,
             CAST(c AS DOUBLE) - (a + b * CAST(t.t AS DOUBLE)) AS e
           FROM t JOIN ab2 ON t.nation = ab2.nation),
         fl AS (SELECT nation, t, e,
             lag(e) OVER (PARTITION BY nation ORDER BY t) AS eprev
           FROM fit)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
           round(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(e * e ORDER BY t)), (p, q) -> p + q) > 0
             THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CASE WHEN eprev IS NULL THEN CAST(0.0 AS DOUBLE)
                 ELSE (e - eprev) * (e - eprev) END ORDER BY t)),
               (p, q) -> p + q)
             / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(e * e ORDER BY t)), (p, q) -> p + q) END, 6) AS dw
         FROM fl GROUP BY 1""",

    "q454_runs_test" ->
      s"""WITH daily AS ($dailyRevenueSql),
         lagd AS (SELECT nation, d, c,
             lag(c) OVER (PARTITION BY nation ORDER BY d) AS prev
           FROM daily),
         sgn AS (SELECT nation, d,
             CASE WHEN c > prev THEN 1 ELSE -1 END AS sg
           FROM lagd WHERE prev IS NOT NULL AND c <> prev),
         sl AS (SELECT nation, sg,
             lag(sg) OVER (PARTITION BY nation ORDER BY d) AS sprev
           FROM sgn),
         runs AS (SELECT nation,
             CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nm,
             CAST(sum(CASE WHEN sprev IS NULL OR sprev <> sg
               THEN 1 ELSE 0 END) AS BIGINT) AS r
           FROM sl GROUP BY 1)
         SELECT nation, np, nm, r AS n_runs,
           round(CASE WHEN np > 0 AND nm > 0 AND
             CAST(2.0 AS DOUBLE) * CAST(np AS DOUBLE) * CAST(nm AS DOUBLE)
               * (CAST(2.0 AS DOUBLE) * CAST(np AS DOUBLE)
                 * CAST(nm AS DOUBLE)
                 - (CAST(np AS DOUBLE) + CAST(nm AS DOUBLE)))
               / ((CAST(np AS DOUBLE) + CAST(nm AS DOUBLE))
                 * (CAST(np AS DOUBLE) + CAST(nm AS DOUBLE))
                 * (CAST(np AS DOUBLE) + CAST(nm AS DOUBLE)
                   - CAST(1.0 AS DOUBLE))) > 0
             THEN (CAST(r AS DOUBLE)
               - (CAST(2.0 AS DOUBLE) * CAST(np AS DOUBLE)
                 * CAST(nm AS DOUBLE)
                 / (CAST(np AS DOUBLE) + CAST(nm AS DOUBLE))
                 + CAST(1.0 AS DOUBLE)))
               / sqrt(CAST(2.0 AS DOUBLE) * CAST(np AS DOUBLE)
                 * CAST(nm AS DOUBLE)
                 * (CAST(2.0 AS DOUBLE) * CAST(np AS DOUBLE)
                   * CAST(nm AS DOUBLE)
                   - (CAST(np AS DOUBLE) + CAST(nm AS DOUBLE)))
                 / ((CAST(np AS DOUBLE) + CAST(nm AS DOUBLE))
                   * (CAST(np AS DOUBLE) + CAST(nm AS DOUBLE))
                   * (CAST(np AS DOUBLE) + CAST(nm AS DOUBLE)
                     - CAST(1.0 AS DOUBLE)))) END, 6) AS z
         FROM runs""",

    "q455_ljung_box" -> {
      val lagSel = (1 to 7).map(k =>
        s"lag(e, $k) OVER (PARTITION BY nation ORDER BY t) AS e$k")
        .mkString(",\n             ")
      val folds = (1 to 7).map(k =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CASE WHEN e$k IS NULL THEN CAST(0.0 AS DOUBLE)
               ELSE e * e$k END ORDER BY t)), (p, q) -> p + q) AS s$k""")
        .mkString(",\n             ")
      val qterms = (1 to 7).map(k =>
        s"(s$k / s0) * (s$k / s0) / (CAST(n AS DOUBLE) - CAST($k.0 AS DOUBLE))")
        .mkString(" + ")
      s"""WITH daily AS ($dailyRevenueSql),
         mean AS (SELECT nation,
             CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
             CAST(count(*) AS BIGINT) AS n
           FROM daily GROUP BY 1),
         e0 AS (SELECT daily.nation, n,
             CAST(row_number() OVER (PARTITION BY daily.nation ORDER BY d)
               AS BIGINT) AS t,
             CAST(c AS DOUBLE) - mu AS e
           FROM daily JOIN mean ON daily.nation = mean.nation),
         lagged AS (SELECT nation, n, t, e,
             $lagSel
           FROM e0),
         sums AS (SELECT nation, max(n) AS n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(e * e ORDER BY t)), (p, q) -> p + q) AS s0,
             $folds
           FROM lagged GROUP BY 1)
         SELECT nation, n AS n_days,
           round(CASE WHEN s0 > 0 THEN s1 / s0 END, 6) AS r1,
           round(CASE WHEN n > 8 AND s0 > 0
             THEN ($qterms) * CAST(n AS DOUBLE)
               * (CAST(n AS DOUBLE) + CAST(2.0 AS DOUBLE)) END, 6) AS lb_q
         FROM sums"""
    },

    "q441_cusum_chart" ->
      s"""WITH daily AS ($dailyRevenueSql),
         t0 AS (SELECT nation, sum(c) // count(*) AS tt,
             (sum(c) // count(*)) // 100 AS k
           FROM daily GROUP BY 1),
         cs AS (SELECT daily.nation, d, k,
             sum(c - tt - k) OVER (PARTITION BY daily.nation ORDER BY d)
               AS cup,
             sum(tt - c - k) OVER (PARTITION BY daily.nation ORDER BY d)
               AS cdn
           FROM daily JOIN t0 ON daily.nation = t0.nation),
         sx AS (SELECT nation, k,
             cup - least(0, min(cup) OVER (PARTITION BY nation ORDER BY d))
               AS sup,
             cdn - least(0, min(cdn) OVER (PARTITION BY nation ORDER BY d))
               AS sdn
           FROM cs)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN sup > k * 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_up,
           CAST(sum(CASE WHEN sdn > k * 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_down,
           CAST(max(sup) AS BIGINT) AS max_cusum_up,
           CAST(max(sdn) AS BIGINT) AS max_cusum_down
         FROM sx GROUP BY 1""",

    "q442_ewma_chart" ->
      s"""WITH daily AS MATERIALIZED ($dailyRevenueSql),
         g AS (SELECT nation, d, CAST(c AS DOUBLE) AS x FROM daily),
         st AS (SELECT a.nation, a.d, a.x,
             list_reduce(list(b.x ORDER BY b.d) FILTER (WHERE b.d < a.d),
               (p, q) -> CAST(0.25 AS DOUBLE) * q
                 + CAST(0.75 AS DOUBLE) * p) AS sprev,
             list_reduce(list(b.x ORDER BY b.d),
               (p, q) -> CAST(0.25 AS DOUBLE) * q
                 + CAST(0.75 AS DOUBLE) * p) AS snow,
             CAST(count(*) FILTER (WHERE b.d < a.d) AS BIGINT) AS np
           FROM g a JOIN g b ON a.nation = b.nation AND b.d <= a.d
           GROUP BY 1, 2, 3),
         lastd AS (SELECT nation, max(d) AS md FROM g GROUP BY 1)
         SELECT st.nation, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN np > 0
             AND abs(x - sprev) > CAST(0.5 AS DOUBLE) * sprev
             THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
           round(max(CASE WHEN st.d = md THEN snow END), 4) AS ewma_final
         FROM st JOIN lastd ON st.nation = lastd.nation
         GROUP BY 1""",

    "q443_theil_u2" ->
      s"""WITH daily AS MATERIALIZED ($dailyRevenueSql),
         g AS (SELECT nation, d, CAST(c AS DOUBLE) AS x FROM daily),
         st AS (SELECT a.nation, a.d, a.x,
             list_reduce(list(b.x ORDER BY b.d) FILTER (WHERE b.d < a.d),
               (p, q) -> CAST(0.25 AS DOUBLE) * q
                 + CAST(0.75 AS DOUBLE) * p) AS sprev,
             max(CASE WHEN b.d = a.pd THEN b.x END) AS xprev,
             CAST(count(*) FILTER (WHERE b.d < a.d) AS BIGINT) AS np
           FROM (SELECT nation, d, x,
               lag(d) OVER (PARTITION BY nation ORDER BY d) AS pd
             FROM g) a
           JOIN g b ON a.nation = b.nation AND b.d <= a.d
           GROUP BY 1, 2, 3, a.pd),
         terms AS (SELECT nation, d,
             (sprev - x) * (sprev - x) AS f,
             (xprev - x) * (xprev - x) AS n
           FROM st WHERE np > 0)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_eval_days,
           round(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(n ORDER BY d)), (x, y) -> x + y) > 0
             THEN sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(f ORDER BY d)), (x, y) -> x + y)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(n ORDER BY d)), (x, y) -> x + y)) END, 6) AS theil_u2
         FROM terms GROUP BY 1""",

    "q366_bollinger" ->
      s"""WITH daily AS ($dailyRevenueSql)
         , w AS (SELECT nation, c,
             count(*) OVER fr AS nw,
             CAST(sum(c) OVER fr AS DOUBLE) / 7.0 AS mean,
             -- HUGEINT square (mirrors the Spark side's DECIMAL(19,0)
             -- square): c ~ 3.4e9 at sf1, so c*c overflows INT64; the
             -- 7-term HUGEINT sum is exact and converts to double once.
             sqrt((CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                 OVER fr AS DOUBLE)
               - CAST(sum(c) OVER fr AS DOUBLE)
                 * CAST(sum(c) OVER fr AS DOUBLE) / 7.0) / 6.0) AS sd
           FROM daily
           WINDOW fr AS (PARTITION BY nation ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN CAST(c AS DOUBLE) > mean + 2.0 * sd
             THEN 1 ELSE 0 END) AS BIGINT) AS n_breakout_up,
           CAST(sum(CASE WHEN CAST(c AS DOUBLE) < mean - 2.0 * sd
             THEN 1 ELSE 0 END) AS BIGINT) AS n_breakout_down
         FROM w WHERE nw = 7 GROUP BY 1""",

    "q367_hist_var" ->
      s"""WITH daily AS ($dailyRevenueSql)
         , deltas AS (SELECT nation,
             c - lag(c, 1) OVER (PARTITION BY nation ORDER BY d) AS delta
           FROM daily),
         d2 AS (SELECT nation, delta FROM deltas WHERE delta IS NOT NULL),
         v AS (SELECT nation,
             quantile_cont(CAST(delta AS DOUBLE), 0.05) AS var5,
             CAST(count(*) AS BIGINT) AS n_days
           FROM d2 GROUP BY 1)
         SELECT nation, n_days, round(var5, 4) AS var_5pct,
           CAST(count(*) AS BIGINT) AS n_tail,
           round(CAST(sum(delta) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
             AS cvar_5pct
         FROM d2 JOIN v USING (nation)
         WHERE CAST(delta AS DOUBLE) <= var5
         GROUP BY 1, 2, 3""",
  ) ++ roundNineSql

  /** Round-9 oracles (appended to [[map]]). A `def`, not a `val`: some
    * entries interpolate [[dailyRevenueSql]], which as a val would still
    * be null during this object's initialization.
    */
  private def roundNineSql: Map[String, String] = Map(

    "q373_interval_coalesce" ->
      """WITH iv AS (SELECT l_suppkey AS supp, CAST(l_shipdate AS DATE) AS st,
           CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS en
           FROM lineitem),
         m AS (SELECT supp, st, en,
             max(en) OVER (PARTITION BY supp ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
           FROM iv),
         isl AS (SELECT supp, st, en,
             sum(CASE WHEN pm IS NULL OR st > pm THEN 1 ELSE 0 END)
               OVER (PARTITION BY supp ORDER BY st, en
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM m),
         g AS (SELECT supp, island, CAST(count(*) AS BIGINT) AS n_iv,
             date_diff('day', min(st), max(en)) + 1 AS days
           FROM isl GROUP BY 1, 2)
         SELECT supp, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(days) AS BIGINT) AS covered_days
         FROM g GROUP BY 1""",

    "q390_shapley_attribution" -> {
      val w = QueryDsl.shapleyWeights
      s"""WITH fp AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'purchase' GROUP BY 1),
         pre AS (SELECT e.user_id, e.event_type
           FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
           WHERE e.event_type <> 'purchase'
             AND (fp.t0 IS NULL OR e.ts < fp.t0)),
         users AS (SELECT u.user_id,
           CAST(coalesce(max(CASE WHEN p.event_type = 'click' THEN 1 ELSE 0 END)
             + 2 * max(CASE WHEN p.event_type = 'error' THEN 1 ELSE 0 END)
             + 4 * max(CASE WHEN p.event_type = 'signup' THEN 1 ELSE 0 END)
             + 8 * max(CASE WHEN p.event_type = 'view' THEN 1 ELSE 0 END), 0)
             AS INTEGER) AS mask,
           CAST(CASE WHEN max(fp2.t0) IS NOT NULL THEN 1 ELSE 0 END
             AS BIGINT) AS conv
           FROM (SELECT DISTINCT user_id FROM events) u
           LEFT JOIN pre p ON u.user_id = p.user_id
           LEFT JOIN fp fp2 ON u.user_id = fp2.user_id
           GROUP BY 1),
         nu AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM users),
         grid AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS nc
           FROM users GROUP BY 1),
         subsets AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS sset),
         cum AS (SELECT sset, CAST(coalesce(sum(nc), 0) AS BIGINT) AS cum
           FROM subsets LEFT JOIN grid ON (mask & sset) = mask GROUP BY 1),
         chan AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
           ('signup', 4), ('view', 8)) t(channel, bit)),
         terms AS (SELECT channel, c1.sset,
             round((CASE bit_count(c1.sset)
                 WHEN 0 THEN ${w(0)} WHEN 1 THEN ${w(1)}
                 WHEN 2 THEN ${w(2)} ELSE ${w(3)} END)
               * CAST(c2.cum - c1.cum AS DOUBLE) / CAST(nu AS DOUBLE), 9)
               AS term
           FROM chan JOIN cum c1 ON (c1.sset & bit) = 0
           JOIN cum c2 ON c2.sset = c1.sset + bit CROSS JOIN nu)
         SELECT channel, list_sum(list(term ORDER BY sset)) AS shapley
         FROM terms GROUP BY 1"""
    },

    "q392_record_counts" ->
      s"""WITH daily AS ($dailyRevenueSql)
         , r AS (SELECT nation, c,
             max(c) OVER (PARTITION BY nation ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
             row_number() OVER (PARTITION BY nation ORDER BY d) AS k
           FROM daily),
         recs AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CASE WHEN pm IS NULL OR c > pm THEN 1 ELSE 0 END)
               AS BIGINT) AS n_records
           FROM r GROUP BY 1),
         harm AS (SELECT nation,
             list_sum(list(round(1.0 / CAST(k AS DOUBLE), 9) ORDER BY k))
               AS hsum
           FROM r GROUP BY 1)
         SELECT nation, n_days, n_records,
           hsum AS expected_records,
           round(CAST(n_records AS DOUBLE) / hsum, 4) AS record_ratio
         FROM recs JOIN harm USING (nation)""",

    "q384_rbo_rankings" -> {
      val cases = QueryDsl.rboWeights.zipWithIndex
        .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }.mkString(" ")
      s"""WITH per AS (SELECT o_custkey AS ck,
           CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS xa,
           CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS xb
           FROM orders GROUP BY 1),
         ta AS (SELECT ck, xa AS s FROM per ORDER BY s DESC, ck LIMIT 20),
         tb AS (SELECT ck, xb AS s FROM per ORDER BY s DESC, ck LIMIT 20),
         ra AS (SELECT t.ck, CAST(count(o.ck) + 1 AS BIGINT) AS pa
           FROM ta t LEFT JOIN ta o
             ON o.s > t.s OR (o.s = t.s AND o.ck < t.ck)
           GROUP BY t.ck),
         rb AS (SELECT t.ck, CAST(count(o.ck) + 1 AS BIGINT) AS pb
           FROM tb t LEFT JOIN tb o
             ON o.s > t.s OR (o.s = t.s AND o.ck < t.ck)
           GROUP BY t.ck),
         bt AS (SELECT ra.ck, pa, pb FROM ra JOIN rb USING (ck)),
         x AS (SELECT d, CAST(count(*) AS BIGINT) AS x_d
           FROM bt CROSS JOIN (SELECT unnest(range(1, 21)) AS d)
           WHERE pa <= d AND pb <= d GROUP BY d),
         terms AS (SELECT d,
             round((CASE d $cases END) * CAST(x_d AS DOUBLE)
               / CAST(d AS DOUBLE), 9) AS term, x_d
           FROM x)
         SELECT CAST(20 AS BIGINT) AS depth,
           round(coalesce(list_sum(list(term ORDER BY d)), 0.0), 6) AS rbo_min,
           CAST(coalesce(max(CASE WHEN d = 20 THEN x_d END), 0) AS BIGINT)
             AS overlap_at_20
         FROM terms"""
    },

    "q376_gap_sequence_pairs" ->
      """WITH ev AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
           p_brand AS b
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey)
         SELECT a.b AS b_from, b2.b AS b_to,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT a.ck) AS BIGINT) AS n_customers
         FROM ev a JOIN ev b2 ON a.ck = b2.ck AND b2.d > a.d
           AND date_diff('day', a.d, b2.d) <= 30 AND a.b <> b2.b
         GROUP BY 1, 2 HAVING count(*) >= 5""",

    "q380_churn_hazard" ->
      """WITH per AS (SELECT o_custkey,
           min(year(o_orderdate) * 12 + month(o_orderdate)) AS m0,
           max(year(o_orderdate) * 12 + month(o_orderdate)) AS ml
           FROM orders GROUP BY 1),
         mm AS (SELECT max(ml) AS mm FROM per),
         grid AS (SELECT ml - m0 AS t, CAST(count(*) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN ml <= mm - 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS d_t
           FROM per CROSS JOIN mm GROUP BY 1)
         SELECT g.t AS tenure_months,
           CAST(sum(h.c_t) AS BIGINT) AS n_at_risk,
           g.d_t AS n_events,
           round(CAST(g.d_t AS DOUBLE) / CAST(sum(h.c_t) AS DOUBLE), 6)
             AS hazard
         FROM grid g JOIN grid h ON h.t >= g.t GROUP BY 1, 3""",

    "q381_segment_migration" ->
      """WITH per AS (SELECT o_custkey AS ck,
           CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS xa,
           CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS xb
           FROM orders GROUP BY 1),
         qa AS (SELECT quantile_cont(CAST(xa AS DOUBLE), [0.2, 0.4, 0.6, 0.8])
             AS q FROM per WHERE xa > 0),
         qb AS (SELECT quantile_cont(CAST(xb AS DOUBLE), [0.2, 0.4, 0.6, 0.8])
             AS q FROM per WHERE xb > 0),
         seg AS (SELECT
             CASE WHEN xa = 0 THEN 0
               WHEN CAST(xa AS DOUBLE) <= qa.q[1] THEN 1
               WHEN CAST(xa AS DOUBLE) <= qa.q[2] THEN 2
               WHEN CAST(xa AS DOUBLE) <= qa.q[3] THEN 3
               WHEN CAST(xa AS DOUBLE) <= qa.q[4] THEN 4
               ELSE 5 END AS seg_from,
             CASE WHEN xb = 0 THEN 0
               WHEN CAST(xb AS DOUBLE) <= qb.q[1] THEN 1
               WHEN CAST(xb AS DOUBLE) <= qb.q[2] THEN 2
               WHEN CAST(xb AS DOUBLE) <= qb.q[3] THEN 3
               WHEN CAST(xb AS DOUBLE) <= qb.q[4] THEN 4
               ELSE 5 END AS seg_to
           FROM per CROSS JOIN qa CROSS JOIN qb)
         SELECT seg_from, seg_to, CAST(count(*) AS BIGINT) AS n_customers
         FROM seg GROUP BY 1, 2""",

    "q382_stickiness" ->
      """WITH cm AS (SELECT DISTINCT o_custkey AS ck,
           year(o_orderdate) * 12 + month(o_orderdate) AS m FROM orders),
         monthly AS (SELECT m, CAST(count(DISTINCT ck) AS BIGINT) AS active
           FROM cm GROUP BY 1),
         tr AS (SELECT ck, m + i AS tm
           FROM cm CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
         tr3 AS (SELECT tm, CAST(count(DISTINCT ck) AS BIGINT) AS active3
           FROM tr GROUP BY 1),
         mn AS (SELECT min(m) AS mmin FROM cm)
         SELECT m AS month_idx, active, active3,
           round(CAST(active AS DOUBLE) / CAST(active3 AS DOUBLE), 6)
             AS stickiness
         FROM monthly JOIN tr3 ON m = tm CROSS JOIN mn
         WHERE m >= mmin + 2""",

    "q374_brand_trigrams" ->
      """WITH ev AS (SELECT o_custkey AS ck, o_orderdate AS d,
           l_orderkey AS ok, l_linenumber AS ln, p_brand AS b1
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey),
         t AS (SELECT ck, b1,
             lead(b1, 1) OVER w AS b2, lead(b1, 2) OVER w AS b3
           FROM ev WINDOW w AS (PARTITION BY ck ORDER BY d, ok, ln, b1))
         SELECT b1, b2, b3, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT ck) AS BIGINT) AS n_customers
         FROM t WHERE b3 IS NOT NULL
         GROUP BY 1, 2, 3 HAVING count(*) >= 3""",

    "q400_order_gaps" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d
           FROM orders),
         g AS (SELECT o_custkey,
             date_diff('day',
               lag(d) OVER (PARTITION BY o_custkey ORDER BY d), d) AS gap
           FROM o),
         base AS (SELECT n_name AS nation, CAST(gap AS BIGINT) AS gap
           FROM g
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           WHERE gap IS NOT NULL)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_gaps,
           round(CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
             AS mean_gap,
           round(quantile_cont(CAST(gap AS DOUBLE), 0.5), 2) AS median_gap,
           CAST(max(gap) AS BIGINT) AS max_gap
         FROM base GROUP BY 1""",

    "q401_new_vs_returning" ->
      """WITH per AS (SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS m
           FROM orders GROUP BY 1, 2),
         f AS (SELECT o_custkey, min(m) AS fm FROM per GROUP BY 1)
         SELECT m AS month, CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN m = fm THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(count(*) - sum(CASE WHEN m = fm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           round(CAST(sum(CASE WHEN m = fm THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS new_share
         FROM per JOIN f USING (o_custkey) GROUP BY 1""",

    "q402_pinball_loss" ->
      """WITH p AS (SELECT p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM part),
         b AS (SELECT p_brand,
             quantile_cont(CAST(c AS DOUBLE), 0.9) AS q
           FROM p GROUP BY 1)
         SELECT p.p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts,
           round(q / 100.0, 4) AS q90_dollars,
           round((0.9 * (CAST(sum(CASE WHEN c > q THEN c ELSE 0 END)
                 AS DOUBLE)
               - CAST(sum(CASE WHEN c > q THEN 1 ELSE 0 END) AS DOUBLE) * q)
             + (1.0 - 0.9)
               * (CAST(sum(CASE WHEN c <= q THEN 1 ELSE 0 END) AS DOUBLE) * q
                 - CAST(sum(CASE WHEN c <= q THEN c ELSE 0 END) AS DOUBLE)))
             / CAST(count(*) AS DOUBLE) / 100.0, 6) AS pinball_loss
         FROM p JOIN b USING (p_brand) GROUP BY 1, q""",

    "q410_chow_test" -> {
      // SSE in the centered-cross-moment closed form — one template
      // reused for the per-segment and pooled fits (mirrors the Spark
      // side's `sse` column builder exactly).
      val sse =
        """CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)
             / CAST(n AS DOUBLE)
           - CAST(CAST(n AS HUGEINT) * sty - st * sy AS DOUBLE)
             * CAST(CAST(n AS HUGEINT) * sty - st * sy AS DOUBLE)
             / (CAST(n AS DOUBLE)
               * CAST(CAST(n AS HUGEINT) * stt - st * st AS DOUBLE))"""
      val moments =
        """CAST(count(*) AS BIGINT) AS n,
           sum(CAST(t AS HUGEINT)) AS st, sum(CAST(c AS HUGEINT)) AS sy,
           sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS stt,
           sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy,
           sum(CAST(t AS HUGEINT) * CAST(c AS HUGEINT)) AS sty"""
      s"""WITH daily AS ($dailyRevenueSql),
         idx AS (SELECT nation, c,
             CAST(row_number() OVER (PARTITION BY nation ORDER BY d)
               AS BIGINT) AS t
           FROM daily),
         np AS (SELECT nation, CAST(count(*) AS BIGINT) AS nd
           FROM idx GROUP BY 1),
         seg AS (SELECT idx.nation, c, t,
             CASE WHEN t * 2 <= nd THEN 1 ELSE 2 END AS sgm
           FROM idx JOIN np USING (nation)),
         m AS (SELECT nation, sgm, $moments FROM seg GROUP BY 1, 2),
         e AS (SELECT nation, sgm, $sse AS sse FROM m),
         mp AS (SELECT nation, $moments FROM idx GROUP BY 1),
         ep AS (SELECT nation, n AS nd, $sse AS ssep FROM mp)
         SELECT ep.nation, nd AS n_days,
           round((ssep - e1.sse - e2.sse) / ssep, 6) AS break_share,
           round(((ssep - e1.sse - e2.sse) / 2.0)
             / ((e1.sse + e2.sse) / CAST(nd - 4 AS DOUBLE)), 4) AS f_chow
         FROM ep
         JOIN (SELECT nation, sse FROM e WHERE sgm = 1) e1 USING (nation)
         JOIN (SELECT nation, sse FROM e WHERE sgm = 2) e2 USING (nation)"""
    },

    "q411_granger_lag1" ->
      """WITH daily AS (SELECT n_name AS nation,
           CAST(o_orderdate AS DATE) AS d,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS y,
           CAST(count(*) AS BIGINT) AS x
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2),
         lagged AS (SELECT nation, y,
             lag(y) OVER (PARTITION BY nation ORDER BY d) AS yl,
             lag(x) OVER (PARTITION BY nation ORDER BY d) AS xl
           FROM daily),
         f AS (SELECT nation, y, yl, xl FROM lagged WHERE yl IS NOT NULL),
         m AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(y AS HUGEINT)) AS sy, sum(CAST(yl AS HUGEINT)) AS s1,
             sum(CAST(xl AS HUGEINT)) AS s2,
             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             sum(CAST(yl AS HUGEINT) * CAST(yl AS HUGEINT)) AS s11,
             sum(CAST(xl AS HUGEINT) * CAST(xl AS HUGEINT)) AS s22,
             sum(CAST(yl AS HUGEINT) * CAST(xl AS HUGEINT)) AS s12,
             sum(CAST(yl AS HUGEINT) * CAST(y AS HUGEINT)) AS s1y,
             sum(CAST(xl AS HUGEINT) * CAST(y AS HUGEINT)) AS s2y
           FROM f GROUP BY 1),
         cvals AS (SELECT nation, n,
             CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS cyy,
             CAST(CAST(n AS HUGEINT) * s11 - s1 * s1 AS DOUBLE) AS c11,
             CAST(CAST(n AS HUGEINT) * s22 - s2 * s2 AS DOUBLE) AS c22,
             CAST(CAST(n AS HUGEINT) * s12 - s1 * s2 AS DOUBLE) AS c12,
             CAST(CAST(n AS HUGEINT) * s1y - s1 * sy AS DOUBLE) AS c1y,
             CAST(CAST(n AS HUGEINT) * s2y - s2 * sy AS DOUBLE) AS c2y
           FROM m),
         b AS (SELECT nation, n, cyy, c1y, c2y, c11, c22, c12,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
           FROM cvals),
         sse AS (SELECT nation, n, b2, c11, c22, c12,
             (cyy - b1 * c1y - b2 * c2y) / CAST(n AS DOUBLE) AS sseu,
             (cyy - c1y * c1y / c11) / CAST(n AS DOUBLE) AS sser
           FROM b)
         SELECT nation, n AS n_days,
           CASE WHEN c22 > 0.0 AND c11 <> 0.0
               AND (c11 * c22 - c12 * c12) <> 0.0
             THEN round(b2, 4) ELSE NULL END AS beta_xlag,
           CASE WHEN c22 > 0.0 AND c11 <> 0.0
               AND (c11 * c22 - c12 * c12) <> 0.0 AND sseu > 0.0
             THEN round((sser - sseu)
               / (sseu / (CAST(n AS DOUBLE) - 3.0)), 4)
             ELSE NULL END AS f_granger
         FROM sse""",

    "q412_periodogram" ->
      s"""WITH daily AS ($dailyRevenueSql),
         idx AS (SELECT nation, d, c,
             date_diff('day', DATE '1992-01-01', d) AS t
           FROM daily),
         terms AS (SELECT nation, d, c,
             CAST(c AS DOUBLE) * (${fourierCase(7, 0)}) AS c7,
             CAST(c AS DOUBLE) * (${fourierCase(7, 1)}) AS s7,
             CAST(c AS DOUBLE) * (${fourierCase(30, 0)}) AS c30,
             CAST(c AS DOUBLE) * (${fourierCase(30, 1)}) AS s30
           FROM idx),
         g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS sy,
             list_sum(list(c7 ORDER BY d)) AS fc7,
             list_sum(list(s7 ORDER BY d)) AS fs7,
             list_sum(list(c30 ORDER BY d)) AS fc30,
             list_sum(list(s30 ORDER BY d)) AS fs30
           FROM terms GROUP BY 1)
         SELECT nation, n_days,
           round(sqrt(fc7 * fc7 + fs7 * fs7) / CAST(sy AS DOUBLE), 6)
             AS amp_weekly,
           round(sqrt(fc30 * fc30 + fs30 * fs30) / CAST(sy AS DOUBLE), 6)
             AS amp_monthly
         FROM g""",

    "q417_price_volume_mix" ->
      """WITH li AS (SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS yr,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r
           FROM lineitem),
         cells AS (SELECT p_brand, yr, CAST(sum(q) AS BIGINT) AS q,
             CAST(sum(r) AS BIGINT) AS r
           FROM li JOIN part ON l_partkey = p_partkey
           WHERE yr IN (1996, 1997) GROUP BY 1, 2),
         y0 AS (SELECT p_brand, q AS q0, r AS r0 FROM cells WHERE yr = 1996),
         y1 AS (SELECT p_brand, q AS q1, r AS r1 FROM cells WHERE yr = 1997)
         SELECT p_brand AS brand, q0, q1,
           CAST(r1 - r0 AS BIGINT) AS delta_cents,
           round(CAST(q1 - q0 AS DOUBLE)
             * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)) / 100.0, 4)
             AS volume_effect,
           round((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
               - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))
             * CAST(q1 AS DOUBLE) / 100.0, 4) AS price_effect
         FROM y0 JOIN y1 USING (p_brand)""",

    "q418_shift_share" ->
      """WITH li AS (SELECT l_orderkey, l_partkey,
           CAST(year(l_shipdate) AS INT) AS yr,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r
           FROM lineitem),
         cell AS (SELECT n_name AS nation, p_brand, yr,
             CAST(sum(r) AS BIGINT) AS e
           FROM li
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN part ON l_partkey = p_partkey
           WHERE yr IN (1996, 1997) GROUP BY 1, 2, 3),
         nb AS (SELECT nation, p_brand, a.e AS e0, b.e AS e1
           FROM (SELECT * FROM cell WHERE yr = 1996) a
           JOIN (SELECT * FROM cell WHERE yr = 1997) b
             USING (nation, p_brand)),
         br AS (SELECT p_brand, CAST(sum(e0) AS BIGINT) AS b0,
             CAST(sum(e1) AS BIGINT) AS b1
           FROM nb GROUP BY 1),
         tot AS (SELECT CAST(sum(e0) AS BIGINT) AS t0,
             CAST(sum(e1) AS BIGINT) AS t1
           FROM nb),
         terms AS (SELECT nation, nb.p_brand, e0, e1,
             CAST(e0 AS DOUBLE)
               * (CAST(t1 AS DOUBLE) / CAST(t0 AS DOUBLE) - 1.0) AS tn,
             CAST(e0 AS DOUBLE)
               * ((CAST(b1 AS DOUBLE) / CAST(b0 AS DOUBLE) - 1.0)
                 - (CAST(t1 AS DOUBLE) / CAST(t0 AS DOUBLE) - 1.0))
               AS tm,
             CAST(e0 AS DOUBLE)
               * ((CAST(e1 AS DOUBLE) / CAST(e0 AS DOUBLE) - 1.0)
                 - (CAST(b1 AS DOUBLE) / CAST(b0 AS DOUBLE) - 1.0))
               AS tc
           FROM nb JOIN br USING (p_brand) CROSS JOIN tot)
         SELECT nation, CAST(sum(e0) AS BIGINT) AS e0_cents,
           CAST(sum(e1) AS BIGINT) AS e1_cents,
           list_sum(list(tn ORDER BY p_brand)) / 100.0
             AS national_effect,
           list_sum(list(tm ORDER BY p_brand)) / 100.0
             AS mix_effect,
           list_sum(list(tc ORDER BY p_brand)) / 100.0
             AS competitive_effect
         FROM terms GROUP BY 1""",

    "q419_tukey_range" ->
      """WITH p AS (SELECT p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
           FROM part),
         g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS nj,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
           FROM p GROUP BY 1),
         w AS (SELECT p_brand,
             CAST(CAST(nj AS HUGEINT) * sxx - sx * sx AS DOUBLE)
               / CAST(nj AS DOUBLE) AS wj
           FROM g),
         t AS (SELECT CAST(sum(nj) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS j
           FROM g),
         msw AS (SELECT list_sum(list(wj ORDER BY p_brand))
             / (CAST(n AS DOUBLE) - CAST(j AS DOUBLE)) AS msw
           FROM w CROSS JOIN t GROUP BY n, j),
         pr AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             a.nj AS na, b.nj AS nb2, a.sx AS sxa, b.sx AS sxb
           FROM g a JOIN g b ON a.p_brand < b.p_brand)
         SELECT brand_a, brand_b,
           round(abs(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(sxb AS DOUBLE) / CAST(nb2 AS DOUBLE)) / 100.0, 4)
             AS mean_diff_dollars,
           round(abs(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(sxb AS DOUBLE) / CAST(nb2 AS DOUBLE))
             / sqrt(msw / 2.0 * (1.0 / CAST(na AS DOUBLE)
               + 1.0 / CAST(nb2 AS DOUBLE))), 4) AS q_stat
         FROM pr CROSS JOIN msw""",

    "q423_rsi" ->
      s"""WITH daily AS ($dailyRevenueSql),
         dl0 AS (SELECT nation, d,
             c - lag(c) OVER (PARTITION BY nation ORDER BY d) AS delta
           FROM daily),
         dlt AS (SELECT nation, d, greatest(delta, 0) AS gain,
             greatest(-delta, 0) AS loss
           FROM dl0 WHERE delta IS NOT NULL),
         rs AS (SELECT nation,
             count(*) OVER w AS nw, sum(gain) OVER w AS sg,
             sum(loss) OVER w AS sl
           FROM dlt WINDOW w AS (PARTITION BY nation ORDER BY d
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
         rv AS (SELECT nation,
             CASE WHEN sl = 0 THEN 100.0
               ELSE 100.0 - 100.0
                 / (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE)) END AS rsi
           FROM rs WHERE nw = 14)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN rsi > 70.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overbought,
           CAST(sum(CASE WHEN rsi < 30.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oversold,
           round(CAST(sum(CASE WHEN rsi > 70.0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS share_overbought
         FROM rv GROUP BY 1""",

    "q424_kendall_w" ->
      """WITH li AS (SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS yr,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r
           FROM lineitem),
         cells AS (SELECT p_brand, yr, CAST(sum(r) AS BIGINT) AS rev
           FROM li JOIN part ON l_partkey = p_partkey
           WHERE yr IN (1995, 1996, 1997) GROUP BY 1, 2),
         ranks AS (SELECT p_brand, yr,
             CAST(row_number() OVER (PARTITION BY yr
               ORDER BY rev DESC, p_brand ASC) AS BIGINT) AS rk
           FROM cells),
         rsums AS (SELECT p_brand, CAST(sum(rk) AS BIGINT) AS rj
           FROM ranks GROUP BY 1 HAVING count(*) = 3),
         nbr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rsums),
         t AS (SELECT n,
             CAST(sum((rj * 2 - 3 * (n + 1)) * (rj * 2 - 3 * (n + 1)))
               AS BIGINT) AS t
           FROM rsums CROSS JOIN nbr GROUP BY 1)
         SELECT n AS n_brands, CAST(3 AS BIGINT) AS m_years, t AS t_stat,
           round(3.0 * CAST(t AS DOUBLE)
             / (9.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6) AS w
         FROM t""",

    "q425_mase_naive" ->
      s"""WITH daily AS ($dailyRevenueSql),
         lagged AS (SELECT nation,
             abs(c - lag(c, 1) OVER (PARTITION BY nation ORDER BY d)) AS e1,
             abs(c - lag(c, 7) OVER (PARTITION BY nation ORDER BY d)) AS e7
           FROM daily)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(e1) AS DOUBLE) / CAST(count(e1) AS DOUBLE)
             / 100.0, 4) AS mae_naive,
           round(CAST(sum(e7) AS DOUBLE) / CAST(count(e7) AS DOUBLE)
             / 100.0, 4) AS mae_seasonal,
           round((CAST(sum(e7) AS DOUBLE) / CAST(count(e7) AS DOUBLE))
             / (CAST(sum(e1) AS DOUBLE) / CAST(count(e1) AS DOUBLE)), 6)
             AS mase_ratio
         FROM lagged GROUP BY 1""",

    "q426_rank_aggregation" ->
      """WITH li AS (SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS yr,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r
           FROM lineitem),
         cells0 AS (SELECT p_brand, yr, CAST(sum(r) AS BIGINT) AS rev
           FROM li JOIN part ON l_partkey = p_partkey
           WHERE yr IN (1995, 1996, 1997) GROUP BY 1, 2),
         universe AS (SELECT p_brand FROM cells0
           GROUP BY 1 HAVING count(*) = 3),
         cells AS (SELECT c.* FROM cells0 c JOIN universe USING (p_brand)),
         ranks AS (SELECT p_brand, yr,
             CAST(row_number() OVER (PARTITION BY yr
               ORDER BY rev DESC, p_brand ASC) AS BIGINT) AS rk
           FROM cells),
         nbr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM universe),
         borda AS (SELECT p_brand, CAST(sum(n - rk) AS BIGINT) AS borda
           FROM ranks CROSS JOIN nbr GROUP BY 1),
         beats AS (SELECT bi, CAST(count(*) AS BIGINT) AS n_beats FROM (
             SELECT a.p_brand AS bi, b.p_brand AS bj
             FROM ranks a JOIN ranks b
               ON a.yr = b.yr AND a.p_brand <> b.p_brand
             GROUP BY 1, 2
             HAVING sum(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) >= 2)
           GROUP BY 1)
         SELECT borda.p_brand AS brand, borda,
           CAST(coalesce(n_beats, 0) AS BIGINT) AS n_pairwise_wins,
           coalesce(n_beats, 0) = n - 1 AS condorcet_winner
         FROM borda LEFT JOIN beats ON borda.p_brand = beats.bi
         CROSS JOIN nbr""",

    "q427_bradley_terry" ->
      """WITH li AS (SELECT l_orderkey, l_partkey,
           CAST(year(l_shipdate) AS INT) AS yr,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r
           FROM lineitem),
         cell AS (SELECT n_name AS nation, p_brand, CAST(sum(r) AS BIGINT) AS e
           FROM li
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN part ON l_partkey = p_partkey
           WHERE yr = 1997 GROUP BY 1, 2),
         w AS (SELECT bi, bj,
             CAST(sum(CASE WHEN ei > ej THEN 1 ELSE 0 END) AS BIGINT) AS wij,
             CAST(count(*) AS BIGINT) AS nij
           FROM (SELECT nation, p_brand AS bi, e AS ei FROM cell) a
           JOIN (SELECT nation, p_brand AS bj, e AS ej FROM cell) b
             USING (nation)
           WHERE bi <> bj GROUP BY 1, 2),
         wt AS (SELECT bi, CAST(sum(wij) AS BIGINT) AS wtot FROM w GROUP BY 1),
         p1 AS (SELECT w.bi AS brand, CAST(wt.wtot AS DOUBLE)
             / list_sum(list(round(CAST(w.nij AS DOUBLE) / (1.0 + 1.0), 9)
               ORDER BY w.bj)) AS p
           FROM w JOIN wt ON wt.bi = w.bi GROUP BY w.bi, wt.wtot),
         p2 AS (SELECT w.bi AS brand, CAST(wt.wtot AS DOUBLE)
             / list_sum(list(round(CAST(w.nij AS DOUBLE) / (pi.p + pj.p), 9)
               ORDER BY w.bj)) AS p
           FROM w
           JOIN p1 pi ON pi.brand = w.bi
           JOIN p1 pj ON pj.brand = w.bj
           JOIN wt ON wt.bi = w.bi
           GROUP BY w.bi, wt.wtot),
         p3 AS (SELECT w.bi AS brand, CAST(wt.wtot AS DOUBLE)
             / list_sum(list(round(CAST(w.nij AS DOUBLE) / (pi.p + pj.p), 9)
               ORDER BY w.bj)) AS p
           FROM w
           JOIN p2 pi ON pi.brand = w.bi
           JOIN p2 pj ON pj.brand = w.bj
           JOIN wt ON wt.bi = w.bi
           GROUP BY w.bi, wt.wtot),
         ps AS (SELECT list_sum(list(p ORDER BY brand)) AS ps FROM p3)
         SELECT p3.brand, wt.wtot AS wins, round(p / ps, 6) AS bt_score
         FROM p3 JOIN wt ON wt.bi = p3.brand CROSS JOIN ps""",

    "q433_topsis" -> {
      def u(f: String) = s"(1.0 - (-($f) / ln(CAST(nb AS DOUBLE))))"
      val wsum = s"(${u("f1")} + ${u("f2")} + ${u("f3")})"
      def v(x: String, ss: String, f: String) =
        s"$x / sqrt($ss) * (${u(f)} / $wsum)"
      s"""WITH base AS (SELECT p_brand,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS sp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS nc
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey
           GROUP BY 1),
         m AS (SELECT p_brand,
             CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS x1,
             CAST(sq AS DOUBLE) AS x2, CAST(nc AS DOUBLE) AS x3
           FROM base),
         sums AS (SELECT
             list_sum(list(x1 * x1 ORDER BY p_brand)) AS ss1,
             list_sum(list(x2 * x2 ORDER BY p_brand)) AS ss2,
             list_sum(list(x3 * x3 ORDER BY p_brand)) AS ss3,
             list_sum(list(x1 ORDER BY p_brand)) AS t1,
             list_sum(list(x2 ORDER BY p_brand)) AS t2,
             list_sum(list(x3 ORDER BY p_brand)) AS t3,
             CAST(count(*) AS BIGINT) AS nb
           FROM m),
         ent AS (SELECT
             list_sum(list(round(x1 / t1 * ln(x1 / t1), 9)
               ORDER BY p_brand)) AS f1,
             list_sum(list(round(x2 / t2 * ln(x2 / t2), 9)
               ORDER BY p_brand)) AS f2,
             list_sum(list(round(x3 / t3 * ln(x3 / t3), 9)
               ORDER BY p_brand)) AS f3
           FROM m CROSS JOIN sums),
         sc AS (SELECT p_brand,
             ${v("x1", "ss1", "f1")} AS v1,
             ${v("x2", "ss2", "f2")} AS v2,
             ${v("x3", "ss3", "f3")} AS v3
           FROM m CROSS JOIN sums CROSS JOIN ent),
         id AS (SELECT max(v1) AS i1, min(v1) AS a1, max(v2) AS i2,
             min(v2) AS a2, max(v3) AS i3, min(v3) AS a3
           FROM sc)
         SELECT p_brand AS brand,
           round(sqrt((v1 - i1) * (v1 - i1) + (v2 - i2) * (v2 - i2)
             + (v3 - i3) * (v3 - i3)), 6) AS d_plus,
           round(sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
             + (v3 - a3) * (v3 - a3)), 6) AS d_minus,
           round(sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
               + (v3 - a3) * (v3 - a3))
             / (sqrt((v1 - i1) * (v1 - i1) + (v2 - i2) * (v2 - i2)
               + (v3 - i3) * (v3 - i3))
               + sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
                 + (v3 - a3) * (v3 - a3))), 6) AS topsis_closeness
         FROM sc CROSS JOIN id"""
    },

    // q436: the q433 body with x3 = the DECLARED KMV estimate — the k=256
    // smallest distinct md5 unit hashes of the buyer key per brand
    // ((k−1)/h_k when full, exact count otherwise), replayed exactly (a
    // set's k smallest distinct values are order-independent).
    "q436_topsis_kmv" -> {
      def u(f: String) = s"(1.0 - (-($f) / ln(CAST(nb AS DOUBLE))))"
      val wsum = s"(${u("f1")} + ${u("f2")} + ${u("f3")})"
      def v(x: String, ss: String, f: String) =
        s"$x / sqrt($ss) * (${u(f)} / $wsum)"
      s"""WITH j AS MATERIALIZED (SELECT p_brand,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r,
           CAST(l_quantity AS BIGINT) AS q, o_custkey
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey),
         base AS (SELECT p_brand, CAST(sum(r) AS BIGINT) AS sp,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sq
           FROM j GROUP BY 1),
         hb AS (SELECT DISTINCT p_brand,
             CAST(CAST(concat('0x', substr(md5(concat('kmvb_',
               CAST(o_custkey AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0 AS h
           FROM j),
         rk AS (SELECT p_brand, h, row_number() OVER (PARTITION BY p_brand
             ORDER BY h ASC) AS rn FROM hb),
         sk AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS kk,
             max(h) AS hk
           FROM rk WHERE rn <= 256 GROUP BY 1),
         m AS (SELECT base.p_brand,
             CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS x1,
             CAST(sq AS DOUBLE) AS x2,
             CASE WHEN kk >= 256 THEN 255.0 / hk
               ELSE CAST(kk AS DOUBLE) END AS x3
           FROM base JOIN sk ON base.p_brand = sk.p_brand),
         sums AS (SELECT
             list_sum(list(x1 * x1 ORDER BY p_brand)) AS ss1,
             list_sum(list(x2 * x2 ORDER BY p_brand)) AS ss2,
             list_sum(list(x3 * x3 ORDER BY p_brand)) AS ss3,
             list_sum(list(x1 ORDER BY p_brand)) AS t1,
             list_sum(list(x2 ORDER BY p_brand)) AS t2,
             list_sum(list(x3 ORDER BY p_brand)) AS t3,
             CAST(count(*) AS BIGINT) AS nb
           FROM m),
         ent AS (SELECT
             list_sum(list(round(x1 / t1 * ln(x1 / t1), 9)
               ORDER BY p_brand)) AS f1,
             list_sum(list(round(x2 / t2 * ln(x2 / t2), 9)
               ORDER BY p_brand)) AS f2,
             list_sum(list(round(x3 / t3 * ln(x3 / t3), 9)
               ORDER BY p_brand)) AS f3
           FROM m CROSS JOIN sums),
         sc AS (SELECT p_brand, x3,
             ${v("x1", "ss1", "f1")} AS v1,
             ${v("x2", "ss2", "f2")} AS v2,
             ${v("x3", "ss3", "f3")} AS v3
           FROM m CROSS JOIN sums CROSS JOIN ent),
         id AS (SELECT max(v1) AS i1, min(v1) AS a1, max(v2) AS i2,
             min(v2) AS a2, max(v3) AS i3, min(v3) AS a3
           FROM sc)
         SELECT p_brand AS brand, x3 AS est_buyers,
           round(sqrt((v1 - i1) * (v1 - i1) + (v2 - i2) * (v2 - i2)
             + (v3 - i3) * (v3 - i3)), 6) AS d_plus,
           round(sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
             + (v3 - a3) * (v3 - a3)), 6) AS d_minus,
           round(sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
               + (v3 - a3) * (v3 - a3))
             / (sqrt((v1 - i1) * (v1 - i1) + (v2 - i2) * (v2 - i2)
               + (v3 - i3) * (v3 - i3))
               + sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
                 + (v3 - a3) * (v3 - a3))), 6) AS topsis_closeness
         FROM sc CROSS JOIN id"""
    },

    "q467_spectral_entropy" -> {
      // Harmonic-j trig weight: the SAME fourierWeights(7) literals the
      // Spark side consumes, indexed by (t·j) mod 7 (the q412
      // discipline — no engine calls its own cos/sin).
      def hc(j: Int, which: Int): String =
        "CASE (t * " + j + ") % 7 " + QueryDsl.fourierWeights(7).zipWithIndex
          .map { case ((c, sn), k) =>
            s"WHEN $k THEN ${if (which == 0) c else sn}"
          }.mkString(" ") + " ELSE 0.0 END"
      val folds = (1 to 3).flatMap { j =>
        Seq(
          s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(c AS DOUBLE) * (${hc(j, 0)}) ORDER BY d)),
             (p, q) -> p + q) AS fc$j""",
          s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(c AS DOUBLE) * (${hc(j, 1)}) ORDER BY d)),
             (p, q) -> p + q) AS fs$j""")
      }.mkString(",\n             ")
      s"""WITH daily AS ($dailyRevenueSql),
         t AS (SELECT nation, d, c,
             date_diff('day', DATE '1992-01-01', d) AS t
           FROM daily),
         sums AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
             $folds
           FROM t GROUP BY 1),
         p AS (SELECT nation, n_days,
             fc1 * fc1 + fs1 * fs1 AS p1,
             fc2 * fc2 + fs2 * fs2 AS p2,
             fc3 * fc3 + fs3 * fs3 AS p3
           FROM sums),
         pt AS (SELECT nation, n_days, p1, p2, p3, p1 + p2 + p3 AS pt
           FROM p)
         SELECT nation, n_days,
           round(((CASE WHEN p1 > 0 THEN -(p1 / pt) * ln(p1 / pt)
               ELSE 0.0 END)
             + (CASE WHEN p2 > 0 THEN -(p2 / pt) * ln(p2 / pt)
               ELSE 0.0 END)
             + (CASE WHEN p3 > 0 THEN -(p3 / pt) * ln(p3 / pt)
               ELSE 0.0 END)) / ln(3.0), 6) AS spectral_entropy
         FROM pt"""
    },

    "q476_horvitz_thompson" ->
      """WITH o AS (SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
         FROM orders),
         ly AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS y
           FROM lineitem GROUP BY 1),
         oy AS (SELECT o_orderkey, x,
             CAST(coalesce(y, 0) AS BIGINT) AS y
           FROM o LEFT JOIN ly ON o_orderkey = l_orderkey),
         tot AS (SELECT CAST(sum(x) AS BIGINT) AS tx,
             CAST(sum(y) AS BIGINT) AS ty FROM oy),
         wp AS (SELECT o_orderkey, y,
             least(1.0, 200.0 * CAST(x AS DOUBLE) / CAST(tx AS DOUBLE))
               AS pi,
             CAST(CAST(concat('0x', substr(md5(concat('ht_',
               CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0 AS u,
             ty
           FROM oy CROSS JOIN tot),
         sampled AS (SELECT * FROM wp WHERE u < pi)
         SELECT CAST(count(*) AS BIGINT) AS n_sampled,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(y AS DOUBLE) / pi ORDER BY o_orderkey)),
             (p, q) -> p + q) AS ht_total,
           CAST(max(ty) AS BIGINT) AS true_total,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(y AS DOUBLE) / pi ORDER BY o_orderkey)),
             (p, q) -> p + q) / CAST(max(ty) AS DOUBLE) AS ht_ratio
         FROM sampled""",

    // ── Round-12 tier ───────────────────────────────────────────────────

    "q492_fano_burstiness" ->
      """WITH dayc AS (SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS c
         FROM events GROUP BY 1, 2),
         st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS scc
           FROM dayc GROUP BY 1 HAVING count(*) >= 5)
         SELECT user_id, nd AS n_days, sc AS n_events,
           ((CAST(scc AS DOUBLE)
             - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE))
             / CAST(nd AS DOUBLE))
           / (CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE)) AS fano
         FROM st ORDER BY fano DESC, user_id LIMIT 20""",

    "q493_interarrival_rate" ->
      """WITH st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
           CAST(max(epoch_us(ts)) AS BIGINT) AS t1
         FROM events GROUP BY 1 HAVING count(*) >= 2
           AND max(epoch_us(ts)) > min(epoch_us(ts)))
         SELECT user_id, n AS n_events, CAST(t1 - t0 AS BIGINT) AS span_us,
           CAST(n - 1 AS DOUBLE) * 86400000000.0
             / CAST(t1 - t0 AS DOUBLE) AS events_per_day
         FROM st ORDER BY n_events DESC, user_id LIMIT 20""",
  )

  /** q412's trig basis as a CASE over the day index mod p — rendered
    * from the SAME Scala doubles the Spark when-chain consumes
    * (QueryDsl.fourierWeights), so no engine ever calls its own
    * cos/sin. `which` 0 = cos, 1 = sin.
    */
  private def fourierCase(p: Int, which: Int): String =
    "CASE " + QueryDsl.fourierWeights(p).zipWithIndex.map {
      case ((c, sn), k) =>
        s"WHEN t % $p = $k THEN ${if (which == 0) c else sn}"
    }.mkString(" ") + " ELSE 0.0 END"

  /** The q365–q367 shared grid: daily order revenue in exact cents per
    * (nation, day) — textual mirror of QueriesWarehouse.dailyRevenue.
    */
  private[graft] val dailyRevenueSql: String =
    """SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS d,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         AS BIGINT) AS c
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY 1, 2"""
}
