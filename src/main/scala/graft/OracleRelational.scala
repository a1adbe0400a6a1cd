package graft

import OracleHelpers._

/** DuckDB oracle SQL for the QueriesRelational tier (cross-engine determinism
  * rules in the SparkEntry scaladoc). Moved verbatim from SparkEntry.
  */
private[graft] object OracleRelational {
  def map: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_fk_dim_join" ->
      """SELECT r_name AS region_name, n_name AS nation_name, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q03_revenue_by_nation" ->
      """SELECT n_name AS nation_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY n_name""",
    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q05_semi_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_discount > 0.07)""",
    "q06_full_outer" ->
      """SELECT COALESCE(o.day, l.day) AS day, COALESCE(n_orders, 0) AS n_orders,
         COALESCE(n_ships, 0) AS n_ships FROM
         (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders FROM orders GROUP BY 1) o
         FULL OUTER JOIN
         (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, count(*) AS n_ships FROM lineitem GROUP BY 1) l
         ON o.day = l.day""",
    "q07_self_join" ->
      """SELECT a.n_regionkey AS region_key, a.n_name AS nation_a, b.n_name AS nation_b
         FROM nation a JOIN nation b
         ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name""",
    "q08_expr_join" ->
      """WITH dim AS (SELECT DISTINCT o_orderstatus || '|' || o_orderpriority AS class_key FROM orders),
         dim2 AS (SELECT class_key, CAST(dense_rank() OVER (ORDER BY class_key) AS INTEGER) AS class_id FROM dim)
         SELECT class_id, class_key, count(*) AS n_orders
         FROM orders JOIN dim2 ON o_orderstatus || '|' || o_orderpriority = class_key
         GROUP BY class_id, class_key""",
    "q09_exactly_one" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         uniq AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) = 1)
         SELECT p_partkey, p_name, l_suppkey AS sole_suppkey
         FROM part JOIN ps ON p_partkey = ps.l_partkey JOIN uniq ON ps.l_partkey = uniq.l_partkey""",
    "q10_collect_set" ->
      """SELECT o_orderpriority,
         string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
         count(*) AS n_orders FROM orders GROUP BY o_orderpriority""",
    "q11_conditional_agg" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
         CAST(sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
         count(*) AS n_total FROM lineitem GROUP BY l_returnflag""",
    "q12_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
         FROM orders) WHERE rn <= 2""",
    "q13_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         FROM lineitem WHERE l_suppkey <= 5""",
    "q14_recode" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                     WHEN o_totalprice < 10000 THEN 'medium'
                     WHEN o_totalprice < 100000 THEN 'large'
                     ELSE 'jumbo' END AS size_class,
         o_orderstatus, count(*) AS n, min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price
         FROM orders GROUP BY size_class, o_orderstatus""",
    "q15_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q16_union" ->
      """SELECT kind, count(*) AS n,
         CAST(sum(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal FROM (
         SELECT c_name AS entity_name, 'customer' AS kind, c_acctbal AS acctbal FROM customer
         UNION ALL
         SELECT s_name, 'supplier', s_acctbal FROM supplier) GROUP BY kind""",
    "q17_array_ops" ->
      """SELECT p_partkey,
         array_to_string(list_sort(list_distinct(list_filter(string_split(p_name, ' '),
           x -> NOT list_contains(['small','red'], x)))), ' ') AS kept_words,
         len(list_distinct(list_filter(string_split(p_name, ' '),
           x -> list_contains(['small','red','blue'], x)))) AS n_marked
         FROM part""",
    "q18_string_funcs" ->
      """SELECT c_custkey, upper(trim(c_name)) AS name_upper,
         replace(lower(c_mktsegment), 'a', '@') AS seg_coded,
         substr(c_name, 1, 8) AS name_prefix, length(c_name) AS name_len
         FROM customer""",
    "q19_regexp" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num,
         regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_novowel
         FROM customer""",
    "q20_explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
         SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
         GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "q21_json" ->
      """SELECT event_type, CAST(sum(k_val) AS BIGINT) AS sum_k, max(k_val) AS max_k, count(*) AS n
         FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val FROM events)
         GROUP BY event_type""",
    "q22_null_handling" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         count(d) AS n_nonnull, CAST(sum(CAST(d AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
         FROM (SELECT l_returnflag, CASE WHEN l_discount = 0 THEN NULL ELSE l_discount END AS d
               FROM lineitem) GROUP BY l_returnflag""",
    "q23_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q24_hourly_events" ->
      """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:00') AS hour,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2""",
    "q25_dense_id" ->
      """SELECT p_brand, CAST(dense_rank() OVER (ORDER BY p_brand) AS INTEGER) AS brand_id
         FROM (SELECT DISTINCT p_brand FROM part)""",
    "q26_binning" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN '0-1k'
                     WHEN o_totalprice < 10000 THEN '1k-10k'
                     WHEN o_totalprice < 100000 THEN '10k-100k'
                     ELSE '100k+' END AS bucket,
         count(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
         FROM orders GROUP BY bucket""",
    "q28_sorted_array_join" ->
      """SELECT array_to_string(list_sort(string_split(p_name, ' ')), ' ') AS word_bag,
         count(*) AS n_parts, min(p_partkey) AS min_partkey
         FROM part GROUP BY 1 HAVING count(*) > 1""",
    "q29_nullsafe_join" ->
      """WITH o AS (SELECT CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS pk,
                    o_totalprice FROM orders),
         a AS (SELECT pk, count(*) AS n_a FROM o GROUP BY pk),
         b AS (SELECT pk, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_b FROM o GROUP BY pk)
         SELECT a.pk AS status_key, n_a, total_b FROM a JOIN b ON a.pk IS NOT DISTINCT FROM b.pk""",
    "q42_sessionize" ->
      """SELECT user_id,
         CAST(sum(CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
         count(*) AS n_events
         FROM (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events) GROUP BY user_id""",
    "q44_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
         FROM orders GROUP BY o_orderpriority""",
    "q27_composite_join" ->
      """WITH pairs AS (SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
           FROM lineitem GROUP BY 1, 2)
         SELECT l.l_partkey, l.l_suppkey,
           CAST(sum(CASE WHEN l.l_quantity > p.avg_qty THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           count(*) AS n_total
         FROM lineitem l JOIN pairs p
           ON l.l_partkey = p.l_partkey AND l.l_suppkey = p.l_suppkey
         GROUP BY 1, 2""",
    "q43_json_build" ->
      """SELECT o_orderpriority,
         '[' || string_agg(obj, ',' ORDER BY obj) || ']' AS status_json
         FROM (SELECT o_orderpriority, o_orderstatus,
                 '{"status":"' || o_orderstatus || '","n":' || CAST(count(*) AS VARCHAR) || '}' AS obj
               FROM orders GROUP BY 1, 2)
         GROUP BY o_orderpriority""",
    "q45_any_flag" ->
      """WITH flags AS (SELECT l_partkey,
           max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
           FROM lineitem GROUP BY 1)
         SELECT p_brand, CAST(sum(COALESCE(has_r, 0)) AS BIGINT) AS n_parts_with_returns,
           count(*) AS n_parts
         FROM part LEFT JOIN flags ON p_partkey = l_partkey
         GROUP BY p_brand""",
    "q46_flatten_distinct" ->
      """WITH per_order AS (SELECT l_orderkey,
           list(DISTINCT l_returnflag) AS flags FROM lineitem GROUP BY 1)
         SELECT o_orderpriority,
           array_to_string(list_sort(list_distinct(flatten(list(flags)))), ',') AS all_flags
         FROM orders JOIN per_order ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority""",
    "q47_window_list" ->
      """SELECT l_suppkey, max(ship_seq) AS ship_dates FROM (
           SELECT l_suppkey,
             string_agg(strftime(l_shipdate, '%Y-%m-%d'), ',') OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ship_seq
           FROM lineitem WHERE l_suppkey <= 3)
         GROUP BY l_suppkey""",
    "q48_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q65_median" ->
      """SELECT l_returnflag, median(l_quantity) AS median_qty, count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q63_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q64_analytics" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price,
         first_value(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "q49_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997""",
    "q50_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997""",
    "q51_date_parts" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n
         FROM orders GROUP BY 1, 2""",
    "q52_score" ->
      """WITH n AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
         SELECT c_custkey,
           (CASE WHEN c_acctbal > 5000 THEN 40 WHEN c_acctbal > 1000 THEN 20 ELSE 0 END
            + CASE WHEN c_mktsegment = 'BUILDING' THEN 10 ELSE 0 END
            + CAST(floor(least(COALESCE(n_orders, 0), 7) * 100 / 7.0) AS INT)) AS metadata_score
         FROM customer LEFT JOIN n ON c_custkey = o_custkey""",
    "q57_asof_join" ->
      """WITH views AS (SELECT user_id, ts, max(event_id) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         p AS (SELECT event_id AS purchase_id, user_id, ts
           FROM events WHERE event_type = 'purchase')
         SELECT p.purchase_id, p.user_id, v.view_id AS last_view_id
         FROM p ASOF LEFT JOIN views v
           ON p.user_id = v.user_id AND p.ts >= v.ts""",
    "q58_range_join" ->
      """SELECT e.event_id AS error_id, p.event_id AS purchase_id
         FROM events e JOIN events p
           ON e.user_id = p.user_id
          AND e.event_type = 'error' AND p.event_type = 'purchase'
          AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 300000000""",

    "q207_fuzzy_join" ->
      """WITH dn AS (SELECT p_name, min(p_partkey) AS k,
             CAST(count(*) AS BIGINT) AS n
           FROM part GROUP BY 1),
         t AS (SELECT p_name, k, n,
             string_split(p_name, ' ')[1] AS blk FROM dn)
         SELECT a.k AS key_a, b.k AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
           a.n AS n_a, b.n AS n_b
         FROM t a JOIN t b ON a.blk = b.blk AND a.k < b.k
         WHERE levenshtein(a.p_name, b.p_name) <= 3""",

    "q208_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",

    "q217_jaro_winkler_join" ->
      """WITH dn AS (SELECT p_name, min(p_partkey) AS k,
             CAST(count(*) AS BIGINT) AS n
           FROM part GROUP BY 1),
         t AS (SELECT p_name, k, n,
             string_split(p_name, ' ')[1] AS blk FROM dn)
         SELECT a.k AS key_a, b.k AS key_b,
           round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw,
           a.n AS n_a, b.n AS n_b
         FROM t a JOIN t b ON a.blk = b.blk AND a.k < b.k
         WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.85""",

    "q214_table_diff" ->
      """WITH a AS (SELECT o_orderkey AS k,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents_a,
             o_orderstatus AS st_a FROM orders),
         base AS (SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             o_orderstatus FROM orders),
         b AS (
           SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 97 = 0 THEN cents + 100 ELSE cents END AS cents_b,
             o_orderstatus AS st_b
           FROM base WHERE o_orderkey % 101 <> 0
           UNION ALL
           SELECT -o_orderkey, cents, o_orderstatus
           FROM base WHERE o_orderkey % 103 = 0)
         SELECT CASE WHEN cents_b IS NULL THEN 'only_a'
             WHEN cents_a IS NULL THEN 'only_b'
             WHEN cents_a <> cents_b OR st_a <> st_b THEN 'changed'
             ELSE 'same' END AS status,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM a FULL JOIN b USING (k)
         GROUP BY 1""",

    "q216_rank_family" ->
      """SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS quartile,
           percent_rank() OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey) AS pct_rank,
           cume_dist() OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey) AS cum_dist,
           CAST(dense_rank() OVER (PARTITION BY c_nationkey
             ORDER BY c_mktsegment) AS INTEGER) AS seg_rank
         FROM customer""",

    "q212_pivot_multi" ->
      """SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS "O_n",
           CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             FILTER (o_orderstatus = 'O'), 0) AS DOUBLE) AS "O_rev",
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS "F_n",
           CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             FILTER (o_orderstatus = 'F'), 0) AS DOUBLE) AS "F_rev",
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS "P_n",
           CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             FILTER (o_orderstatus = 'P'), 0) AS DOUBLE) AS "P_rev"
         FROM orders GROUP BY o_orderpriority""",

    "q265_table_checksum" ->
      """WITH oh AS (SELECT CAST(CAST(concat('0x', substr(md5(
             concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
               strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)),
             1, 15)) AS BIGINT) AS HUGEINT) AS h
           FROM orders),
         ch AS (SELECT CAST(CAST(concat('0x', substr(md5(
             concat_ws('|', c_custkey, c_name, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
               c_mktsegment)), 1, 15)) AS BIGINT) AS HUGEINT) AS h
           FROM customer)
         SELECT 'orders' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h) % 4611686018427387904 AS BIGINT) AS checksum FROM oh
         UNION ALL
         SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h) % 4611686018427387904 AS BIGINT) AS checksum FROM ch""",

    "q270_zorder_layout" -> {
      // Generated mirror of the 12+12-bit Morton interleave (x on even
      // MSB-first positions).
      val zx = (0 until 12).map(i => s"(((xi >> ${11 - i}) & 1) << ${23 - 2 * i})")
      val zy = (0 until 12).map(i => s"(((yi >> ${11 - i}) & 1) << ${22 - 2 * i})")
      val z = (zx ++ zy).mkString(" + ")
      s"""WITH o AS (SELECT o_custkey AS x,
           CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
             AS BIGINT) AS y
         FROM orders),
         m AS (SELECT max(x) AS mx, max(y) AS my FROM o),
         pts AS (SELECT x // (mx // 4096 + 1) AS xi, y // (my // 4096 + 1) AS yi
           FROM o CROSS JOIN m),
         b AS (SELECT xi, yi, ($z) >> 20 AS zb, xi >> 8 AS xb FROM pts),
         zs AS (SELECT 'zorder' AS layout, zb AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             max(xi) - min(xi) AS x_span, max(yi) - min(yi) AS y_span
           FROM b GROUP BY 2),
         xs AS (SELECT 'xsort' AS layout, xb AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             max(xi) - min(xi) AS x_span, max(yi) - min(yi) AS y_span
           FROM b GROUP BY 2)
         SELECT * FROM zs UNION ALL SELECT * FROM xs"""
    },

    "q353_damerau_join" ->
      """WITH vocab AS (SELECT DISTINCT w FROM (
           SELECT unnest(regexp_split_to_array(p_name, ' ')) AS w FROM part)
         WHERE length(w) > 0)
         SELECT a.w AS w1, b.w AS w2,
           CAST(damerau_levenshtein(a.w, b.w) AS BIGINT) AS dl,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS lev
         FROM vocab a JOIN vocab b
           ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 2
         WHERE damerau_levenshtein(a.w, b.w) <= 2""",

    "q354_char_jaccard_join" ->
      """WITH vocab AS (SELECT DISTINCT w FROM (
           SELECT unnest(regexp_split_to_array(p_name, ' ')) AS w FROM part)
         WHERE length(w) > 0)
         SELECT a.w AS w1, b.w AS w2,
           round(jaccard(a.w, b.w), 6) AS char_jaccard
         FROM vocab a JOIN vocab b ON a.w < b.w
         WHERE jaccard(a.w, b.w) >= 0.75""",

    "q355_hamming_blocked" ->
      """WITH codes AS (SELECT c_nationkey,
             substr(md5(concat('ph_', CAST(c_custkey AS VARCHAR))), 1, 8)
               AS code
           FROM customer),
         items AS (SELECT concat(CAST(c_nationkey AS VARCHAR), '_',
             substr(code, 1, 1)) AS blk, code
           FROM codes),
         widths AS (SELECT blk FROM items GROUP BY 1
           HAVING count(*) <= 2000),
         kept AS (SELECT i.blk, i.code FROM items i
           JOIN widths w ON i.blk = w.blk),
         pairs AS (SELECT a.blk, a.code AS pa, b.code AS pb
           FROM kept a JOIN kept b
             ON a.blk = b.blk AND a.code < b.code)
         SELECT CAST(hamming(pa, pb) AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
         FROM pairs GROUP BY 1""",

    "q327_lev_join" ->
      """WITH vocab AS (SELECT DISTINCT w FROM (
           SELECT unnest(regexp_split_to_array(p_name, ' ')) AS w FROM part)
         WHERE length(w) > 0)
         SELECT a.w AS w1, b.w AS w2,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
         FROM vocab a JOIN vocab b
           ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
         WHERE levenshtein(a.w, b.w) <= 2""",

    "q385_lcp_join" ->
      """WITH ids AS (SELECT s_name AS w, substr(s_name, 1, 17) AS blk
           FROM supplier)
         SELECT a.w AS w1, b.w AS w2,
           CAST(len(list_filter(range(1, least(length(a.w), length(b.w)) + 1),
             i -> substr(a.w, 1, CAST(i AS INT)) = substr(b.w, 1, CAST(i AS INT))))
             AS BIGINT) AS lcp
         FROM ids a JOIN ids b ON a.blk = b.blk AND a.w < b.w
         WHERE len(list_filter(range(1, least(length(a.w), length(b.w)) + 1),
           i -> substr(a.w, 1, CAST(i AS INT)) = substr(b.w, 1, CAST(i AS INT)))) >= 17""",

    "q370_qgram_profile_join" ->
      """WITH vocab AS (SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w
           FROM part),
         v2 AS (SELECT w FROM vocab WHERE length(w) > 1),
         grams AS (SELECT w, substr(w, CAST(i AS INT), 2) AS g,
             CAST(count(*) AS BIGINT) AS c
           FROM v2 CROSS JOIN (SELECT unnest(range(1, 64)) AS i)
           WHERE i <= length(w) - 1
           GROUP BY 1, 2),
         shared AS (SELECT a.w AS w1, b.w AS w2,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS shared
           FROM grams a JOIN grams b ON a.g = b.g AND a.w < b.w
           GROUP BY 1, 2)
         SELECT w1, w2,
           CAST(length(w1) - 1 + length(w2) - 1 - 2 * shared AS BIGINT)
             AS l1_dist
         FROM shared
         WHERE length(w1) - 1 + length(w2) - 1 - 2 * shared <= 4""",
  )
}
