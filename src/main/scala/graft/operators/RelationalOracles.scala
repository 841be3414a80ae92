package graft.operators

/** DuckDB oracle SQL for every [[Relational]] gate key — the driver's
  * correctness contract (one ANSI-SQL twin per `q_*` entry in
  * [[Relational.queries]]). Split out of Relational.scala in r17 (the
  * r16 verdict #7 size watch): the operator kernels and the replay SQL
  * are separate concerns, and the registry file had crossed ~3.8k lines.
  * Pure data, no logic — consumed by [[graft.SparkEntry.oracleSql]].
  */
object RelationalOracles {

  val oracles: Map[String, String] = Map(
    "q_active_days" ->
      """WITH uw AS (
        | SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        | FROM events),
        |per AS (SELECT user_id, count(*) AS active_days FROM uw
        |        GROUP BY user_id)
        |SELECT active_days, count(*) AS n_users FROM per
        |GROUP BY active_days""".stripMargin,
    "q_churn" ->
      """WITH uw AS (
        | SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week
        | FROM events),
        |act AS (SELECT week, count(*) AS n_active FROM uw GROUP BY week),
        |ch AS (
        | SELECT a.week, count(*) AS n_churned
        | FROM uw a LEFT JOIN uw b
        |   ON a.user_id = b.user_id AND b.week = a.week + 1
        | WHERE b.user_id IS NULL GROUP BY a.week),
        |mx AS (SELECT max(week) AS max_week FROM uw)
        |SELECT act.week, n_active,
        | CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned,
        | round(CAST(coalesce(n_churned, 0) AS DOUBLE) / n_active, 6)
        |   AS churn_rate
        |FROM act LEFT JOIN ch ON act.week = ch.week CROSS JOIN mx
        |WHERE act.week < max_week""".stripMargin,
    "q_benford" ->
      """WITH dg AS (
        | SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |   AS VARCHAR), 1, 1) AS INTEGER) AS digit
        | FROM orders),
        |cnt AS (SELECT digit, count(*) AS n FROM dg
        |        WHERE digit >= 1 GROUP BY digit),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
        |SELECT digit, n, total,
        | round(CAST(n AS DOUBLE) / total, 6) AS observed,
        | round(log10(1.0 + 1.0 / digit), 6) AS benford
        |FROM cnt CROSS JOIN tot""".stripMargin,
    // the definitional O(n²) dominance replay over the customer-sized
    // aggregate — the window rewrite must select the identical frontier
    "q_skyline" ->
      """WITH per AS (
        | SELECT o_custkey, count(*) AS n_orders,
        |  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend_d
        | FROM orders GROUP BY 1)
        |SELECT p.o_custkey, p.n_orders,
        | CAST(round(p.spend_d, 2) AS DOUBLE) AS spend
        |FROM per p WHERE NOT EXISTS (
        | SELECT 1 FROM per q
        | WHERE q.n_orders >= p.n_orders AND q.spend_d >= p.spend_d
        |   AND (q.n_orders > p.n_orders OR q.spend_d > p.spend_d))""".stripMargin,
    "q_stickiness" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |uw AS (
        | SELECT DISTINCT user_id, day + g.i AS mday
        | FROM ud CROSS JOIN (SELECT unnest(range(28)) AS i) g),
        |mau AS (SELECT mday, count(*) AS mau FROM uw GROUP BY mday)
        |SELECT day, dau, mau,
        | round(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
        |FROM dau JOIN mau ON day = mday""".stripMargin,
    "q_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |   - p_retailprice * l_quantity * 0.6 AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, yr""".stripMargin,
    "q_excess_share" ->
      """WITH per AS (
        | SELECT l_suppkey,
        |  sum(CAST(CASE WHEN p_name LIKE 'red%' THEN l_quantity
        |           ELSE 0.0 END AS DECIMAL(18,4))) AS red_q,
        |  sum(CAST(l_quantity AS DECIMAL(18,4))) AS tot_q
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY l_suppkey)
        |SELECT s_name, n_name,
        | CAST(red_q AS DOUBLE) AS red_qty, CAST(tot_q AS DOUBLE) AS total_qty
        |FROM per
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE red_q * 8 > tot_q""".stripMargin,
    "q_running_distinct" ->
      """WITH f AS (
        | SELECT event_type, user_id, min(epoch_ms(ts) // 86400000) AS first_day
        | FROM events GROUP BY event_type, user_id),
        |p AS (SELECT event_type, first_day, count(*) AS new_users
        |      FROM f GROUP BY event_type, first_day)
        |SELECT event_type, first_day AS day, new_users,
        | CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY first_day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM p""".stripMargin,
    "q_discount_lift" ->
      """WITH b AS (
        | SELECT CAST(floor(l_discount * 100 + 0.5) AS INTEGER) AS discount_pct,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*) AS avg_qty
        | FROM lineitem GROUP BY 1),
        |base AS (SELECT avg_qty AS base_qty FROM b WHERE discount_pct = 0)
        |SELECT discount_pct, n_lines, avg_qty,
        | avg_qty / base_qty AS qty_lift
        |FROM b CROSS JOIN base""".stripMargin,
    "q_seasonal_index" ->
      """WITH per AS (
        | SELECT event_type,
        |  ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, sum(n) AS t FROM per GROUP BY 1)
        |SELECT per.event_type, CAST(dow AS BIGINT) AS dow, n,
        | CAST(n AS DOUBLE) * 7 / t AS seasonal_index
        |FROM per JOIN tot ON per.event_type = tot.event_type""".stripMargin,
    "q_weighted_median" ->
      """WITH r AS (
        | SELECT p_brand,
        |  l_extendedprice / l_quantity AS unit_price,
        |  sum(CAST(l_quantity AS DECIMAL(18,4))) AS w
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY 1, 2),
        |c AS (
        | SELECT *, sum(w) OVER (PARTITION BY p_brand ORDER BY unit_price
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(w) OVER (PARTITION BY p_brand) AS total_w
        | FROM r)
        |SELECT p_brand,
        | min(unit_price) AS weighted_median_price,
        | CAST(max(total_w) AS DOUBLE) AS total_qty
        |FROM c WHERE cum * 2 >= total_w GROUP BY 1""".stripMargin,
    // the PARQUET source: every row/char/lang must survive each format
    "q_io_roundtrip" ->
      """WITH a AS (
        | SELECT count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(strlen(text)) AS BIGINT) AS text_chars
        | FROM documents)
        |SELECT f.format, n_rows, total_chars, n_langs, text_chars
        |FROM a CROSS JOIN
        | (SELECT unnest(['csv','json','orc']) AS format) f""".stripMargin,
    // the PLAIN table: clustering must be semantically invisible
    "q_zorder_scan" ->
      """SELECT count(*) AS n_lines,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
        |   AS DOUBLE) AS box_revenue
        |FROM lineitem
        |WHERE l_partkey BETWEEN 50 AND 150
        |  AND l_suppkey BETWEEN 2 AND 8""".stripMargin,
    "q_priority_mix_shift" ->
      """WITH per AS (
        | SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
        |  count(*) AS n
        | FROM orders GROUP BY 1, 2),
        |tot AS (SELECT month, sum(n) AS mtot FROM per GROUP BY 1),
        |sh AS (
        | SELECT per.month, o_orderpriority, n,
        |  CAST(n AS DOUBLE) / mtot AS share
        | FROM per JOIN tot ON per.month = tot.month)
        |SELECT month, o_orderpriority, n, share,
        | share - lag(share) OVER (PARTITION BY o_orderpriority
        |   ORDER BY month) AS share_delta
        |FROM sh""".stripMargin,
    // the PLAIN join: salting must be semantically invisible
    "q_skew_join" ->
      """SELECT s_name, count(*) AS n_lines,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin,
    // generation 1 (doc_id < 250) lacks lang → NULL through the merged
    // read; the oracle rebuilds the same generation split
    "q_schema_evolution" ->
      """SELECT CASE WHEN doc_id < 250 THEN NULL ELSE lang END AS lang,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY 1""".stripMargin,
    // the KNOWN drift as constants (footer-only diff, no data scan)
    "q_schema_drift" ->
      """SELECT * FROM (VALUES
        | ('quality', 'added', NULL, 'BOOLEAN'),
        | ('source', 'removed', 'STRING', NULL),
        | ('n_chars', 'type_changed', 'BIGINT', 'DOUBLE')
        |) AS t(column_name, change, old_type, new_type)""".stripMargin,
    // the line-format round trip must preserve every byte: distinct
    // content-hash ids == distinct texts, total chars == source table
    "q_text_ingest" ->
      """SELECT count(*) AS n_lines,
        | count(DISTINCT text) AS n_distinct_ids,
        | count(DISTINCT md5(text)) AS n_distinct_texts,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents""".stripMargin,
    // compaction must be semantically invisible: the oracle aggregates
    // the ORIGINAL parquet
    "q_compaction" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | count(DISTINCT md5(text)) AS n_distinct_texts
        |FROM documents GROUP BY lang""".stripMargin,
    // the bucketed layout must be semantically invisible: the oracle is
    // the PLAIN parquet join
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,
    "q_session_durations" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |flagged AS (
        | SELECT *, CASE WHEN ms - lag(ms) OVER w > 1800000 OR
        |   lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (
        | SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |   ORDER BY ms, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        | FROM flagged),
        |per AS (
        | SELECT user_id, session_seq, count(*) AS n_events,
        |  max(ms) - min(ms) AS duration_ms
        | FROM sess GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        | quantile_cont(duration_ms, 0.5) AS p50_duration_ms,
        | quantile_cont(duration_ms, 0.9) AS p90_duration_ms,
        | quantile_cont(duration_ms, 0.99) AS p99_duration_ms,
        | quantile_cont(n_events, 0.5) AS p50_events,
        | quantile_cont(n_events, 0.9) AS p90_events
        |FROM per""".stripMargin,
    "q_supplier_hhi" ->
      """WITH rev AS (
        | SELECT p_type, l_suppkey,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS r
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY 1, 2)
        |SELECT p_type, count(*) AS n_suppliers,
        | CAST(round(sum(r), 2) AS DOUBLE) AS total_revenue,
        | round(CAST(sum(r * r) AS DOUBLE)
        |   / (CAST(sum(r) AS DOUBLE) * CAST(sum(r) AS DOUBLE)), 9) AS hhi
        |FROM rev GROUP BY 1""".stripMargin,
    "q_trade_balance" ->
      """WITH ex AS (
        | SELECT s_nationkey AS nk,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS export_rev
        | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | GROUP BY 1),
        |im AS (
        | SELECT c_nationkey AS nk,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS import_rev
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1)
        |SELECT n_nationkey, n_name,
        | coalesce(export_rev, 0.0) AS export_rev,
        | coalesce(import_rev, 0.0) AS import_rev,
        | coalesce(export_rev, 0.0) - coalesce(import_rev, 0.0) AS balance
        |FROM nation
        |LEFT JOIN ex ON n_nationkey = ex.nk
        |LEFT JOIN im ON n_nationkey = im.nk""".stripMargin,
    "q_ewma" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |j AS (
        | SELECT a.event_type, a.day, a.n,
        |  CAST(b.n * power(0.5, a.day - b.day) AS DECIMAL(28,12)) AS term,
        |  CAST(power(0.5, a.day - b.day) AS DECIMAL(28,12)) AS w
        | FROM daily a JOIN daily b ON a.event_type = b.event_type
        |  AND b.day BETWEEN a.day - 6 AND a.day)
        |SELECT event_type, day, n,
        | CAST(sum(term) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS ewma
        |FROM j GROUP BY 1, 2, 3""".stripMargin,
    "q_user_entropy" ->
      """WITH c AS (
        | SELECT user_id, event_type, count(*) AS c
        | FROM events GROUP BY 1, 2),
        |t AS (
        | SELECT user_id, c,
        |  CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,12)) AS clc
        | FROM c)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        | count(*) AS n_types,
        | round(ln(CAST(sum(c) AS DOUBLE))
        |   - CAST(sum(clc) AS DOUBLE) / sum(c), 4) AS entropy
        |FROM t GROUP BY 1""".stripMargin,
    "q_late_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND epoch_ms(l_shipdate) // 86400000
        |        - epoch_ms(o_orderdate) // 86400000 > 30)
        |GROUP BY 1""".stripMargin,
    "q_cust_order_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY 1)
        |GROUP BY 1""".stripMargin,
    "q_disjunctive_revenue" ->
      """SELECT count(*) AS n_lines,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand IN ('Brand#11','Brand#12') AND p_size <= 15
        |        AND l_quantity <= 15)
        |   OR (p_brand IN ('Brand#22','Brand#23') AND p_size <= 25
        |        AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand IN ('Brand#33','Brand#34') AND p_size <= 35
        |        AND l_quantity >= 25)""".stripMargin,
    "q_waiting_suppliers" ->
      """WITH late AS (
        | SELECT DISTINCT l_orderkey, l_suppkey
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE epoch_ms(l_shipdate) // 86400000
        |   - epoch_ms(o_orderdate) // 86400000 > 60),
        |lc AS (SELECT l_orderkey, count(*) AS n_late FROM late GROUP BY 1),
        |multi AS (SELECT l_orderkey FROM lineitem GROUP BY 1
        |  HAVING count(DISTINCT l_suppkey) >= 2)
        |SELECT s_name, count(*) AS numwait
        |FROM late JOIN lc USING (l_orderkey) JOIN multi USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE n_late = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_gini" ->
      """WITH rev AS (
        | SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
        | FROM lineitem GROUP BY 1),
        |r AS (
        | SELECT rev, row_number() OVER (ORDER BY rev, l_partkey) AS i
        | FROM rev),
        |a AS (SELECT count(*) AS n, sum(rev) AS s, sum(rev * i) AS s1 FROM r)
        |SELECT n AS n_parts, CAST(round(s, 2) AS DOUBLE) AS total_revenue,
        | CAST(2 * s1 - (n + 1) * s AS DOUBLE) / CAST(n * s AS DOUBLE) AS gini
        |FROM a""".stripMargin,
    "q_centered_ma" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS n
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        | CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w AS ma7
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |  RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin,
    "q_forecast_revenue" ->
      """SELECT count(*) AS n_lines,
        | CAST(round(sum(CAST(l_extendedprice * l_discount
        |   AS DECIMAL(18,4))), 2) AS DOUBLE) AS forecast_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_trade_flows" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND s_nationkey < 13 AND c_nationkey < 13
        |  AND s_nationkey != c_nationkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_promo_share" ->
      """WITH m AS (
        | SELECT p_type,
        |  CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |   AND l_shipdate < TIMESTAMP '1997-04-01')
        |SELECT
        | CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |   ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS promo_revenue,
        | CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue,
        | CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100
        |  / CAST(sum(rev) AS DOUBLE) AS promo_pct
        |FROM m""".stripMargin,
    "q_ship_latency" ->
      """WITH l AS (
        | SELECT o_orderpriority,
        |  epoch_ms(l_shipdate) // 86400000
        |   - epoch_ms(o_orderdate) // 86400000 AS lat
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, count(*) AS n_lines,
        | quantile_cont(lat, 0.5) AS p50_days,
        | quantile_cont(lat, 0.9) AS p90_days,
        | quantile_cont(lat, 0.99) AS p99_days
        |FROM l GROUP BY 1""".stripMargin,
    "q_min_cost_supplier" ->
      """WITH parts AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15),
        |u AS (
        | SELECT p_partkey, p_name, l_suppkey,
        |  min(CAST(l_extendedprice / l_quantity AS DECIMAL(18,6))) AS cost
        | FROM lineitem JOIN parts ON l_partkey = p_partkey
        | GROUP BY 1, 2, 3),
        |r AS (
        | SELECT *, row_number() OVER (
        |   PARTITION BY p_partkey ORDER BY cost, l_suppkey) AS rn FROM u)
        |SELECT p_partkey, p_name, s_name, n_name, CAST(cost AS DOUBLE) AS cost
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE rn = 1""".stripMargin,
    "q_important_parts" ->
      """WITH v AS (
        | SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS value
        | FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(value) AS total, count(*) AS np FROM v)
        |SELECT l_partkey AS p_partkey,
        | CAST(round(value, 2) AS DOUBLE) AS value
        |FROM v, t WHERE value * np * 2 > total * 3""".stripMargin,
    "q_top_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS total_revenue
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-04-01'
        | GROUP BY 1),
        |mx AS (SELECT max(total_revenue) AS mx FROM rev)
        |SELECT s_suppkey, s_name,
        | CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT mx FROM mx)""".stripMargin,
    "q_part_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_small_qty_revenue" ->
      """WITH a AS (
        | SELECT l_partkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(l_quantity) AS avg_qty
        | FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_small_lines,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |   AS total_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |   / 7.0 AS avg_yearly
        |FROM lineitem JOIN a USING (l_partkey)
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q_large_orders" ->
      """WITH oq AS (
        | SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        | FROM lineitem GROUP BY 1
        | HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
        | CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM oq JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_idle_customers" ->
      """WITH ab AS (
        | SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |   / count(*) AS ab
        | FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        | CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
        |   AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > ab.ab
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1""".stripMargin,
    "q_rfm" ->
      """WITH per AS (
        | SELECT o_custkey, max(epoch_ms(o_orderdate) // 86400000) AS last_day,
        |  count(*) AS frequency,
        |  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
        | FROM orders GROUP BY 1),
        |r AS (SELECT max(last_day) AS ref_day FROM per),
        |b AS (
        | SELECT o_custkey, ref_day - last_day AS recency_days, frequency,
        |  monetary FROM per, r),
        |q AS (
        | SELECT *,
        |  ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_q,
        |  ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
        |  ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
        | FROM b)
        |SELECT o_custkey AS c_custkey, recency_days, frequency,
        | CAST(round(monetary, 2) AS DOUBLE) AS monetary, r_q, f_q, m_q,
        | CAST(r_q AS VARCHAR) || '-' || CAST(f_q AS VARCHAR) || '-'
        |   || CAST(m_q AS VARCHAR) AS segment
        |FROM q""".stripMargin,
    "q_abc_analysis" ->
      """WITH rev AS (
        | SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
        | FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(rev) AS total FROM rev),
        |c AS (
        | SELECT rev, total,
        |  sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |    ROWS UNBOUNDED PRECEDING) AS cum
        | FROM rev, t)
        |SELECT CASE WHEN cum * 10 <= total * 7 THEN 'A'
        |  WHEN cum * 10 <= total * 9 THEN 'B' ELSE 'C' END AS cls,
        | count(*) AS n_parts,
        | CAST(round(sum(rev), 2) AS DOUBLE) AS class_revenue
        |FROM c GROUP BY 1""".stripMargin,
    "q_event_gaps" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
        |g AS (
        | SELECT event_type, ms - lag(ms) OVER (
        |   PARTITION BY user_id, event_type ORDER BY ms, event_id) AS gap
        | FROM e)
        |SELECT event_type, count(*) AS n_gaps,
        | quantile_cont(gap, 0.5) AS p50_ms,
        | quantile_cont(gap, 0.9) AS p90_ms
        |FROM g WHERE gap IS NOT NULL GROUP BY 1""".stripMargin,
    // The oracle RECOMPUTES the rollup from the raw stream — the
    // hash-match against the engine's base+delta merge is the proof that
    // incremental merge ≡ full recompute.
    "q_rollup_merge" ->
      """SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        | count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |   AS sum_value,
        | CAST(round(max(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |   AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_volume_trend" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |a AS (
        | SELECT event_type, count(*) AS n_days,
        |  CAST(sum(day) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sy,
        |  CAST(sum(day * n) AS BIGINT) AS sxy,
        |  CAST(sum(day * day) AS BIGINT) AS sxx
        | FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sy AS total,
        | CAST(n_days * sxy - sx * sy AS DOUBLE)
        |   / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope_per_day
        |FROM a""".stripMargin,
    "q_hourly_profile" ->
      """WITH h AS (
        | SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hour,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |a AS (
        | SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
        |  CAST(sum(n * n) AS BIGINT) AS sum_sq,
        |  CAST(max(n) AS BIGINT) AS peak_n
        | FROM h GROUP BY 1),
        |pk AS (
        | SELECT h.event_type, min(hour) AS peak_hour
        | FROM h JOIN a ON h.event_type = a.event_type AND h.n = a.peak_n
        | GROUP BY 1)
        |SELECT a.event_type, total, peak_hour, peak_n,
        | CAST(24 * sum_sq - total * total AS DOUBLE) / total AS chi2
        |FROM a JOIN pk ON a.event_type = pk.event_type""".stripMargin,
    "q_join_explosion" ->
      """WITH l AS (SELECT o_orderkey AS k, count(*) AS cl
        |  FROM orders GROUP BY 1),
        |r AS (SELECT l_orderkey AS k, count(*) AS cr
        |  FROM lineitem GROUP BY 1),
        |f AS (SELECT COALESCE(cl, 0) AS cl, COALESCE(cr, 0) AS cr
        |  FROM l FULL OUTER JOIN r ON l.k = r.k)
        |SELECT count(*) AS n_keys,
        | CAST(sum(CASE WHEN cl > 0 AND cr > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_keys_both,
        | CAST(max(cl) AS BIGINT) AS max_fanout_left,
        | CAST(max(cr) AS BIGINT) AS max_fanout_right,
        | CAST(sum(cl * cr) AS BIGINT) AS est_join_rows,
        | CAST(sum(CASE WHEN cr = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_orphan_left,
        | CAST(sum(CASE WHEN cl = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_orphan_right
        |FROM f""".stripMargin,
    "q_attribution" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
        |fp AS (
        | SELECT user_id, min(ms) AS p_ms, count(*) AS n_purchases
        | FROM e WHERE event_type = 'purchase' GROUP BY 1),
        |ft AS (
        | SELECT user_id, event_type AS first_touch FROM (
        |  SELECT user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ms, event_id) AS rn FROM e)
        | WHERE rn = 1),
        |lt AS (
        | SELECT user_id, event_type AS last_touch FROM (
        |  SELECT e.user_id, e.event_type, row_number() OVER (
        |    PARTITION BY e.user_id ORDER BY e.ms DESC, e.event_id DESC) AS rn
        |  FROM e JOIN fp ON e.user_id = fp.user_id WHERE e.ms < fp.p_ms)
        | WHERE rn = 1)
        |SELECT fp.user_id, first_touch,
        | COALESCE(last_touch, 'direct') AS last_touch, n_purchases
        |FROM fp JOIN ft ON fp.user_id = ft.user_id
        |LEFT JOIN lt ON fp.user_id = lt.user_id""".stripMargin,
    "q_funnel_ttc" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |t1 AS (SELECT user_id, min(ms) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(ms) AS t2, min(t1.t1) AS t1m
        |  FROM e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE event_type = 'view' AND ms > t1.t1 AND ms <= t1.t1 + 86400000
        |  GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(ms) AS t3, min(t2.t1m) AS t1f
        |  FROM e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE event_type = 'purchase' AND ms > t2.t2 AND ms <= t2.t2 + 86400000
        |  GROUP BY 1)
        |SELECT count(*) AS n_converted,
        | quantile_cont(t3 - t1f, 0.25) AS p25_ms,
        | quantile_cont(t3 - t1f, 0.5) AS p50_ms,
        | quantile_cont(t3 - t1f, 0.75) AS p75_ms,
        | quantile_cont(t3 - t1f, 0.9) AS p90_ms
        |FROM t3""".stripMargin,
    "q_streaks" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |i AS (
        | SELECT user_id, day,
        |  day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        | FROM ud),
        |st AS (
        | SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks
        |FROM st GROUP BY user_id""".stripMargin,
    "q_returned_revenue" ->
      """WITH rev AS (
        | SELECT o_custkey,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_returnflag = 'R'
        | GROUP BY o_custkey)
        |SELECT c_custkey, c_name, n_name, revenue
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_wau" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |uw AS (
        | SELECT DISTINCT user_id, day + g.i AS wday
        | FROM ud CROSS JOIN (SELECT unnest(range(7)) AS i) g)
        |SELECT wday, count(*) AS wau FROM uw GROUP BY wday""".stripMargin,
    "q_transitions" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
        |pairs AS (
        | SELECT lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id) AS from_type,
        |  event_type AS to_type
        | FROM e),
        |cnt AS (
        | SELECT from_type, to_type, count(*) AS n FROM pairs
        | WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        | SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        | FROM cnt GROUP BY 1)
        |SELECT cnt.from_type, to_type, n, n * 1.0 / row_total AS p
        |FROM cnt JOIN tot ON cnt.from_type = tot.from_type""".stripMargin,
    "q_event_paths" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
        |tri AS (
        | SELECT event_type AS t0,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS t1,
        |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS t2
        | FROM e)
        |SELECT concat_ws('>', t0, t1, t2) AS path, count(*) AS n
        |FROM tri WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q_in_transit" ->
      """WITH iv AS (
        | SELECT o_orderdate, l_shipdate
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deltas AS (
        | SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM (
        |  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT CAST(l_shipdate AS DATE) + 1 AS day, -1 AS delta FROM iv)
        | GROUP BY day)
        |SELECT day, net,
        | CAST(sum(net) OVER (ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS pending
        |FROM deltas""".stripMargin,
    "q_key_skew" ->
      """WITH pk AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        |SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS total,
        | max(n) AS max_n,
        | quantile_cont(n, 0.5) AS p50_n,
        | quantile_cont(n, 0.99) AS p99_n,
        | max(n) * 1.0 / CAST(sum(n) AS BIGINT) AS max_share
        |FROM pk""".stripMargin,
    "q_rolling_7d" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ms,
        | count(*) OVER w AS n_7d,
        | CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE)
        |   AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |  RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_gdpr_erase" ->
      """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |od AS (SELECT o_orderkey FROM orders
        |       WHERE o_custkey IN (SELECT c_custkey FROM del))
        |SELECT 'customer' AS table_name,
        | (SELECT count(*) FROM customer) AS rows_before,
        | (SELECT count(*) FROM del) AS rows_deleted,
        | (SELECT count(*) FROM customer) - (SELECT count(*) FROM del) AS rows_after
        |UNION ALL
        |SELECT 'orders',
        | (SELECT count(*) FROM orders),
        | (SELECT count(*) FROM od),
        | (SELECT count(*) FROM orders) - (SELECT count(*) FROM od)
        |UNION ALL
        |SELECT 'lineitem',
        | (SELECT count(*) FROM lineitem),
        | (SELECT count(*) FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM od)),
        | (SELECT count(*) FROM lineitem)
        |   - (SELECT count(*) FROM lineitem
        |      WHERE l_orderkey IN (SELECT o_orderkey FROM od))""".stripMargin,
    "q_scd2" ->
      """WITH v AS (
        | SELECT doc_id, n_chars,
        |  unnest(generate_series(1, 1 + doc_id % 4)) AS version
        | FROM documents)
        |SELECT doc_id, version, n_chars + version AS val,
        | version * 1000 AS valid_from,
        | lead(version) OVER w * 1000 AS valid_to,
        | lead(version) OVER w IS NULL AS is_current
        |FROM v WINDOW w AS (PARTITION BY doc_id ORDER BY version)""".stripMargin,
    "q_debounce" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |l AS (
        | SELECT *, ms - lag(ms) OVER (PARTITION BY user_id, event_type
        |   ORDER BY ms, event_id) AS gap
        | FROM e)
        |SELECT event_id, user_id, event_type, ms
        |FROM l WHERE gap IS NULL OR gap > 3600000""".stripMargin,
    "q_outliers" ->
      """WITH s AS (
        | SELECT event_type AS et, CAST(count(*) AS DOUBLE) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(sum(CAST(value * value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxx
        | FROM events GROUP BY 1),
        |st AS (
        | SELECT et, sx / n AS mean,
        |  sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS sd
        | FROM s)
        |SELECT event_id, event_type, value, (value - mean) / sd AS z
        |FROM events JOIN st ON event_type = st.et
        |WHERE abs((value - mean) / sd) > 3.0""".stripMargin,
    "q_cooccurrence" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |flagged AS (
        | SELECT *, CASE WHEN ms - lag(ms) OVER w > 1800000 OR
        |   lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (
        | SELECT DISTINCT user_id, session_seq, event_type FROM (
        |  SELECT user_id, event_type, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)),
        |tot AS (SELECT event_type, count(*) AS n_t FROM sess GROUP BY 1),
        |ns AS (SELECT count(*) AS n_sess FROM
        |  (SELECT DISTINCT user_id, session_seq FROM sess))
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        | count(*) AS n_ab,
        | (count(*) * n_sess) * 1.0 / (ta.n_t * tb.n_t) AS lift
        |FROM sess a
        |JOIN sess b ON a.user_id = b.user_id AND a.session_seq = b.session_seq
        |  AND a.event_type < b.event_type
        |JOIN tot ta ON ta.event_type = a.event_type
        |JOIN tot tb ON tb.event_type = b.event_type
        |CROSS JOIN ns
        |GROUP BY a.event_type, b.event_type, ta.n_t, tb.n_t, n_sess""".stripMargin,
    "q_version_topn" ->
      """WITH v AS (
        | SELECT doc_id, n_chars,
        |  unnest(generate_series(1, 1 + doc_id % 4)) AS version
        | FROM documents),
        |m AS (SELECT doc_id, max(version) AS mv FROM v GROUP BY 1)
        |SELECT v.doc_id, CAST(v.version AS INTEGER) AS version,
        | v.n_chars + v.version AS val
        |FROM v JOIN m ON v.doc_id = m.doc_id
        |WHERE v.version > m.mv - 3""".stripMargin,
    "q_mom_trend" ->
      """WITH m AS (
        | SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        | FROM orders GROUP BY 1)
        |SELECT month, revenue,
        | lag(revenue) OVER (ORDER BY month) AS prev_revenue,
        | (revenue - lag(revenue) OVER (ORDER BY month)) * 100.0
        |   / lag(revenue) OVER (ORDER BY month) AS pct_change
        |FROM m""".stripMargin,
    "q_above_avg_spenders" ->
      """WITH spend AS (
        | SELECT o_custkey,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_spend
        | FROM orders GROUP BY 1),
        |pc AS (
        | SELECT o_custkey, c_nationkey, total_spend
        | FROM spend JOIN customer ON o_custkey = c_custkey),
        |na AS (
        | SELECT c_nationkey,
        |  CAST(CAST(sum(CAST(total_spend AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |    / count(total_spend) AS nation_avg
        | FROM pc GROUP BY 1)
        |SELECT o_custkey AS custkey, pc.c_nationkey AS nationkey,
        | total_spend, nation_avg
        |FROM pc JOIN na ON pc.c_nationkey = na.c_nationkey
        |WHERE total_spend > nation_avg * 1.5""".stripMargin,
    "q_upsert" ->
      """WITH u AS (
        | SELECT doc_id, source, text, CAST(1 AS BIGINT) AS version FROM documents
        | UNION ALL
        | SELECT doc_id, 'patch', upper(text), CAST(2 AS BIGINT)
        | FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, max(version) AS version,
        | arg_max(source, version) AS source,
        | arg_max(text, version) AS text
        |FROM u GROUP BY doc_id""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderkey,
        | CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
        |FROM orders""".stripMargin,
    "q_ntile_threshold" ->
      """WITH v AS (
        | SELECT l_orderkey, l_linenumber,
        |  CAST(l_extendedprice AS DECIMAL(18,2)) AS v FROM lineitem),
        |hist AS (SELECT v, count(*) AS c FROM v GROUP BY v),
        |cum AS (SELECT v, sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hist),
        |tot AS (SELECT count(*) AS n FROM v),
        |thr AS (SELECT
        |  min(CASE WHEN 4 * cum >= 1 * n THEN v END) AS t1,
        |  min(CASE WHEN 4 * cum >= 2 * n THEN v END) AS t2,
        |  min(CASE WHEN 4 * cum >= 3 * n THEN v END) AS t3
        | FROM cum, tot)
        |SELECT l_orderkey, l_linenumber,
        | CAST(1 + (CASE WHEN v > t1 THEN 1 ELSE 0 END)
        |        + (CASE WHEN v > t2 THEN 1 ELSE 0 END)
        |        + (CASE WHEN v > t3 THEN 1 ELSE 0 END) AS INTEGER) AS quartile
        |FROM v, thr""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    // Each decimal sum detours through VARCHAR before the DOUBLE cast:
    // DuckDB's direct DECIMAL→DOUBLE converts int128→double and THEN
    // divides by 10^scale — two roundings, which misrounds once the scaled
    // integer sum exceeds 2^53 (price² sums do). strtod on the exact
    // decimal string is correctly rounded, matching Spark's
    // BigDecimal.doubleValue bit for bit (found as a last-ulp corr
    // mismatch at sf0.001 only; larger SFs had not landed near a boundary).
    "q_stats" ->
      """WITH m AS (
        | SELECT l_returnflag,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sq,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sp,
        |  CAST(CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sd,
        |  CAST(CAST(sum(CAST(l_tax AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS st,
        |  CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sqq,
        |  CAST(CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS spp,
        |  CAST(CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sdd,
        |  CAST(CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sqp,
        |  CAST(CAST(sum(CAST(l_quantity * l_tax AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sqt
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | (n * sqp - sq * sp) / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))
        |   AS qty_price_corr,
        | sqrt((n * sdd - sd * sd) / (n * (n - 1))) AS disc_sd,
        | (n * sqt - sq * st) / (n * (n - 1)) AS qty_tax_cov
        |FROM m""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q_normalize" ->
      """SELECT doc_id,
        | regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS norm,
        | CAST(len(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '))
        |   AS INTEGER) AS n_norm_tokens
        |FROM documents""".stripMargin,
    "q_outer_join" ->
      """SELECT o_orderkey,
        | coalesce(CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))), 2) AS DOUBLE), 0.0) AS revenue,
        | count(l_linenumber) AS n_items
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        | round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta_prev,
        | CAST(date_diff('day', o_orderdate, lead(o_orderdate, 1) OVER w) AS INTEGER)
        |   AS days_to_next
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) t WHERE rnk <= 3""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount) AS avg_disc,
        | count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.25) / 100 AS p25,
        | quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5) / 100 AS p50,
        | quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.75) / 100 AS p75
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // Invariant oracle: the exact quartiles are the q_percentile arithmetic
    // (cents-exact, bitwise-matched); approx_ok asserts the sketch's 1%
    // bound held (see approxPercentiles).
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.25) / 100 AS p25,
        | quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5) / 100 AS p50,
        | quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.75) / 100 AS p75,
        | true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // Invariant oracle: per-row ULID contract — length, Crockford charset,
    // global uniqueness (see ulidAssign).
    "q_ulid" ->
      """SELECT doc_id, CAST(26 AS INTEGER) AS ulid_len,
        | true AS charset_ok, true AS unique_ok
        |FROM documents""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        | CAST(round(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(18,4))), 2) AS DOUBLE) AS "O",
        | CAST(round(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,4))), 2) AS DOUBLE) AS "F",
        | CAST(round(sum(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS DECIMAL(18,4))), 2) AS DOUBLE) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_point_lookup" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey = 42",
    "q_select_eq" ->
      "SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en'",
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_local_supplier" ->
      """SELECT n_name,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_anti_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        | FROM orders) t WHERE rnk <= 3""".stripMargin,
    "q_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS run_total
        |FROM orders""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_suppkey) AS supp_cnt,
        | count(DISTINCT l_partkey) AS part_cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_case_agg" ->
      """SELECT l_returnflag,
        | CAST(round(sum(CAST(CASE WHEN l_discount > 0.05
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))), 2) AS DOUBLE) AS disc_rev,
        | count(CASE WHEN l_quantity > 30 THEN 1 END) AS big_cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_date_bucket" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        | count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey, upper(substring(p_name, 1, 5)) AS name5,
        | concat(p_brand, '#', p_type) AS brand_type,
        | CAST(length(p_name) AS INTEGER) AS name_len
        |FROM part WHERE p_name LIKE '%r%'""".stripMargin,
    "q_union" ->
      """SELECT c_name AS name, 'customer' AS side FROM customer
        |UNION
        |SELECT s_name AS name, 'supplier' AS side FROM supplier""".stripMargin,
    "q_set_ops" ->
      """WITH b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |m AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |SELECT c_nationkey, 'only_building' AS src FROM (SELECT c_nationkey FROM b EXCEPT SELECT c_nationkey FROM m)
        |UNION ALL
        |SELECT c_nationkey, 'both' AS src FROM (SELECT c_nationkey FROM b INTERSECT SELECT c_nationkey FROM m)""".stripMargin,
    "q_market_share" ->
      """WITH rev AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, n_name,
        |    l_extendedprice * (1 - l_discount) AS vol
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |agg AS (
        |  SELECT o_year,
        |    CAST(round(sum(CAST(vol AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_rev,
        |    CAST(round(sum(CAST(CASE WHEN n_name = 'NATION_7' THEN vol ELSE 0 END
        |      AS DECIMAL(18,4))), 2) AS DOUBLE) AS nation_rev
        |  FROM rev GROUP BY 1)
        |SELECT o_year, total_rev, nation_rev, nation_rev / total_rev AS share
        |FROM agg""".stripMargin,
    "q_hopping" ->
      """SELECT ((epoch_ms(ts) // 900000) - i) * 900000 AS window_start_ms,
        | event_type, count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |   AS total_value
        |FROM events CROSS JOIN (SELECT unnest(range(4)) AS i)
        |GROUP BY 1, 2""".stripMargin,
    "q_range_join" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
        |  FROM orders)
        |SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
        |  CAST(abs(a.day - b.day) AS BIGINT) AS gap_days
        |FROM o a JOIN o b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderkey < b.o_orderkey
        |  AND abs(a.day - b.day) <= 30""".stripMargin,
    "q_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, (SELECT count(*) FROM orders) AS n_rows,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           | count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    "q_integrity" ->
      """SELECT 'orders_pk_dup' AS check_name,
        |  count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
        |UNION ALL
        |SELECT 'orders_null_custkey',
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |UNION ALL
        |SELECT 'orders_orphan_custkey', count(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'orders_childless', count(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                    WHERE l.l_orderkey = o.o_orderkey)
        |UNION ALL
        |SELECT 'lineitem_orphan', count(*) FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey)""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |t1 AS (SELECT user_id, min(ms) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'view'
        |         AND ms > t1 AND ms <= t1 + 86400000 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(ms) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND ms > t2 AND ms <= t2 + 86400000 GROUP BY 1)
        |SELECT '1_signup' AS step, count(*) AS n_users FROM t1
        |UNION ALL SELECT '2_view_after', count(*) FROM t2
        |UNION ALL SELECT '3_purchase_after', count(*) FROM t3""".stripMargin,
    "q_cohort" ->
      """WITH uw AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS w
        |            FROM events),
        |f AS (SELECT user_id, min(w) AS cohort_w FROM uw GROUP BY 1)
        |SELECT cohort_w, w - cohort_w AS period_w, count(*) AS n_active
        |FROM uw JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_id, value, epoch_ms(ts) AS ms FROM events),
        |flagged AS (
        | SELECT *, CASE WHEN ms - lag(ms) OVER w > 1800000 OR
        |   lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (
        | SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |   ORDER BY ms, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        | FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        | CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sess_value,
        | CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms
        |FROM sess GROUP BY user_id, session_seq""".stripMargin,
    "q_tumbling" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        | count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_json_extract" ->
      """SELECT json_extract_string(props, '$.k') AS k_val, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin
  )
}
