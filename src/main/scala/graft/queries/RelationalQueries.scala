package graft.queries

import org.apache.spark.sql.functions._

import QueryDef.t

/** Generic relational operator layer — each query maps to an operator
  * family from SURVEY §2 (noted per query). These are the engine's
  * reusable building blocks exercised on the driver's TPC-H-ish tables
  * with DuckDB oracles.
  *
  * Scale notes baked into the plans: aggregations are partial-agg
  * friendly (plain groupBy on low-cardinality keys), dimension joins
  * broadcast the small side, anti/semi joins stay key-only, and every
  * query orders deterministically so results are reproducible across
  * cluster sizes.
  */
object RelationalQueries {

  val all: Seq[QueryDef] = Seq(

    // A1/A12 — the classic partial-aggregatable groupBy (map-side combine).
    QueryDef("q01_agg_pricing", Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // P1 — year-floor filter. Expressed as a range literal (not
    // year(col) >= N) so it reaches the parquet scan as a pushed
    // filter: at 100 TB that is the difference between pruning row
    // groups and decoding every date.
    QueryDef("q02_filter_year", Some("""
      SELECT o_orderpriority, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")),

    // P11 — severity banding as a codegen'd when-chain (fixSeverityScore).
    QueryDef("q03_severity_banding", Some("""
      SELECT CASE WHEN value >= 90 THEN 'Critical' WHEN value >= 70 THEN 'High'
                  WHEN value >= 40 THEN 'Medium' WHEN value >= 10 THEN 'Low'
                  ELSE 'Unknown' END AS severity,
             count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY severity ORDER BY severity"""),
      (s, dir) => t(s, dir, "events")
        .withColumn("severity",
          when(col("value") >= 90, "Critical").when(col("value") >= 70, "High")
            .when(col("value") >= 40, "Medium").when(col("value") >= 10, "Low")
            .otherwise("Unknown"))
        .groupBy("severity")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("severity")),

    // J1-shape — left-outer enrichment join + coalesce backfill.
    QueryDef("q04_join_enrich", Some("""
      SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total,
             round(avg(c_acctbal), 4) AS avg_bal
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      GROUP BY segment ORDER BY segment"""),
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"),
          round(avg("c_acctbal"), 4).as("avg_bal"))
        .orderBy("segment")),

    // J6-shape — broadcast dimension join (supplier is tiny; NVD-map analog).
    QueryDef("q05_broadcast_join", Some("""
      SELECT s_name, count(*) AS n_items, round(sum(l_quantity), 2) AS qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY s_name"""),
      (s, dir) => t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("s_name")),

    // J4/J5-shape — anti join (whitelist injection / RHSA culling).
    QueryDef("q06_anti_join", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // semi join (EXISTS gate).
    QueryDef("q07_semi_join", Some("""
      SELECT p_brand, count(*) AS n FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
      GROUP BY p_brand ORDER BY p_brand"""),
      (s, dir) => t(s, dir, "part")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 45),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")),

    // multi-way join through the star schema (TPC-H Q5 shape); dims broadcast.
    QueryDef("q08_multi_join", Some("""
      SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""),
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")),

    // G3/G4-shape — explode/unnest generator.
    QueryDef("q09_explode_words", Some("""
      SELECT w AS word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 20"""),
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("word")).limit(20)),

    // A2-shape — set-union aggregation (collect_set/array_distinct).
    QueryDef("q10_group_collect", Some("""
      SELECT o_custkey, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
             count(*) AS n
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey")),

    // window ranking (deterministic first/last-wins machinery, §4.2-2).
    QueryDef("q11_window_rank", Some("""
      SELECT user_id, event_id, round(value, 2) AS value, rn FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        FROM events) WHERE rn <= 3
      ORDER BY user_id, rn"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "events")
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy(desc("value"), col("event_id"))))
          .filter(col("rn") <= 3)
          .select(col("user_id"), col("event_id"), round(col("value"), 2).as("value"), col("rn"))
          .orderBy("user_id", "rn")
      }),

    // A8-shape — last-writer-wins dedup by key via explicit ordering.
    QueryDef("q12_dedup_lastwin", Some("""
      SELECT user_id, event_id AS latest_event FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
      ORDER BY user_id"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "events")
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("latest_event"))
          .orderBy("user_id")
      }),

    // O4/J10-shape — union of feeds then regroup.
    QueryDef("q13_union_merge", Some("""
      SELECT user_id, count(*) AS n, round(sum(value), 2) AS total FROM (
        SELECT user_id, value FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, value FROM events WHERE event_type = 'error')
      GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.filter(col("event_type") === "purchase").select("user_id", "value")
          .unionByName(ev.filter(col("event_type") === "error").select("user_id", "value"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .orderBy("user_id")
      }),

    // O5 — set difference.
    QueryDef("q14_set_except", Some("""
      SELECT p_partkey FROM part
      EXCEPT SELECT l_partkey AS p_partkey FROM lineitem
      ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part").select("p_partkey")
        .except(t(s, dir, "lineitem").select(col("l_partkey").as("p_partkey")))
        .orderBy("p_partkey")),

    // A5 — highest-priority-wins via ordinal mapping (Priority.Compare).
    QueryDef("q15_priority_max", Some("""
      SELECT user_id,
             CASE max(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                      WHEN 'signup' THEN 3 WHEN 'purchase' THEN 4 WHEN 'error' THEN 5 ELSE 0 END)
               WHEN 1 THEN 'click' WHEN 2 THEN 'view' WHEN 3 THEN 'signup'
               WHEN 4 THEN 'purchase' WHEN 5 THEN 'error' ELSE 'none' END AS top_type
      FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => {
        val ord = when(col("event_type") === "click", 1).when(col("event_type") === "view", 2)
          .when(col("event_type") === "signup", 3).when(col("event_type") === "purchase", 4)
          .when(col("event_type") === "error", 5).otherwise(0)
        t(s, dir, "events")
          .groupBy("user_id").agg(max(ord).as("mx"))
          .select(col("user_id"),
            when(col("mx") === 1, "click").when(col("mx") === 2, "view")
              .when(col("mx") === 3, "signup").when(col("mx") === 4, "purchase")
              .when(col("mx") === 5, "error").otherwise("none").as("top_type"))
          .orderBy("user_id")
      }),

    // deterministic top-k (ORDER BY + LIMIT with full tie-break).
    QueryDef("q16_topk", Some("""
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      (s, dir) => t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .limit(10)),

    // HAVING gate (count-threshold assertions A11 as a relational op).
    QueryDef("q17_having", Some("""
      SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_custkey HAVING count(*) >= 3
      ORDER BY o_custkey"""),
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .filter(col("n") >= 3)
        .orderBy("o_custkey")),

    // rollup totals (multi-level aggregation).
    QueryDef("q18_rollup", Some("""
      SELECT coalesce(c_mktsegment, 'ALL') AS segment, count(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY ROLLUP(c_mktsegment) ORDER BY segment"""),
      (s, dir) => {
        // SQL ROLLUP via a view: the Dataset .rollup API trips Spark's
        // ambiguous-column check on the Expand node's duplicated
        // grouping attribute here; the SQL path resolves cleanly.
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"))
          .createOrReplaceTempView("q18_base")
        s.sql("""SELECT coalesce(seg, 'ALL') AS segment, count(*) AS n
                 FROM q18_base GROUP BY ROLLUP(seg) ORDER BY segment""")
      }),

    // semi-structured extraction (props JSON column).
    QueryDef("q19_json_extract", Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
             count(*) AS n
      FROM events GROUP BY k_bucket ORDER BY k_bucket"""),
      (s, dir) => t(s, dir, "events")
        .select((get_json_object(col("props"), "$.k").cast("bigint") % 10).as("k_bucket"))
        .groupBy("k_bucket").agg(count(lit(1)).as("n"))
        .orderBy("k_bucket")),

    // date bucketing (P-date normalization family).
    QueryDef("q20_date_trunc", Some("""
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             count(*) AS n, round(sum(value), 2) AS total
      FROM events GROUP BY day ORDER BY day"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.select(date_format(graft.functions.EventTime.eventTs(ev), "yyyy-MM-dd").as("day"), col("value"))
        .groupBy("day").agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("day")
      }),

    // J3-shape — null backfill through an outer join.
    QueryDef("q21_coalesce_backfill", Some("""
      SELECT o_orderstatus, count(*) AS n, round(sum(coalesce(c_acctbal, 0.0)), 2) AS backfilled_bal
      FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) hc
        ON o_custkey = hc.c_custkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer").filter(col("c_acctbal") > 5000),
          col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum(coalesce(col("c_acctbal"), lit(0.0))), 2).as("backfilled_bal"))
        .orderBy("o_orderstatus")),

    // statistical aggregates.
    QueryDef("q22_stats", Some("""
      SELECT c_mktsegment, round(avg(c_acctbal), 4) AS avg_bal,
             round(stddev_samp(c_acctbal), 4) AS sd_bal,
             round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(round(avg("c_acctbal"), 4).as("avg_bal"),
          round(stddev_samp("c_acctbal"), 4).as("sd_bal"),
          round(min("c_acctbal"), 2).as("min_bal"),
          round(max("c_acctbal"), 2).as("max_bal"))
        .orderBy("c_mktsegment")),

    // exact percentile (interpolating median).
    QueryDef("q23_percentile", Some("""
      SELECT c_mktsegment, round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"))
        .orderBy("c_mktsegment")),

    // K2-shape — conditional dual projection (pivot-style).
    QueryDef("q24_conditional_pivot", Some("""
      SELECT user_id,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value
      FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 2).as("purchase_value"))
        .orderBy("user_id")),

    // A3-shape — min/max/first-non-null merge per group (arg_min analog).
    QueryDef("q25_regroup_firstwins", Some("""
      SELECT l_orderkey, arg_min(l_partkey, l_linenumber * 1000000 + l_partkey) AS first_part,
             count(*) AS n_items,
             string_agg(DISTINCT CAST(l_partkey AS VARCHAR), ',' ORDER BY CAST(l_partkey AS VARCHAR)) AS parts
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        // the tie-break term makes the ordering key unique — (orderkey,
        // linenumber) pairs repeat in the synthetic data, and min_by on
        // ties is engine-arbitrary
        .agg(min_by(col("l_partkey"), col("l_linenumber") * 1000000 + col("l_partkey")).as("first_part"),
          count(lit(1)).as("n_items"),
          array_join(array_sort(collect_set(col("l_partkey").cast("string"))), ",").as("parts"))
        .orderBy("l_orderkey")),

    // set intersection (O5 family, complements q14's EXCEPT).
    QueryDef("q27_set_intersect", Some("""
      SELECT p_partkey FROM part
      INTERSECT SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity > 49
      ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part").select("p_partkey")
        .intersect(t(s, dir, "lineitem").filter(col("l_quantity") > 49)
          .select(col("l_partkey").as("p_partkey")))
        .orderBy("p_partkey")),

    // date arithmetic across a join: order-to-ship latency.
    QueryDef("q28_date_arithmetic", Some("""
      SELECT o_orderpriority,
             round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_ship_days,
             CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_ship_days,
             count(*) AS n
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= o_orderdate
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate"))
        .withColumn("ship_days",
          datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
        .groupBy("o_orderpriority")
        .agg(round(avg("ship_days"), 4).as("avg_ship_days"),
          max("ship_days").cast("bigint").as("max_ship_days"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // edit-distance near-dup (levenshtein is codegen'd in Spark and a
    // native function in DuckDB) over a bounded candidate set.
    QueryDef("q29_edit_distance", Some("""
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) AS dist
      FROM documents a JOIN documents b
        ON a.source = b.source AND a.doc_id < b.doc_id
        AND a.doc_id < 200 AND b.doc_id < 200
      WHERE levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) <= 20
      ORDER BY doc_a, doc_b"""),
      (s, dir) => {
        val d = t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("source"), substring(col("text"), 1, 40).as("prefix"))
        d.as("a").join(d.as("b"),
            col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
          .withColumn("dist", levenshtein(col("a.prefix"), col("b.prefix")))
          .filter(col("dist") <= 20)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("dist"))
          .orderBy("doc_a", "doc_b")
      }),

    // P1 — CVE-name year extraction over synthetic ids (regexp family).
    QueryDef("q26_cve_year_gate", Some("""
      SELECT CAST(regexp_extract(cve_name, 'CVE-(\d+)-', 1) AS INTEGER) AS yr, count(*) AS n
      FROM (SELECT 'CVE-' || CAST(year(o_orderdate) AS VARCHAR) || '-' || CAST(o_orderkey AS VARCHAR) AS cve_name FROM orders)
      WHERE CAST(regexp_extract(cve_name, 'CVE-(\d+)-', 1) AS INTEGER) >= 1996
      GROUP BY yr ORDER BY yr"""),
      (s, dir) => t(s, dir, "orders")
        .select(concat(lit("CVE-"), year(col("o_orderdate")).cast("string"),
          lit("-"), col("o_orderkey").cast("string")).as("cve_name"))
        .select(regexp_extract(col("cve_name"), "CVE-(\\d+)-", 1).cast("int").as("yr"))
        .filter(col("yr") >= 1996)
        .groupBy("yr").agg(count(lit(1)).as("n"))
        .orderBy("yr")),

    // As-of (point-in-time) join: each event picks up the customer's
    // most recent order at-or-before the event time. Spark has no
    // native ASOF; operators.AsOfJoin resolves it with a tag-union +
    // one per-key ordered window -- ONE shuffle, sort-merge-join cost,
    // no per-key range explosion. The right side is pre-deduped to one
    // row per (custkey, orderdate) so the matched row is well-defined
    // on both engines.
    QueryDef("q65_asof_join", Some("""
      WITH o AS (SELECT o_custkey, epoch_ms(o_orderdate) AS oms,
                        arg_max(o_orderpriority, o_orderkey) AS pri
                 FROM orders GROUP BY o_custkey, o_orderdate),
      e AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ems, event_type FROM events),
      m AS (SELECT e.event_type,
                   (SELECT o.pri FROM o WHERE o.o_custkey = e.user_id AND o.oms <= e.ems
                    ORDER BY o.oms DESC LIMIT 1) AS pri,
                   e.ems - (SELECT o.oms FROM o WHERE o.o_custkey = e.user_id AND o.oms <= e.ems
                    ORDER BY o.oms DESC LIMIT 1) AS lag_ms
            FROM e)
      SELECT event_type, coalesce(pri, 'none') AS last_priority, count(*) AS n,
             round(avg(lag_ms) / 86400000.0, 3) AS avg_days_since_order
      FROM m GROUP BY event_type, last_priority ORDER BY event_type, last_priority"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val events = ev.select(col("user_id"),
          graft.functions.EventTime.eventMs(ev).as("ems"), col("event_type"))
        val orders = t(s, dir, "orders")
          .groupBy(col("o_custkey"),
            // o_orderdate arrives TIMESTAMP_NTZ; the session runs UTC,
            // so the LTZ cast is the identity epoch mapping
            unix_millis(col("o_orderdate").cast("timestamp")).as("oms"))
          .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("pri"))
        graft.operators.AsOfJoin.asOfBackward(events, orders,
            "user_id", "o_custkey", "ems", "oms", Seq("pri"), prefix = "o_")
          .groupBy(col("event_type"), coalesce(col("o_pri"), lit("none")).as("last_priority"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("ems") - col("o_oms")) / 86400000.0, 3).as("avg_days_since_order"))
          .orderBy("event_type", "last_priority")
      }),

    // Interval (range) join with NO equi-key: the 20 highest-value
    // events open 2-hour attribution windows; every event landing in a
    // window attributes to it. operators.RangeJoin manufactures an
    // equi-key by time-bucketing (intervals explode to overlapped
    // buckets, points map to one bucket, hash-join + residual filter)
    // -- the scale path where a bare inequality join would plan a
    // nested loop.
    QueryDef("q66_range_join", Some("""
      WITH e AS (SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ems, value FROM events),
      w AS (SELECT event_id AS window_id, ems AS ws, ems + 7200000 AS we
            FROM e ORDER BY value DESC, event_id LIMIT 20)
      SELECT w.window_id, count(*) AS n_events, round(sum(e.value), 2) AS total_value
      FROM w JOIN e ON e.ems >= w.ws AND e.ems < w.we
      GROUP BY w.window_id ORDER BY w.window_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val e = ev.select(col("event_id"),
          graft.functions.EventTime.eventMs(ev).as("ems"), col("value"))
        val w = e.orderBy(desc("value"), col("event_id")).limit(20)
          .select(col("event_id").as("window_id"), col("ems").as("ws"),
            (col("ems") + 7200000L).as("we"))
        graft.operators.RangeJoin.intervalJoin(e, w, "ems", "ws", "we",
            width = 3600000L)
          .groupBy("window_id")
          .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
          .orderBy("window_id")
      }),

    // Bounded top-k per key via the custom top_k aggregate
    // (functions.TopKAgg, a TypedImperativeAggregate): a k-sized heap
    // per group with MAP-SIDE partial aggregation, so the shuffle
    // carries <= k rows per group per task — where the window
    // encoding (q11) must shuffle and sort every row. Only the ord
    // values are emitted, so boundary ties are value-identical to the
    // oracle's row_number ranking.
    QueryDef("q70_topk_per_key", Some("""
      SELECT l_suppkey, rnk, price FROM (
        SELECT l_suppkey, l_extendedprice AS price,
               row_number() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC) AS rnk
        FROM lineitem)
      WHERE rnk <= 3 ORDER BY l_suppkey, rnk"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(graft.functions.TopKAgg.topK(
          col("l_extendedprice"), col("l_orderkey"), 3).as("top"))
        .select(col("l_suppkey"), posexplode(col("top")))
        .select(col("l_suppkey"), (col("pos") + 1).cast("bigint").as("rnk"),
          col("col.ord").as("price"))
        .orderBy("l_suppkey", "rnk")),

    // Deterministic global shuffle: the training-order pass. Order is
    // a pure function of the ids (md5-uniform), so every rerun and
    // engine reproduces the identical epoch order; Spark executes it
    // as a range-partitioned distributed sort. The row ORDER is the
    // asserted result here (the driver compares row order).
    QueryDef("q76_corpus_shuffle", Some("""
      SELECT doc_id FROM documents
      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               / 4294967296.0, doc_id"""),
      (s, dir) => graft.operators.Mixing.deterministicShuffle(
          t(s, dir, "documents"), "doc_id")
        .select("doc_id")),

    // Unpivot (wide -> long): per-flag measures melted into
    // (measure, value) rows — Dataset.unpivot on the Spark side, the
    // portable UNION ALL encoding in the oracle.
    QueryDef("q77_unpivot", Some("""
      WITH w AS (SELECT l_returnflag,
                        round(sum(l_quantity), 2) AS sum_qty,
                        round(sum(l_discount), 2) AS sum_disc,
                        round(sum(l_tax), 2) AS sum_tax
                 FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, measure, value FROM (
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
        UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w
        UNION ALL SELECT l_returnflag, 'sum_tax', sum_tax FROM w)
      ORDER BY l_returnflag, measure"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_discount"), 2).as("sum_disc"),
          round(sum("l_tax"), 2).as("sum_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_disc"), col("sum_tax")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")),

    // Decile banding via ntile WITHIN each priority class — the
    // window partitions on the class key, so each partition sorts
    // independently (a bare global ntile would serialize the table
    // through one partition at scale). Order made total with the key
    // tiebreak so both engines tile identically.
    QueryDef("q78_ntile", Some("""
      SELECT o_orderpriority, tile, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM (SELECT o_orderpriority, o_totalprice,
              ntile(10) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS tile
            FROM orders)
      GROUP BY o_orderpriority, tile ORDER BY o_orderpriority, tile"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_totalprice"), ntile(10).over(
            Window.partitionBy("o_orderpriority")
              .orderBy("o_totalprice", "o_orderkey")).as("tile"))
          .groupBy("o_orderpriority", "tile")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderpriority", "tile")
      }),

    // Correlation / covariance statistics per group (co-moment
    // aggregates, map-side partial).
    QueryDef("q79_corr", Some("""
      SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
          round(covar_samp("l_quantity", "l_discount"), 4).as("cov_qty_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // The consumer scan of the vulnerability DB (operators.VulnMatch):
    // inventory x fix ranges through the native version_cmp join
    // residual. Versions here are plain major.minor so the DuckDB
    // twin can rank them as integer tuples — the dpkg-specific
    // orderings (epochs, ~, .el) are pinned by VulnMatchSpec and the
    // PkgVersion golden suites instead.
    QueryDef("q80_vuln_match", Some("""
      WITH inv AS (SELECT 'ns' || (p_partkey % 3) AS namespace,
                          'f' || (p_partkey % 50) AS feature,
                          (p_partkey % 4) AS imaj, (p_partkey % 10) AS imin
                   FROM part WHERE p_partkey < 400),
      db AS (SELECT 'ns' || (s_suppkey % 3) AS namespace,
                    'f' || (s_suppkey % 50) AS feature,
                    (s_suppkey % 3 + 1) AS fmaj, (s_suppkey % 7) AS fmin,
                    'V-' || s_suppkey AS vul_name
             FROM supplier)
      SELECT i.namespace, count(*) AS n_affected,
             count(DISTINCT d.vul_name) AS n_vulns
      FROM inv i JOIN db d ON i.namespace = d.namespace AND i.feature = d.feature
        AND (i.imaj < d.fmaj OR (i.imaj = d.fmaj AND i.imin < d.fmin))
      GROUP BY i.namespace ORDER BY i.namespace"""),
      (s, dir) => {
        val inv = t(s, dir, "part").filter(col("p_partkey") < 400)
          .select(concat(lit("ns"), col("p_partkey") % 3).as("namespace"),
            concat(lit("f"), col("p_partkey") % 50).as("feature"),
            concat(col("p_partkey") % 4, lit("."), col("p_partkey") % 10).as("version"))
        val ranges = t(s, dir, "supplier")
          .select(concat(lit("ns"), col("s_suppkey") % 3).as("namespace"),
            concat(lit("f"), col("s_suppkey") % 50).as("feature"),
            concat(lit("V-"), col("s_suppkey")).as("vul_name"),
            lit("High").as("severity"),
            concat(col("s_suppkey") % 3 + 1, lit("."), col("s_suppkey") % 7).as("fixed_version"),
            lit(graft.core.PkgVersion.MinSentinel).as("min_ver"))
        graft.operators.VulnMatch.affected(inv, ranges)
          .groupBy("namespace")
          .agg(count(lit(1)).as("n_affected"),
            countDistinct("vul_name").as("n_vulns"))
          .orderBy("namespace")
      }),

    // As-of join on NATIVE timestamp columns with a tolerance horizon:
    // the common event-time case with no manual epoch cast — the
    // tolerance reads in microseconds (unix_micros difference) and
    // voids matches staler than 30 days, which q65's unit-free numeric
    // form cannot express without the caller pre-converting. Same
    // single tag-union + one window plan as q65.
    QueryDef("q82_asof_tolerance_ts", Some("""
      WITH o AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ots,
                        arg_max(o_orderpriority, o_orderkey) AS pri
                 FROM orders GROUP BY o_custkey, o_orderdate),
      e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_type FROM events),
      m AS (SELECT e.event_type,
                   (SELECT o.pri FROM o
                    WHERE o.o_custkey = e.user_id AND o.ots <= e.ets
                      AND date_diff('microsecond', o.ots, e.ets) <= 2592000000000
                    ORDER BY o.ots DESC LIMIT 1) AS pri
            FROM e)
      SELECT event_type, coalesce(pri, 'none') AS last_priority, count(*) AS n
      FROM m GROUP BY event_type, last_priority ORDER BY event_type, last_priority"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val events = ev.select(col("user_id"),
          graft.functions.EventTime.eventTs(ev).as("ets"), col("event_type"))
        val orders = t(s, dir, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ots"))
          .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("pri"))
        graft.operators.AsOfJoin.asOfBackward(events, orders,
            "user_id", "o_custkey", "ets", "ots", Seq("pri"), prefix = "o_",
            tolerance = Some(30L * 86400L * 1000000L)) // 30 days in micros
          .groupBy(col("event_type"), coalesce(col("o_pri"), lit("none")).as("last_priority"))
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "last_priority")
      })
  )
}
