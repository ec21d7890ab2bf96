package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classic relational operator inventory (SURVEY.md §2.6) over the
  * driver-generated TPC-H-ish tables. Each query has a DuckDB oracle in
  * [[Relational.oracle]] with identical column names and ordering.
  *
  * Scale notes (100 TB posture): every query here is a declarative
  * DataFrame plan — filters and projections reach the parquet scan
  * (PushedFilters/ReadSchema), small dimensions (region/nation/customer
  * aggregates) are broadcast, large fact-fact joins shuffle on their
  * join keys once, and aggregation is partial (map-side combine) by
  * construction. Nothing collects to the driver.
  */
object Relational {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- aggregation -----------------------------------------------------
    "q30_histogram" -> { (s, dir) =>
      // equi-width histogram: bounds from ONE agg pass re-entered as
      // a broadcast 1-row cross join (no driver constant in the
      // plan); the bin index is per-row IEEE arithmetic in a fixed
      // expression order, so it is bit-identical across engines, and
      // the in-bin sum goes through the exact-DECIMAL discipline
      val orders = t(s, dir, "orders")
      val bounds = orders.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      orders.crossJoin(broadcast(bounds))
        .select(
          least(floor(((col("o_totalprice") - col("lo")) * lit(20)) /
            (col("hi") - col("lo"))), lit(19L)).as("bin"),
          col("o_totalprice"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_orders"),
          d(sum(dec(col("o_totalprice")))).as("v"))
        .orderBy(col("bin"))
    },
    "q1_pricing_summary" -> { (s, dir) =>
      // TPC-H Q1 shape: full-scan groupBy with partial aggregation.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          d(sum(dec(col("l_quantity")))).as("sum_qty"),
          d(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          d(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount"))))).as("sum_disc_price"),
          (d(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "q2_filter_project" -> { (s, dir) =>
      // Predicate + projection pushdown: scan should read 3 columns only.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("2000-07-01").cast("timestamp") &&
                col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"),
                d(dec(col("l_extendedprice"))).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    "q3_join_agg" -> { (s, dir) =>
      // 3-way join: small side broadcast, fact join shuffles on orderkey.
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord  = t(s, dir, "orders")
      val li   = t(s, dir, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(d(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },
    "q4_semi_join" -> { (s, dir) =>
      // EXISTS == left_semi: no row multiplication, dedup-free.
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    "q5_anti_join" -> { (s, dir) =>
      // NOT EXISTS == left_anti.
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("modest_customers"))
        .orderBy(col("c_nationkey"))
    },
    "q6_outer_coalesce" -> { (s, dir) =>
      // OPTIONAL + COALESCE shape (mirrors the reference's dataset-name
      // SPARQL probe, KafkaConnectorAssembler.java:380-411).
      val nat = t(s, dir, "nation")
      val cust = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      val agg = cust.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("rich"))
      nat.join(agg, nat("n_nationkey") === agg("c_nationkey"), "left_outer")
        .select(col("n_name"), coalesce(col("rich"), lit(0L)).as("rich_customers"))
        .orderBy(col("n_name"))
    },
    "q7_set_ops" -> { (s, dir) =>
      // UNION / EXCEPT / INTERSECT with set semantics.
      val li = t(s, dir, "lineitem")
      val highQty  = li.filter(col("l_quantity") >= 49).select(col("l_orderkey"))
      val highDisc = li.filter(col("l_discount") >= 0.09).select(col("l_orderkey"))
      val lowTax   = li.filter(col("l_tax") <= 0.01).select(col("l_orderkey"))
      // no explicit distinct(): EXCEPT is already set-distinct, the
      // extra aggregate was a wasted shuffle pass
      highQty.union(highDisc)
        .except(lowTax.except(highDisc))
        .intersect(li.select(col("l_orderkey")))
        .orderBy(col("l_orderkey"))
    },
    "q8_distinct_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("parts"),
             countDistinct(col("l_suppkey")).as("supps"),
             count(lit(1)).as("rows"))
        .orderBy(col("l_returnflag"))
    },
    "q9_topk" -> { (s, dir) =>
      // Global top-k: Spark plans TakeOrderedAndProject (no full sort).
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"),
                d(dec(col("p_retailprice"))).as("price"))
        .orderBy(col("price").desc, col("p_partkey"))
        .limit(15)
    },
    "q10_window" -> { (s, dir) =>
      // Ranking + running aggregate; single shuffle on the partition key.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .withColumn("running_value",
          d(sum(dec(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("rn"))
    },
    "q11_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), d(sum(dec(col("l_quantity")))).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    "q12_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").rlike("^[a-m]"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowelled"))
        .orderBy(col("p_partkey"))
    },
    "q13_date_funcs" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), d(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy(col("yr"), col("mo"))
    },
    "q14_case_expr" -> { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    "q21_array_map_funcs" -> { (s, dir) =>
      // Array construction (collect_list+sort_array), array functions
      // (size/array_join/aggregate HOF) and map build/lookup — the
      // §2.6 array/map category. Sorted collect keeps it deterministic.
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 20 === 3)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber").cast("int"))).as("lines"),
          d(sum(dec(col("l_quantity")))).as("qty_total"))
        .select(col("l_orderkey"),
          size(col("lines")).as("n_items"),
          array_join(transform(col("lines"), _.cast("string")), ",").as("line_list"),
          aggregate(col("lines"), lit(0), (a, x) => a + x).as("line_sum"),
          element_at(map(lit("total"), col("qty_total")), "total").as("qty_via_map"))
        .orderBy(col("l_orderkey"))
    },
    "q15_above_group_avg" -> { (s, dir) =>
      // Correlated-subquery shape via self-join on the grouped average.
      val part = t(s, dir, "part")
      val avgP = part.groupBy(col("p_brand").as("b"))
        .agg((d(sum(dec(col("p_retailprice")))) / count(lit(1))).as("avg_price"))
      part.join(broadcast(avgP), part("p_brand") === avgP("b"))
        .filter(col("p_retailprice") > col("avg_price"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("above_avg"))
        .orderBy(col("p_brand"))
    },
    "q16_time_bucket" -> { (s, dir) =>
      // Tumbling-window aggregation, batch form.
      t(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("v"))
        .orderBy(col("hour"), col("event_type"))
    },
    "q17_multi_join" -> { (s, dir) =>
      // 5-way star join: dims broadcast, single fact shuffle.
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(d(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount"))))).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy(col("r_name"), col("n_name"))
    },
    "q18_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    "q19_json_funcs" -> { (s, dir) =>
      // JSON extraction (reference uses JSON for its state file).
      t(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 90)
        .orderBy(col("event_id"))
    },
    "q20_agg_stats" -> { (s, dir) =>
      // min/max are exact on doubles; avg via exact decimal sum.
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(min(col("s_acctbal")).as("min_bal"),
             max(col("s_acctbal")).as("max_bal"),
             (d(sum(dec(col("s_acctbal")))) / count(lit(1))).as("avg_bal"),
             count(lit(1)).as("n"))
        .orderBy(col("s_nationkey"))
    },
    "q32_abtest" -> { (s, dir) =>
      // two-sample Welch t over purchase values, variant = user
      // parity: ONE scan into a 1-row conditional aggregation
      // (map-side partials — nothing event-sized shuffles). Moments
      // stay EXACT: decimal sums, with squares of the 2-dp values
      // exact at scale 4 so every unscaled sum stays below 2^53 and
      // the final decimal→double cast is a single rounding in both
      // engines. The statistic is then one fixed-order IEEE
      // expression over those doubles — bit-identical to DuckDB
      // replaying the same formula.
      val p = t(s, dir, "events").filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"), dec(col("value")).as("v"))
      val a = p.agg(
        count(when(col("variant") === 0, 1)).as("n_a"),
        count(when(col("variant") === 1, 1)).as("n_b"),
        d(sum(when(col("variant") === 0, col("v")))).as("s_a"),
        d(sum(when(col("variant") === 1, col("v")))).as("s_b"),
        d(sum(when(col("variant") === 0,
          (col("v") * col("v")).cast("decimal(24,4)")))).as("ss_a"),
        d(sum(when(col("variant") === 1,
          (col("v") * col("v")).cast("decimal(24,4)")))).as("ss_b"))
      val m = a.select(col("*"),
        (col("s_a") / col("n_a")).as("mean_a"),
        (col("s_b") / col("n_b")).as("mean_b"),
        ((col("ss_a") - ((col("s_a") * col("s_a")) / col("n_a"))) /
          (col("n_a") - 1)).as("var_a"),
        ((col("ss_b") - ((col("s_b") * col("s_b")) / col("n_b"))) /
          (col("n_b") - 1)).as("var_b"))
      m.select(col("n_a"), col("n_b"), col("s_a"), col("s_b"),
        col("ss_a"), col("ss_b"), col("mean_a"), col("mean_b"),
        col("var_a"), col("var_b"),
        ((col("mean_a") - col("mean_b")) /
          sqrt((col("var_a") / col("n_a")) +
               (col("var_b") / col("n_b")))).as("t_welch"))
    },
    // --- sketch aggregates (the 100 TB approximate path) ------------------
    "q24_approx_distinct" -> { (s, dir) =>
      // HLL++ NDV per group, gated against the exact count: the sketch
      // merges associatively across partitions (one partial-agg
      // shuffle, constant state per group — the scale path where exact
      // COUNT(DISTINCT) would shuffle every distinct value). The oracle
      // checks the exact columns and that the gate holds.
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
             approx_count_distinct(col("user_id"), 0.02).as("hll"),
             count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("hll") - col("exact_users"))
            <= greatest(col("exact_users") * 0.05, lit(3.0))).as("hll_ok"))
        .orderBy(col("event_type"))
    },
    "q25_approx_quantile" -> { (s, dir) =>
      // Mergeable quantile sketch (accuracy 1e4 ⇒ 0.01% rank error) per
      // group, gated within 5% of the exact interpolated percentile.
      // Exact values stay Spark-side only: cross-engine float
      // interpolation is not bit-stable, booleans are.
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a50"),
             percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("a95"),
             expr("percentile(l_extendedprice, 0.5)").as("e50"),
             expr("percentile(l_extendedprice, 0.95)").as("e95"))
        .select(col("l_returnflag"), col("n"),
          (abs(col("a50") - col("e50")) <= col("e50") * 0.05).as("q50_ok"),
          (abs(col("a95") - col("e95")) <= col("e95") * 0.05).as("q95_ok"))
        .orderBy(col("l_returnflag"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q30_histogram" ->
      """WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                    FROM orders)
         SELECT LEAST(FLOOR(((o_totalprice - lo) * 20) / (hi - lo)), 19)::BIGINT AS bin,
                COUNT(*)::BIGINT AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS v
         FROM orders, s GROUP BY 1 ORDER BY bin""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(12,4)) AS DOUBLE) AS price
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-07-01'
           AND l_quantity < 10
         ORDER BY l_orderkey, l_linenumber""",
    "q3_join_agg" ->
      """SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 20""",
    "q4_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q5_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS modest_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q6_outer_coalesce" ->
      """SELECT n_name, COALESCE(rich, 0) AS rich_customers FROM nation
         LEFT JOIN (SELECT c_nationkey, COUNT(*) AS rich FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) a
         ON n_nationkey = a.c_nationkey ORDER BY n_name""",
    "q7_set_ops" ->
      """SELECT l_orderkey FROM (
           SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
           UNION
           SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09
         )
         EXCEPT (
           SELECT l_orderkey FROM lineitem WHERE l_tax <= 0.01
           EXCEPT SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09
         )
         INTERSECT SELECT l_orderkey FROM lineitem
         ORDER BY l_orderkey""",
    "q8_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS parts,
         COUNT(DISTINCT l_suppkey) AS supps, COUNT(*) AS rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q9_topk" ->
      """SELECT p_partkey, p_name, CAST(CAST(p_retailprice AS DECIMAL(12,4)) AS DOUBLE) AS price
         FROM part ORDER BY price DESC, p_partkey LIMIT 15""",
    "q10_window" ->
      """SELECT user_id, rn, event_id, running_value FROM (
           SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
           FROM events)
         WHERE rn <= 3 ORDER BY user_id, rn""",
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q12_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_name, 1, 5) AS prefix,
         LENGTH(p_name) AS name_len,
         CONCAT_WS('/', p_brand, p_type) AS brand_type,
         REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devowelled
         FROM part WHERE REGEXP_MATCHES(p_name, '^[a-m]') ORDER BY p_partkey""",
    "q13_date_funcs" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
         COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2 ORDER BY yr, mo""",
    "q14_case_expr" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                     WHEN c_acctbal < 5000 THEN 'low'
                     ELSE 'high' END AS bucket, COUNT(*) AS n
         FROM customer GROUP BY 1 ORDER BY bucket""",
    "q21_array_map_funcs" ->
      """SELECT l_orderkey, len(ls) AS n_items,
                array_to_string(ls, ',') AS line_list,
                list_sum(ls)::INT AS line_sum,
                qty_total AS qty_via_map
         FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS ls,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS qty_total
               FROM lineitem WHERE l_orderkey % 20 = 3 GROUP BY l_orderkey)
         ORDER BY l_orderkey""",
    "q15_above_group_avg" ->
      """SELECT p_brand, COUNT(*) AS above_avg FROM part p
         JOIN (SELECT p_brand AS b,
                      CAST(SUM(CAST(p_retailprice AS DECIMAL(12,4))) AS DOUBLE)/COUNT(*) AS avg_price
               FROM part GROUP BY 1) a ON p.p_brand = a.b
         WHERE p_retailprice > avg_price
         GROUP BY p_brand ORDER BY p_brand""",
    "q16_time_bucket" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
         COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS v
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q17_multi_join" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q18_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q19_json_funcs" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
         WHERE CAST(props->>'$.k' AS BIGINT) > 90 ORDER BY event_id""",
    "q20_agg_stats" ->
      """SELECT s_nationkey, MIN(s_acctbal) AS min_bal, MAX(s_acctbal) AS max_bal,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(12,4))) AS DOUBLE)/COUNT(*) AS avg_bal,
         COUNT(*) AS n
         FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",
    "q32_abtest" ->
      """WITH p AS (SELECT user_id % 2 AS variant,
                           CAST(value AS DECIMAL(12,4)) AS v
                    FROM events WHERE event_type = 'purchase'),
         a AS (SELECT
           COUNT(CASE WHEN variant = 0 THEN 1 END) AS n_a,
           COUNT(CASE WHEN variant = 1 THEN 1 END) AS n_b,
           CAST(SUM(CASE WHEN variant = 0 THEN v END) AS DOUBLE) AS s_a,
           CAST(SUM(CASE WHEN variant = 1 THEN v END) AS DOUBLE) AS s_b,
           CAST(SUM(CASE WHEN variant = 0
             THEN CAST(v * v AS DECIMAL(24,4)) END) AS DOUBLE) AS ss_a,
           CAST(SUM(CASE WHEN variant = 1
             THEN CAST(v * v AS DECIMAL(24,4)) END) AS DOUBLE) AS ss_b
           FROM p),
         m AS (SELECT *, s_a / n_a AS mean_a, s_b / n_b AS mean_b,
           ((ss_a - ((s_a * s_a) / n_a)) / (n_a - 1)) AS var_a,
           ((ss_b - ((s_b * s_b) / n_b)) / (n_b - 1)) AS var_b
           FROM a)
         SELECT n_a, n_b, s_a, s_b, ss_a, ss_b, mean_a, mean_b,
                var_a, var_b,
                ((mean_a - mean_b) /
                 sqrt((var_a / n_a) + (var_b / n_b))) AS t_welch
         FROM m""",
    "q24_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS exact_users,
         COUNT(*) AS n, TRUE AS hll_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q25_approx_quantile" ->
      """SELECT l_returnflag, COUNT(*) AS n, TRUE AS q50_ok, TRUE AS q95_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
