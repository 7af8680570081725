package graft

import graft.ops._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — one named query per operator in SURVEY §2 (+extensions),
  * each with DuckDB-equivalent ANSI SQL in [[oracleSql]] for the hash-compare
  * gate. Column names are aliased identically on both sides; every query ends
  * in a total-order `ORDER BY` (ties broken by a unique key) so row order is
  * deterministic in both engines.
  */
object SparkEntry {

  /** Flagship: the full parser.py pipeline (R1 unpivot → J1 first-match
    * enrich; SURVEY §3.1) run over a JHU-shaped wide table synthesized from
    * sf0.001 lineitem (M/d/yy date columns from ship months). Driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    // Wide JHU-shaped fact: one row per (returnflag, linestatus), one column
    // per ship month named like "1/1/95" (the reference's dynamic schema).
    val wide = li
      .withColumn("mcol", date_format(date_trunc("month", col("l_shipdate")), "M/d/yy"))
      .groupBy(
        col("l_returnflag").as("Country/Region"),
        col("l_linestatus").as("Province/State"),
      )
      .pivot("mcol")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).cast("int"))
      .withColumn("Lat", lit(1.5))
      .withColumn("Long", lit(-2.5))
    val lookup = Enrich.withFileOrder(
      li.select(col("l_returnflag").as("Country_Region"))
        .distinct()
        .orderBy("Country_Region")
        .withColumn("iso2", concat(lit("X"), col("Country_Region")))
        .withColumn("Lat", lit(10.0))
        .withColumn("Long_", lit(20.0))
    )
    Pipelines.parser(wide, lookup)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = coreQueries ++ ExtensionQueries.queries

  def oracleSql: Map[String, String] = coreOracleSql ++ ExtensionQueries.oracleSql

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S2/P2/P3: scan, projection, rename, cast, per-row arithmetic ----
    "q01_project_filter" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1995-09-01").cast("timestamp"))
        .select(
          col("l_orderkey").as("orderkey"),
          col("l_linenumber").as("linenumber"),
          col("l_quantity").as("qty"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        )
        .orderBy("orderkey", "linenumber")
    }),

    // ---- A-class: group-by aggregation (TPC-H Q1 shape) ----
    "q02_agg_pricing" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // product of a 2dp price and a 2dp (1-discount) has exactly <=4dp,
          // so the narrow re-cast is lossless — and keeps BOTH engines on
          // exact (non-floating) decimal summation at any scale factor
          // (DuckDB's wide-decimal sum goes through a double path).
          sum(
            (col("l_extendedprice").cast(DecimalType(18, 4)) *
              (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
              .cast(DecimalType(18, 4))
          ).cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("n_orders"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- P4/A: date truncation + aggregation ----
    "q03_monthly_orders" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("month")
    }),

    // ---- A: ranking window ----
    "q04_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy("c_mktsegment", "rn")
    }),

    // ---- A: analytic window (running sum + lag) ----
    "q05_window_running" -> ((s, d) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .as("running_total"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- A: top-k (order-by + limit with total tie-break) ----
    "q06_topk_orders" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // ---- J1: first-match lookup join (window dedup + broadcast) ----
    "q07_firstmatch_enrich" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val supp = t(s, d, "supplier")
      Enrich
        .enrich(
          cust,
          supp,
          factKey = Seq("c_nationkey"),
          lookupKey = Seq("s_nationkey"),
          orderCol = "s_suppkey",
          projections = Seq((col("s_name"), "first_supp_name"), (col("s_acctbal"), "first_supp_bal")),
        )
        .select(col("c_custkey"), col("c_name"), col("first_supp_name"), col("first_supp_bal"))
        .orderBy("c_custkey")
    }),

    // ---- J2+E2: three-way composite-key outer join with zero-fill ----
    "q08_threeway_zerofill" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def side(flag: String, name: String) =
        li.filter(col("l_returnflag") === flag)
          .groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as(name))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .join(side("R", "qty_r"), col("o_orderkey") === col("l_orderkey"), "left_outer")
        .drop("l_orderkey")
        .join(side("A", "qty_a"), col("o_orderkey") === col("l_orderkey"), "left_outer")
        .drop("l_orderkey")
        .join(side("N", "qty_n"), col("o_orderkey") === col("l_orderkey"), "left_outer")
        .drop("l_orderkey")
        .select(
          col("o_orderkey"),
          col("o_orderstatus"),
          coalesce(col("qty_r"), lit(0.0)).as("qty_r"),
          coalesce(col("qty_a"), lit(0.0)).as("qty_a"),
          coalesce(col("qty_n"), lit(0.0)).as("qty_n"),
        )
        .orderBy("o_orderkey")
    }),

    // ---- R1 melt: wide→long unpivot (native Expand, no shuffle) ----
    "q09_unpivot_long" -> ((s, d) => {
      Unpivot
        .melt(
          t(s, d, "lineitem"),
          idCols = Seq("l_orderkey", "l_linenumber"),
          valueCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          varName = "measure",
          valName = "value",
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),

    // ---- R1 nest + re-extract: ordered array-of-structs semantics ----
    "q10_nest_extract" -> ((s, d) => {
      val nested = Unpivot.renest(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        keyCols = Seq("l_orderkey"),
        orderCol = "l_linenumber",
        valueCols = Seq("l_quantity"),
      )
      nested
        .select(
          col("l_orderkey"),
          size(col("time_series")).as("n_items"),
          element_at(col("time_series"), 1).getField("l_quantity").as("first_qty"),
          element_at(col("time_series"), -1).getField("l_quantity").as("last_qty"),
        )
        .orderBy("l_orderkey")
    }),

    // ---- A: set operations ----
    "q11_setops" -> ((s, d) => {
      val withOrders = t(s, d, "orders").select(col("o_custkey").as("k")).distinct()
      val rich = t(s, d, "customer").filter(col("c_acctbal") > 1000).select(col("c_custkey").as("k"))
      val both = rich.intersect(withOrders).withColumn("tag", lit("rich_with_orders"))
      val only = rich.except(withOrders).withColumn("tag", lit("rich_no_orders"))
      both.unionAll(only).orderBy("tag", "k")
    }),

    // ---- A: distinct ----
    "q12_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- A: rollup (grouping sets) ----
    "q13_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // ---- A: semi/anti joins (EXISTS / NOT EXISTS) ----
    "q14_semi_anti" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders").select(col("o_custkey"))
      val has = cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("tag"))
      val hasNot = cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("tag"))
      has.unionAll(hasNot).orderBy("c_custkey")
    }),

    // ---- P4: date formatting / parts ----
    "q15_date_format" -> ((s, d) => {
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_ts"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
        )
        .orderBy("o_orderkey")
    }),

    // ---- P5/P6: empty-string predicate + key synthesis ----
    "q16_record_key" -> ((s, d) => {
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          concat(
            lit("type=cust/"),
            col("c_name"),
            when(col("c_mktsegment") === "", lit(""))
              .otherwise(concat(lit("-"), col("c_mktsegment"))),
            lit(".json"),
          ).as("record_key"),
        )
        .orderBy("c_custkey")
    }),

    // ---- T: event-time bucketing (batch form of the streaming agg) ----
    "q17_events_hourly" -> ((s, d) => {
      Tables
        .events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"),
        )
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("hour", "event_type")
    }),

    // ---- J1-shape: broadcast dimension chain (customer→nation→region) ----
    "q18_dim_chain" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val nation = t(s, d, "nation")
      val region = t(s, d, "region")
      cust
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"), "left_outer")
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "left_outer")
        .select(
          col("c_custkey"),
          coalesce(col("n_name"), lit("UNKNOWN")).as("nation"),
          coalesce(col("r_name"), lit("UNKNOWN")).as("region"),
        )
        .orderBy("c_custkey")
    }),

    // ---- A: cube (full grouping-set lattice) ----
    "q36_cube" -> ((s, d) => {
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // ---- A: pivot (wide aggregation; fixed value list for determinism) ----
    "q37_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    }),

    // ---- JSON scalar surface: parse the props JSON column ----
    "q38_json_extract" -> ((s, d) => {
      Tables
        .events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        )
        .groupBy((col("k_val") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k_val")).as("k_sum"))
        .orderBy(col("k_mod").asc_nulls_first)
    }),

    // ---- String function surface (2.6 class) ----
    "q39_string_funcs" -> ((s, d) => {
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 1, 8).as("sub"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("repl"),
          lpad(col("c_mktsegment"), 12, "*").as("pad"),
          reverse(col("c_name")).as("rev"),
          length(col("c_name")).as("len"),
          instr(col("c_name"), "0").as("pos"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        )
        .orderBy("c_custkey")
    }),

    // ---- A: exact percentiles (interpolated) ----
    "q40_percentile" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          min(col("l_quantity")).as("qmin"),
          max(col("l_quantity")).as("qmax"),
        )
        .orderBy("l_returnflag")
    }),

    // ---- Pure SQL surface (SURVEY §3.3): correlated subquery over views ----
    "q42_sql_correlated" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      s.sql("""
        WITH avgs AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(o_totalprice) AS ap
          FROM v_orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name,
               (SELECT COUNT(*) FROM v_orders o JOIN avgs a ON a.o_custkey = o.o_custkey
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > a.ap) AS big_orders
        FROM v_customer c
        ORDER BY c_custkey
      """)
    }),

    // ---- A: RANGE window frame (value-based, not row-based) ----
    "q43_window_range" -> ((s, d) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .rangeBetween(-5, 0)
      t(s, d, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          count(lit(1)).over(w).as("n_in_range"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double").as("range_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- P1+P4+R1 end-to-end: dynamic date-named wide table melted long ----
    "q19_jhu_melt" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val months = li
        .select(date_format(date_trunc("month", col("l_shipdate")), "M/d/yy").as("m"))
        .distinct()
        .collect()
        .map(_.getString(0))
        .toSeq
      val wide = li
        .withColumn("mcol", date_format(date_trunc("month", col("l_shipdate")), "M/d/yy"))
        .groupBy(col("l_returnflag"))
        .pivot("mcol", months)
        .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).cast("int"))
      Unpivot
        .meltDates(wide)
        .filter(col("value").isNotNull)
        .select(col("l_returnflag"), col("date"), col("value"))
        .orderBy("l_returnflag", "date")
    }),
  )

  private def coreOracleSql: Map[String, String] = Map(
    "q01_project_filter" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_quantity AS qty,
         l_extendedprice * (1.0 - l_discount) AS revenue
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1995-09-01'
         ORDER BY orderkey, linenumber""",
    "q02_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
          ${dsumSql("l_quantity")} AS sum_qty,
          ${dsumSql("l_extendedprice")} AS sum_base_price,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          ${davgSql("l_quantity")} AS avg_qty,
          COUNT(*) AS count_order,
          COUNT(DISTINCT l_orderkey) AS n_orders
          FROM lineitem GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",
    "q03_monthly_orders" ->
      s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
          COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
          FROM orders GROUP BY 1 ORDER BY month""",
    "q04_window_rank" ->
      """SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal FROM (
           SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
                  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) WHERE rn <= 5
         ORDER BY c_mktsegment, rn""",
    "q05_window_running" ->
      """SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q06_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q07_firstmatch_enrich" ->
      """SELECT c_custkey, c_name, s_name AS first_supp_name, s_acctbal AS first_supp_bal
         FROM customer LEFT JOIN (
           SELECT s_nationkey, s_name, s_acctbal FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
             FROM supplier) WHERE rn = 1
         ) fs ON c_nationkey = fs.s_nationkey
         ORDER BY c_custkey""",
    "q08_threeway_zerofill" ->
      s"""WITH r AS (SELECT l_orderkey, ${dsumSql("l_quantity")} AS qty_r FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
              a AS (SELECT l_orderkey, ${dsumSql("l_quantity")} AS qty_a FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
              n AS (SELECT l_orderkey, ${dsumSql("l_quantity")} AS qty_n FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1)
         SELECT o_orderkey, o_orderstatus,
                COALESCE(qty_r, 0.0) AS qty_r, COALESCE(qty_a, 0.0) AS qty_a, COALESCE(qty_n, 0.0) AS qty_n
         FROM orders
         LEFT JOIN r ON o_orderkey = r.l_orderkey
         LEFT JOIN a ON o_orderkey = a.l_orderkey
         LEFT JOIN n ON o_orderkey = n.l_orderkey
         ORDER BY o_orderkey""",
    "q09_unpivot_long" ->
      """SELECT l_orderkey, l_linenumber, measure, value
         FROM (UNPIVOT lineitem ON l_quantity, l_extendedprice, l_discount, l_tax
               INTO NAME measure VALUE value)
         ORDER BY l_orderkey, l_linenumber, measure""",
    "q10_nest_extract" ->
      """SELECT l_orderkey, COUNT(*) AS n_items,
           (list(l_quantity ORDER BY l_linenumber, l_quantity))[1] AS first_qty,
           (list(l_quantity ORDER BY l_linenumber, l_quantity))[-1] AS last_qty
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q11_setops" ->
      """WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 1000),
              wo AS (SELECT DISTINCT o_custkey AS k FROM orders)
         SELECT k, 'rich_with_orders' AS tag FROM (SELECT k FROM rich INTERSECT SELECT k FROM wo)
         UNION ALL
         SELECT k, 'rich_no_orders' AS tag FROM (SELECT k FROM rich EXCEPT SELECT k FROM wo)
         ORDER BY tag, k""",
    "q12_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q13_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q14_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS tag FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT c_custkey, 'no_orders' AS tag FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q15_date_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
           CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom
         FROM orders ORDER BY o_orderkey""",
    "q16_record_key" ->
      """SELECT c_custkey,
           'type=cust/' || c_name ||
           (CASE WHEN c_mktsegment = '' THEN '' ELSE '-' || c_mktsegment END) ||
           '.json' AS record_key
         FROM customer ORDER BY c_custkey""",
    "q17_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
           COUNT(*) AS n, ${dsumSql("value")} AS total_value
          FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q18_dim_chain" ->
      """SELECT c_custkey,
           COALESCE(n_name, 'UNKNOWN') AS nation,
           COALESCE(r_name, 'UNKNOWN') AS region
         FROM customer
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q36_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q37_pivot" ->
      """SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q38_json_extract" ->
      // CAST AS BIGINT: DuckDB's SUM(INT) returns HUGEINT (rendered as a
      // float in the driver hash) while Spark's sum(int) is BIGINT.
      """SELECT CAST(json_extract_string(props, 'k') AS INT) % 10 AS k_mod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, 'k') AS INT)) AS BIGINT) AS k_sum
         FROM events GROUP BY 1 ORDER BY k_mod ASC NULLS FIRST""",
    "q39_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
           substr(c_name, 1, 8) AS sub,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS repl,
           lpad(c_mktsegment, 12, '*') AS pad,
           reverse(c_name) AS rev,
           CAST(length(c_name) AS INT) AS len,
           CAST(instr(c_name, '0') AS INT) AS pos,
           concat_ws('|', c_mktsegment, c_name) AS joined
         FROM customer ORDER BY c_custkey""",
    "q40_percentile" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           min(l_quantity) AS qmin, max(l_quantity) AS qmax
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q42_sql_correlated" ->
      """WITH avgs AS (
           SELECT o_custkey,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(o_totalprice) AS ap
           FROM orders GROUP BY o_custkey
         )
         SELECT c.c_custkey, c.c_name,
                (SELECT COUNT(*) FROM orders o JOIN avgs a ON a.o_custkey = o.o_custkey
                 WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > a.ap) AS big_orders
         FROM customer c ORDER BY c_custkey""",
    "q43_window_range" ->
      """SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w AS n_in_range,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS range_total
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "q19_jhu_melt" ->
      """SELECT l_returnflag,
           strftime(date_trunc('month', l_shipdate), '%Y-%m-%d %H:%M:%S') AS date,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS BIGINT) AS INT) AS value
         FROM lineitem GROUP BY l_returnflag, date_trunc('month', l_shipdate)
         ORDER BY l_returnflag, date""",
  )
}
