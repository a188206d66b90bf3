package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Core relational surface: scan/filter/project, aggregation, joins (broadcast
  * + shuffle), windows, sort/limit/offset, set ops, rollup, pivot, custom SQL.
  *
  * The reference (sling-cli) delegates this surface to the source database or
  * an embedded DuckDB (SURVEY.md §2.4); here it is native Spark — Catalyst
  * handles pushdown/pruning, AQE handles runtime re-planning.
  */
object Relational {

  /** Exact decimal view of a 2-dp double column (prices, discounts, taxes are
    * generated with 2 decimals). Summing these is exact in any engine, so the
    * final cast back to double is order-independent.
    */
  private def dec2(c: String, p: Int = 18): Column = col(c).cast(DecimalType(p, 2))

  private val one = lit(new java.math.BigDecimal("1.00")) // decimal(3,2)

  /** revenue term: l_extendedprice * (1 - l_discount), exact */
  private val discPrice: Column = dec2("l_extendedprice") * (one - dec2("l_discount", 5))

  private val charge: Column =
    dec2("l_extendedprice") * (one - dec2("l_discount", 5)) * (one + dec2("l_tax", 5))

  // oracle-side fragments (DuckDB ANSI SQL) kept textually adjacent
  private val oDisc = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(5,2)))"
  private val oCharge = s"$oDisc * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(5,2)))"

  def queries: Seq[Q] = Seq(
    // ---- q1: TPC-H Q1-style pricing summary (groupBy + exact decimal aggs)
    Q("q1_agg",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec2("l_quantity")).cast("double").as("sum_qty"),
            sum(dec2("l_extendedprice")).cast("double").as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            sum(charge).cast("double").as("sum_charge"),
            (sum(dec2("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(dec2("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
            (sum(dec2("l_discount", 5)).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM($oDisc) AS DOUBLE) AS sum_disc_price,
        CAST(SUM($oCharge) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- q2: filter + projection (both push to the parquet scan)
    Q("q2_filter_project",
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
        // (l_orderkey, l_linenumber) is not unique in the synthetic data; sort
        // by every projected column so the order is total up to identical rows
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
        ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate""")),

    // ---- q3: multi-join + agg; nation/region broadcast, AQE decides the rest
    Q("q3_join_agg",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        // partial-agg pushdown: collapse lineitem to one row per order FIRST
        // (map-side combine, 4:1), so the join carries 150k rows instead of
        // 600k and `n_orders` needs no countDistinct Expand — decimal sums
        // are exact, so regrouping cannot change the result
        val liAgg = li.groupBy(col("l_orderkey")).agg(sum(discPrice).as("__ord_rev"))
        // broadcast only the fixed-size nation dim (25 rows); customer scales
        // with SF (billions of rows at 100 TB) so AQE decides that join's
        // strategy from runtime stats instead of a forced broadcast
        liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
          .join(c.join(broadcast(n),
            c("c_nationkey") === n("n_nationkey")),
            o("o_custkey") === c("c_custkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(col("__ord_rev")).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, CAST(SUM($oDisc) AS DOUBLE) AS revenue,
        COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---- q4: window function (row_number, latest-N per key)
    Q("q4_window_topn",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""")),

    // ---- q5: global sort + limit (top-k; Spark uses TakeOrderedAndProject)
    Q("q5_topk",
      (s, dir) => Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // ---- q5b: limit + offset pagination
    Q("q5_limit_offset",
      (s, dir) => Tables(s, dir, "orders")
        .orderBy(col("o_orderkey"))
        .offset(10).limit(50),
      Some("""SELECT * FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 10""")),

    // ---- q6: union of streams (Dataflow merge in the reference)
    Q("q6_union",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.filter(col("l_quantity") < 3).unionByName(li.filter(col("l_quantity") > 48))
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM (
        SELECT * FROM lineitem WHERE l_quantity < 3
        UNION ALL SELECT * FROM lineitem WHERE l_quantity > 48)
        ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    // ---- q7: EXCEPT / INTERSECT set semantics
    Q("q7_setops",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        val oo = o.filter(col("o_orderstatus") === "O").select("o_custkey")
        f.except(oo).withColumn("setop", lit("except"))
          .unionByName(f.intersect(oo).withColumn("setop", lit("intersect")))
          .orderBy("setop", "o_custkey")
      },
      Some("""SELECT o_custkey, 'except' AS setop FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
         EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
        UNION ALL
        SELECT o_custkey, 'intersect' AS setop FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
         INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
        ORDER BY setop, o_custkey""")),

    // ---- q8: distinct
    Q("q8_distinct",
      (s, dir) => Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          year(col("l_shipdate")).as("ship_year"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus", "ship_year"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus,
        CAST(year(l_shipdate) AS INT) AS ship_year
        FROM lineitem ORDER BY l_returnflag, l_linestatus, ship_year""")),

    // ---- q9: rollup (multi-level aggregation)
    Q("q9_rollup",
      (s, dir) => Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(discPrice).cast("double").as("revenue"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("revenue"), col("n"))
        .orderBy("returnflag", "linestatus"),
      Some(s"""SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
        COALESCE(l_linestatus,'ALL') AS linestatus,
        CAST(SUM($oDisc) AS DOUBLE) AS revenue, COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // ---- q10: semi / anti joins (EXISTS / NOT EXISTS)
    Q("q10_semi_anti",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        val keys = o.select(col("o_custkey"))
        c.join(keys, c("c_custkey") === keys("o_custkey"), "left_semi")
          .select(col("c_custkey")).withColumn("tag", lit("has_orders"))
          .unionByName(
            c.join(keys, c("c_custkey") === keys("o_custkey"), "left_anti")
              .select(col("c_custkey")).withColumn("tag", lit("no_orders")))
          .orderBy("tag", "c_custkey")
      },
      Some("""SELECT c_custkey, 'has_orders' AS tag FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, 'no_orders' AS tag FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY tag, c_custkey""")),

    // ---- q11: join + group + having
    Q("q11_having",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec2("l_quantity")).cast("double").as("total_qty"))
        .filter(col("n_lines") >= 5)
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5
        ORDER BY l_orderkey""")),

    // ---- q12: pivot (conditional aggregation)
    Q("q12_pivot",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(discPrice).cast("double"))
        .withColumnRenamed("F", "rev_f").withColumnRenamed("O", "rev_o")
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
        CAST(SUM($oDisc) FILTER (WHERE l_linestatus='F') AS DOUBLE) AS rev_f,
        CAST(SUM($oDisc) FILTER (WHERE l_linestatus='O') AS DOUBLE) AS rev_o
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q13: the custom-SQL escape hatch (reference: --src-stream='select …'
    //      pushed to source DB; here Spark SQL itself over registered views)
    Q("q13_custom_sql",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q16: TPC-H Q3-style shipping priority (join + agg + top-k)
    Q("q16_ship_priority",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING")
          .join(o, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp") &&
            col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(discPrice).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, CAST(SUM($oDisc) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- q17: TPC-H Q10-style returned-item ranking
    Q("q17_returned_items",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        li.filter(col("l_returnflag") === "R")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(sum(discPrice).cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, CAST(SUM($oDisc) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---- q9b: cube (all grouping-set combinations)
    Q("q9_cube",
      (s, dir) => Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"), col("n"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
        COALESCE(l_linestatus,'ALL') AS linestatus, COUNT(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // ---- q18: max_by / min_by (argmax aggregates)
    Q("q18_arg_minmax",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), -col("o_orderkey"))).as("bottom_order"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderpriority"),
      Some("""WITH rk AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey DESC) rmax,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice ASC, o_orderkey DESC) rmin
        FROM orders)
        SELECT o_orderpriority,
          MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_order,
          MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_order,
          MAX(o_totalprice) AS max_price
        FROM rk GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q19: scalar string-function parity
    Q("q19_string_funcs",
      (s, dir) => Tables(s, dir, "customer").select(
        col("c_custkey"),
        substring(col("c_name"), 1, 8).as("name8"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("joined"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
        reverse(col("c_mktsegment")).as("rev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("xlat"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, substring(c_name, 1, 8) AS name8,
        regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        concat_ws('-', c_mktsegment, c_name) AS joined,
        lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
        reverse(c_mktsegment) AS rev,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS xlat
        FROM customer ORDER BY c_custkey""")),

    // ---- q20: conditional expressions
    Q("q20_conditional",
      (s, dir) => Tables(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 150000, "high")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_x"),
        (col("o_orderkey") % 2 === 0).cast("int").as("is_even"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 150000 THEN 'high'
             WHEN o_totalprice > 50000 THEN 'mid' ELSE 'low' END AS bucket,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_x,
        CAST(o_orderkey % 2 = 0 AS INT) AS is_even
        FROM orders ORDER BY o_orderkey""")),

    // ---- q21: explicit grouping sets (SQL surface)
    Q("q21_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(CAST(year(l_shipdate) AS INT), -1) AS ship_year,
          COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), ())
          ORDER BY returnflag, ship_year""")
      },
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        COALESCE(CAST(year(l_shipdate) AS INT), -1) AS ship_year,
        COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), ())
        ORDER BY returnflag, ship_year""")),

    // ---- q22: variance/stddev/correlation from exact decimal moments —
    //      engine-portable (no Welford-order sensitivity)
    Q("q22_exact_moments",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val g = li.groupBy(col("l_returnflag")).agg(
          count(lit(1)).as("n"),
          sum(dec2("l_quantity")).cast("double").as("s1"),
          sum(dec2("l_quantity", 18) * dec2("l_quantity", 18)).cast("double").as("s2"),
          sum(dec2("l_extendedprice")).cast("double").as("p1"),
          sum(dec2("l_quantity", 18) * dec2("l_extendedprice")).cast("double").as("qp"))
        g.select(col("l_returnflag"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / col("n")).as("var_qty"),
          ((col("qp") - col("s1") * col("p1") / col("n")) / col("n")).as("cov_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH g AS (SELECT l_returnflag,
          COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p1,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS qp
        FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag,
          (s2 - s1 * s1 / n) / n AS var_qty,
          (qp - s1 * p1 / n) / n AS cov_qty_price
        FROM g ORDER BY l_returnflag""")),

    // ---- q14: column profiling / analysis (reference analyzer.go:151)
    Q("q14_profile",
      (s, dir) => Tables(s, dir, "lineitem").agg(
        count(lit(1)).as("total_cnt"),
        count(col("l_quantity")).as("qty_nonnull"),
        min(col("l_quantity")).as("qty_min"),
        max(col("l_quantity")).as("qty_max"),
        countDistinct(col("l_partkey")).as("partkey_uniq"),
        countDistinct(col("l_returnflag")).as("flag_uniq"),
        min(col("l_shipdate")).as("ship_min"),
        max(col("l_shipdate")).as("ship_max")),
      Some("""SELECT COUNT(*) AS total_cnt, COUNT(l_quantity) AS qty_nonnull,
        MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
        COUNT(DISTINCT l_partkey) AS partkey_uniq,
        COUNT(DISTINCT l_returnflag) AS flag_uniq,
        MIN(l_shipdate) AS ship_min, MAX(l_shipdate) AS ship_max
        FROM lineitem"""))
  )
}
