package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Relational operator inventory over the TPC-H-ish testdata
  * (SURVEY.md §2.2 EXT rows). Every query is declarative
  * DataFrame/Column code — Catalyst handles pushdown, pruning, join
  * selection; small dimension sides carry an explicit broadcast() hint.
  *
  * Oracle-parity rules (FIXTURES.md):
  *   - money/quantity sums go through DECIMAL(18,2) so they are exact
  *     (double sums are order-dependent and would not hash-match);
  *   - averages are computed as exact-decimal-sum / count in double;
  *   - every query ends with a deterministic ORDER BY;
  *   - dates are emitted as formatted strings.
  */
object Relational {

  /** Exact 2-decimal view of a double column (money, qty, rates). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal double column, surfaced as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact integer division for non-negative int64 columns (all
    * operands well below 2^53, so the intermediate double arithmetic
    * is exact): a DIV b = (a - a%b)/b.
    *
    * PRECISION BOUND: the numerator must stay below 2^53 or the
    * double division rounds the quotient (observed with 60-bit md5
    * hashes — off-by-one vs DuckDB's `//`). For full-range int64
    * numerators use the SQL `div` operator instead (q129).
    */
  private[queries] def ldiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  // ---------------------------------------------------------------
  // q138: top-k per group with RANK semantics — row_number top-k
  // (q08/q41) silently drops rows tied at the boundary; RANK keeps
  // every tied row, which is what "top 3 longest documents" actually
  // means when lengths collide. The output size is data-dependent
  // (k + ties), so this is the variant the native heap operator
  // cannot serve without a second tie-expansion pass — documented
  // here as the declarative companion to q41.
  // ---------------------------------------------------------------
  def q138TopkTies(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables.documents
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars").desc)
    documents(s, dir)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("lang"), col("rnk"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "rnk", "doc_id")
  }

  val q138Sql: String =
    """SELECT lang, rnk, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars DESC)
      |      AS BIGINT) AS rnk
      |  FROM documents
      |) WHERE rnk <= 3 ORDER BY lang, rnk, doc_id""".stripMargin

  /** Exact half-up ratio x/n scaled to 4 decimals as a double:
    * round(10^4 * x/n) = (2*10^4*x + n) DIV (2n) in pure int64 —
    * float division disagrees across engines exactly on the .00005
    * boundaries (observed at sf0.1), integer arithmetic cannot.
    */
  private[queries] def ratio4(x: Column, n: Column): Column =
    ldiv(lit(20000L) * x + n, lit(2L) * n) / 10000.0

  /** Exact half-up average of a 2-decimal column to 4 decimals:
    * avg_e4 = round(10^4 * cents/(100 n)) = (200*cents + n) DIV (2n).
    */
  private def davg4(c: Column, n: Column): Column = {
    val cents = (sum(dec(c)) * 100).cast("long") // exact integer cents
    ldiv(lit(200L) * cents + n, lit(2L) * n) / 10000.0
  }

  // ---------------------------------------------------------------
  // q01: TPC-H Q1-shaped pricing summary: filter -> hash aggregate.
  // Partial (map-side) aggregation + 3-group output; scan prunes to 7
  // columns and pushes the shipdate predicate into parquet.
  // ---------------------------------------------------------------
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir)
    val discPrice = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    val charge = discPrice * (lit(1) + dec(col("l_tax")))
    l.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        davg4(col("l_quantity"), count(lit(1))).as("avg_qty"),
        davg4(col("l_extendedprice"), count(lit(1))).as("avg_price"),
        davg4(col("l_discount"), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  ((200*CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))*100 AS BIGINT) + COUNT(*)) // (2*COUNT(*))) / 10000.0 AS avg_qty,
      |  ((200*CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))*100 AS BIGINT) + COUNT(*)) // (2*COUNT(*))) / 10000.0 AS avg_price,
      |  ((200*CAST(SUM(CAST(l_discount AS DECIMAL(18,2)))*100 AS BIGINT) + COUNT(*)) // (2*COUNT(*))) / 10000.0 AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q02: filter + projection; predicate and column pruning reach the
  // parquet scan (PushedFilters in .explain).
  // ---------------------------------------------------------------
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "ship_date")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_quantity >= 49
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, ship_date""".stripMargin

  // ---------------------------------------------------------------
  // q03: broadcast join (small dim customer) + aggregate by segment.
  // ---------------------------------------------------------------
  def q03SegmentRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val c = customer(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        dsum(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  val q03Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // q04: TPC-H Q5-shaped 6-table join. lineitem/orders are the fact
  // sides; customer/supplier/nation/region broadcast.
  // ---------------------------------------------------------------
  def q04RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir)
    val o = orders(s, dir).filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = customer(s, dir)
    val su = supplier(s, dir)
    val n = nation(s, dir)
    val r = region(s, dir).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(su),
        l("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy("n_name")
  }

  val q04Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------
  // q05: left-semi join (EXISTS).
  // ---------------------------------------------------------------
  def q05SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val big = lineitem(s, dir).filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"))
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  val q05Sql: String =
    """SELECT o_orderkey, o_totalprice, o_orderstatus
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // q06: left-anti join (NOT EXISTS).
  // ---------------------------------------------------------------
  def q06AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir)
    val o = orders(s, dir).filter(col("o_orderstatus") === "P")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  val q06Sql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q07: window functions — lag + row_number with a total per-key
  // order (ties broken by the unique (orderkey, linenumber)).
  // ---------------------------------------------------------------
  def q07WindowDelta(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
    // include l_quantity so tied rows are identical in every output
    // column and the rank assignment is output-invariant
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        (col("l_quantity") - lag(col("l_quantity"), 1).over(w)).as("qty_delta"),
        row_number().over(w).as("rn"))
      .orderBy("l_suppkey", "rn")
  }

  val q07Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  l_quantity - lag(l_quantity, 1) OVER w AS qty_delta,
      |  row_number() OVER w AS rn
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
      |ORDER BY l_suppkey, rn""".stripMargin

  // ---------------------------------------------------------------
  // q08: top-k per group via row_number.
  // ---------------------------------------------------------------
  def q08TopKOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  val q08Sql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  // ---------------------------------------------------------------
  // q09: exact distinct counts (expand-based multi-distinct).
  // ---------------------------------------------------------------
  def q09DistinctCounts(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q09Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // q10: rollup (grouping sets).
  // ---------------------------------------------------------------
  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  val q10Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q11: set operations — intersect + except (both distinct-semantics).
  // ---------------------------------------------------------------
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
    y95.intersect(y96).withColumn("op", lit("both"))
      .unionByName(y95.except(y96).withColumn("op", lit("only_1995")))
      .select(col("op"), col("o_custkey"))
      .orderBy("op", "o_custkey")
  }

  val q11Sql: String =
    """SELECT 'both' AS op, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |UNION ALL
      |SELECT 'only_1995' AS op, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |ORDER BY op, o_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q12: string scalar functions.
  // ---------------------------------------------------------------
  def q12StringFns(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .filter(col("p_type").isin("ECONOMY", "SMALL"))
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"))
      .orderBy("p_partkey")

  val q12Sql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  substr(p_name, 1, 5) AS name_pfx,
      |  length(p_name) AS name_len,
      |  p_brand || '/' || p_type AS brand_type,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
      |FROM part WHERE p_type IN ('ECONOMY', 'SMALL')
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q13: date/time scalar functions.
  // ---------------------------------------------------------------
  def q13DateFns(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(lit("2002-01-01").cast("timestamp"), col("o_orderdate")).as("days_to_2002"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"))
      .orderBy("o_orderkey")

  val q13Sql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y,
      |  month(o_orderdate) AS m,
      |  dayofmonth(o_orderdate) AS d,
      |  quarter(o_orderdate) AS q,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
      |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // q14: math scalar functions (rounded — libm last-ulp differences).
  // ---------------------------------------------------------------
  def q14MathFns(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_linenumber") === 1 && col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey"),
        round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy("l_orderkey", "sqrt_price", "qty_sq", "disc_dev")

  val q14Sql: String =
    """SELECT l_orderkey,
      |  ROUND(sqrt(l_extendedprice), 4) AS sqrt_price,
      |  ROUND(ln(l_extendedprice), 4) AS ln_price,
      |  ROUND(pow(l_quantity, 2), 4) AS qty_sq,
      |  ROUND(abs(l_discount - 0.05), 4) AS disc_dev,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  l_orderkey % 7 AS mod7
      |FROM lineitem WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
      |ORDER BY l_orderkey, sqrt_price, qty_sq, disc_dev""".stripMargin

  // ---------------------------------------------------------------
  // q15: conditional aggregation (pivot-style CASE aggregates).
  // ---------------------------------------------------------------
  def q15ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    def revWhen(st: String): Column =
      sum(dec(when(col("o_orderstatus") === st, col("o_totalprice")).otherwise(lit(0.0))))
        .cast("double")
    orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", lit(1))).as("n_f"),
        count(when(col("o_orderstatus") === "O", lit(1))).as("n_o"),
        count(when(col("o_orderstatus") === "P", lit(1))).as("n_p"),
        revWhen("F").as("rev_f"),
        revWhen("O").as("rev_o"))
      .orderBy("o_orderpriority")
  }

  val q15Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
      |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS rev_f,
      |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS rev_o
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q36: HLL++ approximate distinct next to the exact count. The raw
  // sketch estimate is engine-specific, so the gated output is the
  // exact count plus an integer flag asserting the engine's OWN
  // estimate lands within 5% of exact — both Spark's HLL++ (rsd 2%)
  // and DuckDB's HLL satisfy it deterministically, making the result
  // hash-comparable while still exercising the one-pass fixed-memory
  // mergeable-sketch path that matters at 100 TB.
  // ---------------------------------------------------------------
  def q36ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <
          col("exact_parts").cast("double") * 0.05).cast("int").as("within_5pct"))
      .orderBy("l_returnflag")

  val q36Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  CAST(abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
      |       < COUNT(DISTINCT l_partkey) * 0.05 AS INT) AS within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // q41: top-k per group through the NATIVE TopKPerGroup operator
  // (graft.plans: custom logical node + strategy + two-phase heap
  // exec) — same result as the q08 window form, but the shuffle
  // carries at most k rows per (partition, group) and nothing is
  // globally sorted. The oracle is the standard row_number form.
  // ---------------------------------------------------------------
  def q41TopkNative(s: SparkSession, dir: String): DataFrame = {
    val top = graft.plans.ops.topKPerGroup(
      orders(s, dir),
      groupCols = Seq(col("o_orderpriority")),
      orderCols = Seq(col("o_totalprice").desc, col("o_orderkey")),
      k = 3)
    top.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val q41Sql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_topk_ties" -> q138TopkTies _,
    "q41_topk_native" -> q41TopkNative _,
    "q36_approx_distinct" -> q36ApproxDistinct _,
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project" -> q02FilterProject _,
    "q03_segment_revenue" -> q03SegmentRevenue _,
    "q04_region_revenue" -> q04RegionRevenue _,
    "q05_semi_join" -> q05SemiJoin _,
    "q06_anti_join" -> q06AntiJoin _,
    "q07_window_delta" -> q07WindowDelta _,
    "q08_topk_orders" -> q08TopKOrders _,
    "q09_distinct_counts" -> q09DistinctCounts _,
    "q10_rollup" -> q10Rollup _,
    "q11_setops" -> q11SetOps _,
    "q12_string_fns" -> q12StringFns _,
    "q13_date_fns" -> q13DateFns _,
    "q14_math_fns" -> q14MathFns _,
    "q15_conditional_agg" -> q15ConditionalAgg _)

  val oracles: Map[String, String] = Map(
    "q138_topk_ties" -> q138Sql,
    "q41_topk_native" -> q41Sql,
    "q36_approx_distinct" -> q36Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_segment_revenue" -> q03Sql,
    "q04_region_revenue" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_window_delta" -> q07Sql,
    "q08_topk_orders" -> q08Sql,
    "q09_distinct_counts" -> q09Sql,
    "q10_rollup" -> q10Sql,
    "q11_setops" -> q11Sql,
    "q12_string_fns" -> q12Sql,
    "q13_date_fns" -> q13Sql,
    "q14_math_fns" -> q14Sql,
    "q15_conditional_agg" -> q15Sql)
}
