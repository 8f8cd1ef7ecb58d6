package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One named query + its DuckDB oracle (None → rows-only check). */
case class Qdef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational/OLAP bench headliners over the TPC-H-ish star schema.
  * Deterministic cross-engine protocol: money rounded to 2dp, avgs to
  * 4-6dp, ORDER BY uses only rounded/exact columns plus unique keys,
  * derived integers cast to BIGINT on both sides.
  */
object OlapQueries {

  private def q1(s: SparkSession, d: String): DataFrame = {
    // Money SUMS aggregate in LONG cents, not double (r19): the money
    // columns are exactly-2dp by generation, so the ×100 rounds below
    // are lossless and the sums are exact integer arithmetic —
    // bit-identical to the oracle at every corpus scale. Double sums
    // pass the gate up to sf3 but diverge in the 14th significant
    // digit at sf10 (totals ~4e11 over 33M rows), and rounding the
    // OUTPUT cannot absorb accumulation error of the sum itself.
    // Long, not decimal: a decimal(24,6) sum is exact too but drops
    // the aggregation out of the primitive hash-agg fast path (6×
    // wall, measured); long cents stay whole-stage-codegen-fast. The
    // charge sum peaks ~1.4e18 at sf10 (micros scale) — exact
    // through ~sf70, and ANSI mode makes the eventual overflow an
    // ERROR, never silent corruption. The final /10^k divisions are
    // IEEE-identical on both engines. Averages stay double: their
    // magnitude is scale-invariant, so 4/6dp rounding absorbs
    // summation noise at any sf.
    // floor(x*100 + 0.5), not round(): Spark's Round on double goes
    // through BigDecimal per row (measured ~2x on this scan); floor
    // stays primitive and the +0.5 nudge is exact for 2dp inputs
    // whose *100 lands within one ulp of an integer
    val cents = floor(col("l_extendedprice") * 100 + 0.5)
    val discC = lit(100L) - floor(col("l_discount") * 100 + 0.5)
    val taxC = lit(100L) + floor(col("l_tax") * 100 + 0.5)
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        (sum(cents) / 100.0).as("sum_base_price"),
        (sum(cents * discC) / 10000.0).as("sum_disc_price"),
        (sum(cents * discC * taxC) / 1000000.0).as("sum_charge"),
        round(avg(col("l_quantity")) + lit(1e-9), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")) + lit(1e-9), 4).as("avg_price"),
        round(avg(col("l_discount")) + lit(1e-9), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
      |   AS sum_base_price,
      | sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
      |   / 10000.0 AS sum_disc_price,
      | sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
      |   * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
      |   / 1000000.0 AS sum_charge,
      | round(avg(l_quantity) + 0.000000001, 4) AS avg_qty,
      | round(avg(l_extendedprice) + 0.000000001, 4) AS avg_price,
      | round(avg(l_discount) + 0.000000001, 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private def q3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, d).hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("o_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  private val q3Sql =
    """SELECT o_orderkey,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      | o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Fact-side join discipline (q3/q5/q10): the lineitem join carries
    * an explicit `merge` hint. Left alone, Spark's size estimate for
    * the 11 MB sf0.1 parquet falls under the 64 m broadcast threshold
    * and it BROADCASTS THE FACT TABLE — a 600k-row hash relation built
    * and shipped per run locally, and a plan shape that inverts the
    * moment the fact side outgrows the threshold. Fact-to-fact joins
    * shuffle on the join key at every scale; dims still broadcast.
    */
  private def q5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, d).hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  private val q5Sql =
    """SELECT n_name,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q10-shaped: top returned-item customers by lost revenue.
    * Dim joins (customer, nation) broadcast; lineitem is filtered on
    * the pushed `l_returnflag = 'R'` predicate before the fact join.
    */
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") >= lit("1994-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-10-01").cast("timestamp"))
      .join(Tables.lineitem(s, d).hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_returnflag") === "R")
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql =
    """SELECT c_custkey, c_name, n_name,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1994-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q18-shaped: large-volume orders (HAVING over a grouped
    * fact scan → semi-join back). The HAVING aggregate runs FIRST and
    * produces a tiny key set that broadcasts into the detail join —
    * the fact table is scanned twice but never shuffled on a fat key.
    */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .where(col("total_qty") > 150.0)
    Tables.orders(s, d)
      .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  private val q18Sql =
    """WITH big AS (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150.0)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM orders
      |JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  private def qWindowRank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("c_custkey"), col("rnk"))
  }

  private val qWindowRankSql =
    """SELECT c_custkey, o_orderkey, o_totalprice, rnk
      |FROM (
      |  SELECT c_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rnk
      |  FROM customer JOIN orders ON c_custkey = o_custkey)
      |WHERE rnk <= 3
      |ORDER BY c_custkey, rnk""".stripMargin

  private def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .withColumn("oyear", year(col("o_orderdate")).cast("string"))
      .rollup(col("n_name"), col("oyear"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("oyear"), lit("ALL")).as("oyear"),
        col("cnt"), col("revenue"))
      .orderBy(col("nation"), col("oyear"))

  private val qRollupSql =
    """SELECT coalesce(n_name, 'ALL') AS nation,
      | coalesce(oyear, 'ALL') AS oyear,
      | count(*) AS cnt,
      | round(sum(o_totalprice), 2) AS revenue
      |FROM (
      |  SELECT n_name, year(o_orderdate)::VARCHAR AS oyear, o_totalprice
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |GROUP BY ROLLUP(n_name, oyear)
      |ORDER BY nation, oyear""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("q1_pricing_summary", q1, Some(q1Sql)),
    Qdef("q3_top_orders", q3, Some(q3Sql)),
    Qdef("q5_region_revenue", q5, Some(q5Sql)),
    Qdef("q10_returned_items", q10, Some(q10Sql)),
    Qdef("q18_big_orders", q18, Some(q18Sql)),
    Qdef("q_window_rank", qWindowRank, Some(qWindowRankSql)),
    Qdef("q_rollup_revenue", qRollup, Some(qRollupSql)))
}
