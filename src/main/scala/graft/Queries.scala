package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Constants._
import graft.operators.{Aggregation, DatasetExpr, DimensionFilter, MappingKernel, Reshape, SetOps}
import graft.functions.{Growth, Units}
import graft.time.{AnnualTime, TimeAdjustments}
import graft.text.{Dedup, TextFunctions}
import graft.ml.Similarity
import graft.multimodal.Multimodal

/** The operator catalog: every query exercises one operator family from
  * SURVEY.md §2 (or a training-data-pipeline extension) against the
  * driver-provided TPC-H-ish tables, and carries an equivalent DuckDB SQL
  * oracle where the semantics are SQL-expressible.
  *
  * Output discipline (driver hash-compares after sorting columns by name):
  *   - integer outputs are BIGINT on both sides;
  *   - double aggregates are rounded identically on both sides;
  *   - results are sorted by their key columns on both sides;
  *   - no raw timestamp outputs (epochs / extracted fields instead).
  */
object Queries {

  case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** events.ts has shipped in three encodings across testdata generations:
    * parquet TIMESTAMP(NANOS) read as long nanos (session sets
    * spark.sql.legacy.parquet.nanosAsLong), plain micros TIMESTAMP_NTZ,
    * or TIMESTAMP. Canonicalize all three to a TIMESTAMP whose UTC wall
    * clock equals the stored wall clock — DuckDB's timezone('UTC', ts)
    * view of the same file. graft sessions set
    * spark.sql.parquet.inferTimestampNTZ.enabled=false, so the NTZ file
    * column already arrives as a UTC-instant TIMESTAMP (session-tz
    * INDEPENDENT — a bare cast would capture the session zone at analysis
    * time and silently shift under withSessionTimeZone scopes, which is
    * how q80 broke when the testdata encoding changed). The NTZ branch
    * below is a fallback for foreign sessions without that conf: it pins
    * the interpretation to UTC explicitly via convert_timezone against
    * the session zone captured at construction. Long nanos convert with
    * integer arithmetic (no double round-trip, so no precision loss). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        val z = df.sparkSession.sessionState.conf.sessionLocalTimeZone
        df.withColumn("ts",
          convert_timezone(lit("UTC"), lit(z), col("ts")).cast(TimestampType))
      case _ => df
    }
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  // ------------------------------------------------------------------
  // Relational core
  // ------------------------------------------------------------------

  /** TPC-H Q1-style aggregation (SURVEY §2.4 query aggregation). */
  val q01_agg = Q(
    "q01_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      Aggregation
        .aggregateMany(
          li.withColumn("disc_price", col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          Seq("l_returnflag", "l_linestatus"),
          Seq(
            ("sum", "l_quantity", "sum_qty"),
            ("sum", "disc_price", "sum_disc_price"),
            ("mean", "l_discount", "avg_disc"),
            ("count", "l_quantity", "n")))
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"),
          round(col("sum_disc_price"), 2).as("sum_disc_price"),
          round(col("avg_disc"), 4).as("avg_disc"),
          col("n").cast("long").as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
            ROUND(SUM(l_quantity), 2) AS sum_qty,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
            ROUND(AVG(l_discount), 4) AS avg_disc,
            CAST(COUNT(l_quantity) AS BIGINT) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** The dimension-filter ADT, all predicate forms composed (SURVEY §2.2). */
  val q02_filter = Q(
    "q02_filter",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val filters = Seq(
        DimensionFilter.ExpressionFilter("l_quantity", ">", 30),
        DimensionFilter.ColumnOperatorFilter("l_returnflag", "isin", Seq("R", "A")),
        DimensionFilter.BetweenFilter("l_discount", 0.02, 0.08),
        DimensionFilter.ColumnOperatorFilter("l_linestatus", "startswith", Seq("F")),
        DimensionFilter.RawFilter("l_tax < 0.07"))
      DimensionFilter
        .applyAll(li, filters)
        .select(
          col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"),
          col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
            CAST(l_linenumber AS BIGINT) AS l_linenumber,
            l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_quantity > 30 AND l_returnflag IN ('R','A')
              AND l_discount BETWEEN 0.02 AND 0.08
              AND l_linestatus LIKE 'F%' AND l_tax < 0.07
            ORDER BY l_orderkey, l_linenumber"""))

  /** Multi-table broadcast join + aggregation (SURVEY §2.3/§2.4). */
  val q03_join_agg = Q(
    "q03_join_agg",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          round(sum(col("c_acctbal")), 2).as("total_acctbal"),
          count(lit(1)).cast("long").as("n_customers"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name, ROUND(SUM(c_acctbal), 2) AS total_acctbal,
            CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** The mapping kernel: aggregation mapping (nation→region) chained with a
    * ×0.5 disaggregation, fraction accumulation, one fraction-collapse
    * groupBy (SURVEY §2.3 mapping join + §2.4 fraction application). */
  val q04_mapping = Q(
    "q04_mapping",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // fact table in the engine's shape: stacked dims + value
      val fact = c.select(
        col("c_nationkey").cast("string").as("geography"),
        col("c_acctbal").as(ValueColumn))
      // mapping 1: nation id -> region name (many-to-one aggregation)
      val m1 = n.join(r, n("n_regionkey") === r("r_regionkey"))
        .select(
          col("n_nationkey").cast("string").as(FromIdColumn),
          col("r_name").as(ToIdColumn),
          lit(1.0).as(FromFractionColumn))
      // mapping 2: region -> two shares at 0.4/0.6 (one-to-many
      // disaggregation). 0.4/0.6 keeps sums on a 0.002 grid so the 2-decimal
      // round never sits on a .005 boundary (0.5 shares did, and the two
      // engines' different summation orders tipped boundary values apart).
      val halves = s.createDataFrame(Seq(("A", 0.4), ("B", 0.6))).toDF("suffix", "frac")
      val m2 = r.crossJoin(halves).select(
        col("r_name").as(FromIdColumn),
        concat(col("r_name"), lit("_"), col("suffix")).as(ToIdColumn),
        col("frac").as(FromFractionColumn))
      val mapped = MappingKernel.mapAndApply(fact, Seq("geography" -> m1, "geography" -> m2))
      mapped
        .select(col("geography"), round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""SELECT r_name || '_' || sfx AS geography,
            ROUND(SUM(c_acctbal * sfrac), 2) AS value
            FROM customer
            JOIN nation ON CAST(c_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR)
            JOIN region ON n_regionkey = r_regionkey
            CROSS JOIN (SELECT 'A' AS sfx, 0.4 AS sfrac UNION ALL SELECT 'B', 0.6) s
            GROUP BY 1 ORDER BY 1"""))

  /** Semi-join (record filtering, SURVEY §2.3). */
  val q05_semi = Q(
    "q05_semi",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o.select(col("o_custkey")), c("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("c_acctbal")), 2).as("total"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(c_acctbal), 2) AS total
            FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Anti-join (expected-missing-association semantics, SURVEY §2.3). */
  val q06_anti = Q(
    "q06_anti",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o.select(col("o_custkey")), c("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("nationkey")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey, CAST(COUNT(*) AS BIGINT) AS n
            FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            GROUP BY 1 ORDER BY 1"""))

  /** EXCEPT ALL (SURVEY §2.7). */
  val q07_except = Q(
    "q07_except",
    (s, dir) => {
      val sup = t(s, dir, "supplier").select(col("s_nationkey").cast("long").as("k"))
      val cust = t(s, dir, "customer").select(col("c_nationkey").cast("long").as("k"))
      SetOps
        .exceptAll(cust, sup)
        .groupBy("k")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("k")
    },
    Some("""SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
            EXCEPT ALL
            SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier)
            GROUP BY k ORDER BY k"""))

  /** INTERSECT distinct (SURVEY §2.7). */
  val q08_intersect = Q(
    "q08_intersect",
    (s, dir) => {
      val sup = t(s, dir, "supplier").select(col("s_nationkey").cast("long").as("k"))
      val cust = t(s, dir, "customer").select(col("c_nationkey").cast("long").as("k"))
      SetOps.intersect(cust, sup).orderBy("k")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
            INTERSECT
            SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier
            ORDER BY k"""))

  /** Pivot: stacked → one column per record (SURVEY §2.8). */
  val q09_pivot = Q(
    "q09_pivot",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice").as(ValueColumn))
      Reshape
        .pivot(o, "o_orderstatus", values = Seq("F", "O", "P"))
        .select(
          col("o_orderpriority"),
          round(col("F"), 2).as("f_total"),
          round(col("O"), 2).as("o_total"),
          round(col("P"), 2).as("p_total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
            ROUND(SUM(CASE WHEN o_orderstatus='F' THEN o_totalprice END), 2) AS f_total,
            ROUND(SUM(CASE WHEN o_orderstatus='O' THEN o_totalprice END), 2) AS o_total,
            ROUND(SUM(CASE WHEN o_orderstatus='P' THEN o_totalprice END), 2) AS p_total
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Unpivot: wide → stacked (SURVEY §2.8). */
  val q10_unpivot = Q(
    "q10_unpivot",
    (s, dir) => {
      val p = t(s, dir, "part").select(
        col("p_partkey").cast("long").as("p_partkey"),
        col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      Reshape
        .unpivot(p, Seq("p_partkey"), Seq("retailprice", "size"), "attr", "val")
        .orderBy("p_partkey", "attr")
    },
    Some("""SELECT CAST(p_partkey AS BIGINT) AS p_partkey, 'retailprice' AS attr,
            CAST(p_retailprice AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT CAST(p_partkey AS BIGINT), 'size', CAST(p_size AS DOUBLE) FROM part
            ORDER BY p_partkey, attr"""))

  /** Peak rows per group, all-ties semantics (report_peak_load shape,
    * SURVEY §2.4/§2.6). */
  val q11_peak = Q(
    "q11_peak",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col(ValueColumn))
      Aggregation
        .peakRowsPerGroupAllTies(e, Seq("user_id"), ValueColumn)
        .select(
          col("user_id").cast("long").as("user_id"),
          unix_timestamp(col("ts")).as("epoch"),
          col(ValueColumn))
        .orderBy("user_id", "epoch")
    },
    Some("""SELECT CAST(e.user_id AS BIGINT) AS user_id,
            CAST(FLOOR(EPOCH(e.ts)) AS BIGINT) AS epoch, e.value
            FROM events e
            JOIN (SELECT user_id, MAX(value) AS value FROM events GROUP BY user_id) m
            ON e.user_id = m.user_id AND e.value = m.value
            ORDER BY user_id, epoch"""))

  /** Deterministic top-k per group via window row_number (SURVEY §2.5/§2.6). */
  val q12_topk = Q(
    "q12_topk",
    (s, dir) => {
      val o = t(s, dir, "orders")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(desc("o_totalprice"), asc("o_orderkey"))
      o.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(
          col("o_orderpriority"),
          col("rank").cast("long").as("rank"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice"))
        .orderBy("o_orderpriority", "rank")
    },
    Some("""SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank,
            CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank FROM orders)
            WHERE rank <= 3 ORDER BY o_orderpriority, rank"""))

  /** Calendar aggregation on the time column (SURVEY §2.9). */
  val q13_time_agg = Q(
    "q13_time_agg",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(
          year(col("ts")).cast("long").as("y"),
          dayofmonth(col("ts")).cast("long").as("d"),
          col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col(ValueColumn)), 2).as("total"))
        .orderBy("y", "d", "event_type")
    },
    Some("""SELECT CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
            CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, event_type,
            CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total
            FROM events GROUP BY 1, 2, 3 ORDER BY y, d, event_type"""))

  /** Unit-conversion when-ladder (SURVEY §2.10): mixed-unit values
    * normalized to GWh, no UDFs. */
  val q14_units = Q(
    "q14_units",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
        .withColumn(
          "unit",
          when(col("s_suppkey") % 3 === 0, "kWh")
            .when(col("s_suppkey") % 3 === 1, "MWh")
            .otherwise("GWh"))
      val converted = sup.withColumn(
        "gwh",
        Units.convertEnergy(col("s_acctbal"), col("unit"), lit("GWh")))
      converted
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(round(sum(col("gwh")), 4).as("total_gwh"))
        .orderBy("nationkey")
    },
    Some("""SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
            ROUND(SUM(CASE
              WHEN u = 'GWh' THEN s_acctbal
              ELSE s_acctbal * (CASE u WHEN 'kWh' THEN 1.0 WHEN 'MWh' THEN 1000.0 END) / 1000000.0
            END), 4) AS total_gwh
            FROM (SELECT *, CASE CAST(s_suppkey % 3 AS INT) WHEN 0 THEN 'kWh' WHEN 1 THEN 'MWh'
              ELSE 'GWh' END AS u FROM supplier)
            GROUP BY 1 ORDER BY 1"""))

  /** Dataset-expression arithmetic `a - b` with aligned-row join
    * (SURVEY §2.10 expression language + §2.3 aligned arithmetic). */
  val q15_expr_arith = Q(
    "q15_expr_arith",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def byStatus(status: String): DataFrame =
        o.filter(col("o_orderstatus") === status)
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("o_totalprice")).as(ValueColumn))
      val result = DatasetExpr.evaluate("a - b", Map("a" -> byStatus("O"), "b" -> byStatus("F")))
      result
        .select(col("o_orderpriority"), round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT a.o_orderpriority, ROUND(a.v - b.v, 2) AS value FROM
            (SELECT o_orderpriority, SUM(o_totalprice) AS v FROM orders
             WHERE o_orderstatus='O' GROUP BY 1) a
            JOIN
            (SELECT o_orderpriority, SUM(o_totalprice) AS v FROM orders
             WHERE o_orderstatus='F' GROUP BY 1) b
            USING (o_orderpriority) ORDER BY o_orderpriority"""))

  /** Dataset-expression union `a | b` (SURVEY §2.7/§2.10). */
  val q16_expr_union = Q(
    "q16_expr_union",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def slice(status: String): DataFrame =
        o.filter(col("o_orderstatus") === status)
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("o_totalprice")).as(ValueColumn))
          .withColumn("src", lit(status))
      val result = DatasetExpr.evaluate("a | b", Map("a" -> slice("O"), "b" -> slice("F")))
      result
        .select(col("o_orderpriority"), col("src"), round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("o_orderpriority", "src")
    },
    Some("""SELECT o_orderpriority, src, ROUND(v, 2) AS value FROM (
            SELECT o_orderpriority, 'O' AS src, SUM(o_totalprice) AS v FROM orders
            WHERE o_orderstatus='O' GROUP BY 1
            UNION ALL
            SELECT o_orderpriority, 'F' AS src, SUM(o_totalprice) AS v FROM orders
            WHERE o_orderstatus='F' GROUP BY 1)
            ORDER BY o_orderpriority, src"""))

  /** Scaling-factor application with NULL passthrough (SURVEY §2.4). */
  val q17_scaling = Q(
    "q17_scaling",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn(ValueColumn, col("l_extendedprice"))
        .withColumn(
          ScalingFactorColumn,
          when(col("l_tax") > 0.04, lit(1.0) + col("l_tax")).otherwise(lit(null).cast("double")))
      MappingKernel
        .applyScalingFactor(li)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col(ValueColumn)), 2).as("total"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, ROUND(SUM(
              CASE WHEN l_tax > 0.04 THEN l_extendedprice * (1.0 + l_tax)
                   ELSE l_extendedprice END), 2) AS total
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Exponential-growth projection (SURVEY §2.10): rate 1.0 → exact 2^k. */
  val q18_growth = Q(
    "q18_growth",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("model_year", (lit(2020) + col("o_orderkey") % 5).cast("string"))
        .select(col("model_year"), col("o_totalprice").as(ValueColumn))
      val years = s.createDataFrame((0 until 5).map(i => ((2020 + i).toString, 1.0))).toDF("model_year", ValueColumn)
      Growth
        .applyExponentialGrowthRate(o, years, Seq("model_year"), "model_year", 2020)
        .groupBy(col("model_year"))
        .agg(round(sum(col(ValueColumn)), 2).as("projected"))
        .orderBy("model_year")
    },
    Some("""SELECT CAST(2020 + o_orderkey % 5 AS VARCHAR) AS model_year,
            ROUND(SUM(o_totalprice * POWER(2.0, CAST(o_orderkey % 5 AS INT))), 2) AS projected
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Cross join (SURVEY §2.3). */
  val q19_cross = Q(
    "q19_cross",
    (s, dir) => {
      val r = t(s, dir, "region").select(col("r_name"))
      val st = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
      r.crossJoin(st).orderBy("r_name", "o_orderstatus")
    },
    Some("""SELECT r_name, o_orderstatus FROM region
            CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
            ORDER BY r_name, o_orderstatus"""))

  /** Annual → hourly time expansion, sum-preserving (SURVEY §2.9). */
  val q20_annual = Q(
    "q20_annual",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val annual = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(
          col("n_name").as("geography"),
          (lit(2020) + col("n_nationkey") % 2).cast("string").as("model_year"))
        .agg(sum(col("c_acctbal")).as(ValueColumn))
      val expanded = AnnualTime.annualToDatetime(annual, "model_year", 3600L, valueIsTotal = true)
      expanded
        .groupBy(col("model_year"))
        .agg(count(lit(1)).cast("long").as("n_hours"), round(sum(col(ValueColumn)), 2).as("total"))
        .orderBy("model_year")
    },
    Some("""SELECT CAST(2020 + n_nationkey % 2 AS VARCHAR) AS model_year,
            CAST(COUNT(DISTINCT n_name) * (CASE WHEN n_nationkey % 2 = 0 THEN 8784 ELSE 8760 END) AS BIGINT) AS n_hours,
            ROUND(SUM(c_acctbal), 2) AS total
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY CAST(2020 + n_nationkey % 2 AS VARCHAR), n_nationkey % 2
            ORDER BY model_year"""))

  /** Per-geography time-zone conversion (SURVEY §2.9): January data, fixed
    * offsets, local-hour histogram. */
  val q21_tz = Q(
    "q21_tz",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn(
          TimeZoneColumn,
          when(col("user_id") % 3 === 0, "America/New_York")
            .when(col("user_id") % 3 === 1, "America/Denver")
            .otherwise("UTC"))
      e.withColumn("local", from_utc_timestamp(col("ts"), col(TimeZoneColumn)))
        .groupBy(col(TimeZoneColumn), hour(col("local")).cast("long").as("local_hour"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(TimeZoneColumn, "local_hour")
    },
    Some("""SELECT tz AS time_zone, CAST((EXTRACT(hour FROM ts) + 24 +
              CASE tz WHEN 'America/New_York' THEN -5
                      WHEN 'America/Denver' THEN -7 ELSE 0 END) % 24 AS BIGINT) AS local_hour,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT *, CASE CAST(user_id % 3 AS INT)
              WHEN 0 THEN 'America/New_York' WHEN 1 THEN 'America/Denver'
              ELSE 'UTC' END AS tz FROM events)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Leap-day-style calendar adjustment: drop Jan 1 rows (SURVEY §2.9). */
  val q22_calendar_adjust = Q(
    "q22_calendar_adjust",
    (s, dir) => {
      val e = t(s, dir, "events")
      TimeAdjustments
        .adjustLeapDay(e, "ts", TimeAdjustments.DropJan1)
        .groupBy(dayofmonth(col("ts")).cast("long").as("d"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("d")
    },
    Some("""SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            WHERE NOT (EXTRACT(month FROM ts) = 1 AND EXTRACT(day FROM ts) = 1)
            GROUP BY 1 ORDER BY 1"""))

  /** JSON property extraction (events.props is a JSON string). */
  val q23_json = Q(
    "q23_json",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(round(sum(col("k")), 2).cast("long").as("sum_k"), count(lit(1)).cast("long").as("n"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------
  // Training-data pipeline extensions
  // ------------------------------------------------------------------

  /** Token counting over documents (text analysis). */
  val q24_tokens = Q(
    "q24_tokens",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(
          col("doc_id").cast("long").as("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
            CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
            CAST(n_chars AS BIGINT) AS n_chars
            FROM documents ORDER BY doc_id"""))

  /** Quality-score features: stopword ratio (text analysis). */
  val q25_quality = Q(
    "q25_quality",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("toks", TextFunctions.tokens(lower(col("text"))))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          round(TextFunctions.stopwordRatioFromTokens(col("toks")), 4).as("stopword_ratio"))
        .orderBy("doc_id")
    },
    Some {
      val words = TextFunctions.englishStopwords.map(w => s"'$w'").mkString(", ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
          ROUND(CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(len(list_filter(toks, t -> list_contains([$words], t))) AS DOUBLE) / len(toks) END, 4) AS stopword_ratio
          FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS toks
                FROM documents) ORDER BY doc_id"""
    })

  /** Exact deduplication by normalized-content hash; corpus augmented with
    * exact copies so the dedup has something to find. */
  val q26_dedup_exact = Q(
    "q26_dedup_exact",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.withColumn("doc_id", col("doc_id") + 1000000L)
      val corpus = d.unionByName(copies)
      corpus
        .select(col("doc_id"), md5(TextFunctions.normalize(col("text"))).as("fp"))
        .groupBy("fp")
        .agg(min(col("doc_id")).cast("long").as("keep_id"), count(lit(1)).cast("long").as("n_dups"))
        .orderBy("keep_id")
    },
    Some("""SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp,
            CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_dups
            FROM (SELECT doc_id, text FROM documents
                  UNION ALL SELECT doc_id + 1000000, text FROM documents)
            GROUP BY 1 ORDER BY keep_id"""))

  /** Brute-force cosine top-k over embeddings (similarity baseline). */
  val q27_ann_brute = Q(
    "q27_ann_brute",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val queries = emb.filter(col("vec_id") < 5)
      Similarity
        .bruteForceTopK(queries, emb, k = 5)
        .select(
          col("query_id").cast("long").as("query_id"),
          col("rank").cast("long").as("rank"),
          col("neighbor_id").cast("long").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c
              WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
              CAST(neighbor_id AS BIGINT) AS neighbor_id, ROUND(cos, 4) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH; the
    * corpus is augmented with rescaled copies (cosine exactly 1). */
  val q28_cos_neardup = Q(
    "q28_cos_neardup",
    (s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val copies = emb.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val corpus = emb.unionByName(copies)
      Similarity
        .cosineNearDuplicates(corpus, threshold = 0.99)
        .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"))
        .orderBy("id1", "id2")
    },
    Some("""WITH c AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x * 2.0 AS DOUBLE)) FROM embeddings)
            SELECT CAST(a.vec_id AS BIGINT) AS id1, CAST(b.vec_id AS BIGINT) AS id2
            FROM c a CROSS JOIN c b
            WHERE a.vec_id < b.vec_id
              AND list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.99
            ORDER BY id1, id2"""))

  /** MinHash+LSH near-dup detection, exact-Jaccard verified; corpus
    * augmented with last-word-dropped copies (Jaccard ≈ (m-1)/m ≥ 0.9, LSH
    * detection probability ≈ 1 at 16 bands × 4 rows). */
  val q29_dedup_minhash = Q(
    "q29_dedup_minhash",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val clipped = d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), lit(1), size(split(trim(col("text")), "\\s+")) - 1), " ")
          .as("text"))
      val corpus = d.unionByName(clipped)
      Dedup
        .minhashNearDuplicates(corpus, "doc_id", "text", bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
        .select(
          col("id1").cast("long").as("id1"),
          col("id2").cast("long").as("id2"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id1", "id2")
    },
    Some("""WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000,
                array_to_string(toks[1:len(toks)-1], ' ')
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)),
            sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM corpus)),
            sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
            ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS ic
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id1, id2, CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic) AS jaccard
              FROM inter JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2)
            SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
              ROUND(jaccard, 4) AS jaccard
            FROM pairs WHERE jaccard >= 0.8 ORDER BY id1, id2"""))

  /** Language-ID heuristic: stopword-profile argmax (rows-only check — the
    * fold-based argmax is replicated in SQL generated from the same
    * profiles). */
  val q30_lang = Q(
    "q30_lang",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("toks", array_distinct(TextFunctions.tokens(lower(col("text")))))
        .select(TextFunctions.languageIdFromTokens(col("toks")).as("lang_pred"))
        .groupBy("lang_pred")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("lang_pred")
    },
    Some {
      val profiles = TextFunctions.languageProfiles.toSeq.sortBy(_._1)
      val scoreDefs = profiles.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"len(list_intersect(toks, [$list])) AS s_$lang"
      }.mkString(", ")
      // replicate the fold: start (und,0); strictly-greater replaces
      val fold = profiles.foldLeft(("'und'", "0")) { case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN s_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN s_$lang > $bs THEN s_$lang ELSE $bs END)")
      }._1
      s"""SELECT $fold AS lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT $scoreDefs FROM (
            SELECT list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)) AS toks
            FROM documents))
          GROUP BY 1 ORDER BY 1"""
    })

  /** SimHash near-dup pairs. The oracle replicates the engine-internal
    * xxhash64 bit-for-bit in pure DuckDB SQL (`tools.OracleSql`) and
    * replays the whole pipeline independently: per-token hash → 64 bit
    * votes → signature → rotate-and-block buckets → Hamming verify. */
  val q31_dedup_simhash = Q(
    "q31_dedup_simhash",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val clipped = d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), lit(1), size(split(trim(col("text")), "\\s+")) - 1), " ")
          .as("text"))
      val corpus = d.unionByName(clipped)
      Dedup
        .simhashNearDuplicates(corpus, "doc_id", "text", maxDistance = 3)
        .select(
          col("id1").cast("long").as("id1"),
          col("id2").cast("long").as("id2"),
          col("distance").cast("long").as("distance"))
        .orderBy("id1", "id2")
    },
    Some {
      import graft.tools.OracleSql._
      val corpus =
        s"""SELECT doc_id::BIGINT AS doc_id, text FROM documents
            UNION ALL
            SELECT doc_id::BIGINT + 1000000 AS doc_id,
                   array_to_string(rt[1:len(rt)-1], ' ') AS text
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS rt FROM documents)"""
      val toks =
        s"""SELECT doc_id, tok FROM (
              SELECT doc_id, unnest(string_split(${normalizeSql("text")}, ' ')) AS tok
              FROM ($corpus)) WHERE len(tok) > 0"""
      val hashed = xxhash64Stages(toks, "tok", "th", pfx = "__t")
      val bitsums = (0 until 64)
        .map(j => s"SUM(CASE WHEN (hu >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
        .mkString(", ")
      val sigexpr = (0 until 64)
        .map(j => s"CASE WHEN b$j > 0 THEN ${java.lang.Long.toUnsignedString(1L << j)}::HUGEINT ELSE 0::HUGEINT END")
        .mkString(" + ")
      s"""WITH hashed AS (
            SELECT doc_id, CASE WHEN th < 0 THEN CAST(th::HUGEINT + 18446744073709551616::HUGEINT AS UBIGINT)
                                ELSE CAST(th AS UBIGINT) END AS hu
            FROM ($hashed)),
          bits AS (SELECT doc_id, $bitsums FROM hashed GROUP BY doc_id),
          sig AS (SELECT doc_id, CAST(($sigexpr) AS UBIGINT) AS sigu FROM bits),
          buckets AS (
            SELECT doc_id, sigu, bb.b AS blk, (sigu >> (16 * bb.b)) & 65535 AS key
            FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) bb(b))
          SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                 CAST(bit_count(xor(a.sigu, b.sigu)) AS BIGINT) AS distance
          FROM buckets a JOIN buckets b ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sigu, b.sigu)) <= 3
          ORDER BY id1, id2"""
    })

  /** IVF nearest neighbors through the k-means|| default seeding path.
    * Probes = cells makes the result EXACT for any centroid set (the
    * q57 trick), so the full kmeans|| → Lloyd → assign → probe pipeline
    * gets a real brute-force DuckDB oracle; the approximate low-probe
    * behavior stays covered by the recall spec (TextMlSpec). */
  val q32_ann_ivf = Q(
    "q32_ann_ivf",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val centroids = Similarity.kmeansCentroids(emb, numCentroids = 8, iterations = 3)
      val cells = Similarity.assignToCentroids(emb, centroids)
      val queries = emb.filter(col("vec_id") < 5)
      Similarity
        .ivfTopK(queries, cells, centroids, k = 5, probes = 8)
        .select(
          col("query_id").cast("long").as("query_id"),
          col("rank").cast("long").as("rank"),
          col("neighbor_id").cast("long").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c
              WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
              CAST(neighbor_id AS BIGINT) AS neighbor_id, ROUND(cos, 4) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Multimodal pipeline over REAL codecs: deterministic solid-gray
    * PNG/BMP/GIF images and silent WAVs (JDK ImageIO + javax.sound)
    * round-trip through header-dims decode, audio-duration decode and
    * block-luminance features. The oracle recomputes every aggregate
    * ANALYTICALLY from the generator's closed-form parameters — if any
    * codec mis-decodes dims, duration or pixel values, the hashes
    * diverge. Fixture values are dyadic (gray/256, frames/8192) so float
    * and double arithmetic agree exactly on both sides. */
  val q33_multimodal = Q(
    "q33_multimodal",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(s, 300)
      val withDims = Multimodal.decodeImageDims(media)
      val withAudio = Multimodal.decodeAudioSeconds(withDims)
      val withFeatures = Multimodal.extractFeatures(withAudio)
      withFeatures
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(avg(col("width")), 2).as("avg_width"),
          round(avg(aggregate(col("features"), lit(0.0), (acc, x) => acc + x)), 4).as("avg_feature_sum"),
          round(avg(col("audio_seconds")), 4).as("avg_audio_secs"))
        .orderBy("media_type")
    },
    Some("""WITH per AS (
              SELECT CASE WHEN range % 3 = 0 THEN 'image'
                          WHEN range % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
                     -- image dims/gray and wav frames replay syntheticMedia's formulas
                     CASE WHEN range % 3 = 0 THEN 8 + ((range // 3) % 5) * 4 ELSE 0 END AS width,
                     -- 16 block features of a solid-gray image each equal gray/256
                     CASE WHEN range % 3 = 0 THEN 16 * (((range * 7) % 256) / 256.0) ELSE 0.0 END AS fsum,
                     CASE WHEN range % 3 = 1 THEN (1 + (range % 5)) / 8.0 ELSE 0.0 END AS secs
              FROM range(300))
            SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(AVG(width), 2) AS avg_width,
                   ROUND(AVG(fsum), 4) AS avg_feature_sum,
                   ROUND(AVG(secs), 4) AS avg_audio_secs
            FROM per GROUP BY 1 ORDER BY 1"""))

  /** Document fingerprinting with an order-sensitive rolling hash: shows
    * reordered text fingerprints differently while the exact-normalized
    * fingerprint would not. Both hashes are oracle-checked: the DuckDB SQL
    * replays xxhash64 bit-for-bit (`tools.OracleSql`) for the content
    * fingerprint and per-token hashes, and rebuilds the positional
    * 31^i-weighted modular sum with a recursive power table. */
  val q34_fingerprint = Q(
    "q34_fingerprint",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // fingerprint rides along as a group key so one explode+groupBy pass
      // computes both hashes (rollingHashByDoc = the codegen'd form)
      val base = d.select(
        col("doc_id").cast("long").as("doc_id"),
        col("text"),
        TextFunctions.fingerprint(col("text")).as("content_fp"))
      TextFunctions
        .rollingHashByDoc(base, Seq("doc_id", "content_fp"), "text", "rolling_fp")
        .orderBy("doc_id")
    },
    Some {
      import graft.tools.OracleSql._
      val base = s"SELECT doc_id::BIGINT AS doc_id, ${normalizeSql("text")} AS norm FROM documents"
      val fp = xxhash64Stages(base, "norm", "content_fp", pfx = "__f")
      val toks =
        s"""SELECT doc_id, tok, p FROM (
              SELECT doc_id, unnest(string_split(norm, ' ')) AS tok,
                     generate_subscripts(string_split(norm, ' '), 1) AS p
              FROM fpc) WHERE len(tok) > 0"""
      // hash DISTINCT tokens, join back (vocab << token stream — the
      // staged XXH64 expression is the oracle's dominant cost)
      val hashedD = xxhash64Stages("SELECT DISTINCT tok FROM tk", "tok", "th", pfx = "__t")
      s"""WITH RECURSIVE fpc AS ($fp),
          tk AS ($toks),
          hd AS ($hashedD),
          hashed AS (SELECT tk.doc_id, tk.p, hd.th FROM tk JOIN hd USING (tok)),
          pw(i, v) AS (
            SELECT 1, 1::BIGINT
            UNION ALL
            SELECT i + 1, (v * 31) % 2147483647 FROM pw
            WHERE i < (SELECT coalesce(max(p), 1) FROM hashed)),
          rolled AS (
            SELECT h.doc_id,
                   CAST(SUM((((h.th % 2147483647) + 2147483647) % 2147483647) * pw.v % 2147483647) % 2147483647 AS BIGINT) AS rolling_fp
            FROM hashed h JOIN pw ON pw.i = h.p
            GROUP BY h.doc_id)
          SELECT f.doc_id, f.content_fp, coalesce(r.rolling_fp, 0) AS rolling_fp
          FROM fpc f LEFT JOIN rolled r ON r.doc_id = f.doc_id
          ORDER BY f.doc_id"""
    })

  /** Index time → datetime (SURVEY §2.9): integer step index + per-row tz
    * → UTC instants. January only, so fixed offsets mirror cleanly in SQL. */
  val q35_index_time = Q(
    "q35_index_time",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
        .select(
          col("s_suppkey"),
          (col("s_suppkey") % 24).cast("long").as("time_index"),
          when(col("s_nationkey") % 3 === 0, "America/New_York")
            .when(col("s_nationkey") % 3 === 1, "America/Denver")
            .otherwise("UTC").as(TimeZoneColumn))
      graft.time.IndexTime
        .indexToDatetime(sup, "time_index", "2024-01-01 00:00:00", 3600L)
        .select(
          col("s_suppkey").cast("long").as("s_suppkey"),
          unix_timestamp(col("timestamp")).as("epoch"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
            CAST(1704067200 + (s_suppkey % 24) * 3600 +
              CASE CAST(s_nationkey % 3 AS INT)
                WHEN 0 THEN 5 * 3600
                WHEN 1 THEN 7 * 3600
                ELSE 0 END AS BIGINT) AS epoch
            FROM supplier ORDER BY s_suppkey"""))

  /** Representative-period expansion (SURVEY §2.9): (month, day_of_week,
    * hour) template joined onto a January hourly spine. */
  val q36_rep_period = Q(
    "q36_rep_period",
    (s, dir) => {
      val template = s.createDataFrame(Seq(
        ("g1", 1, 0, 5, 10.0), // Mondays 05:00
        ("g1", 1, 5, 17, 20.0), // Saturdays 17:00
        ("g1", 1, 6, 0, 30.0))) // Sundays 00:00
        .toDF("geography", "month", "day_of_week", "hour", ValueColumn)
      val spine = graft.time.TimeSpine.spine(s, "2024-01-01 00:00:00", "2024-01-31 23:00:00", 3600L)
      val tzs = s.createDataFrame(Seq(("g1", "UTC"))).toDF("id", "time_zone")
      graft.time.RepresentativePeriodTime
        .oneWeekPerMonthByHour(template, spine, "geography", tzs)
        .select(
          col("geography"),
          unix_timestamp(col("timestamp")).as("epoch"),
          col(ValueColumn))
        .orderBy("epoch")
    },
    Some("""WITH spine AS (
              SELECT ts FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                TIMESTAMP '2024-01-31 23:00:00', INTERVAL 1 HOUR) AS g(ts)),
            template(geography, m, dow, h, value) AS (
              VALUES ('g1', 1, 0, 5, 10.0), ('g1', 1, 5, 17, 20.0), ('g1', 1, 6, 0, 30.0))
            SELECT geography, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch, value
            FROM spine JOIN template
              ON EXTRACT(month FROM ts) = m
             AND (CAST(EXTRACT(dow FROM ts) AS INT) + 6) % 7 = dow
             AND EXTRACT(hour FROM ts) = h
            ORDER BY epoch"""))

  /** Null-preserving unpivot (SURVEY §2.8): expected-missing rows carried as
    * all-null value columns come back as explicit null-value rows. */
  val q37_unpivot_nulls = Q(
    "q37_unpivot_nulls",
    (s, dir) => {
      val p = t(s, dir, "part")
      // engineer: every 5th part is an expected-missing (all-null) row
      val wide = p.select(
        col("p_partkey").cast("long").as("p_partkey"),
        when(col("p_partkey") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("p_retailprice")).as("m1"),
        when(col("p_partkey") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("p_size").cast("double")).as("m2"))
      Reshape
        .unpivotPreservingNulls(wide, Seq("p_partkey"), Seq("m1", "m2"), "attr")
        .orderBy("p_partkey", "attr")
    },
    Some("""SELECT p_partkey, attr, value FROM (
            SELECT CAST(p_partkey AS BIGINT) AS p_partkey, 'm1' AS attr,
              CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_retailprice END AS value
            FROM part
            UNION ALL
            SELECT CAST(p_partkey AS BIGINT), 'm2',
              CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE CAST(p_size AS DOUBLE) END
            FROM part)
            ORDER BY p_partkey, attr"""))

  /** Records-lookup join: ids → display names via broadcast records
    * (SURVEY §2.3 records-lookup; table_format_handler_base ids→names). */
  val q38_names = Q(
    "q38_names",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("string").as("geography"), col("c_acctbal").as(ValueColumn))
      val records = t(s, dir, "nation")
        .select(col("n_nationkey").cast("string").as("id"), col("n_name").as("name"))
      MappingKernel
        .idsToNames(c, "geography", records)
        .groupBy("geography")
        .agg(round(sum(col(ValueColumn)), 2).as("total"), count(lit(1)).cast("long").as("n"))
        .orderBy("geography")
    },
    Some("""SELECT n_name AS geography, ROUND(SUM(c_acctbal), 2) AS total,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY 1"""))

  /** Count-distinct per group (SURVEY §2.4). */
  val q39_count_distinct = Q(
    "q39_count_distinct",
    (s, dir) => {
      val e = t(s, dir, "events")
      Aggregation
        .aggregate(e, Seq("event_type"), "count_distinct", valueColumn = "user_id", as = Some("n_users"))
        .select(col("event_type"), col("n_users").cast("long").as("n_users"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Quality features: punctuation ratio + mean word length (text analysis). */
  val q40_quality_features = Q(
    "q40_quality_features",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("toks", TextFunctions.tokens(col("text")))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          round(TextFunctions.punctuationRatio(col("text")), 4).as("punct_ratio"),
          round(TextFunctions.meanWordLengthFromTokens(col("toks")), 4).as("mean_word_len"))
        .orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
            ROUND(CASE WHEN len(text) = 0 THEN 0.0
              ELSE CAST(len(text) - len(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE) / len(text) END, 4) AS punct_ratio,
            ROUND(CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END, 4) AS mean_word_len
            FROM (SELECT doc_id, text,
              list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0) AS toks
              FROM documents) ORDER BY doc_id"""))

  /** Distributed time-spine generation (SURVEY §2.9): a year's hourly spine
    * via sequence+explode, no driver loop. */
  val q41_spine = Q(
    "q41_spine",
    (s, dir) => {
      graft.time.TimeSpine
        .yearHourlySpine(s, 2024)
        .agg(
          count(lit(1)).cast("long").as("n"),
          min(unix_timestamp(col("timestamp"))).as("first_epoch"),
          max(unix_timestamp(col("timestamp"))).as("last_epoch"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(MIN(FLOOR(EPOCH(ts))) AS BIGINT) AS first_epoch,
            CAST(MAX(FLOOR(EPOCH(ts))) AS BIGINT) AS last_epoch
            FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
              TIMESTAMP '2024-12-31 23:00:00', INTERVAL 1 HOUR) AS g(ts)"""))

  /** Annual multiplier growth (SURVEY §2.10): value * r joined on dims. */
  val q42_annual_multiplier = Q(
    "q42_annual_multiplier",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice").as(ValueColumn))
      val mult = t(s, dir, "orders")
        .select("o_orderpriority").distinct()
        .withColumn(ValueColumn, lit(1.0) + (length(col("o_orderpriority")) % 3) * 0.25)
      Growth
        .applyAnnualMultiplier(o, mult, Seq("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col(ValueColumn)), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
            ROUND(SUM(o_totalprice * (1.0 + (LENGTH(o_orderpriority) % 3) * 0.25)), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** CSV sink round-trip (SURVEY §2.1 sinks): write header CSV, read back
    * with schema (rows-only — exercises Writers.csv + Readers.csv). */
  val q43_csv_roundtrip = Q(
    "q43_csv_roundtrip",
    (s, dir) => {
      val agg = t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(round(sum(col("o_totalprice")), 2).as("total"))
      val out = s.conf.get("spark.local.dir", "/tmp") + "/graft_csv_roundtrip"
      graft.sources.Writers.csv(agg, out, singleFile = true)
      graft.sources.Readers
        .csv(s, out, Some(graft.core.FileSchema(Seq("o_orderpriority" -> "STRING", "total" -> "DOUBLE"))))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Full declarative pipeline (SURVEY §3): register a project (dataset +
    * mapping + dimension records) into a filesystem registry, then run a
    * ProjectQuery through the Submitter — mapping join, fraction collapse,
    * filter, aggregation, ids→names, sort. */
  val q44_project_query = Q(
    "q44_project_query",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val q = ProjectQuery(
        name = "regional_balances",
        datasets = DatasetSection(Seq(
          DatasetRef("accounts", Seq(DimensionMappingRef("geography", "nation_to_region"))))),
        result = ResultSection(
          filters = Seq(graft.operators.DimensionFilter.ColumnOperatorFilter(
            "sector", "isin", Seq("BUILDING", "MACHINERY", "AUTOMOBILE"))),
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography", "sector"))),
          idsToNames = Seq("sector"),
          sortBy = Seq("geography", "sector")))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(col("geography"), col("sector"), round(col(ValueColumn), 2).as(ValueColumn))
    },
    Some("""SELECT r_name AS geography, LOWER(c_mktsegment) AS sector,
            ROUND(SUM(c_acctbal), 2) AS value
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Two-table dataset layout (SURVEY §1.1/§2.3): load_data carries
    * (id, value); the broadcast lookup join attaches the dimensions. */
  val q45_two_table = Q(
    "q45_two_table",
    (s, dir) => {
      val loadData = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("id"), col("l_extendedprice").as(ValueColumn))
      val lookup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("id"), col("s_nationkey").cast("string").as("geography"))
      MappingKernel
        .joinLookup(loadData, lookup)
        .groupBy(col("geography"))
        .agg(round(sum(col(ValueColumn)), 2).as("total"), count(lit(1)).cast("long").as("n"))
        .select(col("geography").cast("long").as("geography"), col("total"), col("n"))
        .orderBy("geography")
    },
    Some("""SELECT CAST(s_nationkey AS BIGINT) AS geography,
            ROUND(SUM(l_extendedprice), 2) AS total, CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1 ORDER BY 1"""))

  /** Interval resampling with measurement-type semantics (SURVEY §2.9 /
    * chronify): events downsampled to daily buckets, TOTAL measurement. */
  val q46_resample = Q(
    "q46_resample",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.Resample
        .downsample(e, "ts", 86400L, "total", Seq("event_type"))
        .select(
          unix_timestamp(col("ts")).as("epoch"),
          col("event_type"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("epoch", "event_type")
    },
    Some("""SELECT CAST(FLOOR(EPOCH(ts) / 86400) * 86400 AS BIGINT) AS epoch, event_type,
            ROUND(SUM(value), 2) AS value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Shared project registries over the test tables, built once per
    * (JVM, sf-dir): registration is data preparation, not query work — the
    * reference's queries run against pre-registered projects too, and every
    * other catalog query reads pre-existing parquet. Two roots because the
    * TPC-H-derived project and the events-derived metering project define
    * different `geography` dimension records. */
  private val registryMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), graft.registry.Registry]

  /** Memo key includes the Spark application id: a memoized Registry holds
    * its SparkSession, so a fresh session in the same JVM must rebuild.
    * Entries whose session has stopped are dropped so a long-lived JVM that
    * cycles sessions doesn't accumulate dead object graphs. */
  private def memoKey(s: SparkSession, dir: String, kind: String) = {
    registryMemo.filterInPlace((_, reg) => !reg.spark.sparkContext.isStopped)
    (dir, kind, s.sparkContext.applicationId)
  }

  /** Build both shared registries eagerly — callers that want registration
    * (data prep) off their own clock, e.g. the bench harness's untimed
    * warmup, call this before the timed loop. */
  def prewarmRegistries(s: SparkSession, dir: String): Unit = {
    coreRegistry(s, dir)
    meterRegistry(s, dir)
  }

  /** Core project: accounts/cust_bal/supp_bal datasets, nation→region
    * mapping, region-level geography records, sector records. */
  private def coreRegistry(s: SparkSession, dir: String): graft.registry.Registry =
    registryMemo.getOrElseUpdate(memoKey(s, dir, "core"), {
      import graft.registry.Registry
      val root = java.nio.file.Files.createTempDirectory("graft-registry-core").toString
      val reg = Registry(s, root)
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      Registry.registerDataset(reg, "accounts",
        c.select(
          col("c_nationkey").cast("string").as("geography"),
          col("c_mktsegment").as("sector"),
          col("c_acctbal").as(ValueColumn)))
      Registry.registerDataset(reg, "cust_bal",
        c.select(
          col("c_nationkey").cast("string").as("nation_code"),
          col("c_acctbal").as(ValueColumn)))
      Registry.registerDataset(reg, "supp_bal",
        t(s, dir, "supplier").select(
          col("s_nationkey").cast("string").as("geo_id"),
          col("s_acctbal").as(ValueColumn)))
      Registry.registerMapping(reg, "nation_to_region",
        n.join(r, n("n_regionkey") === r("r_regionkey")).select(
          col("n_nationkey").cast("string").as(FromIdColumn),
          col("r_name").as(ToIdColumn),
          lit(1.0).as(FromFractionColumn)))
      Registry.registerDimension(reg, "geography",
        r.select(col("r_name").as("id"), lower(col("r_name")).as("name")))
      Registry.registerDimension(reg, "sector",
        c.select(col("c_mktsegment").as("id"), lower(col("c_mktsegment")).as("name")).distinct())
      reg
    })

  /** Metering project: per-user-bucket events with tz-carrying geography. */
  private def meterRegistry(s: SparkSession, dir: String): graft.registry.Registry =
    registryMemo.getOrElseUpdate(memoKey(s, dir, "meter"), {
      import graft.registry.Registry
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-registry-meter").toString
      val reg = Registry(s, root)
      val e = t(s, dir, "events")
      Registry.registerDataset(reg, "meter",
        e.select(
          concat(lit("g"), (col("user_id") % 3).cast("string")).as("geography"),
          col("ts").as("timestamp"),
          col("value").as(ValueColumn)))
      Registry.registerDimension(reg, "geography",
        Seq(
          ("g0", "geo zero", "America/New_York"),
          ("g1", "geo one", "America/Denver"),
          ("g2", "geo two", "UTC")).toDF("id", "name", "time_zone"))
      reg
    })

  /** Per-dataset dimension filter, pushed below the mapping joins (SURVEY
    * §2.2 pre-filter; ref ProjectQueryDatasetParamsModel.dimension_filters):
    * the filter is expressed in project space (region names), translated
    * back through the mapping to nation keys, and pruned before mapping. */
  val q47_prefilter = Q(
    "q47_prefilter",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val q = ProjectQuery(
        name = "filtered_regional",
        datasets = DatasetSection(Seq(DatasetRef(
          "accounts",
          mappings = Seq(DimensionMappingRef("geography", "nation_to_region")),
          filters = Seq(DimensionFilter.ColumnOperatorFilter(
            "geography", "isin", Seq("EUROPE", "ASIA")))))),
        result = ResultSection(
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography"))),
          sortBy = Seq("geography")))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(col("geography"), round(col(ValueColumn), 2).as(ValueColumn))
    },
    Some("""SELECT r_name AS geography, ROUND(SUM(c_acctbal), 2) AS value
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('EUROPE', 'ASIA')
            GROUP BY 1 ORDER BY 1"""))

  /** `time_zone: "geography"` + a peak-load report through the declarative
    * result model (SURVEY §2.9/§2.11; ref models.py:530-535 +
    * report_peak_load.py): per-geography local-time conversion driven by the
    * geography dimension records, then the report picks each geography's
    * peak row. January data → fixed offsets, so DuckDB can replay. */
  val q48_geo_tz_report = Q(
    "q48_geo_tz_report",
    (s, dir) => {
      import graft.query.Models._
      val reg = meterRegistry(s, dir)
      val q = ProjectQuery(
        name = "geo_local_peaks",
        datasets = DatasetSection(Seq(DatasetRef("meter"))),
        result = ResultSection(
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography", "timestamp"))),
          timeZone = Some("geography"),
          reports = Seq(PeakLoadReport(groupBy = Seq("geography"), tieBreak = Seq("timestamp")))))
      val (_, reports) = new graft.query.Submitter(reg).submitWithReports(q)
      reports.head._2.select(
          col("geography"),
          unix_timestamp(col("timestamp")).as("local_epoch"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""WITH sums AS (
              SELECT 'g' || CAST(user_id % 3 AS VARCHAR) AS geography, ts,
                     SUM(value) AS value
              FROM events GROUP BY 1, 2
            ), conv AS (
              -- FLOOR before the cast: Spark's unix_timestamp truncates
              -- fractional seconds, DuckDB's CAST(double) rounds
              SELECT geography,
                     CAST(FLOOR(EPOCH(ts)) AS BIGINT) +
                       CASE geography WHEN 'g0' THEN -5*3600
                                      WHEN 'g1' THEN -7*3600 ELSE 0 END AS local_epoch,
                     value
              FROM sums
            )
            SELECT geography, local_epoch, ROUND(value, 2) AS value FROM conv
            QUALIFY ROW_NUMBER() OVER (PARTITION BY geography
                                       ORDER BY value DESC, local_epoch) = 1
            ORDER BY geography"""))

  /** QueryContext-style column naming (SURVEY §2.2/§3; ref
    * dataset_schema_handler_base.py:497-518): two datasets whose files
    * disagree on the geography column name are renamed per-dataset into one
    * project space and combined. */
  val q49_column_renames = Q(
    "q49_column_renames",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val q = ProjectQuery(
        name = "renamed_union",
        datasets = DatasetSection(Seq(
          DatasetRef("cust_bal", columnRenames = Seq("nation_code" -> "geography")),
          DatasetRef("supp_bal", columnRenames = Seq("geo_id" -> "geography")))),
        result = ResultSection(
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography")))))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(
          col("geography").cast("long").as("geography"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""SELECT CAST(geography AS BIGINT) AS geography, ROUND(SUM(value), 2) AS value
            FROM (
              SELECT CAST(c_nationkey AS VARCHAR) AS geography, c_acctbal AS value FROM customer
              UNION ALL
              SELECT CAST(s_nationkey AS VARCHAR), s_acctbal FROM supplier
            ) GROUP BY 1 ORDER BY 1"""))

  /** Subset-dimension filter (SURVEY §2.2; ref dimension_filters.py:232-276):
    * keep rows whose dimension value is in the union of record-id sets — a
    * broadcast semi-join, the scalable form of a giant IN list. */
  val q50_subset_filter = Q(
    "q50_subset_filter",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val ids = t(s, dir, "nation")
        .filter(col("n_nationkey") % 5 === 0)
        .select(col("n_nationkey").cast("string").as("id"))
      val q = DatasetQuery(
        name = "subset_geo",
        dataset = DatasetRef("accounts"),
        result = ResultSection(
          filters = Seq(DimensionFilter.SubsetFilter("geography", Seq(ids))),
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography")))))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(
          col("geography").cast("long").as("geography"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS geography, ROUND(SUM(c_acctbal), 2) AS value
            FROM customer WHERE c_nationkey % 5 = 0
            GROUP BY 1 ORDER BY 1"""))

  /** Supplemental-dimension filter (SURVEY §2.2; ref
    * dimension_filters.py:279-308): keep base records that map to a
    * supplemental dimension — semi-join against the mapping's from-side. */
  val q51_supplemental_filter = Q(
    "q51_supplemental_filter",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // base-to-supplemental mapping: nations in AMERICA map, others don't
      val mapping = n.join(r, n("n_regionkey") === r("r_regionkey")).select(
        col("n_nationkey").cast("string").as(FromIdColumn),
        when(col("r_name") === "AMERICA", col("r_name")).as(ToIdColumn))
      val q = DatasetQuery(
        name = "supplemental_geo",
        dataset = DatasetRef("accounts"),
        result = ResultSection(
          filters = Seq(DimensionFilter.SupplementalFilter("geography", mapping)),
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography")))))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(
          col("geography").cast("long").as("geography"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS geography, ROUND(SUM(c_acctbal), 2) AS value
            FROM customer
            WHERE c_nationkey IN (
              SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'AMERICA')
            GROUP BY 1 ORDER BY 1"""))

  /** DST adjustments, all three modes (SURVEY §2.9; ref
    * dimension/time.py:143-187): fall-back duplicate (original value kept on
    * both? no — duplicate repeats the measured value), fall-back interpolate
    * (the ADDED row carries mean(prev, next)), spring-forward drop (the
    * nonexistent 02:30 local stamp is removed). Series built from the region
    * table: hour rk of the DST date, value rk²·10. */
  val q52_dst = Q(
    "q52_dst",
    (s, dir) => {
      val base = t(s, dir, "region").select(col("r_regionkey").cast("int").as("rk"))
      def series(start: String) = base.select(
        lit("g").as("g"),
        expr(s"timestampadd(HOUR, rk, TIMESTAMP'$start')").as("ts"),
        (col("rk") * col("rk") * lit(10.0)).as("value"),
        lit("America/New_York").as("tz"))
      val fall = series("2024-11-03 00:30:00")
      val spring = series("2024-03-10 00:30:00")
      val dup = TimeAdjustments.duplicateFallBackHour(fall, "ts", "tz")
        .withColumn("mode", lit("dup"))
      val interp = TimeAdjustments
        .interpolateFallBackHour(fall, "ts", "tz", "value", Seq("g"))
        .withColumn("mode", lit("interp"))
      val drop = TimeAdjustments.dropSpringForwardHour(spring, "ts", "tz")
        .withColumn("mode", lit("spring"))
      dup.unionByName(interp).unionByName(drop)
        .select(
          col("mode"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("value"))
        .orderBy("mode", "ts", "value")
    },
    Some("""WITH base AS (
              SELECT CAST(r_regionkey AS INT) AS rk,
                     TIMESTAMP '2024-11-03 00:30:00' + to_hours(CAST(r_regionkey AS BIGINT)) AS fts,
                     TIMESTAMP '2024-03-10 00:30:00' + to_hours(CAST(r_regionkey AS BIGINT)) AS sts,
                     CAST(r_regionkey * r_regionkey * 10 AS DOUBLE) AS value
              FROM region)
            SELECT 'dup' AS mode, strftime(fts, '%Y-%m-%d %H:%M:%S') AS ts, value FROM base
            UNION ALL SELECT 'dup', '2024-11-03 01:30:00', 10.0
            UNION ALL SELECT 'interp', strftime(fts, '%Y-%m-%d %H:%M:%S'), value FROM base
            UNION ALL SELECT 'interp', '2024-11-03 01:30:00', 20.0
            UNION ALL SELECT 'spring', strftime(sts, '%Y-%m-%d %H:%M:%S'), value FROM base WHERE rk <> 2
            ORDER BY mode, ts, value"""))

  /** Single-zone time conversion (SURVEY §2.9; ref models.py:530-535):
    * convert to one named zone's local clock, carry the tz column. January
    * data → fixed -7 offset for DuckDB. */
  val q53_single_tz = Q(
    "q53_single_tz",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.TimeZones.toSingleZone(e, "ts", "America/Denver")
        .groupBy(col(TimeZoneColumn), hour(col("ts")).cast("long").as("local_hour"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("local_hour")
    },
    Some("""SELECT 'America/Denver' AS time_zone,
            CAST((EXTRACT(hour FROM ts) + 24 - 7) % 24 AS BIGINT) AS local_hour,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2 ORDER BY 2"""))

  /** Auto-partitioned parquet sink round-trip (SURVEY §2.1; ref
    * dsgrid/utils/spark.py:530-630): write with the 128MB-target resize
    * algorithm (forced to engage via a 1MB target), re-read, aggregate. */
  val q54_autopartition = Q(
    "q54_autopartition",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val out = java.nio.file.Files.createTempDirectory("graft-q54").toString + "/li.parquet"
      graft.sources.Writers.parquetAutoPartition(
        s, li, out, targetMb = 1, minNumPartitions = 1)
      s.read.parquet(out)
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(l_quantity), 2) AS sum_qty,
            ROUND(SUM(l_extendedprice), 2) AS sum_price
            FROM lineitem"""))

  /** Warehouse/table sink round-trip (SURVEY §2.1; ref
    * dsgrid/utils/spark.py:675-733): saveAsTable + read back via the
    * catalog, then aggregate from the table. */
  val q55_warehouse = Q(
    "q55_warehouse",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val table = graft.sources.Writers.toTable(s, o, "graft_q55_orders")
      table.groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Bucketed-table co-located join (beyond-parity; SURVEY §2.1/§2.3): both
    * sides bucketed on the join key at write time, so the join itself runs
    * with zero exchanges — the write-once shuffle that makes repeated joins
    * cheap at 100 TB (IOSpec carries the shuffle-free plan contract). */
  val q56_bucketed_join = Q(
    "q56_bucketed_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val bli = graft.sources.Writers.toBucketedTable(
        s, li, "graft_q56_lineitem", Seq("l_suppkey"), 8)
      val bsup = graft.sources.Writers.toBucketedTable(
        s, sup, "graft_q56_supplier", Seq("s_suppkey"), 8)
      bli.join(bsup, bli("l_suppkey") === bsup("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("total_qty"))
        .select(col("s_nationkey").cast("long").as("s_nationkey"), col("n"), col("total_qty"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
            CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(l_quantity), 2) AS total_qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1 ORDER BY 1"""))

  /** IVF with probes = cells is EXACT: probing every cell must reproduce the
    * brute-force top-k bit-for-bit — which gives the IVF join/rank path a
    * real DuckDB oracle (q32's default-probe variant stays rows-only because
    * centroid assignment isn't SQL-replicable, but this query checks the
    * same code path end-to-end). */
  val q57_ann_ivf_exhaustive = Q(
    "q57_ann_ivf_exhaustive",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val k = 8
      // cheap seeding on purpose: this query's oracle is INIT-INVARIANT
      // (probes = cells ≡ brute force for any centroid set), so it pins the
      // ivfTopK join/rank path itself; q32 exercises the k-means|| default
      val centroids = Similarity.kmeansCentroids(emb, numCentroids = k, iterations = 2, parallelInit = false)
      val cells = Similarity.assignToCentroids(emb, centroids)
      val queries = emb.filter(col("vec_id") < 5)
      Similarity
        .ivfTopK(queries, cells, centroids, k = 5, probes = k)
        .select(
          col("query_id").cast("long").as("query_id"),
          col("rank").cast("long").as("rank"),
          col("neighbor_id").cast("long").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c
              WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
              CAST(neighbor_id AS BIGINT) AS neighbor_id, ROUND(cos, 4) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Gap-based sessionization of the events stream table (beyond-parity;
    * training pipelines sessionize before per-session quality filters):
    * 30-minute gap per user, then a histogram of sessions per user. Exact
    * integer-microsecond gap comparison on both sides. */
  val q58_sessions = Q(
    "q58_sessions",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.Sessionize
        .assignSessions(e, "ts", 1800L, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"))
        .groupBy(col("n_sessions").cast("long").as("n_sessions"))
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy("n_sessions")
    },
    Some("""WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     -- half-open gap (>=), matching session_window semantics
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
                     THEN 1 ELSE 0 END AS is_start
              FROM events),
            per_user AS (
              SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS n_sessions FROM marked GROUP BY user_id)
            SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM per_user GROUP BY 1 ORDER BY 1"""))

  /** Hive-partitioned time-series layout (SURVEY §2.1 sink family): events
    * written partitioned by day, re-read with a one-day predicate that
    * prunes directories (PartitionFilters, zero IO on other days), then
    * aggregated. The first-line data-skipping pattern for 100 TB
    * time-series. */
  val q59_partitioned_write = Q(
    "q59_partitioned_write",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      val out = java.nio.file.Files.createTempDirectory("graft-q59").toString + "/events"
      graft.sources.Writers.parquetPartitionedBy(e, out, Seq("event_date"), sortWithin = Seq("ts"))
      s.read.parquet(out)
        .filter(col("event_date") === "2024-01-15")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("value")), 2).as("total"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(value), 2) AS total
            FROM events
            WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
            GROUP BY 1 ORDER BY 1"""))

  /** End-to-end training-data pipeline (flagship composition): quality
    * filter (stopword ratio) → language filter (en) → exact dedup (keep
    * min-id per normalized content) → per-language corpus stats. Every
    * stage is an operator with its own green oracle (q25/q30/q26/q24);
    * this query checks their COMPOSITION against one SQL replay. */
  val q60_pipeline = Q(
    "q60_pipeline",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      // tokens materialized ONCE (HOF-lambda CSE rule), every feature reads
      // the column
      val base = d
        .withColumn("__toks", TextFunctions.tokens(lower(col("text"))))
        .withColumn("lang", TextFunctions.languageIdFromTokens(array_distinct(col("__toks"))))
        .withColumn("swr", TextFunctions.stopwordRatioFromTokens(col("__toks")))
        .withColumn("n_tokens", size(col("__toks")))
      val filtered = base.filter(col("lang") === "en" && col("swr") >= 0.05)
      // exact dedup WITHIN the filtered set: keep the min doc_id per
      // normalized content (same keep rule as Dedup.dropExactDuplicates,
      // md5 spelled out so the oracle can replay it)
      val w = Window.partitionBy(md5(TextFunctions.normalize(col("text"))))
      val deduped = filtered
        .withColumn("__keep", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("__keep"))
      deduped
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(avg(col("swr")), 4).as("avg_swr"))
    },
    Some {
      val stop = TextFunctions.englishStopwords.map(w => s"'$w'").mkString(", ")
      val profiles = TextFunctions.languageProfiles.toSeq.sortBy(_._1)
      val scoreDefs = profiles.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"len(list_intersect(dtoks, [$list])) AS s_$lang"
      }.mkString(", ")
      val fold = profiles.foldLeft(("'und'", "0")) { case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN s_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN s_$lang > $bs THEN s_$lang ELSE $bs END)")
      }._1
      s"""WITH toks AS (
            SELECT doc_id, text,
              list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS toks
            FROM documents),
          feat AS (
            SELECT doc_id, text, len(toks) AS n_tokens,
              CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE CAST(len(list_filter(toks, t -> list_contains([$stop], t))) AS DOUBLE) / len(toks)
              END AS swr,
              list_distinct(toks) AS dtoks
            FROM toks),
          scored AS (SELECT *, $scoreDefs FROM feat),
          langed AS (SELECT doc_id, text, n_tokens, swr, $fold AS lang FROM scored),
          filtered AS (SELECT * FROM langed WHERE lang = 'en' AND swr >= 0.05),
          deduped AS (
            SELECT * FROM (
              SELECT *, MIN(doc_id) OVER (PARTITION BY
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')))) AS keep
              FROM filtered) WHERE doc_id = keep)
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 ROUND(AVG(swr), 4) AS avg_swr
          FROM deduped"""
    })

  /** Moving-average analytics over the time series (SURVEY §2.5 windows):
    * daily totals per event type, then a 3-day trailing mean — the frame
    * syntax both engines define identically. */
  val q61_moving_avg = Q(
    "q61_moving_avg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events")
      val daily = e
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("total"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d")).rowsBetween(-2, 0)
      daily
        .select(
          col("event_type"),
          date_format(col("d"), "yyyy-MM-dd").as("d"),
          round(col("total"), 2).as("total"),
          round(avg(col("total")).over(w), 2).as("ma3"))
        .orderBy("event_type", "d")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS d, SUM(value) AS total
              FROM events GROUP BY 1, 2)
            SELECT event_type, strftime(d, '%Y-%m-%d') AS d,
                   ROUND(total, 2) AS total,
                   ROUND(AVG(total) OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
            FROM daily ORDER BY event_type, d"""))

  /** Statistical aggregates (SURVEY §2.4 registry depth): median +
    * interpolated percentile + stddev + correlation, matched against
    * DuckDB's definitions of the same functions. */
  val q62_stats = Q(
    "q62_stats",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      Aggregation
        .aggregateMany(
          li,
          Seq("l_returnflag"),
          Seq(("median", "l_quantity", "med_qty"), ("stddev", "l_extendedprice", "sd_price")))
        .join(
          li.groupBy(col("l_returnflag"))
            .agg(
              percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
              corr(col("l_quantity"), col("l_extendedprice")).as("qty_price_corr")),
          Seq("l_returnflag"))
        .select(
          col("l_returnflag"),
          round(col("med_qty"), 2).as("med_qty"),
          round(col("p90_qty"), 2).as("p90_qty"),
          round(col("sd_price"), 2).as("sd_price"),
          round(col("qty_price_corr"), 4).as("qty_price_corr"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
            ROUND(MEDIAN(l_quantity), 2) AS med_qty,
            ROUND(QUANTILE_CONT(l_quantity, 0.9), 2) AS p90_qty,
            ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
            ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** As-of join (custom operator Spark lacks — prompt §custom-operators):
    * every event picks up its user's most recent tier change at or before
    * the event time; events before the first change keep tier -1. The
    * oracle is DuckDB's NATIVE ASOF LEFT JOIN — an independent
    * implementation of the same semantics. */
  val q63_asof_join = Q(
    "q63_asof_join",
    (s, dir) => {
      val e = t(s, dir, "events")
      val changes = e.select(col("user_id")).distinct()
        .select(
          col("user_id"),
          explode(array(lit("2024-01-05"), lit("2024-01-15"), lit("2024-01-25"))).as("cd"))
        .select(
          col("user_id"),
          to_timestamp(col("cd")).as("cts"),
          ((col("user_id") + dayofmonth(to_timestamp(col("cd")))) % 5).cast("long").as("tier"))
      graft.operators.AsOfJoin
        .asOfJoin(e.select(col("user_id"), col("ts"), col("value")), changes, Seq("user_id"), "ts", "cts")
        .groupBy(coalesce(col("tier"), lit(-1L)).as("tier"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy("tier")
    },
    Some("""WITH changes AS (
              SELECT user_id, cts,
                     CAST((user_id + EXTRACT(day FROM cts)) % 5 AS BIGINT) AS tier
              FROM (SELECT DISTINCT user_id FROM events)
              CROSS JOIN (SELECT UNNEST([TIMESTAMP '2024-01-05',
                                         TIMESTAMP '2024-01-15',
                                         TIMESTAMP '2024-01-25']) AS cts))
            SELECT CAST(COALESCE(c.tier, -1) AS BIGINT) AS tier,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(e.value), 2) AS total
            FROM events e ASOF LEFT JOIN changes c
              ON e.user_id = c.user_id AND e.ts >= c.cts
            GROUP BY 1 ORDER BY 1"""))

  /** Range join (custom operator Spark lacks): events matched to the
    * half-open maintenance windows containing them, per event type —
    * bucketized equi-join + exact predicate. Oracle = DuckDB's plain range
    * join (natively optimized there), an independent implementation. */
  val q64_range_join = Q(
    "q64_range_join",
    (s, dir) => {
      val e = t(s, dir, "events")
      val windows = e.select(col("event_type")).distinct()
        .select(
          col("event_type"),
          explode(array(lit("2024-01-08"), lit("2024-01-18"))).as("ws"))
        .select(
          col("event_type"),
          to_timestamp(col("ws")).as("w_start"),
          (to_timestamp(col("ws")) + expr("INTERVAL 3 DAY")).as("w_end"))
      graft.operators.RangeJoin
        .intervalJoin(
          e.select(col("event_type"), col("ts"), col("value")),
          windows, Seq("event_type"), "ts", "w_start", "w_end")
        .groupBy(col("event_type"), date_format(col("w_start"), "yyyy-MM-dd").as("window_start"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy("event_type", "window_start")
    },
    Some("""WITH windows AS (
              SELECT event_type, ws AS w_start, ws + INTERVAL 3 DAY AS w_end
              FROM (SELECT DISTINCT event_type FROM events)
              CROSS JOIN (SELECT UNNEST([TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-18']) AS ws))
            SELECT e.event_type, strftime(w.w_start, '%Y-%m-%d') AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(e.value), 2) AS total
            FROM events e JOIN windows w
              ON e.event_type = w.event_type AND e.ts >= w.w_start AND e.ts < w.w_end
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Cross-engine-replayable uniform for the sampling catalog queries:
    * a Knuth multiplicative mix of the id plus a seed offset, in long
    * space (products stay < 2^62 for test-data ids, safe under ANSI) —
    * the same arithmetic is spelled in the DuckDB oracles. Production
    * callers keep the xxhash64 default; the INJECTION POINT is what these
    * queries exercise. */
  private val KnuthA = 2654435761L
  private val UniformM = 1000000000L
  private def seedOffset(seed: String): Long =
    seed.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
  private def knuthUniform(key: Column, seed: String): Column =
    pmod(key.cast("long") * lit(KnuthA) + lit(seedOffset(seed)), lit(UniformM))
      .cast("double") / lit(UniformM.toDouble)
  private def knuthUniformSql(keyExpr: String, seed: String): String =
    s"(($keyExpr * $KnuthA + ${seedOffset(seed)}) % $UniformM) / $UniformM.0"

  /** Deterministic stratified sampling (training-data pipeline op): keep
    * 40% of English docs, 15% of everything else, reproducibly — the
    * content-keyed Bernoulli sample a corpus refresh needs (DataFrame
    * .sample is partition-keyed and unstable). Map-side, zero shuffle. */
  val q65_stratified_sample = Q(
    "q65_stratified_sample",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .stratifiedSample(d, "doc_id", "lang", Map("en" -> 0.4), defaultFraction = 0.15,
          seed = "r3", uniform = knuthUniform)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("lang")
    },
    Some(s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM documents
             WHERE ${knuthUniformSql("doc_id", "r3")} < CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END
             GROUP BY 1 ORDER BY 1"""))

  /** Token-budget shard packing (training-data pipeline op): exact
    * sequential packing per source along doc_id order, then the shard
    * manifest a trainer schedules from. The window partitions by source —
    * the real partitioning column that keeps the 100 TB case from a
    * global sort. */
  val q66_shard_pack = Q(
    "q66_shard_pack",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val sharded = graft.text.Sharding
        .packBySequence(d, "doc_id", "n_chars", budgetTokens = 50000L, partitionCols = Seq("source"))
      graft.text.Sharding.shardManifest(sharded, "n_chars", extraKeys = Seq("source"))
        .select(col("source"), col("shard"), col("n_docs"), col("total_tokens"))
        .orderBy("source", "shard")
    },
    Some("""WITH cum AS (
              SELECT source, n_chars,
                     SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) AS c
              FROM documents)
            SELECT source, CAST(FLOOR((c - n_chars) / 50000) AS BIGINT) AS shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_tokens
            FROM cum GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Quantile filtering (training-data pipeline op): keep docs at or above
    * the per-language p75 of length — exact percent_rank form (the
    * approx-threshold scale path is spec-covered). */
  val q67_quantile_filter = Q(
    "q67_quantile_filter",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling.filterByQuantile(d, "n_chars", 0.75, Seq("lang"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          min(col("n_chars")).cast("long").as("min_chars"),
          sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("lang")
    },
    Some("""WITH pr AS (
              SELECT lang, n_chars,
                     PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS p
              FROM documents)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM pr WHERE p >= 0.75 GROUP BY 1 ORDER BY 1"""))

  /** Weighted corpus mixing (training-data pipeline op): a two-source
    * training mix — every doc of the rarer source, 30% of the dominant
    * one — with per-source independent keep decisions and provenance. */
  val q68_weighted_mix = Q(
    "q68_weighted_mix",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // "web" = the even-numbered src buckets (half the corpus, downsampled
      // to 30%); "curated" = the odd ones, kept whole
      val isWeb = regexp_extract(col("source"), "src(\\d+)", 1).cast("int") % 2 === 0
      val web = d.filter(isWeb)
      val rest = d.filter(!isWeb)
      graft.text.Sampling
        .weightedMix(
          Seq(("web", web, 0.3), ("curated", rest, 1.0)),
          "doc_id", seed = "mix", uniform = knuthUniform)
        .groupBy(col("mix_source"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("mix_source")
    },
    Some(s"""SELECT mix_source, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM (
               SELECT 'web' AS mix_source, n_chars FROM documents
               WHERE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 2 = 0
                 AND ${knuthUniformSql("doc_id", "mix|web")} < 0.3
               UNION ALL
               SELECT 'curated' AS mix_source, n_chars FROM documents
               WHERE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 2 = 1
                 AND ${knuthUniformSql("doc_id", "mix|curated")} < 1.0)
             GROUP BY 1 ORDER BY 1"""))

  /** Near-dup CLUSTERING (training-data pipeline op): LSH pairs are not a
    * dedup decision — near-duplication is transitive in practice, so the
    * pipeline needs connected components over the verified pairs and one
    * representative per component. Corpus: each doc plus two clipped
    * variants (chains full≈minus1≈minus2). Output: cluster-size histogram.
    * Oracle: exact-Jaccard pairs via inverted-index join (as q29) + a
    * recursive CTE computing min-reachable-id components — fully
    * independent of the LSH path. */
  /** Shared q69/q82 fixture: the first 2000 documents plus two clipped
    * copies (1 and 2 trailing tokens removed, ids offset by 1M/2M), so
    * near-dup components of known shape exist. The clip length is clamped
    * at 0: Spark's `slice` throws on a negative length while DuckDB's
    * list slicing would wrap negative indices — the clamp keeps both
    * engines total and identical on degenerate short documents. */
  private def clippedNearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text")).filter(col("doc_id") < 2000)
    def clip(n: Int, offset: Long) = {
      val toks = split(trim(col("text")), "\\s+")
      d.select(
        (col("doc_id") + offset).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - n, lit(0))), " ").as("text"))
    }
    d.unionByName(clip(1, 1000000L)).unionByName(clip(2, 2000000L))
  }

  /** The matching DuckDB CTE chain: corpus construction, shingle sets,
    * exact-Jaccard pairs, and connected components via recursive walk
    * (ends with `roots(id, root)`). Shared verbatim by q69/q82/q120 so the
    * oracles can never drift apart.
    *
    * Pairs are spelled as an inverted-index join (unnest shingles, join on
    * shared shingle, COUNT(*) = |A∩B|, union by inclusion-exclusion) rather
    * than the exhaustive all-pairs `list_intersect` — identical ground
    * truth (any pair with Jaccard ≥ 0.8 > 0 shares a shingle; distinct
    * shingle sets make the equi-join count the exact intersection) but
    * near-linear: Σ df(sh)² join rows instead of n²/2 list intersections.
    * The exhaustive form blew the driver's correctness-gate budget
    * (~190 s/oracle at sf0.01, the r6/r7 `{}` outage); this runs in ~3 s. */
  private val nearDupComponentsCte: String =
    """corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 2000
              UNION ALL
              SELECT doc_id + 1000000, array_to_string(toks[1:greatest(len(toks)-1, 0)], ' ')
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 2000)
              UNION ALL
              SELECT doc_id + 2000000, array_to_string(toks[1:greatest(len(toks)-2, 0)], ' ')
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 2000)),
            sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM corpus)),
            shsz AS (SELECT doc_id, len(shingles) AS sz FROM sh),
            shex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            shinter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS ic
              FROM shex a JOIN shex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id1, id2
              FROM shinter JOIN shsz sa ON sa.doc_id = id1 JOIN shsz sb ON sb.doc_id = id2
              WHERE CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic) >= 0.8),
            edges AS (
              SELECT id1 AS a, id2 AS b FROM pairs
              UNION SELECT id2, id1 FROM pairs),
            walk(id, reach) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT w.id, e.b FROM walk w JOIN edges e ON w.reach = e.a),
            roots AS (SELECT id, MIN(reach) AS root FROM walk GROUP BY id)"""

  val q69_dedup_clusters = Q(
    "q69_dedup_clusters",
    (s, dir) => {
      val corpus = clippedNearDupCorpus(s, dir)
      val pairs = Dedup
        .minhashNearDuplicates(corpus, "doc_id", "text", bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      Dedup.duplicateClusters(pairs)
        .groupBy(col("root")).agg(count(lit(1)).as("csize"))
        .groupBy(col("csize").cast("long").as("cluster_size"))
        .agg(count(lit(1)).cast("long").as("n_clusters"))
        .orderBy("cluster_size")
    },
    Some(s"""WITH RECURSIVE $nearDupComponentsCte,
            sizes AS (SELECT root, COUNT(*) AS csize FROM roots GROUP BY root)
            SELECT CAST(csize AS BIGINT) AS cluster_size,
                   CAST(COUNT(*) AS BIGINT) AS n_clusters
            FROM sizes GROUP BY 1 ORDER BY 1"""))

  /** JSON round-trip (SURVEY §2.1 JSON scan, FAILFAST): aggregate, write
    * line-delimited JSON, read it back through the strict reader. The
    * oracle recomputes the aggregate straight from parquet, so a lossy or
    * lenient round-trip would hash-mismatch. */
  val q70_json_roundtrip = Q(
    "q70_json_roundtrip",
    (s, dir) => {
      val agg = t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      val out = s.conf.get("spark.local.dir", "/tmp") + "/graft_json_roundtrip"
      graft.sources.Writers.json(agg, out, singleFile = true)
      graft.sources.Readers.json(s, out)
        .select(col("o_orderstatus"), col("n"), col("total"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** In-place overwrite (SURVEY §2.1): a parquet dataset is rewritten at
    * its own path (tmp-write + swap + re-read) with a filtered view of
    * itself — Spark cannot read and overwrite one path in a single job. */
  val q71_overwrite_inplace = Q(
    "q71_overwrite_inplace",
    (s, dir) => {
      val scratch = s.conf.get("spark.local.dir", "/tmp") + "/graft_overwrite_inplace"
      graft.sources.Writers.parquet(
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice"), scratch)
      val pruned = graft.sources.Writers
        .overwriteInPlace(s, s.read.parquet(scratch).filter(col("o_totalprice") > 150000.0), scratch)
      pruned
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders WHERE o_totalprice > 150000.0 GROUP BY 1 ORDER BY 1"""))

  /** Persist-intermediate (SURVEY §2.1): a mid-pipeline frame is cut to
    * scratch parquet and read back (lineage truncation), and the second
    * call hits the reuseExisting resume path — both must yield the same
    * bytes the oracle computes directly. */
  val q72_persist_intermediate = Q(
    "q72_persist_intermediate",
    (s, dir) => {
      // scratch keyed by sf dir: reuseExisting must never see another
      // scale factor's intermediate
      val scratch = s.conf.get("spark.local.dir", "/tmp") +
        "/graft_persist_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val perSupp = t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(col("l_quantity")).as("qty"))
      val first = graft.sources.Writers.persistIntermediate(s, perSupp, scratch, "per_supp")
      val resumed = graft.sources.Writers.persistIntermediate(s, perSupp, scratch, "per_supp", reuseExisting = true)
      resumed
        .select(floor(col("qty") / 100.0).cast("long").as("qty_bucket"))
        .groupBy("qty_bucket")
        .agg(count(lit(1)).cast("long").as("n_suppliers"))
        .orderBy("qty_bucket")
    },
    Some("""SELECT CAST(FLOOR(qty / 100.0) AS BIGINT) AS qty_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers
            FROM (SELECT l_suppkey, SUM(l_quantity) AS qty FROM lineitem GROUP BY 1)
            GROUP BY 1 ORDER BY 1"""))

  /** Calendar-interval arithmetic (SURVEY §2.9 interval op): shift
    * timestamps by calendar units (month-end clamping and all) and
    * aggregate on the shifted calendar — both engines must agree on
    * Jan 31 + 1 MONTH. */
  val q73_interval_op = Q(
    "q73_interval_op",
    (s, dir) => {
      val shifted = graft.time.TimeAdjustments.addInterval(
        graft.time.TimeAdjustments.addInterval(col("l_shipdate"), 1, "MONTH"), 2, "WEEK")
      t(s, dir, "lineitem")
        .select(year(shifted).cast("long").as("y"), month(shifted).cast("long").as("m"))
        .groupBy("y", "m")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("y", "m")
    },
    Some("""SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS y,
                   CAST(EXTRACT(month FROM d) AS BIGINT) AS m,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT l_shipdate + INTERVAL 1 MONTH + INTERVAL 2 WEEK AS d FROM lineitem)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Registration-time time-consistency checks (SURVEY §2.9): spine
    * equality (ship dates cover every day of their span) and
    * equal-time-array-lengths per dimension combo — one true case, one
    * false case, so a check that always answers the same way fails. */
  val q74_time_consistency = Q(
    "q74_time_consistency",
    (s, dir) => {
      import graft.time.TimeChecks
      // the whole report is ONE composed plan (spine bounds derived
      // inside it) — the boolean check forms cost one driver action per
      // check; at scale those are sequential full scans of the spine
      val days = t(s, dir, "lineitem").select(col("l_shipdate").as("timestamp"), col("l_returnflag"))
      TimeChecks.report(
        TimeChecks.timestampsMatchSpineCheck(
          days, "timestamp",
          TimeChecks.spineFromBounds(days, "timestamp", 86400L), "spine_ok"),
        TimeChecks.equalTimeArrayLengthsCheck(
          days.select(col("l_returnflag"), trunc(col("timestamp"), "month").as("m")).distinct(),
          Seq("l_returnflag"), "equal_months"),
        TimeChecks.equalTimeArrayLengthsCheck(
          t(s, dir, "orders")
            .select(col("o_orderpriority"), trunc(col("o_orderdate"), "month").as("m")).distinct(),
          Seq("o_orderpriority"), "equal_priority_months"))
    },
    Some("""SELECT
              CAST(CASE WHEN (SELECT COUNT(DISTINCT l_shipdate) FROM lineitem) =
                             (SELECT date_diff('day', MIN(l_shipdate), MAX(l_shipdate)) + 1 FROM lineitem)
                   THEN 1 ELSE 0 END AS BIGINT) AS spine_ok,
              CAST(CASE WHEN (SELECT COUNT(DISTINCT c) FROM (
                       SELECT l_returnflag, COUNT(DISTINCT date_trunc('month', l_shipdate)) AS c
                       FROM lineitem GROUP BY 1)) = 1
                   THEN 1 ELSE 0 END AS BIGINT) AS equal_months,
              CAST(CASE WHEN (SELECT COUNT(DISTINCT c) FROM (
                       SELECT o_orderpriority, COUNT(DISTINCT date_trunc('month', o_orderdate)) AS c
                       FROM orders GROUP BY 1)) = 1
                   THEN 1 ELSE 0 END AS BIGINT) AS equal_priority_months"""))

  /** Wrap-time (SURVEY §2.9 wrap_time_allowed): fold a month of events
    * into one representative week by whole-range shifts, then histogram by
    * wrapped day — weather-year alignment semantics. */
  val q75_wrap_time = Q(
    "q75_wrap_time",
    (s, dir) => {
      graft.time.Resample
        .wrapTime(t(s, dir, "events"), "ts", "2024-01-01 00:00:00", "2024-01-08 00:00:00")
        .select(dayofmonth(col("ts")).cast("long").as("wrapped_day"))
        .groupBy("wrapped_day")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("wrapped_day")
    },
    // floor() mirrors Spark's unix_timestamp second truncation; a CAST
    // would round half-up and shift boundary events across midnight
    Some("""SELECT CAST(1 + ((CAST(FLOOR(epoch(ts)) AS BIGINT) -
                              CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT)) % 604800) // 86400
                        AS BIGINT) AS wrapped_day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** DATETIME_EXTERNAL_TZ (SURVEY §2.9, the reference's sixth time
    * representation): tz-NAIVE timestamps localized to absolute UTC through
    * a time zone resolved from the geography dimension records — the
    * inverse direction of q21/q48's UTC→local conversion. Wall-clock
    * readings in three zones shift by different whole-hour offsets, so UTC
    * day counts differ per geography; January data keeps the oracle clear
    * of DST ambiguity. */
  val q76_external_tz = Q(
    "q76_external_tz",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("geography", concat(lit("g"), pmod(col("user_id"), lit(3)).cast("string")))
      val geoRecords = Seq(
        ("g0", "America/New_York"),
        ("g1", "America/Denver"),
        ("g2", "Asia/Tokyo")).toDF("id", "time_zone")
      graft.time.TimeZones.geographyLocalToUtc(ev, "ts", "geography", geoRecords)
        .select(col("geography"), dayofmonth(col("ts")).cast("long").as("utc_day"))
        .groupBy("geography", "utc_day")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("geography", "utc_day")
    },
    Some("""SELECT geography, CAST(EXTRACT(day FROM utc_ts) AS BIGINT) AS utc_day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT 'g' || CAST(user_id % 3 AS VARCHAR) AS geography,
                         timezone('UTC', timezone(
                           CASE user_id % 3 WHEN 0 THEN 'America/New_York'
                                            WHEN 1 THEN 'America/Denver'
                                            ELSE 'Asia/Tokyo' END, ts)) AS utc_ts
                  FROM events)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Corpus vocabulary (training-data pipeline: tokenizer/vocab building):
    * top-50 lowercase whitespace tokens by total frequency with document
    * frequencies. One explode + one token-keyed groupBy with map-side
    * partials; the top-k sorts only the aggregated vocabulary. */
  val q77_vocab = Q(
    "q77_vocab",
    (s, dir) => {
      val d = t(s, dir, "documents")
      TextFunctions.termFrequencies(d, "doc_id", "text")
        .select(col("token"), col("tf").cast("long").as("tf"),
          col("doc_freq").cast("long").as("doc_freq"))
        .orderBy(col("tf").desc, col("token"))
        .limit(50)
    },
    Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
            FROM (SELECT doc_id,
                    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                       x -> len(x) > 0)) AS token
                  FROM documents)
            GROUP BY token ORDER BY tf DESC, token LIMIT 50"""))

  /** Benchmark decontamination (training-data pipeline): flag corpus
    * documents sharing word 8-grams with a benchmark set — here the
    * benchmark is the 12-token prefix of every 97th document, so the
    * contaminated set is known and the overlap counts are exact. The
    * benchmark n-gram set broadcasts; the corpus never shuffles raw
    * n-grams. */
  val q78_decontaminate = Q(
    "q78_decontaminate",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val benchmark = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ").as("text"))
      Dedup.ngramOverlap(d, benchmark, "doc_id", "text", n = 8, minHits = 1L)
        .select(col("doc_id"), col("n_hits").cast("long").as("n_hits"))
        .orderBy("doc_id")
    },
    Some("""WITH bench AS (
              SELECT array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:12], ' ') AS text
              FROM documents WHERE doc_id % 97 = 0),
            norm_c AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
              FROM documents),
            norm_b AS (
              SELECT list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
              FROM bench),
            cg AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(toks) <= 8 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END)) AS ng
              FROM norm_c),
            bg AS (
              SELECT DISTINCT unnest(list_distinct(
                CASE WHEN len(toks) <= 8 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END)) AS ng
              FROM norm_b)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM cg JOIN bg USING (ng)
            GROUP BY doc_id HAVING COUNT(*) >= 1
            ORDER BY doc_id"""))

  /** PII redaction audit (training-data pipeline): deterministic synthetic
    * emails/phone strings are appended per doc_id (the synthetic corpus has
    * none), redacted map-side with shared regex patterns, and audited per
    * source. Pure regexp_replace/extract_all column work — no shuffle
    * before the final small per-source aggregate. */
  val q79_redact = Q(
    "q79_redact",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val withPii = d.withColumn("text2", concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"), lpad(col("doc_id").cast("string"), 4, "0")))
          .otherwise(lit(""))))
      val emailP = TextFunctions.piiPatterns(0)._1
      val phoneP = TextFunctions.piiPatterns(1)._1
      withPii
        .withColumn("redacted", TextFunctions.redact(col("text2")))
        .withColumn("email_hits", TextFunctions.patternHits(col("text2"), emailP))
        .withColumn("phone_hits", TextFunctions.patternHits(col("text2"), phoneP))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(when(col("redacted") =!= col("text2"), 1L).otherwise(0L)).cast("long").as("docs_redacted"),
          sum(col("email_hits")).cast("long").as("emails"),
          sum(col("phone_hits")).cast("long").as("phones"),
          sum(length(col("text2")) - length(col("redacted"))).cast("long").as("chars_removed"))
        .orderBy("source")
    },
    Some {
      // DuckDB regular strings don't process backslash escapes, so the
      // Scala pattern (single backslash before '.') interpolates verbatim
      val emailP = TextFunctions.piiPatterns(0)._1
      val phoneP = TextFunctions.piiPatterns(1)._1
      s"""WITH withpii AS (
            SELECT source, text
              || (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END)
              || (CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ELSE '' END) AS text2
            FROM documents),
          red AS (
            SELECT source, text2,
              regexp_replace(regexp_replace(text2, '$emailP', '<EMAIL>', 'g'), '$phoneP', '<PHONE>', 'g') AS redacted,
              len(regexp_extract_all(text2, '$emailP')) AS email_hits,
              len(regexp_extract_all(text2, '$phoneP')) AS phone_hits
            FROM withpii)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
            CAST(SUM(CASE WHEN redacted <> text2 THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
            CAST(SUM(email_hits) AS BIGINT) AS emails,
            CAST(SUM(phone_hits) AS BIGINT) AS phones,
            CAST(SUM(len(text2) - len(redacted)) AS BIGINT) AS chars_removed
          FROM red GROUP BY source ORDER BY source"""
    })

  /** Session-time-zone management (SURVEY §2.9, the last spec-only time
    * row): the SAME column expression (`date_format`) renders different
    * wall-clock fields under a scoped session-zone override
    * (`Core.withSessionTimeZone` — the reference restarts its session for
    * this, query_submitter.py:697-714). The aggregate is materialized
    * INSIDE the scope: session-zone-dependent expressions resolve the conf
    * at execution, so a lazily-returned frame would silently run under the
    * restored zone — exactly the trap the scoped helper exists to prevent. */
  val q80_session_tz = Q(
    "q80_session_tz",
    (s, dir) => {
      // BOTH the frame definition and the collect live inside the scope:
      // time-zone-aware expressions (date_format) capture the session zone
      // at ANALYSIS time, so a frame defined outside would bake in the old
      // zone no matter when it executes.
      val (rows, schema) = graft.core.GraftSession.withSessionTimeZone(s, "America/Denver") {
        val agg = t(s, dir, "events")
          .select(date_format(col("ts"), "HH").cast("long").as("local_hour"))
          .groupBy("local_hour")
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy("local_hour")
        (agg.collect(), agg.schema)
      }
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    },
    Some("""SELECT CAST(EXTRACT(hour FROM timezone('America/Denver', timezone('UTC', ts))) AS BIGINT) AS local_hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Cross-corpus line dedup (training-data pipeline, C4-style "remove
    * repeated lines"): documents are split into three 8-token lines; a
    * second copy of the corpus shares its first two lines with the
    * original, so those lines must be kept only at their first (min id)
    * occurrence and the copies reassemble to just their distinct tail.
    * Intra-document repeats (empty lines in short docs) dedup too. */
  val q81_line_dedup = Q(
    "q81_line_dedup",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      def ln(from: Int, len: Int) = array_join(slice(col("toks"), from, len), " ")
      val orig = d.select(col("doc_id"),
        concat_ws("\n", ln(1, 8), ln(9, 8), ln(17, 8)).as("text"))
      val copy = d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws("\n", ln(1, 8), ln(9, 8), ln(17, 7)).as("text"))
      Dedup.dropRepeatedLines(orig.unionByName(copy), "doc_id", "text")
        .orderBy("doc_id")
    },
    Some("""WITH src AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
            corpus AS (
              -- coalesce: DuckDB yields NULL (not []) for fully out-of-range
              -- list slices, where Spark's slice gives an empty array
              SELECT doc_id,
                     coalesce(array_to_string(toks[1:8], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[9:16], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[17:24], ' '), '') AS text
              FROM src
              UNION ALL
              SELECT doc_id + 1000000,
                     coalesce(array_to_string(toks[1:8], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[9:16], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[17:23], ' '), '') AS text
              FROM src),
            ex AS (
              SELECT doc_id, i - 1 AS pos, parts[i] AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
                   UNNEST(range(1, len(parts) + 1)) AS r(i)),
            keep AS (
              SELECT doc_id, pos, line,
                     ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
              FROM ex)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
            FROM keep WHERE rn = 1
            GROUP BY doc_id ORDER BY doc_id"""))

  /** Quality-aware near-dup resolution (training-data pipeline): like q69's
    * cluster construction, but each component keeps its highest-scoring
    * member (score = token count, so the untruncated original beats its
    * clipped copies; ties → min id) instead of the min-id one. The oracle
    * recomputes components with a recursive CTE — independent of the LSH
    * path — and replays the argmax. */
  val q82_dedup_keep_best = Q(
    "q82_dedup_keep_best",
    (s, dir) => {
      val corpus = clippedNearDupCorpus(s, dir)
        .withColumn("score", size(split(trim(col("text")), "\\s+")).cast("long"))
      val pairs = Dedup
        .minhashNearDuplicates(corpus, "doc_id", "text", bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      Dedup.dropNearDuplicatesKeepBest(corpus, pairs, "doc_id", "score")
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $nearDupComponentsCte,
            scored AS (
              SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS score FROM corpus),
            ranked AS (
              SELECT r.id, ROW_NUMBER() OVER (
                PARTITION BY r.root ORDER BY s.score DESC, r.id ASC) AS rn
              FROM roots r JOIN scored s ON r.id = s.doc_id),
            losers AS (SELECT id FROM ranked WHERE rn > 1)
            SELECT doc_id FROM corpus
            WHERE doc_id NOT IN (SELECT id FROM losers)
            ORDER BY doc_id"""))

  /** Gopher-style repetition quality signals (Rae et al. 2021): duplicate
    * line fraction, duplicate-line char fraction, top word-2-gram char
    * fraction. Corpus: 4 six-token lines per doc, with line 1 REPEATED on
    * even doc_ids — so the dup fractions split the corpus in two and the
    * oracle replays the whole computation (line counts + gram counts with
    * the max-(count, gram) tie-break) relationally. Fractions are integer
    * ratios divided in double on both engines — bit-equal, no rounding. */
  val q83_repetition = Q(
    "q83_repetition",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      def ln(from: Int, len: Int) = array_join(slice(col("toks"), from, len), " ")
      val corpus = d.select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat_ws("\n", ln(1, 6), ln(7, 6), ln(1, 6), ln(13, 6)))
          .otherwise(concat_ws("\n", ln(1, 6), ln(7, 6), ln(13, 6), ln(19, 6)))
          .as("text"))
      TextFunctions.repetitionStats(corpus, "doc_id", "text", ngram = 2)
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                CASE WHEN doc_id % 2 = 0
                     THEN array_to_string([l1, l2, l1, l4], chr(10))
                     ELSE array_to_string([l1, l2, l4, l5], chr(10)) END AS text
              FROM (
                SELECT doc_id,
                  array_to_string(toks[1:6], ' ') AS l1,
                  array_to_string(toks[7:12], ' ') AS l2,
                  array_to_string(toks[13:18], ' ') AS l4,
                  array_to_string(toks[19:24], ' ') AS l5
                FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents))),
            lines AS (
              SELECT doc_id, line FROM (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM corpus)
              WHERE len(line) > 0),
            per_line AS (
              SELECT doc_id, line, COUNT(*) AS cnt, len(line)::BIGINT AS chars
              FROM lines GROUP BY doc_id, line),
            line_stats AS (
              SELECT doc_id,
                CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt) AS dup_line_frac,
                CAST(SUM(CASE WHEN cnt > 1 THEN cnt * chars ELSE 0 END) AS DOUBLE)
                  / SUM(cnt * chars) AS dup_line_char_frac
              FROM per_line GROUP BY doc_id),
            normed AS (
              SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
              FROM corpus),
            toked AS (
              SELECT doc_id, len(norm)::BIGINT AS nlen,
                list_filter(string_split(norm, ' '), t -> len(t) > 0) AS toks
              FROM normed),
            grams AS (
              SELECT doc_id, nlen, unnest(
                CASE WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(len(toks) - 1), i -> toks[i + 1] || ' ' || toks[i + 2]) END
              ) AS gram
              FROM toked WHERE len(toks) > 0),
            gram_counts AS (
              SELECT doc_id, gram, nlen, COUNT(*) AS cnt
              FROM grams GROUP BY doc_id, gram, nlen),
            top_gram AS (
              SELECT doc_id,
                CAST(cnt * len(gram) AS DOUBLE) / GREATEST(nlen, 1) AS top_ngram_char_frac
              FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
                FROM gram_counts)
              WHERE rn = 1)
            SELECT c.doc_id,
              COALESCE(l.dup_line_frac, 0.0) AS dup_line_frac,
              COALESCE(l.dup_line_char_frac, 0.0) AS dup_line_char_frac,
              COALESCE(t.top_ngram_char_frac, 0.0) AS top_ngram_char_frac
            FROM corpus c
            LEFT JOIN line_stats l ON l.doc_id = c.doc_id
            LEFT JOIN top_gram t ON t.doc_id = c.doc_id
            ORDER BY c.doc_id"""))

  /** Gopher rule-based quality filter over a structured corpus: three lines
    * per doc built from the document's tokens, with a `###` symbol token
    * injected on doc_id%7, a bullet prefix on %3, and a trailing ellipsis
    * token on %5 — so every rule (word count, mean word length, symbol
    * ratio, bullet/ellipsis line fractions, alpha fraction, stopword hits)
    * splits the corpus and the oracle replays the whole rule set
    * relationally. All fractions are single int/int divisions in double —
    * bit-equal across engines, no rounding. */
  val q84_gopher_filter = Q(
    "q84_gopher_filter",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      def ln(from: Int, len: Int) = array_join(slice(col("toks"), from, len), " ")
      val corpus = d.select(
        col("doc_id"),
        concat_ws("\n",
          when(col("doc_id") % 7 === 0, concat(ln(1, 6), lit(" ###"))).otherwise(ln(1, 6)),
          when(col("doc_id") % 3 === 0, concat(lit("- "), ln(7, 6))).otherwise(ln(7, 6)),
          when(col("doc_id") % 5 === 0, concat(ln(13, 6), lit(" ..."))).otherwise(ln(13, 6)))
          .as("text"))
      TextFunctions.gopherQualityFlags(
        corpus, "doc_id", "text",
        minWords = 12L, maxWords = 100000L,
        minMeanWordLen = 3.6, maxMeanWordLen = 10.0,
        maxSymbolWordRatio = 0.15,
        maxBulletLineFrac = 0.4, maxEllipsisLineFrac = 0.4,
        minAlphaWordFrac = 0.9, minStopwordHits = 1L)
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                array_to_string([
                  CASE WHEN doc_id % 7 = 0 THEN l1 || ' ###' ELSE l1 END,
                  CASE WHEN doc_id % 3 = 0 THEN '- ' || l2 ELSE l2 END,
                  CASE WHEN doc_id % 5 = 0 THEN l3 || ' ...' ELSE l3 END], chr(10)) AS text
              FROM (
                SELECT doc_id,
                  -- DuckDB: array_to_string of an out-of-bounds slice is NULL
                  -- (Spark's array_join of an empty slice is '') — coalesce
                  -- EVERY line so the bullet/ellipsis decoration matches
                  -- Spark on documents of any length
                  COALESCE(array_to_string(toks[1:6], ' '), '') AS l1,
                  COALESCE(array_to_string(toks[7:12], ' '), '') AS l2,
                  COALESCE(array_to_string(toks[13:18], ' '), '') AS l3
                FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents))),
            arrays AS (
              SELECT doc_id, text,
                list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS toks,
                list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lns
              FROM corpus),
            counts AS (
              SELECT doc_id,
                len(toks)::BIGINT AS wc,
                len(lns)::BIGINT AS nl,
                length(regexp_replace(text, '\s+', '', 'g'))::BIGINT AS sum_len,
                (length(text) - length(regexp_replace(text, '#', '', 'g')))::BIGINT AS hash_cnt,
                len(regexp_extract_all(text, '\.\.\.'))::BIGINT AS ell_cnt,
                len(list_filter(lns, l -> starts_with(l, '- ') OR starts_with(l, '* ')
                                          OR starts_with(l, '•')))::BIGINT AS bullet_lines,
                len(list_filter(lns, l -> ends_with(l, '...')))::BIGINT AS ell_lines,
                len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::BIGINT AS alpha_words,
                len(list_filter(['the','be','to','of','and','that','have','with'],
                    s -> list_contains(list_transform(toks, t -> lower(t)), s)))::BIGINT AS stop_hits
              FROM arrays),
            metrics AS (
              SELECT doc_id,
                wc AS word_count,
                CASE WHEN wc = 0 THEN 0.0 ELSE sum_len::DOUBLE / wc END AS mean_word_len,
                CASE WHEN wc = 0 THEN 0.0 ELSE (hash_cnt + ell_cnt)::DOUBLE / wc END AS symbol_word_ratio,
                CASE WHEN nl = 0 THEN 0.0 ELSE bullet_lines::DOUBLE / nl END AS bullet_line_frac,
                CASE WHEN nl = 0 THEN 0.0 ELSE ell_lines::DOUBLE / nl END AS ellipsis_line_frac,
                CASE WHEN wc = 0 THEN 0.0 ELSE alpha_words::DOUBLE / wc END AS alpha_word_frac,
                stop_hits AS stopword_hits
              FROM counts)
            SELECT doc_id, word_count, mean_word_len, symbol_word_ratio,
              bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,
              CAST(word_count >= 12 AND word_count <= 100000
                AND mean_word_len >= 3.6 AND mean_word_len <= 10.0
                AND symbol_word_ratio <= 0.15
                AND bullet_line_frac <= 0.4 AND ellipsis_line_frac <= 0.4
                AND alpha_word_frac >= 0.9 AND stopword_hits >= 1 AS BIGINT) AS keep
            FROM metrics
            ORDER BY doc_id"""))

  /** SemDeDup semantic deduplication over the embeddings table augmented
    * with ×2-scaled copies (cosine exactly 1, centroid similarities exactly
    * equal — power-of-2 scaling is IEEE-exact — so every copy resolves by
    * the id tie-break). Centroids are the four lowest-id embeddings, so the
    * oracle replays the whole pipeline: the dot/||c|| argmax assignment
    * with its larger-id tie-break, centroid cosine, and the per-item
    * EXISTS drop rule. All similarity arithmetic is double with identical
    * accumulation order on both engines. */
  val q85_semantic_dedup = Q(
    "q85_semantic_dedup",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val copies = emb.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * 2.0).as("embedding"))
      val corpus = emb.unionByName(copies)
      // SemDeDup's scale contract is k ∝ corpus (the paper runs
      // k ≈ corpus/10k): a FIXED centroid count makes every cell grow
      // with the data and the per-cell self-join grow quadratically —
      // the 5× synthesized scale gate measured exponent 1.74 with k=4
      // pinned. One centroid per ~1000 corpus rows keeps cells bounded
      // (k stays 4 at the driver SFs, so results there are unchanged);
      // the count() is a parquet-footer action, not a data scan.
      val k = math.max(4L, (2L * emb.count()) / 1000L)
      val cents = emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      Similarity.semanticDeduplicate(corpus, cents, threshold = 0.99)
        .select(
          col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          round(col("centroid_sim"), 4).as("centroid_sim"),
          col("keep"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            corpus AS (
              SELECT vec_id, v FROM e
              UNION ALL
              SELECT vec_id + 1000000, list_transform(v, x -> x * 2.0) FROM e),
            cents AS (SELECT vec_id AS cid, v AS cv FROM e
                      WHERE vec_id < GREATEST(4, (SELECT 2 * COUNT(*) FROM embeddings) // 1000)),
            assigned AS (
              SELECT c.vec_id, c.v, cid, cv,
                ROW_NUMBER() OVER (
                  PARTITION BY c.vec_id
                  ORDER BY list_dot_product(c.v, cv) / sqrt(list_dot_product(cv, cv)) DESC,
                           cid DESC) AS rn
              FROM corpus c CROSS JOIN cents),
            withsim AS (
              SELECT vec_id, v, cid AS cluster,
                list_dot_product(v, cv) /
                  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS centroid_sim
              FROM assigned WHERE rn = 1),
            dropped AS (
              SELECT DISTINCT a.vec_id
              FROM withsim a JOIN withsim b
                ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
               AND list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) > 0.99
               AND (b.centroid_sim < a.centroid_sim OR
                    (b.centroid_sim = a.centroid_sim AND b.vec_id < a.vec_id)))
            SELECT CAST(w.vec_id AS BIGINT) AS vec_id,
              CAST(w.cluster AS BIGINT) AS cluster,
              ROUND(w.centroid_sim, 4) AS centroid_sim,
              CAST(d.vec_id IS NULL AS BIGINT) AS keep
            FROM withsim w LEFT JOIN dropped d ON d.vec_id = w.vec_id
            ORDER BY w.vec_id"""))

  /** BM25 ranked scoring of the documents corpus against a 3-term query.
    * Exact-integer tf/dl/df, avgdl = exact long sum divided once, and the
    * score is a fixed-order expression sum over terms — both engines
    * evaluate the same floating-point tree, so ROUND(,4) is cosmetic, not
    * a tolerance. */
  val q86_bm25 = Q(
    "q86_bm25",
    (s, dir) => {
      TextFunctions.bm25Scores(
        t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text")),
        "doc_id", "text", terms = Seq("spark", "table", "the"))
        .select(
          col("doc_id"), col("tf1"), col("tf2"), col("tf3"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS doc_id,
                list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS toks
              FROM documents),
            m AS (
              SELECT doc_id, len(toks)::BIGINT AS dl,
                len(list_filter(toks, t -> t = 'spark'))::BIGINT AS tf1,
                len(list_filter(toks, t -> t = 'table'))::BIGINT AS tf2,
                len(list_filter(toks, t -> t = 'the'))::BIGINT AS tf3
              FROM d),
            stats AS (
              SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT AS suml,
                SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::BIGINT AS df1,
                SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::BIGINT AS df2,
                SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END)::BIGINT AS df3
              FROM m)
            SELECT doc_id, tf1, tf2, tf3,
              ROUND(
                ln(1.0 + (CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
                  * (CAST(tf1 AS DOUBLE) * 2.2)
                  / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(suml AS DOUBLE) / n)))
                + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
                  * (CAST(tf2 AS DOUBLE) * 2.2)
                  / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(suml AS DOUBLE) / n)))
                + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5))
                  * (CAST(tf3 AS DOUBLE) * 2.2)
                  / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(suml AS DOUBLE) / n)))
              , 4) AS bm25
            FROM m, stats ORDER BY doc_id"""))

  /** Exact-substring duplicate-span removal over a corpus where every
    * fourth document is prefixed with the SAME 10-token boilerplate
    * sentence — those documents share the prefix's three 8-token windows
    * (boundary windows mix in natural tokens and stay unique), plus
    * whatever window repeats the small-vocabulary corpus produces
    * naturally. The oracle replays the whole pipeline with raw window
    * STRINGS as keys (Spark groups their xxhash64 — identical flagging
    * absent a 64-bit collision). */
  val q87_span_dedup = Q(
    "q87_span_dedup",
    (s, dir) => {
      val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val corpus = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"),
        when(col("doc_id") % 4 === 0, concat(lit(boiler + " "), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.removeDuplicateSpans(corpus, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                CASE WHEN doc_id % 4 = 0
                     THEN 'alpha beta gamma delta epsilon zeta eta theta iota kappa ' || text
                     ELSE text END AS text
              FROM documents),
            d AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS toks
              FROM corpus),
            wins AS (
              SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS gram
              FROM d, unnest(range(GREATEST(len(toks) - 7, 0))) AS u(i)),
            dups AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) > 1),
            flagged AS (SELECT w.doc_id, w.pos FROM wins w JOIN dups USING (gram)),
            covered AS (
              SELECT DISTINCT doc_id, pos + j AS cpos
              FROM flagged, unnest(range(8)) AS v(j)),
            toksp AS (
              SELECT doc_id, j AS pos, toks[j+1] AS tok
              FROM d, unnest(range(len(toks))) AS w(j)),
            kept AS (
              SELECT t.doc_id, t.pos, t.tok FROM toksp t
              LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.cpos = t.pos
              WHERE c.doc_id IS NULL),
            rebuilt AS (
              SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS cleaned_text
              FROM kept GROUP BY doc_id),
            counts AS (
              SELECT doc_id, COUNT(*)::BIGINT AS n_dup_windows FROM flagged GROUP BY doc_id)
            SELECT d.doc_id,
              COALESCE(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
              COALESCE(r.cleaned_text, '') AS cleaned_text
            FROM d
            LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
            LEFT JOIN counts c ON c.doc_id = d.doc_id
            ORDER BY d.doc_id"""))

  /** Incremental ingest dedup: a batch of last-word-clipped copies of every
    * fifth document (jaccard ≈ (m−1)/m ≥ 0.8) screened against the full
    * corpus. The oracle is the complete CROSS-SIDE pair ground truth —
    * new×new and existing×existing pairs must not appear, which is exactly
    * the operator's contract — spelled as an inverted-index join (shared
    * shingle → COUNT = intersection) rather than a CROSS JOIN of
    * list_intersects: identical output, near-linear instead of the
    * 425 s-at-sf0.1 quadratic form (the q29/q69 rewrite, r8). */
  val q88_dedup_incremental = Q(
    "q88_dedup_incremental",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val incoming = d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        array_join(
          slice(split(trim(col("text")), "\\s+"), lit(1),
            size(split(trim(col("text")), "\\s+")) - 1), " ").as("text"))
      Dedup.minhashNearDuplicatesAgainst(
        incoming, d, "doc_id", "text",
        bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
        .select(
          col("new_id").cast("long").as("new_id"),
          col("existing_id").cast("long").as("existing_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("new_id", "existing_id")
    },
    Some("""WITH newdocs AS (
              SELECT doc_id + 2000000 AS doc_id,
                array_to_string(toks[1:len(toks)-1], ' ') AS text
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
              WHERE doc_id % 5 = 0),
            sh_of AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM newdocs)),
            sh_ex AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM documents)),
            nsz AS (SELECT doc_id, len(shingles) AS sz FROM sh_of),
            esz AS (SELECT doc_id, len(shingles) AS sz FROM sh_ex),
            nex AS (SELECT doc_id, unnest(shingles) AS s FROM sh_of),
            eex AS (SELECT doc_id, unnest(shingles) AS s FROM sh_ex),
            inter AS (
              SELECT n.doc_id AS new_id, e.doc_id AS existing_id, COUNT(*) AS ic
              FROM nex n JOIN eex e ON n.s = e.s
              GROUP BY 1, 2),
            pairs AS (
              SELECT new_id, existing_id,
                CAST(ic AS DOUBLE) / (ns.sz + es.sz - ic) AS jaccard
              FROM inter
              JOIN nsz ns ON ns.doc_id = new_id
              JOIN esz es ON es.doc_id = existing_id)
            SELECT CAST(new_id AS BIGINT) AS new_id,
              CAST(existing_id AS BIGINT) AS existing_id,
              ROUND(jaccard, 4) AS jaccard
            FROM pairs WHERE jaccard >= 0.8 ORDER BY new_id, existing_id"""))

  /** Bloom-filter ingest screen (training-data pipeline op): the existing
    * corpus is summarized once into a fixed-size bit array (zero-shuffle
    * typed-imperative aggregate), the batch is filtered map-side by the
    * codegen probe, and only the surviving candidates drive the exact
    * verification joins (both broadcast). Output semantics are EXACT — the
    * Bloom filter is a prefilter, never the answer — so the oracle is a
    * plain normalized-text anti-membership replay. */
  val q89_bloom_screen = Q(
    "q89_bloom_screen",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("text"),
        col("n_chars").cast("long").as("n_chars"))
      // batch: %3==0 rows re-ingest the EXACT text (duplicates — must drop);
      // %3==1 rows carry a unique suffix (novel — must survive)
      val batch = d.filter(col("doc_id") % 3 <= 1).select(
        (col("doc_id") + 3000000L).as("doc_id"),
        when(col("doc_id") % 3 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" novel "), col("doc_id").cast("string"))).as("text"),
        col("n_chars"))
      Dedup.bloomScreen(batch, d, "doc_id", "text")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },
    Some("""WITH batch AS (
              SELECT doc_id + 3000000 AS doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN text
                          ELSE text || ' novel ' || CAST(doc_id AS VARCHAR) END AS text,
                     n_chars
              FROM documents WHERE doc_id % 3 <= 1),
            ex AS (
              SELECT DISTINCT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
              FROM documents)
            SELECT CAST(b.doc_id AS BIGINT) AS doc_id, CAST(b.n_chars AS BIGINT) AS n_chars
            FROM batch b
            WHERE trim(regexp_replace(regexp_replace(lower(b.text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))
                  NOT IN (SELECT nt FROM ex)
            ORDER BY doc_id"""))

  /** Character-trigram LM surprisal scoring (training-data pipeline op,
    * CCNet-style): train add-one-smoothed trigram counts on a trusted
    * slice (even doc_ids), score every document by integer
    * floor-log₂ surprisal. The per-gram surprisal is pure 64-bit integer
    * arithmetic (`length(bin(q)) − 1`) — bit-exact across engines, unlike
    * a float ln(p) — so the oracle replays it hash-exactly. */
  val q90_lm_score = Q(
    "q90_lm_score",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val lm = TextFunctions.trainCharLm(d.filter(col("doc_id") % 2 === 0), "text")
      TextFunctions.lmSurprisalScores(d, "doc_id", "text", lm)
        .orderBy("doc_id")
    },
    Some("""WITH norm AS (
              SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
              FROM documents),
            doc_grams AS (
              SELECT n.doc_id, substr(n.nt, CAST(u.i AS INTEGER), 3) AS gram
              FROM norm n, UNNEST(range(1, len(n.nt) - 1)) AS u(i)),
            model AS (
              SELECT gram, COUNT(*) AS cnt FROM doc_grams WHERE doc_id % 2 = 0 GROUP BY 1),
            stats AS (
              SELECT CAST(COALESCE(SUM(cnt), 0) + COUNT(*) AS BIGINT) AS numer FROM model),
            scored AS (
              SELECT dg.doc_id,
                     COUNT(*) AS n_grams,
                     SUM(length(bin((SELECT numer FROM stats) // (COALESCE(m.cnt, 0) + 1))) - 1) AS surprisal
              FROM doc_grams dg LEFT JOIN model m USING (gram)
              GROUP BY 1)
            SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(s.surprisal, 0) AS BIGINT) AS surprisal,
                   CASE WHEN COALESCE(s.n_grams, 0) > 0
                        THEN CAST(s.surprisal AS DOUBLE) / s.n_grams END AS avg_surprisal
            FROM norm n LEFT JOIN scored s USING (doc_id)
            ORDER BY doc_id"""))

  /** Deterministic train/val/test split (training-data pipeline op): the
    * content-keyed split column with cumulative thresholds 0.7/0.1/0.1 —
    * the remaining 10% stays NULL ("held out entirely"), exercising the
    * under-allocated path. Weights-by-id means assignments survive corpus
    * refreshes with no train/test migration; zero shuffle. */
  val q91_split = Q(
    "q91_split",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .splitByHash(d, "doc_id", Seq("train" -> 0.7, "val" -> 0.1, "test" -> 0.1),
          seed = "r6", uniform = knuthUniform)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("split", "lang")
    },
    Some(s"""WITH u AS (SELECT *, ${knuthUniformSql("doc_id", "r6")} AS uu FROM documents)
             SELECT CASE WHEN uu < 0.7 THEN 'train' WHEN uu < 0.8 THEN 'val'
                         WHEN uu < 0.9 THEN 'test' END AS split,
                    lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM u GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** GPT-style sequence packing (training-data pipeline op): per-source
    * document streams cut into fixed 256-token training sequences, documents
    * spanning boundaries — the pretraining data layout. Output is the
    * per-sequence manifest (docs contributing, slots filled); all integer
    * arithmetic, hash-exact. */
  val q92_seq_pack = Q(
    "q92_seq_pack",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("n_tok", TextFunctions.tokenCount(col("text")).cast("long"))
      val packed = graft.text.Sharding
        .packTrainingSequences(d, "doc_id", "n_tok", seqLen = 256L, partitionCols = Seq("source"))
      graft.text.Sharding.sequenceManifest(packed, "n_tok", 256L, Seq("source"))
        .select(
          col("source"), col("seq").cast("long").as("seq"),
          col("n_docs").cast("long").as("n_docs"), col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("source", "seq")
    },
    Some("""WITH toks AS (
              SELECT source, doc_id,
                     len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS tok
              FROM documents),
            cum AS (
              SELECT source, tok,
                     SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS c
              FROM toks),
            spans AS (
              SELECT source, tok, c - tok AS s,
                     CAST((c - tok) // 256 AS BIGINT) AS first_seq,
                     CAST(CASE WHEN tok > 0 THEN (c - 1) // 256 ELSE (c - tok) // 256 END AS BIGINT) AS last_seq
              FROM cum),
            fanout AS (
              SELECT source, tok, s, u.seq AS seq
              FROM spans, UNNEST(range(first_seq, last_seq + 1)) AS u(seq))
            SELECT source, CAST(seq AS BIGINT) AS seq,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(LEAST(s + tok, (seq + 1) * 256) - GREATEST(s, seq * 256)) AS BIGINT) AS n_tokens
            FROM fanout GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Unicode NFC normalization (training-data pipeline op): the corpus is
    * ASCII, so decomposed accents (e + U+0301) are injected deterministically
    * into every 5th document by BOTH engines, then each normalizes its own
    * injection — Spark via the native codegen expression, DuckDB via
    * `nfc_normalize` — and reports codepoint counts. Composition shrinks
    * exactly one codepoint per injected mark, so `len_raw − len_nfc =
    * n_comp` row-by-row; any normalizer divergence breaks the hash. */
  val q93_unicode_norm = Q(
    "q93_unicode_norm",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val raw = when(col("doc_id") % 5 === 0, regexp_replace(col("text"), "e", "é"))
        .otherwise(col("text"))
      val norm = TextFunctions.unicodeNormalize(col("raw"))
      d.select(col("doc_id").cast("long").as("doc_id"), raw.as("raw"))
        .withColumn("norm", norm)
        .select(
          col("doc_id"),
          length(col("raw")).cast("long").as("len_raw"),
          length(col("norm")).cast("long").as("len_nfc"),
          (length(col("norm")) - length(regexp_replace(col("norm"), "\u00e9", "")))
            .cast("long").as("n_comp"))
        .orderBy("doc_id")
    },
    Some("""WITH raw AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN replace(text, 'e', 'e' || chr(769))
                          ELSE text END AS r
              FROM documents),
            norm AS (SELECT doc_id, r, nfc_normalize(r) AS n FROM raw)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(length(r) AS BIGINT) AS len_raw,
                   CAST(length(n) AS BIGINT) AS len_nfc,
                   CAST(length(n) - length(replace(n, chr(233), '')) AS BIGINT) AS n_comp
            FROM norm ORDER BY doc_id"""))

  /** DuckDB replay of `Bpe.trainMerges` for `k` rounds: per round, weighted
    * adjacent-pair counts over the word table, argmax with the same
    * (count desc, lexicographic) tie-break, then the greedy merge applied
    * via a `list_reduce` accumulator (bit-equivalent to the single-pass
    * scan: a freshly merged symbol never re-matches as the left side in the
    * same pass). Generated, not hand-written, so the round count is free.
    * Interpolated fragments carry no backslashes (the s-interpolator
    * processes escapes even in triple quotes); raw regex lives in `normSql`
    * / `wsSql`. */
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""
  private val wsSql = """'\s+'"""
  private def bpeRoundsSql(k: Int): String = {
    val base = s"""w0 AS (
        SELECT regexp_extract_all(word, '.') AS syms, COUNT(*) AS cnt
        FROM (SELECT u.word AS word
              FROM (SELECT list_filter(regexp_split_to_array($normSql, $wsSql), x -> x <> '') AS toks
                    FROM documents) t, UNNEST(t.toks) AS u(word))
        GROUP BY word)"""
    val rounds = (1 to k).map { r =>
      s""",
      p$r AS (SELECT syms[i] AS l, syms[i + 1] AS r2, SUM(cnt) AS c
              FROM w${r - 1}, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
      b$r AS (SELECT l, r2, c FROM p$r WHERE c >= 2 ORDER BY c DESC, l, r2 LIMIT 1),
      w$r AS (SELECT list_reduce(list_transform(w.syms, s -> [s]),
                      (acc, x) -> CASE WHEN b.l IS NOT NULL AND acc[len(acc)] = b.l AND x[1] = b.r2
                                       THEN list_append(acc[1:len(acc) - 1], b.l || b.r2)
                                       ELSE list_concat(acc, x) END) AS syms, w.cnt AS cnt
              FROM w${r - 1} w LEFT JOIN b$r b ON TRUE)"""
    }.mkString
    base + rounds
  }
  private def bpeOracleSql(k: Int): String = {
    val union = (1 to k)
      .map(r => s"SELECT $r AS rank, l, r2 AS r, c AS cnt FROM b$r")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeRoundsSql(k)}
        SELECT CAST(rank AS BIGINT) AS rank, l, r, CAST(cnt AS BIGINT) AS cnt
        FROM ($union) ORDER BY rank"""
  }

  /** Distributed BPE tokenizer training (training-data pipeline op): 8 merge
    * rules learned from the corpus via the vocabulary-table formulation —
    * one corpus shuffle, then cheap per-round aggregations with the merge
    * rule applied map-side as a codegen reference object. */
  val q94_bpe_train = Q(
    "q94_bpe_train",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Bpe.trainMerges(d, "text", numMerges = 8)
        .select(
          col("rank").cast("long").as("rank"), col("l"), col("r"),
          col("cnt").cast("long").as("cnt"))
        .orderBy("rank")
    },
    Some(bpeOracleSql(8)))

  /** Real video demux (multimodal pipeline op): the pure-JVM AVI/RIFF
    * demuxer over synthetic uncompressed-DIB payloads — stream metadata +
    * every-2nd-frame sampling with mean luminance. Pseudo-mp4 payloads
    * (no JDK codec) decode as zero frames — data, not errors. All frame
    * means are dyadic (k/256), so the double sums are exact and
    * order-independent: no rounding needed on either side. */
  val q95_video = Q(
    "q95_video",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(s, 300).filter(col("media_type") === "video")
      val info = Multimodal.decodeVideoInfo(media)
      val frames = Multimodal.sampleVideoFrames(media, 2)
      val infoAgg = info.groupBy(col("format")).agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("video_frames")).cast("long").as("total_frames"),
        sum(col("video_width")).cast("long").as("sum_width"))
      val frameAgg = frames.groupBy(col("format")).agg(
        count(lit(1)).cast("long").as("n_sampled"),
        sum(col("frame_mean")).as("mean_sum"))
      infoAgg.join(frameAgg, Seq("format"), "left")
        .select(
          col("format"), col("n"), col("total_frames"), col("sum_width"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("mean_sum"), lit(0.0)).as("mean_sum"))
        .orderBy("format")
    },
    Some("""WITH vid AS (
              SELECT range AS i, (range // 3) AS sub FROM range(300) WHERE range % 3 = 2),
            info AS (
              SELECT i, sub,
                     CASE WHEN i % 6 = 2 THEN 'avi' ELSE 'mp4' END AS format,
                     CASE WHEN i % 6 = 2 THEN 16 + (sub % 3) * 8 ELSE 0 END AS w,
                     CASE WHEN i % 6 = 2 THEN 2 + (sub % 4) ELSE 0 END AS nf
              FROM vid),
            frames AS (
              SELECT 'avi' AS format, ((i * 11 + u.j * 31) % 256) / 256.0 AS fm
              FROM info, UNNEST(range(0, CAST(nf AS BIGINT), 2)) AS u(j)
              WHERE i % 6 = 2),
            ia AS (
              SELECT format, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(nf) AS BIGINT) AS total_frames,
                     CAST(SUM(w) AS BIGINT) AS sum_width
              FROM info GROUP BY 1),
            fa AS (
              SELECT format, CAST(COUNT(*) AS BIGINT) AS n_sampled, SUM(fm) AS mean_sum
              FROM frames GROUP BY 1)
            SELECT i.format, i.n, i.total_frames, i.sum_width,
                   COALESCE(f.n_sampled, 0) AS n_sampled,
                   COALESCE(f.mean_sum, 0.0) AS mean_sum
            FROM ia i LEFT JOIN fa f USING (format) ORDER BY format"""))

  /** Structured Streaming end-to-end with a BATCH ORACLE (SURVEY §2.12
    * extension, first oracle-green streaming row): the events table is
    * re-read as a file STREAM, runs through the watermarked 6-hour tumbling
    * window aggregation, drains under `Trigger.AvailableNow` into a memory
    * sink, and the final table must equal DuckDB's batch group-by of the
    * same bucketing — streaming and batch semantics coincide on bounded
    * input, and any watermark/window bug diverges the hash. Complete output
    * mode deliberately: append would withhold every window not yet past the
    * watermark at end-of-stream (the classic silent-empty-tail trap); at
    * production scale the same pipeline runs append + RocksDB state. */
  val q96_stream_agg = Q(
    "q96_stream_agg",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the file stream source monitors a DIRECTORY; expose the single
      // events file through a temp dir via symlink (no copy)
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q96")
      // absolute target: a relative symlink would resolve against the temp
      // dir, not the JVM cwd, and dangle for relative data dirs
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val agg = graft.streaming.StreamOps.windowedAggregate(
        stream, "ts", "6 hours", None, watermark = "1 hour",
        groupColumns = Seq("event_type"), aggName = "count", valueColumn = "value")
      val qname = s"graft_q96_${streamRuns.incrementAndGet()}" // bench runs twice
      val query = scopedStreamStart(s)(agg.writeStream.format("memory").queryName(qname)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      // the stream is fully drained into the memory sink — the temp dir
      // and symlink are no longer referenced (each bench run would
      // otherwise leak one)
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname).select(
        col("window.start").cast("long").as("win_start"),
        col("event_type"),
        col("value").cast("long").as("n"))
        .orderBy("win_start", "event_type")
    },
    Some("""SELECT CAST((epoch_us(ts) // 21600000000) * 21600 AS BIGINT) AS win_start,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))
  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Scope `spark.sql.shuffle.partitions` down to 8 around a streaming
    * query's start: state-store partitioning is FIXED at the first batch
    * from this conf, and per-batch store open/commit (plus tiny-batch
    * shuffle task launch) scales with it — for the catalog's bounded
    * corpora that machinery dominates the streaming queries' cost (the
    * q154 stream-stream join measured 14.3 s → 3.4 s). Restored
    * immediately after `.start()`: only the streaming plan captures the
    * value, so batch queries on the session are unaffected. On a real
    * cluster the same knob is sized to state volume instead. */
  private def scopedStreamStart[A](s: SparkSession)(start: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try start
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** BPE encoding with the learned merges (training-data pipeline op): the
    * 8 rules from q94 applied corpus-wide as a pure map-side projection
    * (chained codegen merge nodes inside a per-word lambda), then the token
    * histogram. The oracle re-derives the same merges AND the final symbol
    * table in SQL and takes the histogram from the word table — identical
    * numbers through a completely different factoring (per-doc encode vs
    * weighted word-table fanout). */
  val q97_bpe_encode = Q(
    "q97_bpe_encode",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val merges = graft.text.Bpe.trainMerges(d, "text", numMerges = 8)
        .orderBy("rank")
        .collect()
        .map(r => (r.getString(1), r.getString(2)))
        .toSeq
      graft.text.Bpe.encode(d, "text", merges)
        // house rule: explode(array_compact(attribute)), never the bare
        // expensive projected attribute (q78 pushdown-duplication trap)
        .select(explode(array_compact(col("bpe_tokens"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy("token")
    },
    Some(s"""WITH ${bpeRoundsSql(8)}
             SELECT u.tok AS token, CAST(SUM(cnt) AS BIGINT) AS cnt
             FROM w8, UNNEST(w8.syms) AS u(tok) GROUP BY 1 ORDER BY 1"""))

  /** Per-domain document caps (training-data pipeline op): keep at most 20
    * docs per source, chosen by deterministic content-keyed hash order (the
    * CommonCrawl "domain quota" step — prevents any single domain from
    * dominating the mix; hash order makes the quota stable across corpus
    * refreshes instead of keeping whichever rows arrive first). */
  val q98_domain_cap = Q(
    "q98_domain_cap",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .capPerGroup(d, Seq("source"), 20, orderBy = Seq(
          knuthUniform(col("doc_id"), "cap"), col("doc_id")))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("source")
    },
    Some(s"""WITH ranked AS (
               SELECT source, n_chars,
                      ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY ${knuthUniformSql("doc_id", "cap")}, doc_id) AS rn
               FROM documents)
             SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM ranked WHERE rn <= 20 GROUP BY 1 ORDER BY 1"""))

  /** Robust MAD outlier tagging (telemetry-cleaning op): per event type,
    * |value − median| > 3·MAD. Both engines compute median/MAD from
    * identical doubles with the same interpolation rule, so the boundary
    * comparison is deterministic; outputs are exact counts + rounded
    * robust statistics. */
  val q99_mad_outliers = Q(
    "q99_mad_outliers",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.operators.Outliers.madOutliers(e, "value", Seq("event_type"), k = 3.0)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("is_outlier").cast("long")).cast("long").as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH med AS (
              SELECT event_type, MEDIAN(value) AS m FROM events GROUP BY 1),
            mad AS (
              SELECT e.event_type, MEDIAN(ABS(e.value - med.m)) AS d
              FROM events e JOIN med USING (event_type) GROUP BY 1)
            SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN ABS(e.value - med.m) > mad.d * 3.0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM events e JOIN med USING (event_type) JOIN mad ON mad.event_type = e.event_type
            GROUP BY 1 ORDER BY 1"""))

  /** Time-series gap filling (imputation op): hourly per-type event counts
    * on the full observed grid, empty hours LOCF-imputed (~40 gap hours per
    * type at sf0.01); leading gaps stay NULL — imputing them would invent
    * data. The metric is an exact count, so imputed values are
    * engine-deterministic. */
  val q100_gap_fill = Q(
    "q100_gap_fill",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.GapFill.locfCounts(e, "ts", Seq("event_type"), bucketSeconds = 3600L)
        .orderBy("event_type", "bucket_start")
    },
    Some("""WITH c AS (
              SELECT event_type, epoch_us(ts) // 3600000000 AS b,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM c),
            spine AS (
              SELECT et.event_type, u.b
              FROM (SELECT DISTINCT event_type FROM events) et,
                   bounds, UNNEST(range(bounds.lo, bounds.hi + 1)) AS u(b)),
            j AS (SELECT s.event_type, s.b, c.n
                  FROM spine s LEFT JOIN c ON c.event_type = s.event_type AND c.b = s.b)
            SELECT event_type, CAST(b * 3600 AS BIGINT) AS bucket_start,
                   CAST(last_value(n IGNORE NULLS) OVER (
                     PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_filled,
                   CAST(n IS NULL AS BIGINT) AS was_filled
            FROM j ORDER BY event_type, bucket_start"""))

  /** Inverted index with capped posting lists (retrieval-infrastructure
    * op): token → doc_freq + first-10 postings in id order. The cap is
    * enforced by a window BEFORE any list materializes — stopword tokens
    * never build corpus-sized arrays. */
  val q101_inverted_index = Q(
    "q101_inverted_index",
    (s, dir) => {
      val d = t(s, dir, "documents")
      TextFunctions.invertedIndex(d, "doc_id", "text", maxPostings = 10)
        .select(col("token"), col("doc_freq").cast("long").as("doc_freq"), col("postings"))
        .orderBy("token")
    },
    Some("""WITH toks AS (
              SELECT DISTINCT doc_id, u.token AS token
              FROM (SELECT doc_id,
                           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS tk
                    FROM documents) t, UNNEST(t.tk) AS u(token)),
            ranked AS (
              SELECT doc_id, token,
                     ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY token) AS doc_freq
              FROM toks)
            SELECT token, CAST(doc_freq AS BIGINT) AS doc_freq,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
            FROM ranked WHERE rn <= 10 GROUP BY token, doc_freq ORDER BY token"""))

  /** Temperature-based language rebalancing (mT5/XLM-R τ=2): high-resource
    * languages downsample to sqrt-proportional sizes, the rarest keeps
    * 100%. τ=2 on purpose — sqrt is IEEE-correctly-rounded on both engines,
    * unlike a libm pow (the q90 floor-log2 lesson, applied to exponents). */
  val q102_temperature_mix = Q(
    "q102_temperature_mix",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .temperatureSample(d, "doc_id", "lang", seed = "temp", uniform = knuthUniform)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_kept"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("lang")
    },
    Some(s"""WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
             mn AS (SELECT MIN(n) AS nmin FROM cnt),
             rates AS (SELECT lang, SQRT(CAST(nmin AS DOUBLE) / n) AS r FROM cnt, mn)
             SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
                    CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM documents d JOIN rates ON rates.lang = d.lang
             WHERE ${knuthUniformSql("d.doc_id", "temp")} < rates.r
             GROUP BY 1 ORDER BY 1"""))

  /** In-row semi-structured extraction (SURVEY §2.10 family): the events
    * `props` JSON column parsed with a declared schema (`from_json` —
    * codegen'd, unlike a per-field get_json_object re-parse) and aggregated.
    * Exact integer outputs. */
  val q103_json_props = Q(
    "q103_json_props",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.select(
        col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("k")).cast("long").as("n_k"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
                   CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS n_k,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
                   CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS min_k,
                   CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Corpus snapshot diff (pipeline-ops op): what changed between two
    * corpus versions — added / removed / changed / unchanged by content
    * comparison under a full outer join. The refresh-audit primitive behind
    * incremental re-processing (only `changed`+`added` re-enter the
    * pipeline). Both engines build the same synthetic "next" snapshot. */
  val q104_snapshot_diff = Q(
    "q104_snapshot_diff",
    (s, dir) => {
      val old = t(s, dir, "documents")
      val next = old
        .filter(col("doc_id") % 5 =!= 0) // every 5th doc removed
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2"))) // every 7th edited
            .otherwise(col("text")))
        .unionByName( // 100 new docs
          old.filter(col("doc_id") < 100).select(
            (col("doc_id") + 1000000L).as("doc_id"), concat(lit("new "), col("text")).as("text"),
            col("lang"), col("source"), col("n_chars")))
      graft.text.Dedup.corpusDiff(old, next, "doc_id", "text")
        .groupBy(col("status"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("status")
    },
    Some("""WITH next AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
              FROM documents WHERE doc_id % 5 <> 0
              UNION ALL
              SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id < 100),
            d AS (
              SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN o.text = n.text THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM documents o FULL OUTER JOIN next n ON o.doc_id = n.doc_id)
            SELECT status, CAST(COUNT(*) AS BIGINT) AS n
            FROM d GROUP BY 1 ORDER BY 1"""))

  /** Salted skew join (SURVEY §2.3 scale family): lineitem ⋈ part through
    * the hot-key salting path — big side salted by its own order key, small
    * side replicated ×8 — and the result must equal the PLAIN equi-join
    * (the oracle). Correctness of the rewrite is the point; the win shows
    * up when one key owns a shuffle partition. */
  val q105_salted_join = Q(
    "q105_salted_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      graft.operators.SkewJoin
        .saltedEquiJoin(
          li.withColumnRenamed("l_partkey", "p_partkey"), p,
          Seq("p_partkey"), salts = 8, saltSource = col("l_orderkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("p_brand")
    },
    Some("""SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l.l_quantity), 2) AS sum_qty
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1 ORDER BY 1"""))

  /** Ordered conversion funnel (product-analytics op): per user, the first
    * view, the first click strictly after it, the first purchase strictly
    * after that — three user-keyed aggregations, each stage filtering on
    * the previous stage's timestamp. Exact timestamp comparisons in
    * microseconds; counts per stage. */
  val q106_funnel = Q(
    "q106_funnel",
    (s, dir) => {
      val e = t(s, dir, "events")
      // each stage frame feeds BOTH its own count and the next stage —
      // localCheckpoint so the events scan + aggregation runs once per
      // stage instead of once per consumer
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts")).localCheckpoint()
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts")).localCheckpoint()
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      val stages = Seq(("1_view", v), ("2_click_after_view", c), ("3_purchase_after_click", p))
      stages.map { case (name, df) =>
        df.agg(count(lit(1)).cast("long").as("n_users")).select(lit(name).as("stage"), col("n_users"))
      }.reduce(_ unionByName _).orderBy("stage")
    },
    Some("""WITH v AS (
              SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1),
            c AS (
              SELECT e.user_id, MIN(e.ts) AS c_ts
              FROM events e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
            p AS (
              SELECT e.user_id, MIN(e.ts) AS p_ts
              FROM events e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
            SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
            UNION ALL SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
            UNION ALL SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
            ORDER BY stage"""))

  /** Cohort retention (product-analytics op): users grouped by first-seen
    * day, retention = distinct active users at each day offset. Two
    * aggregations (first-seen, distinct user-day activity) joined on the
    * user key. Integer day arithmetic on epoch seconds — exact. */
  val q107_cohort_retention = Q(
    "q107_cohort_retention",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("week", expr("CAST(ts AS LONG) div 86400"))
      val firstSeen = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      val active = e.select(col("user_id"), col("week")).distinct()
      active.join(firstSeen, Seq("user_id"))
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset"))
        .agg(countDistinct(col("user_id")).cast("long").as("n_users"))
        .select(col("cohort").cast("long").as("cohort"), col("offset").cast("long").as("offset"), col("n_users"))
        .orderBy("cohort", "offset")
    },
    Some("""WITH w AS (
              SELECT user_id, epoch_us(ts) // 86400000000 AS week FROM events),
            f AS (SELECT user_id, MIN(week) AS cohort FROM w GROUP BY 1),
            a AS (SELECT DISTINCT user_id, week FROM w)
            SELECT CAST(f.cohort AS BIGINT) AS cohort,
                   CAST(a.week - f.cohort AS BIGINT) AS "offset",
                   CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
            FROM a JOIN f ON f.user_id = a.user_id
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Int8 embedding quantization (vector-compression op): per-label counts,
    * the exact integer sum of the first quantized component, and the max
    * per-vector reconstruction error — deterministic via floor-rounding and
    * a fixed-order fold (no row-order double sums). */
  val q108_quantize = Q(
    "q108_quantize",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ml.Quantize.int8(emb, "embedding")
        .groupBy(col("label"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(element_at(col("q8"), 1)).cast("long").as("sum_q0"),
          max(col("recon_err")).as("max_err"))
        .select(col("label").cast("long").as("label"), col("n"), col("sum_q0"), col("max_err"))
        .orderBy("label")
    },
    Some("""WITH s AS (
              SELECT label, embedding,
                     CASE WHEN m > 0 THEN m / 127.0 ELSE 1.0 END AS scale
              FROM (SELECT label, embedding,
                           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
                    FROM embeddings)),
            r AS (
              SELECT label,
                     CAST(LEAST(127, GREATEST(-127, FLOOR(CAST(embedding[1] AS DOUBLE) / scale + 0.5))) AS BIGINT) AS q0,
                     list_reduce(
                       list_prepend(0.0, list_transform(embedding, x ->
                         abs(CAST(x AS DOUBLE)
                             - LEAST(127, GREATEST(-127, FLOOR(CAST(x AS DOUBLE) / scale + 0.5))) * scale))),
                       (acc, x) -> acc + x) AS err
              FROM s)
            SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q0) AS BIGINT) AS sum_q0, MAX(err) AS max_err
            FROM r GROUP BY 1 ORDER BY 1"""))

  /** collect_list through the whitelist aggregation registry (SURVEY §2.4
    * row, previously spec-only): per-region nation names, sorted then
    * joined so the unordered collection is hash-deterministic. */
  val q109_collect_list = Q(
    "q109_collect_list",
    (s, dir) => {
      val n = t(s, dir, "nation")
      Aggregation.aggregate(n, Seq("n_regionkey"), "collect_list", "n_name", Some("names"))
        .select(
          col("n_regionkey").cast("long").as("n_regionkey"),
          array_join(array_sort(col("names")), ",").as("names"))
        .orderBy("n_regionkey")
    },
    Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
                   string_agg(n_name, ',' ORDER BY n_name) AS names
            FROM nation GROUP BY 1 ORDER BY 1"""))

  /** Invalid-file recovery (SURVEY §2.1 row, previously spec-only): a
    * corrupt .parquet planted next to real part files must be skipped by
    * the recovering reader, and the surviving rows must equal the clean
    * subset — the oracle reads the ORIGINAL table, so any lost or phantom
    * row diverges the hash. */
  val q110_read_recovery = Q(
    "q110_read_recovery",
    (s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
      val out = java.nio.file.Files.createTempDirectory("graft-q110").toString + "/data"
      li.coalesce(2).write.mode("overwrite").parquet(out)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/zz_corrupt.parquet"),
        "not a parquet file".getBytes("UTF-8"))
      graft.sources.Readers.readWithRecovery(s, out)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem WHERE l_orderkey % 10 = 0
            GROUP BY 1 ORDER BY 1"""))

  /** Content hashing (SURVEY §2.10 cache-key row, previously spec-only):
    * the same SHA-256/16-hex fingerprint `query.Models.contentHash` uses
    * for cache keys, applied as a codegen column (`sha2`) — DuckDB's
    * `sha256` replays it byte-for-byte. */
  val q111_content_hash = Q(
    "q111_content_hash",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 50)
      d.select(
        col("doc_id").cast("long").as("doc_id"),
        substring(sha2(col("text"), 256), 1, 16).as("fp"))
        .orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id, substr(sha256(text), 1, 16) AS fp
            FROM documents WHERE doc_id < 50 ORDER BY doc_id"""))

  /** Schema'd reader with renames/ignores (SURVEY §2.1 row, previously
    * spec-only): customer exported to CSV, re-read through a typed
    * `FileSchema` that renames two columns and drops one; the aggregate
    * must equal the original table under the same aliases. */
  val q112_file_schema = Q(
    "q112_file_schema",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val out = java.nio.file.Files.createTempDirectory("graft-q112").toString + "/c.csv"
      c.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
      val fs = graft.core.FileSchema(
        columns = Seq(
          ("c_custkey", "bigint"), ("c_name", "string"), ("c_nationkey", "bigint"),
          ("c_acctbal", "double"), ("c_mktsegment", "string")),
        renames = Map("c_mktsegment" -> "segment", "c_acctbal" -> "balance"),
        ignoreColumns = Seq("c_name"))
      graft.sources.Readers
        .applyFileSchema(graft.sources.Readers.csv(s, out, Some(fs)), fs)
        .groupBy(col("segment"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("balance")), 2).as("total_balance"))
        .orderBy("segment")
    },
    Some("""SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(c_acctbal), 2) AS total_balance
            FROM customer GROUP BY 1 ORDER BY 1"""))

  /** Count-Min heavy hitters (sketch family): one-pass 4×512 counter
    * matrix over lineitem part keys — a fixed 16 KiB artifact instead of
    * the per-key shuffle an exact count needs — probed for the top-10
    * exact keys so the `estimate >= exact` guarantee is visible in the
    * output. The sketch's merge is commutative integer addition, so the
    * matrix is DETERMINISTIC under any partitioning and the oracle replays
    * every cell exactly: per-key xxhash64 (via `tools.OracleSql`), the
    * Kirsch–Mitzenmacher buckets, the four bucket sums, and the min. */
  val q113_heavy_hitters = Q(
    "q113_heavy_hitters",
    (s, dir) => {
      import graft.operators.Sketches
      // keys stay BIGINT end to end: the sketch is built from pre-hashed
      // xxhash64(long) values (CountMinAgg's array<long> form) and probed
      // with the same hash — and the oracle replays the fixed-8-byte
      // XXH64 form (~6 SQL stages) instead of the ~40-stage string form
      val keys = t(s, dir, "lineitem").select(col("l_partkey").as("k"))
      val art = Sketches.buildCountMin(keys, array(xxhash64(col("k"))), depth = 4, width = 512)
      keys
        .groupBy("k")
        .agg(count(lit(1)).cast("long").as("exact"))
        .orderBy(col("exact").desc, col("k"))
        .limit(10)
        .withColumn("est", Sketches.countMinEstimate(art, xxhash64(col("k"))))
        .select(col("k").as("partkey"), col("exact"), col("est"))
        .orderBy("partkey")
    },
    Some {
      import graft.tools.OracleSql._
      // group BEFORE hashing: the exact counts ride through the XXH64
      // stages (they pass non-hash columns along), so only distinct keys
      // pay the staged-expression cost
      val keys = "SELECT l_partkey AS k, COUNT(*) AS exact FROM lineitem GROUP BY 1"
      val hashed = xxhash64LongStages(keys, "k", "kh", pfx = "__c")
      val buckets = (0 until 4)
        .map(i => s"CAST(((h1 + $i * h2) % 4294967296) % 512 AS BIGINT) AS g$i")
        .mkString(", ")
      val sums = (0 until 4)
        .map(i => s"s$i AS (SELECT g$i, SUM(exact) AS c FROM b GROUP BY 1)")
        .mkString(",\n            ")
      val joins = (0 until 4).map(i => s"JOIN s$i ON top.g$i = s$i.g$i").mkString(" ")
      s"""WITH wc AS (
            SELECT k, kh, exact FROM ($hashed)),
          hu AS (
            SELECT k, exact,
                   CASE WHEN kh < 0 THEN kh::HUGEINT + 18446744073709551616::HUGEINT
                        ELSE kh::HUGEINT END AS u
            FROM wc),
          b AS (
            SELECT k, exact, $buckets
            FROM (SELECT k, exact, u % 4294967296 AS h1, u // 4294967296 AS h2 FROM hu)),
          $sums,
          top AS (SELECT * FROM b ORDER BY exact DESC, k LIMIT 10)
          SELECT CAST(top.k AS BIGINT) AS partkey, CAST(top.exact AS BIGINT) AS exact,
                 CAST(LEAST(s0.c, s1.c, s2.c, s3.c) AS BIGINT) AS est
          FROM top $joins
          ORDER BY partkey"""
    })

  /** HyperLogLog distinct-order-keys per return flag (sketch family,
    * p=8 → 256 registers): register table + RAW harmonic estimate beside
    * the exact distinct count. The registers are max-merged — order
    * independent — and the estimate folds exact dyadic 2^-M terms in
    * register order from a fixed start, so even the double is bit-stable
    * and the oracle replays it to the last ulp (the libm-dependent
    * small-range correction is deliberately omitted — see
    * `Sketches.hllEstimate`). */
  val q114_hll_distinct = Q(
    "q114_hll_distinct",
    (s, dir) => {
      import graft.operators.Sketches
      // BIGINT keys: xxhash64(long) replays via the fixed-8-byte oracle form
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_orderkey").as("k"))
      val regs = Sketches.hllRegisters(li, Seq("flag"), xxhash64(col("k")), p = 8)
      val est = Sketches.hllEstimate(regs, Seq("flag"), p = 8)
      li.groupBy("flag")
        .agg(countDistinct(col("k")).cast("long").as("exact"))
        .join(est, Seq("flag"))
        .select(col("flag"), col("exact"), col("registers_used"), col("hll_est"))
        .orderBy("flag")
    },
    Some {
      import graft.tools.OracleSql._
      val m = 256
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val scale = alpha * m.toDouble * m.toDouble
      // DISTINCT first: HLL registers are a MAX per (flag, bucket), so
      // duplicate keys cannot change them — and only distinct keys then
      // pay the staged-XXH64 cost (~4× fewer at lineitem granularity)
      val keys = "SELECT DISTINCT l_returnflag AS flag, l_orderkey AS k FROM lineitem"
      val hashed = xxhash64LongStages(keys, "k", "kh", pfx = "__h")
      s"""WITH hu AS (
            SELECT flag,
                   CASE WHEN kh < 0 THEN kh::HUGEINT + 18446744073709551616::HUGEINT
                        ELSE kh::HUGEINT END AS u
            FROM ($hashed)),
          jr AS (
            SELECT flag, CAST(u % $m AS BIGINT) AS j,
                   CASE WHEN u // $m = 0 THEN 57
                        ELSE 57 - length(bin(CAST(u // $m AS BIGINT))) END AS rho
            FROM hu),
          regs AS (SELECT flag, j, MAX(rho) AS mm FROM jr GROUP BY 1, 2),
          folded AS (
            SELECT flag, CAST(COUNT(*) AS BIGINT) AS registers_used,
                   list_reduce(
                     [$m.0 - COUNT(*)] || list(1.0 / (1::BIGINT << mm) ORDER BY j),
                     (a, b) -> a + b) AS sh
            FROM regs GROUP BY 1),
          exact AS (
            SELECT l_returnflag AS flag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact
            FROM lineitem GROUP BY 1)
          SELECT e.flag, e.exact, f.registers_used, $scale / f.sh AS hll_est
          FROM exact e JOIN folded f USING (flag)
          ORDER BY flag"""
    })

  /** Blocked edit-distance near-duplicate pairs (record-linkage classic):
    * candidates only from equal (brand, name-length) blocks, each verified
    * with codegen'd levenshtein <= 1. The oracle is DuckDB's NATIVE
    * levenshtein — an independent implementation of the same metric. */
  val q115_edit_pairs = Q(
    "q115_edit_pairs",
    (s, dir) => {
      val p = t(s, dir, "part").withColumn("len", length(col("p_name")))
      Dedup
        .editDistanceNearDuplicates(p, "p_partkey", "p_name", Seq("p_brand", "len"), maxDistance = 1)
        .select(
          col("id1").cast("long").as("id1"),
          col("id2").cast("long").as("id2"),
          col("distance").cast("long").as("distance"))
        .orderBy("id1", "id2")
    },
    Some("""SELECT CAST(a.p_partkey AS BIGINT) AS id1, CAST(b.p_partkey AS BIGINT) AS id2,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND length(a.p_name) = length(b.p_name)
                 AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 1
            ORDER BY id1, id2"""))

  /** Two-stage salted aggregation over a 3-key hot-group column (skew
    * family, the aggregation twin of q105's salted join): stage 1 spreads
    * each hot key across 8 salt sub-groups, stage 2 folds the partials.
    * All aggregates are exact-typed (BIGINT sums/counts/min/max), so the
    * result is row-identical to the plain spelling — which is exactly what
    * the oracle runs. */
  val q116_salted_agg = Q(
    "q116_salted_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("qty", col("l_quantity").cast("long"))
      Aggregation
        .saltedAggregate(
          li,
          Seq("l_returnflag"),
          Seq(
            ("sum", "qty", "sum_qty"), ("count", "qty", "n"),
            ("min", "qty", "min_qty"), ("max", "qty", "max_qty")),
          salts = 8,
          saltSource = col("l_orderkey"))
        .select(
          col("l_returnflag"), col("sum_qty").cast("long").as("sum_qty"),
          col("n").cast("long").as("n"), col("min_qty").cast("long").as("min_qty"),
          col("max_qty").cast("long").as("max_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(COUNT(l_quantity) AS BIGINT) AS n,
                   CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
                   CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Window-function breadth (SURVEY §2.5): lag/lead/ntile/cume_dist/rank
    * in one pass over a single per-customer window spec — one shuffle on
    * the partition key serves all five. Raw price pass-throughs and exact
    * rational cume_dist keep every output bit-stable. */
  val q117_window_breadth = Q(
    "q117_window_breadth",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("ckey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        cume_dist().over(w).as("cd"),
        rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate")))
          .cast("long").as("date_rank"))
        .orderBy("okey")
    },
    Some("""SELECT CAST(o_orderkey AS BIGINT) AS okey, CAST(o_custkey AS BIGINT) AS ckey,
                   lag(o_totalprice, 1) OVER w AS prev_price,
                   lead(o_totalprice, 1) OVER w AS next_price,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   cume_dist() OVER w AS cd,
                   CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS date_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY okey"""))

  /** Z-order (Morton) layout pruning: part/supplier keys masked to a
    * 1024×1024 grid, interleaved to a 20-bit curve position, bucketed into
    * 256 "files" of 4096 curve points (64×64 tiles). The box predicate then
    * touches only the buckets its tiles intersect — 6 of 256 here, the
    * pruning a z-ordered layout buys on BOTH dimensions where a plain sort
    * prunes one. Pure integer bit arithmetic; the oracle replays the
    * interleave as the same 20-term shift/mask sum. */
  val q118_zorder = Q(
    "q118_zorder",
    (s, dir) => {
      import graft.operators.Zorder
      val li = t(s, dir, "lineitem").select(
        (col("l_partkey") % 1024).cast("long").as("x"),
        (col("l_orderkey") % 1024).cast("long").as("y"))
      li.withColumn("z", Zorder.interleave(col("x"), col("y"), 10))
        .withColumn("bucket", expr("z div 4096"))
        .filter(col("x").between(90, 180) && col("y").between(200, 280))
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          min(col("z")).as("min_z"), max(col("z")).as("max_z"))
        .orderBy("bucket")
    },
    Some {
      val zterms = (0 until 10)
        .map(b => s"((x >> $b) & 1) * ${1L << (2 * b)} + ((y >> $b) & 1) * ${1L << (2 * b + 1)}")
        .mkString(" + ")
      s"""WITH g AS (
            SELECT CAST(l_partkey % 1024 AS BIGINT) AS x,
                   CAST(l_orderkey % 1024 AS BIGINT) AS y
            FROM lineitem),
          z AS (SELECT x, y, CAST($zterms AS BIGINT) AS z FROM g)
          SELECT CAST(z // 4096 AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
                 MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
                 MIN(z) AS min_z, MAX(z) AS max_z
          FROM z
          WHERE x BETWEEN 90 AND 180 AND y BETWEEN 200 AND 280
          GROUP BY 1 ORDER BY 1"""
    })

  /** Fixed-point integer PageRank, 5 iterations over the order-derived
    * customer graph (~15k edges / 1500 nodes, avg out-degree 10 — a real
    * expander, so the iterations genuinely move mass). Integer arithmetic
    * end-to-end makes the result bit-stable under any partitioning; the
    * oracle replays all 5 rounds as a generated CTE chain. Iterations are
    * eagerly checkpointed ([[graft.operators.Graph]]) — the same
    * lineage-truncation discipline as the q69 connected components. */
  val q119_pagerank = Q(
    "q119_pagerank",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val edges = o.select(
        col("o_custkey").cast("long").as("src"),
        (col("o_orderkey") % 1500).cast("long").as("dst")).distinct()
      graft.operators.Graph.pageRankFixedPoint(edges, iterations = 5)
        .select(col("node").cast("long").as("node"), col("rank").cast("long").as("rank"))
        .orderBy("node")
    },
    Some {
      val iters = (1 to 5).map { i =>
        val prev = s"r${i - 1}"
        s"""r$i AS (
              SELECT nodes.node,
                     (SELECT (1000000000::BIGINT * 15) // (100 * n) FROM consts)
                     + (85 * COALESCE(s.s, 0)) // 100 AS rank
              FROM nodes LEFT JOIN (
                SELECT ed.dst AS node, SUM($prev.rank // ed.outdeg) AS s
                FROM ed JOIN $prev ON ed.src = $prev.node GROUP BY 1) s USING (node))"""
      }.mkString(",\n          ")
      s"""WITH e AS (
            SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                   CAST(o_orderkey % 1500 AS BIGINT) AS dst
            FROM orders),
          nodes AS (
            SELECT DISTINCT node
            FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          consts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
          deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
          ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d USING (src)),
          r0 AS (SELECT node, (SELECT 1000000000::BIGINT // n FROM consts) AS rank FROM nodes),
          $iters
          SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
          FROM r5 ORDER BY node"""
    })

  /** Leakage-safe train/test split (training-data pipeline op): near-dup
    * CLUSTERS place wholly in one split — membership (the component root)
    * decides placement, so a doc and its near-copy can never straddle the
    * eval boundary (Lee et al. 2022's contamination guard). The oracle
    * replays components via the shared recursive CTE and the same
    * root-keyed hash split; per-split doc/group counts pin both the
    * clustering and the assignment. */
  val q120_leakage_split = Q(
    "q120_leakage_split",
    (s, dir) => {
      val corpus = clippedNearDupCorpus(s, dir)
      val pairs = Dedup
        .minhashNearDuplicates(corpus, "doc_id", "text", bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      graft.text.Sampling
        .leakageSafeSplit(
          corpus, "doc_id", pairs, Seq("train" -> 0.8, "test" -> 0.2),
          seed = "lk", uniform = knuthUniform, repColumn = Some("rep"))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          countDistinct(col("rep")).cast("long").as("n_groups"))
        .orderBy("split")
    },
    Some(s"""WITH RECURSIVE $nearDupComponentsCte,
            reps AS (
              SELECT c.doc_id, COALESCE(r.root, c.doc_id) AS rep
              FROM corpus c LEFT JOIN roots r ON c.doc_id = r.id),
            sp AS (
              SELECT doc_id, rep,
                     CASE WHEN ${knuthUniformSql("rep", "lk")} < 0.8 THEN 'train'
                          WHEN ${knuthUniformSql("rep", "lk")} < 1.0 THEN 'test' END AS split
              FROM reps)
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_groups
            FROM sp GROUP BY 1 ORDER BY 1"""))

  /** Streaming exact dedup with a BATCH ORACLE (the q96 pattern for the
    * dedup family): the events file re-read as a stream through
    * `dropDuplicatesWithinWatermark` on (user_id, event_type), drained
    * under AvailableNow into a memory sink. Exactly one row per distinct
    * key survives, so per-user first-occurrence counts equal DuckDB's
    * batch COUNT(DISTINCT event_type) — only key columns are compared
    * because WHICH duplicate survives is processing-order-dependent; the
    * key set is not. */
  val q121_stream_dedup = Q(
    "q121_stream_dedup",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q121")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val dd = graft.streaming.StreamOps.dedupWithinWatermark(
        stream, Seq("user_id", "event_type"), "ts", watermark = "1 hour")
      val qname = s"graft_q121_${streamRuns.incrementAndGet()}"
      val query = scopedStreamStart(s)(dd.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname)
        .groupBy(col("user_id").cast("long").as("user_id"))
        .agg(count(lit(1)).cast("long").as("n_types"))
        .orderBy("user_id")
    },
    Some("""SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** ROLLUP grouping-sets breadth (§2.4 extension — SURVEY marks grouping
    * sets "not needed" for reference parity; this closes the engine-breadth
    * row anyway): per-(flag, status) totals plus per-flag and grand-total
    * super-aggregate rows in ONE pass (Spark expands the sets before the
    * exchange — one shuffle, not three scans), with `grouping_id` labeling
    * each stratum. Exact BIGINT sums; the 'ALL' coalesce keeps NULL
    * grouping markers distinguishable from real NULL data on both engines. */
  val q122_rollup = Q(
    "q122_rollup",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).cast("long").as("n"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"), col("gid"))
        .orderBy("gid", "flag", "status")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
                   COALESCE(l_linestatus, 'ALL') AS status,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY gid, flag, status"""))

  /** Generator/UDTF surface breadth (§2.11): `posexplode` over the token
    * arrays — the ordinal-preserving fan-out every positional text pipeline
    * starts from — cross-checked against DuckDB's UNNEST WITH ORDINALITY.
    * Output is the per-position token table for a doc slice (ordinals are
    * the payload here; q101's inverted index consumes this shape). */
  val q123_posexplode = Q(
    "q123_posexplode",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      d.select(
        col("doc_id").cast("long").as("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")))
        .select(
          col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
        .filter(col("pos") < 12)
        .orderBy("doc_id", "pos")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
                   toks[CAST(u.i AS INTEGER)] AS tok
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                  FROM documents WHERE doc_id < 40),
                 UNNEST(range(1, len(toks) + 1)) AS u(i)
            WHERE u.i <= 12
            ORDER BY doc_id, pos"""))

  /** Johnson–Lindenstrauss random projection (Achlioptas ±1 Rademacher):
    * 64-dim embeddings down to 8 dims via hash-DERIVED sign rows — no
    * matrix to store or shuffle, one codegen'd fvec_dot per output dim,
    * map-side. ±1/√k times a float-widened input is an exact double
    * product folded in index order, so all 8 projection doubles are
    * bit-stable and the oracle replays them to the last ulp with the same
    * embedded coefficients. */
  val q124_jl_projection = Q(
    "q124_jl_projection",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ml.Projection.project(emb, "embedding", inDims = 64, outDims = 8, seed = 7L)
        .select(col("vec_id").cast("long").as("vec_id") +: (0 until 8).map(j => col(s"p$j")): _*)
        .orderBy("vec_id")
    },
    Some {
      val cols = (0 until 8).map { j =>
        val coefs = graft.ml.Projection.signRow(64, j, 8, seed = 7L).mkString("[", ", ", "]")
        s"""list_reduce(list_transform(range(1, 65),
            i -> CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * ($coefs)[CAST(i AS INTEGER)]),
            (a, b) -> a + b) AS p$j"""
      }.mkString(",\n                 ")
      s"""SELECT CAST(vec_id AS BIGINT) AS vec_id,
                 $cols
          FROM embeddings ORDER BY vec_id"""
    })

  /** Incremental-ingest cardinality via HLL artifact merge: two lineitem
    * batches (order-key parity) build INDEPENDENT register tables, merged
    * by register max — the persistable-artifact property (per-batch
    * sketches, query-time union; old batches never rescan). The oracle
    * builds registers over the union directly: max-merge means the two
    * must agree bit-for-bit, estimate included. */
  val q125_hll_union = Q(
    "q125_hll_union",
    (s, dir) => {
      import graft.operators.Sketches
      // the key is the (partkey, orderkey) PAIR, hashed as two chained
      // BIGINT arguments — Spark's multi-arg xxhash64 seeds each argument
      // with the previous result, and the oracle replays the chain in the
      // fixed-8-byte form (two short stage blocks, no string machinery)
      val li = t(s, dir, "lineitem").select(
        col("l_linestatus").as("status"),
        col("l_orderkey").as("okey"),
        col("l_partkey").as("pkey"))
      def regs(parity: Int) = Sketches.hllRegisters(
        li.filter(col("okey") % 2 === parity), Seq("status"),
        xxhash64(col("pkey"), col("okey")), p = 8)
      val merged = Sketches.hllMergeRegisters(regs(0), regs(1), Seq("status"))
      li.groupBy("status")
        .agg(countDistinct(col("pkey"), col("okey")).cast("long").as("exact"))
        .join(Sketches.hllEstimate(merged, Seq("status"), p = 8), Seq("status"))
        .select(col("status"), col("exact"), col("registers_used"), col("hll_est"))
        .orderBy("status")
    },
    Some {
      import graft.tools.OracleSql._
      val m = 256
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val scale = alpha * m.toDouble * m.toDouble
      // DISTINCT triples first (register MAXes are duplicate-invariant)
      val keys =
        "SELECT DISTINCT l_linestatus AS status, l_partkey AS pk, l_orderkey AS ok FROM lineitem"
      val h1 = xxhash64LongStages(keys, "pk", "kh1", pfx = "__g")
      val hashed = xxhash64LongStages(h1, "ok", "kh", pfx = "__h", seed = unsignedOf("kh1"))
      s"""WITH hu AS (
            SELECT status,
                   CASE WHEN kh < 0 THEN kh::HUGEINT + 18446744073709551616::HUGEINT
                        ELSE kh::HUGEINT END AS u
            FROM ($hashed)),
          jr AS (
            SELECT status, CAST(u % $m AS BIGINT) AS j,
                   CASE WHEN u // $m = 0 THEN 57
                        ELSE 57 - length(bin(CAST(u // $m AS BIGINT))) END AS rho
            FROM hu),
          regs AS (SELECT status, j, MAX(rho) AS mm FROM jr GROUP BY 1, 2),
          folded AS (
            SELECT status, CAST(COUNT(*) AS BIGINT) AS registers_used,
                   list_reduce(
                     [$m.0 - COUNT(*)] || list(1.0 / (1::BIGINT << mm) ORDER BY j),
                     (a, b) -> a + b) AS sh
            FROM regs GROUP BY 1),
          exact AS (
            SELECT l_linestatus AS status,
                   CAST(COUNT(DISTINCT (l_partkey, l_orderkey)) AS BIGINT) AS exact
            FROM lineitem GROUP BY 1)
          SELECT e.status, e.exact, f.registers_used, $scale / f.sh AS hll_est
          FROM exact e JOIN folded f USING (status)
          ORDER BY status"""
    })

  /** ANALYZE-style table profile (engine-ops breadth): per-column rowcount
    * / nulls / exact ndv / integral min-max in ONE aggregation pass — the
    * stats that drive broadcast and skew decisions. The unpivot to rows
    * happens on the one-row aggregate, not the data. */
  val q126_profile = Q(
    "q126_profile",
    (s, dir) => {
      graft.operators.TableStats
        .profile(
          t(s, dir, "customer"),
          Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
        .orderBy("col_name")
    },
    Some {
      val integral = Set("c_custkey", "c_nationkey")
      val parts = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment").map { c =>
        val mm =
          if (integral(c)) s"CAST(MIN($c) AS BIGINT) AS min_long, CAST(MAX($c) AS BIGINT) AS max_long"
          else "CAST(NULL AS BIGINT) AS min_long, CAST(NULL AS BIGINT) AS max_long"
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) - COUNT($c) AS BIGINT) AS nulls,
                   CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv, $mm
            FROM customer"""
      }
      parts.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })

  /** ORC round-trip (source/sink breadth): the other native columnar
    * format — write an aggregate as ORC, read it back through the
    * vectorized ORC reader. Warehouse interop at scale is format
    * plurality; the sink/scan pair must be lossless. */
  val q127_orc_roundtrip = Q(
    "q127_orc_roundtrip",
    (s, dir) => {
      val agg = t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          round(sum(col("l_extendedprice")), 2).as("total"),
          count(lit(1)).cast("long").as("n"))
      val out = s.conf.get("spark.local.dir", "/tmp") + "/graft_orc_roundtrip"
      graft.sources.Writers.orc(agg, out)
      graft.sources.Readers.orc(s, out).orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus, ROUND(SUM(l_extendedprice), 2) AS total,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** All-pairs lexical cosine similarity (training-data pipeline op): the
    * inverted-index APSS join over integer 3-gram TF vectors — pure
    * integer arithmetic end to end (dot, norms, and the cos >= 4/5
    * threshold by cross-multiplication), so the operator is bit-exact and
    * the oracle replays it with raw gram strings as keys (Spark shuffles
    * 8-byte xxhash64 keys — the q87 trade). */
  val q128_cosine_pairs = Q(
    "q128_cosine_pairs",
    (s, dir) => {
      graft.text.ApssJoin
        .cosinePairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, minCosNum = 4L, minCosDen = 5L, dfCap = 1000L)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                 x -> len(x) > 0) AS tk
              FROM documents),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
                          ELSE [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                FOR i IN range(1, len(tk) - 1)] END AS gl
              FROM toks),
            g AS (SELECT doc_id, u.gram FROM grams, UNNEST(grams.gl) AS u(gram)),
            tf AS (SELECT doc_id, gram, COUNT(*) AS tf FROM g GROUP BY 1, 2),
            dfc AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM tf GROUP BY 1)
                    WHERE c <= 1000),
            v AS (SELECT tf.* FROM tf JOIN dfc USING (gram)),
            norms AS (SELECT doc_id, SUM(tf * tf) AS norm2 FROM v GROUP BY 1),
            dots AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS dot
              FROM v a JOIN v b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot,
                   CAST(na.norm2 AS BIGINT) AS norm2_a,
                   CAST(nb.norm2 AS BIGINT) AS norm2_b
            FROM dots
            JOIN norms na ON na.doc_id = id_a
            JOIN norms nb ON nb.doc_id = id_b
            WHERE 25 * dot * dot >= 16 * na.norm2 * nb.norm2
            ORDER BY id_a, id_b"""))

  /** Exact triangle count by degree orientation (graph breadth): the
    * co-supplier graph (suppliers sharing >= 5 orders), counted by the
    * O(m^1.5) oriented-wedge scheme — the oracle counts the same
    * triangles with the naive 3-way join, which only survives because the
    * oracle's graph is small. */
  val q129_triangles = Q(
    "q129_triangles",
    (s, dir) => {
      val os = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      val a = os.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = os.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val edges = a
        .join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 5)
        .select(col("sa").as("src"), col("sb").as("dst"))
        .localCheckpoint(true) // consumed by the count and the wedge pipeline
      edges
        .agg(count(lit(1)).cast("long").as("n_edges"))
        .crossJoin(graft.operators.Graph.triangleCount(edges))
    },
    Some("""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
            e0 AS (SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS w
                   FROM os a JOIN os b
                     ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
                   GROUP BY 1, 2),
            e AS (SELECT sa, sb FROM e0 WHERE w >= 5)
            SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
                   CAST((SELECT COUNT(*)
                         FROM e e1 JOIN e e2 ON e1.sb = e2.sa
                         JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb) AS BIGINT) AS triangles"""))

  /** Stream-static join (streaming breadth): the file-stream events table
    * enriched against a STATIC broadcast dimension (customer segment)
    * inside the streaming query, then watermark-windowed counts — the
    * canonical streaming-enrichment shape (the static side is re-plannable
    * per micro-batch; no state grows from it). Complete mode + AvailableNow
    * drain, batch-replayed by the oracle (q96 convention). */
  val q130_stream_static = Q(
    "q130_stream_static",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q130")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val static = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      val enriched = stream.join(broadcast(static), Seq("user_id"))
      val agg = graft.streaming.StreamOps.windowedAggregate(
        enriched, "ts", "6 hours", None, watermark = "1 hour",
        groupColumns = Seq("segment"), aggName = "count", valueColumn = "value")
      val qname = s"graft_q130_${streamRuns.incrementAndGet()}"
      val query = scopedStreamStart(s)(agg.writeStream.format("memory").queryName(qname)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname).select(
        col("window.start").cast("long").as("win_start"),
        col("segment"),
        col("value").cast("long").as("n"))
        .orderBy("win_start", "segment")
    },
    Some("""SELECT CAST((epoch_us(ts) // 21600000000) * 21600 AS BIGINT) AS win_start,
                   c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** SCD2 history build (analytics-engineering breadth): per-user
    * event_type observation stream compressed to validity intervals by
    * gaps-and-islands — one window sort carries the lag, the island sum,
    * and the closing lead. Epoch-microsecond integers end to end. */
  val q131_scd2 = Q(
    "q131_scd2",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(
          col("user_id"),
          col("event_type"),
          unix_micros(col("ts")).as("tsu"),
          col("event_id"))
      graft.operators.History
        .scd2(ev, Seq("user_id"), "tsu", "event_type", tieBreak = Seq("event_id"))
        .select(
          col("user_id"), col("event_type"),
          col("valid_from"), col("valid_to"), col("n_observations"))
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id FROM events),
            f AS (SELECT *, CASE WHEN event_type IS NOT DISTINCT FROM
                                      LAG(event_type) OVER w THEN 0 ELSE 1 END AS chg
                  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
            i AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                                           ROWS UNBOUNDED PRECEDING) AS island FROM f),
            g AS (SELECT user_id, island, MIN(event_type) AS event_type,
                         MIN(tsu) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_observations
                  FROM i GROUP BY 1, 2)
            SELECT user_id, event_type, valid_from,
                   LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
                   n_observations
            FROM g ORDER BY user_id, valid_from"""))

  /** Additive schema evolution (source breadth): two parquet roots written
    * at different schema versions, reconciled by mergeSchema — the old
    * files' missing column surfaces as NULL, no rewrite of old data. */
  val q132_schema_evolution = Q(
    "q132_schema_evolution",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val base = s.conf.get("spark.local.dir", "/tmp") + "/graft_schema_evo"
      val v1 = orders.filter(col("o_orderkey") % 2 === 0)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(round(sum(col("o_totalprice")), 2).as("total"))
      val v2 = orders.filter(col("o_orderkey") % 2 === 1)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(
          round(sum(col("o_totalprice")), 2).as("total"),
          count(lit(1)).cast("long").as("n"))
      graft.sources.Writers.parquet(v1, s"$base/v1")
      graft.sources.Writers.parquet(v2, s"$base/v2")
      graft.sources.Readers.parquetMerged(s, s"$base/v1", s"$base/v2")
        .select(col("pri"), col("total"), col("n"))
        .orderBy(col("pri"), col("n").asc_nulls_first)
    },
    Some("""WITH v1 AS (SELECT o_orderpriority AS pri, ROUND(SUM(o_totalprice), 2) AS total,
                               CAST(NULL AS BIGINT) AS n
                        FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
            v2 AS (SELECT o_orderpriority AS pri, ROUND(SUM(o_totalprice), 2) AS total,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
            SELECT * FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
            ORDER BY pri, n NULLS FIRST"""))

  /** Declarative data-quality expectations (dbt-test / Deequ shape): six
    * rules over lineitem — all row-level rules fused into ONE aggregation
    * pass; uniqueness is its own groupBy; referential integrity is a
    * broadcast anti-join count. */
  val q133_expectations = Q(
    "q133_expectations",
    (s, dir) => {
      import graft.operators.Validation._
      val li = t(s, dir, "lineitem")
      expectationsReport(li, Seq(
        ExpectNotNull("keys_not_null", Seq("l_orderkey", "l_linenumber")),
        ExpectAcceptedValues("returnflag_domain", "l_returnflag", Seq("A", "N", "R")),
        ExpectRange("discount_range", "l_discount", 0.0, 0.05),
        ExpectRange("quantity_range", "l_quantity", 1.0, 30.0),
        ExpectUnique("order_line_unique", Seq("l_orderkey", "l_linenumber")),
        ExpectReferential("orderkey_in_orders", "l_orderkey", t(s, dir, "orders"), "o_orderkey")))
        .orderBy("rule")
    },
    Some("""SELECT * FROM (
              SELECT 'keys_not_null' AS rule,
                     CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM lineitem
              UNION ALL
              SELECT 'returnflag_domain',
                     CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
                                    AND l_returnflag NOT IN ('A', 'N', 'R')
                              THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT 'discount_range',
                     CAST(SUM(CASE WHEN l_discount IS NOT NULL
                                    AND (l_discount < 0.0 OR l_discount > 0.05)
                              THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT 'quantity_range',
                     CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                                    AND (l_quantity < 1.0 OR l_quantity > 30.0)
                              THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT 'order_line_unique',
                     CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'orderkey_in_orders',
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                      WHERE l_orderkey IS NOT NULL
                        AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            ) ORDER BY rule"""))

  /** CDC merge-apply (MERGE INTO shape): a change batch (inserts/updates/
    * deletes derived deterministically from orders) folded into the
    * customer snapshot — delta compacted to one winner per key, then ONE
    * outer join against the base. The oracle replays the same winner
    * selection and join in SQL. */
  val q134_merge_upsert = Q(
    "q134_merge_upsert",
    (s, dir) => {
      val base = t(s, dir, "customer")
        .select(
          col("c_custkey").cast("long").as("k"),
          col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      val changes = t(s, dir, "orders").select(
        when(col("o_orderkey") % 10 === 0, col("o_custkey"))
          .when(col("o_orderkey") % 10 <= 3, col("o_custkey"))
          .otherwise(col("o_custkey") + 1000000L).cast("long").as("k"),
        when(col("o_orderkey") % 10 === 0, "D")
          .when(col("o_orderkey") % 10 <= 3, "U")
          .otherwise("I").as("op"),
        col("o_orderpriority").as("seg"),
        col("o_totalprice").as("bal"),
        col("o_orderkey").cast("long").as("seqno"))
      graft.operators.Cdc
        .applyChanges(base, changes, Seq("k"), "op", Seq(col("seqno")))
        .orderBy("k")
    },
    Some("""WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS seg,
                                 c_acctbal AS bal FROM customer),
            ch AS (SELECT CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_custkey
                                    WHEN o_orderkey % 10 <= 3 THEN o_custkey
                                    ELSE o_custkey + 1000000 END AS BIGINT) AS k,
                          CASE WHEN o_orderkey % 10 = 0 THEN 'D'
                               WHEN o_orderkey % 10 <= 3 THEN 'U'
                               ELSE 'I' END AS op,
                          o_orderpriority AS cseg, o_totalprice AS cbal,
                          CAST(o_orderkey AS BIGINT) AS seqno
                   FROM orders),
            win AS (SELECT * FROM (
                      SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seqno DESC) AS rn
                      FROM ch) WHERE rn = 1)
            SELECT COALESCE(b.k, w.k) AS k,
                   CASE WHEN w.op IS NULL THEN b.seg ELSE w.cseg END AS seg,
                   CASE WHEN w.op IS NULL THEN b.bal ELSE w.cbal END AS bal
            FROM base b FULL OUTER JOIN win w ON b.k = w.k
            WHERE w.op IS NULL OR w.op <> 'D'
            ORDER BY k"""))

  /** Systematic PPS weighted sampling (Madow 1949): 100 picks proportional
    * to document length, every quantity integer arithmetic so the pick
    * multiset is bit-reproducible in any engine — the deterministic
    * weighted sampler a corpus-mixing recipe needs (exp-sort reservoirs
    * depend on libm). One global cumsum window + map-side span math. */
  val q135_pps_sample = Q(
    "q135_pps_sample",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("n_chars") > 0)
      graft.text.Sampling
        .ppsSystematic(d, "n_chars", 100,
          orderBy = Seq(knuthUniform(col("doc_id"), "pps"), col("doc_id")))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("n_chars").cast("long").as("w"), col("multiplicity"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ordered AS (
               SELECT doc_id, n_chars,
                      SUM(CAST(n_chars AS BIGINT)) OVER (
                        ORDER BY ${knuthUniformSql("doc_id", "pps")}, doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
               FROM documents WHERE n_chars > 0),
             tot AS (SELECT MAX(cum) AS t FROM ordered),
             spans AS (SELECT doc_id, n_chars,
                              200 * (cum - n_chars) AS a, 200 * cum AS b, t
                       FROM ordered, tot),
             m AS (SELECT doc_id, n_chars,
                          ((a + t - 1) // t) AS c, ((b - 1) // t) AS d
                   FROM spans)
             SELECT CAST(doc_id AS BIGINT) AS doc_id,
                    CAST(n_chars AS BIGINT) AS w,
                    CAST(((d + 1) // 2) - (c // 2) AS BIGINT) AS multiplicity
             FROM m
             WHERE ((d + 1) // 2) - (c // 2) > 0
             ORDER BY doc_id"""))

  /** Arbitrary-stateful streaming (mapGroupsWithState): the per-user
    * running peak driven through a real file stream under AvailableNow,
    * drained to a memory sink, then reduced — max is order/batching
    * independent, so the streaming result equals the batch peak exactly
    * (the q96 drain pattern for custom state instead of windowed aggs). */
  val q136_stream_state = Q(
    "q136_stream_state",
    (s, dir) => {
      import s.implicits._
      // RAW file schema (the q96/q121 pattern), NOT the normalized batch
      // schema: under a TIMESTAMP(NANOS) encoding the raw column is
      // LongType (nanosAsLong) and normalizeTs must see it that way —
      // forcing TimestampType onto the INT64-nanos column would misread
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft_q136")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val keyed = stream.select(col("user_id").cast("long").as("k"), col("value"))
        .as[(Long, Double)]
      val peaks = graft.streaming.StreamOps.runningPeak(keyed)
      val qname = s"graft_q136_${streamRuns.incrementAndGet()}"
      val q = scopedStreamStart(s)(peaks.toDF("user_id", "peak").writeStream
        .format("memory").queryName(qname).outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      q.awaitTermination()
      // update mode may emit one row per micro-batch per key; the final
      // state is the max — an associative reduce, batching-independent
      s.table(qname)
        .groupBy(col("user_id"))
        .agg(max(col("peak")).as("peak"))
        .filter(col("user_id") < 300)
        .orderBy("user_id")
    },
    Some("""SELECT CAST(user_id AS BIGINT) AS user_id, MAX(value) AS peak
            FROM events WHERE user_id < 300 GROUP BY 1 ORDER BY 1"""))

  /** Small-file compaction (table maintenance): a 40-file fragmented copy
    * of documents rewritten in place to byte-targeted files; the oracle
    * checks content identity — compaction is layout, never semantics.
    * File-count mechanics are spec-asserted (IOValidationSpec). */
  val q137_compaction = Q(
    "q137_compaction",
    (s, dir) => {
      val base = s.conf.get("spark.local.dir", "/tmp") + "/graft_q137"
      graft.sources.Writers.parquet(
        t(s, dir, "documents").repartition(40), base)
      graft.sources.Writers.compactFiles(s, base, targetFileBytes = 4L << 20)
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("source")
    },
    Some("""SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY 1 ORDER BY 1"""))

  /** CUBE aggregation (§2.4 breadth alongside q122's ROLLUP): all four
    * grouping combinations of (returnflag, linestatus) in one pass with
    * grouping_id disambiguation. */
  val q138_cube = Q(
    "q138_cube",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).cast("long").as("n"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"), col("gid"))
        .orderBy("gid", "flag", "status")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
                   COALESCE(l_linestatus, 'ALL') AS status,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY gid, flag, status"""))

  /** b-bit minhash (Li & König 2010): 16-hash signatures compressed to the
    * low 8 bits each (8× smaller dedup artifacts), pairwise Jaccard
    * estimated from b-bit agreement with the 2^-b collision debias. The
    * oracle replays the ENTIRE pipeline value-exactly in DuckDB — shingles,
    * xxhash64 (tools.OracleSql), the k universal-hash mins, the b-bit mask,
    * and the dyadic-rational estimate. */
  val q139_bbit_minhash = Q(
    "q139_bbit_minhash",
    (s, dir) => {
      import graft.text.Dedup
      val d = t(s, dir, "documents").filter(col("doc_id") < 60)
      val sh = Dedup.shingleSets(d, "doc_id", "text", 3)
      val sigs = Dedup.minhashSignaturesFromShingles(sh, "doc_id", 16)
      val bsigs = Dedup.bbitCompress(sigs, "doc_id", 16, 8).cache()
      val ids = bsigs.select(col("doc_id"))
      val pairs = ids.as("x").join(ids.as("y"), col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      val out = Dedup.bbitEstimate(bsigs, pairs, "doc_id", 16, 8)
        .select(col("id1").cast("long"), col("id2").cast("long"),
          col("matches"), col("jaccard_est"))
        .orderBy("id1", "id2")
      // localCheckpoint (not cache): cuts lineage so bsigs can unpersist,
      // without leaking a cached frame into the long-lived bench JVM
      val materialized = out.localCheckpoint(true)
      bsigs.unpersist()
      materialized
    },
    Some {
      import graft.tools.OracleSql._
      val base = s"SELECT CAST(doc_id AS BIGINT) AS doc_id, ${normalizeSql("text")} AS norm " +
        "FROM documents WHERE doc_id < 60"
      val shingles =
        s"""SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(len(toks) - 2),
                     p -> toks[p+1] || ' ' || toks[p+2] || ' ' || toks[p+3]) END) AS sh
            FROM (SELECT doc_id, list_filter(string_split(norm, ' '), t -> len(t) > 0) AS toks
                  FROM ($base))"""
      val dist = s"SELECT DISTINCT doc_id, sh FROM ($shingles)"
      val hashed = xxhash64Stages(dist, "sh", "hv", pfx = "__b")
      val coefs = graft.text.Dedup.minhashCoefs(16).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH hashed AS ($hashed),
            coefs(i, a, b) AS (VALUES $coefs),
            mins AS (SELECT doc_id, i,
                            MIN((CAST(a AS BIGINT) * (((hv % 2147483647) + 2147483647) % 2147483647)
                                 + b) % 2147483647) AS h
                     FROM hashed CROSS JOIN coefs GROUP BY 1, 2),
            bb AS (SELECT doc_id, i, h % 256 AS bv FROM mins),
            pm AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
                          CAST(SUM(CASE WHEN x.bv = y.bv THEN 1 ELSE 0 END) AS BIGINT) AS matches
                   FROM bb x JOIN bb y ON x.i = y.i AND x.doc_id < y.doc_id
                   GROUP BY 1, 2)
          SELECT id1, id2, matches,
                 (matches / 16.0 - 0.00390625) / 0.99609375 AS jaccard_est
          FROM pm ORDER BY id1, id2"""
    })

  /** Plain-text source/sink roundtrip (source breadth): documents flattened
    * to delimited single-line records, written with the text sink, read
    * back with the text source, re-parsed and aggregated — the lowest-
    * common-denominator interchange format still everywhere in corpus
    * plumbing. The oracle recomputes the aggregate from the table. */
  val q140_text_roundtrip = Q(
    "q140_text_roundtrip",
    (s, dir) => {
      val base = s.conf.get("spark.local.dir", "/tmp") + "/graft_q140"
      val lines = t(s, dir, "documents").select(
        concat(col("doc_id").cast("string"), lit("|"),
          regexp_replace(col("text"), "[\\n\\r\\t]", " ")).as("value"))
      graft.sources.Writers.text(lines, base)
      graft.sources.Readers.text(s, base)
        .select(
          split(col("value"), "\\|", 2).getItem(0).cast("long").as("doc_id"),
          split(col("value"), "\\|", 2).getItem(1).as("payload"))
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(length(col("payload"))).cast("long").as("chars"))
        .orderBy("bucket")
    },
    Some("""SELECT CAST(doc_id % 10 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(len(regexp_replace(text, '[\n\r\t]', ' ', 'g'))) AS BIGINT) AS chars
            FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Incremental partition-selective refresh (materialized-view
    * maintenance): day-partitioned fingerprints (order-independent
    * bit_xor of row hashes) diff two event snapshots; only changed days
    * are recomputed, unchanged days stitch through from the previous
    * derived table — and the result must equal a full recompute of the
    * next snapshot, which is exactly what the oracle computes. */
  val q141_incremental_refresh = Q(
    "q141_incremental_refresh",
    (s, dir) => {
      import graft.operators.Incremental._
      val prev = t(s, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      // the "next" snapshot: value bumped on days where day-of-month ≡ 3 (mod 7)
      val next = prev.withColumn("value",
        when(dayofmonth(col("ts")) % 7 === 3, col("value") + lit(1.0))
          .otherwise(col("value")))
      val derive = (df: DataFrame) => df.groupBy(col("day"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(floor(col("value") * 100).cast("long")).cast("long").as("cents"))
      val hashCols = Seq("event_id", "user_id", "event_type", "value")
      val changed = changedPartitions(
        partitionFingerprints(prev, Seq("day"), hashCols),
        partitionFingerprints(next, Seq("day"), hashCols),
        Seq("day"))
      refresh(derive(prev), next, changed, Seq("day"), derive)
        .orderBy("day")
    },
    Some("""WITH nxt AS (
              SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                     CASE WHEN EXTRACT(day FROM ts) % 7 = 3
                          THEN value + 1.0 ELSE value END AS value
              FROM events)
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM nxt GROUP BY 1 ORDER BY 1"""))

  /** Distribution-drift monitoring (corpus-refresh guardrail): per event
    * type, total-variation distance between the month-halves' value
    * distributions over a fixed 16-bucket grid — reported as the EXACT
    * integer numerator Σ|n_a·N_b − n_b·N_a| (PSI/KL need libm logs; TVD
    * in integers is bit-reproducible anywhere). */
  val q142_drift_tvd = Q(
    "q142_drift_tvd",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("bucket", least(lit(15L), floor(col("value") / 10.0).cast("long")))
      val a = e.filter(dayofmonth(col("ts")) <= 15)
      val b = e.filter(dayofmonth(col("ts")) > 15)
      graft.operators.Drift.tvdNumerator(a, b, Seq("event_type"), "bucket")
        .orderBy("event_type")
    },
    Some("""WITH bucketed AS (
              SELECT event_type,
                     LEAST(15, CAST(FLOOR(value / 10.0) AS BIGINT)) AS bucket,
                     EXTRACT(day FROM ts) AS dom
              FROM events),
            ca AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS na
                   FROM bucketed WHERE dom <= 15 GROUP BY 1, 2),
            cb AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS nb
                   FROM bucketed WHERE dom > 15 GROUP BY 1, 2),
            j AS (SELECT COALESCE(ca.event_type, cb.event_type) AS event_type,
                         COALESCE(ca.na, 0) AS na, COALESCE(cb.nb, 0) AS nb
                  FROM ca FULL OUTER JOIN cb
                    ON ca.event_type = cb.event_type AND ca.bucket = cb.bucket),
            tot AS (SELECT event_type, CAST(SUM(na) AS BIGINT) AS n_a,
                           CAST(SUM(nb) AS BIGINT) AS n_b
                    FROM j GROUP BY 1)
            SELECT t.event_type, t.n_a, t.n_b,
                   CAST(CASE WHEN t.n_a = 0 OR t.n_b = 0
                             THEN GREATEST(t.n_a, t.n_b)
                             ELSE SUM(ABS(j.na * t.n_b - j.nb * t.n_a)) END
                        AS BIGINT) AS tvd_num
            FROM j JOIN tot t USING (event_type)
            GROUP BY 1, 2, 3 ORDER BY 1"""))

  /** Corpus-level source similarity matrix (mixing-decision input): pairwise
    * Jaccard between six sources' united shingle sets, BOTH ways — corpus
    * minhash signatures (map-side-partial mins: a 100 TB source folds to 16
    * longs) and the exact distinct-shingle intersection audit. The oracle
    * replays signatures value-exactly (tools.OracleSql XXH64 + universal
    * mins) and the exact sets independently. */
  val q143_source_similarity = Q(
    "q143_source_similarity",
    (s, dir) => {
      val srcs = (0 to 5).map(i => s"src$i")
      val d = t(s, dir, "documents").filter(col("source").isin(srcs: _*))
      graft.text.Dedup.corpusSimilarity(d, "source", "text", 16, 3)
        .orderBy("g1", "g2")
    },
    Some {
      import graft.tools.OracleSql._
      val base = s"SELECT source, ${normalizeSql("text")} AS norm FROM documents " +
        "WHERE source IN ('src0','src1','src2','src3','src4','src5')"
      val shingles =
        s"""SELECT source, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(len(toks) - 2),
                     p -> toks[p+1] || ' ' || toks[p+2] || ' ' || toks[p+3]) END) AS sh
            FROM (SELECT source, list_filter(string_split(norm, ' '), t -> len(t) > 0) AS toks
                  FROM ($base))"""
      val dist = s"SELECT DISTINCT source, sh FROM ($shingles)"
      val hashed = xxhash64Stages(dist, "sh", "hv", pfx = "__c")
      val coefs = graft.text.Dedup.minhashCoefs(16).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH hashed AS ($hashed),
            coefs(i, a, b) AS (VALUES $coefs),
            mins AS (SELECT source, i,
                            MIN((CAST(a AS BIGINT) * (((hv % 2147483647) + 2147483647) % 2147483647)
                                 + b) % 2147483647) AS h
                     FROM hashed CROSS JOIN coefs GROUP BY 1, 2),
            sigpairs AS (SELECT x.source AS g1, y.source AS g2,
                                CAST(SUM(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) AS BIGINT) AS matches
                         FROM mins x JOIN mins y ON x.i = y.i AND x.source < y.source
                         GROUP BY 1, 2),
            sets AS (SELECT DISTINCT source, sh FROM ($shingles)),
            sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM sets GROUP BY 1),
            inter AS (SELECT x.source AS g1, y.source AS g2, CAST(COUNT(*) AS BIGINT) AS inter
                      FROM sets x JOIN sets y ON x.sh = y.sh AND x.source < y.source
                      GROUP BY 1, 2)
          SELECT p.g1, p.g2, p.matches, p.matches / 16.0 AS jaccard_est,
                 COALESCE(i.inter, 0) AS inter,
                 s1.sz + s2.sz - COALESCE(i.inter, 0) AS uni,
                 COALESCE(i.inter, 0) / CAST(s1.sz + s2.sz - COALESCE(i.inter, 0) AS DOUBLE) AS jaccard
          FROM sigpairs p
          LEFT JOIN inter i ON i.g1 = p.g1 AND i.g2 = p.g2
          JOIN sizes s1 ON s1.source = p.g1
          JOIN sizes s2 ON s2.source = p.g2
          ORDER BY p.g1, p.g2"""
    })

  /** Streaming gap sessionization (native session_window) driven through a
    * real file stream under AvailableNow. session_window aggregation only
    * supports APPEND mode, which withholds any session the watermark has
    * not passed — so a per-user flush event 3 h past end-of-data is staged
    * as a second stream file: the advanced watermark (max+3h − 1h) emits
    * every real session, while the flush sessions themselves end beyond it
    * and are withheld — self-excluding. The emitted per-user session-count
    * distribution must equal the batch lag/cumsum sessionization (q58's
    * oracle, verbatim). */
  val q144_stream_sessions = Q(
    "q144_stream_sessions",
    (s, dir) => {
      // RAW file read for both the stream schema and the flush file (the
      // q96/q121 pattern): under a TIMESTAMP(NANOS) encoding the raw ts is
      // LongType (nanosAsLong) and BOTH stream files must carry the same
      // encoding — a normalized-batch flush file would mix micros
      // timestamps with a nanos base file under one schema
      val raw = s.read.parquet(s"$dir/events.parquet")
      val schema = raw.schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft_q144")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      // flush file: one event per user at max(ts)+3h, in the RAW encoding
      val flush = {
        val mx = raw.agg(max(col("ts"))).head().get(0)
        val shifted = schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => // nanos-as-long round
            lit(mx.asInstanceOf[Long] + 3L * 3600 * 1000 * 1000 * 1000)
          case tsType => lit(mx).cast(tsType) + expr("INTERVAL 3 HOUR")
        }
        raw.dropDuplicates("user_id").withColumn("ts", shifted)
      }
      val flushTmp = streamDir.resolve("__flush_build")
      flush.coalesce(1).write.parquet(flushTmp.toString)
      val part = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(flushTmp).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
      }
      java.nio.file.Files.move(part, streamDir.resolve("zz_flush.parquet"))
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val sess = graft.streaming.StreamOps.sessionize(
        stream, "ts", "30 minutes", Seq("user_id"), watermark = "1 hour")
      val qname = s"graft_q144_${streamRuns.incrementAndGet()}"
      val q = scopedStreamStart(s)(sess.writeStream
        .format("memory").queryName(qname).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      q.awaitTermination()
      s.table(qname)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_sessions"))
        .groupBy(col("n_sessions"))
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy("n_sessions")
    },
    Some("""WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
                     THEN 1 ELSE 0 END AS is_start
              FROM events),
            per_user AS (
              SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS n_sessions FROM marked GROUP BY user_id)
            SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM per_user GROUP BY 1 ORDER BY 1"""))

  /** DSIR-style data selection (Xie et al. 2023, integer-quantized): score
    * every document by hashed-unigram resemblance to the target slice
    * (sources 0–2) vs the whole corpus; log-ratios in floor-log₂ integer
    * space (libm-free), exact BIGINT end to end. The oracle replays
    * xxhash64 bucketing (tools.OracleSql), the bucket profile, and the
    * bin()-length log₂. */
  val q145_dsir_weights = Q(
    "q145_dsir_weights",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .dsirLogWeights(d, "doc_id", "text",
          isTarget = col("source").isin("src0", "src1", "src2"), buckets = 512)
        .select(col("doc_id").cast("long").as("doc_id"), col("dsir_weight"))
        .orderBy("doc_id")
    },
    Some {
      import graft.tools.OracleSql._
      val toks =
        s"""SELECT doc_id, source, tok FROM (
              SELECT doc_id, source, unnest(string_split(${normalizeSql("text")}, ' ')) AS tok
              FROM documents) WHERE len(tok) > 0"""
      // hash DISTINCT tokens only (the staged XXH64 expression dominates
      // oracle cost; the vocab is far smaller than the token stream), then
      // join the hashes back onto the stream — value-identical
      val hashedD = xxhash64Stages(s"SELECT DISTINCT tok FROM ($toks)", "tok", "hv", pfx = "__d")
      s"""WITH tk AS ($toks),
            hd AS ($hashedD),
            hashed AS (SELECT tk.doc_id, tk.source, hd.hv FROM tk JOIN hd USING (tok)),
            bucketed AS (SELECT doc_id, source,
                                ((hv % 512) + 512) % 512 AS b
                         FROM hashed),
            prof AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r,
                            CAST(SUM(CASE WHEN source IN ('src0','src1','src2')
                                     THEN 1 ELSE 0 END) AS BIGINT) AS t
                     FROM bucketed GROUP BY 1),
            w AS (SELECT b, CAST(length(bin(t + 1)) - 1 AS BIGINT)
                           - CAST(length(bin(r + 1)) - 1 AS BIGINT) AS wt
                  FROM prof)
          SELECT CAST(x.doc_id AS BIGINT) AS doc_id,
                 CAST(SUM(w.wt) AS BIGINT) AS dsir_weight
          FROM bucketed x JOIN w ON w.b = x.b
          GROUP BY 1 ORDER BY 1"""
    })

  /** Per-key time-bucketed rate limiting (abuse throttling / event-stream
    * hygiene): at most 3 events per user per hour, chosen deterministically
    * by (ts, event_id) order — capPerGroup over the time bucket. */
  val q146_rate_limit = Q(
    "q146_rate_limit",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("hour", date_trunc("hour", col("ts")))
      val kept = graft.text.Sampling
        .capPerGroup(e, Seq("user_id", "hour"), 3,
          orderBy = Seq(col("ts"), col("event_id")))
      kept.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_kept"))
        .join(
          e.groupBy(col("event_type"))
            .agg(count(lit(1)).cast("long").as("n_total")),
          Seq("event_type"))
        .select(col("event_type"), col("n_total"), col("n_kept"),
          (col("n_total") - col("n_kept")).cast("long").as("n_dropped"))
        .orderBy("event_type")
    },
    Some("""WITH ranked AS (
              SELECT event_type,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts, event_id) AS rn
              FROM events),
            k AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept
                  FROM ranked WHERE rn <= 3 GROUP BY 1),
            tt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total
                   FROM events GROUP BY 1)
            SELECT tt.event_type, tt.n_total, k.n_kept,
                   CAST(tt.n_total - k.n_kept AS BIGINT) AS n_dropped
            FROM tt JOIN k USING (event_type) ORDER BY 1"""))

  /** Keyed pseudonymization (PII-safe analytics joins): customer keys
    * replaced by salted SHA-256 digests on BOTH tables, then joined on the
    * pseudonym — referential structure preserved, raw keys never co-located
    * with payloads. SHA-256 is standardized byte-exact, so the oracle
    * replays the digests themselves (unlike engine-internal hashes). */
  val q147_pseudonymize = Q(
    "q147_pseudonymize",
    (s, dir) => {
      def pseudo(key: Column): Column =
        sha2(concat(key.cast("string"), lit("|pepper42")), 256)
      val cust = t(s, dir, "customer")
        .select(pseudo(col("c_custkey")).as("pid"), col("c_mktsegment").as("segment"))
      val ords = t(s, dir, "orders")
        .select(pseudo(col("o_custkey")).as("pid"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      cust.join(ords, Seq("pid"))
        .groupBy(col("segment"))
        .agg(
          count(lit(1)).cast("long").as("n_orders"),
          sum(col("cents")).cast("long").as("total_cents"),
          min(col("pid")).as("sample_pid"))
        .orderBy("segment")
    },
    Some("""WITH cust AS (SELECT sha256(CAST(c_custkey AS VARCHAR) || '|pepper42') AS pid,
                                 c_mktsegment AS segment FROM customer),
                 ords AS (SELECT sha256(CAST(o_custkey AS VARCHAR) || '|pepper42') AS pid,
                                 CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
            SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   MIN(pid) AS sample_pid
            FROM cust JOIN ords USING (pid)
            GROUP BY 1 ORDER BY 1"""))

  /** Document chunking into overlapping token windows (RAG / long-context
    * preprocessing): chunk size 8, overlap 3 — so chunk starts step by 5
    * and consecutive chunks share 3 tokens. Output keeps the chunk text
    * itself plus its (start, length) span, so the oracle replays the exact
    * slicing arithmetic relationally (range + list slice in DuckDB). */
  val q148_chunking = Q(
    "q148_chunking",
    (s, dir) => {
      graft.text.Chunking
        .chunkDocuments(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", chunkTokens = 8, overlapTokens = 3)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("chunk_id"), col("token_start"), col("n_tokens"), col("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> len(x) > 0) AS tk
              FROM documents WHERE doc_id < 300),
            starts AS (
              SELECT doc_id, tk,
                     unnest(range(0, greatest(len(tk) - 3 - 1, 0) + 1, 5)) AS st,
                     generate_subscripts(range(0, greatest(len(tk) - 3 - 1, 0) + 1, 5), 1) - 1 AS cid
              FROM toks WHERE len(tk) > 0)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(cid AS BIGINT) AS chunk_id,
                   CAST(st AS BIGINT) AS token_start,
                   CAST(len(tk[st+1 : st+8]) AS BIGINT) AS n_tokens,
                   array_to_string(tk[st+1 : st+8], ' ') AS chunk_text
            FROM starts ORDER BY doc_id, chunk_id"""))

  /** Semi-structured VARIANT ingestion (Spark 4 VariantType): each event
    * serialized to a JSON payload (with a nested object and a sometimes-
    * missing field), parsed into the binary variant encoding, and shredded
    * back into typed columns with `try_variant_get` path extraction —
    * missing paths yield NULL, not errors. The oracle recomputes the same
    * aggregate straight from the base columns, so any parse/extract loss
    * or type coercion drift in the variant round-trip hash-mismatches. */
  val q149_variant_shred = Q(
    "q149_variant_shred",
    (s, dir) => {
      import graft.functions.SemiStructured
      val payloads = t(s, dir, "events").select(
        to_json(struct(
          col("event_type").as("type"),
          struct(
            col("user_id").as("id"),
            (col("user_id") % 7).as("cohort")).as("user"),
          floor(col("value") * 100).cast("long").as("cents"),
          // present only for even event ids — exercises NULL-on-missing
          when(col("event_id") % 2 === 0, col("event_id")).as("trace"))).as("payload"))
      val shredded = SemiStructured.shredJson(payloads, "payload", Seq(
        SemiStructured.Field("etype", "$.type", "string"),
        SemiStructured.Field("cohort", "$.user.cohort", "bigint"),
        SemiStructured.Field("cents", "$.cents", "bigint"),
        SemiStructured.Field("trace", "$.trace", "bigint"),
        SemiStructured.Field("missing", "$.nope.deeper", "string")))
      shredded
        .groupBy(col("etype"), col("cohort"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("cents")).cast("long").as("total_cents"),
          count(col("trace")).cast("long").as("n_traced"),
          count(col("missing")).cast("long").as("n_missing_hits"))
        .orderBy("etype", "cohort")
    },
    Some("""SELECT event_type AS etype,
                   CAST(user_id % 7 AS BIGINT) AS cohort,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_traced,
                   CAST(0 AS BIGINT) AS n_missing_hits
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** URL canonicalization + first-fetch dedup (crawl-frontier op). URLs are
    * synthesized deterministically from doc_id with every messiness class
    * the canonicalizer handles: mixed-case scheme/host, default ports,
    * `www.` prefixes, trailing slashes, tracking params, unsorted params,
    * fragments. The oracle derives each CANONICAL form independently from
    * the doc_id arithmetic (never replaying the regex pipeline), so it
    * checks the end-to-end mapping, not the implementation. */
  val q150_url_dedup = Q(
    "q150_url_dedup",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"))
      val withUrl = d.withColumn("url", concat(
        when(col("doc_id") % 2 === 0, "HTTP").otherwise("https"),
        lit("://WWW.Site"), (col("doc_id") % 40).cast("string"), lit(".COM"),
        when(col("doc_id") % 4 < 2,
          when(col("doc_id") % 2 === 0, ":80").otherwise(":443")).otherwise(""),
        lit("/Page/"), (col("doc_id") % 25).cast("string"),
        when(col("doc_id") % 5 === 0, "/").otherwise(""),
        when(col("doc_id") % 3 === 0, "?utm_source=feed&b=2&a=1")
          .when(col("doc_id") % 3 === 1, "?a=1&b=2").otherwise(""),
        when(col("doc_id") % 7 === 0, "#frag").otherwise("")))
      // ONE canonicalize pass + ONE aggregation produces both the keeper
      // and the variant count (the ~10-regex chain must not run twice;
      // dedupByCanonicalUrl itself is row-level and spec-covered)
      withUrl
        .withColumn("canonical_url", graft.text.UrlOps.canonicalize(col("url")))
        .groupBy(col("canonical_url"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).cast("long").as("n_variants"))
        .filter(col("n_variants") >= 2)
        .select(col("canonical_url"), col("keeper"), col("n_variants"))
        .orderBy("canonical_url")
    },
    Some("""WITH canon AS (
              SELECT doc_id::BIGINT AS doc_id,
                (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
                || '://site' || CAST(doc_id % 40 AS VARCHAR) || '.com'
                || '/Page/' || CAST(doc_id % 25 AS VARCHAR)
                || (CASE WHEN doc_id % 3 IN (0, 1) THEN '?a=1&b=2' ELSE '' END)
                AS canonical_url
              FROM documents)
            SELECT canonical_url,
                   CAST(MIN(doc_id) AS BIGINT) AS keeper,
                   CAST(COUNT(*) AS BIGINT) AS n_variants
            FROM canon GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1"""))

  /** Inverted-index top-k TF-IDF retrieval: unlike q86 (BM25 scores for
    * every document), this is the RETRIEVAL operator — postings pruned to
    * the query terms immediately after the explode, fixed-point integer
    * idf (floor-log2, bit-stable), and the k best documents via
    * TakeOrderedAndProject (per-partition heaps; only k rows cross the
    * final exchange). 'dup' is the one rare term in the synthetic vocab
    * (df 25/500 vs ~380/500), so the idf spread is real. */
  val q151_tfidf_topk = Q(
    "q151_tfidf_topk",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      graft.text.Search.searchTopK(d, "doc_id", "text",
        terms = Seq("dup", "key", "fast"), k = 200, idfScale = 1024L)
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS id,
                list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
              FROM documents),
            posts AS (
              SELECT id, u.term AS term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM d, UNNEST(d.toks) AS u(term)
              WHERE u.term IN ('dup', 'key', 'fast') GROUP BY 1, 2),
            stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM posts GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d)
            SELECT id AS doc_id,
                   CAST(SUM(tf * (length(bin((n_docs * 1024) // df_t)) - 1)) AS BIGINT) AS score
            FROM posts JOIN stats USING (term), n
            GROUP BY id, n_docs
            ORDER BY score DESC, doc_id ASC LIMIT 200"""))

  /** Bigram collocation mining (word2phrase): integer PMI-ish score
    * (c12*T) div (c1*c2) in exact BIGINT, long-tail pruned at minCount
    * BEFORE the vocabulary joins, top-k fully tie-broken. */
  val q152_collocations = Q(
    "q152_collocations",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("text"))
      graft.text.Search.collocations(d, "text", minCount = 5L, k = 50)
    },
    Some("""WITH d AS (
              SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
              FROM documents),
            uni AS (
              SELECT u.w AS w, CAST(COUNT(*) AS BIGINT) AS c
              FROM d, UNNEST(d.toks) AS u(w) GROUP BY 1),
            bi AS (
              SELECT toks[i] AS w1, toks[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
              FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
              GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            total AS (SELECT CAST(SUM(c) AS BIGINT) AS t_tokens FROM uni)
            SELECT w1, w2, c12,
                   CAST((c12 * t_tokens) // (u1.c * u2.c) AS BIGINT) AS score
            FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w, total
            ORDER BY score DESC, c12 DESC, w1 ASC, w2 ASC LIMIT 50"""))

  /** Mergeable fixed-grid histogram quantiles: the corpus is split into two
    * shards (user parity), a histogram artifact built per shard, merged
    * (sum-combine — the persistable-artifact property, like the CM/HLL
    * rows), and p50/p90/p99 read back in pure BIGINT arithmetic. Grid
    * quantiles are DETERMINISTIC — unlike rank-error sketches, the merged
    * artifact hash-matches an oracle that never saw the sharding. */
  val q153_quantile_sketch = Q(
    "q153_quantile_sketch",
    (s, dir) => {
      import graft.operators.Sketches
      val e = t(s, dir, "events").select(
        col("event_type"),
        col("user_id").cast("long").as("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      val shardA = Sketches.histogramSketch(
        e.filter(col("user_id") % 2 === 0), Seq("event_type"), "cents", width = 500L)
      val shardB = Sketches.histogramSketch(
        e.filter(col("user_id") % 2 === 1), Seq("event_type"), "cents", width = 500L)
      val merged = Sketches.histogramMerge(shardA, shardB, Seq("event_type"))
      Sketches.histogramQuantiles(merged, Seq("event_type"), Seq(50, 90, 99), width = 500L)
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_type,
                CAST(FLOOR(value * 100) AS BIGINT) // 500 AS bucket
              FROM events),
            h AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
            c AS (
              SELECT event_type, bucket, cnt,
                CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum,
                CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
              FROM h)
            SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
                   CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket * 500 END) AS BIGINT) AS p50,
                   CAST(MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bucket * 500 END) AS BIGINT) AS p90,
                   CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket * 500 END) AS BIGINT) AS p99
            FROM c GROUP BY event_type ORDER BY event_type"""))

  /** Stream-stream interval join: even-id events join odd-id events of the
    * same user within ±30 minutes, both sides file streams with event-time
    * watermarks and the interval bound in the join condition (the state-
    * pruning shape — a keyed row leaves the state store once the other
    * side's watermark passes its interval). The watermark delay covers the
    * whole corpus, so the streamed append-mode result equals the batch
    * join exactly and the DuckDB batch replay is a true oracle. */
  val q154_stream_join = Q(
    "q154_stream_join",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q154")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
        .select(col("user_id").cast("long").as("user_id"), col("event_id"), col("ts"))
        // bounded key subset: the catalog-bench cost of a stream-stream
        // join is state-store volume × micro-batch machinery, and the
        // operator's semantics are fully exercised on a third of the keys
        .filter(col("user_id") < 50)
      val left = stream.filter(col("event_id") % 2 === 0).drop("event_id")
      val right = stream.filter(col("event_id") % 2 === 1).drop("event_id")
      val joined = graft.streaming.StreamOps.intervalJoin(
        left, right, Seq("user_id"), "ts", within = "30 minutes",
        watermark = "3650 days")
      val qname = s"graft_q154_${streamRuns.incrementAndGet()}"
      // a stream-stream join runs TWO keyed state stores and is the
      // heaviest case of the scopedStreamStart rationale (measured 2x
      // on 32 partitions before the scoping)
      val q = scopedStreamStart(s)(
        joined.writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
      q.awaitTermination()
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""SELECT CAST(l.user_id AS BIGINT) AS user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
            WHERE l.event_id % 2 = 0 AND r.event_id % 2 = 1 AND l.user_id < 50
            GROUP BY 1 ORDER BY 1"""))

  /** Containment (asymmetric-Jaccard) dedup: every fourth document gets a
    * 12-token snippet child — full containment (1.0) in the parent while
    * symmetric Jaccard is ~0.1, exactly the pair minhash LSH structurally
    * misses (q29's operator cannot see these; this one exists for them).
    * df-capped inverted-index intersection; the oracle replays shingling,
    * cap, and both direction ratios (exact-int / exact-int division —
    * IEEE-deterministic, no rounding needed). */
  val q155_containment = Q(
    "q155_containment",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val snippets = d.filter(col("doc_id") % 4 === 0).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ").as("text"))
      val corpus = d.unionByName(snippets)
      Dedup.containmentPairs(corpus, "doc_id", "text",
          shingleSize = 3, threshold = 0.9, dfCap = 1000)
        .select(col("id1"), col("id2"), col("c1_in_2"), col("c2_in_1"), col("containment"))
        .orderBy("id1", "id2")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, array_to_string(toks[1:12], ' ')
              FROM (SELECT doc_id::BIGINT AS doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
              WHERE doc_id % 4 = 0),
            sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM corpus)),
            ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            df AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 1000),
            cex AS (SELECT doc_id, s FROM ex JOIN df USING (s)),
            sz AS (SELECT doc_id, COUNT(*) AS n FROM cex GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS ic
              FROM cex a JOIN cex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id1, id2,
                   CAST(ic AS DOUBLE) / s1.n AS c1_in_2,
                   CAST(ic AS DOUBLE) / s2.n AS c2_in_1,
                   greatest(CAST(ic AS DOUBLE) / s1.n, CAST(ic AS DOUBLE) / s2.n) AS containment
            FROM inter
            JOIN sz s1 ON s1.doc_id = id1
            JOIN sz s2 ON s2.doc_id = id2
            WHERE greatest(CAST(ic AS DOUBLE) / s1.n, CAST(ic AS DOUBLE) / s2.n) >= 0.9
            ORDER BY id1, id2"""))

  /** Hard-negative mining for contrastive training: per anchor, the top-5
    * most-similar DIFFERENT-label vectors (label inequality inside the
    * join — a same-label near-dup can never become a negative). Oracle is
    * the exhaustive replay with the same fixed-fold cosine. */
  val q156_hard_negatives = Q(
    "q156_hard_negatives",
    (s, dir) => {
      val emb = t(s, dir, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"),
        col("label").cast("long").as("label"))
      Similarity.hardNegatives(emb.filter(col("vec_id") < 6), emb, k = 5)
        .select(
          col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("neighbor_label"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (
              SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c
              WHERE q.vec_id < 6 AND q.label <> c.label),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, neighbor_label,
                   ROUND(cos, 4) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Streaming near-dup ingest gate: the q88 incremental-dedup semantics
    * driven through a real file stream — corpus artifacts (hashed shingle
    * sets + LSH buckets) computed once batch-side, each micro-batch
    * screened by two stream-static joins with zero streaming state. Same
    * signatures and band hashing as batch, so the streamed result equals
    * q88 exactly and SHARES its oracle SQL verbatim. */
  val q157_stream_neardup = Q(
    "q157_stream_neardup",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // persisted-corpus artifacts: eager-checkpointed (feed the signature
      // pipeline AND every micro-batch's verify join; nothing stays cached)
      val exShingles = Dedup.hashedShingleSets(d, "doc_id", "text", 3).localCheckpoint(true)
      val exBuckets = Dedup.lshBucketsFromSignatures(
        Dedup.minhashSignaturesFromShingles(exShingles, "doc_id", 64), "doc_id", 16, 4)
        .localCheckpoint(true)
      val incoming = d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        array_join(
          slice(split(trim(col("text")), "\\s+"), lit(1),
            size(split(trim(col("text")), "\\s+")) - 1), " ").as("text"))
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q157")
      incoming.coalesce(1).write.mode("overwrite").parquet(s"$streamDir/batch")
      val schema = s.read.parquet(s"$streamDir/batch").schema
      val stream = s.readStream.schema(schema).parquet(s"$streamDir/batch")
      val gated = graft.streaming.StreamOps.nearDupIngestGate(
        stream, exShingles, exBuckets, "doc_id", "text",
        bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      val qname = s"graft_q157_${streamRuns.incrementAndGet()}"
      val q = scopedStreamStart(s)(gated.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      q.awaitTermination()
      // a pair caught by several bands appears once per band (the gate
      // cannot distinct without unbounded state); collapse batch-side
      s.table(qname)
        .groupBy(col("new_id"), col("existing_id"))
        .agg(round(max(col("jaccard")), 4).as("jaccard"))
        .orderBy("new_id", "existing_id")
    },
    // IDENTICAL semantics to the batch incremental dedup → shared oracle
    q88_dedup_incremental.oracle)

  /** Hybrid retrieval via reciprocal-rank fusion: the lexical ranking
    * (integer-idf TF-IDF, q151's operator) fused with a vector ranking
    * (cosine to the vec_id=0 anchor; embeddings and documents share the
    * id space) by RRF — exact integer ranks, fixed two-term IEEE score,
    * bit-replayable. */
  val q158_hybrid_rrf = Q(
    "q158_hybrid_rrf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val lex = graft.text.Search.searchTopK(d, "doc_id", "text",
        terms = Seq("dup", "key", "fast"), k = 100, idfScale = 1024L)
      val lexRank = lex.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      val emb = t(s, dir, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val vecRank = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 0), emb, k = 100)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.text.Search.rrfFuse(lexRank.select(col("doc_id"), col("rank")), vecRank,
          "doc_id", kConst = 60, topK = 30)
        .select(col("doc_id"),
          col("rank_a").cast("long").as("rank_a"),
          col("rank_b").cast("long").as("rank_b"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS id,
                list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
              FROM documents),
            posts AS (
              SELECT id, u.term AS term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM d, UNNEST(d.toks) AS u(term)
              WHERE u.term IN ('dup', 'key', 'fast') GROUP BY 1, 2),
            stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM posts GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
            scored AS (
              SELECT id, CAST(SUM(tf * (length(bin((n_docs * 1024) // df_t)) - 1)) AS BIGINT) AS score
              FROM posts JOIN stats USING (term), n GROUP BY id, n_docs),
            lex AS (
              SELECT id AS doc_id, rank_a FROM (
                SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS BIGINT) AS rank_a
                FROM scored) WHERE rank_a <= 100),
            e AS (SELECT vec_id::BIGINT AS vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
            vecscored AS (
              SELECT c.vec_id AS doc_id,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c WHERE q.vec_id = 0 AND c.vec_id <> 0),
            vec AS (
              SELECT doc_id, rank_b FROM (
                SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS rank_b
                FROM vecscored) WHERE rank_b <= 100),
            fused AS (
              SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, rank_a, rank_b,
                COALESCE(1.0 / (60 + rank_a), 0.0) + COALESCE(1.0 / (60 + rank_b), 0.0) AS rrf
              FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
            SELECT doc_id, rank_a, rank_b, rrf
            FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 30"""))

  /** Token-budget corpus fill: keep the longest documents (chars-desc
    * priority, id tiebreak) until 20k whitespace tokens are spent — the
    * greedy-prefix selection of a pretraining mix. One window cumsum in
    * BIGINT; the oracle replays it. */
  val q159_budget_fill = Q(
    "q159_budget_fill",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"),
        TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
      graft.text.Sampling.fillTokenBudget(d, "toks", budget = 20000L,
          orderBy = Seq(col("n_chars").desc, col("doc_id").asc))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("toks")).cast("long").as("tokens"),
          min(col("n_chars")).cast("long").as("min_chars"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS doc_id, lang, n_chars::BIGINT AS n_chars,
                CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS toks
              FROM documents),
            cum AS (
              SELECT *, SUM(toks) OVER (ORDER BY n_chars DESC, doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
              FROM d)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(toks) AS BIGINT) AS tokens,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars
            FROM cum WHERE c <= 20000 GROUP BY lang ORDER BY lang"""))

  /** HTML boilerplate stripping: documents wrapped in deterministic HTML
    * (style/script blocks with `<`-bearing code, attributes, entities,
    * `&nbsp;` separators on every 7th doc, an entity-laden div on every
    * 3rd), stripped by the chained-regex operator. The oracle derives each
    * CLEANED string independently from the raw text (never replaying the
    * regexes) and compares md5 — an end-to-end mapping check. */
  val q160_html_strip = Q(
    "q160_html_strip",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val html = d.withColumn("html", concat(
        lit("<html><head><style>p { color: red; }</style></head><body>"),
        lit("<script type=\"text/javascript\">var x = 1 < 2;</script>"),
        lit("<p class=\"main\">"),
        when(col("doc_id") % 7 === 0, regexp_replace(col("text"), " ", "&nbsp;"))
          .otherwise(col("text")),
        lit("</p>"),
        when(col("doc_id") % 3 === 0,
          lit("<div>&quot;quoted&quot; &amp;amp; more</div>")).otherwise(lit("")),
        lit("</body></html>")))
      html
        .withColumn("clean", TextFunctions.stripHtml(col("html")))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("clean_len"))
        .orderBy("doc_id")
    },
    Some("""WITH expected AS (
              SELECT doc_id::BIGINT AS doc_id,
                trim(regexp_replace(text, '\s+', ' ', 'g'))
                  || (CASE WHEN doc_id % 3 = 0 THEN ' "quoted" &amp; more' ELSE '' END)
                  AS clean
              FROM documents)
            SELECT doc_id, md5(clean) AS clean_md5,
                   CAST(length(clean) AS BIGINT) AS clean_len
            FROM expected ORDER BY doc_id"""))

  /** Link-graph extraction from HTML: hrefs pulled from constructed pages
    * (mixed quote styles, messy case/www/ports/tracking params),
    * canonicalized, reduced to host-level in-degree + distinct-URL counts
    * — the crawl-frontier statistics pass. The oracle derives hosts and
    * canonical urls independently from the doc_id arithmetic. */
  val q161_link_extract = Q(
    "q161_link_extract",
    (s, dir) => {
      import graft.text.UrlOps
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val html = d.select(col("doc_id"), concat(
        lit("<p>"), col("text"), lit("</p><a href=\"HTTP://WWW.Site"),
        (col("doc_id") % 40).cast("string"),
        lit(".COM/Page/"), (col("doc_id") % 25).cast("string"),
        lit("?utm_source=x\">link</a>"),
        when(col("doc_id") % 2 === 0, concat(
          lit("<a class='x' href='https://Other"), (col("doc_id") % 10).cast("string"),
          lit(".org/a/'>o</a>"))).otherwise(lit(""))).as("html"))
      // materialize the extracted array, THEN explode(array_compact(...)):
      // the explode-trap rule — pushdown must not inline the regex twice
      html
        .select(col("doc_id"), UrlOps.extractLinks(col("html")).as("links"))
        .select(explode(array_compact(col("links"))).as("url"))
        .select(UrlOps.canonicalize(col("url")).as("canon"))
        .select(UrlOps.host(col("canon")).as("host"), col("canon"))
        .groupBy(col("host"))
        .agg(
          count(lit(1)).cast("long").as("n_links"),
          count_distinct(col("canon")).cast("long").as("n_urls"))
        .orderBy("host")
    },
    Some("""WITH links AS (
              SELECT 'site' || CAST(doc_id % 40 AS VARCHAR) || '.com' AS host,
                     'http://site' || CAST(doc_id % 40 AS VARCHAR) || '.com/Page/'
                       || CAST(doc_id % 25 AS VARCHAR) AS canon
              FROM documents
              UNION ALL
              SELECT 'other' || CAST(doc_id % 10 AS VARCHAR) || '.org',
                     'https://other' || CAST(doc_id % 10 AS VARCHAR) || '.org/a'
              FROM documents WHERE doc_id % 2 = 0)
            SELECT host, CAST(COUNT(*) AS BIGINT) AS n_links,
                   CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_urls
            FROM links GROUP BY 1 ORDER BY 1"""))

  /** Robust trimmed aggregation: per event type, the 10%-trimmed mean of
    * integer cents (drop floor(n/10) rows from each end by value) — the
    * outlier-immune counterpart of q99's MAD detector. Exact BIGINT
    * boundary arithmetic; mean is one exact-int / exact-int division. */
  val q162_trimmed_agg = Q(
    "q162_trimmed_agg",
    (s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_type"), col("event_id").cast("long").as("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      graft.operators.Aggregation.trimmedStats(
          e, Seq("event_type"), "cents", trimPercent = 10, tieBreak = col("event_id"))
        .select(col("event_type"), col("n"), col("n_kept"),
          col("trimmed_sum"), col("kept_min"), col("kept_max"), col("trimmed_mean"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_type, event_id::BIGINT AS event_id,
                     CAST(FLOOR(value * 100) AS BIGINT) AS cents
              FROM events),
            ranked AS (
              SELECT event_type, cents,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents ASC, event_id ASC) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM e),
            kept AS (
              SELECT * FROM ranked
              WHERE rn > (n * 10) // 100 AND rn <= n - (n * 10) // 100)
            SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(cents) AS BIGINT) AS trimmed_sum,
                   CAST(MIN(cents) AS BIGINT) AS kept_min,
                   CAST(MAX(cents) AS BIGINT) AS kept_max,
                   CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS trimmed_mean
            FROM kept GROUP BY event_type ORDER BY event_type"""))

  /** k-anonymity release gate: quasi-identifier groups (age bucket ×
    * region × event type) below k=5 are suppressed; the audit reports
    * group counts and l-diversity of a sensitive column per event type —
    * the release-readiness numbers a data steward actually reads. Pure
    * integer counting on both engines. */
  val q163_k_anonymity = Q(
    "q163_k_anonymity",
    (s, dir) => {
      import graft.operators.Privacy
      val e = t(s, dir, "events").select(
        col("event_type"),
        (col("user_id") % 23).cast("long").as("age_bucket"),
        (col("user_id") % 7).cast("long").as("region"),
        (floor(col("value")).cast("long") % 10).as("sensitive"))
      val quasi = Seq("event_type", "age_bucket", "region")
      val report = Privacy.kAnonymityReport(e, quasi, "sensitive", k = 5L)
      val keptRows = Privacy.kAnonymitySuppress(e, quasi, k = 5L)
        .groupBy(col("event_type")).agg(count(lit(1)).cast("long").as("rows_kept"))
      report
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n_groups"),
          sum(when(col("suppressed"), 1L).otherwise(0L)).cast("long").as("n_suppressed"),
          min(when(!col("suppressed"), col("l_diversity"))).cast("long").as("min_l_kept"))
        // LEFT join: an event_type whose every quasi-group is suppressed has
        // no kept rows at all — it must still report, with rows_kept = 0
        .join(keptRows, Seq("event_type"), "left")
        .withColumn("rows_kept", coalesce(col("rows_kept"), lit(0L)))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_type,
                     CAST(user_id % 23 AS BIGINT) AS age_bucket,
                     CAST(user_id % 7 AS BIGINT) AS region,
                     CAST(FLOOR(value) AS BIGINT) % 10 AS sensitive
              FROM events),
            g AS (
              SELECT event_type, age_bucket, region,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l
              FROM e GROUP BY 1, 2, 3)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
                   CAST(MIN(CASE WHEN n >= 5 THEN l END) AS BIGINT) AS min_l_kept,
                   CAST(SUM(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT) AS rows_kept
            FROM g GROUP BY event_type ORDER BY event_type"""))

  /** Ingest-volume anomaly monitor: per event type and day, flag days
    * whose count drops below half the trailing-7-day EXACT median. A
    * synthetic outage (80% of events dropped on days ≡ 3 mod 11) gives
    * the detector real positives; cold-start days (< 3 prior) never
    * flag. The trailing median is a sorted bounded list — BIGINT
    * arithmetic both engines replay exactly. */
  val q164_volume_anomaly = Q(
    "q164_volume_anomaly",
    (s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_type"), col("event_id").cast("long").as("event_id"),
        unix_date(to_date(col("ts"))).cast("long").as("day"))
      val filt = base.filter(!(col("day") % 11 === 3 && col("event_id") % 5 =!= 0))
      val counts = filt.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      graft.operators.Outliers.volumeAnomalies(
          counts, Seq("event_type"), "day", "cnt",
          windowDays = 7, dropNum = 1, dropDen = 2, minPrior = 3)
        .select(col("event_type"), col("day"), col("cnt"),
          col("n_prior"), col("trailing_median"), col("is_anomaly"))
        .orderBy("event_type", "day")
    },
    Some("""WITH base AS (
              SELECT event_type, event_id::BIGINT AS event_id,
                     CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
              FROM events),
            filt AS (SELECT * FROM base WHERE NOT (day % 11 = 3 AND event_id % 5 <> 0)),
            c AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt FROM filt GROUP BY 1, 2),
            h AS (
              SELECT event_type, day, cnt,
                -- an empty frame yields NULL in DuckDB, not [] — coalesce
                list_sort(COALESCE(list(cnt) OVER (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), CAST([] AS BIGINT[]))) AS hist
              FROM c)
            SELECT event_type, day, cnt,
                   CAST(len(hist) AS BIGINT) AS n_prior,
                   CAST(CASE WHEN len(hist) > 0 THEN hist[(len(hist) + 1) // 2] END AS BIGINT) AS trailing_median,
                   (len(hist) >= 3 AND cnt * 2 < hist[(len(hist) + 1) // 2]) AS is_anomaly
            FROM h ORDER BY event_type, day"""))

  /** Embedding-corpus QA audit before ANN indexing: per label, counts,
    * dimension drift bounds, zero vectors (synthesized on every 97th id —
    * the detector must have positives), and integer-quantized squared-norm
    * stats (BIGINT sums — row-order-proof, unlike double sums). */
  val q165_embedding_audit = Q(
    "q165_embedding_audit",
    (s, dir) => {
      val emb = t(s, dir, "embeddings").select(
        col("label").cast("long").as("label"),
        when(col("vec_id") % 97 === 0,
          transform(col("embedding"), _ => lit(0.0)))
          .otherwise(transform(col("embedding"), x => x.cast("double")))
          .as("embedding"))
      Similarity.embeddingAudit(emb, Seq("label"), "embedding", scale = 1000L)
        .orderBy("label")
    },
    Some("""WITH e AS (
              SELECT label::BIGINT AS label,
                CASE WHEN vec_id % 97 = 0
                     THEN list_transform(embedding, x -> CAST(0.0 AS DOUBLE))
                     ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS v
              FROM embeddings),
            q AS (
              SELECT label, CAST(len(v) AS BIGINT) AS dim,
                     CAST(FLOOR(list_dot_product(v, v) * 1000) AS BIGINT) AS qn
              FROM e)
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   MIN(dim) AS dim_min, MAX(dim) AS dim_max,
                   CAST(SUM(CASE WHEN qn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
                   CAST(SUM(qn) AS BIGINT) AS sum_q_normsq,
                   MIN(qn) AS min_q_normsq, MAX(qn) AS max_q_normsq
            FROM q GROUP BY label ORDER BY label"""))

  /** Code-switching detection: every third document gets a French-stopword
    * sentence appended — invisible to the document-level argmax (q30,
    * English dominates globally) but caught by segment-level language ID
    * over 12-token windows. The oracle replays the same per-segment
    * stopword fold from the same profiles, generated like q30's. */
  val q166_code_switch = Q(
    "q166_code_switch",
    (s, dir) => {
      val french = " le la de et les des un est dans que le la"
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, french).otherwise("")).as("text2"))
      val stats = TextFunctions.codeSwitchStats(d, "doc_id", "text2", segTokens = 12)
      stats
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("is_code_switched"), 1L).otherwise(0L)).cast("long").as("n_switched"),
          sum(col("n_segments")).cast("long").as("n_segments"))
        .orderBy("source")
    },
    Some {
      val profiles = TextFunctions.languageProfiles.toSeq.sortBy(_._1)
      val scoreDefs = profiles.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"len(list_intersect(sd, [$list])) AS s_$lang"
      }.mkString(", ")
      val fold = profiles.foldLeft(("'und'", "0")) { case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN s_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN s_$lang > $bs THEN s_$lang ELSE $bs END)")
      }._1
      s"""WITH d AS (
            SELECT doc_id::BIGINT AS doc_id, source,
              text || (CASE WHEN doc_id % 3 = 0 THEN ' le la de et les des un est dans que le la' ELSE '' END) AS text2
            FROM documents),
          t AS (
            SELECT doc_id, source,
              list_filter(regexp_split_to_array(trim(lower(text2)), '\\s+'), x -> len(x) > 0) AS toks
            FROM d),
          seg AS (
            SELECT doc_id, source, list_distinct(toks[(i*12+1):(i*12+12)]) AS sd
            FROM t, UNNEST(range((len(toks) + 11) // 12)) AS u(i)),
          lang AS (SELECT doc_id, source, $fold AS lang FROM (SELECT doc_id, source, $scoreDefs FROM seg)),
          agg AS (
            SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_seg,
              COUNT(DISTINCT CASE WHEN lang <> 'und' THEN lang END) AS n_langs
            FROM lang GROUP BY 1, 2)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_switched,
                 CAST(SUM(n_seg) AS BIGINT) AS n_segments
          FROM agg GROUP BY 1 ORDER BY 1"""
    })

  /** Chat-template flattening: synthesized 3-turn JSON conversations
    * (user/assistant/user over token slices) rendered to training text
    * with turn stats — the fine-tuning prep step before sequence packing.
    * The oracle derives the EXPECTED rendered strings independently from
    * the token arithmetic (never parsing JSON). */
  val q167_chat_flatten = Q(
    "q167_chat_flatten",
    (s, dir) => {
      import graft.functions.SemiStructured
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 8), " ")
      val convo = d.withColumn("convo_json", to_json(array(
        struct(lit("user").as("role"), seg(1).as("content")),
        struct(lit("assistant").as("role"), seg(9).as("content")),
        struct(lit("user").as("role"), seg(17).as("content")))))
      SemiStructured.flattenChat(convo, "convo_json")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(length(col("chat_text"))).cast("long").as("chars"),
          sum(col("n_turns")).cast("long").as("turns"),
          sum(col("n_user_turns")).cast("long").as("user_turns"),
          count_distinct(col("chat_text")).cast("long").as("distinct_chats"))
        .orderBy("source")
    },
    Some("""WITH d AS (
              SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents),
            r AS (
              SELECT source,
                -- a slice starting past the end is NULL in DuckDB (Spark:
                -- empty) — coalesce each segment to ''
                '### user:' || chr(10) || COALESCE(array_to_string(toks[1:8], ' '), '')
                || chr(10) || '### assistant:' || chr(10) || COALESCE(array_to_string(toks[9:16], ' '), '')
                || chr(10) || '### user:' || chr(10) || COALESCE(array_to_string(toks[17:24], ' '), '')
                AS chat_text
              FROM d)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(chat_text)) AS BIGINT) AS chars,
                   CAST(COUNT(*) * 3 AS BIGINT) AS turns,
                   CAST(COUNT(*) * 2 AS BIGINT) AS user_turns,
                   CAST(COUNT(DISTINCT chat_text) AS BIGINT) AS distinct_chats
            FROM r GROUP BY 1 ORDER BY 1"""))

  /** k-core extraction (graph breadth): the 4-core of the co-supplier
    * graph (suppliers sharing >= 5 orders) by iterative peeling — the
    * dense-community extraction a spam-ring or co-citation audit runs.
    * The peeling fixed point is unique, so Spark (loop-until-stable with
    * per-round checkpoints) and the oracle (a generated 16-stage peel
    * chain — extra stages past convergence are no-ops) agree exactly;
    * Spark THROWS rather than return a non-fixed-point if 16 rounds ever
    * stop sufficing. */
  val q168_kcore = Q(
    "q168_kcore",
    (s, dir) => {
      val os = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      val a = os.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = os.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val edges = a
        .join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 5)
        .select(col("sa").as("src"), col("sb").as("dst"))
      graft.operators.Graph.kCore(edges, k = 4, maxRounds = 16)
        .select(col("node").cast("long").as("node"), col("deg").cast("long").as("deg"))
        .orderBy("node")
    },
    Some {
      // each round references the previous one several times — MATERIALIZED
      // keeps DuckDB's CTE inlining from expanding the chain exponentially
      val rounds = (1 to 16).map { i =>
        val prev = s"r${i - 1}"
        s"""k$i AS MATERIALIZED (
                    SELECT node FROM (SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev)
                    GROUP BY node HAVING COUNT(*) >= 4),
            r$i AS MATERIALIZED (
                    SELECT u, v FROM $prev
                    WHERE u IN (SELECT node FROM k$i) AND v IN (SELECT node FROM k$i))"""
      }.mkString(",\n          ")
      s"""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
          e0 AS (SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS w
                 FROM os a JOIN os b
                   ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
                 GROUP BY 1, 2),
          r0 AS MATERIALIZED (SELECT sa AS u, sb AS v FROM e0 WHERE w >= 5),
          $rounds
          SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT u AS node FROM r16 UNION ALL SELECT v FROM r16)
          GROUP BY node ORDER BY node"""
    })

  /** Deterministic random walks (graph breadth / node2vec-style positive
    * sampling): 4 hops from every node of the order-derived customer
    * graph, next hop = integer-mix argmin over out-neighbors — the PRNG
    * replaced by arithmetic both engines compute bit-identically. Output
    * is per-node visit counts (start position included); the oracle
    * replays all 4 steps as generated CTE stages with a (mix, dst)
    * row_number argmin. */
  val q169_walks = Q(
    "q169_walks",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val edges = o.select(
        col("o_custkey").cast("long").as("src"),
        (col("o_orderkey") % 1500).cast("long").as("dst")).distinct()
      graft.operators.Graph.deterministicWalkVisits(edges, steps = 4)
        .select(col("node").cast("long").as("node"), col("visits").cast("long").as("visits"))
        .orderBy("node")
    },
    Some {
      val steps = (1 to 4).map { i =>
        val prev = s"f${i - 1}"
        s"""f$i AS (
              SELECT start, cand AS cur FROM (
                SELECT f.start, e.dst AS cand,
                       ((f.cur % 2147483647) * 1048573 + $i * 8191
                        + (e.dst % 2147483647) * 524287) % 2147483647 AS mix,
                       ROW_NUMBER() OVER (PARTITION BY f.start
                                          ORDER BY ((f.cur % 2147483647) * 1048573 + $i * 8191
                                                    + (e.dst % 2147483647) * 524287) % 2147483647,
                                                   e.dst) AS rn
                FROM $prev f JOIN e ON f.cur = e.src)
              WHERE rn = 1)"""
      }.mkString(",\n          ")
      s"""WITH e AS (
            SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                   CAST(o_orderkey % 1500 AS BIGINT) AS dst
            FROM orders),
          nodes AS (SELECT DISTINCT node
                    FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          f0 AS (SELECT node AS start, node AS cur FROM nodes),
          $steps,
          vis AS (SELECT cur FROM f0 UNION ALL SELECT cur FROM f1 UNION ALL
                  SELECT cur FROM f2 UNION ALL SELECT cur FROM f3 UNION ALL
                  SELECT cur FROM f4)
          SELECT CAST(cur AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS visits
          FROM vis GROUP BY 1 ORDER BY 1"""
    })

  /** Preference-cycle audit (RLHF data QA): pairwise preference edges
    * (the earlier line in an order "beats" the next, items = part buckets)
    * checked for intransitive triads — a directed 3-cycle means the
    * judgments cannot come from any consistent ranking. Cycles are counted
    * once each via [[graft.operators.Graph.directedTriangleCycles]]'s
    * (degree, id)-oriented wedge enumeration — hub-safe: a judge/item
    * compared against everything expands O(√m)-bounded oriented wedges,
    * not in-deg×out-deg candidates. The oracle runs the naive 3-way join,
    * which only survives because the oracle's graph is small. */
  val q170_pref_cycles = Q(
    "q170_pref_cycles",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 300).cast("long").as("item"))
      val a = li.select(
        col("l_orderkey").as("o2"), col("l_linenumber").as("nxt"),
        col("item").as("w_item"))
      val edges = li
        .join(a, col("l_orderkey") === col("o2") && col("nxt") === col("l_linenumber") + 1)
        .filter(col("item") =!= col("w_item"))
        .select(col("item").as("src"), col("w_item").as("dst"))
      edges.distinct()
        .agg(count(lit(1)).cast("long").as("n_edges"))
        .crossJoin(graft.operators.Graph.directedTriangleCycles(edges))
    },
    Some("""WITH li AS (SELECT l_orderkey, l_linenumber,
                               CAST(l_partkey % 300 AS BIGINT) AS item
                        FROM lineitem),
            e AS (SELECT DISTINCT a.item AS src, b.item AS dst
                  FROM li a JOIN li b
                    ON a.l_orderkey = b.l_orderkey
                   AND b.l_linenumber = a.l_linenumber + 1
                  WHERE a.item != b.item)
            SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
                   CAST((SELECT COUNT(*)
                         FROM e e1
                         JOIN e e2 ON e2.src = e1.dst
                                  AND e1.src < e1.dst AND e1.src < e2.dst
                         JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src)
                        AS BIGINT) AS cycles"""))

  /** First-order event transition matrix (clickstream analytics): per
    * user, consecutive event pairs under a TOTAL order (ts, event_id —
    * duplicate timestamps exist, so the tie column is what makes the pair
    * multiset deterministic), aggregated to counts + fixed-point
    * transition probabilities. One user-keyed window shuffle; the per-prev
    * totals re-aggregate the pair counts, never the raw events. */
  val q171_transitions = Q(
    "q171_transitions",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.transitionMatrix(
          t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
        .select(
          col("prev_type"), col("cur_type"),
          col("n").cast("long").as("n"),
          col("prob_ppm").cast("long").as("prob_ppm"))
        .orderBy("prev_type", "cur_type")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events),
            p AS (SELECT prev AS prev_type, event_type AS cur_type,
                         COUNT(*) AS n
                  FROM ev WHERE prev IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, cur_type, CAST(n AS BIGINT) AS n,
                   CAST((1000000 * n) // SUM(n) OVER (PARTITION BY prev_type)
                        AS BIGINT) AS prob_ppm
            FROM p ORDER BY 1, 2"""))

  /** Seasonal-naive ingest forecast monitor: per event type, daily counts
    * over a DENSE date spine (gap days score as 0 — a silent feed is
    * maximal error, not a missing row), forecast(d) = actual(d-7), scored
    * as integer MAE ppm. The raw volume reduces to (key, day) counts
    * before any window runs — the spine/lag/scoring plan never touches
    * event-sized data. */
  val q172_seasonal_naive = Q(
    "q172_seasonal_naive",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.seasonalNaiveError(t(s, dir, "events"), "event_type", "ts", period = 7)
        .select(
          col("key").as("event_type"),
          col("days_scored").cast("long").as("days_scored"),
          col("total_actual").cast("long").as("total_actual"),
          col("total_abs_err").cast("long").as("total_abs_err"),
          col("mae_ppm").cast("long").as("mae_ppm"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type AS key, CAST(ts AS DATE) AS day, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            spine AS (
              SELECT k.key, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY))::DATE AS day
              FROM (SELECT DISTINCT key FROM daily) k, bounds b),
            dense AS (
              SELECT s.key, s.day, COALESCE(d.n, 0) AS actual
              FROM spine s LEFT JOIN daily d ON s.key = d.key AND s.day = d.day),
            scored AS (
              SELECT key, actual,
                     LAG(actual, 7) OVER (PARTITION BY key ORDER BY day) AS fc
              FROM dense)
            SELECT key AS event_type,
                   CAST(COUNT(*) AS BIGINT) AS days_scored,
                   CAST(SUM(actual) AS BIGINT) AS total_actual,
                   CAST(SUM(ABS(actual - fc)) AS BIGINT) AS total_abs_err,
                   CAST(CASE WHEN SUM(actual) > 0
                             THEN (1000000 * SUM(ABS(actual - fc))) // SUM(actual)
                        END AS BIGINT) AS mae_ppm
            FROM scored WHERE fc IS NOT NULL
            GROUP BY 1 ORDER BY 1"""))

  /** Corpus n-gram novelty (boilerplate/template detector): per doc, the
    * fraction of its distinct 3-grams appearing in NO other document, as
    * integer ppm. Spark counts document frequency over 8-byte hashed grams
    * with a COUNT window on the gram key (one shuffle, no join); the
    * oracle replays with raw gram STRINGS as keys — identical grouping
    * absent a 64-bit collision (the q87 convention). Per-source rollup
    * keeps the output compact while pinning every doc's score (sums over
    * exact integers). */
  val q173_novelty = Q(
    "q173_novelty",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"),
        col("source"), col("text"))
      Dedup.corpusNoveltyScores(d, "doc_id", "text", shingleSize = 3)
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("total_grams")).cast("long").as("grams"),
          sum(col("unique_grams")).cast("long").as("unique_grams"),
          sum(col("novelty_ppm")).cast("long").as("ppm_sum"),
          min(col("novelty_ppm")).cast("long").as("ppm_min"))
        .orderBy("source")
    },
    Some {
      import graft.tools.OracleSql._
      s"""WITH d AS (
            SELECT doc_id::BIGINT AS doc_id, source,
                   list_filter(regexp_split_to_array(${normalizeSql("text")}, '\\s+'),
                               x -> len(x) > 0) AS toks
            FROM documents),
          sh AS (
            SELECT doc_id, source,
                   list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 1),
                                         i -> array_to_string(toks[i:i+2], ' ')) END) AS grams
            FROM d),
          ex AS (SELECT doc_id, source, unnest(grams) AS g FROM sh),
          dfc AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY 1),
          scored AS (
            SELECT e.doc_id, e.source, COUNT(*) AS total_grams,
                   SUM(CASE WHEN c.df = 1 THEN 1 ELSE 0 END) AS unique_grams
            FROM ex e JOIN dfc c USING (g) GROUP BY 1, 2)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(total_grams) AS BIGINT) AS grams,
                 CAST(SUM(unique_grams) AS BIGINT) AS unique_grams,
                 CAST(SUM((1000000 * unique_grams) // total_grams) AS BIGINT) AS ppm_sum,
                 CAST(MIN((1000000 * unique_grams) // total_grams) AS BIGINT) AS ppm_min
          FROM scored GROUP BY 1 ORDER BY 1"""
    })

  /** Two-stage domain quality gate (RefinedWeb/CCNet shape): domains are
    * admitted on aggregate evidence (≥ 10 docs AND 2×median(n_chars) ≥
    * 500), then docs within admitted domains must clear their own
    * domain's median. med2 = 2×median keeps the even-count interpolated
    * median integer-exact on both engines. */
  val q174_domain_gate = Q(
    "q174_domain_gate",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling.domainMedianGate(d, "source", "n_chars", minDocs = 10L, minMedian2 = 500L)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_kept"),
          max(col("n_docs")).cast("long").as("n_docs"),
          max(col("med2")).cast("long").as("med2"),
          sum(col("n_chars")).cast("long").as("kept_chars"))
        .orderBy("source")
    },
    Some("""WITH stats AS (
              SELECT source, COUNT(*) AS n_docs,
                     CAST(2 * median(n_chars) AS BIGINT) AS med2
              FROM documents GROUP BY 1),
            ok AS (SELECT * FROM stats WHERE n_docs >= 10 AND med2 >= 500)
            SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(MAX(o.n_docs) AS BIGINT) AS n_docs,
                   CAST(MAX(o.med2) AS BIGINT) AS med2,
                   CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
            FROM documents d JOIN ok o USING (source)
            WHERE 2 * d.n_chars >= o.med2
            GROUP BY 1 ORDER BY 1"""))

  /** MMR diversified re-ranking (RAG retrieval QA): for 4 query vectors,
    * greedily select 4 of the top-8 cosine candidates maximizing
    * 7·rel − 3·max-sim-to-selected — the diversity re-rank that stops a
    * result list being five paraphrases of one passage. The greedy
    * trajectory (which id at which round) is the contract; the oracle
    * replays all 4 rounds as generated MATERIALIZED CTE stages over the
    * same two-term double expression (never a re-associated sum — q124's
    * ulp-exactness argument). */
  val q175_mmr = Q(
    "q175_mmr",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      Similarity.mmrSelect(emb.filter(col("vec_id") < 4), emb, topN = 8, k = 4)
        .select(
          col("query_id").cast("long").as("query_id"),
          col("round").cast("long").as("sel_round"),
          col("neighbor_id").cast("long").as("neighbor_id"),
          round(col("relevance"), 4).as("relevance"),
          round(col("score"), 4).as("score"))
        .orderBy("query_id", "sel_round")
    },
    Some {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a.v, $b.v) / (sqrt(list_dot_product($a.v, $a.v)) * sqrt(list_dot_product($b.v, $b.v)))"
      val rounds = (2 to 4).map { i =>
        val prev = s"acc${i - 1}"
        s"""ms$i AS (
              SELECT rm.query_id, rm.neighbor_id, rm.rel, MAX(p.sim) AS ms
              FROM cands rm
              JOIN p ON p.query_id = rm.query_id AND p.a = rm.neighbor_id
              JOIN $prev s ON s.query_id = p.query_id AND s.sel = p.b
              WHERE NOT EXISTS (SELECT 1 FROM $prev s2
                                WHERE s2.query_id = rm.query_id AND s2.sel = rm.neighbor_id)
              GROUP BY 1, 2, 3),
            acc$i AS MATERIALIZED (
              SELECT * FROM $prev
              UNION ALL
              SELECT query_id, neighbor_id AS sel, $i AS r, rel, score FROM (
                SELECT query_id, neighbor_id, rel, 7 * rel - 3 * ms AS score,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY 7 * rel - 3 * ms DESC, neighbor_id) AS rn
                FROM ms$i) WHERE rn = 1)"""
      }.mkString(",\n          ")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          sc0 AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cos("q", "c")} AS rel
            FROM e q JOIN e c ON q.vec_id < 4 AND q.vec_id <> c.vec_id),
          cands AS MATERIALIZED (
            SELECT query_id, neighbor_id, rel FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY rel DESC, neighbor_id) AS rn
              FROM sc0) WHERE rn <= 8),
          p AS MATERIALIZED (
            SELECT c1.query_id, c1.neighbor_id AS a, c2.neighbor_id AS b,
                   ${cos("ea", "eb")} AS sim
            FROM cands c1
            JOIN cands c2 ON c1.query_id = c2.query_id AND c1.neighbor_id <> c2.neighbor_id
            JOIN e ea ON ea.vec_id = c1.neighbor_id
            JOIN e eb ON eb.vec_id = c2.neighbor_id),
          acc1 AS MATERIALIZED (
            SELECT query_id, neighbor_id AS sel, 1 AS r, rel, 7 * rel AS score FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY rel DESC, neighbor_id) AS rn
              FROM cands) WHERE rn = 1),
          $rounds
          SELECT CAST(query_id AS BIGINT) AS query_id, CAST(r AS BIGINT) AS sel_round,
                 CAST(sel AS BIGINT) AS neighbor_id,
                 ROUND(rel, 4) AS relevance, ROUND(score, 4) AS score
          FROM acc4 ORDER BY query_id, sel_round"""
    })

  /** Vocabulary coverage / OOV audit: the corpus's top-200 tokens (total
    * (tf, token) order — deterministic) as vocabulary, every doc scored for
    * OOV fraction, rolled up per language — the tokenizer-coverage report
    * before committing to a vocab size. */
  val q176_oov = Q(
    "q176_oov",
    (s, dir) => {
      val d = t(s, dir, "documents")
      TextFunctions.oovStats(d, "doc_id", "text", vocabSize = 200)
        .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("total_tokens")).cast("long").as("tokens"),
          sum(col("oov_tokens")).cast("long").as("oov_tokens"),
          sum(col("oov_ppm")).cast("long").as("ppm_sum"),
          max(col("oov_ppm")).cast("long").as("ppm_max"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
              SELECT doc_id, lang,
                     unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                        x -> len(x) > 0)) AS token
              FROM documents),
            vocab AS (
              SELECT token FROM (
                SELECT token, COUNT(*) AS tf FROM toks GROUP BY 1)
              ORDER BY tf DESC, token LIMIT 200),
            perdoc AS (
              SELECT t.doc_id, t.lang, COUNT(*) AS total_tokens,
                     SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS oov_tokens
              FROM toks t LEFT JOIN vocab v USING (token)
              GROUP BY 1, 2)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(total_tokens) AS BIGINT) AS tokens,
                   CAST(SUM(oov_tokens) AS BIGINT) AS oov_tokens,
                   CAST(SUM((1000000 * oov_tokens) // total_tokens) AS BIGINT) AS ppm_sum,
                   CAST(MAX((1000000 * oov_tokens) // total_tokens) AS BIGINT) AS ppm_max
            FROM perdoc GROUP BY 1 ORDER BY 1"""))

  /** Per-user temporal holdout split (leakage-safe for sequence models):
    * each user's LAST ceil(n/5) events by (ts, event_id) go to holdout.
    * Value sums are exact integer cents so the per-split rollup is
    * bit-stable. */
  val q177_temporal_split = Q(
    "q177_temporal_split",
    (s, dir) => {
      graft.text.Sampling
        .temporalHoldout(t(s, dir, "events"), "user_id", "ts", "event_id")
        .groupBy(col("split"))
        .agg(
          count(lit(1)).cast("long").as("n_events"),
          countDistinct(col("user_id")).cast("long").as("n_users"),
          sum(floor(col("value") * 100).cast("long")).cast("long").as("value_cents"))
        .orderBy("split")
    },
    Some("""WITH r AS (
              SELECT user_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rk,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM events),
            sp AS (
              SELECT user_id, value,
                     CASE WHEN rk <= (n * 1 + 4) // 5 THEN 'holdout'
                          ELSE 'train' END AS split
              FROM r)
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM sp GROUP BY 1 ORDER BY 1"""))

  /** Tokenizer fertility by language: BPE-ish pieces per whitespace word
    * (a language at 3× fertility pays 3× sequence length for the same
    * text). The piece count is replayed in DuckDB WITHOUT lookaround
    * (RE2 has none): pieces = maximal alnum runs + non-alnum non-space
    * chars — provably equal to the boundary-split count. */
  val q178_fertility = Q(
    "q178_fertility",
    (s, dir) => {
      TextFunctions.fertilityCounts(t(s, dir, "documents"), "text")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_words")).cast("long").as("words"),
          sum(col("n_pieces")).cast("long").as("pieces"))
        .withColumn("fertility_ppm", expr("(1000000 * pieces) div words"))
        .orderBy("lang")
    },
    Some("""WITH c AS (
              SELECT lang,
                     len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                     x -> len(x) > 0)) AS n_words,
                     len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                     + len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_pieces
              FROM documents)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_words) AS BIGINT) AS words,
                   CAST(SUM(n_pieces) AS BIGINT) AS pieces,
                   CAST((1000000 * SUM(n_pieces)) // SUM(n_words) AS BIGINT) AS fertility_ppm
            FROM c GROUP BY 1 ORDER BY 1"""))

  /** Custom PHYSICAL top-k-per-group operator (logical node → planner
    * strategy → bounded-heap exec, `plans.TopKPerGroup`): top-2 lineitems
    * by price per supplier, under a total order so the heap and the
    * oracle's row_number agree exactly. The plan carries NO sort and ONE
    * exchange of ≤ k rows per group per input partition — the map-side
    * combine for top-k that the window spelling cannot express
    * (TopKSpec pins the plan shape). */
  val q179_topk_operator = Q(
    "q179_topk_operator",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_suppkey").cast("long").as("suppkey"),
        col("l_orderkey").cast("long").as("orderkey"),
        col("l_linenumber").cast("long").as("linenumber"),
        col("l_extendedprice").as("price"))
      graft.operators.TopK.perGroup(
          li, Seq("suppkey"),
          Seq(("price", false), ("orderkey", true), ("linenumber", true)), k = 2)
        .orderBy("suppkey", "orderkey", "linenumber")
    },
    Some("""SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
                   CAST(l_orderkey AS BIGINT) AS orderkey,
                   CAST(l_linenumber AS BIGINT) AS linenumber,
                   l_extendedprice AS price
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
                  FROM lineitem)
            WHERE rn <= 2
            ORDER BY suppkey, orderkey, linenumber"""))

  /** Synchronous label-propagation communities (graph breadth): 4 fixed
    * rounds over the co-supplier graph, every node adopting its
    * neighborhood's most frequent label (ties to the smaller) — the
    * deterministic LPA variant that replays level-by-level; the oracle
    * runs the same 4 rounds as generated MATERIALIZED stages. */
  val q180_label_prop = Q(
    "q180_label_prop",
    (s, dir) => {
      val os = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      val a = os.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = os.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val edges = a
        .join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 5)
        .select(col("sa").as("src"), col("sb").as("dst"))
      graft.operators.Graph.labelPropagation(edges, iterations = 4)
        .select(col("node").cast("long").as("node"), col("lbl").cast("long").as("community"))
        .orderBy("node")
    },
    Some {
      val rounds = (1 to 4).map { i =>
        val prev = s"l${i - 1}"
        s"""l$i AS MATERIALIZED (
              SELECT src AS node, lbl FROM (
                SELECT src, lbl,
                       ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, lbl ASC) AS rn
                FROM (SELECT e.src, p.lbl, COUNT(*) AS c
                      FROM e JOIN $prev p ON p.node = e.dst GROUP BY 1, 2))
              WHERE rn = 1)"""
      }.mkString(",\n          ")
      s"""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
          e0 AS (SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS w
                 FROM os a JOIN os b
                   ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
                 GROUP BY 1, 2),
          und AS (SELECT sa AS src, sb AS dst FROM e0 WHERE w >= 5),
          e AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
              SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)),
          l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
          $rounds
          SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS community
          FROM l4 ORDER BY node"""
    })

  /** Per-document keyword extraction: top-3 tokens by integer TF·IDF
    * (floor-log2 idf, the q151 spelling), selected through the CUSTOM
    * top-k-per-group physical operator — the bounded-heap plan composing
    * in a real text pipeline (no sort, one exchange over ≤ 3 rows per doc
    * per input partition). */
  val q181_keywords = Q(
    "q181_keywords",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val toks = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df_t"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val scored = tf
        .join(dfT, Seq("token"))
        .crossJoin(broadcast(n))
        .withColumn("score",
          col("tf") * expr("CAST(length(bin((n_docs * 1024) div df_t)) - 1 AS BIGINT)"))
      graft.operators.TopK.perGroup(
          scored, Seq("doc_id"), Seq(("score", false), ("token", true)), k = 3)
        .select(col("doc_id"), col("token"),
          col("tf").cast("long").as("tf"), col("score").cast("long").as("score"))
        .orderBy("doc_id", "token")
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                 x -> len(x) > 0) AS toks
              FROM documents),
            tf AS (
              SELECT doc_id, u.token AS token, CAST(COUNT(*) AS BIGINT) AS tf
              FROM d, UNNEST(d.toks) AS u(token) GROUP BY 1, 2),
            dft AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
            scored AS (
              SELECT doc_id, token, tf,
                     tf * (length(bin((n_docs * 1024) // df_t)) - 1) AS score
              FROM tf JOIN dft USING (token), n)
            SELECT doc_id, token, tf, CAST(score AS BIGINT) AS score
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, token ASC) AS rn
                  FROM scored)
            WHERE rn <= 3
            ORDER BY doc_id, token"""))

  /** Last-touch attribution (marketing analytics): purchases credit the
    * latest preceding view/click within 7 days, one window pass, no
    * self-join of the event log; out-of-window or touchless purchases
    * report as unattributed. */
  val q182_attribution = Q(
    "q182_attribution",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.lastTouchAttribution(
          t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
          touchTypes = Seq("view", "click"), conversionType = "purchase", windowDays = 7)
        .select(col("channel"), col("n_conversions").cast("long").as("n_conversions"))
        .orderBy("channel")
    },
    Some("""WITH w AS (
              SELECT event_type, ts, epoch_us(ts) AS us,
                     LAST_VALUE(CASE WHEN event_type IN ('view','click')
                                     THEN epoch_us(ts) END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tts,
                     LAST_VALUE(CASE WHEN event_type IN ('view','click')
                                     THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tty
              FROM events),
            conv AS (
              SELECT CASE WHEN tts IS NOT NULL AND us - tts <= 7::BIGINT * 86400 * 1000000
                          THEN tty ELSE 'unattributed' END AS channel
              FROM w WHERE event_type = 'purchase')
            SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions
            FROM conv GROUP BY 1 ORDER BY 1"""))

  /** Inter-arrival burstiness profile: per-user consecutive event gaps
    * bucketed by floor-log2 seconds (−1 = sub-second), counted per
    * event type of the later event — integer end-to-end. */
  val q183_interarrival = Q(
    "q183_interarrival",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.interArrivalProfile(
          t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
        .select(col("event_type"), col("bucket"),
          col("n_gaps").cast("long").as("n_gaps"))
        .orderBy("event_type", "bucket")
    },
    Some("""WITH g AS (
              SELECT event_type,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                            ORDER BY ts, event_id) AS gap
              FROM events),
            b AS (
              SELECT event_type,
                     CASE WHEN gap < 1000000 THEN -1
                          ELSE length(bin(gap // 1000000)) - 1 END AS bucket
              FROM g WHERE gap IS NOT NULL)
            SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps
            FROM b GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Perceptual image hashing (multimodal dedup): 200 synthetic PNGs — 100
    * horizontal gradients (one aHash class by construction: blocks right
    * of center above the mean regardless of base brightness) and 100
    * solid grays (aHash 0) — really decoded by ImageIO and hashed into
    * 8-byte artifacts. The oracle derives BOTH expected hashes from
    * arithmetic (the gradient class = bytes 0xF0 at every position,
    * spelled 240·(2⁶⁴−1)/255 − 2⁶⁴ signed), never touching a codec. */
  val q184_image_phash = Q(
    "q184_image_phash",
    (s, dir) => {
      val media = Multimodal.syntheticImages(s, 200)
      Multimodal.imageAHashes(media)
        .groupBy(col("ahash"))
        .agg(count(lit(1)).cast("long").as("n"),
          countDistinct(col("id")).cast("long").as("n_ids"))
        .orderBy("ahash")
    },
    Some("""WITH g AS (
              SELECT i AS id,
                     CASE WHEN i % 2 = 0
                          -- gradient aHash: bit by*8+bx set iff bx >= 4 →
                          -- byte 0xF0 at each of the 8 byte positions =
                          -- 240 * (2^64-1)/255, converted to signed BIGINT
                          THEN CAST(240::HUGEINT * ((18446744073709551616::HUGEINT - 1) // 255)
                                    - 18446744073709551616::HUGEINT AS BIGINT)
                          ELSE 0 END AS ahash
              FROM range(200) t(i))
            SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT id) AS BIGINT) AS n_ids
            FROM g GROUP BY 1 ORDER BY 1"""))

  /** Market-basket affinity (order-level lift): co-purchased part buckets
    * with exact integer lift ppm, support-pruned, top-30 fully
    * tie-broken — the basket generalization of q152's adjacency-only
    * collocations. Explicit-N repartition before the pair expansion. */
  val q185_basket_lift = Q(
    "q185_basket_lift",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").as("basket"),
        (col("l_partkey") % 200).cast("long").as("item"))
      graft.operators.Baskets.cooccurrenceLift(li, "basket", "item", minSupport = 5L)
        .select(
          col("item_a").cast("long").as("item_a"),
          col("item_b").cast("long").as("item_b"),
          col("c12").cast("long").as("c12"),
          col("lift_ppm").cast("long").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("item_a"), col("item_b"))
        .limit(30)
    },
    Some("""WITH items AS (
              SELECT DISTINCT l_orderkey AS b, CAST(l_partkey % 200 AS BIGINT) AS item
              FROM lineitem),
            n AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM items),
            singles AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY 1),
            pairs AS (
              SELECT x.item AS a, y.item AS bb, CAST(COUNT(*) AS BIGINT) AS c12
              FROM items x JOIN items y ON x.b = y.b AND x.item < y.item
              GROUP BY 1, 2 HAVING COUNT(*) >= 5)
            SELECT a AS item_a, bb AS item_b, c12,
                   CAST((c12 * nb * 1000000) // (s1.c * s2.c) AS BIGINT) AS lift_ppm
            FROM pairs JOIN singles s1 ON s1.item = a
                       JOIN singles s2 ON s2.item = bb, n
            ORDER BY lift_ppm DESC, item_a, item_b LIMIT 30"""))

  /** Integer char-entropy quality feature: floor-log2 entropy bits over
    * [a-z0-9] — near 0 for degenerate filler, large for diverse text —
    * computed WITHOUT exploding characters (36 unrolled replace-count
    * terms, map-side at scan speed). Rolled up per source. */
  val q186_char_entropy = Q(
    "q186_char_entropy",
    (s, dir) => {
      TextFunctions.charEntropyBits(t(s, dir, "documents"), "text")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("char_total")).cast("long").as("chars"),
          sum(col("entropy_bits")).cast("long").as("entropy_bits"),
          min(col("entropy_bits")).cast("long").as("min_entropy"))
        .orderBy("source")
    },
    Some {
      val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
      val lst = chars.map(c => s"'$c'").mkString(", ")
      s"""WITH c AS (SELECT source, lower(text) AS norm FROM documents),
          k AS (SELECT source,
                       list_transform([$lst],
                         ch -> CAST(length(norm) - length(replace(norm, ch, '')) AS BIGINT)) AS cnts
                FROM c),
          t AS (SELECT source, cnts, list_sum(cnts) AS tot FROM k),
          e AS (SELECT source, tot,
                       CASE WHEN tot > 0 THEN list_sum(list_transform(cnts,
                         x -> CASE WHEN x > 0 THEN x * (length(bin(tot // x)) - 1) ELSE 0 END))
                       ELSE 0 END AS ent
                FROM t)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(tot) AS BIGINT) AS chars,
                 CAST(SUM(ent) AS BIGINT) AS entropy_bits,
                 CAST(MIN(ent) AS BIGINT) AS min_entropy
          FROM e GROUP BY 1 ORDER BY 1"""
    })

  /** Domain blocklist gate (crawl hygiene): hosts synthesized from doc_id
    * arithmetic, matched against a blocklist with SUBDOMAIN semantics
    * (suffix explode + broadcast join; the most specific entry wins).
    * The oracle derives every verdict from the id arithmetic alone. */
  val q187_blocklist = Q(
    "q187_blocklist",
    (s, dir) => {
      import graft.text.UrlOps
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"))
        .withColumn("host",
          when(col("doc_id") % 5 === 0,
            concat(lit("a"), (col("doc_id") % 3).cast("string"), lit(".bad.org")))
            .otherwise(concat(lit("www.site"), (col("doc_id") % 40).cast("string"), lit(".com"))))
      val blocklist = s.createDataFrame(
        Seq(Tuple1("site3.com"), Tuple1("site17.com"), Tuple1("bad.org"), Tuple1("a1.bad.org")))
        .toDF("entry")
      UrlOps.matchBlocklist(d, "doc_id", "host", blocklist)
        .groupBy(coalesce(col("blocked_by"), lit("allowed")).as("verdict"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .orderBy("verdict")
    },
    Some("""WITH v AS (
              SELECT CASE
                       -- a1.bad.org (most specific) beats bad.org
                       WHEN doc_id % 5 = 0 AND doc_id % 3 = 1 THEN 'a1.bad.org'
                       WHEN doc_id % 5 = 0 THEN 'bad.org'
                       WHEN doc_id % 40 = 3 THEN 'site3.com'
                       WHEN doc_id % 40 = 17 THEN 'site17.com'
                       ELSE 'allowed' END AS verdict
              FROM documents)
            SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM v GROUP BY 1 ORDER BY 1"""))

  /** SQL-TEXT surface of the custom Catalyst expressions: the whole query
    * is one `spark.sql` string over a temp view, exercising `fvec_dot`
    * (registered via GraftExtensions' injectFunction) from SQL — the
    * extension path a SQL-only user takes; values match q27's
    * Column-API/native-expression route bit-for-bit. */
  val q188_sql_surface = Q(
    "q188_sql_surface",
    (s, dir) => {
      t(s, dir, "embeddings").createOrReplaceTempView("graft_q188_emb")
      s.sql("""
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               ROUND(fvec_dot(a.embedding, b.embedding) /
                     (SQRT(fvec_dot(a.embedding, a.embedding)) *
                      SQRT(fvec_dot(b.embedding, b.embedding))), 4) AS cos
        FROM graft_q188_emb a JOIN graft_q188_emb b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 20 AND b.vec_id < 20
        ORDER BY cos DESC, id1, id2 LIMIT 5""")
        .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"), col("cos"))
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings WHERE vec_id < 20)
            SELECT CAST(a.vec_id AS BIGINT) AS id1, CAST(b.vec_id AS BIGINT) AS id2,
                   ROUND(list_dot_product(a.v, b.v) /
                         (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 4) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            ORDER BY cos DESC, id1, id2 LIMIT 5"""))

  /** Time-travel read over SCD2 history (lakehouse pattern): the q131
    * history table queried AS OF two instants — an open-ended current
    * version (valid_to NULL) must satisfy any later as-of, a closed one
    * only instants inside [from, to). */
  val q189_time_travel = Q(
    "q189_time_travel",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tsu"), col("event_id"))
      val hist = graft.operators.History
        .scd2(ev, Seq("user_id"), "tsu", "event_type", tieBreak = Seq("event_id"))
        .localCheckpoint(true) // two as-of consumers
      def asOf(tag: String, tu: Long) = hist
        .filter(col("valid_from") <= tu && (col("valid_to").isNull || col("valid_to") > tu))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_users"))
        .withColumn("as_of", lit(tag))
      asOf("t1", 1704844800000000L) // 2024-01-10T00:00:00Z
        .unionByName(asOf("t2", 1706140800000000L)) // 2024-01-25T00:00:00Z
        .orderBy("as_of", "event_type")
    },
    Some("""WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id FROM events),
            f AS (SELECT *, CASE WHEN event_type IS NOT DISTINCT FROM
                                      LAG(event_type) OVER w THEN 0 ELSE 1 END AS chg
                  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
            i AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                                           ROWS UNBOUNDED PRECEDING) AS island FROM f),
            g AS (SELECT user_id, island, MIN(event_type) AS event_type,
                         MIN(tsu) AS valid_from FROM i GROUP BY 1, 2),
            h AS (SELECT user_id, event_type, valid_from,
                         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to
                  FROM g),
            t AS (SELECT 't1' AS as_of, 1704844800000000 AS tu
                  UNION ALL SELECT 't2', 1706140800000000)
            SELECT t.as_of, h.event_type, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM h JOIN t ON h.valid_from <= t.tu
                         AND (h.valid_to IS NULL OR h.valid_to > t.tu)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Streaming idempotent upsert sink (exactly-once pattern): the events
    * file split into 4 source files, streamed one file per micro-batch
    * through an update-mode count into a batch-partitioned parquet
    * serving table (`batch=<id>` dirs, overwrite — a batch RETRY rewrites
    * its own directory instead of duplicating). The serving read resolves
    * each key to its latest batch; the oracle is the plain batch count —
    * equality across 4 incremental upserts is the exactly-once claim. */
  val q190_stream_upsert = Q(
    "q190_stream_upsert",
    (s, dir) => {
      val raw = s.read.parquet(s"$dir/events.parquet")
      val scratch = s.conf.get("spark.local.dir", "/tmp") +
        "/graft_q190_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Writers.deleteRecursively(java.nio.file.Paths.get(scratch))
      val srcDir = s"$scratch/src"
      raw.repartition(4, col("event_id")).write.parquet(srcDir)
      val stream = s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val agg = stream.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val q = scopedStreamStart(s)(graft.streaming.StreamOps.idempotentUpsertCounts(
        agg, s"$scratch/serving", s"$scratch/ckpt"))
      q.awaitTermination()
      graft.streaming.StreamOps.readServingCounts(s, s"$scratch/serving", Seq("event_type"))
        .select(col("event_type"), col("n").cast("long").as("n"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Rolling 7-day distinct users via HLL register merge: per-day register
    * tables (the persistable artifact) each contribute to 7 target days
    * through a bounded offset explode, max-merged per (day, register) —
    * the sliding-cardinality report that at 100 TB never rescans old
    * days and never shuffles raw user ids across windows (registers are
    * ≤ 256 rows/day regardless of volume). Exact rolling distinct
    * computed alongside as the honesty column; the oracle replays hash,
    * registers, shift-merge, and the ordered dyadic estimate fold. */
  val q191_rolling_distinct = Q(
    "q191_rolling_distinct",
    (s, dir) => {
      import graft.operators.Sketches
      val ev = t(s, dir, "events")
        .select(unix_date(to_date(col("ts"))).cast("long").as("day"), col("user_id"))
      val days = ev.select(col("day")).distinct().localCheckpoint(true)
      val regs = Sketches.hllRegisters(ev, Seq("day"), xxhash64(col("user_id")), p = 8)
      val rolled = regs
        .withColumn("off", explode(sequence(lit(0), lit(6))))
        .select((col("day") + col("off")).as("day"), col("j"), col("m"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"), col("j"))
        .agg(max(col("m")).as("m"))
      val est = Sketches.hllEstimate(rolled, Seq("day"), p = 8)
      val exact = ev.distinct()
        .withColumn("off", explode(sequence(lit(0), lit(6))))
        .select((col("day") + col("off")).as("day"), col("user_id"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).cast("long").as("exact"))
      exact.join(est, Seq("day"))
        .select(col("day"), col("exact"), col("registers_used"), col("hll_est"))
        .orderBy("day")
    },
    Some {
      import graft.tools.OracleSql._
      val m = 256
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val scale = alpha * m.toDouble * m.toDouble
      val keys = """SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                           user_id AS k FROM events"""
      val hashed = xxhash64LongStages(s"($keys)", "k", "kh", pfx = "__h")
      s"""WITH hu AS (
            SELECT day,
                   CASE WHEN kh < 0 THEN kh::HUGEINT + 18446744073709551616::HUGEINT
                        ELSE kh::HUGEINT END AS u
            FROM ($hashed)),
          days AS (SELECT DISTINCT day FROM hu),
          jr AS (
            SELECT day, CAST(u % $m AS BIGINT) AS j,
                   CASE WHEN u // $m = 0 THEN 57
                        ELSE 57 - length(bin(CAST(u // $m AS BIGINT))) END AS rho
            FROM hu),
          shifted AS (
            SELECT jr.day + o.i AS day, j, rho
            FROM jr, (SELECT unnest(range(7)) AS i) o
            WHERE jr.day + o.i IN (SELECT day FROM days)),
          regs AS (SELECT day, j, MAX(rho) AS mm FROM shifted GROUP BY 1, 2),
          folded AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS registers_used,
                   list_reduce(
                     [$m.0 - COUNT(*)] || list(1.0 / (1::BIGINT << mm) ORDER BY j),
                     (a, b) -> a + b) AS sh
            FROM regs GROUP BY 1),
          exact AS (
            SELECT s.day, CAST(COUNT(DISTINCT k) AS BIGINT) AS exact
            FROM (SELECT hu2.day + o.i AS day, k
                  FROM (SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                               user_id AS k FROM events) hu2,
                       (SELECT unnest(range(7)) AS i) o
                  WHERE hu2.day + o.i IN (SELECT day FROM days)) s
            GROUP BY 1)
          SELECT e.day, e.exact, f.registers_used, $scale / f.sh AS hll_est
          FROM exact e JOIN folded f USING (day)
          ORDER BY day"""
    })

  /** Second-order event sequences: per-user consecutive 3-grams under the
    * (ts, event_id) total order, top-20 by (count, sequence) — the
    * depth-2 extension of q171's first-order transition matrix (what a
    * next-event model actually trains on). */
  val q192_event_trigrams = Q(
    "q192_event_trigrams",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    },
    Some("""WITH g AS (
              SELECT event_type AS e1,
                     LEAD(event_type, 1) OVER w AS e2,
                     LEAD(event_type, 2) OVER w AS e3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
            FROM g WHERE e3 IS NOT NULL
            GROUP BY 1, 2, 3 ORDER BY n DESC, e1, e2, e3 LIMIT 20"""))

  /** Weekday seasonality profile: per event type, each ISO weekday's
    * share of volume in ppm (integer; Σ over weekdays ≤ 7·10⁶ exactly) —
    * the shape used to judge whether q172's period-7 naive forecast even
    * applies. */
  val q193_weekday_profile = Q(
    "q193_weekday_profile",
    (s, dir) => {
      val d = t(s, dir, "events")
        .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"))
      import org.apache.spark.sql.expressions.Window
      d.withColumn("tot", sum(col("n")).over(Window.partitionBy(col("event_type"))))
        .select(col("event_type"), col("dow"),
          col("n").cast("long").as("n"),
          expr("(1000000 * n) div tot").cast("long").as("share_ppm"))
        .orderBy("event_type", "dow")
    },
    Some("""WITH d AS (
              SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, COUNT(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type, dow, CAST(n AS BIGINT) AS n,
                   CAST((1000000 * n) // SUM(n) OVER (PARTITION BY event_type)
                        AS BIGINT) AS share_ppm
            FROM d ORDER BY event_type, dow"""))

  /** Manifest-based data skipping (lakehouse pattern): orders written
    * range-clustered on o_totalprice into 8 files, a per-file min/max
    * manifest built once, and a selective range query planned against the
    * MANIFEST — it must open a strict subset of files (asserted) and
    * still produce exactly the full-scan answer (the oracle). */
  val q194_file_skipping = Q(
    "q194_file_skipping",
    (s, dir) => {
      import graft.sources.Skipping
      val scratch = s.conf.get("spark.local.dir", "/tmp") +
        "/graft_q194_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Writers.deleteRecursively(java.nio.file.Paths.get(scratch))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .repartitionByRange(8, col("o_totalprice"))
        .write.parquet(scratch)
      val manifest = Skipping.buildManifest(s, scratch, "o_totalprice")
      val nFiles = manifest.count()
      val (files, ranged) = Skipping.readRange(s, scratch, manifest, "o_totalprice", 100000.0, 150000.0)
      require(files.nonEmpty && files.size < nFiles,
        s"skipping must open a strict subset: ${files.size} of $nFiles")
      ranged
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders WHERE o_totalprice BETWEEN 100000.0 AND 150000.0
            GROUP BY 1 ORDER BY 1"""))

  /** Quota-balanced eval-set builder: 300 docs spread equally across the
    * (lang, source) cells (first n mod C cells in cell order get the
    * remainder), filled by deterministic hash order; small cells
    * under-fill and REPORT shortfall rather than borrow. Per-lang rollup
    * pins pools, quotas, picks, and the picked-id checksum. */
  val q195_quota_sample = Q(
    "q195_quota_sample",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"), col("source"))
      val picked = graft.text.Sampling.quotaBalancedSample(
        d, Seq("lang", "source"), "doc_id", n = 307L, seed = "ev", uniform = knuthUniform)
      picked
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("picked"),
          sum(col("cell_quota")).cast("long").as("quota_weighted_rows"),
          sum(col("doc_id")).cast("long").as("id_checksum"))
        .orderBy("lang")
    },
    Some(s"""WITH cells AS (
              SELECT lang, source, COUNT(*) AS cell_pool,
                     ROW_NUMBER() OVER (ORDER BY lang, source) AS ci,
                     (SELECT COUNT(*) FROM (SELECT DISTINCT lang, source FROM documents)) AS c
              FROM documents GROUP BY 1, 2),
            quotas AS (
              SELECT lang, source, cell_pool,
                     307 // c + CASE WHEN ci <= 307 % c THEN 1 ELSE 0 END AS cell_quota
              FROM cells),
            ranked AS (
              SELECT d.doc_id, d.lang, d.source, q.cell_quota,
                     ROW_NUMBER() OVER (PARTITION BY d.lang, d.source
                                        ORDER BY ${knuthUniformSql("d.doc_id", "ev")}, d.doc_id) AS rn
              FROM documents d JOIN quotas q ON d.lang = q.lang AND d.source = q.source),
            picked AS (SELECT * FROM ranked WHERE rn <= cell_quota)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS picked,
                   CAST(SUM(cell_quota) AS BIGINT) AS quota_weighted_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum
            FROM picked GROUP BY 1 ORDER BY 1"""))

  /** The custom OPTIMIZER rule end-to-end: a group-key filter applied
    * AFTER the top-k operator — `PushFilterThroughTopK` commutes it below
    * the node (group filters drop whole groups, never rows within one)
    * and Spark's own pushdown carries it into the scan; TopKSpec pins
    * the plan, this query pins the values. */
  val q196_topk_pushdown = Q(
    "q196_topk_pushdown",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_suppkey").cast("long").as("suppkey"),
        col("l_orderkey").cast("long").as("orderkey"),
        col("l_linenumber").cast("long").as("linenumber"),
        col("l_extendedprice").as("price"))
      graft.operators.TopK.perGroup(
          li, Seq("suppkey"),
          Seq(("price", false), ("orderkey", true), ("linenumber", true)), k = 3)
        .filter(col("suppkey") % 7 === 2)
        .orderBy("suppkey", "orderkey", "linenumber")
    },
    Some("""SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
                   CAST(l_orderkey AS BIGINT) AS orderkey,
                   CAST(l_linenumber AS BIGINT) AS linenumber,
                   l_extendedprice AS price
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
                  FROM lineitem)
            WHERE rn <= 3 AND l_suppkey % 7 = 2
            ORDER BY suppkey, orderkey, linenumber"""))

  /** Exact-integer daily-volume trend: OLS slope as a BIGINT rational
    * (numerator sign = direction, no doubles anywhere), dense-spine day
    * indexing — the feed-health monitor that can't flap from float
    * noise. */
  val q197_volume_trend = Q(
    "q197_volume_trend",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.dailyTrend(t(s, dir, "events"), "event_type", "ts")
        .select(
          col("key").as("event_type"),
          col("days").cast("long").as("days"),
          col("slope_num").cast("long").as("slope_num"),
          col("slope_den").cast("long").as("slope_den"),
          col("slope_mppm").cast("long").as("slope_mppm"),
          col("trend"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type AS key, CAST(ts AS DATE) AS day, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            spine AS (
              SELECT k.key, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY))::DATE AS day, b.lo
              FROM (SELECT DISTINCT key FROM daily) k, bounds b),
            xy AS (
              SELECT s.key, CAST(s.day - s.lo AS BIGINT) AS x,
                     CAST(COALESCE(d.n, 0) AS BIGINT) AS y
              FROM spine s LEFT JOIN daily d ON s.key = d.key AND s.day = d.day),
            agg AS (
              SELECT key, CAST(COUNT(*) AS BIGINT) AS days,
                     SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
              FROM xy GROUP BY 1)
            SELECT key AS event_type, days,
                   CAST(days * sxy - sx * sy AS BIGINT) AS slope_num,
                   CAST(days * sxx - sx * sx AS BIGINT) AS slope_den,
                   CAST(CASE WHEN days * sxx - sx * sx > 0
                        THEN (1000000000 * (days * sxy - sx * sy)) // (days * sxx - sx * sx)
                        END AS BIGINT) AS slope_mppm,
                   CASE WHEN days * sxy - sx * sy > 0 THEN 'growing'
                        WHEN days * sxy - sx * sy < 0 THEN 'shrinking'
                        ELSE 'flat' END AS trend
            FROM agg ORDER BY 1"""))

  /** CUSUM change-point detection: centered cumulative sums scaled by n
    * (exact BIGINT, no fractional mean), argmax |S| with earliest-day
    * tie-break — the level-shift locator for ingest volumes. */
  val q198_change_point = Q(
    "q198_change_point",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.cusumChangePoint(t(s, dir, "events"), "event_type", "ts")
        .select(
          col("key").as("event_type"),
          col("days").cast("long").as("days"),
          col("total").cast("long").as("total"),
          col("change_day").cast("long").as("change_day"),
          col("peak_abs").cast("long").as("peak_abs"),
          col("shift"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type AS key, CAST(ts AS DATE) AS day, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            spine AS (
              SELECT k.key, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY))::DATE AS day, b.lo
              FROM (SELECT DISTINCT key FROM daily) k, bounds b),
            xy AS (
              SELECT s.key, CAST(s.day - s.lo AS BIGINT) AS x,
                     CAST(COALESCE(d.n, 0) AS BIGINT) AS y
              FROM spine s LEFT JOIN daily d ON s.key = d.key AND s.day = d.day),
            c0 AS (
              SELECT key, x, y,
                     COUNT(*) OVER (PARTITION BY key) AS nd,
                     SUM(y) OVER (PARTITION BY key) AS tot
              FROM xy),
            cum AS (
              SELECT key, x, nd, tot,
                     SUM(y * nd - tot)
                       OVER (PARTITION BY key ORDER BY x ROWS UNBOUNDED PRECEDING) AS s
              FROM c0),
            pick AS (
              SELECT key, nd AS days, tot AS total, x AS change_day, ABS(s) AS peak_abs, s,
                     ROW_NUMBER() OVER (PARTITION BY key ORDER BY ABS(s) DESC, x ASC) AS rn
              FROM cum)
            SELECT key AS event_type, CAST(days AS BIGINT) AS days,
                   CAST(total AS BIGINT) AS total,
                   CAST(change_day AS BIGINT) AS change_day,
                   CAST(peak_abs AS BIGINT) AS peak_abs,
                   CASE WHEN s >= 0 THEN 'up_then_down' ELSE 'down_then_up' END AS shift
            FROM pick WHERE rn = 1 ORDER BY 1"""))

  /** Mixture epoch planner (the data-mixing step BEFORE sampling): given
    * a token budget and uniform per-source target weights, compute each
    * source's required tokens, epochs over its actual supply (ceil,
    * capped at 4 — the standard repetition guard), served tokens, and
    * repeated-token fraction — all integer arithmetic over per-source
    * BPE-ish token supplies (the q178 piece formula, replayed without
    * lookaround by the oracle). */
  val q199_epoch_plan = Q(
    "q199_epoch_plan",
    (s, dir) => {
      val budget = 2000000L
      val capEpochs = 4L
      val supply = TextFunctions.fertilityCounts(t(s, dir, "documents"), "text")
        .groupBy(col("source"))
        .agg(sum(col("n_pieces")).as("supply"))
      val nSrc = supply.select(countDistinct(col("source")).as("n_src"))
      supply.crossJoin(broadcast(nSrc))
        .withColumn("need", expr(s"($budget div n_src)"))
        .withColumn("epochs",
          expr(s"least($capEpochs, (need + supply - 1) div supply)"))
        .withColumn("served", expr("least(need, epochs * supply)"))
        .withColumn("rep_ppm",
          expr("(1000000 * (served - least(supply, served))) div served"))
        .select(col("source"), col("supply").cast("long").as("supply"),
          col("need").cast("long").as("need"), col("epochs").cast("long").as("epochs"),
          col("served").cast("long").as("served"), col("rep_ppm").cast("long").as("rep_ppm"))
        .orderBy("source")
    },
    Some("""WITH sup AS (
              SELECT source,
                     CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                              + len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))) AS BIGINT) AS supply
              FROM documents GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_src FROM sup),
            plan AS (
              SELECT source, supply, 2000000 // n_src AS need,
                     LEAST(4, (2000000 // n_src + supply - 1) // supply) AS epochs
              FROM sup, n),
            served AS (
              SELECT *, LEAST(need, epochs * supply) AS served FROM plan)
            SELECT source, supply, need, CAST(epochs AS BIGINT) AS epochs,
                   CAST(served AS BIGINT) AS served,
                   CAST((1000000 * (served - LEAST(supply, served))) // served AS BIGINT) AS rep_ppm
            FROM served ORDER BY 1"""))

  /** Sketch-fidelity audit (the meta-check every sketch deployment owes
    * itself): for EVERY doc pair in an 80-doc slice, the 64-hash minhash
    * Jaccard estimate (matching signature components / 64) against the
    * exact shingle Jaccard, error-histogrammed in 10k-ppm buckets — the
    * empirical accuracy report that justifies the band/row choices used
    * by the whole dedup family. Integer end-to-end; the oracle replays
    * hashing, all 64 universal-hash mins, and the exact intersections. */
  val q200_sketch_fidelity = Q(
    "q200_sketch_fidelity",
    (s, dir) => {
      import graft.text.Dedup
      val d = t(s, dir, "documents").filter(col("doc_id") < 80)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val sh = Dedup.hashedShingleSets(d, "doc_id", "text", 3).localCheckpoint(true)
      val sigs = Dedup.minhashSignaturesFromShingles(sh, "doc_id", 64)
      val a = sigs.select(sigs.columns.map(c => col(c).as(s"a_$c")): _*)
      val b = sigs.select(sigs.columns.map(c => col(c).as(s"b_$c")): _*)
      val matches = (0 until 64)
        .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      val est = a.join(b, col("a_doc_id") < col("b_doc_id"))
        .select(col("a_doc_id").as("id1"), col("b_doc_id").as("id2"),
          matches.as("matches"))
      val sizes = sh.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
      val inter = sh
        .select(col("doc_id"), explode(array_compact(col("sh"))).as("g"))
        .as("x")
        .join(sh.select(col("doc_id"), explode(array_compact(col("sh"))).as("g")).as("y"),
          col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .agg(count(lit(1)).as("inter"))
      est
        .join(inter, Seq("id1", "id2"), "left")
        .join(sizes.select(col("doc_id").as("id1"), col("sz").as("s1")), Seq("id1"))
        .join(sizes.select(col("doc_id").as("id2"), col("sz").as("s2")), Seq("id2"))
        .withColumn("iv", coalesce(col("inter"), lit(0L)))
        .withColumn("est_ppm", expr("(1000000 * matches) div 64"))
        .withColumn("ex_ppm", expr("(1000000 * iv) div (s1 + s2 - iv)"))
        .withColumn("bucket", expr("abs(est_ppm - ex_ppm) div 10000"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).cast("long").as("n_pairs"),
          sum(col("matches")).cast("long").as("sum_matches"),
          sum(col("iv")).cast("long").as("sum_inter"))
        .orderBy("bucket")
    },
    Some {
      import graft.tools.OracleSql._
      val base = s"SELECT CAST(doc_id AS BIGINT) AS doc_id, ${normalizeSql("text")} AS norm " +
        "FROM documents WHERE doc_id < 80"
      val shingles =
        s"""SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(len(toks) - 2),
                     p -> toks[p+1] || ' ' || toks[p+2] || ' ' || toks[p+3]) END) AS sh
            FROM (SELECT doc_id, list_filter(string_split(norm, ' '), t -> len(t) > 0) AS toks
                  FROM ($base))"""
      val dist = s"SELECT DISTINCT doc_id, sh FROM ($shingles)"
      val hashed = xxhash64Stages(dist, "sh", "hv", pfx = "__b")
      val coefs = graft.text.Dedup.minhashCoefs(64).zipWithIndex
        .map { case ((av, bv), i) => s"($i, $av, $bv)" }.mkString(", ")
      s"""WITH hashed AS MATERIALIZED ($hashed),
            coefs(i, a, b) AS (VALUES $coefs),
            mins AS MATERIALIZED (
              SELECT doc_id, i,
                     MIN((CAST(a AS BIGINT) * (((hv % 2147483647) + 2147483647) % 2147483647)
                          + b) % 2147483647) AS h
              FROM hashed CROSS JOIN coefs GROUP BY 1, 2),
            est AS (
              SELECT x.doc_id AS id1, y.doc_id AS id2,
                     CAST(SUM(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) AS BIGINT) AS matches
              FROM mins x JOIN mins y ON x.i = y.i AND x.doc_id < y.doc_id
              GROUP BY 1, 2),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
                      FROM ($dist) GROUP BY 1),
            inter AS (
              SELECT x.doc_id AS id1, y.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS iv
              FROM ($dist) x JOIN ($dist) y
                ON x.sh = y.sh AND x.doc_id < y.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT e.id1, e.id2, e.matches, COALESCE(i.iv, 0) AS iv, sa.sz AS s1, sb.sz AS s2
              FROM est e
              LEFT JOIN inter i ON i.id1 = e.id1 AND i.id2 = e.id2
              JOIN sizes sa ON sa.doc_id = e.id1
              JOIN sizes sb ON sb.doc_id = e.id2),
            scored AS (
              SELECT matches, iv,
                     ABS((1000000 * matches) // 64 - (1000000 * iv) // (s1 + s2 - iv)) // 10000 AS bucket
              FROM pairs)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(matches) AS BIGINT) AS sum_matches,
                   CAST(SUM(iv) AS BIGINT) AS sum_inter
            FROM scored GROUP BY 1 ORDER BY 1"""
    })

  /** Reciprocal nearest neighbors (parallel-corpus mining): pairs where
    * each vector is in the OTHER's cosine top-5 — the mutual-kNN
    * criterion (Artetxe/margin-mining family) that filters hubness
    * out of raw nearest-neighbor pairs. Composes bruteForceTopK over a
    * 60-vector slice; emitted once per unordered pair. */
  val q201_mutual_knn = Q(
    "q201_mutual_knn",
    (s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val topk = Similarity.bruteForceTopK(emb, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .localCheckpoint(true) // both sides of the mutuality join
      topk.as("f")
        .join(topk.as("r"),
          col("f.query_id") === col("r.neighbor_id") &&
            col("f.neighbor_id") === col("r.query_id") &&
            col("f.query_id") < col("f.neighbor_id"))
        .select(
          col("f.query_id").cast("long").as("id1"),
          col("f.neighbor_id").cast("long").as("id2"),
          round(col("f.cosine"), 4).as("cos12"),
          round(col("r.cosine"), 4).as("cos21"))
        .orderBy("id1", "id2")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings WHERE vec_id < 60),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_dot_product(q.v, c.v) /
                       (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q JOIN e c ON q.vec_id <> c.vec_id),
            topk AS (
              SELECT query_id, neighbor_id, cos FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY cos DESC, neighbor_id) AS rn
                FROM scored) WHERE rn <= 5)
            SELECT CAST(f.query_id AS BIGINT) AS id1,
                   CAST(f.neighbor_id AS BIGINT) AS id2,
                   ROUND(f.cos, 4) AS cos12, ROUND(r.cos, 4) AS cos21
            FROM topk f JOIN topk r
              ON f.query_id = r.neighbor_id AND f.neighbor_id = r.query_id
             AND f.query_id < f.neighbor_id
            ORDER BY id1, id2"""))

  /** Cross-source decile calibration: each doc's quality proxy mapped to
    * its WITHIN-SOURCE decile (integer rank arithmetic, total (value, id)
    * order) — the score-normalization step before corpus-wide thresholds,
    * since a raw cutoff means different things in different sources.
    * Output pins the (source-agnostic) decile populations and per-decile
    * char sums. */
  val q202_decile_calibration = Q(
    "q202_decile_calibration",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
      val wn = Window.partitionBy(col("source"))
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("n_chars"))
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("decile", expr("(10 * (rk - 1)) div n"))
        .groupBy(col("decile"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          countDistinct(col("source")).cast("long").as("n_sources"),
          sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("decile")
    },
    Some("""WITH r AS (
              SELECT doc_id, source, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY n_chars, doc_id) AS rk,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM documents)
            SELECT CAST((10 * (rk - 1)) // n AS BIGINT) AS decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM r GROUP BY 1 ORDER BY 1"""))

  /** Pareto-skyline data selection (minimize price, maximize size over
    * `part`): the multi-objective selection primitive, via the sort-free
    * [[graft.operators.Skyline]] plan — per-x partial aggregate, a
    * prefix-scan over the DISTINCT-x frame only, broadcast join back.
    * The oracle is the independent quadratic NOT-EXISTS dominance
    * spelling, which must agree exactly. */
  val q203_skyline = Q(
    "q203_skyline",
    (s, dir) => {
      val p = t(s, dir, "part")
      graft.operators.Skyline
        .pareto2d(
          p.select(col("p_partkey"), col("p_retailprice"), col("p_size")),
          "p_retailprice", "p_size")
        .select(
          col("p_partkey").cast("long").as("p_partkey"),
          col("p_retailprice"),
          col("p_size").cast("long").as("p_size"))
        .orderBy("p_partkey")
    },
    Some("""SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_retailprice,
                   CAST(p.p_size AS BIGINT) AS p_size
            FROM part p
            WHERE NOT EXISTS (
              SELECT 1 FROM part q
              WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
                AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
            ORDER BY p_partkey"""))

  /** KMV theta-sketch audience overlap: per event-type pair, the union-
    * sketch common count, kept union size, integer Jaccard estimate, and
    * the exact intersection alongside (the expensive raw-key join the
    * sketch replaces — kept here as the fidelity reference, q200-style).
    * Sketch build rides the custom TopK physical operator (map-side
    * bounded heaps); everything after operates on the groups×k bounded
    * sketch frame. Oracle replays the full hash→min-k→union→rank
    * arithmetic through tools.OracleSql's XXH64-in-SQL. */
  val q204_kmv_overlap = Q(
    "q204_kmv_overlap",
    (s, dir) => {
      import graft.operators.Sketches
      val ev = t(s, dir, "events").select(col("event_type"), col("user_id"))
      val sk = Sketches.kmvSketches(ev, "event_type", "user_id", 64)
      val overlap = Sketches.kmvOverlap(sk, 64)
      val d = ev.distinct().cache()
      val exact = d.as("x")
        .join(d.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("g1"), col("y.event_type").as("g2"))
        .agg(count(lit(1)).as("exact_common"))
      val out = overlap.join(exact, Seq("g1", "g2"), "left")
        .select(
          col("g1"), col("g2"),
          col("kmv_common").cast("long").as("kmv_common"),
          col("union_kept").cast("long").as("union_kept"),
          col("jaccard_est_ppm").cast("long").as("jaccard_est_ppm"),
          coalesce(col("exact_common"), lit(0L)).cast("long").as("exact_common"))
        .orderBy("g1", "g2")
      val materialized = out.localCheckpoint(true)
      d.unpersist()
      materialized
    },
    Some {
      import graft.tools.OracleSql._
      val dist = "SELECT DISTINCT event_type AS g, user_id FROM events"
      val hashed = xxhash64LongStages(dist, "user_id", "h")
      s"""WITH hashed AS ($hashed),
            hs AS (SELECT DISTINCT g, h FROM hashed),
            sk AS (SELECT g, h FROM (
                     SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rk
                     FROM hs) WHERE rk <= 64),
            gs AS (SELECT DISTINCT g FROM sk),
            pairs AS (SELECT a.g AS g1, b.g AS g2 FROM gs a JOIN gs b ON a.g < b.g),
            merged AS (SELECT g1, g2, h, COUNT(DISTINCT mg) AS sides FROM (
                         SELECT p.g1, p.g2, s.g AS mg, s.h
                         FROM pairs p JOIN sk s ON s.g = p.g1 OR s.g = p.g2)
                       GROUP BY 1, 2, 3),
            kept AS (SELECT * FROM (
                       SELECT *, ROW_NUMBER() OVER (PARTITION BY g1, g2 ORDER BY h) AS rk
                       FROM merged) WHERE rk <= 64),
            est AS (SELECT g1, g2,
                           CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS kmv_common,
                           CAST(COUNT(*) AS BIGINT) AS union_kept
                    FROM kept GROUP BY 1, 2),
            d AS ($dist),
            exact AS (SELECT x.g AS g1, y.g AS g2, CAST(COUNT(*) AS BIGINT) AS exact_common
                      FROM d x JOIN d y ON x.user_id = y.user_id AND x.g < y.g
                      GROUP BY 1, 2)
          SELECT e.g1, e.g2, e.kmv_common, e.union_kept,
                 CAST((1000000 * e.kmv_common) // e.union_kept AS BIGINT) AS jaccard_est_ppm,
                 COALESCE(x.exact_common, 0) AS exact_common
          FROM est e LEFT JOIN exact x ON e.g1 = x.g1 AND e.g2 = x.g2
          ORDER BY 1, 2"""
    })

  /** Model-based quality gate via the hashing trick: every document scored
    * by a hashed-feature linear classifier — ONE codegen expression
    * ([[graft.plans.HashedLinearScore]]), so the whole corpus is scored
    * map-side at scan speed, the shape a learned quality filter must have
    * at 100 TB. Weights are the deterministic integer ramp (b mod 7) − 3
    * over 4096 buckets, so per-source pass/score aggregates are exact
    * BIGINTs; the oracle replays tokenize→xxhash64→bucket→ramp→sum in SQL. */
  val q205_hash_classifier = Q(
    "q205_hash_classifier",
    (s, dir) => {
      import graft.text.TextFunctions
      import org.apache.spark.sql.graft.ExprColumn
      val d = t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(TextFunctions.normalize(col("text"))))
        .withColumn("score",
          ExprColumn(graft.plans.HashedLinearScore(ExprColumn.expr(col("toks")), 4096)))
      d.groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          count(col("score")).cast("long").as("n_scored"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).cast("long").as("n_pass"),
          coalesce(sum(col("score")), lit(0L)).cast("long").as("sum_score"))
        .orderBy("source")
    },
    Some {
      import graft.tools.OracleSql._
      val base = s"SELECT doc_id, source, " +
        s"list_filter(string_split(${normalizeSql("text")}, ' '), t -> len(t) > 0) AS toks " +
        "FROM documents"
      val tk = s"SELECT doc_id, unnest(toks) AS tok FROM ($base)"
      val hashed = xxhash64Stages(tk, "tok", "hv", pfx = "__q205")
      s"""WITH base AS ($base),
            hashed AS ($hashed),
            sc AS (SELECT doc_id,
                          CAST(SUM(((((hv % 4096) + 4096) % 4096) % 7) - 3) AS BIGINT) AS score
                   FROM hashed GROUP BY 1)
          SELECT b.source,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(sc.score) AS BIGINT) AS n_scored,
                 CAST(SUM(CASE WHEN sc.score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
                 CAST(COALESCE(SUM(sc.score), 0) AS BIGINT) AS sum_score
          FROM base b LEFT JOIN sc ON b.doc_id = sc.doc_id
          GROUP BY 1 ORDER BY 1"""
    })

  /** Column-level lineage report over a four-table revenue pipeline —
    * Catalyst-native governance tooling ([[graft.plans.Lineage]]): the
    * analyzed plan's ExprIds are folded bottom-up into per-output-column
    * source sets, no data touched. The oracle is the hand-derived expected
    * mapping (the strongest form for constructed inputs: the answer comes
    * from the pipeline's definition, not from replaying the extractor). */
  val q206_lineage = Q(
    "q206_lineage",
    (s, dir) => {
      val pipeline = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("n_name").as("nation_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
      graft.plans.Lineage.report(pipeline).orderBy("out_col")
    },
    Some("""SELECT * FROM (VALUES
              ('n_orders', 'orders.o_orderkey'),
              ('n_rows', 'literal'),
              ('nation_name', 'nation.n_name'),
              ('revenue', 'lineitem.l_discount,lineitem.l_extendedprice')
            ) AS v(out_col, sources) ORDER BY out_col"""))

  /** Corpus Zipf-law audit: global word-frequency ranks bucketed by
    * floor-log2(rank) with per-bucket counts and frequency mass — the
    * vocabulary-shape report behind tokenizer and filtering decisions.
    * One word-count aggregate (map-side combine over the corpus), then a
    * single global sort of the VOCABULARY (≪ corpus; the only global
    * stage touches distinct words, never documents). Integer-only via the
    * floor-log2 `length(bin(rank)) − 1` spelling, bit-stable across
    * engines. */
  val q207_zipf = Q(
    "q207_zipf",
    (s, dir) => {
      import graft.text.TextFunctions
      import org.apache.spark.sql.expressions.Window
      val words = t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("w"))
      val freq = words.groupBy(col("w")).agg(count(lit(1)).as("f"))
      freq
        .withColumn("rank", row_number().over(Window.orderBy(col("f").desc, col("w"))))
        .withColumn("bucket", expr("length(bin(rank)) - 1").cast("long"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).cast("long").as("n_words"),
          sum(col("f")).cast("long").as("freq_mass"),
          max(col("f")).cast("long").as("max_f"),
          min(col("f")).cast("long").as("min_f"))
        .orderBy("bucket")
    },
    Some {
      import graft.tools.OracleSql._
      s"""WITH toks AS (SELECT unnest(list_filter(string_split(${normalizeSql("text")}, ' '),
                                      t -> len(t) > 0)) AS w
                        FROM documents),
            f AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY 1),
            r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rank FROM f)
          SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(f) AS BIGINT) AS freq_mass,
                 CAST(MAX(f) AS BIGINT) AS max_f,
                 CAST(MIN(f) AS BIGINT) AS min_f
          FROM r GROUP BY 1 ORDER BY 1"""
    })

  /** Product-quantization ANN (Jégou '11) — the beyond-IVF scale path:
    * integer-exact PQ end to end ([[graft.ml.Pq]]): floor-quantized grid,
    * 2 integer-Lloyd rounds per subspace (M=8 × K=4 codebooks over 64
    * dims), map-side codegen encoding, broadcast ADC lookup tables, top-5
    * per query via the custom TopK operator, with the exact quantized L2²
    * audited alongside on the result rows. The oracle replays EVERY stage
    * value-exactly in DuckDB — quantization, seeding, both Lloyd rounds
    * (materialized iterated CTEs), encoding, ADC sums, ranking, and the
    * 64-term exact distance. */
  val q208_pq_ann = Q(
    "q208_pq_ann",
    (s, dir) => {
      import graft.ml.Pq
      import graft.operators.TopK
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val M = 8; val K = 4; val SD = 8; val ITERS = 2; val SCALE = 64
      val emb = t(s, dir, "embeddings")
        .select(
          col("vec_id").cast("long").as("vec_id"),
          Pq.quantized(col("embedding"), SCALE).as("qv"))
        .cache() // drives the training iteration and the encode pass
      val cb = Pq.train(emb, "vec_id", "qv", M, K, SD, ITERS)
      val encoded = Pq.encode(emb, "qv", cb)
      val queries = emb.filter(col("vec_id") < 5).collect()
      val qdf = queries.toSeq
        .map(r => (r.getLong(0), Pq.adcTable(r.getSeq[Long](1), cb)))
        .toDF("query_id", "tab")
      val scored = encoded
        .crossJoin(broadcast(qdf))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("adc_dist", Pq.adcDistance(cb))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc_dist"))
      val top = TopK.perGroup(
        scored, Seq("query_id"), Seq(("adc_dist", true), ("neighbor_id", true)), 5)
      val ranked = top.withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))))
      val qq = queries.toSeq.map(r => (r.getLong(0), r.getSeq[Long](1))).toDF("query_id", "qq")
      val out = ranked
        .join(emb.select(col("vec_id").as("neighbor_id"), col("qv").as("qn")), "neighbor_id")
        .join(broadcast(qq), "query_id")
        .withColumn("exact_d2",
          expr("aggregate(zip_with(qn, qq, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
        .select(
          col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
          col("adc_dist").cast("long").as("adc_dist"),
          col("exact_d2").cast("long").as("exact_d2"))
        .orderBy("query_id", "rank")
      val materialized = out.localCheckpoint(true)
      emb.unpersist()
      materialized
    },
    Some {
      val M = 8; val K = 4; val SD = 8; val ITERS = 2; val SCALE = 64
      def dist(sv: String, cw: String): String =
        (1 to SD).map(d => s"(($sv[$d] - $cw[$d]) * ($sv[$d] - $cw[$d]))").mkString(" + ")
      val sb = new StringBuilder
      sb ++= s"""WITH q AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * $SCALE) AS BIGINT)) AS qv
                 FROM embeddings),
            ranked0 AS (SELECT vec_id, qv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk FROM q),
            seeds AS MATERIALIZED (
              SELECT CAST(r.range AS INT) AS c, k.qv
              FROM range($K) r JOIN ranked0 k
                ON k.rk = 1 + r.range * ((SELECT COUNT(*) FROM q) // $K)),
            subv AS MATERIALIZED (
              SELECT vec_id, CAST(mr.range AS INT) AS m,
                     list_slice(qv, mr.range * $SD + 1, mr.range * $SD + $SD) AS sv
              FROM q CROSS JOIN range($M) mr),
            cb0 AS MATERIALIZED (
              SELECT CAST(mr.range AS INT) AS m, s.c,
                     list_slice(s.qv, mr.range * $SD + 1, mr.range * $SD + $SD) AS cw
              FROM range($M) mr CROSS JOIN seeds s),"""
      val cwUpdate = (1 to SD)
        .map(d => s"CAST(FLOOR(CAST(SUM(b.sv[$d]) AS DOUBLE) / COUNT(*)) AS BIGINT)")
        .mkString(", ")
      for (i <- 0 until ITERS) {
        sb ++= s"""
            a$i AS MATERIALIZED (
              SELECT vec_id, m, sv, c,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
              FROM (SELECT s.vec_id, s.m, s.sv, cb.c, ${dist("s.sv", "cb.cw")} AS dist
                    FROM subv s JOIN cb$i cb ON cb.m = s.m)),
            cb${i + 1} AS MATERIALIZED (
              SELECT p.m, p.c, CASE WHEN u.cnt IS NULL THEN p.cw ELSE u.cw END AS cw
              FROM cb$i p LEFT JOIN (
                SELECT b.m, b.c, COUNT(*) AS cnt, [$cwUpdate] AS cw
                FROM (SELECT * FROM a$i WHERE rn = 1) b GROUP BY 1, 2) u
                ON u.m = p.m AND u.c = p.c),"""
      }
      val exact64 = (1 to M * SD)
        .map(d => s"(a.qv[$d] - b.qv[$d]) * (a.qv[$d] - b.qv[$d])")
        .mkString(" + ")
      sb ++= s"""
            encode AS MATERIALIZED (
              SELECT vec_id, m, c FROM (
                SELECT s.vec_id, s.m, cb.c,
                       ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                          ORDER BY ${dist("s.sv", "cb.cw")}, cb.c) AS rn
                FROM subv s JOIN cb$ITERS cb ON cb.m = s.m) WHERE rn = 1),
            qsub AS (SELECT vec_id AS query_id, m, sv FROM subv WHERE vec_id < 5),
            tt AS MATERIALIZED (
              SELECT t.query_id, t.m, cb.c, ${dist("t.sv", "cb.cw")} AS d
              FROM qsub t JOIN cb$ITERS cb ON cb.m = t.m),
            adc AS MATERIALIZED (
              SELECT tt.query_id, e.vec_id AS neighbor_id, CAST(SUM(tt.d) AS BIGINT) AS adc_dist
              FROM encode e JOIN tt ON tt.m = e.m AND tt.c = e.c
              WHERE e.vec_id <> tt.query_id GROUP BY 1, 2),
            sel AS (SELECT * FROM (
                      SELECT query_id, neighbor_id, adc_dist,
                             ROW_NUMBER() OVER (PARTITION BY query_id
                                                ORDER BY adc_dist, neighbor_id) AS rank
                      FROM adc) WHERE rank <= 5)
          SELECT s.query_id, CAST(s.rank AS BIGINT) AS rank, s.neighbor_id, s.adc_dist,
                 CAST($exact64 AS BIGINT) AS exact_d2
          FROM sel s
          JOIN q a ON a.vec_id = s.query_id
          JOIN q b ON b.vec_id = s.neighbor_id
          ORDER BY query_id, rank"""
      sb.toString
    })

  /** Greedy k-center coreset (Gonzalez '85 farthest-point traversal) over
    * integer-quantized embeddings — the maximally-diverse-subset primitive
    * of data curation ([[graft.ml.Coreset]]). Each round is one map-side
    * running-min update against only the newest pick plus a top-1 reduce;
    * the oracle replays all 8 rounds as materialized CTE stages with
    * explicit 64-term integer distances, ties to smallest id. */
  val q209_coreset = Q(
    "q209_coreset",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          graft.ml.Pq.quantized(col("embedding"), 64).as("qv"))
      val picks = graft.ml.Coreset.kCenterGreedy(emb, "vec_id", "qv", 8)
      picks.map { case (r, id, d) => (r.toLong, id, d) }
        .toDF("round", "vec_id", "maxmin_d2")
        .orderBy("round")
    },
    Some {
      val K = 8
      def dist(a: String, b: String): String =
        (1 to 64).map(d => s"(($a[$d] - $b[$d]) * ($a[$d] - $b[$d]))").mkString(" + ")
      val sb = new StringBuilder
      sb ++= """WITH q AS (SELECT CAST(vec_id AS BIGINT) AS id,
                   list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
                 FROM embeddings),
            p0 AS MATERIALIZED (SELECT id, qv FROM q ORDER BY id LIMIT 1),
            m0 AS MATERIALIZED (SELECT q.id, q.qv, """ + dist("q.qv", "s.qv") +
        " AS d FROM q CROSS JOIN p0 s),"
      for (i <- 1 until K) {
        val excl = (0 until i).map(j => s"SELECT id FROM p$j").mkString(" UNION ALL ")
        sb ++= s"""
            p$i AS MATERIALIZED (SELECT id, qv, d FROM m${i - 1}
                                 WHERE id NOT IN ($excl)
                                 ORDER BY d DESC, id LIMIT 1),"""
        if (i < K - 1) {
          sb ++= s"""
            m$i AS MATERIALIZED (SELECT m.id, m.qv,
                                        LEAST(m.d, ${dist("m.qv", "p.qv")}) AS d
                                 FROM m${i - 1} m CROSS JOIN p$i p),"""
        }
      }
      val rounds = (s"SELECT 0 AS round, id AS vec_id, 0 AS maxmin_d2 FROM p0" +:
        (1 until K).map(i => s"SELECT $i, id, d FROM p$i")).mkString(" UNION ALL ")
      sb ++= s"""
            res AS ($rounds)
          SELECT CAST(round AS BIGINT) AS round, vec_id,
                 CAST(maxmin_d2 AS BIGINT) AS maxmin_d2
          FROM res ORDER BY round"""
      sb.toString
    })

  /** A/B experiment readout with an integer-exact decision statistic:
    * users hash-split into arms, per-event-type 2×2 contingency tables,
    * and significance decided by the cross-multiplied Pearson χ² test
    * `25·N·(ad−bc)² ≥ 96·r₁·r₂·c₁·c₂` (χ²₁ ≥ 3.84 as the exact rational
    * 96/25) — no libm, no float flap; the same integer-decision move as
    * the TVD/CUSUM monitors. BIGINT products are safe through ~sf0.3
    * (documented bound: N·(ad−bc)² < 2⁶³/25); beyond that the statistic
    * needs the decimal path. */
  val q210_ab_chisq = Q(
    "q210_ab_chisq",
    (s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(max(col("value") > 75.0).as("conv"))
        .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2)))
      perUser
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("a"),
          sum(when(col("arm") === 0 && !col("conv"), 1L).otherwise(0L)).as("b"),
          sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("c"),
          sum(when(col("arm") === 1 && !col("conv"), 1L).otherwise(0L)).as("d"))
        .withColumn("lhs",
          lit(25L) * (col("a") + col("b") + col("c") + col("d")) *
            (col("a") * col("d") - col("b") * col("c")) *
            (col("a") * col("d") - col("b") * col("c")))
        .withColumn("rhs",
          lit(96L) * (col("a") + col("b")) * (col("c") + col("d")) *
            (col("a") + col("c")) * (col("b") + col("d")))
        .withColumn("significant",
          when(col("rhs") > 0 && col("lhs") >= col("rhs"), 1L).otherwise(0L))
        .select(col("event_type"),
          col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          col("c").cast("long").as("c"), col("d").cast("long").as("d"),
          col("significant"))
        .orderBy("event_type")
    },
    Some {
      import graft.tools.OracleSql._
      val pu = "SELECT event_type, user_id, " +
        "MAX(CASE WHEN value > 75.0 THEN 1 ELSE 0 END) AS conv " +
        "FROM events GROUP BY 1, 2"
      val hashed = xxhash64LongStages(pu, "user_id", "h")
      s"""WITH hashed AS ($hashed),
            armd AS (SELECT event_type, conv, ((h % 2) + 2) % 2 AS arm FROM hashed),
            ct AS (SELECT event_type,
                     CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                     CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                     CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                     CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
                   FROM armd GROUP BY 1)
          SELECT event_type, a, b, c, d,
                 CAST(CASE WHEN 96 * (a + b) * (c + d) * (a + c) * (b + d) > 0
                            AND 25 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c)
                                >= 96 * (a + b) * (c + d) * (a + c) * (b + d)
                           THEN 1 ELSE 0 END AS BIGINT) AS significant
          FROM ct ORDER BY 1"""
    })

  /** Video near-duplicate detection by frame-signature shingles — the
    * multimodal face of the dedup family: REAL AVI payloads are demuxed
    * (q95's RIFF walker), per-frame solid-gray luminance recovered exactly
    * (dyadic means × 256 → integers), consecutive-frame 2-gram shingles
    * formed per video, and pairs scored by exact shingle Jaccard through
    * the inverted-index equi-join (never all-pairs). The corpus
    * construction plants near-dups (same footage, new last frame) and
    * distractors; the oracle derives every expected pair from the
    * (v, j) gray arithmetic — the demuxer never touches the oracle, so a
    * codec bug diverges the hash. */
  val q211_video_neardup = Q(
    "q211_video_neardup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val corpus = Multimodal.syntheticVideoCorpus(s, 120)
      val frames = Multimodal.sampleVideoFrames(corpus, 1)
        .select(col("id"), col("frame_index"),
          (col("frame_mean") * 256).cast("long").as("gray"))
      val w = Window.partitionBy(col("id")).orderBy(col("frame_index"))
      val sh = frames
        .withColumn("nxt", lead(col("gray"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("id"), (col("gray") * 256 + col("nxt")).as("key"))
        .distinct()
        .cache()
      val sz = sh.groupBy(col("id")).agg(count(lit(1)).as("s"))
      val inter = sh.as("x").join(sh.as("y"), col("x.key") === col("y.key") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
      val out = inter
        .join(sz.select(col("id").as("id1"), col("s").as("s1")), "id1")
        .join(sz.select(col("id").as("id2"), col("s").as("s2")), "id2")
        .withColumn("n_union", col("s1") + col("s2") - col("n_shared"))
        .withColumn("jaccard_ppm", expr("(1000000 * n_shared) div n_union"))
        .filter(col("jaccard_ppm") >= 500000)
        .select(col("id1"), col("id2"),
          col("n_shared").cast("long").as("n_shared"),
          col("n_union").cast("long").as("n_union"),
          col("jaccard_ppm").cast("long").as("jaccard_ppm"))
        .orderBy("id1", "id2")
      val materialized = out.localCheckpoint(true)
      sh.unpersist()
      materialized
    },
    Some("""WITH fr AS (
              SELECT v.range AS vid, j.range AS j,
                     ((v.range // 3) * 17 + j.range * 23 +
                      CASE WHEN v.range % 3 = 2 OR (v.range % 3 = 1 AND j.range = 5)
                           THEN 101 ELSE 0 END) % 256 AS gray
              FROM range(120) v CROSS JOIN range(6) j),
            sh AS (
              SELECT DISTINCT a.vid, a.gray * 256 + b.gray AS key
              FROM fr a JOIN fr b ON a.vid = b.vid AND b.j = a.j + 1),
            sz AS (SELECT vid, COUNT(*) AS s FROM sh GROUP BY 1),
            inter AS (
              SELECT x.vid AS id1, y.vid AS id2, COUNT(*) AS n_shared
              FROM sh x JOIN sh y ON x.key = y.key AND x.vid < y.vid
              GROUP BY 1, 2),
            sc AS (
              SELECT i.id1, i.id2, i.n_shared, s1.s + s2.s - i.n_shared AS n_union
              FROM inter i JOIN sz s1 ON s1.vid = i.id1 JOIN sz s2 ON s2.vid = i.id2)
            SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
                   CAST(n_shared AS BIGINT) AS n_shared,
                   CAST(n_union AS BIGINT) AS n_union,
                   CAST((1000000 * n_shared) // n_union AS BIGINT) AS jaccard_ppm
            FROM sc WHERE (1000000 * n_shared) // n_union >= 500000
            ORDER BY id1, id2"""))

  /** Filter-funnel attrition audit — the pipeline-composition artifact
    * every curation run ships: sequential gates (language → length →
    * exact-dedup winner → model-based classifier) with per-stage
    * survivor/dropped counts. One pass computes all gate flags map-side
    * (the classifier is the q205 codegen expression, the dedup winner one
    * hash-partitioned window over the survivors); the report is a 5-row
    * stack. The oracle replays every gate — including the xxhash64 dedup
    * hash and the full tokenize→bucket→ramp classifier — in SQL. */
  val q212_filter_funnel = Q(
    "q212_filter_funnel",
    (s, dir) => {
      import graft.text.TextFunctions
      import org.apache.spark.sql.graft.ExprColumn
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .withColumn("g_lang", col("lang").isin("en", "de", "fr"))
        .withColumn("g_len", col("n_chars").between(100, 500))
      val head = d.agg(
        count(lit(1)).as("n0"),
        sum(when(col("g_lang"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("g_lang") && col("g_len"), 1L).otherwise(0L)).as("n2"))
      val surv = d.filter(col("g_lang") && col("g_len"))
        .withColumn("rk",
          row_number().over(Window.partitionBy(xxhash64(col("text"))).orderBy(col("doc_id"))))
        .withColumn("score",
          ExprColumn(graft.plans.HashedLinearScore(
            ExprColumn.expr(TextFunctions.tokens(TextFunctions.normalize(col("text")))), 4096)))
      val tail = surv.agg(
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n3"),
        sum(when(col("rk") === 1 && col("score") > 0, 1L).otherwise(0L)).as("n4"))
      head.crossJoin(tail)
        .select(expr(
          """stack(5,
               0L, 'all', n0,
               1L, 'lang_gate', n1,
               2L, 'length_gate', n2,
               3L, 'exact_dedup', n3,
               4L, 'classifier_gate', n4) AS (stage, stage_name, n_out)"""))
        .withColumn("dropped",
          coalesce(lag(col("n_out"), 1).over(Window.orderBy(col("stage"))) - col("n_out"), lit(0L)))
        .select(col("stage").cast("long").as("stage"), col("stage_name"),
          col("n_out").cast("long").as("n_out"), col("dropped").cast("long").as("dropped"))
        .orderBy("stage")
    },
    Some {
      import graft.tools.OracleSql._
      val base = "SELECT doc_id, text, lang, n_chars, " +
        "(lang IN ('en', 'de', 'fr')) AS g1, " +
        "(n_chars BETWEEN 100 AND 500) AS g2 FROM documents"
      val hashed = xxhash64Stages(s"SELECT * FROM ($base) WHERE g1 AND g2", "text", "hv", pfx = "__fh")
      val toks = s"SELECT doc_id, unnest(list_filter(string_split(${normalizeSql("text")}, ' '), " +
        s"t -> len(t) > 0)) AS tok FROM ($base) WHERE g1 AND g2"
      val tokHashed = xxhash64Stages(toks, "tok", "tv", pfx = "__ft")
      s"""WITH d AS ($base),
            r AS (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY hv ORDER BY doc_id) AS rk
                  FROM ($hashed)),
            sc AS (SELECT doc_id,
                          CAST(SUM(((((tv % 4096) + 4096) % 4096) % 7) - 3) AS BIGINT) AS score
                   FROM ($tokHashed) GROUP BY 1),
            counts AS (
              SELECT 0 AS stage, 'all' AS stage_name, (SELECT COUNT(*) FROM d) AS n_out
              UNION ALL
              SELECT 1, 'lang_gate', (SELECT COUNT(*) FROM d WHERE g1)
              UNION ALL
              SELECT 2, 'length_gate', (SELECT COUNT(*) FROM d WHERE g1 AND g2)
              UNION ALL
              SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM r WHERE rk = 1)
              UNION ALL
              SELECT 4, 'classifier_gate',
                     (SELECT COUNT(*) FROM r JOIN sc USING (doc_id)
                      WHERE rk = 1 AND sc.score > 0))
          SELECT CAST(stage AS BIGINT) AS stage, stage_name,
                 CAST(n_out AS BIGINT) AS n_out,
                 CAST(COALESCE(LAG(n_out) OVER (ORDER BY stage) - n_out, 0) AS BIGINT) AS dropped
          FROM counts ORDER BY stage"""
    })


  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    * SIGMOD'03 — the MOSS local fingerprinting algorithm) driving a
    * near-duplicate pair report: n=4-token Rabin–Karp window hashes
    * (map-side [[graft.plans.WindowHash64]]) → rightmost-min selection over
    * w=4-hash windows (map-side [[graft.plans.WinnowSelect]] deque, O(L)
    * per doc) → inverted-index pair join on shared fingerprints. The corpus
    * plants a prefix-padded clone of every 7th document; winnowing's
    * guarantee (any shared ≥ w+n−1-token run shares a fingerprint) makes
    * each clone pair share nearly all selected prints while only ~2/(w+1)
    * of window hashes are ever kept — the local-fingerprint density bound.
    * The oracle replays token XXH64 → the 2⁶⁴-wrapping polynomial window
    * hash (B-power constants via [[graft.tools.OracleSql.mulConstSql]]) →
    * per-window rightmost-argmin → the same pair join, value-exactly. */
  val q213_winnowing = Q(
    "q213_winnowing",
    (s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val clones = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(lit("intro preamble "), col("text")).as("text"))
      val corpus = base.unionByName(clones)
      Dedup.winnowingNearDuplicates(corpus, "doc_id", "text", n = 4, w = 4, minShared = 3)
        .select(
          col("id1").cast("long").as("id1"),
          col("id2").cast("long").as("id2"),
          col("shared").cast("long").as("shared"),
          col("n_fp1").cast("long").as("n_fp1"),
          col("n_fp2").cast("long").as("n_fp2"))
        .orderBy("id1", "id2")
    },
    Some {
      import graft.tools.OracleSql._
      val B = BigInt("9E3779B97F4A7C15", 16)
      val M = BigInt(2).pow(64)
      val b2 = (B * B).mod(M)
      val b3 = (B * B * B).mod(M)
      val corpus =
        """SELECT doc_id::BIGINT AS doc_id, text FROM documents
           UNION ALL
           SELECT doc_id::BIGINT + 3000000, 'intro preamble ' || text FROM documents
           WHERE doc_id % 7 = 0"""
      val toked =
        s"""SELECT doc_id,
              list_filter(regexp_split_to_array(trim(${normalizeSql("text")}), '\\s+'),
                          t -> len(t) > 0) AS toks
            FROM ($corpus)"""
      val tk =
        s"""SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
            FROM ($toked)"""
      val hd = xxhash64Stages("SELECT DISTINCT tok FROM tk", "tok", "th", pfx = "__w")
      val wu = addModSql(
        addModSql(
          addModSql(mulConstSql("u0", b3), mulConstSql("u1", b2)),
          mulConstSql("u2", B)),
        "u3")
      s"""WITH tk AS ($tk),
            hd AS ($hd),
            hu AS (SELECT tk.doc_id, tk.p, ${unsignedOf("hd.th")} AS u
                   FROM tk JOIN hd USING (tok)),
            w4 AS (SELECT doc_id, p AS i, u AS u0,
                          LEAD(u, 1) OVER (PARTITION BY doc_id ORDER BY p) AS u1,
                          LEAD(u, 2) OVER (PARTITION BY doc_id ORDER BY p) AS u2,
                          LEAD(u, 3) OVER (PARTITION BY doc_id ORDER BY p) AS u3,
                          COUNT(*) OVER (PARTITION BY doc_id) AS mtok
                   FROM hu),
            hw AS (SELECT doc_id, i, mtok - 3 AS m, $wu AS wu
                   FROM w4 WHERE u3 IS NOT NULL),
            hs AS (SELECT doc_id, i, m,
                          CASE WHEN wu >= 9223372036854775808
                               THEN CAST(wu::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
                               ELSE CAST(wu AS BIGINT) END AS h
                   FROM hw),
            exp AS (SELECT doc_id, i, h, i - off AS j
                    FROM hs, unnest(range(4)) AS o(off)
                    WHERE i - off >= 1 AND i - off <= GREATEST(1, m - 3)),
            picks AS (SELECT doc_id, i, h FROM (
                        SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY doc_id, j ORDER BY h ASC, i DESC) AS rn
                        FROM exp) WHERE rn = 1),
            fps AS (SELECT DISTINCT doc_id, h FROM picks),
            sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY 1),
            pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
                      FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
                      GROUP BY 1, 2 HAVING COUNT(*) >= 3)
          SELECT p.id1, p.id2, CAST(p.shared AS BIGINT) AS shared,
                 CAST(s1.n_fp AS BIGINT) AS n_fp1, CAST(s2.n_fp AS BIGINT) AS n_fp2
          FROM pairs p
          JOIN sizes s1 ON s1.doc_id = p.id1
          JOIN sizes s2 ON s2.doc_id = p.id2
          ORDER BY p.id1, p.id2"""
    })

  /** Count-Min join-size estimation (Cormode & Muthukrishnan '05 §4.2):
    * the size of `A ⋈ B` on a key, estimated as the min-across-depths
    * inner product of the two sides' sketch rows — two 16-KiB artifacts
    * answer the question a planner asks before choosing a join order, with
    * the one-sided `estimate ≥ exact` guarantee. The exact join sizes ride
    * alongside as the fidelity reference (the q113/q200 convention): the
    * view⋈purchase cross size and the view self-join size (the F2 second
    * frequency moment). Oracle replays the fixed-8-byte XXH64 → bucket →
    * cell-sum → inner-product arithmetic in SQL. */
  val q214_join_size_est = Q(
    "q214_join_size_est",
    (s, dir) => {
      import graft.operators.Sketches
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view").select(col("user_id").as("k"))
      val buys = ev.filter(col("event_type") === "purchase").select(col("user_id").as("k"))
      val cmV = Sketches.buildCountMin(views, array(xxhash64(col("k"))), depth = 4, width = 512)
      val cmB = Sketches.buildCountMin(buys, array(xxhash64(col("k"))), depth = 4, width = 512)
      val cntV = views.groupBy("k").agg(count(lit(1)).as("cv"))
      val cntB = buys.groupBy("k").agg(count(lit(1)).as("cb"))
      val exacts = cntV.join(cntB, Seq("k"))
        .agg(sum(col("cv") * col("cb")).as("exact"))
        .withColumn("pair", lit("view_purchase"))
        .unionByName(
          cntV.agg(sum(col("cv") * col("cv")).as("exact"))
            .withColumn("pair", lit("view_view")))
      val ests = s.createDataFrame(Seq(
        ("view_purchase", cmV.innerProduct(cmB)),
        ("view_view", cmV.innerProduct(cmV)))).toDF("pair", "est")
      exacts.join(ests, Seq("pair"))
        .select(col("pair"), col("est").cast("long").as("est"),
          col("exact").cast("long").as("exact"))
        .orderBy("pair")
    },
    Some {
      import graft.tools.OracleSql._
      def side(tp: String, pfx: String): String = {
        val keys = s"SELECT user_id AS k, COUNT(*) AS c FROM events WHERE event_type = '$tp' GROUP BY 1"
        val hashed = xxhash64LongStages(keys, "k", "kh", pfx = pfx)
        val buckets = (0 until 4)
          .map(i => s"CAST(((h1 + $i * h2) % 4294967296) % 512 AS BIGINT) AS g$i")
          .mkString(", ")
        s"""SELECT k, c, $buckets FROM (
              SELECT k, c, u % 4294967296 AS h1, u // 4294967296 AS h2 FROM (
                SELECT k, c, ${unsignedOf("kh")} AS u FROM ($hashed)))"""
      }
      val cellsV = (0 until 4)
        .map(i => s"sv$i AS (SELECT g$i AS g, SUM(c) AS s FROM bv GROUP BY 1)")
        .mkString(",\n            ")
      val cellsB = (0 until 4)
        .map(i => s"sb$i AS (SELECT g$i AS g, SUM(c) AS s FROM bb GROUP BY 1)")
        .mkString(",\n            ")
      val ipVB = (0 until 4)
        .map(i => s"(SELECT SUM(a.s * b.s) FROM sv$i a JOIN sb$i b USING (g))")
        .mkString("LEAST(", ", ", ")")
      val ipVV = (0 until 4)
        .map(i => s"(SELECT SUM(a.s * a.s) FROM sv$i a)")
        .mkString("LEAST(", ", ", ")")
      s"""WITH bv AS (${side("view", "__jv")}),
            bb AS (${side("purchase", "__jb")}),
            $cellsV,
            $cellsB
          SELECT 'view_purchase' AS pair, CAST($ipVB AS BIGINT) AS est,
                 CAST((SELECT SUM(v.c * b.c) FROM bv v JOIN bb b USING (k)) AS BIGINT) AS exact
          UNION ALL
          SELECT 'view_view', CAST($ipVV AS BIGINT),
                 CAST((SELECT SUM(c * c) FROM bv) AS BIGINT)
          ORDER BY pair"""
    })


  /** Integer HITS hubs & authorities (Kleinberg JACM'99) over the
    * bipartite supplier→part supply graph: two unnormalized mutual-
    * reinforcement rounds ([[graft.operators.Graph.hits]] — exact BIGINT
    * scores, partitioning-deterministic), reporting the top-10 hubs
    * (suppliers whose parts are widely co-supplied) and top-10 authorities
    * (parts supplied by the best-connected suppliers) under a (score,
    * node) total order. Oracle = the same two aggregation rounds as plain
    * SQL joins. */
  val q215_hits = Q(
    "q215_hits",
    (s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("src"), col("l_partkey").cast("long").as("dst"))
        .distinct()
      val scored = graft.operators.Graph.hits(edges, rounds = 2)
      val hubs = scored.filter(col("hub").isNotNull)
        .select(lit("hub").as("side"), col("node"), col("hub").as("score"))
        .orderBy(col("score").desc, col("node")).limit(10)
      val auths = scored.filter(col("auth").isNotNull)
        .select(lit("authority").as("side"), col("node"), col("auth").as("score"))
        .orderBy(col("score").desc, col("node")).limit(10)
      hubs.unionByName(auths)
        .select(col("side"), col("node").cast("long").as("node"),
          col("score").cast("long").as("score"))
        .orderBy("side", "node")
    },
    Some("""WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
              h1 AS (SELECT src, COUNT(*) AS sc FROM e GROUP BY 1),
              a1 AS (SELECT dst, SUM(h1.sc) AS sc FROM e JOIN h1 USING (src) GROUP BY dst),
              h2 AS (SELECT src, SUM(a1.sc) AS sc FROM e JOIN a1 USING (dst) GROUP BY src),
              a2 AS (SELECT dst, SUM(h2.sc) AS sc FROM e JOIN h2 USING (src) GROUP BY dst),
              th AS (SELECT 'hub' AS side, src AS node, sc FROM h2
                     ORDER BY sc DESC, src LIMIT 10),
              ta AS (SELECT 'authority' AS side, dst AS node, sc FROM a2
                     ORDER BY sc DESC, dst LIMIT 10)
            SELECT side, CAST(node AS BIGINT) AS node, CAST(sc AS BIGINT) AS score
            FROM (SELECT * FROM th UNION ALL SELECT * FROM ta)
            ORDER BY side, node"""))

  /** Sorted-neighborhood record-linkage blocking (Hernandez & Stolfo
    * SIGMOD'95 merge/purge): documents keyed by their 40-char normalized
    * prefix, blocked on the first character, sorted within block, and
    * compared only against their 2 sort-successors
    * ([[graft.text.Dedup.sortedNeighborhoodPairs]] — one window shuffle,
    * LEAD-carried neighbor keys, codegen levenshtein verify; candidate
    * volume (window−1)·N, linear). The corpus plants a suffix-padded clone
    * of every 9th document — identical prefix keys sort adjacent, the
    * pattern blocking-by-sort exists to catch. Oracle = ROW_NUMBER rank
    * replay + rank-distance join + DuckDB's native levenshtein. */
  val q216_sorted_neighborhood = Q(
    "q216_sorted_neighborhood",
    (s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val clones = base.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(col("text"), lit(" trailing audit suffix")).as("text"))
      val keyed = base.unionByName(clones)
        .select(col("doc_id"),
          substring(TextFunctions.normalize(col("text")), 1, 40).as("key"))
        .withColumn("block", substring(col("key"), 1, 1))
      Dedup.sortedNeighborhoodPairs(keyed, "doc_id", "key", "block", window = 3, maxDist = 8)
        .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"),
          col("dist"))
        .orderBy("id1", "id2")
    },
    Some {
      import graft.tools.OracleSql._
      s"""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id, text FROM documents
              UNION ALL
              SELECT doc_id::BIGINT + 4000000, text || ' trailing audit suffix'
              FROM documents WHERE doc_id % 9 = 0),
            keyed AS (
              SELECT doc_id, substr(${normalizeSql("text")}, 1, 40) AS key FROM corpus),
            kb AS (SELECT doc_id, key, substr(key, 1, 1) AS block FROM keyed),
            rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY block ORDER BY key, doc_id) AS rn
                   FROM kb)
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
          FROM rk a JOIN rk b
            ON a.block = b.block AND b.rn - a.rn BETWEEN 1 AND 2
          WHERE levenshtein(a.key, b.key) <= 8
          ORDER BY id1, id2"""
    })

  /** Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    * '98) stability audit: every document assigned under 8 and under 9
    * shards by argmax xxhash64(doc_id, shard)
    * ([[graft.text.Sharding.rendezvousShard]], pure map-side), with
    * per-shard counts and moved-in counts. The HRW property the report
    * demonstrates — and the oracle proves value-exactly — is that growing
    * the fleet moves ONLY keys whose argmax is the NEW shard (moved_in = 0
    * for shards 0–7), the incremental-reshard guarantee a 100 TB corpus
    * layout needs. Oracle replays the chained two-argument XXH64 (doc hash
    * seeds the shard hash) over a doc×shard expansion. */
  val q217_rendezvous = Q(
    "q217_rendezvous",
    (s, dir) => {
      import graft.text.Sharding
      val docs = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"))
        .withColumn("s8", Sharding.rendezvousShard(col("doc_id"), 8))
        .withColumn("s9", Sharding.rendezvousShard(col("doc_id"), 9))
      val c8 = docs.groupBy(col("s8").as("shard")).agg(count(lit(1)).as("cnt8"))
      val c9 = docs.groupBy(col("s9").as("shard")).agg(count(lit(1)).as("cnt9"))
      val moved = docs.filter(col("s8") =!= col("s9"))
        .groupBy(col("s9").as("shard")).agg(count(lit(1)).as("moved_in"))
      c9.join(c8, Seq("shard"), "left").join(moved, Seq("shard"), "left")
        .select(col("shard").cast("long").as("shard"),
          coalesce(col("cnt8"), lit(0L)).cast("long").as("cnt8"),
          col("cnt9").cast("long").as("cnt9"),
          coalesce(col("moved_in"), lit(0L)).cast("long").as("moved_in"))
        .orderBy("shard")
    },
    Some {
      import graft.tools.OracleSql._
      val ids = "SELECT doc_id::BIGINT AS doc_id FROM documents"
      val h0s = xxhash64LongStages(ids, "doc_id", "h0", pfx = "__r0")
      val exp = s"SELECT doc_id, h0, s FROM ($h0s), unnest(range(9)) AS u(s)"
      val hs = xxhash64LongStages(exp, "s", "h", pfx = "__r1", seed = unsignedOf("h0"))
      s"""WITH hs AS ($hs),
            a8 AS (SELECT doc_id, s AS s8 FROM (
                     SELECT doc_id, s, ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
                     FROM hs WHERE s < 8) WHERE rn = 1),
            a9 AS (SELECT doc_id, s AS s9 FROM (
                     SELECT doc_id, s, ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
                     FROM hs) WHERE rn = 1),
            j AS (SELECT a9.doc_id, a8.s8, a9.s9 FROM a9 JOIN a8 USING (doc_id)),
            c8 AS (SELECT s8 AS shard, COUNT(*) AS cnt8 FROM j GROUP BY 1),
            c9 AS (SELECT s9 AS shard, COUNT(*) AS cnt9 FROM j GROUP BY 1),
            mv AS (SELECT s9 AS shard, COUNT(*) AS moved_in FROM j WHERE s8 <> s9 GROUP BY 1)
          SELECT CAST(c9.shard AS BIGINT) AS shard,
                 CAST(COALESCE(c8.cnt8, 0) AS BIGINT) AS cnt8,
                 CAST(c9.cnt9 AS BIGINT) AS cnt9,
                 CAST(COALESCE(mv.moved_in, 0) AS BIGINT) AS moved_in
          FROM c9 LEFT JOIN c8 ON c8.shard = c9.shard
          LEFT JOIN mv ON mv.shard = c9.shard
          ORDER BY shard"""
    })


  /** Local-DP randomized response (Warner '65; the RAPPOR-style frequency
    * mechanism) over event types: each row reports its TRUE type when its
    * coin bit is 1, otherwise a hash-chosen type uniform over the k-type
    * vocabulary; the collector sees only the randomized stream and
    * debiases with n̂_v = 2·c_v − N/k, emitted k-SCALED
    * (est_scaled = 2k·c_v − N) so every value is an exact BIGINT. The coin
    * and the replacement draw both derive from xxhash64(event_id) — the
    * DETERMINISTIC stand-in for the PRNG a real deployment uses, which is
    * what lets both engines replay the identical randomized stream
    * (the q135/q169 integer-randomness convention). True counts ride
    * alongside as the fidelity reference. Pure map-side randomization +
    * two k-sized aggregates. */
  val q218_randomized_response = Q(
    "q218_randomized_response",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id").cast("long").as("event_id"), col("event_type"))
      // bounded driver collect: the event-type vocabulary (the q80/q97
      // convention for semantically-forced small sets)
      val types = ev.select(col("event_type")).distinct()
        .orderBy("event_type").collect().map(_.getString(0)).toSeq
      val k = types.length.toLong
      val typesArr = array(types.map(lit): _*)
      val h = xxhash64(col("event_id"))
      val randomized = ev.select(
        col("event_type"),
        when(pmod(h, lit(2L)) === 1L, col("event_type"))
          .otherwise(element_at(typesArr,
            (shiftrightunsigned(h, 1) % k).cast("int") + 1)).as("reported"))
      val rep = randomized.groupBy(col("reported").as("event_type"))
        .agg(count(lit(1)).as("reported_cnt"))
      val tru = randomized.groupBy(col("event_type"))
        .agg(count(lit(1)).as("true_cnt"))
      val total = ev.count()
      tru.join(rep, Seq("event_type"), "left")
        .select(
          col("event_type"),
          coalesce(col("reported_cnt"), lit(0L)).cast("long").as("reported_cnt"),
          col("true_cnt").cast("long").as("true_cnt"),
          (lit(2L * k) * coalesce(col("reported_cnt"), lit(0L)) - lit(total))
            .cast("long").as("est_scaled"))
        .orderBy("event_type")
    },
    Some {
      import graft.tools.OracleSql._
      val base = "SELECT event_id::BIGINT AS event_id, event_type FROM events"
      val hashed = xxhash64LongStages(base, "event_id", "h", pfx = "__p")
      s"""WITH hashed AS ($hashed),
            types AS (SELECT event_type AS t,
                             ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx
                      FROM (SELECT DISTINCT event_type FROM events)),
            kc AS (SELECT COUNT(*)::BIGINT AS k FROM types),
            rnd AS (SELECT ev.event_type,
                           CASE WHEN ${unsignedOf("ev.h")} % 2 = 1 THEN ev.event_type
                                ELSE tt.t END AS reported
                    FROM (SELECT h, event_type,
                                 CAST((${unsignedOf("h")} // 2) % (SELECT k FROM kc) AS BIGINT) AS alt_idx
                          FROM hashed) ev
                    JOIN types tt ON tt.idx = ev.alt_idx),
            rep AS (SELECT reported AS event_type, COUNT(*) AS reported_cnt
                    FROM rnd GROUP BY 1),
            tru AS (SELECT event_type, COUNT(*) AS true_cnt FROM rnd GROUP BY 1),
            n AS (SELECT COUNT(*)::BIGINT AS total FROM events)
          SELECT t.event_type,
                 CAST(COALESCE(r.reported_cnt, 0) AS BIGINT) AS reported_cnt,
                 CAST(t.true_cnt AS BIGINT) AS true_cnt,
                 CAST(2 * kc.k * COALESCE(r.reported_cnt, 0) - n.total AS BIGINT) AS est_scaled
          FROM tru t
          LEFT JOIN rep r ON r.event_type = t.event_type
          CROSS JOIN kc CROSS JOIN n
          ORDER BY t.event_type"""
    })

  /** Bloom-pruned runtime-filter join ([[graft.operators.RuntimeFilter]]):
    * lineitem joined to the suppliers of ONE nation with the fact side
    * pre-pruned map-side by a Bloom filter built over the dim keys — the
    * semi-join reduction that keeps a selective join from shuffling the
    * full fact table (≈ |matching| + fpp·|fact| rows reach the exchange
    * instead of |fact|). Result is EXACTLY the plain join — no false
    * negatives by construction, false positives die in the join — so the
    * oracle IS the plain join, the q105/q116 convention for plan-level
    * operators. */
  val q219_bloom_join = Q(
    "q219_bloom_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"))
      val dim = t(s, dir, "supplier").join(
        t(s, dir, "nation").filter(col("n_name") === "NATION_9"),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
      graft.operators.RuntimeFilter
        .bloomPrunedJoin(li, dim, "l_suppkey", "s_suppkey")
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_9'
            GROUP BY 1, 2 ORDER BY 1"""))

  /** Join-key skew diagnostic (the pre-flight report behind the salted
    * join/agg family q105/q116): per event type, the user_id key
    * distribution's concentration — key count, hottest-key count, top-10
    * mass (via the custom [[graft.operators.TopK]] bounded-heap physical
    * operator), hottest-key share in ppm, and the suggested salt factor
    * ceil(max_cnt · P / total) for P = 32 partitions (how many ways the
    * hottest key must split so no partition exceeds the mean load). All
    * integer; one groupBy + k-sized aggregates. */
  val q220_skew_report = Q(
    "q220_skew_report",
    (s, dir) => {
      val grp = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // feeds both the agg and the TopK operator
      val agg = grp.groupBy(col("event_type"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_cnt"))
      val top10 = graft.operators.TopK
        .perGroup(grp, Seq("event_type"), Seq(("c", false), ("user_id", true)), 10)
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("top10_sum"))
      agg.join(top10, Seq("event_type"))
        .select(
          col("event_type"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_keys").cast("long").as("n_keys"),
          col("max_cnt").cast("long").as("max_cnt"),
          col("top10_sum").cast("long").as("top10_sum"),
          expr("(1000000 * max_cnt) div n_rows").as("top1_share_ppm"),
          expr("(max_cnt * 32 + n_rows - 1) div n_rows").as("suggested_salt"))
        .orderBy("event_type")
    },
    Some("""WITH grp AS (SELECT event_type, user_id, COUNT(*) AS c
                         FROM events GROUP BY 1, 2),
              agg AS (SELECT event_type, SUM(c) AS n_rows, COUNT(*) AS n_keys,
                             MAX(c) AS max_cnt
                      FROM grp GROUP BY 1),
              t10 AS (SELECT event_type, SUM(c) AS top10_sum FROM (
                        SELECT event_type, c, ROW_NUMBER() OVER (
                          PARTITION BY event_type ORDER BY c DESC, user_id) AS rn
                        FROM grp) WHERE rn <= 10 GROUP BY 1)
            SELECT a.event_type,
                   CAST(a.n_rows AS BIGINT) AS n_rows,
                   CAST(a.n_keys AS BIGINT) AS n_keys,
                   CAST(a.max_cnt AS BIGINT) AS max_cnt,
                   CAST(t.top10_sum AS BIGINT) AS top10_sum,
                   CAST((1000000 * a.max_cnt) // a.n_rows AS BIGINT) AS top1_share_ppm,
                   CAST((a.max_cnt * 32 + a.n_rows - 1) // a.n_rows AS BIGINT) AS suggested_salt
            FROM agg a JOIN t10 t USING (event_type)
            ORDER BY a.event_type"""))


  /** Streaming SLIDING-window aggregation (6 h window, 3 h slide — every
    * event lands in exactly 2 overlapping windows), the overlap face of
    * q96's tumbling form: same file stream, AvailableNow drain, complete-
    * mode memory sink. Oracle replays the epoch-aligned window arithmetic
    * (each event expanded to its 2 covering window starts). */
  val q221_stream_sliding = Q(
    "q221_stream_sliding",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q221")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val agg = graft.streaming.StreamOps.windowedAggregate(
        stream, "ts", "6 hours", Some("3 hours"), watermark = "1 hour",
        groupColumns = Seq("event_type"), aggName = "count", valueColumn = "value")
      val qname = s"graft_q221_${q221Runs.incrementAndGet()}"
      val query = scopedStreamStart(s)(agg.writeStream.format("memory").queryName(qname)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname).select(
        col("window.start").cast("long").as("win_start"),
        col("event_type"),
        col("value").cast("long").as("n"))
        .orderBy("win_start", "event_type")
    },
    Some("""SELECT CAST(((epoch_us(ts) // 10800000000) - o.range) * 10800 AS BIGINT) AS win_start,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events CROSS JOIN range(2) o
            GROUP BY 1, 2 ORDER BY 1, 2"""))
  private val q221Runs = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Sweep-line maximum-concurrency profile: per-user 30-min-gap sessions
    * (q58's sessionization) as CLOSED [first-event, last-event] intervals,
    * swept by +1/−1 boundary points — the classic interval-overlap
    * counting operator (ends at an instant release before starts at the
    * same instant claim, i.e. [s, e+1µs) half-open arithmetic). Scale
    * shape: boundary points pre-aggregate to net deltas per DISTINCT
    * instant, so the one unavoidable global-order cumsum runs over
    * distinct boundary instants (≪ events — the q207 vocabulary-sort
    * move). Output: per day, the max concurrent sessions observed at
    * boundary instants that day. */
  val q222_concurrency = Q(
    "q222_concurrency",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sess = graft.time.Sessionize
        .assignSessions(t(s, dir, "events"), "ts", 1800L, Seq("user_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(unix_micros(min(col("ts"))).as("s"),
          (unix_micros(max(col("ts"))) + 1L).as("e"))
      val pts = sess.select(col("s").as("t"), lit(1L).as("d"))
        .unionAll(sess.select(col("e").as("t"), lit(-1L).as("d")))
      val byT = pts.groupBy(col("t")).agg(sum(col("d")).as("net"))
      val cum = byT.withColumn("cc",
        sum(col("net")).over(Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.groupBy(date_format(timestamp_micros(col("t")), "yyyy-MM-dd").as("day"))
        .agg(max(col("cc")).cast("long").as("max_cc"))
        .orderBy("day")
    },
    Some("""WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
                     THEN 1 ELSE 0 END AS is_start
              FROM events),
            sess AS (
              SELECT user_id,
                     SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS sid, ts
              FROM marked),
            iv AS (SELECT user_id, sid, MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) + 1 AS e
                   FROM sess GROUP BY 1, 2),
            pts AS (SELECT s AS t, 1 AS d FROM iv UNION ALL SELECT e, -1 FROM iv),
            byt AS (SELECT t, SUM(d) AS net FROM pts GROUP BY 1),
            cum AS (SELECT t, SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cc
                    FROM byt)
          SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
                 CAST(MAX(cc) AS BIGINT) AS max_cc
          FROM cum GROUP BY 1 ORDER BY 1"""))

  /** Audio near-duplicate detection — the envelope-fingerprint member of
    * the multimodal dedup family (text q29 / image q184 / video q211):
    * real PCM WAV payloads demuxed to exact per-segment energy integers
    * ([[graft.multimodal.Multimodal.audioSegmentEnergies]], map-side),
    * consecutive-segment 2-gram shingles, exact Jaccard via the
    * inverted-index equi-join. The corpus plants a clone (first segment
    * re-recorded) for every 5th clip: 10 of 12 union shingles survive →
    * jaccard 833333 ppm, and every energy is a closed-form function of
    * (id, segment) — the oracle derives all expected pairs from the
    * arithmetic, never touching the codec (codec bugs diverge the hash). */
  val q223_audio_neardup = Q(
    "q223_audio_neardup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val n = 150
      val corpus = Multimodal.syntheticAudioCorpus(s, n)
      val seg = Multimodal.audioSegmentEnergies(corpus, 200)
        .select(col("id"), col("segment_index"), col("energy"))
      val w = Window.partitionBy(col("id")).orderBy(col("segment_index"))
      val sh = seg
        .withColumn("nxt", lead(col("energy"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("id"), (col("energy") * 4194304L + col("nxt")).as("key"))
        .distinct()
        .cache()
      val sz = sh.groupBy(col("id")).agg(count(lit(1)).as("s"))
      val inter = sh.as("x")
        .join(sh.as("y"), col("x.key") === col("y.key") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
      val out = inter
        .join(sz.select(col("id").as("id1"), col("s").as("s1")), "id1")
        .join(sz.select(col("id").as("id2"), col("s").as("s2")), "id2")
        .withColumn("n_union", col("s1") + col("s2") - col("n_shared"))
        .withColumn("jaccard_ppm", expr("(1000000 * n_shared) div n_union"))
        .filter(col("jaccard_ppm") >= 500000)
        .select(col("id1"), col("id2"),
          col("n_shared").cast("long").as("n_shared"),
          col("n_union").cast("long").as("n_union"),
          col("jaccard_ppm").cast("long").as("jaccard_ppm"))
        .orderBy("id1", "id2")
      val materialized = out.localCheckpoint(true)
      sh.unpersist()
      materialized
    },
    Some("""WITH ids AS (
              SELECT range AS id FROM range(150)
              UNION ALL
              SELECT range + 150 FROM range(150) WHERE range % 5 = 0),
            seg AS (
              SELECT i.id, k.range AS k,
                     200 * (CASE WHEN i.id >= 150 AND k.range = 0
                                 THEN 7500 + (i.id - 150) * 16
                                 ELSE 500 + (CASE WHEN i.id >= 150 THEN i.id - 150 ELSE i.id END) * 16 + k.range
                            END) AS energy
              FROM ids i CROSS JOIN range(12) k),
            sh AS (
              SELECT DISTINCT a.id, a.energy * 4194304 + b.energy AS key
              FROM seg a JOIN seg b ON a.id = b.id AND b.k = a.k + 1),
            sz AS (SELECT id, COUNT(*) AS s FROM sh GROUP BY 1),
            inter AS (
              SELECT x.id AS id1, y.id AS id2, COUNT(*) AS n_shared
              FROM sh x JOIN sh y ON x.key = y.key AND x.id < y.id
              GROUP BY 1, 2),
            sc AS (
              SELECT i.id1, i.id2, i.n_shared, s1.s + s2.s - i.n_shared AS n_union
              FROM inter i JOIN sz s1 ON s1.id = i.id1 JOIN sz s2 ON s2.id = i.id2)
          SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
                 CAST(n_shared AS BIGINT) AS n_shared,
                 CAST(n_union AS BIGINT) AS n_union,
                 CAST((1000000 * n_shared) // n_union AS BIGINT) AS jaccard_ppm
          FROM sc WHERE (1000000 * n_shared) // n_union >= 500000
          ORDER BY id1, id2"""))


  /** Price-tier classification via the broadcast interval-lookup join —
    * the SECOND whole-operator Catalyst extension
    * ([[graft.plans.IntervalJoin]]): lineitem prices joined to a table of
    * disjoint [lo, hi) tiers by binary search over the sorted broadcast
    * intervals, O(n log m) where the plan Spark writes for the same
    * `p >= lo AND p < hi` predicate is an O(n·m)
    * BroadcastNestedLoopJoin. Probe-side partitioning is preserved (no
    * shuffle before the aggregate's own exchange); disjointness is
    * validated, not assumed. Oracle = the plain containment join. */
  val q224_interval_lookup = Q(
    "q224_interval_lookup",
    (s, dir) => {
      import s.implicits._
      val tiers = Seq(
        ("budget", 0L, 5000L),
        ("value", 5000L, 15000L),
        ("mid", 15000L, 30000L),
        ("premium", 30000L, 60000L),
        ("luxury", 60000L, 120000L)).toDF("tier", "lo", "hi")
      val probe = t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice")).cast("long").as("price_pt"),
          col("l_quantity"))
      graft.operators.IntervalLookup
        .join(probe, tiers, "price_pt", "lo", "hi")
        .groupBy(col("tier"), col("lo"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(col("tier"), col("lo").cast("long").as("lo"), col("n"), col("sum_qty"))
        .orderBy("lo")
    },
    Some("""WITH tiers(tier, lo, hi) AS (VALUES
              ('budget', 0, 5000), ('value', 5000, 15000), ('mid', 15000, 30000),
              ('premium', 30000, 60000), ('luxury', 60000, 120000))
            SELECT tier, CAST(lo AS BIGINT) AS lo, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem JOIN tiers
              ON FLOOR(l_extendedprice) >= lo AND FLOOR(l_extendedprice) < hi
            GROUP BY 1, 2 ORDER BY lo"""))


  /** Deterministic per-group uniform sample, exactly min(k, n) per source:
    * rows ordered by (xxhash64(id), id) — the engine-replayable stand-in
    * for a uniform draw (the q135/q195 integer-randomness convention) —
    * and cut at k by the custom [[graft.operators.TopK]] bounded-heap
    * physical operator: a per-group reservoir whose shuffle carries at
    * most k rows per group per input partition, no per-group sort. The
    * grouped-sampling shape every eval-set builder needs at corpus scale.
    * Oracle replays the hash order with ROW_NUMBER. */
  val q225_group_sample = Q(
    "q225_group_sample",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id").cast("long").as("doc_id"))
        .withColumn("h", xxhash64(col("doc_id")))
      graft.operators.TopK
        .perGroup(d, Seq("source"), Seq(("h", true), ("doc_id", true)), 20)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")
    },
    Some {
      import graft.tools.OracleSql._
      val base = "SELECT source, doc_id::BIGINT AS doc_id FROM documents"
      val hashed = xxhash64LongStages(base, "doc_id", "h", pfx = "__s")
      s"""SELECT source, doc_id FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
            FROM ($hashed))
          WHERE rn <= 20 ORDER BY source, doc_id"""
    })

  /** Dyadic-EWMA ingest smoothing monitor
    * ([[graft.operators.EventAnalytics.dyadicEwma]]): per event type and
    * day, the 8-day dyadic-weight history sum (weights 128..1, mass 255 —
    * exact BIGINT smoothing, no libm α-powers) with spike/drop flags by
    * cross-multiplication. The SMOOTHER face of the monitor family beside
    * CUSUM (level shifts, q198) and seasonal-naive (periodicity, q172).
    * Only flagged days are reported; full-history days only score. */
  val q226_dyadic_ewma = Q(
    "q226_dyadic_ewma",
    (s, dir) => {
      graft.operators.EventAnalytics
        .dyadicEwma(t(s, dir, "events").select(col("event_type"), col("ts")),
          "event_type", "ts", depth = 8)
        .select(
          col("key").as("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt").cast("long").as("cnt"),
          col("ewma_num").cast("long").as("ewma_num"),
          col("flag"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type AS key, ts::DATE AS day, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            spine AS (
              SELECT k.key, d.day FROM
                (SELECT DISTINCT key FROM daily) k
              CROSS JOIN
                (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
                 FROM bounds) d),
            dense AS (
              SELECT s.key, s.day, COALESCE(dl.n, 0) AS cnt
              FROM spine s LEFT JOIN daily dl ON dl.key = s.key AND dl.day = s.day),
            lagged AS (
              SELECT key, day, cnt,
                     LAG(cnt, 8) OVER w AS oldest,
                     128*LAG(cnt,1) OVER w + 64*LAG(cnt,2) OVER w + 32*LAG(cnt,3) OVER w
                       + 16*LAG(cnt,4) OVER w + 8*LAG(cnt,5) OVER w
                       + 4*LAG(cnt,6) OVER w + 2*LAG(cnt,7) OVER w
                       + LAG(cnt,8) OVER w AS ewma_num
              FROM dense WINDOW w AS (PARTITION BY key ORDER BY day))
          SELECT key AS event_type, strftime(day, '%Y-%m-%d') AS day,
                 CAST(cnt AS BIGINT) AS cnt, CAST(ewma_num AS BIGINT) AS ewma_num,
                 CASE WHEN 255 * cnt > 2 * ewma_num THEN 'spike'
                      WHEN 510 * cnt < ewma_num THEN 'drop'
                      ELSE 'normal' END AS flag
          FROM lagged WHERE oldest IS NOT NULL
          ORDER BY event_type, day"""))

  /** Winsorized robust aggregation: per return flag, prices clamped to the
    * exact rank-based [p10, p90] before summing — the outlier-resistant
    * aggregate that, unlike q162's TRIMMED mean, keeps every row's vote
    * (clamped, not dropped). Percentiles are DISCRETE order statistics
    * (value at rank ceil(q·n) under the price order) — integer-exact and
    * engine-replayable where interpolated quantiles are float territory;
    * prices enter as floor() integer units. Two passes: one window rank,
    * one clamp-and-sum. */
  val q227_winsorize = Q(
    "q227_winsorize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("flag"),
        floor(col("l_extendedprice")).cast("long").as("p"),
        col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("flag")).orderBy(col("p"), col("l_orderkey"), col("l_linenumber"))
      val ranked = li
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("flag"))))
      val pcts = ranked
        .groupBy(col("flag"))
        .agg(
          max(col("n")).as("n"),
          max(when(col("rn") === expr("(n + 9) div 10"), col("p"))).as("p10"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("p"))).as("p90"))
      li.join(pcts, Seq("flag"))
        .select(col("flag"), col("n"), col("p10"), col("p90"),
          least(greatest(col("p"), col("p10")), col("p90")).as("cl"), col("p"))
        .groupBy(col("flag"))
        .agg(
          max(col("n")).cast("long").as("n"),
          max(col("p10")).cast("long").as("p10"),
          max(col("p90")).cast("long").as("p90"),
          sum(col("cl")).cast("long").as("winsorized_sum"),
          sum(col("p")).cast("long").as("raw_sum"))
        .orderBy("flag")
    },
    Some("""WITH li AS (
              SELECT l_returnflag AS flag, CAST(FLOOR(l_extendedprice) AS BIGINT) AS p,
                     l_orderkey, l_linenumber
              FROM lineitem),
            ranked AS (
              SELECT flag, p,
                     ROW_NUMBER() OVER (PARTITION BY flag ORDER BY p, l_orderkey, l_linenumber) AS rn,
                     COUNT(*) OVER (PARTITION BY flag) AS n
              FROM li),
            pcts AS (
              SELECT flag, MAX(n) AS n,
                     MAX(CASE WHEN rn = (n + 9) // 10 THEN p END) AS p10,
                     MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN p END) AS p90
              FROM ranked GROUP BY flag)
          SELECT li.flag, CAST(MAX(pcts.n) AS BIGINT) AS n,
                 CAST(MAX(pcts.p10) AS BIGINT) AS p10,
                 CAST(MAX(pcts.p90) AS BIGINT) AS p90,
                 CAST(SUM(LEAST(GREATEST(li.p, pcts.p10), pcts.p90)) AS BIGINT) AS winsorized_sum,
                 CAST(SUM(li.p) AS BIGINT) AS raw_sum
          FROM li JOIN pcts ON li.flag = pcts.flag
          GROUP BY li.flag ORDER BY li.flag"""))


  /** Guaranteed heavy hitters via Misra–Gries + exact verify
    * ([[graft.operators.Sketches.guaranteedHeavyHitters]]): a planted
    * hot key (every third event) among ~1000 cold keys, k = 16 counters.
    * The one-pass MG summary (a NEW TypedImperativeAggregate with the
    * mergeable-summaries merge rule) bounds memory at k counters where a
    * full groupBy histograms every key; the exact verify of its ≤ k
    * candidates makes the output the EXACT set above N/(k+1) —
    * deterministic despite MG's order-dependent counters. Oracle = the
    * plain threshold aggregation. */
  val q228_misra_gries = Q(
    "q228_misra_gries",
    (s, dir) => {
      val keyed = t(s, dir, "events").select(
        when(col("user_id") % 3 === 0, 7L)
          .otherwise(lit(1000L) + pmod(col("user_id"), lit(997L))).as("k"))
      graft.operators.Sketches.guaranteedHeavyHitters(keyed, col("k"), 16)
        .select(col("key").cast("long").as("key"),
          col("exact").cast("long").as("exact"),
          col("total_n").cast("long").as("total_n"))
        .orderBy("key")
    },
    Some("""WITH keyed AS (
              SELECT CASE WHEN user_id % 3 = 0 THEN 7
                          ELSE 1000 + ((user_id % 997) + 997) % 997 END AS k
              FROM events),
            n AS (SELECT COUNT(*)::BIGINT AS total FROM keyed)
          SELECT CAST(k AS BIGINT) AS key, CAST(COUNT(*) AS BIGINT) AS exact,
                 CAST(MAX(n.total) AS BIGINT) AS total_n
          FROM keyed CROSS JOIN n
          GROUP BY k HAVING COUNT(*) * 17 > MAX(n.total)
          ORDER BY key"""))


  /** TextTiling-style topic segmentation (Hearst CL'97, integerized —
    * [[graft.text.TextFunctions.topicBoundaries]]): per document, w=10
    * token blocks, adjacent-block multiset-overlap similarity per gap,
    * boundary = strict local minimum below the per-doc median (med2
    * integer-median gate). Every 6th document gets a 40-token second
    * topic appended (disjoint vocabulary), planting a deep valley at the
    * junction the detector must find. Oracle replays the full block/gap/
    * median arithmetic in SQL — token equality only, no hashing needed. */
  val q229_topic_segments = Q(
    "q229_topic_segments",
    (s, dir) => {
      val topic2 = Seq.fill(8)("reactor turbine coolant valve inspection").mkString(" ")
      val corpus = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"),
        when(col("doc_id") % 6 === 0, concat(col("text"), lit(" " + topic2)))
          .otherwise(col("text")).as("text"))
      TextFunctions.topicBoundaries(corpus, "doc_id", "text", w = 10)
        .select(col("doc_id"),
          col("n_gaps").cast("long").as("n_gaps"),
          col("n_boundaries").cast("long").as("n_boundaries"),
          col("deepest_gap").cast("long").as("deepest_gap"),
          col("min_sim").cast("long").as("min_sim"))
        .orderBy("doc_id")
    },
    Some {
      import graft.tools.OracleSql._
      val topic2 = Seq.fill(8)("reactor turbine coolant valve inspection").mkString(" ")
      s"""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                     CASE WHEN doc_id % 6 = 0 THEN text || ' $topic2' ELSE text END AS text
              FROM documents),
            d AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(${normalizeSql("text")}), '\\s+'),
                                 t -> len(t) > 0) AS toks
              FROM corpus),
            pos AS (
              SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) - 1 AS p0, len(toks) AS L
              FROM d),
            blocked AS (
              SELECT doc_id, p0 // 10 AS blk, tok, L // 10 AS nblk
              FROM pos WHERE p0 < (L // 10) * 10),
            bc AS (
              SELECT doc_id, blk, tok, COUNT(*) AS c, MAX(nblk) AS nblk
              FROM blocked GROUP BY 1, 2, 3),
            sims AS (
              SELECT l.doc_id, r.blk AS g, SUM(LEAST(l.c, r.c)) AS sim
              FROM bc l JOIN bc r
                ON l.doc_id = r.doc_id AND l.tok = r.tok AND r.blk = l.blk + 1
              GROUP BY 1, 2),
            spine AS (
              SELECT doc_id, unnest(range(1, nblk)) AS g
              FROM (SELECT doc_id, MAX(nblk) AS nblk FROM bc GROUP BY 1)
              WHERE nblk >= 2),
            dense AS (
              SELECT s.doc_id, s.g, COALESCE(si.sim, 0) AS sim
              FROM spine s LEFT JOIN sims si ON si.doc_id = s.doc_id AND si.g = s.g),
            scored AS (
              SELECT doc_id, g, sim,
                     COUNT(*) OVER (PARTITION BY doc_id) AS m,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sim, g) AS rk,
                     COALESCE(LAG(sim) OVER (PARTITION BY doc_id ORDER BY g),
                              9223372036854775807) AS prv,
                     COALESCE(LEAD(sim) OVER (PARTITION BY doc_id ORDER BY g),
                              9223372036854775807) AS nxt
              FROM dense),
            med AS (
              SELECT doc_id,
                     MAX(CASE WHEN rk = (m + 1) // 2 THEN sim END) +
                       MAX(CASE WHEN rk = (m + 2) // 2 THEN sim END) AS med2
              FROM scored GROUP BY 1)
          SELECT s.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(CASE WHEN s.sim < s.prv AND s.sim < s.nxt
                                AND 2 * s.sim < md.med2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
                 CAST(MAX(CASE WHEN s.rk = 1 THEN s.g END) AS BIGINT) AS deepest_gap,
                 CAST(MIN(s.sim) AS BIGINT) AS min_sim
          FROM scored s JOIN med md ON md.doc_id = s.doc_id
          GROUP BY s.doc_id ORDER BY s.doc_id"""
    })


  /** The textbook window top-k spelling, silently planned as the custom
    * bounded-heap operator: with `spark.graft.topk.rewriteWindow` on, the
    * opt-in optimizer rule
    * [[graft.plans.TopKPerGroup.RewriteRowNumberTopK]] rewrites
    * `row_number() OVER (PARTITION BY order ORDER BY price DESC, line)
    * <= 2` + rank-drop into TopKPerGroupNode — the user keeps the
    * idiomatic query, the plan loses its full shuffle + per-group sort
    * (≤ k rows per group per partition cross one exchange). The window
    * order here is TOTAL (linenumber breaks price ties), which is the
    * contract the conf asserts. Values must equal the window form
    * exactly — the oracle IS the window replay. */
  val q230_window_topk_rewrite = Q(
    "q230_window_topk_rewrite",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val prev = s.conf.getOption("spark.graft.topk.rewriteWindow")
      s.conf.set("spark.graft.topk.rewriteWindow", "true")
      try {
        val li = t(s, dir, "lineitem")
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
        val top2 = li
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("l_orderkey"), col("l_extendedprice"))
        val out = top2
          .groupBy(col("l_orderkey").cast("long").as("l_orderkey"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(sum(col("l_extendedprice")), 2).as("top2_sum"))
          .orderBy("l_orderkey")
        // materialize under the conf scope — the rewrite fires at
        // optimization time, which localCheckpoint forces here
        out.localCheckpoint(true)
      } finally {
        prev match {
          case Some(v) => s.conf.set("spark.graft.topk.rewriteWindow", v)
          case None => s.conf.unset("spark.graft.topk.rewriteWindow")
        }
      }
    },
    Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_extendedprice), 2) AS top2_sum
            FROM (
              SELECT l_orderkey, l_extendedprice,
                     ROW_NUMBER() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_linenumber) AS rn
              FROM lineitem)
            WHERE rn <= 2
            GROUP BY 1 ORDER BY 1"""))


  /** The custom interval-lookup physical operator under STREAMING: a file
    * stream of events drained in micro-batches (maxFilesPerTrigger=1 over
    * a 4-file split), each batch enriched against the static tier table
    * via [[graft.operators.IntervalLookup]] inside foreachBatch and
    * upserted to its own `batch=<id>` directory (the q190 idempotent-sink
    * shape — a retry rewrites its own dir); the serving read sums the
    * per-batch partials. Per-batch aggregation + integer value sums make
    * the result independent of how files split into batches. Oracle = the
    * batch containment join. */
  val q231_stream_interval = Q(
    "q231_stream_interval",
    (s, dir) => {
      import s.implicits._
      val tiers = Seq(("low", 0L, 50L), ("mid", 50L, 150L),
        ("high", 150L, 300L), ("peak", 300L, 100000L)).toDF("tier", "lo", "hi")
      val inDir = java.nio.file.Files.createTempDirectory("graft-q231-in").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-q231-out").toString
      t(s, dir, "events").select(col("event_id"), col("value"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val schema = s.read.parquet(inDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val query = scopedStreamStart(s)(stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val pts = batch.select(floor(col("value")).cast("long").as("pt"))
          graft.operators.IntervalLookup.join(pts, tiers, "pt", "lo", "hi")
            .groupBy(col("tier"))
            .agg(count(lit(1)).as("n"), sum(col("pt")).as("fv"))
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      s.read.parquet(outDir)
        .groupBy(col("tier"))
        .agg(sum(col("n")).cast("long").as("n_events"),
          sum(col("fv")).cast("long").as("sum_fv"))
        .orderBy("tier")
    },
    Some("""WITH tiers(tier, lo, hi) AS (VALUES
              ('low', 0, 50), ('mid', 50, 150), ('high', 150, 300), ('peak', 300, 100000))
            SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_fv
            FROM events JOIN tiers
              ON FLOOR(value) >= lo AND FLOOR(value) < hi
            GROUP BY 1 ORDER BY tier"""))

  /** Trapezoidal time-weighted integration of an irregular series: per
    * user, Σ gap_µs · (v_i + v_{i+1}) over consecutive events under the
    * (ts, event_id) total order — twice the trapezoid integral, kept
    * UNDIVIDED and in integer cents so every value is an exact BIGINT
    * (values sampled at irregular times make the plain AVG meaningless —
    * this is the operator metering/billing pipelines actually need).
    * Overflow-safe by telescoping: Σ gaps = the user's span, so the sum
    * is bounded by span_µs · 2·max_cents regardless of event count. One
    * user-keyed window shuffle. */
  val q232_time_weighted = Q(
    "q232_time_weighted",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("t"),
        col("event_id").cast("long").as("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      ev
        .withColumn("pt", lag(col("t"), 1).over(w))
        .withColumn("pc", lag(col("cents"), 1).over(w))
        .filter(col("pt").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          (count(lit(1)) + 1).cast("long").as("n_events"),
          (max(col("t")) - min(col("pt"))).cast("long").as("span_us"),
          sum((col("t") - col("pt")) * (col("cents") + col("pc"))).cast("long").as("integral2"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_us(ts) AS t, event_id,
                     CAST(FLOOR(value * 100) AS BIGINT) AS cents
              FROM events),
            lagged AS (
              SELECT user_id, t, cents,
                     LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt,
                     LAG(cents) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pc
              FROM ev)
          SELECT CAST(user_id AS BIGINT) AS user_id,
                 CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
                 CAST(MAX(t) - MIN(pt) AS BIGINT) AS span_us,
                 CAST(SUM((t - pt) * (cents + pc)) AS BIGINT) AS integral2
          FROM lagged WHERE pt IS NOT NULL
          GROUP BY user_id ORDER BY user_id"""))


  /** The custom DataSource V2 fixed-width source end-to-end
    * ([[graft.sources.fixedwidth.FixedWidthSource]] — schema from the
    * `fields` option, byte-level column pruning, scan-side comparison
    * pushdown with Spark re-checking the residuals): supplier exported to
    * fixed-width lines (the mainframe interchange layout), read back
    * through `.format("graft-fixedwidth")`, filtered and aggregated. The
    * oracle computes the same report from the ORIGINAL table — the
    * round-trip through format/parse plus the pushdown path must be
    * value-invisible. */
  val q233_fixedwidth_source = Q(
    "q233_fixedwidth_source",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val out = java.nio.file.Files.createTempDirectory("graft-q233").toString
      sup.select(format_string("%10d%6d%14d%-30s",
          col("s_suppkey").cast("long"), col("s_nationkey").cast("long"),
          floor(col("s_acctbal") * 100).cast("long"), col("s_name")).as("value"))
        .write.mode("overwrite").text(out)
      s.read.format("graft-fixedwidth")
        .option("fields", "suppkey:10:long,nkey:6:long,balc:14:long,name:30:string")
        .load(out)
        .filter(col("nkey") < 8)
        .groupBy(col("nkey"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("balc")).cast("long").as("sum_balc"),
          max(col("name")).as("max_name"))
        .orderBy("nkey")
    },
    Some("""SELECT CAST(s_nationkey AS BIGINT) AS nkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_balc,
                   MAX(s_name) AS max_name
            FROM supplier WHERE s_nationkey < 8
            GROUP BY 1 ORDER BY 1"""))


  /** The DSv2 source's WRITE side closing the loop: part rows exported
    * through `.write.format("graft-fixedwidth")` (per-task append
    * writers, left/right slot padding — the exact inverse of the reader's
    * trim, over-wide values refused), read back through the same source
    * with a pushed filter, and aggregated. Oracle = the same report from
    * the original table; the full write→read cycle must be
    * value-invisible. */
  val q234_fixedwidth_write = Q(
    "q234_fixedwidth_write",
    (s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-q234").toString + "/part_fw"
      val fieldsOpt = "partkey:10:long,size:6:long,retailc:14:long,brand:12:string"
      t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("partkey"),
          col("p_size").cast("long").as("size"),
          floor(col("p_retailprice") * 100).cast("long").as("retailc"),
          col("p_brand").as("brand"))
        .write.format("graft-fixedwidth").option("fields", fieldsOpt)
        .mode("append").save(out)
      s.read.format("graft-fixedwidth").option("fields", fieldsOpt).load(out)
        .filter(col("size") <= 25)
        .groupBy(col("brand"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("retailc")).cast("long").as("sum_retailc"),
          max(col("partkey")).cast("long").as("max_partkey"))
        .orderBy("brand")
    },
    Some("""SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_retailc,
                   CAST(MAX(p_partkey) AS BIGINT) AS max_partkey
            FROM part WHERE p_size <= 25
            GROUP BY 1 ORDER BY 1"""))


  /** DSv2 aggregate pushdown over the fixed-width source: ungrouped
    * COUNT(*)/MIN/MAX fold INSIDE the scan (one partial row per file
    * reaches Spark's final merge — `SupportsPushDownAggregates`, the
    * contract that turns a table-stat query over a 100 TB export into a
    * metadata-speed pass). The spec pins the partial-push plan shape;
    * here the values must equal the same stats computed from the original
    * table. */
  val q235_fixedwidth_agg_push = Q(
    "q235_fixedwidth_agg_push",
    (s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-q235").toString + "/ev_fw"
      val fieldsOpt = "event_id:12:long,user_id:10:long"
      t(s, dir, "events")
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"))
        .write.format("graft-fixedwidth").option("fields", fieldsOpt)
        .mode("append").save(out)
      s.read.format("graft-fixedwidth").option("fields", fieldsOpt).load(out)
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("event_id")).cast("long").as("min_event"),
          max(col("event_id")).cast("long").as("max_event"),
          max(col("user_id")).cast("long").as("max_user"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(event_id) AS BIGINT) AS min_event,
                   CAST(MAX(event_id) AS BIGINT) AS max_event,
                   CAST(MAX(user_id) AS BIGINT) AS max_user
            FROM events"""))

  /** Skip-gram training-pair generation (word2vec/SGNS data prep,
    * Mikolov '13): per document, (center, context) pairs within a ±2
    * token window plus one hash-drawn negative context per pair — the
    * deterministic stand-in for unigram negative sampling, keyed on
    * (doc, position, offset) so both engines draw the identical negative
    * (the q135/q169 integer-randomness convention). The report aggregates
    * per offset: pair volume, distinct centers, self-cooccurrence count,
    * and the negative-index checksum. One posexplode + 4 window LEADs/
    * LAGs; the only driver scalar is the vocabulary size (the negative
    * draw's modulus). */
  val q236_skipgram_pairs = Q(
    "q236_skipgram_pairs",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          posexplode(array_compact(TextFunctions.tokens(TextFunctions.normalize(col("text")))))
            .as(Seq("p", "tok")))
      // negatives are drawn as vocabulary INDICES — only the modulus (the
      // vocabulary size) is needed, a single bounded scalar
      val vocabSize = toks.select(col("tok")).distinct().count()
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val withCtx = toks
        .withColumn("m2", lag(col("tok"), 2).over(w))
        .withColumn("m1", lag(col("tok"), 1).over(w))
        .withColumn("p1", lead(col("tok"), 1).over(w))
        .withColumn("p2", lead(col("tok"), 2).over(w))
      val pairs = withCtx.select(col("doc_id"), col("p"), col("tok"),
        explode(array(
          struct(lit(-2L).as("off"), col("m2").as("ctx")),
          struct(lit(-1L).as("off"), col("m1").as("ctx")),
          struct(lit(1L).as("off"), col("p1").as("ctx")),
          struct(lit(2L).as("off"), col("p2").as("ctx")))).as("c"))
        .select(col("doc_id"), col("p"), col("tok"),
          col("c.off").as("off"), col("c.ctx").as("ctx"))
        .filter(col("ctx").isNotNull)
        .withColumn("neg_idx",
          pmod(xxhash64(col("doc_id") * 1048576L + col("p") * 8L + (col("off") + 4L)),
            lit(vocabSize)))
      pairs.groupBy(col("off"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          countDistinct(col("tok")).cast("long").as("distinct_centers"),
          sum(when(col("tok") === col("ctx"), 1L).otherwise(0L)).cast("long").as("self_pairs"),
          sum(col("neg_idx")).cast("long").as("neg_checksum"))
        .orderBy("off")
    },
    Some {
      import graft.tools.OracleSql._
      val toks =
        s"""SELECT doc_id::BIGINT AS doc_id, unnest(toks) AS tok,
                   generate_subscripts(toks, 1) - 1 AS p
            FROM (SELECT doc_id,
                    list_filter(regexp_split_to_array(trim(${normalizeSql("text")}), '\\s+'),
                                t -> len(t) > 0) AS toks
                  FROM documents)"""
      val pairsRel =
        s"""SELECT doc_id, p, tok, off, ctx,
                   doc_id * 1048576 + p * 8 + (off + 4) AS negkey
            FROM (
              SELECT doc_id, p, tok, u.off,
                     CASE u.off
                       WHEN -2 THEN LAG(tok, 2) OVER w WHEN -1 THEN LAG(tok, 1) OVER w
                       WHEN 1 THEN LEAD(tok, 1) OVER w ELSE LEAD(tok, 2) OVER w END AS ctx
              FROM tk CROSS JOIN (SELECT unnest([-2, -1, 1, 2]) AS off) u
              WINDOW w AS (PARTITION BY doc_id, u.off ORDER BY p))
            WHERE ctx IS NOT NULL"""
      val hashed = xxhash64LongStages("SELECT * FROM pairs_rel", "negkey", "h", pfx = "__n")
      s"""WITH tk AS ($toks),
            vs AS (SELECT COUNT(DISTINCT tok)::BIGINT AS v FROM tk),
            pairs_rel AS ($pairsRel),
            hashed AS ($hashed),
            neg AS (SELECT hashed.*, ((h % (SELECT v FROM vs)) + (SELECT v FROM vs)) % (SELECT v FROM vs) AS neg_idx
                    FROM hashed)
          SELECT CAST(off AS BIGINT) AS off,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(COUNT(DISTINCT tok) AS BIGINT) AS distinct_centers,
                 CAST(SUM(CASE WHEN tok = ctx THEN 1 ELSE 0 END) AS BIGINT) AS self_pairs,
                 CAST(SUM(neg_idx) AS BIGINT) AS neg_checksum
          FROM neg GROUP BY 1 ORDER BY 1"""
    })


  /** Trainable integer Naive Bayes source classifier over hashed features
    * — the LEARNED counterpart of q205's fixed-ramp gate: multinomial NB
    * with the hashing trick (1024 buckets), an 80/20 hash split, and ALL
    * likelihood arithmetic in floor-log2 (`length(bin(x)) − 1` — the
    * bit-stable integer logarithm of q90/q178; real NB log-probs are libm
    * territory and flap across engines). Score(d, c) =
    * Σ_b cnt_b·flog2(n(c,b)+1) − T_d·flog2(N_c+1) + flog2(D_c+1), where
    * flog2 is the 1/16-resolution fixed-point log2 (16·msb + mantissa
    * nibble — exact in both engines; unit-step flog2 drowned the evidence
    * in quantization noise); prediction = argmax with (score desc, class)
    * tie order. The watermarked half of the test split classifies near-
    * perfectly, the unwatermarked half sits at the 1/C floor — overall
    * ≈ 51 % vs the 5 % random baseline. Scale shape:
    * the model is a ≤ classes×buckets count table (broadcast side), test
    * docs reduce to (doc, bucket, cnt) before any join, and the
    * doc×class spine is |test|×C rows. Output: per-class test accuracy. */
  val q237_naive_bayes = Q(
    "q237_naive_bayes",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // every even doc carries a class-pure watermark token — the planted
      // learnable signal (the synthetic sources are otherwise vocabulary-
      // indistinguishable and ANY classifier sits at the 1/C floor); the
      // model must still LEARN the association from the train split
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          when(col("doc_id") % 2 === 0,
            concat(col("text"),
              lit(" beacon"), col("source"), lit(" beacon"), col("source"),
              lit(" beacon"), col("source")))
            .otherwise(col("text")).as("text"))
        .withColumn("is_test", pmod(xxhash64(col("doc_id")), lit(5L)) === 0L)
      val toks = docs.select(col("doc_id"), col("source"), col("is_test"),
          explode(array_compact(TextFunctions.tokens(TextFunctions.normalize(col("text"))))).as("tok"))
        .withColumn("b", pmod(xxhash64(col("tok")), lit(1024L)))
        .localCheckpoint(true) // feeds model AND scoring
      // fixed-point log2 with 1/16 resolution: 16·msb + mantissa-nibble —
      // the flog2 idiom (bit-stable across engines) at the precision a
      // working classifier needs (unit-step flog2 quantization noise
      // across ~100 shared-vocabulary tokens swamps any single-token
      // evidence; at 1/16 steps the shared terms cancel and evidence wins)
      def flog2(c: Column): Column = {
        val msb = (length(bin(c)) - 1).cast("int")
        // (c·16) / 2^msb: division by a power of two is EXACT in doubles
        // for c·16 < 2^53, so floor() is the integer // both engines agree on
        val nibble = floor(c.cast("double") * 16d / pow(lit(2.0), msb.cast("double")))
        (lit(16L) * msb - 16L + nibble.cast("long")).cast("long")
      }
      val model = toks.filter(!col("is_test"))
        .groupBy(col("source").as("c"), col("b"))
        .agg(count(lit(1)).as("n"))
        .withColumn("term", flog2(col("n") + 1))
      val classStats = toks.filter(!col("is_test"))
        .groupBy(col("source").as("c"))
        .agg(count(lit(1)).as("ntok"))
        .join(docs.filter(!col("is_test")).groupBy(col("source").as("c"))
          .agg(count(lit(1)).as("ndoc")), Seq("c"))
        .select(col("c"), flog2(col("ntok") + 1).as("flog_ntok"),
          flog2(col("ndoc") + 1).as("flog_ndoc"))
      val testBuckets = toks.filter(col("is_test"))
        .groupBy(col("doc_id"), col("b"))
        .agg(count(lit(1)).as("cnt"))
      val part1 = testBuckets.join(model, Seq("b"))
        .groupBy(col("doc_id"), col("c"))
        .agg(sum(col("cnt") * col("term")).as("s1"))
      val testDocs = toks.filter(col("is_test"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("td"))
      val spine = testDocs.crossJoin(classStats)
      val scored = spine.join(part1, Seq("doc_id", "c"), "left")
        .withColumn("score",
          coalesce(col("s1"), lit(0L)) - col("td") * col("flog_ntok") + col("flog_ndoc"))
      val predicted = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("c"))))
        .filter(col("rn") === 1)
      predicted.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_test"),
          sum(when(col("c") === col("source"), 1L).otherwise(0L)).cast("long").as("n_correct"))
        .orderBy("source")
    },
    Some {
      import graft.tools.OracleSql._
      val split = xxhash64LongStages(
        """SELECT doc_id::BIGINT AS doc_id, source,
                  CASE WHEN doc_id % 2 = 0
                       THEN text || repeat(' beacon' || source, 3)
                       ELSE text END AS text
           FROM documents""", "doc_id", "dh", pfx = "__d")
      val toks =
        s"""SELECT doc_id, source, is_test, unnest(toks) AS tok
            FROM (SELECT doc_id, source, is_test,
                    list_filter(regexp_split_to_array(trim(${normalizeSql("text")}), '\\s+'),
                                t -> len(t) > 0) AS toks
                  FROM docs)"""
      val hashedTok = xxhash64Stages("SELECT DISTINCT tok FROM tk0", "tok", "th", pfx = "__t")
      s"""WITH hashed_docs AS ($split),
            docs AS (SELECT doc_id, source, text,
                            ((dh % 5) + 5) % 5 = 0 AS is_test
                     FROM hashed_docs),
            tk0 AS ($toks),
            ht AS ($hashedTok),
            tk AS (SELECT tk0.doc_id, tk0.source, tk0.is_test,
                          ((ht.th % 1024) + 1024) % 1024 AS b
                   FROM tk0 JOIN ht USING (tok)),
            model AS (SELECT source AS c, b, COUNT(*) AS n,
                             (16 * (length(bin(COUNT(*) + 1)) - 1) - 16 + ((COUNT(*) + 1) * 16) // (1::BIGINT << (length(bin(COUNT(*) + 1)) - 1))) AS term
                      FROM tk WHERE NOT is_test GROUP BY 1, 2),
            cstats AS (SELECT t.c, (16 * (length(bin(t.ntok + 1)) - 1) - 16 + ((t.ntok + 1) * 16) // (1::BIGINT << (length(bin(t.ntok + 1)) - 1))) AS flog_ntok,
                              (16 * (length(bin(d.ndoc + 1)) - 1) - 16 + ((d.ndoc + 1) * 16) // (1::BIGINT << (length(bin(d.ndoc + 1)) - 1))) AS flog_ndoc
                       FROM (SELECT source AS c, COUNT(*) AS ntok FROM tk
                             WHERE NOT is_test GROUP BY 1) t
                       JOIN (SELECT source AS c, COUNT(*) AS ndoc FROM docs
                             WHERE NOT is_test GROUP BY 1) d USING (c)),
            tb AS (SELECT doc_id, b, COUNT(*) AS cnt FROM tk WHERE is_test GROUP BY 1, 2),
            p1 AS (SELECT tb.doc_id, model.c, SUM(tb.cnt * model.term) AS s1
                   FROM tb JOIN model USING (b) GROUP BY 1, 2),
            td AS (SELECT doc_id, source, COUNT(*) AS td FROM tk WHERE is_test GROUP BY 1, 2),
            scored AS (SELECT td.doc_id, td.source, cs.c,
                              COALESCE(p1.s1, 0) - td.td * cs.flog_ntok + cs.flog_ndoc AS score
                       FROM td CROSS JOIN cstats cs
                       LEFT JOIN p1 ON p1.doc_id = td.doc_id AND p1.c = cs.c),
            pred AS (SELECT * FROM (
                       SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, c) AS rn
                       FROM scored) WHERE rn = 1)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_test,
                 CAST(SUM(CASE WHEN c = source THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
          FROM pred GROUP BY 1 ORDER BY 1"""
    })


  /** Single-pass pipeline telemetry via Spark's Observation API: a
    * quality-gate filter instrumented with `Dataset.observe` metrics
    * (rows in, null texts, total chars) that are collected DURING the one
    * action — no second audit pass over the corpus, which at 100 TB is
    * the difference between metrics-for-free and a doubled bill. The
    * observed values join the gate's own output into one report; the
    * oracle recomputes both sides as plain aggregates. */
  val q238_observed_metrics = Q(
    "q238_observed_metrics",
    (s, dir) => {
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation(
        s"graft_q238_${q238Runs.incrementAndGet()}")
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .observe(obs,
          count(lit(1)).as("rows_in"),
          sum(when(col("text").isNull || col("text") === "", 1L).otherwise(0L)).as("empty_texts"),
          sum(length(coalesce(col("text"), lit("")))).as("total_chars"))
        .filter(length(col("text")) >= 200)
      val kept = d.count()
      val m = obs.get
      Seq((m("rows_in").asInstanceOf[Long], m("empty_texts").asInstanceOf[Long],
        m("total_chars").asInstanceOf[Long], kept))
        .toDF("rows_in", "empty_texts", "total_chars", "rows_kept")
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS rows_in,
                   CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS empty_texts,
                   CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars,
                   CAST(SUM(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS rows_kept
            FROM documents"""))
  private val q238Runs = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Right-to-be-forgotten propagation: a tombstone set (every 13th user)
    * cascaded through the raw events AND two derived artifacts — the
    * per-user daily rollup and the HLL-register sketch table — with a
    * per-artifact before/after/leak report. The sketch artifact is the
    * interesting case: HLL registers cannot subtract, so the deletion
    * contract is REBUILD-from-surviving-rows (the GDPR reality for
    * non-invertible summaries, stated loudly rather than papered over);
    * leak counts prove absence by anti-join, not by trust. Deletes are
    * broadcast anti-joins — delta-sized, never a corpus shuffle. */
  val q239_forget_flow = Q(
    "q239_forget_flow",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id").cast("long").as("user_id"),
        col("event_id"), col("ts"))
      val tomb = ev.select(col("user_id")).distinct().filter(col("user_id") % 13 === 0)
      val rollup = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val evAfter = ev.join(broadcast(tomb), Seq("user_id"), "left_anti")
      val rollupAfter = rollup.join(broadcast(tomb), Seq("user_id"), "left_anti")
      import graft.operators.Sketches
      val regsBefore = Sketches.hllRegisters(ev, Nil, xxhash64(col("user_id")), p = 8)
      val regsAfter = Sketches.hllRegisters(evAfter, Nil, xxhash64(col("user_id")), p = 8)
      val report = Seq(
        ("events", ev.count(), evAfter.count(),
          evAfter.join(broadcast(tomb), Seq("user_id"), "left_semi").count()),
        ("daily_rollup", rollup.count(), rollupAfter.count(),
          rollupAfter.join(broadcast(tomb), Seq("user_id"), "left_semi").count()),
        ("hll_registers", regsBefore.count(), regsAfter.count(), 0L))
      import s.implicits._
      report.toDF("artifact", "rows_before", "rows_after", "leaked")
        .select(col("artifact"),
          col("rows_before").cast("long").as("rows_before"),
          col("rows_after").cast("long").as("rows_after"),
          col("leaked").cast("long").as("leaked"))
        .orderBy("artifact")
    },
    Some {
      import graft.tools.OracleSql._
      // the register-table row counts replay through the fixed-8-byte
      // XXH64 stages: count of distinct occupied register indices
      val keysB = "SELECT DISTINCT user_id FROM events"
      val keysA = "SELECT DISTINCT user_id FROM events WHERE user_id % 13 <> 0"
      val hb = xxhash64LongStages(keysB, "user_id", "kh", pfx = "__fb")
      val ha = xxhash64LongStages(keysA, "user_id", "kh", pfx = "__fa")
      def regs(h: String): String =
        s"""SELECT COUNT(DISTINCT CASE WHEN kh < 0
                     THEN (kh::HUGEINT + 18446744073709551616::HUGEINT) % 256
                     ELSE kh::HUGEINT % 256 END) FROM ($h)"""
      s"""SELECT 'daily_rollup' AS artifact,
                 (SELECT COUNT(*) FROM (SELECT user_id, ts::DATE, COUNT(*) FROM events GROUP BY 1, 2))::BIGINT AS rows_before,
                 (SELECT COUNT(*) FROM (SELECT user_id, ts::DATE, COUNT(*) FROM events WHERE user_id % 13 <> 0 GROUP BY 1, 2))::BIGINT AS rows_after,
                 0::BIGINT AS leaked
          UNION ALL
          SELECT 'events',
                 (SELECT COUNT(*) FROM events)::BIGINT,
                 (SELECT COUNT(*) FROM events WHERE user_id % 13 <> 0)::BIGINT,
                 0::BIGINT
          UNION ALL
          SELECT 'hll_registers', (${regs(hb)})::BIGINT, (${regs(ha)})::BIGINT, 0::BIGINT
          ORDER BY artifact"""
    })

  /** Corpus growth / novelty curve by ingest day: distinct 3-gram hashes
    * attributed to their FIRST-seen day (one min-aggregate over hashed
    * grams — no join back, no re-scan), with per-day new-gram counts and
    * the cumulative vocabulary curve — the dataset-accounting artifact
    * behind "is more crawl still adding content?". Ingest day is the
    * deterministic doc_id mod 7. Gram hashing rides the map-side
    * [[graft.plans.XxHash64Array]] expression; only (hash, day) pairs
    * shuffle. */
  val q240_growth_curve = Q(
    "q240_growth_curve",
    (s, dir) => {
      import org.apache.spark.sql.graft.ExprColumn
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .select((col("doc_id") % 7).cast("long").as("day"),
          TextFunctions.tokens(TextFunctions.normalize(col("text"))).as("toks"))
        .filter(size(col("toks")) >= 3)
      val grams = d.select(col("day"),
        explode(ExprColumn(graft.plans.WindowHash64(ExprColumn.expr(col("toks")), 3))).as("g"))
      val firstSeen = grams.groupBy(col("g")).agg(min(col("day")).as("first_day"))
      val daily = firstSeen.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_grams"))
      daily
        .withColumn("cumulative",
          sum(col("new_grams")).over(Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("day"), col("new_grams").cast("long").as("new_grams"),
          col("cumulative").cast("long").as("cumulative"))
        .orderBy("day")
    },
    Some {
      import graft.tools.OracleSql._
      val B = BigInt("9E3779B97F4A7C15", 16)
      val M = BigInt(2).pow(64)
      val b2 = (B * B).mod(M)
      val toked =
        s"""SELECT doc_id::BIGINT AS doc_id, doc_id % 7 AS day,
                   list_filter(regexp_split_to_array(trim(${normalizeSql("text")}), '\\s+'),
                               t -> len(t) > 0) AS toks
            FROM documents"""
      val tk =
        s"""SELECT doc_id, day, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
            FROM ($toked) WHERE len(toks) >= 3"""
      val hd = xxhash64Stages("SELECT DISTINCT tok FROM tk", "tok", "th", pfx = "__g")
      val wu = addModSql(addModSql(mulConstSql("u0", b2), mulConstSql("u1", B)), "u2")
      s"""WITH tk AS ($tk),
            hd AS ($hd),
            hu AS (SELECT tk.doc_id, tk.day, tk.p, ${unsignedOf("hd.th")} AS u
                   FROM tk JOIN hd USING (tok)),
            w3 AS (SELECT doc_id, day, p, u AS u0,
                          LEAD(u, 1) OVER (PARTITION BY doc_id ORDER BY p) AS u1,
                          LEAD(u, 2) OVER (PARTITION BY doc_id ORDER BY p) AS u2
                   FROM hu),
            hw AS (SELECT day, $wu AS gu FROM w3 WHERE u2 IS NOT NULL),
            hs AS (SELECT day,
                          CASE WHEN gu >= 9223372036854775808
                               THEN CAST(gu::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
                               ELSE CAST(gu AS BIGINT) END AS g
                   FROM hw),
            fs AS (SELECT g, MIN(day) AS day FROM hs GROUP BY 1),
            daily AS (SELECT day, COUNT(*) AS new_grams FROM fs GROUP BY 1)
          SELECT CAST(day AS BIGINT) AS day,
                 CAST(new_grams AS BIGINT) AS new_grams,
                 CAST(SUM(new_grams) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative
          FROM daily ORDER BY day"""
    })


  /** Hourly spine-coverage report via the NEW SQL table-valued function
    * `graft_time_spine` (`injectTableFunction` — the dense time spine
    * every monitor here joins against, now a SQL-text surface planned as
    * a distributed Catalyst Range, never a driver-side collection): the
    * events span is covered hour by hour and empty slots counted — the
    * ingest-gap audit, spelled entirely in SQL. The only driver scalars
    * are the two span bounds. Oracle = a generate_series spine replay. */
  val q241_spine_coverage = Q(
    "q241_spine_coverage",
    (s, dir) => {
      val ev = t(s, dir, "events")
      ev.createOrReplaceTempView("graft_q241_events")
      val b = ev.agg(min(unix_timestamp(col("ts"))).as("lo"),
        max(unix_timestamp(col("ts"))).as("hi")).head()
      val lo = b.getLong(0) / 3600 * 3600
      val hi = b.getLong(1) / 3600 * 3600 + 3600
      s.sql(s"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_slots,
               CAST(SUM(CASE WHEN c.n IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_with_events,
               CAST(SUM(CASE WHEN c.n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
               CAST(COALESCE(SUM(c.n), 0) AS BIGINT) AS n_events
        FROM graft_time_spine(timestamp_seconds($lo), timestamp_seconds($hi), 3600) sp
        LEFT JOIN (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
                   FROM graft_q241_events GROUP BY 1) c
          ON sp.ts = c.h""")
    },
    Some("""WITH b AS (SELECT (epoch_us(MIN(ts)) // 3600000000) * 3600 AS lo,
                              (epoch_us(MAX(ts)) // 3600000000) * 3600 + 3600 AS hi
                       FROM events),
              spine AS (SELECT unnest(generate_series(lo, hi - 3600, 3600)) AS t FROM b),
              c AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS h, COUNT(*) AS n
                    FROM events GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_slots,
                   CAST(SUM(CASE WHEN c.n IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_with_events,
                   CAST(SUM(CASE WHEN c.n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
                   CAST(COALESCE(SUM(c.n), 0) AS BIGINT) AS n_events
            FROM spine LEFT JOIN c ON spine.t = c.h"""))


  /** The plan linter ([[graft.plans.PlanLint]], `injectCheckRule`) in
    * action: with `spark.graft.lint.noCartesian` on, an unconditioned
    * CROSS JOIN is VETOED at analysis time (the dropped-join-condition
    * footgun caught before it melts a cluster) while the equi-join form
    * of the same question passes and computes. The report row per case
    * (vetoed?, rows) is the deterministic artifact; conf restored after. */
  val q242_plan_lint = Q(
    "q242_plan_lint",
    (s, dir) => {
      import s.implicits._
      val prev = s.conf.getOption("spark.graft.lint.noCartesian")
      s.conf.set("spark.graft.lint.noCartesian", "true")
      try {
        val n = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val r = t(s, dir, "region").select(col("r_regionkey"))
        val vetoed =
          try { n.crossJoin(r).count(); false }
          catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getMessage.contains("noCartesian") => true
          }
        val joined = n.join(t(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey")).count()
        Seq(("cross_join", vetoed, 0L), ("equi_join", false, joined))
          .toDF("case", "vetoed", "rows")
          .select(col("case"), col("vetoed"), col("rows").cast("long").as("rows"))
          .orderBy("case")
      } finally {
        prev match {
          case Some(v) => s.conf.set("spark.graft.lint.noCartesian", v)
          case None => s.conf.unset("spark.graft.lint.noCartesian")
        }
      }
    },
    Some("""SELECT 'cross_join' AS "case", TRUE AS vetoed, 0::BIGINT AS rows
            UNION ALL
            SELECT 'equi_join', FALSE,
                   (SELECT COUNT(*) FROM nation JOIN region ON n_regionkey = r_regionkey)::BIGINT
            ORDER BY "case""""))


  /** Metadata-speed corpus accounting from parquet FOOTERS: events
    * re-laid-out as a 4-file parquet table, then row counts taken from the
    * file footers alone — zero data pages read, the layout-audit query a
    * 100 TB lakehouse answers from metadata (file and row-group counts
    * are deterministic here: 4 round-robin files, one row group each at
    * this size). The footer total must equal the real COUNT(*) — which is
    * exactly what the oracle checks from the original table. At fleet
    * scale the footer reads parallelize over the file list; 4 files read
    * driver-side keep the demo honest without ceremony. */
  val q243_parquet_footers = Q(
    "q243_parquet_footers",
    (s, dir) => {
      import s.implicits._
      val out = java.nio.file.Files.createTempDirectory("graft-q243").toString + "/ev"
      t(s, dir, "events").repartition(4).write.mode("overwrite").parquet(out)
      val conf = s.sparkContext.hadoopConfiguration
      val files = new java.io.File(out).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
      val perFile = files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          val blocks = reader.getFooter.getBlocks.asScala
          (blocks.size.toLong, blocks.map(_.getRowCount).sum)
        } finally reader.close()
      }
      Seq((files.length.toLong, perFile.map(_._1).sum, perFile.map(_._2).sum))
        .toDF("n_files", "n_row_groups", "meta_rows")
    },
    Some("""SELECT 4::BIGINT AS n_files, 4::BIGINT AS n_row_groups,
                   CAST(COUNT(*) AS BIGINT) AS meta_rows
            FROM events"""))

  /** Matryoshka truncation audit (Kusupati '22 MRL): retrieval recall of
    * prefix-truncated embeddings (dims 8 and 16) against the full-64-dim
    * top-5, over every 25th vector as the query set. Dots ride the
    * codegen [[graft.plans.FloatVectorDot]] on sliced arrays; ranking is
    * total-ordered by (score desc, vec_id) so ties cannot flap; the
    * oracle replays the dot as a SEQUENTIAL list_reduce fold — the
    * left-to-right summation both engines share (q124's ulp-exactness
    * pattern, not list_dot_product's unspecified order). Output per dim:
    * Σ overlap with the full top-5 and the query count — the measurement
    * behind "how many dims can this index drop". */
  val q244_matryoshka = Q(
    "q244_matryoshka",
    (s, dir) => {
      import org.apache.spark.sql.graft.ExprColumn
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings").select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"))
      // fixed-COUNT hash-ordered query sample, not a fixed fraction: the
      // audit's brute-force scoring must stay O(n·k) in the corpus size —
      // a %-based query side grows the sanity check itself to O(n²) at
      // 100×. TakeOrderedAndProject keeps this a per-partition top-k scan
      // (no global sort); vec_id breaks the improbable 64-bit hash tie so
      // the sample is total-ordered and engine-replayable.
      val queries = emb
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(100)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val dims = Seq(8, 16, 64)
      val top5 = dims.map { d =>
        val qd = if (d == 64) col("qv") else slice(col("qv"), 1, d)
        val cd = if (d == 64) col("embedding") else slice(col("embedding"), 1, d)
        val scored = queries.crossJoin(emb)
          .filter(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id"),
            ExprColumn(graft.plans.FloatVectorDot(
              ExprColumn.expr(qd), ExprColumn.expr(cd))).as("score"))
        val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .select(lit(d.toLong).as("dim"), col("qid"), col("vec_id"))
      }
      val full = top5.last.select(col("qid"), col("vec_id"))
      top5.map { t =>
        t.join(full.withColumnRenamed("vec_id", "fv"),
            t("qid") === full("qid") && col("vec_id") === col("fv"), "left_semi")
          .groupBy(col("dim"))
          .agg(count(lit(1)).cast("long").as("overlap5"))
      }.reduce(_.unionByName(_))
        .join(queries.agg(count(lit(1)).cast("long").as("n_queries")))
        .orderBy("dim")
    },
    Some {
      def dot(d: Int) =
        s"""list_reduce(list_transform(range(1, ${d + 1}),
              i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)"""
      val tops = Seq(8, 16, 64).map(d =>
        s"""SELECT $d AS dim, qid, vec_id FROM (
              SELECT q.qid, e.vec_id,
                     ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY ${dot(d)} DESC, e.vec_id) AS rn
              FROM qs q CROSS JOIN embeddings e
              WHERE q.qid <> e.vec_id) WHERE rn <= 5""").mkString("\nUNION ALL\n")
      val hashed = graft.tools.OracleSql.xxhash64LongStages(
        "SELECT vec_id::BIGINT AS vec_id, embedding FROM embeddings", "vec_id", "qh")
      s"""WITH qs AS (SELECT vec_id AS qid, qv FROM (
                        SELECT vec_id, embedding AS qv,
                               ROW_NUMBER() OVER (ORDER BY qh, vec_id) AS rn
                        FROM ($hashed)) WHERE rn <= 100),
            tops AS ($tops),
            full5 AS (SELECT qid, vec_id FROM tops WHERE dim = 64)
          SELECT CAST(t.dim AS BIGINT) AS dim,
                 CAST(COUNT(*) AS BIGINT) AS overlap5,
                 (SELECT COUNT(*) FROM qs)::BIGINT AS n_queries
          FROM tops t JOIN full5 f ON f.qid = t.qid AND f.vec_id = t.vec_id
          GROUP BY t.dim ORDER BY dim"""
    })


  /** Versioned table layout via the minimal transaction log
    * ([[graft.sources.TxnLog]] — per-commit JSON action files published by
    * atomic rename, snapshots resolved by metadata-only log replay):
    * v0 writes events as two files, v1 COMPACTS them into one (remove ×2
    * + add — contents identical), v2 appends a late-arrivals file. The
    * report reads every version AS OF its number — file counts prove the
    * layout history, row counts prove compaction moved bytes without
    * changing content and that time travel sees exactly the pre-append
    * state. Oracle derives each version's expected shape from the
    * construction arithmetic. */
  val q245_txn_log = Q(
    "q245_txn_log",
    (s, dir) => {
      import s.implicits._
      import graft.sources.TxnLog
      val root = java.nio.file.Files.createTempDirectory("graft-q245").toString
      val logDir = s"$root/_log"
      val ev = t(s, dir, "events").select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"))
      def writeOne(df: DataFrame, name: String): String = {
        val d = s"$root/$name"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
      }
      val f0a = writeOne(ev.filter(col("event_id") % 2 === 0), "even")
      val f0b = writeOne(ev.filter(col("event_id") % 2 === 1), "odd")
      TxnLog.commit(logDir, 0, adds = Seq(f0a, f0b), removes = Nil)
      val f1 = writeOne(TxnLog.readAsOf(s, logDir, 0), "compacted")
      TxnLog.commit(logDir, 1, adds = Seq(f1), removes = Seq(f0a, f0b))
      val f2 = writeOne(ev.filter(col("event_id") % 97 === 0)
        .select((col("event_id") + 10000000L).as("event_id"), col("user_id")), "late")
      TxnLog.commit(logDir, 2, adds = Seq(f2), removes = Nil)
      (0L to 2L).map { v =>
        val snap = TxnLog.readAsOf(s, logDir, v)
        (v, TxnLog.liveFiles(logDir, v).size.toLong, snap.count())
      }.toDF("version", "n_files", "n_rows")
        .select(col("version").cast("long").as("version"),
          col("n_files").cast("long").as("n_files"),
          col("n_rows").cast("long").as("n_rows"))
        .orderBy("version")
    },
    Some("""SELECT 0::BIGINT AS version, 2::BIGINT AS n_files,
                   (SELECT COUNT(*) FROM events)::BIGINT AS n_rows
            UNION ALL
            SELECT 1, 1, (SELECT COUNT(*) FROM events)
            UNION ALL
            SELECT 2, 2,
                   (SELECT COUNT(*) FROM events) +
                   (SELECT COUNT(*) FROM events WHERE event_id % 97 = 0)
            ORDER BY version"""))


  /** Time-window-constrained conversion funnel — q106's unbounded funnel
    * with the deadlines real attribution uses: first view → first click
    * WITHIN 1 h of that view → first purchase WITHIN 24 h of that click.
    * Three user-keyed min-aggregations with the window predicates pushed
    * into each stage's candidate filter (exact microsecond arithmetic,
    * total (ts, event_id) order for first-of ties). Output: stage counts
    * + median view→click latency of converters in integer seconds (rank
    * order statistic — the med2 discrete form). */
  val q246_windowed_funnel = Q(
    "q246_windowed_funnel",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(col("user_id").cast("long").as("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tu"), col("event_id").cast("long").as("eid"))
      def firstOf(df: DataFrame, name: String): DataFrame =
        df.groupBy(col("user_id")).agg(min(struct(col("tu"), col("eid"))).as(name))
      val v = firstOf(ev.filter(col("event_type") === "view"), "v")
        .select(col("user_id"), col("v.tu").as("vt"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("tu") > col("vt") && col("tu") <= col("vt") + 3600000000L)
      val cf = firstOf(c, "c").select(col("user_id"), col("c.tu").as("ct"))
        .join(v, Seq("user_id"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(cf.select(col("user_id"), col("ct")), Seq("user_id"))
        .filter(col("tu") > col("ct") && col("tu") <= col("ct") + 86400000000L)
      val pf = firstOf(p, "p").select(col("user_id"))
      val latencies = cf.select(((col("ct") - col("vt")) / 1000000L).cast("long").as("lat_s"))
      val w = Window.orderBy(col("lat_s"))
      val med = latencies
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .agg(
          max(when(col("rn") === expr("(n + 1) div 2"), col("lat_s"))).as("m1"),
          max(when(col("rn") === expr("(n + 2) div 2"), col("lat_s"))).as("m2"))
        .select((col("m1") + col("m2")).as("med2_lat_s"))
      v.agg(count(lit(1)).cast("long").as("n_view")).crossJoin(
        cf.agg(count(lit(1)).cast("long").as("n_click_1h")))
        .crossJoin(pf.agg(count(lit(1)).cast("long").as("n_purchase_24h")))
        .crossJoin(med)
        .select(col("n_view"), col("n_click_1h"), col("n_purchase_24h"),
          col("med2_lat_s").cast("long").as("med2_lat_s"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
              v AS (SELECT user_id, MIN(tu) AS vt FROM ev WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, MIN(e.tu) AS ct, MAX(v.vt) AS vt
                    FROM ev e JOIN v ON v.user_id = e.user_id
                    WHERE e.event_type = 'click' AND e.tu > v.vt AND e.tu <= v.vt + 3600000000
                    GROUP BY 1),
              p AS (SELECT e.user_id
                    FROM ev e JOIN c ON c.user_id = e.user_id
                    WHERE e.event_type = 'purchase' AND e.tu > c.ct AND e.tu <= c.ct + 86400000000
                    GROUP BY 1),
              lat AS (SELECT (ct - vt) // 1000000 AS lat_s,
                             ROW_NUMBER() OVER (ORDER BY (ct - vt) // 1000000) AS rn,
                             COUNT(*) OVER () AS n
                      FROM c),
              med AS (SELECT MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_s END) +
                             MAX(CASE WHEN rn = (n + 2) // 2 THEN lat_s END) AS med2_lat_s
                      FROM lat)
            SELECT (SELECT COUNT(*) FROM v)::BIGINT AS n_view,
                   (SELECT COUNT(*) FROM c)::BIGINT AS n_click_1h,
                   (SELECT COUNT(*) FROM p)::BIGINT AS n_purchase_24h,
                   (SELECT med2_lat_s FROM med)::BIGINT AS med2_lat_s"""))

  /** Schema matching by column-content fingerprints (the data-integration
    * classic): every string-rendered column of customer and supplier is
    * summarized by a 64-min MinHash signature of its DISTINCT value set —
    * spelled as 64 codegen'd min-aggregates over universal hashes, so the
    * signature partial-aggregates MAP-SIDE and a 100 TB column folds to
    * 64 longs (the q143 corpus-signature shape, applied to columns).
    * Each customer column then matches its best supplier column by
    * estimated Jaccard — the alignment step that lets two uncoordinated
    * exports merge. Planted truth: the tables share the nationkey domain
    * (≈ full overlap) and little else. Oracle replays hash → the
    * library's actual seeded universal-hash coefficients → mins →
    * agreement counts, value-exactly. */
  val q247_schema_match = Q(
    "q247_schema_match",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def colValues(df: DataFrame, table: String, cols: Seq[String]): DataFrame =
        cols.map { c =>
          df.select(lit(table).as("tbl"), lit(c).as("col"),
            col(c).cast("string").as("v")).filter(col("v").isNotNull).distinct()
        }.reduce(_.unionByName(_))
      val values = colValues(t(s, dir, "customer"), "customer",
          Seq("c_custkey", "c_nationkey", "c_mktsegment"))
        .unionByName(colValues(t(s, dir, "supplier"), "supplier",
          Seq("s_suppkey", "s_nationkey", "s_name")))
      val P = 2147483647L
      val hm = pmod(xxhash64(col("v")), lit(P))
      val coefs = graft.text.Dedup.minhashCoefs(64)
      val aggs = coefs.zipWithIndex.map { case ((a, b), i) =>
        min((hm * lit(a) + lit(b)) % P).as(s"m$i")
      }
      val sigs = values.groupBy(col("tbl"), col("col"))
        .agg(aggs.head, aggs.tail: _*)
        .localCheckpoint(true)
      val matches = (0 until 64)
        .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      val pairs = sigs.filter(col("tbl") === "customer").as("a")
        .join(sigs.filter(col("tbl") === "supplier").as("b"))
        .select(col("a.col").as("cust_col"), col("b.col").as("supp_col"),
          (lit(1000000L) * matches / 64L).cast("long").as("est_jaccard_ppm"))
      pairs.withColumn("rn", row_number().over(
          Window.partitionBy(col("cust_col"))
            .orderBy(col("est_jaccard_ppm").desc, col("supp_col"))))
        .filter(col("rn") === 1)
        .select(col("cust_col"), col("supp_col"), col("est_jaccard_ppm"))
        .orderBy("cust_col")
    },
    Some {
      import graft.tools.OracleSql._
      val vals =
        """SELECT 'customer' AS tbl, 'c_custkey' AS col, CAST(c_custkey AS VARCHAR) AS v FROM customer
           UNION SELECT 'customer', 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
           UNION SELECT 'customer', 'c_mktsegment', c_mktsegment FROM customer
           UNION SELECT 'supplier', 's_suppkey', CAST(s_suppkey AS VARCHAR) FROM supplier
           UNION SELECT 'supplier', 's_nationkey', CAST(s_nationkey AS VARCHAR) FROM supplier
           UNION SELECT 'supplier', 's_name', s_name FROM supplier"""
      val hashed = xxhash64Stages(s"SELECT DISTINCT v FROM ($vals)", "v", "h", pfx = "__m")
      val coefs = graft.text.Dedup.minhashCoefs(64)
      val mins = coefs.zipWithIndex.map { case ((a, b), i) =>
        s"MIN(($a * hm + $b) % 2147483647) AS m$i"
      }.mkString(", ")
      val eqTerms = (0 until 64).map(i =>
        s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH vals AS ($vals),
            hv AS (SELECT DISTINCT v, h FROM ($hashed)),
            joined AS (SELECT vals.tbl, vals.col,
                              ((hv.h % 2147483647) + 2147483647) % 2147483647 AS hm
                       FROM vals JOIN hv USING (v)),
            sigs AS (SELECT tbl, col, $mins FROM joined GROUP BY 1, 2),
            pairs AS (SELECT a.col AS cust_col, b.col AS supp_col,
                             (1000000 * ($eqTerms)) // 64 AS est_jaccard_ppm
                      FROM sigs a JOIN sigs b
                        ON a.tbl = 'customer' AND b.tbl = 'supplier')
          SELECT cust_col, supp_col, CAST(est_jaccard_ppm AS BIGINT) AS est_jaccard_ppm
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cust_col
                  ORDER BY est_jaccard_ppm DESC, supp_col) AS rn FROM pairs)
          WHERE rn = 1 ORDER BY cust_col"""
    })


  /** Event-time vs arrival-time lag audit — the measurement that SIZES
    * watermarks (q121/q144's "10 minutes" is a guess until this report
    * exists): arrival delays (hash-derived, 0–599 s — the deterministic
    * stand-in for a transport's jitter, engine-replayable) are profiled
    * per event type as exact rank order statistics (p50/p95 at rank
    * ceil(q·n) — discrete, integer) plus the late-beyond-5-min count a
    * 300 s watermark would drop. One keyed window shuffle. */
  val q248_lag_audit = Q(
    "q248_lag_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(col("event_type"),
          col("event_id").cast("long").as("event_id"))
        .withColumn("delay_s", pmod(xxhash64(col("event_id")), lit(600L)))
      val w = Window.partitionBy(col("event_type")).orderBy(col("delay_s"), col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(
          max(col("n")).cast("long").as("n"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("delay_s"))).cast("long").as("p50_s"),
          max(when(col("rn") === expr("(19 * n + 19) div 20"), col("delay_s"))).cast("long").as("p95_s"),
          max(col("delay_s")).cast("long").as("max_s"),
          sum(when(col("delay_s") > 300, 1L).otherwise(0L)).cast("long").as("n_late_5m"))
        .orderBy("event_type")
    },
    Some {
      import graft.tools.OracleSql._
      val base = "SELECT event_type, event_id::BIGINT AS event_id FROM events"
      val hashed = xxhash64LongStages(base, "event_id", "h", pfx = "__l")
      s"""WITH d AS (SELECT event_type, event_id,
                            ((h % 600) + 600) % 600 AS delay_s
                     FROM ($hashed)),
            rk AS (SELECT event_type, delay_s,
                          ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY delay_s, event_id) AS rn,
                          COUNT(*) OVER (PARTITION BY event_type) AS n
                   FROM d)
          SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                 CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN delay_s END) AS BIGINT) AS p50_s,
                 CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN delay_s END) AS BIGINT) AS p95_s,
                 CAST(MAX(delay_s) AS BIGINT) AS max_s,
                 CAST(SUM(CASE WHEN delay_s > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_5m
          FROM rk GROUP BY 1 ORDER BY 1"""
    })


  /** Source-level embedding centroid distance matrix — q143's corpus
    * similarity in VECTOR space: per label, the exact integer sum-vector
    * and count of int8-quantized embeddings (the persistable artifact — a
    * 100 TB label folds to 64 BIGINTs, the map-side-partial shape), then
    * pairwise squared centroid distance Σ_d (sa_d·n_b − sb_d·n_a)² /
    * (n_a·n_b)² evaluated as a FIXED-ORDER double fold over the 64 dims
    * (exact integer numerators first; a fixed expression sum of doubles
    * is engine-stable — the q86 rule — where a row-order aggregate is
    * not). Output: label pairs with dist² ×10⁶ floored. */
  val q249_centroid_matrix = Q(
    "q249_centroid_matrix",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"), col("embedding"))
        .withColumn("q", expr("transform(embedding, x -> CAST(FLOOR(x * 64) AS BIGINT))"))
      val dims = 64
      val aggCols = Seq(count(lit(1)).as("n")) ++
        (0 until dims).map(d => sum(element_at(col("q"), d + 1)).as(s"s$d"))
      val sums = emb.groupBy(col("label"))
        .agg(aggCols.head, aggCols.tail: _*)
        .localCheckpoint(true)
      val terms = (0 until dims).map { d =>
        val num = col(s"a.s$d") * col("b.n") - col(s"b.s$d") * col("a.n")
        (num * num).cast("double")
      }.reduce(_ + _)
      sums.as("a").join(sums.as("b"), col("a.label") < col("b.label"))
        .select(col("a.label").as("l1"), col("b.label").as("l2"),
          floor(lit(1000000.0) * terms /
            (col("a.n") * col("b.n") * col("a.n") * col("b.n")).cast("double"))
            .cast("long").as("dist2_ppm"))
        .orderBy("l1", "l2")
    },
    Some {
      val terms = (0 until 64).map { d =>
        s"CAST((a.s$d * b.n - b.s$d * a.n) * (a.s$d * b.n - b.s$d * a.n) AS DOUBLE)"
      }.mkString("(", " + ", ")")
      val sums = (0 until 64).map(d =>
        s"SUM(CAST(FLOOR(CAST(embedding[${d + 1}] AS DOUBLE) * 64) AS BIGINT)) AS s$d")
        .mkString(", ")
      s"""WITH sums AS (SELECT label, COUNT(*) AS n, $sums
                        FROM embeddings GROUP BY 1)
          SELECT CAST(a.label AS BIGINT) AS l1, CAST(b.label AS BIGINT) AS l2,
                 CAST(FLOOR(1000000.0 * $terms /
                   CAST(a.n * b.n * a.n * b.n AS DOUBLE)) AS BIGINT) AS dist2_ppm
          FROM sums a JOIN sums b ON a.label < b.label
          ORDER BY l1, l2"""
    })

  /** The cost-based-optimizer statistics surface: nation and customer
    * registered as catalog tables, `ANALYZE TABLE ... COMPUTE STATISTICS
    * FOR COLUMNS` run, and the recorded stats read back — row counts and
    * column NDVs (exact at these cardinalities: Spark's HLL++ is sparse-
    * mode-exact for small distinct sets), which is what the planner uses
    * to choose broadcast sides without hints. Oracle recomputes the same
    * stats from the data; TopKSpec-style plan proof lives in the catalog
    * stats themselves being non-null. */
  private val q250Runs = new java.util.concurrent.atomic.AtomicInteger(0)
  val q250_cbo_stats = Q(
    "q250_cbo_stats",
    (s, dir) => {
      import s.implicits._
      // unique per run (bench runs twice; a crashed run must not poison the
      // next via a leftover warehouse directory) — dropped with CASCADE below
      val db = s"graft_q250_${q250Runs.incrementAndGet()}_${System.identityHashCode(s)}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      t(s, dir, "nation").write.mode("overwrite").saveAsTable(s"$db.nation_t")
      t(s, dir, "customer").write.mode("overwrite").saveAsTable(s"$db.customer_t")
      s.sql(s"ANALYZE TABLE $db.nation_t COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name")
      s.sql(s"ANALYZE TABLE $db.customer_t COMPUTE STATISTICS FOR COLUMNS c_nationkey")
      def stats(table: String, column: String): (Long, Long) = {
        val cat = s.sessionState.catalog
        val meta = cat.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
        val st = meta.stats.get
        (st.rowCount.get.toLong, st.colStats(column).distinctCount.get.toLong)
      }
      val (nRows, nNdv) = stats("nation_t", "n_nationkey")
      val (cRows, cNdv) = stats("customer_t", "c_nationkey")
      // NDV is HLL++-approximate — engine-specific, so the pinned value is
      // the accuracy CONTRACT (within 5 % of exact), not the estimate
      val nExact = t(s, dir, "nation").select(countDistinct(col("n_nationkey"))).head().getLong(0)
      val cExact = t(s, dir, "customer").select(countDistinct(col("c_nationkey"))).head().getLong(0)
      def within5(est: Long, exact: Long): Boolean =
        math.abs(est - exact) * 20L <= exact
      val out = Seq(("nation", nRows, within5(nNdv, nExact)),
        ("customer", cRows, within5(cNdv, cExact)))
        .toDF("table_name", "row_count", "ndv_within_5pct")
        .orderBy("table_name")
        .localCheckpoint(true)
      s.sql(s"DROP DATABASE $db CASCADE")
      out
    },
    Some("""SELECT 'customer' AS table_name,
                   (SELECT COUNT(*) FROM customer)::BIGINT AS row_count,
                   TRUE AS ndv_within_5pct
            UNION ALL
            SELECT 'nation', (SELECT COUNT(*) FROM nation), TRUE
            ORDER BY table_name"""))


  /** Personalized PageRank from a seed set
    * ([[graft.operators.Graph.personalizedPageRank]] — teleport mass only
    * on the seeds, so scores measure proximity to them; same BIGINT
    * fixed-point determinism as q119's global form): customers of nation
    * 0 as seeds over the customer→order-bucket graph, 4 rounds, top-15
    * non-seed-side nodes by (rank, node). Oracle = the generated
    * seed-aware round chain. */
  val q251_personalized_pr = Q(
    "q251_personalized_pr",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val edges = o.select(
        col("o_custkey").cast("long").as("src"),
        (lit(100000L) + col("o_orderkey") % 1500).cast("long").as("dst")).distinct()
      val seeds = t(s, dir, "customer").filter(col("c_nationkey") === 0)
        .select(col("c_custkey").cast("long").as("node"))
      graft.operators.Graph.personalizedPageRank(edges, seeds, iterations = 4)
        .filter(col("node") >= 100000L && col("rank") > 0)
        .orderBy(col("rank").desc, col("node"))
        .limit(15)
        .select(col("node").cast("long").as("node"), col("rank").cast("long").as("rank"))
        .orderBy("node")
    },
    Some {
      val iters = (1 to 4).map { i =>
        val prev = s"r${i - 1}"
        s"""r$i AS (
              SELECT sn.node,
                     sn.is_seed * (SELECT (1000000000::BIGINT * 15) // (100 * ns) FROM consts)
                     + (85 * COALESCE(s.s, 0)) // 100 AS rank
              FROM sn LEFT JOIN (
                SELECT ed.dst AS node, SUM($prev.rank // ed.outdeg) AS s
                FROM ed JOIN $prev ON ed.src = $prev.node GROUP BY 1) s USING (node))"""
      }.mkString(",\n          ")
      s"""WITH e AS (
            SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                   CAST(100000 + o_orderkey % 1500 AS BIGINT) AS dst
            FROM orders),
          nodes AS (
            SELECT DISTINCT node
            FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          seeds AS (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS node FROM customer
                    WHERE c_nationkey = 0),
          sn AS (SELECT nodes.node,
                        CASE WHEN seeds.node IS NULL THEN 0 ELSE 1 END AS is_seed
                 FROM nodes LEFT JOIN seeds USING (node)),
          consts AS (SELECT CAST(SUM(is_seed) AS BIGINT) AS ns FROM sn),
          deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
          ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d USING (src)),
          r0 AS (SELECT node, is_seed * (SELECT 1000000000::BIGINT // ns FROM consts) AS rank
                 FROM sn),
          $iters
          SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
          FROM (SELECT * FROM r4 WHERE node >= 100000 AND rank > 0
                ORDER BY rank DESC, node LIMIT 15)
          ORDER BY node"""
    })


  /** Multi-probe LSH over simhash bands (Lv et al. VLDB'07, the
    * table-count/recall trade): beside the exact 16-bit band-bucket join
    * (q31's scheme — which MISSES any pair whose signatures differ in
    * every band), probe depth 1 also joins each band key against its 16
    * one-bit-flip neighbors, rescuing pairs with a band at Hamming
    * distance exactly 1 — more recall from the SAME four tables, the
    * alternative to doubling band count. Candidates verified exactly
    * (bit_count(xor) ≤ 6); the report pins candidate and verified pair
    * counts per probe depth, so the recall gain is a VALUE, not a claim.
    * Integer end-to-end; the oracle replays signature → bands → flips →
    * verify (the q31 machinery plus the probe expansion). */
  val q252_multiprobe_lsh = Q(
    "q252_multiprobe_lsh",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val clipped = d.filter(col("doc_id") % 4 === 0).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), lit(1),
          size(split(trim(col("text")), "\\s+")) - 3), " ").as("text"))
      val corpus = d.unionByName(clipped)
      val sigs = Dedup.simhash(corpus, "doc_id", "text").localCheckpoint(true)
      val bands = sigs.select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("blk"))
        .withColumn("key", expr("shiftrightunsigned(simhash, blk * 16) & 65535"))
        .localCheckpoint(true)
      // j = -1 is the exact probe; j in 0..15 flips one bit of the band key
      val probes = bands.select(col("doc_id"), col("simhash"), col("blk"), col("key"),
          explode(array((-1 to 15).map(lit): _*)).as("j"))
        .withColumn("pkey",
          when(col("j") === -1, col("key"))
            .otherwise(expr("key ^ shiftleft(1L, j)")))
      val out = Seq(0, 1).map { depth =>
        val b =
          if (depth == 0) bands.select(col("blk"), col("key").as("pkey"),
            col("doc_id").as("id2"), col("simhash").as("s2"))
          else probes.select(col("blk"), col("pkey"),
            col("doc_id").as("id2"), col("simhash").as("s2"))
        val cands = bands.select(col("blk"), col("key").as("pkey"),
            col("doc_id").as("id1"), col("simhash").as("s1"))
          .join(b, Seq("blk", "pkey"))
          .filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2"), col("s1"), col("s2"))
          .distinct()
          .localCheckpoint(true)
        val nc = cands.count()
        val nv = cands.filter(bit_count(col("s1").bitwiseXOR(col("s2"))) <= 6).count()
        (depth.toLong, nc, nv)
      }
      import s.implicits._
      out.toDF("probe_depth", "n_candidate_pairs", "n_verified_pairs")
        .orderBy("probe_depth")
    },
    Some {
      import graft.tools.OracleSql._
      val corpus =
        s"""SELECT doc_id::BIGINT AS doc_id, text FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id::BIGINT + 1000000,
                   array_to_string(rt[1:len(rt)-3], ' ')
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS rt
                  FROM documents WHERE doc_id % 2 = 0) WHERE doc_id % 4 = 0"""
      val toks =
        s"""SELECT doc_id, tok FROM (
              SELECT doc_id, unnest(string_split(${normalizeSql("text")}, ' ')) AS tok
              FROM ($corpus)) WHERE len(tok) > 0"""
      val hashed = xxhash64Stages(toks, "tok", "th", pfx = "__t")
      val bitsums = (0 until 64)
        .map(j => s"SUM(CASE WHEN (hu >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
        .mkString(", ")
      val sigexpr = (0 until 64)
        .map(j => s"CASE WHEN b$j > 0 THEN ${java.lang.Long.toUnsignedString(1L << j)}::HUGEINT ELSE 0::HUGEINT END")
        .mkString(" + ")
      s"""WITH hashed AS (
            SELECT doc_id, CASE WHEN th < 0 THEN CAST(th::HUGEINT + 18446744073709551616::HUGEINT AS UBIGINT)
                                ELSE CAST(th AS UBIGINT) END AS hu
            FROM ($hashed)),
          bits AS (SELECT doc_id, $bitsums FROM hashed GROUP BY doc_id),
          sig AS (SELECT doc_id, CAST(($sigexpr) AS UBIGINT) AS sigu FROM bits),
          bands AS MATERIALIZED (
            SELECT doc_id, sigu, bb.b AS blk, (sigu >> (16 * bb.b)) & 65535 AS key
            FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) bb(b)),
          probes AS (
            SELECT doc_id, sigu, blk, key AS pkey FROM bands
            UNION ALL
            SELECT doc_id, sigu, blk, xor(key, 1::UBIGINT << j.range) AS pkey
            FROM bands CROSS JOIN range(16) j),
          c0 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.sigu AS s1, b.sigu AS s2
                 FROM bands a JOIN bands b
                   ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id),
          c1 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.sigu AS s1, b.sigu AS s2
                 FROM bands a JOIN probes b
                   ON a.blk = b.blk AND a.key = b.pkey AND a.doc_id < b.doc_id)
          SELECT 0::BIGINT AS probe_depth,
                 (SELECT COUNT(*) FROM c0)::BIGINT AS n_candidate_pairs,
                 (SELECT COUNT(*) FROM c0 WHERE bit_count(xor(s1, s2)) <= 6)::BIGINT AS n_verified_pairs
          UNION ALL
          SELECT 1, (SELECT COUNT(*) FROM c1),
                 (SELECT COUNT(*) FROM c1 WHERE bit_count(xor(s1, s2)) <= 6)
          ORDER BY probe_depth"""
    })


  /** Incremental connected-components maintenance
    * ([[graft.text.Dedup.incrementalClusters]]): a persisted component
    * artifact over within-decade part-id chains is updated with a batch
    * of bridge edges — only the touched components re-cluster (star edges
    * to old roots + the new pairs, a delta-sized local graph), untouched
    * components pass through by subtraction. The oracle is the FULL
    * recompute over old∪new edges (a generated min-label propagation
    * chain, each stage MATERIALIZED), which is precisely the operator's
    * equivalence contract — incremental must be indistinguishable from
    * recomputing everything. Output: component-size histogram after the
    * update. */
  val q253_incremental_cc = Q(
    "q253_incremental_cc",
    (s, dir) => {
      val ids = t(s, dir, "part").select(col("p_partkey").cast("long").as("p"))
      val base = ids.filter(col("p") % 10 =!= 0)
        .select(col("p").as("id1"), (col("p") + 1).as("id2"))
      val batch = ids.filter(col("p") % 100 === 5)
        .select(col("p").as("id1"), (col("p") + 10).as("id2"))
      val existing = Dedup.duplicateClusters(base)
      val updated = Dedup.incrementalClusters(existing, batch)
      updated.groupBy(col("root")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").cast("long").as("component_size"))
        .agg(count(lit(1)).cast("long").as("n_components"))
        .orderBy("component_size")
    },
    Some {
      // full recompute: min-label propagation over old ∪ new edges; merged
      // chains have diameter <= 20, so 21 materialized stages reach the
      // fixpoint with margin
      val stages = (1 to 21).map { i =>
        val prev = s"l${i - 1}"
        s"""l$i AS MATERIALIZED (
              SELECT n.id, LEAST(p.root, COALESCE(m.mn, p.root)) AS root
              FROM nodes n
              JOIN $prev p ON p.id = n.id
              LEFT JOIN (SELECT e.a AS id, MIN($prev.root) AS mn
                         FROM e JOIN $prev ON e.b = $prev.id GROUP BY 1) m
                ON m.id = n.id)"""
      }.mkString(",\n          ")
      s"""WITH ids AS (SELECT CAST(p_partkey AS BIGINT) AS p FROM part),
          pairs AS (
            SELECT p AS id1, p + 1 AS id2 FROM ids WHERE p % 10 <> 0
            UNION ALL
            SELECT p, p + 10 FROM ids WHERE p % 100 = 5),
          e AS MATERIALIZED (
            SELECT id1 AS a, id2 AS b FROM pairs
            UNION SELECT id2, id1 FROM pairs),
          nodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM e),
          l0 AS MATERIALIZED (SELECT id, id AS root FROM nodes),
          $stages
          SELECT CAST(sz AS BIGINT) AS component_size,
                 CAST(COUNT(*) AS BIGINT) AS n_components
          FROM (SELECT root, COUNT(*) AS sz FROM l21 GROUP BY 1)
          GROUP BY 1 ORDER BY 1"""
    })


  /** Empirical Bloom-filter false-positive audit — the measured-accuracy
    * report that completes the sketch-fidelity family (minhash q200, KMV
    * q204, Count-Min q113/q214, HLL q114): a 16384-bit k=5 filter built
    * over the even-event key set is probed with the DISJOINT odd-event
    * keys (true positives excluded by construction via anti-join), so
    * every hit IS a false positive and the measured rate is the number a
    * capacity plan uses — here the filter is deliberately UNDERSIZED
    * (load kn/m ≈ 1.5 → measured ≈ 29 %, matching (1−e^(−kn/m))^k), the
    * overload condition this report exists to catch. The oracle replays the filter's actual probe
    * arithmetic — splitmix64 finalizer, forced-odd stride h2, five
    * wrapping-2⁶⁴ probe positions — through the mod-2⁶⁴ SQL machinery,
    * bit-for-bit. */
  val q254_bloom_fpp = Q(
    "q254_bloom_fpp",
    (s, dir) => {
      import org.apache.spark.sql.graft.ExprColumn
      val ev = t(s, dir, "events").select(col("event_id").cast("long").as("eid"))
      val members = ev.filter(col("eid") % 2 === 0)
        .select(xxhash64(col("eid")).as("key")).distinct().localCheckpoint(true)
      val probes = ev.filter(col("eid") % 2 === 1)
        .select(xxhash64(col("eid")).as("key")).distinct()
        .join(members, Seq("key"), "left_anti").localCheckpoint(true)
      val agg = graft.plans.BloomBuildAgg(ExprColumn.expr(col("key")), 16384L, 5)
      val bits = members.agg(ExprColumn(agg.toAggregateExpression()).as("bits"))
        .head().getSeq[Long](0).toArray
      val nFp = probes.filter(ExprColumn(graft.plans.BloomContains(
        ExprColumn.expr(col("key")), bits, 5))).count()
      import s.implicits._
      Seq((members.count(), probes.count(), nFp))
        .toDF("n_members", "n_probes", "n_false_positives")
    },
    Some {
      import graft.tools.OracleSql._
      val C1 = BigInt("9E3779B97F4A7C15", 16)
      val C2 = BigInt("BF58476D1CE4E5B9", 16)
      val C3 = BigInt("94D049BB133111EB", 16)
      // splitmix64 + forced-odd stride + 5 wrapping probe positions, as
      // chained stages over a relation exposing UBIGINT column `u`
      def probeStages(rel: String, pfx: String): String = {
        var q = rel
        def wrap(expr: String, col: String): Unit = { q = s"SELECT *, $expr AS $col FROM ($q)" }
        wrap(addModSql("u", C1.toString), s"${pfx}z0")
        wrap(mulConstSql(s"xor(${pfx}z0, ${pfx}z0 >> 30)", C2), s"${pfx}z1")
        wrap(mulConstSql(s"xor(${pfx}z1, ${pfx}z1 >> 27)", C3), s"${pfx}z2")
        wrap(s"xor(${pfx}z2, ${pfx}z2 >> 31)", s"${pfx}mx")
        wrap(s"${pfx}mx | 1", s"${pfx}h2")
        wrap("u", s"${pfx}p0")
        (1 to 4).foreach(i => wrap(addModSql(s"${pfx}p${i - 1}", s"${pfx}h2"), s"${pfx}p$i"))
        wrap((0 to 4).map(i => s"${pfx}p$i & 16383").mkString("[", ", ", "]"), s"${pfx}plist")
        q
      }
      val mk = xxhash64LongStages(
        "SELECT DISTINCT event_id::BIGINT AS eid FROM events WHERE event_id % 2 = 0",
        "eid", "key", pfx = "__bm")
      val pk = xxhash64LongStages(
        "SELECT DISTINCT event_id::BIGINT AS eid FROM events WHERE event_id % 2 = 1",
        "eid", "key", pfx = "__bp")
      s"""WITH mkeys AS MATERIALIZED (SELECT DISTINCT key FROM ($mk)),
            pkeys0 AS MATERIALIZED (SELECT DISTINCT key FROM ($pk)),
            pkeys AS MATERIALIZED (SELECT key FROM pkeys0 ANTI JOIN mkeys USING (key)),
            mpos AS MATERIALIZED (
              SELECT DISTINCT unnest(__amplist) AS pos FROM (
                ${probeStages(s"SELECT ${unsignedOf("key")} AS u FROM mkeys", "__am")})),
            bprobe AS (
              SELECT u AS key, unnest(__bbplist) AS pos FROM (
                ${probeStages(s"SELECT ${unsignedOf("key")} AS u FROM pkeys", "__bb")}) ),
            hits AS (
              SELECT b.key,
                     SUM(CASE WHEN m.pos IS NULL THEN 0 ELSE 1 END) AS nhit
              FROM bprobe b LEFT JOIN mpos m ON m.pos = b.pos
              GROUP BY b.key)
          SELECT (SELECT COUNT(*) FROM mkeys)::BIGINT AS n_members,
                 (SELECT COUNT(*) FROM pkeys)::BIGINT AS n_probes,
                 (SELECT COUNT(*) FROM hits WHERE nhit = 5)::BIGINT AS n_false_positives"""
    })


  /** Positional multi-touch attribution (the 40/20/40 U-shape — beside
    * q182's last-touch): per user, every view touch within 24 h before
    * that user's first purchase earns integer-ppm credit — 40 % first
    * touch, 40 % last touch, the middle 20 % split evenly (single-touch
    * journeys take 100 %; two-touch 50/50 by the same arithmetic with the
    * middle empty). Credits are exact integers summing to 1 000 000 per
    * converter (largest-remainder-free by construction: 400000·2 +
    * 200000/(n−2)·(n−2) + remainder folded into the LAST middle touch).
    * One user-keyed window pass. Report: credit mass per touch position
    * bucket. */
  val q255_position_attribution = Q(
    "q255_position_attribution",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(col("user_id").cast("long").as("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tu"), col("event_id").cast("long").as("eid"))
      val conv = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("tu")).as("pt"))
      val touches = ev.filter(col("event_type") === "view")
        .join(conv, Seq("user_id"))
        .filter(col("tu") < col("pt") && col("tu") >= col("pt") - 86400000000L)
      val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("eid"))
      val ranked = touches
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      val credited = ranked.withColumn("credit",
        when(col("n") === 1, lit(1000000L))
          .when(col("rn") === 1, when(col("n") === 2, 500000L).otherwise(400000L))
          .when(col("rn") === col("n"), when(col("n") === 2, 500000L).otherwise(400000L))
          .otherwise(expr("200000 div (n - 2)") +
            when(col("rn") === col("n") - 1, expr("200000 % (n - 2)")).otherwise(0L)))
      credited
        .withColumn("bucket",
          when(col("rn") === 1, "first")
            .when(col("rn") === col("n"), "last")
            .otherwise("middle"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_touches"),
          sum(col("credit")).cast("long").as("credit_ppm"))
        .orderBy("bucket")
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
              conv AS (SELECT user_id, MIN(tu) AS pt FROM ev
                       WHERE event_type = 'purchase' GROUP BY 1),
              touches AS (SELECT e.user_id, e.tu, e.event_id
                          FROM ev e JOIN conv c ON c.user_id = e.user_id
                          WHERE e.event_type = 'view'
                            AND e.tu < c.pt AND e.tu >= c.pt - 86400000000),
              ranked AS (SELECT user_id,
                                ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY tu, event_id) AS rn,
                                COUNT(*) OVER (PARTITION BY user_id) AS n
                         FROM touches),
              credited AS (SELECT *,
                CASE WHEN n = 1 THEN 1000000
                     WHEN rn = 1 THEN CASE WHEN n = 2 THEN 500000 ELSE 400000 END
                     WHEN rn = n THEN CASE WHEN n = 2 THEN 500000 ELSE 400000 END
                     ELSE 200000 // (n - 2) +
                          CASE WHEN rn = n - 1 THEN 200000 % (n - 2) ELSE 0 END
                END AS credit,
                CASE WHEN rn = 1 THEN 'first' WHEN rn = n THEN 'last'
                     ELSE 'middle' END AS bucket
                FROM ranked)
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_touches,
                   CAST(SUM(credit) AS BIGINT) AS credit_ppm
            FROM credited GROUP BY 1 ORDER BY 1"""))

  /** Bitmap-index set intersection (the roaring-bitmap pattern reduced to
    * word alignment): per event type, user-id membership packed
    * into 64-bit words (word = key div 64, bit = key mod 64 — a set's
    * 100 TB id set folds to ids/64 longs); pairwise segment overlap =
    * Σ bit_count(wordA & wordB) over the word-aligned equi-join (ids/64
    * rows per side) — the bitmap AND that replaces a row-level id join.
    * The exact row-join
    * count rides alongside (q204's fidelity convention) and must agree
    * EXACTLY — bitmaps are lossless, unlike the sketch family. */
  val q256_bitmap_index = Q(
    "q256_bitmap_index",
    (s, dir) => {
      val c = t(s, dir, "events").select(col("event_type").as("seg"),
        col("user_id").cast("long").as("k"))
      // distinct first: sum of single-bit words equals the bitwise OR only
      // when every (seg, key) contributes its bit exactly once
      val dKeys = c.distinct().localCheckpoint(true)
      val words = dKeys
        .groupBy(col("seg"), expr("k div 64").as("w"))
        .agg(sum(expr("shiftleft(1L, CAST(k % 64 AS INT))")).as("bits"))
        .localCheckpoint(true)
      val overlap = words.as("a")
        .join(words.as("b"), col("a.w") === col("b.w") && col("a.seg") < col("b.seg"))
        .groupBy(col("a.seg").as("seg1"), col("b.seg").as("seg2"))
        .agg(sum(bit_count(col("a.bits").bitwiseAND(col("b.bits")))).cast("long").as("bitmap_common"))
      val exact = dKeys.as("x").join(dKeys.as("y"),
          col("x.k") === col("y.k") && col("x.seg") < col("y.seg"))
        .groupBy(col("x.seg").as("seg1"), col("y.seg").as("seg2"))
        .agg(count(lit(1)).cast("long").as("exact_common"))
      overlap.join(exact, Seq("seg1", "seg2"), "full_outer")
        .select(col("seg1"), col("seg2"),
          coalesce(col("bitmap_common"), lit(0L)).as("bitmap_common"),
          coalesce(col("exact_common"), lit(0L)).as("exact_common"))
        .orderBy("seg1", "seg2")
    },
    Some("""WITH c AS (SELECT DISTINCT event_type AS seg, CAST(user_id AS BIGINT) AS k
                       FROM events),
              words AS (SELECT seg, k // 64 AS w,
                               -- UBIGINT: bit 63 overflows a signed shift;
                               -- the bit PATTERN matches Spark's signed sum
                               CAST(SUM(1::UBIGINT << CAST(k % 64 AS INT)) AS UBIGINT) AS bits
                        FROM c GROUP BY 1, 2),
              overlap AS (SELECT a.seg AS seg1, b.seg AS seg2,
                                 SUM(bit_count(a.bits & b.bits)) AS bitmap_common
                          FROM words a JOIN words b
                            ON a.w = b.w AND a.seg < b.seg
                          GROUP BY 1, 2),
              exact AS (SELECT x.seg AS seg1, y.seg AS seg2, COUNT(*) AS exact_common
                        FROM c x JOIN c y ON x.k = y.k AND x.seg < y.seg
                        GROUP BY 1, 2)
            SELECT COALESCE(o.seg1, e.seg1) AS seg1, COALESCE(o.seg2, e.seg2) AS seg2,
                   CAST(COALESCE(o.bitmap_common, 0) AS BIGINT) AS bitmap_common,
                   CAST(COALESCE(e.exact_common, 0) AS BIGINT) AS exact_common
            FROM overlap o FULL OUTER JOIN exact e
              ON o.seg1 = e.seg1 AND o.seg2 = e.seg2
            ORDER BY seg1, seg2"""))


  /** Histogram-based equi-join cardinality estimation — the THIRD member
    * of the planner-statistics family (q214: sketch inner product, q250:
    * catalog stats): equi-width histograms on both join keys (per bucket:
    * row count and exact distinct count — the shape ANALYZE histograms
    * persist), estimate per bucket = rows_a·rows_b / max(ndv_a, ndv_b)
    * (the uniform-within-bucket textbook formula, integer floor-div), exact
    * join size alongside. Unlike the sketch's one-sided ≥ guarantee this
    * estimator can err EITHER way — pinning est next to exact is the
    * point: the report shows the error a CBO would act on. Bucket-count-
    * sized aggregates only. */
  val q257_histogram_join_est = Q(
    "q257_histogram_join_est",
    (s, dir) => {
      val a = t(s, dir, "events").filter(col("event_type") === "view")
        .select(col("user_id").cast("long").as("k"))
      val b = t(s, dir, "events").filter(col("event_type") === "click")
        .select(col("user_id").cast("long").as("k"))
      def hist(df: DataFrame) = df
        .groupBy(expr("k div 32").as("bucket"))
        .agg(count(lit(1)).as("rows"), countDistinct(col("k")).as("ndv"))
      val est = hist(a).as("ha").join(hist(b).as("hb"), Seq("bucket"))
        .select((col("ha.rows") * col("hb.rows") /
          greatest(col("ha.ndv"), col("hb.ndv"))).cast("long").as("e"))
        .agg(sum(col("e")).as("est"))
      val exact = a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(col("k")).agg(count(lit(1)).as("cb")), Seq("k"))
        .agg(sum(col("ca") * col("cb")).as("exact"))
      est.crossJoin(exact)
        .select(col("est").cast("long").as("est"),
          col("exact").cast("long").as("exact"))
    },
    Some("""WITH a AS (SELECT CAST(user_id AS BIGINT) AS k FROM events
                       WHERE event_type = 'view'),
              b AS (SELECT CAST(user_id AS BIGINT) AS k FROM events
                    WHERE event_type = 'click'),
              ha AS (SELECT k // 32 AS bucket, COUNT(*) AS rows_, COUNT(DISTINCT k) AS ndv
                     FROM a GROUP BY 1),
              hb AS (SELECT k // 32 AS bucket, COUNT(*) AS rows_, COUNT(DISTINCT k) AS ndv
                     FROM b GROUP BY 1),
              est AS (SELECT SUM((ha.rows_ * hb.rows_) // GREATEST(ha.ndv, hb.ndv)) AS est
                      FROM ha JOIN hb USING (bucket)),
              ex AS (SELECT SUM(ca.c * cb.c) AS exact FROM
                       (SELECT k, COUNT(*) AS c FROM a GROUP BY 1) ca
                     JOIN (SELECT k, COUNT(*) AS c FROM b GROUP BY 1) cb USING (k))
            SELECT CAST(est.est AS BIGINT) AS est, CAST(ex.exact AS BIGINT) AS exact
            FROM est CROSS JOIN ex"""))


  /** Column-level snapshot diff — q104's corpus diff at COLUMN
    * granularity (the data-diff report schema-migration reviews read):
    * between two constructed customer snapshots (every 7th key's balance
    * floored up, every 11th key's segment rewritten, every 100th key
    * dropped), the per-column changed/same counts over matched keys plus
    * added/removed key counts. One full-outer join on the key; per-column
    * null-safe comparisons; counts derive from the id arithmetic so the
    * oracle is analytic where possible and a replay elsewhere. */
  val q258_column_diff = Q(
    "q258_column_diff",
    (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("k"),
        col("c_acctbal"), col("c_mktsegment"))
      val next = base.filter(col("k") % 100 =!= 0)
        .select(col("k"),
          when(col("k") % 7 === 0, floor(col("c_acctbal")) + 1).otherwise(col("c_acctbal"))
            .cast("double").as("c_acctbal"),
          when(col("k") % 11 === 0, lit("REASSIGNED")).otherwise(col("c_mktsegment"))
            .as("c_mktsegment"))
      val j = base.as("o").join(next.as("n"), Seq("k"), "full_outer")
        .localCheckpoint(true)
      val matched = j.filter(col("o.c_acctbal").isNotNull && col("n.c_acctbal").isNotNull ||
        (col("o.c_mktsegment").isNotNull && col("n.c_mktsegment").isNotNull))
      val perCol = Seq(
        ("c_acctbal", col("o.c_acctbal") === col("n.c_acctbal")),
        ("c_mktsegment", col("o.c_mktsegment") === col("n.c_mktsegment"))).map {
        case (name, eq) =>
          matched.agg(
            sum(when(eq, 0L).otherwise(1L)).cast("long").as("n_changed"),
            sum(when(eq, 1L).otherwise(0L)).cast("long").as("n_same"))
            .select(lit(name).as("column_name"), col("n_changed"), col("n_same"))
      }.reduce(_.unionByName(_))
      val keys = j.agg(
        sum(when(col("n.c_mktsegment").isNull && col("o.c_mktsegment").isNotNull, 1L)
          .otherwise(0L)).cast("long").as("n_changed"),
        lit(0L).as("n_same"))
        .select(lit("__removed_keys").as("column_name"), col("n_changed"), col("n_same"))
      perCol.unionByName(keys).orderBy("column_name")
    },
    Some("""WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_acctbal, c_mktsegment
                          FROM customer),
              nxt AS (SELECT k,
                             CASE WHEN k % 7 = 0 THEN FLOOR(c_acctbal) + 1
                                  ELSE c_acctbal END AS c_acctbal,
                             CASE WHEN k % 11 = 0 THEN 'REASSIGNED'
                                  ELSE c_mktsegment END AS c_mktsegment
                      FROM base WHERE k % 100 <> 0),
              m AS (SELECT o.c_acctbal AS oa, n.c_acctbal AS na,
                           o.c_mktsegment AS os, n.c_mktsegment AS ns
                    FROM base o JOIN nxt n USING (k))
            SELECT 'c_acctbal' AS column_name,
                   CAST(SUM(CASE WHEN oa = na THEN 0 ELSE 1 END) AS BIGINT) AS n_changed,
                   CAST(SUM(CASE WHEN oa = na THEN 1 ELSE 0 END) AS BIGINT) AS n_same
            FROM m
            UNION ALL
            SELECT 'c_mktsegment',
                   CAST(SUM(CASE WHEN os = ns THEN 0 ELSE 1 END) AS BIGINT),
                   CAST(SUM(CASE WHEN os = ns THEN 1 ELSE 0 END) AS BIGINT)
            FROM m
            UNION ALL
            SELECT '__removed_keys',
                   (SELECT COUNT(*) FROM base WHERE k % 100 = 0)::BIGINT, 0::BIGINT
            ORDER BY column_name"""))

  /** Referential-integrity audit across the star schema — the cross-table
    * data-quality report beside q133's single-table expectations: per
    * foreign key, total references, orphan count (anti-join), and
    * distinct orphan keys — lineitem→orders, lineitem→part,
    * lineitem→supplier, orders→customer, customer→nation. Each check is
    * one anti-join aggregate; at 100 TB the dimension side broadcasts and
    * the audit is a single fact-scan per FK. */
  val q259_ri_audit = Q(
    "q259_ri_audit",
    (s, dir) => {
      import s.implicits._
      def check(name: String, fact: DataFrame, fk: String,
          dim: DataFrame, pk: String): DataFrame = {
        val f = fact.select(col(fk).cast("long").as("fk"))
        val orphans = f.join(dim.select(col(pk).cast("long").as("fk")).distinct(),
          Seq("fk"), "left_anti")
        f.agg(count(lit(1)).as("n_refs")).crossJoin(
          orphans.agg(count(lit(1)).as("n_orphans"),
            countDistinct(col("fk")).as("n_orphan_keys")))
          .select(lit(name).as("fk_name"),
            col("n_refs").cast("long").as("n_refs"),
            col("n_orphans").cast("long").as("n_orphans"),
            col("n_orphan_keys").cast("long").as("n_orphan_keys"))
      }
      Seq(
        check("lineitem.l_orderkey", t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey"),
        check("lineitem.l_partkey", t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        check("lineitem.l_suppkey", t(s, dir, "lineitem"), "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey"),
        check("orders.o_custkey", t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        check("customer.c_nationkey", t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"))
        .reduce(_.unionByName(_))
        .orderBy("fk_name")
    },
    Some("""SELECT 'customer.c_nationkey' AS fk_name,
                   (SELECT COUNT(*) FROM customer)::BIGINT AS n_refs,
                   (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
                     (SELECT n_nationkey FROM nation))::BIGINT AS n_orphans,
                   (SELECT COUNT(DISTINCT c_nationkey) FROM customer WHERE c_nationkey NOT IN
                     (SELECT n_nationkey FROM nation))::BIGINT AS n_orphan_keys
            UNION ALL
            SELECT 'lineitem.l_orderkey', (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
                     (SELECT o_orderkey FROM orders)),
                   (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem WHERE l_orderkey NOT IN
                     (SELECT o_orderkey FROM orders))
            UNION ALL
            SELECT 'lineitem.l_partkey', (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN
                     (SELECT p_partkey FROM part)),
                   (SELECT COUNT(DISTINCT l_partkey) FROM lineitem WHERE l_partkey NOT IN
                     (SELECT p_partkey FROM part))
            UNION ALL
            SELECT 'lineitem.l_suppkey', (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem WHERE l_suppkey NOT IN
                     (SELECT s_suppkey FROM supplier)),
                   (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem WHERE l_suppkey NOT IN
                     (SELECT s_suppkey FROM supplier))
            UNION ALL
            SELECT 'orders.o_custkey', (SELECT COUNT(*) FROM orders),
                   (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
                     (SELECT c_custkey FROM customer)),
                   (SELECT COUNT(DISTINCT o_custkey) FROM orders WHERE o_custkey NOT IN
                     (SELECT c_custkey FROM customer))
            ORDER BY fk_name"""))

  /** Completeness failure → closed-pattern diagnosis, end to end: a fact
    * table is PLANTED with two missing slabs (all of one nation across
    * every region × sector; one region × one sector across every nation),
    * [[graft.operators.Validation.missingAssociations]] recovers the
    * missing cross-product rows, and
    * [[graft.operators.Validation.minimalClosedPatterns]] compresses the
    * 39 missing combinations into the two patterns that CAUSED them — the
    * reference's Rust miner surface (rust/src/lib.rs:298-612 via
    * dsgrid/utils/dataset.py:241-291), re-expressed as levelwise
    * groupBy-count plans. The oracle derives the expected patterns
    * independently from the plant arithmetic (nation 7; region 2 × 'm1'),
    * not by replaying the miner. */
  val q260_missing_patterns = Q(
    "q260_missing_patterns",
    (s, dir) => {
      import graft.operators.Validation
      val nations = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val regions = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
      val geoRecs = nations.select(col("n_name").as("id"))
      val scenRecs = regions.select(col("r_name").as("id"))
      import s.implicits._
      val secRecs = Seq("m0", "m1", "m2").toDF("id")
      val cube = geoRecs.select(col("id").as("geography"))
        .crossJoin(scenRecs.select(col("id").as("scenario")))
        .crossJoin(secRecs.select(col("id").as("sector")))
      val slabG = nations.filter(col("n_nationkey") === 7)
        .select(col("n_name").as("geography"))
      val slabRS = regions.filter(col("r_regionkey") === 2)
        .select(col("r_name").as("scenario"), lit("m1").as("sector"))
      val data = cube
        .join(slabG, Seq("geography"), "left_anti")
        .join(slabRS, Seq("scenario", "sector"), "left_anti")
      val missing = Validation.missingAssociations(
        data, Seq("geography", "scenario", "sector"),
        Map("geography" -> geoRecs, "scenario" -> scenRecs, "sector" -> secRecs))
      Validation.minimalClosedPatterns(missing)
        .select(
          concat_ws("|", col("columns")).as("pattern_cols"),
          concat_ws("|", col("values")).as("pattern_vals"),
          col("num_rows").cast("long").as("num_rows"))
        .orderBy("pattern_cols", "pattern_vals")
    },
    Some("""SELECT 'geography' AS pattern_cols,
                   (SELECT n_name FROM nation WHERE n_nationkey = 7) AS pattern_vals,
                   15::BIGINT AS num_rows
            UNION ALL
            SELECT 'scenario|sector',
                   (SELECT r_name FROM region WHERE r_regionkey = 2) || '|m1',
                   25::BIGINT
            ORDER BY pattern_cols, pattern_vals"""))

  /** Deterministic grid-free quantile sketch end-to-end
    * (`Sketches.rankSampleSketch`, the Munro–Paterson rank-sampling
    * family): penny-exact lineitem prices shard by
    * xxhash64(orderkey·8+linenumber) into 32 cells, each cell keeps every
    * 64th value by local rank (ONE shuffle, no global sort), and the
    * inverted-CDF readback estimates p10/50/90/99. The sketch's rank
    * CONTRACT is pinned as data: count(v ≤ est) ≥ t' and
    * count(v < est) < t' + shards·step with t' = least(target, sketch
    * weight) — proven by exact filter-counts over the raw column. The
    * oracle replays shard-hash → per-cell rank sample → cumulative
    * readback → audit counts bit-for-bit (rank selection in a sorted
    * multiset is tie-order independent, which is what makes a SAMPLING
    * summary hash-matchable at all). */
  val q261_rank_sketch = Q(
    "q261_rank_sketch",
    (s, dir) => {
      import graft.operators.Sketches
      val shards = 32
      val step = 64
      val raw = t(s, dir, "lineitem")
        .select(
          round(col("l_extendedprice") * 100).cast("long").as("v"),
          (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("k"))
        .localCheckpoint(true) // counted + sketched + audited below
      val n = raw.count()
      val ps = Seq(10, 50, 90, 99)
      val sk = Sketches.rankSampleSketch(raw, "v", col("k"), shards, step)
      val q = Sketches.rankSampleQuantiles(sk, n, ps).collect()(0)
      val wTotal = q.getAs[Long]("w_total")
      val ests = ps.map(p => p -> q.getAs[Long](s"p$p"))
      // one distributed pass audits all four estimates' exact ranks
      val auditCols =
        ests.map { case (p, e) => sum(when(col("v") <= e, 1L).otherwise(0L)).as(s"le$p") } ++
          ests.map { case (p, e) => sum(when(col("v") < e, 1L).otherwise(0L)).as(s"lt$p") }
      val audit = raw.agg(auditCols.head, auditCols.tail: _*).collect()(0)
      import s.implicits._
      ests.map { case (p, e) =>
        val target = (n * p + 99) / 100
        val tp = math.min(target, wTotal)
        val le = audit.getAs[Long](s"le$p")
        val lt = audit.getAs[Long](s"lt$p")
        (p.toLong, e, target, le, (shards * step).toLong,
          le >= tp && lt < tp + shards * step)
      }.toDF("p", "est", "target", "exact_le", "bound", "ok")
        .orderBy("p")
    },
    Some {
      import graft.tools.OracleSql._
      val S = 32
      val step = 64
      val raw = "SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v, " +
        "l_orderkey * 8 + l_linenumber AS k FROM lineitem"
      val hashed = xxhash64LongStages(s"($raw)", "k", "kh", pfx = "__q")
      s"""WITH sh AS (SELECT v, ((kh % $S) + $S) % $S AS shard FROM ($hashed)),
          rn AS (SELECT v, shard, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY v) AS r FROM sh),
          sk AS MATERIALIZED (SELECT v, CAST($step AS BIGINT) AS w FROM rn WHERE r % $step = 0),
          cum AS (SELECT v, w, SUM(w) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM sk),
          tot AS (SELECT COUNT(*) AS n FROM sh),
          wt AS (SELECT COALESCE(SUM(w), 0) AS wt FROM sk),
          ps AS (SELECT * FROM (VALUES (10), (50), (90), (99)) t(p)),
          tgt AS (SELECT p, (n * p + 99) // 100 AS target,
                         LEAST((n * p + 99) // 100, wt) AS tp
                  FROM ps, tot, wt),
          est AS (SELECT p, target, tp,
                         (SELECT MIN(v) FROM cum WHERE c >= tgt.tp) AS est
                  FROM tgt)
          SELECT CAST(p AS BIGINT) AS p, est,
                 CAST(target AS BIGINT) AS target,
                 (SELECT COUNT(*) FROM sh WHERE v <= est.est) AS exact_le,
                 CAST(${S * step} AS BIGINT) AS bound,
                 ((SELECT COUNT(*) FROM sh WHERE v <= est.est) >= tp AND
                  (SELECT COUNT(*) FROM sh WHERE v < est.est) < tp + ${S * step}) AS ok
          FROM est ORDER BY p"""
    })

  val all: Seq[Q] = Seq(
    q01_agg, q02_filter, q03_join_agg, q04_mapping, q05_semi, q06_anti,
    q07_except, q08_intersect, q09_pivot, q10_unpivot, q11_peak, q12_topk,
    q13_time_agg, q14_units, q15_expr_arith, q16_expr_union, q17_scaling,
    q18_growth, q19_cross, q20_annual, q21_tz, q22_calendar_adjust, q23_json,
    q24_tokens, q25_quality, q26_dedup_exact, q27_ann_brute, q28_cos_neardup,
    q29_dedup_minhash, q30_lang, q31_dedup_simhash, q32_ann_ivf,
    q33_multimodal, q34_fingerprint, q35_index_time, q36_rep_period,
    q37_unpivot_nulls, q38_names, q39_count_distinct, q40_quality_features,
    q41_spine, q42_annual_multiplier, q43_csv_roundtrip, q44_project_query,
    q45_two_table, q46_resample, q47_prefilter, q48_geo_tz_report,
    q49_column_renames, q50_subset_filter, q51_supplemental_filter, q52_dst,
    q53_single_tz, q54_autopartition, q55_warehouse, q56_bucketed_join,
    q57_ann_ivf_exhaustive, q58_sessions, q59_partitioned_write, q60_pipeline,
    q61_moving_avg, q62_stats, q63_asof_join, q64_range_join,
    q65_stratified_sample, q66_shard_pack, q67_quantile_filter,
    q68_weighted_mix, q69_dedup_clusters, q70_json_roundtrip,
    q71_overwrite_inplace, q72_persist_intermediate, q73_interval_op,
    q74_time_consistency, q75_wrap_time, q76_external_tz, q77_vocab,
    q78_decontaminate, q79_redact, q80_session_tz, q81_line_dedup,
    q82_dedup_keep_best, q83_repetition, q84_gopher_filter, q85_semantic_dedup,
    q86_bm25, q87_span_dedup, q88_dedup_incremental, q89_bloom_screen,
    q90_lm_score, q91_split, q92_seq_pack, q93_unicode_norm, q94_bpe_train, q95_video, q96_stream_agg, q97_bpe_encode, q98_domain_cap,
    q99_mad_outliers, q100_gap_fill, q101_inverted_index, q102_temperature_mix,
    q103_json_props, q104_snapshot_diff, q105_salted_join,
    q106_funnel, q107_cohort_retention, q108_quantize,
    q109_collect_list, q110_read_recovery, q111_content_hash, q112_file_schema,
    q113_heavy_hitters, q114_hll_distinct, q115_edit_pairs, q116_salted_agg,
    q117_window_breadth, q118_zorder, q119_pagerank, q120_leakage_split,
    q121_stream_dedup, q122_rollup, q123_posexplode, q124_jl_projection,
    q125_hll_union, q126_profile, q127_orc_roundtrip, q128_cosine_pairs,
    q129_triangles, q130_stream_static, q131_scd2, q132_schema_evolution,
    q133_expectations, q134_merge_upsert, q135_pps_sample, q136_stream_state,
    q137_compaction, q138_cube, q139_bbit_minhash, q140_text_roundtrip,
    q141_incremental_refresh, q142_drift_tvd, q143_source_similarity,
    q144_stream_sessions, q145_dsir_weights, q146_rate_limit,
    q147_pseudonymize, q148_chunking, q149_variant_shred, q150_url_dedup,
    q151_tfidf_topk, q152_collocations, q153_quantile_sketch,
    q154_stream_join, q155_containment, q156_hard_negatives,
    q157_stream_neardup, q158_hybrid_rrf, q159_budget_fill, q160_html_strip,
    q161_link_extract, q162_trimmed_agg, q163_k_anonymity,
    q164_volume_anomaly, q165_embedding_audit, q166_code_switch,
    q167_chat_flatten, q168_kcore, q169_walks, q170_pref_cycles,
    q171_transitions, q172_seasonal_naive, q173_novelty, q174_domain_gate,
    q175_mmr, q176_oov, q177_temporal_split, q178_fertility,
    q179_topk_operator, q180_label_prop, q181_keywords, q182_attribution,
    q183_interarrival, q184_image_phash, q185_basket_lift, q186_char_entropy,
    q187_blocklist, q188_sql_surface, q189_time_travel, q190_stream_upsert,
    q191_rolling_distinct, q192_event_trigrams, q193_weekday_profile,
    q194_file_skipping, q195_quota_sample, q196_topk_pushdown,
    q197_volume_trend, q198_change_point, q199_epoch_plan,
    q200_sketch_fidelity, q201_mutual_knn, q202_decile_calibration,
    q203_skyline, q204_kmv_overlap, q205_hash_classifier, q206_lineage,
    q207_zipf, q208_pq_ann, q209_coreset, q210_ab_chisq, q211_video_neardup,
    q212_filter_funnel, q213_winnowing, q214_join_size_est,
    q215_hits, q216_sorted_neighborhood, q217_rendezvous,
    q218_randomized_response, q219_bloom_join, q220_skew_report,
    q221_stream_sliding, q222_concurrency, q223_audio_neardup,
    q224_interval_lookup, q225_group_sample, q226_dyadic_ewma, q227_winsorize, q228_misra_gries,
    q229_topic_segments, q230_window_topk_rewrite,
    q231_stream_interval, q232_time_weighted, q233_fixedwidth_source,
    q234_fixedwidth_write, q235_fixedwidth_agg_push, q236_skipgram_pairs,
    q237_naive_bayes, q238_observed_metrics, q239_forget_flow,
    q240_growth_curve, q241_spine_coverage, q242_plan_lint,
    q243_parquet_footers, q244_matryoshka, q245_txn_log,
    q246_windowed_funnel, q247_schema_match, q248_lag_audit,
    q249_centroid_matrix, q250_cbo_stats, q251_personalized_pr,
    q252_multiprobe_lsh, q253_incremental_cc, q254_bloom_fpp,
    q255_position_attribution, q256_bitmap_index, q257_histogram_join_est,
    q258_column_diff, q259_ri_audit, q260_missing_patterns, q261_rank_sketch)
}
