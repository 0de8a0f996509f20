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

import graft.QueryDsl._

/** Catalog chunk q01-q29 (registration + docs in [[graft.Queries]]). */
private[graft] object Catalog1 {

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

  val all: Seq[Q] = Seq(
    q01_agg, q02_filter, q03_join_agg, q04_mapping,
    q05_semi, q06_anti, q07_except, q08_intersect,
    q09_pivot, q10_unpivot, q11_peak, q12_topk,
    q13_time_agg, q14_units, q15_expr_arith, q16_expr_union,
    q17_scaling, q18_growth, q19_cross, q20_annual,
    q21_tz, q22_calendar_adjust, q23_json, q24_tokens,
    q25_quality, q26_dedup_exact, q27_ann_brute, q28_cos_neardup,
    q29_dedup_minhash)
}
