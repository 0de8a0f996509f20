package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** ANALYZE-style table profiling: one row per column with rowcount, null
  * count, exact distinct count, and (for integer-typed columns) min/max —
  * the statistics that drive size estimation, skew detection, and
  * broadcast decisions.
  *
  * Shape: ONE aggregation job computes every column's stats in a single
  * pass (count/count-distinct/min/max all partial-aggregate map-side);
  * the per-column unpivot to rows happens on the one-row result, not the
  * data. An exact ndv per column is a real (if partial-aggregated)
  * shuffle per distinct-count — at 100 TB swap in
  * [[Sketches.hllRegisters]] per column instead; exact is the point here
  * because the profile doubles as an oracle-checkable operator.
  *
  * Min/max are reported only for integer families (BIGINT-safe): float
  * and timestamp renderings differ across engines, and a profile exists
  * to be compared.
  */
object TableStats {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    val isIntegral = columns.map { c =>
      c -> (schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }.toMap
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__ndv_$c")) ++
        (if (isIntegral(c))
           Seq(min(col(c)).cast("long").as(s"__min_$c"), max(col(c)).cast("long").as(s"__max_$c"))
         else Nil)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").cast("long").as("n"),
        col(s"__nulls_$c").cast("long").as("nulls"),
        col(s"__ndv_$c").cast("long").as("ndv"),
        (if (isIntegral(c)) col(s"__min_$c") else lit(null).cast("long")).as("min_long"),
        (if (isIntegral(c)) col(s"__max_$c") else lit(null).cast("long")).as("max_long"))
    }
    one
      .select(explode(array(rows: _*)).as("__graft_r"))
      .select(
        col("__graft_r.col_name").as("col_name"), col("__graft_r.n").as("n"),
        col("__graft_r.nulls").as("nulls"), col("__graft_r.ndv").as("ndv"),
        col("__graft_r.min_long").as("min_long"), col("__graft_r.max_long").as("max_long"))
  }

  /** Dictionary-encoding storage planner — the per-column layout decision
    * every columnar writer makes, surfaced as a queryable plan: for each
    * string column, exact plain bytes (Σ octet lengths) versus dictionary
    * bytes (Σ distinct-value octet lengths + n·⌈log₂ ndv⌉ bits of codes,
    * byte-rounded), with the recommendation. The code width uses the
    * integer floor-log idiom (length(bin(ndv−1)) — bit-stable in both
    * engines); ndv ≤ 1 needs 0 bits. NULLs carry 0 plain bytes and join
    * the dictionary as one 0-byte entry (matching parquet's null-aware
    * dictionaries closely enough for a PLANNER).
    *
    * One aggregation per column over (value) groups — the distinct pass —
    * then a one-row fold; columns union into one report. Cost: one scan
    * per column's group-by (the ndv pass is inherent to the question). */
  def encodingPlan(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "encodingPlan: at least one column")
    require(cols.forall(df.columns.contains),
      s"encodingPlan: missing columns in ${df.columns.mkString(",")}")
    cols.map { c =>
      df.select(col(c).cast("string").as("__graft_v"))
        .groupBy("__graft_v")
        .agg(count(lit(1)).as("__graft_n"),
          coalesce(octet_length(col("__graft_v")), lit(0)).cast("long").as("__graft_len"))
        .agg(
          sum(col("__graft_n")).cast("long").as("n"),
          count(lit(1)).cast("long").as("ndv"),
          sum(col("__graft_n") * col("__graft_len")).cast("long").as("plain_bytes"),
          sum(col("__graft_len")).cast("long").as("__graft_dict_values"))
        .withColumn("__graft_bits",
          when(col("ndv") <= 1L, 0L)
            .otherwise((length(bin(col("ndv") - 1))).cast("long")))
        .withColumn("dict_bytes",
          (col("__graft_dict_values") +
            expr("(n * __graft_bits + 7) div 8")).cast("long"))
        .select(lit(c).as("col_name"), col("n"), col("ndv"),
          col("plain_bytes"), col("dict_bytes"),
          (col("dict_bytes") < col("plain_bytes")).as("use_dictionary"))
    }.reduce(_ unionByName _)
  }

  /** Functional-dependency discovery over a column set — the schema-
    * profiling step of data integration / normalization audits: for every
    * ordered pair (lhs, rhs), lhs → rhs holds when no lhs value maps to
    * two distinct rhs values. Reports per pair the lhs group count, the
    * VIOLATING group count, and the verdict — "o_orderkey → everything"
    * falls out as the key; near-dependencies (few violating groups)
    * are the denormalization candidates.
    *
    * Shape: ONE pass explodes each row to its k·(k−1) ordered pairs
    * (pair id, lhs value, rhs value) and a single (pair, lhs-value)
    * aggregate counts distinct rhs — the k² blow-up is per ROW and
    * immediately partially aggregated, the same no-join discipline as the
    * Gram matrix; NULL rhs values count as a value (a group mapping to
    * {x, NULL} is a real violation). Column values are compared through
    * their canonical string forms (one exploded value column needs one
    * type) — two values collide only if their renderings do, acceptable
    * for a PROFILING verdict and replayed identically by the oracle. */
  def fdViolations(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.size >= 2, "fdViolations: need at least two columns")
    require(columns.forall(df.columns.contains),
      s"fdViolations: missing columns in ${df.columns.mkString(",")}")
    val pairs = for {
      a <- columns; b <- columns if a != b
    } yield (a, b)
    val exploded = df.select(explode(array(pairs.map { case (a, b) =>
      struct(lit(s"$a->$b").as("fd"),
        col(a).cast("string").as("lhs"), col(b).cast("string").as("rhs"))
    }: _*)).as("__graft_p"))
      .select(col("__graft_p.fd").as("fd"), col("__graft_p.lhs").as("lhs"),
        col("__graft_p.rhs").as("rhs"))
    exploded
      .groupBy("fd", "lhs")
      .agg(count_distinct(col("rhs")).as("__graft_ndv"),
        sum(when(col("rhs").isNull, 1L).otherwise(0L)).as("__graft_nulls"))
      .withColumn("__graft_distinct_rhs",
        col("__graft_ndv") + when(col("__graft_nulls") > 0L, 1L).otherwise(0L))
      .groupBy("fd")
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(when(col("__graft_distinct_rhs") > 1L, 1L).otherwise(0L))
          .cast("long").as("n_violating"))
      .withColumn("holds", col("n_violating") === 0L)
  }

  /** Per-column Shannon entropy of the VALUE distribution in fixed-point
    * log₂ — the information-content row of a table profile (uniqueness ≈
    * log₂ n bits, constants = 0; feeds key discovery, join-cardinality
    * sanity, and compression planning next to [[encodingPlan]]): with
    * value counts c over n rows, H = log₂ n − (1/n)·Σ c·log₂ c, carried
    * exactly as h_num = n·flog2fp(n) − Σ c·flog2fp(c) (≈ 16·n·H) and
    * reported as entropy_ubits = h_num·10⁶ div (16·n) — micro-bits,
    * engine-stable like every fixed-point-log₂ score in this library.
    * NULL is its own value (a 99%-NULL column is LOW entropy, which is
    * the profiling answer one wants). One stack-unpivot scan + a census
    * aggregate per column — value strings shuffle once. */
  def columnEntropy(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "columnEntropy: at least one column")
    require(columns.forall(df.columns.contains),
      s"columnEntropy: missing columns in ${df.columns.mkString(",")}")
    val stackArgs = columns
      .map(c => s"'$c', CAST(`$c` AS STRING)")
      .mkString(", ")
    val census = df
      .select(expr(s"stack(${columns.size}, $stackArgs)").as(Seq("column", "val")))
      .groupBy(col("column"), col("val"))
      .agg(count(lit(1)).as("__ts_c"))
    census
      .groupBy(col("column"))
      .agg(
        sum(col("__ts_c")).as("n"),
        count(lit(1)).as("ndv"),
        sum(col("__ts_c") * graft.operators.Linkage.flog2fp(col("__ts_c"))).as("__ts_sc"))
      .withColumn("h_num",
        col("n") * graft.operators.Linkage.flog2fp(col("n")) - col("__ts_sc"))
      .transform(d => RankStats.withPpm(d, col("h_num"), lit(16L) * col("n"),
        "entropy_ubits"))
      .drop("__ts_sc")
  }

  /** Mutual information between two columns in fixed-point log₂ —
    * the dependence row of the profile (feature selection, FD-discovery's
    * soft sibling: MI ≈ 0 ⇒ independent, MI ≈ min(H_x, H_y) ⇒ one
    * determines the other; compare against [[fdViolations]]'s hard
    * verdict and [[columnEntropy]]'s marginals): MI = Σ p_xy·log₂(n·c_xy
    * /(c_x·c_y)) carried exactly as mi_num = Σ c_xy·(flog2fp(n·c_xy) −
    * flog2fp(c_x·c_y)) ≈ 16·n·MI, reported as mi_ubits = mi_num·10⁶ div
    * (16·n). Individual terms CAN be negative (the fixed-point floor
    * keeps them exact either way); the total sits within ±n of the true
    * 16n·MI. Three censuses (joint + two marginals, each one shuffle)
    * and a joint-census-sized join — rows never pair. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    require(df.columns.contains(xCol) && df.columns.contains(yCol),
      s"mutualInformation: missing columns in ${df.columns.mkString(",")}")
    val joint = df
      .groupBy(col(xCol).cast("string").as("__ts_x"), col(yCol).cast("string").as("__ts_y"))
      .agg(count(lit(1)).as("__ts_cxy"))
      .localCheckpoint(true) // feeds both marginals AND the final join
    // null-safe (<=>) joins: NULL is a legitimate profile value (the
    // columnEntropy convention) and a plain equi-join would silently drop
    // every NULL-keyed census row
    val mx = joint.groupBy(col("__ts_x").as("__ts_x2"))
      .agg(sum(col("__ts_cxy")).as("__ts_cx"))
    val my = joint.groupBy(col("__ts_y").as("__ts_y2"))
      .agg(sum(col("__ts_cxy")).as("__ts_cy"))
    val n = joint.agg(sum(col("__ts_cxy"))).head().getLong(0)
    joint
      .join(mx, col("__ts_x") <=> col("__ts_x2"))
      .join(my, col("__ts_y") <=> col("__ts_y2"))
      .agg(
        lit(n).as("n"),
        count(lit(1)).as("ndv_joint"),
        sum(col("__ts_cxy") *
          (graft.operators.Linkage.flog2fp(col("__ts_cxy") * lit(n)) -
            graft.operators.Linkage.flog2fp(col("__ts_cx") * col("__ts_cy"))))
          .as("mi_num"))
      .transform(d => RankStats.withPpm(d, col("mi_num"), lit(16L) * col("n"), "mi_ubits"))
  }
}
