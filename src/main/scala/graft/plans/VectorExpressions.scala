package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over `array<float>` / `array<double>`
  * embedding columns (accumulates in double either way, so float inputs
  * give identical results to casting up first).
  *
  * The built-in spelling — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — runs
  * interpreted (higher-order functions don't participate in whole-stage
  * codegen) and boxes every element; for ANN scoring that's the hot loop.
  * This is the one place the engine drops to a custom Catalyst `Expression`
  * (SURVEY §2.11 flagged it as the candidate): a tight primitive loop via
  * `doGenCode`, with an interpreted `nullSafeEval` for completeness.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fvec_dot requires array<float>/array<double> arguments, got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "fvec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloatArray(left.dataType)
    val rf = isFloatArray(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (isFloatArray(left.dataType)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloatArray(right.dataType)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the native vector functions; activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` (done by
  * GraftSession / Verify / Bench). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "fvec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "fvec_dot takes exactly 2 arguments")
        FloatVectorDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_sig takes (array<string>|array<long> shingles, int numHashes)")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig: numHashes must be an integer literal, got $other")
        }
        MinHashSignature(exprs.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64 takes (array<string> tokens)")
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "rolling_hash64 takes (array<string> tokens)")
        RollingHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("xxhash64_array"),
      new ExpressionInfo(classOf[XxHash64Array].getName, "xxhash64_array"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "xxhash64_array takes (array<string>)")
        XxHash64Array(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_window_hashes"),
      new ExpressionInfo(classOf[CharWindowHashes].getName, "char_window_hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "char_window_hashes takes (string text, int windowSize)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"char_window_hashes: windowSize must be an integer literal, got $other")
        }
        CharWindowHashes(exprs.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("window_hash64"),
      new ExpressionInfo(classOf[WindowHash64].getName, "window_hash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "window_hash64 takes (array<string> tokens, int windowSize)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"window_hash64: windowSize must be an integer literal, got $other")
        }
        WindowHash64(exprs.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "winnow_select takes (array<long> hashes, int windowSize)")
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_select: windowSize must be an integer literal, got $other")
        }
        WinnowSelect(exprs.head, w)
      }))
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "unicode_normalize takes (string text, string form)")
        val form = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize: form must be a string literal, got $other")
        }
        UnicodeNormalize(exprs.head, form)
      }))
    // the model-scoring trio, SQL-registered so the spark.sql route (q188)
    // reaches the model-based quality gate / LSH bucketing / centroid
    // assignment without the Column API; matrix arguments are foldable
    // array<array<double>> literals evaluated at resolution time — they
    // become codegen REFERENCE objects exactly like the Column route, so
    // plan size stays O(1) regardless of the matrix
    ext.injectFunction((
      FunctionIdentifier("hashed_linear_score"),
      new ExpressionInfo(classOf[HashedLinearScore].getName, "hashed_linear_score"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "hashed_linear_score takes (array<string> tokens, int buckets)")
        HashedLinearScore(exprs.head, GraftExtensions.intLiteral(exprs(1), "hashed_linear_score: buckets"))
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_centroid_idx"),
      new ExpressionInfo(classOf[NearestCentroidIndex].getName, "nearest_centroid_idx"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "nearest_centroid_idx takes (array<float|double> vector, array<array<double>> centroids)")
        NearestCentroidIndex(exprs.head,
          GraftExtensions.foldableDoubleMatrix(exprs(1), "nearest_centroid_idx: centroids"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "hyperplane_buckets takes (array<float|double> vector, array<array<double>> planes, int planesPerBand)")
        HyperplaneBuckets(exprs.head,
          GraftExtensions.foldableDoubleMatrix(exprs(1), "hyperplane_buckets: planes"),
          GraftExtensions.intLiteral(exprs(2), "hyperplane_buckets: planes_per_band"))
      }))
    // the Gopher quality-metric bundle for pure-SQL curation pipelines
    // (r15 VERDICT item 7): one struct of the per-row metrics, field
    // spellings value-equal to TextFunctions.gopherQualityColumns
    // (Round16OpsSpec pins it); thresholds are the SQL caller's
    ext.injectFunction((
      FunctionIdentifier("gopher_metrics"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "gopher_metrics"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "gopher_metrics takes (string text)")
        // the argument is substituted at EVERY placeholder (~18 metric
        // subexpressions) and therefore evaluated once per occurrence: a
        // non-deterministic argument would give each metric field an
        // independent draw (an internally inconsistent struct), so refuse
        // it loudly (r16 ADVICE item 4). The scan catches resolved
        // non-deterministic nodes and the parser-level spellings of the
        // common generators (unresolved functions report deterministic
        // because the default only consults children). Expensive
        // arguments should be materialized to a column first — the
        // per-occurrence evaluation is the documented contract.
        val nondet = exprs.head.exists {
          case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
            Set("rand", "randn", "random", "uuid", "shuffle",
              "monotonically_increasing_id").contains(
              f.nameParts.last.toLowerCase(java.util.Locale.ROOT))
          case e => e.resolved && !e.deterministic
        }
        require(!nondet,
          "gopher_metrics: argument must be deterministic — it is expanded " +
            "into every metric field and evaluated once per occurrence")
        // a parsed TEMPLATE with the argument substituted at the
        // placeholder attribute: a function registry needs a Catalyst
        // tree (Column nodes only resolve inside a Dataset), and the
        // analyzer's fixpoint resolves the template's inner functions
        // on later passes exactly like any macro-expanded expression
        val template = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(graft.text.TextFunctions.gopherMetricsSql("__gopher_arg"))
        template.transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.name == "__gopher_arg" => exprs.head
        }
      }))
    // plan LINTER (injectCheckRule): conf-gated guardrails that VETO
    // analysis-clean but cluster-hostile plans before execution —
    // spark.graft.lint.noCartesian rejects unconditioned cross joins
    // (the classic 100 TB footgun: a dropped join condition passes
    // analysis and melts the cluster). Opt-in, like every graft conf.
    ext.injectCheckRule(session => PlanLint.check(session))
    // SQL TABLE-VALUED function: the dense time spine every time-series
    // operator in this engine joins against (gap scoring, resampling,
    // EWMA/CUSUM monitors), exposed to SQL-text users as
    // `SELECT * FROM graft_time_spine(TIMESTAMP'...', TIMESTAMP'...', 3600)`.
    // Planned as a Catalyst Range + projection — the spine never
    // materializes driver-side, it is generated distributed like
    // `spark.range` (constant folding gives the planner its exact row
    // count). Bounds: [start, end) exclusive; arguments must be literals.
    ext.injectTableFunction((
      FunctionIdentifier("graft_time_spine"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_time_spine"),
      (exprs: Seq[Expression]) => TimeSpineTvf.plan(exprs)))
    // whole-operator extension: the bounded-heap top-k-per-group physical
    // operator (logical node + strategy + optimizer rule — see
    // graft.plans.TopKPerGroup)
    ext.injectPlannerStrategy(_ => new TopKPerGroup.TopKStrategy)
    ext.injectOptimizerRule(_ => TopKPerGroup.PushFilterThroughTopK)
    // opt-in (spark.graft.topk.rewriteWindow): window row_number()<=k plans
    // as the bounded-heap TopK operator
    ext.injectOptimizerRule(_ => TopKPerGroup.RewriteRowNumberTopK)
    // whole-operator extension #2: the broadcast interval-lookup join
    // (sorted disjoint intervals + binary-search probe — graft.plans.IntervalJoin)
    ext.injectPlannerStrategy(_ => new IntervalJoin.IntervalJoinStrategy)
    // materialized-view automatic query rewrite (registered MVs only;
    // see graft.plans.MaterializedView — staleness-checked roll-ups)
    ext.injectOptimizerRule(_ => MaterializedView.RewriteToMv)
    // SQL-text time travel over txn-log tables (Delta VERSION AS OF shape)
    ext.injectTableFunction((
      FunctionIdentifier("graft_txn_table"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_txn_table"),
      (exprs: Seq[Expression]) => TxnTableTvf.plan(exprs)))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types._

  private[plans] def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** A foldable `array<array<numeric>>` argument evaluated at function
    * resolution into the Seq[Seq[Double]] the centroid/plane expressions
    * take as a codegen reference object. Literal-built matrices
    * (`array(array(1.0d, ...), ...)`) are resolved and foldable by the
    * time function resolution runs; anything data-dependent is rejected —
    * a per-row matrix would defeat the constant-source codegen contract. */
  private[plans] def foldableDoubleMatrix(e: Expression, what: String): Seq[Seq[Double]] = {
    val inner = e.dataType match {
      case ArrayType(ArrayType(t @ (DoubleType | FloatType | IntegerType | LongType), _), _) => t
      case t => throw new IllegalArgumentException(s"$what must be array<array<double>>, got ${t.sql}")
    }
    require(e.resolved && e.foldable, s"$what must be a literal (foldable) matrix, got $e")
    val outer = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(outer != null, s"$what must not be NULL")
    (0 until outer.numElements()).map { i =>
      val row = outer.getArray(i)
      require(row != null, s"$what: row $i is NULL")
      (0 until row.numElements()).map { j =>
        inner match {
          case DoubleType => row.getDouble(j)
          case FloatType => row.getFloat(j).toDouble
          case IntegerType => row.getInt(j).toDouble
          case LongType => row.getLong(j).toDouble
          case _ => throw new IllegalStateException("unreachable")
        }
      }
    }
  }
}


/** Builder for the `graft_time_spine` SQL table function — see the
  * registration comment in [[GraftExtensions]]. */
object TimeSpineTvf {
  import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Literal, MicrosToTimestamp, Multiply}
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range => LRange}
  import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3,
      "graft_time_spine takes (timestamp start, timestamp end, bigint step_seconds)")
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"graft_time_spine: $what must be a literal")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    def micros(e: Expression, what: String): Long = {
      require(e.dataType == TimestampType, s"graft_time_spine: $what must be a TIMESTAMP")
      lit(e, what).asInstanceOf[Long]
    }
    val startUs = micros(exprs(0), "start")
    val endUs = micros(exprs(1), "end")
    val stepSec = exprs(2).dataType match {
      case LongType => lit(exprs(2), "step_seconds").asInstanceOf[Long]
      case IntegerType => lit(exprs(2), "step_seconds").asInstanceOf[Int].toLong
      case t => throw new IllegalArgumentException(
        s"graft_time_spine: step_seconds must be integral, got ${t.sql}")
    }
    require(stepSec >= 1, s"graft_time_spine: step_seconds $stepSec must be >= 1")
    val stepUs = stepSec * 1000000L
    val n = if (endUs <= startUs) 0L else (endUs - startUs + stepUs - 1) / stepUs
    val range = LRange(0, n, 1, None)
    val id = range.output.head
    Project(Seq(Alias(
      MicrosToTimestamp(Add(Literal(startUs), Multiply(id, Literal(stepUs)))), "ts")()),
      range)
  }
}


/** Builder for the `graft_txn_table` SQL table function — SQL-TEXT time
  * travel over a transaction-log table:
  * `SELECT ... FROM graft_txn_table('<logDir>', <version>)` resolves the
  * snapshot at that version WITH deletion vectors applied (version -1 =
  * current head). The files resolve at ANALYSIS time from literal
  * arguments — exactly Delta's `VERSION AS OF`, surfaced through the
  * `injectTableFunction` extension point, so pure-SQL users get the
  * whole versioned-table surface (and the MV rewrite can still
  * accelerate aggregates over DV-free snapshots underneath). */
object TxnTableTvf {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2, "graft_txn_table takes (string logDir, bigint version)")
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"graft_txn_table: $what must be a literal")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    require(exprs.head.dataType == StringType, "graft_txn_table: logDir must be a STRING")
    val logDir = lit(exprs.head, "logDir").toString
    val version = exprs(1).dataType match {
      case LongType => lit(exprs(1), "version").asInstanceOf[Long]
      case IntegerType => lit(exprs(1), "version").asInstanceOf[Int].toLong
      case t => throw new IllegalArgumentException(
        s"graft_txn_table: version must be integral, got ${t.sql}")
    }
    val spark = SparkSession.active
    val asOf =
      if (version == -1L) graft.sources.TxnLog.latestVersion(logDir).getOrElse(
        throw new IllegalArgumentException(s"graft_txn_table: no commits in $logDir"))
      else version
    org.apache.spark.sql.graft.PlanDataset.analyzed(
      graft.sources.TxnLog.readAsOfWithDeletes(spark, logDir, asOf))
  }
}


/** Conf-gated plan guardrails — see the registration comment. A check
  * rule runs after analysis on EVERY query of the session; lints must be
  * cheap (one plan traversal) and default OFF. */
object PlanLint {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
  import org.apache.spark.sql.catalyst.plans.Cross

  def check(session: SparkSession)(plan: LogicalPlan): Unit = {
    if (session.conf.get("spark.graft.lint.noCartesian", "false") == "true") {
      import org.apache.spark.sql.catalyst.plans.logical.{JoinHint, ResolvedHint}
      // a user broadcast hint on either side is the documented escape hatch
      // for a genuinely intended tiny cartesian — honor it (a hinted cross
      // join becomes BroadcastNestedLoopJoin, the bounded form) and veto
      // only the bare unconditioned cross. At check time (post-analysis,
      // pre-optimization) the hint is still a ResolvedHint CHILD node; it
      // only folds into Join.hint later, so test both encodings.
      def hinted(p: LogicalPlan): Boolean = p.isInstanceOf[ResolvedHint]
      plan.foreach {
        case j @ Join(l, r, Cross, None, JoinHint(None, None))
            if !hinted(l) && !hinted(r) =>
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              ("graft lint [noCartesian]: unconditioned CROSS JOIN vetoed — " +
                "at fleet scale this is almost always a dropped join condition; " +
                "add an ON clause, broadcast-hint a genuinely intended tiny " +
                "cartesian, or unset spark.graft.lint.noCartesian")))
        case _ => ()
      }
    }
  }
}
