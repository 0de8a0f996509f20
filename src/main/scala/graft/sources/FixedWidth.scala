package graft.sources.fixedwidth

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-width-record file source as a full DataSource V2 implementation —
  * the remaining Spark extension surface beside the repo's expressions,
  * aggregates, logical/physical operators, and optimizer rules: a custom
  * `TableProvider` with REAL column pruning and filter pushdown, the two
  * contracts that decide whether a 100 TB scan reads what the query needs
  * or everything.
  *
  * Format: one record per line, columns at fixed byte offsets (the
  * mainframe/export interchange layout every enterprise pipeline still
  * meets). Schema comes from the `fields` option —
  * `name:width:type(,name:width:type)*`, types `long` | `string`; values
  * are space-trimmed within their slots.
  *
  * Scale design:
  *  - `SupportsPushDownRequiredColumns`: only the REQUIRED (plus
  *    filter-referenced) slots are ever parsed — pruning reaches the byte
  *    level, not just the row schema (`ReadSchema` in explain shows it);
  *  - `SupportsPushDownFilters`: comparison predicates on any field
  *    evaluate DURING the scan against the parsed slots, skipping
  *    non-matching lines before row materialization (`PushedFilters` in
  *    explain). Pushed filters are also RETURNED as post-scan filters —
  *    the DSv2 contract that keeps Spark re-checking, so a source bug can
  *    never silently widen results;
  *  - one `InputPartition` per file: splits parallelize across executors
  *    exactly like the built-in text source's file granularity.
  */
class FixedWidthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fixedwidth"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidthSource.schemaOf(FixedWidthSource.fieldsOf(options.get("fields")))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FixedWidthTable(FixedWidthSource.fieldsOf(opts.get("fields")), FixedWidthSource.pathOf(opts))
  }
}

object FixedWidthSource {
  /** (name, width, isLong, startOffset) */
  case class FieldSpec(name: String, width: Int, isLong: Boolean, start: Int)

  def fieldsOf(spec: String): Seq[FieldSpec] = {
    require(spec != null && spec.nonEmpty,
      "graft-fixedwidth: the 'fields' option is required (name:width:type,...)")
    var off = 0
    spec.split(",").toSeq.map { part =>
      val bits = part.trim.split(":")
      require(bits.length == 3, s"graft-fixedwidth: bad field spec '$part' (want name:width:type)")
      val width = bits(1).toInt
      require(width >= 1, s"graft-fixedwidth: field '${bits(0)}' width must be >= 1")
      val isLong = bits(2) match {
        case "long" => true
        case "string" => false
        case t => throw new IllegalArgumentException(
          s"graft-fixedwidth: field '${bits(0)}' type '$t' not supported (long|string)")
      }
      val f = FieldSpec(bits(0), width, isLong, off)
      off += width
      f
    }
  }

  def schemaOf(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(f => StructField(f.name, if (f.isLong) LongType else StringType)))

  def pathOf(opts: CaseInsensitiveStringMap): String = {
    val p = Option(opts.get("path")).orElse(Option(opts.get("paths"))).orNull
    require(p != null, "graft-fixedwidth: no path given")
    // .load(dir) passes a JSON array for multi-path; single path arrives plain
    if (p.startsWith("[")) p.stripPrefix("[\"").stripSuffix("\"]") else p
  }
}

class FixedWidthTable(fields: Seq[FixedWidthSource.FieldSpec], path: String)
    extends Table with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-fixedwidth:$path"
  override def schema(): StructType = FixedWidthSource.schemaOf(fields)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixedWidthScanBuilder(fields, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // column order/types must match the declared layout — a silent
    // re-order would scramble every slot downstream
    val expected = FixedWidthSource.schemaOf(fields)
    require(info.schema().map(f => (f.name, f.dataType)) == expected.map(f => (f.name, f.dataType)),
      s"graft-fixedwidth write: frame schema ${info.schema().simpleString} does not match " +
        s"the declared layout ${expected.simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new FixedWidthBatchWrite(fields, path)
      }
    }
  }
}

/** Append-mode batch write: each task streams its partition to one
  * `part-<partition>-<task>` file in the target directory (no tmp/rename
  * dance needed for the append-only contract; abort deletes the file).
  * Longs pad LEFT in their slot, strings pad RIGHT — the exact inverse of
  * the reader's trim, so the round-trip is value-exact; a value wider
  * than its slot REFUSES rather than silently truncating. */
class FixedWidthBatchWrite(fields: Seq[FixedWidthSource.FieldSpec], path: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    new FixedWidthWriterFactory(fields, path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class FixedWidthWriterFactory(fields: Seq[FixedWidthSource.FieldSpec], path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val file = new java.io.File(path, f"part-$partitionId%05d-$taskId")
      private val out = java.nio.file.Files.newBufferedWriter(
        file.toPath, java.nio.charset.StandardCharsets.UTF_8)

      private def pad(s: String, f: FixedWidthSource.FieldSpec): String = {
        require(s.length <= f.width,
          s"graft-fixedwidth write: value '$s' wider than field '${f.name}' width ${f.width}")
        if (f.isLong) (" " * (f.width - s.length)) + s
        else s + (" " * (f.width - s.length))
      }

      override def write(row: InternalRow): Unit = {
        val sb = new StringBuilder
        fields.zipWithIndex.foreach { case (f, i) =>
          // the format has no NULL marker (an all-blank long slot reads back
          // as 0, a blank string slot as "") — REFUSE rather than silently
          // conflate NULL with the zero value, same contract as overwidth
          require(!row.isNullAt(i),
            s"graft-fixedwidth write: NULL in field '${f.name}' — the format cannot represent NULLs")
          val s =
            if (f.isLong) String.valueOf(row.getLong(i))
            else row.getUTF8String(i).toString
          sb.append(pad(s, f))
        }
        out.write(sb.toString)
        out.write("\n")
      }

      override def commit(): WriterCommitMessage = { out.close(); new WriterCommitMessage {} }
      override def abort(): Unit = { out.close(); file.delete(); () }
      override def close(): Unit = ()
    }
}

class FixedWidthScanBuilder(fields: Seq[FixedWidthSource.FieldSpec], path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var required: StructType = FixedWidthSource.schemaOf(fields)
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None

  /** Aggregate pushdown (PARTIAL form — `supportCompletePushDown` stays
    * false, so Spark still runs the final merge): ungrouped COUNT(*) /
    * MIN / MAX over long fields fold per FILE inside the scan, and the
    * exchange carries one partial row per input partition instead of the
    * table. This is the DSv2 contract that turns `SELECT count(*),
    * max(k)` over a 100 TB export into a metadata-speed scan. Only fires
    * when no residual filters exist (Spark's own precondition — this
    * source intentionally reports all filters as residuals). */
  override def pushAggregation(agg: Aggregation): Boolean = {
    def longField(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        fields.exists(f => f.name == r.fieldNames.head && f.isLong)
      case _ => false
    }
    val ok = agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => longField(m.column)
        case m: Max => longField(m.column)
        case _ => false
      }
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  private def supported(f: Filter): Boolean = {
    val names = fields.map(_.name).toSet
    f match {
      case EqualTo(a, _) => names(a)
      case GreaterThan(a, _) => names(a)
      case GreaterThanOrEqual(a, _) => names(a)
      case LessThan(a, _) => names(a)
      case LessThanOrEqual(a, _) => names(a)
      case _ => false
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(supported)
    // return everything as post-scan residuals: Spark re-applies them, so
    // the scan-side skip is a pure optimization, never a correctness risk
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new FixedWidthAggScan(fields, path, agg)
    case None => new FixedWidthScan(fields, path, required, pushed)
  }
}

/** Scan for a pushed ungrouped aggregation: one partial row per file —
  * (count | min | max)* in the pushed order; Spark merges the partials. */
class FixedWidthAggScan(
    fields: Seq[FixedWidthSource.FieldSpec],
    path: String,
    agg: Aggregation) extends Scan with Batch {

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames.head

  override def readSchema(): StructType = StructType(agg.aggregateExpressions.map {
    case _: CountStar => StructField("count_star", LongType, nullable = false)
    case m: Min => StructField(s"min_${refName(m.column)}", LongType)
    case m: Max => StructField(s"max_${refName(m.column)}", LongType)
    case other => throw new IllegalStateException(s"unexpected pushed aggregate $other")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-fixedwidth path=$path, PushedAggregates: [${agg.aggregateExpressions.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(_.getAbsolutePath).sorted
      else Array(path)
    files.map(FixedWidthInputPartition(_)).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val specs: Array[(String, String)] = agg.aggregateExpressions.map {
      case _: CountStar => ("count", "")
      case m: Min => ("min", refName(m.column))
      case m: Max => ("max", refName(m.column))
      case other => throw new IllegalStateException(s"unexpected pushed aggregate $other")
    }
    new FixedWidthAggReaderFactory(fields, specs)
  }
}

class FixedWidthAggReaderFactory(
    fields: Seq[FixedWidthSource.FieldSpec],
    specs: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FixedWidthInputPartition].file
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      private val byName = fields.map(f => f.name -> f).toMap

      override def next(): Boolean = {
        if (done) return false
        val reader = java.nio.file.Files.newBufferedReader(
          java.nio.file.Paths.get(file), java.nio.charset.StandardCharsets.UTF_8)
        var count = 0L
        val mins = Array.fill(specs.length)(Long.MaxValue)
        val maxs = Array.fill(specs.length)(Long.MinValue)
        try {
          var line = reader.readLine()
          while (line != null) {
            if (line.nonEmpty) {
              count += 1
              var i = 0
              while (i < specs.length) {
                val (kind, col) = specs(i)
                if (kind != "count") {
                  val f = byName(col)
                  val end = math.min(f.start + f.width, line.length)
                  val s = if (f.start >= line.length) "" else line.substring(f.start, end).trim
                  val v = if (s.isEmpty) 0L else s.toLong
                  if (v < mins(i)) mins(i) = v
                  if (v > maxs(i)) maxs(i) = v
                }
                i += 1
              }
            }
            line = reader.readLine()
          }
        } finally reader.close()
        val values: Seq[Any] = specs.toSeq.zipWithIndex.map {
          case (("count", _), _) => Long.box(count)
          case (("min", _), i) => if (count == 0) null else Long.box(mins(i))
          case (("max", _), i) => if (count == 0) null else Long.box(maxs(i))
          case other => throw new IllegalStateException(s"unexpected spec $other")
        }
        row = InternalRow.fromSeq(values)
        done = true
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

class FixedWidthScan(
    fields: Seq[FixedWidthSource.FieldSpec],
    path: String,
    required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-fixedwidth path=$path, PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(_.getAbsolutePath).sorted
      else Array(path)
    files.map(FixedWidthInputPartition(_)).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(fields, required.fieldNames.toSeq, pushed)
}

case class FixedWidthInputPartition(file: String) extends InputPartition

class FixedWidthReaderFactory(
    fields: Seq[FixedWidthSource.FieldSpec],
    requiredNames: Seq[String],
    pushed: Array[Filter]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FixedWidthInputPartition].file
    new PartitionReader[InternalRow] {
      private val reader = java.nio.file.Files.newBufferedReader(
        java.nio.file.Paths.get(file), java.nio.charset.StandardCharsets.UTF_8)
      private val byName = fields.map(f => f.name -> f).toMap
      private val outFields = requiredNames.map(byName)
      private val filterFields = pushed.flatMap {
        case EqualTo(a, _) => Some(a)
        case GreaterThan(a, _) => Some(a)
        case GreaterThanOrEqual(a, _) => Some(a)
        case LessThan(a, _) => Some(a)
        case LessThanOrEqual(a, _) => Some(a)
        case _ => None
      }.distinct.map(byName)
      private var current: InternalRow = _

      private def slot(line: String, f: FixedWidthSource.FieldSpec): String = {
        val end = math.min(f.start + f.width, line.length)
        if (f.start >= line.length) "" else line.substring(f.start, end).trim
      }

      private def parsed(line: String, f: FixedWidthSource.FieldSpec): Any = {
        val s = slot(line, f)
        if (f.isLong) (if (s.isEmpty) 0L else s.toLong) else s
      }

      private def passes(line: String): Boolean = pushed.forall { flt =>
        def v(a: String): Any = parsed(line, byName(a))
        def cmpLong(a: String, x: Any)(op: (Long, Long) => Boolean): Boolean =
          v(a) match { case l: Long => op(l, x.asInstanceOf[Number].longValue); case _ => true }
        // compare in UTF8String (UTF-8 binary) order — Spark evaluates the
        // returned residual on UTF8String, and java.lang.String's UTF-16
        // code-unit order diverges for non-BMP code points (U+10000 sorts
        // below U+FFFD in UTF-16 but above it in UTF-8); a scan-side skip
        // under the wrong order would be an unrecoverable false drop
        def cmpStr(a: String, x: Any)(op: (Int, Int) => Boolean): Boolean =
          v(a) match {
            case s: String =>
              op(UTF8String.fromString(s).compareTo(UTF8String.fromString(x.toString)), 0)
            case _ => true
          }
        flt match {
          case EqualTo(a, x) => v(a) match {
            case l: Long => x.isInstanceOf[Number] && l == x.asInstanceOf[Number].longValue
            case s: String => s == x.toString
          }
          case GreaterThan(a, x) if byName(a).isLong => cmpLong(a, x)(_ > _)
          case GreaterThanOrEqual(a, x) if byName(a).isLong => cmpLong(a, x)(_ >= _)
          case LessThan(a, x) if byName(a).isLong => cmpLong(a, x)(_ < _)
          case LessThanOrEqual(a, x) if byName(a).isLong => cmpLong(a, x)(_ <= _)
          case GreaterThan(a, x) => cmpStr(a, x)(_ > _)
          case GreaterThanOrEqual(a, x) => cmpStr(a, x)(_ >= _)
          case LessThan(a, x) => cmpStr(a, x)(_ < _)
          case LessThanOrEqual(a, x) => cmpStr(a, x)(_ <= _)
          case _ => true
        }
      }

      override def next(): Boolean = {
        var line = reader.readLine()
        while (line != null && !(line.nonEmpty && passes(line))) line = reader.readLine()
        if (line == null) { current = null; false }
        else {
          val values = outFields.map { f =>
            parsed(line, f) match {
              case l: Long => Long.box(l)
              case s: String => UTF8String.fromString(s)
            }
          }
          current = InternalRow.fromSeq(values)
          true
        }
      }

      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
  }
}
