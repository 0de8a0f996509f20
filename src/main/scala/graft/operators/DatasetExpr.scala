package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Constants.ValueColumn

/** Dataset-combination expressions: `+ - * |` over dataset ids, e.g.
  * `"comstock | resstock"` or `"(a - b) * c"`.
  *
  * The reference vendors a full infix-expression library for this
  * (dsgrid/utils/py_expression_eval, 847 LoC) but only uses four operators
  * (dataset_expression_handler.py:71-86); we implement a small
  * recursive-descent parser instead. `|` = union, `+ - *` = aligned-row
  * arithmetic: equi-join on all dimension columns, combine values, with the
  * reference's strict row-count equality checks
  * (dataset_expression_handler.py:17-48).
  */
object DatasetExpr {

  sealed trait Expr
  final case class Ref(id: String) extends Expr
  final case class BinOp(op: Char, left: Expr, right: Expr) extends Expr

  /** Grammar (Python operator precedence, matching the reference's vendored
    * infix evaluator where `|` binds loosest):
    * expr := sum ('|' sum)* ; sum := term (('+'|'-') term)* ;
    * term := factor ('*' factor)* ; factor := ident | '(' expr ')'. */
  def parse(input: String): Expr = {
    val tokens = tokenize(input)
    val (e, rest) = parseExpr(tokens)
    require(rest.isEmpty, s"trailing tokens: ${rest.mkString(" ")}")
    e
  }

  private def tokenize(s: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if ("+-*|()".contains(c)) { buf += c.toString; i += 1 }
      else {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
        require(i > start, s"unexpected character '${s(i)}' at $i")
        buf += s.substring(start, i)
      }
    }
    buf.toList
  }

  private def parseExpr(tokens: List[String]): (Expr, List[String]) = {
    var (left, rest) = parseSum(tokens)
    while (rest.headOption.contains("|")) {
      val (right, r2) = parseSum(rest.tail)
      left = BinOp('|', left, right)
      rest = r2
    }
    (left, rest)
  }

  private def parseSum(tokens: List[String]): (Expr, List[String]) = {
    var (left, rest) = parseTerm(tokens)
    while (rest.headOption.exists(t => t == "+" || t == "-")) {
      val op = rest.head.head
      val (right, r2) = parseTerm(rest.tail)
      left = BinOp(op, left, right)
      rest = r2
    }
    (left, rest)
  }

  private def parseTerm(tokens: List[String]): (Expr, List[String]) = {
    var (left, rest) = parseFactor(tokens)
    while (rest.headOption.contains("*")) {
      val (right, r2) = parseFactor(rest.tail)
      left = BinOp('*', left, right)
      rest = r2
    }
    (left, rest)
  }

  private def parseFactor(tokens: List[String]): (Expr, List[String]) = tokens match {
    case "(" :: rest =>
      val (e, r2) = parseExpr(rest)
      require(r2.headOption.contains(")"), "expected ')'")
      (e, r2.tail)
    case id :: rest if !"+-*|()".contains(id) => (Ref(id), rest)
    case other => throw new IllegalArgumentException(s"unexpected token: ${other.headOption.getOrElse("<eof>")}")
  }

  /** Evaluate against a map of dataset id → DataFrame. All frames must share
    * the same column set (verified, as the reference does at
    * query_submitter.py:527-542). */
  def evaluate(expression: String, datasets: Map[String, DataFrame], valueColumn: String = ValueColumn): DataFrame =
    eval(parse(expression), datasets, valueColumn)

  private def eval(e: Expr, datasets: Map[String, DataFrame], v: String): DataFrame = e match {
    case Ref(id) =>
      datasets.getOrElse(id, throw new IllegalArgumentException(s"unknown dataset: $id"))
    case BinOp('|', l, r) =>
      val (a, b) = (eval(l, datasets, v), eval(r, datasets, v))
      requireSameColumns(a, b)
      a.unionByName(b)
    case BinOp(op, l, r) =>
      val (a, b) = (eval(l, datasets, v), eval(r, datasets, v))
      requireSameColumns(a, b)
      arithmetic(a, b, op, v)
  }

  /** Aligned-row arithmetic: inner equi-join on every non-value column;
    * strict check that no rows were dropped (the reference asserts equal
    * counts before/after — dataset_expression_handler.py:28-40). The checks
    * cost three extra actions; at scale disable them via `strict=false` and
    * rely on registration-time completeness validation instead. */
  def arithmetic(
      a: DataFrame,
      b: DataFrame,
      op: Char,
      valueColumn: String = ValueColumn,
      strict: Boolean = true): DataFrame = {
    val keys = a.columns.filterNot(_ == valueColumn).toSeq
    val bRenamed = b.withColumnRenamed(valueColumn, "__graft_rhs")
    val joined = a.join(bRenamed, keys, "inner")
    if (strict) {
      val (na, nb, nj) = (a.count(), b.count(), joined.count())
      require(
        na == nb && nb == nj,
        s"misaligned dataset arithmetic: left=$na right=$nb joined=$nj")
    }
    val combined = op match {
      case '+' => col(valueColumn) + col("__graft_rhs")
      case '-' => col(valueColumn) - col("__graft_rhs")
      case '*' => col(valueColumn) * col("__graft_rhs")
      case other => throw new IllegalArgumentException(s"unsupported operator: $other")
    }
    joined.withColumn(valueColumn, combined).drop("__graft_rhs")
  }

  private def requireSameColumns(a: DataFrame, b: DataFrame): Unit =
    require(
      a.columns.sorted.sameElements(b.columns.sorted),
      s"column mismatch: ${a.columns.sorted.mkString(",")} vs ${b.columns.sorted.mkString(",")}")
}
