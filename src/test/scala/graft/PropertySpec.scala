package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.DatasetExpr
import graft.operators.DatasetExpr.{BinOp, Expr, Ref}
import graft.functions.Units

/** Property-based tests over the engine's pure (non-Spark) components —
  * fast, no session needed. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling (the scalatest-scalacheck bridge isn't in the
    * offline cache; seeded Gen sampling gives the same coverage). */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = samples(g).foreach(f)

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(Gen.zip(ga, gb)).foreach { case (a, b) => f(a, b) }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    samples(Gen.zip(ga, gb, gc)).foreach { case (a, b, c) => f(a, b, c) }

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    samples(Gen.zip(ga, gb, gc, gd)).foreach { case (a, b, c, d) => f(a, b, c, d) }

  // ------------------------------------------------------ expression parser

  private val genIdent: Gen[String] =
    for {
      h <- Gen.alphaLowerChar
      t <- Gen.listOfN(4, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
    } yield (h :: t).mkString

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genIdent.map(Ref)
    else
      Gen.frequency(
        3 -> genIdent.map(Ref),
        2 -> (for {
          op <- Gen.oneOf('+', '-', '*', '|')
          l <- genExpr(depth - 1)
          r <- genExpr(depth - 1)
        } yield BinOp(op, l, r)))

  /** Fully parenthesized printer — parsing it must reproduce the tree. */
  private def print(e: Expr): String = e match {
    case Ref(id) => id
    case BinOp(op, l, r) => s"(${print(l)} $op ${print(r)})"
  }

  test("parser round-trips arbitrary parenthesized expressions") {
    forAll(genExpr(4)) { e =>
      assert(DatasetExpr.parse(print(e)) == e)
    }
  }

  test("parser precedence: * over +/- over |, left associative") {
    forAll(genIdent, genIdent, genIdent) { (a, b, c) =>
      assert(DatasetExpr.parse(s"$a | $b * $c") == BinOp('|', Ref(a), BinOp('*', Ref(b), Ref(c))))
      assert(DatasetExpr.parse(s"$a - $b + $c") == BinOp('+', BinOp('-', Ref(a), Ref(b)), Ref(c)))
      assert(DatasetExpr.parse(s"$a + $b | $c") == BinOp('|', BinOp('+', Ref(a), Ref(b)), Ref(c)))
    }
  }

  // ---------------------------------------------------------- unit algebra

  private val energyUnits = Units.energyToKwh.keys.toSeq
  private val genEnergyUnit = Gen.oneOf(energyUnits)
  private val genValue = Gen.choose(-1e6, 1e6)

  test("unit conversion factors compose: a→b→a is identity, a→b→c == a→c") {
    forAll(genEnergyUnit, genEnergyUnit, genEnergyUnit, genValue) { (a, b, c, v) =>
      val fa = Units.energyToKwh(a)
      val fb = Units.energyToKwh(b)
      val fc = Units.energyToKwh(c)
      val ab = v * fa / fb
      val aba = ab * fb / fa
      assert(math.abs(aba - v) <= math.abs(v) * 1e-12 + 1e-12)
      val abc = ab * fb / fc
      val ac = v * fa / fc
      assert(math.abs(abc - ac) <= math.abs(ac) * 1e-9 + 1e-9)
    }
  }

  test("energy and power factor tables are positive and base-normalized") {
    assert(Units.energyToKwh("kWh") == 1.0)
    assert(Units.powerToKw("kW") == 1.0)
    assert(Units.energyToKwh.values.forall(_ > 0))
    assert(Units.powerToKw.values.forall(_ > 0))
  }

  // ------------------------------------------------------------ core types

  test("SqlTypes maps every reference type name, case-insensitively") {
    val names = Seq(
      "BOOLEAN", "INT", "INTEGER", "TINYINT", "SMALLINT", "BIGINT", "FLOAT",
      "DOUBLE", "TIMESTAMP_TZ", "TIMESTAMP_NTZ", "STRING", "TEXT", "VARCHAR")
    forAll(Gen.oneOf(names)) { n =>
      assert(graft.core.SqlTypes.fromName(n.toLowerCase) == graft.core.SqlTypes.fromName(n))
    }
    intercept[IllegalArgumentException](graft.core.SqlTypes.fromName("GEOMETRY"))
  }

  test("content hash is deterministic and collision-spread") {
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      assert(graft.query.Models.contentHash(a) == graft.query.Models.contentHash(a))
      if (a != b)
        // 64-bit-truncated SHA: inequality for distinct short strings
        assert(graft.query.Models.contentHash(a) != graft.query.Models.contentHash(b))
    }
  }

  test("canonical form of data-free queries is total and injective on structure") {
    import graft.query.Models._
    import graft.operators.DimensionFilter._
    val genFilter: Gen[graft.operators.DimensionFilter] = Gen.oneOf(
      Gen.zip(Gen.identifier, Gen.oneOf("==", "!=", ">", "<"), Gen.alphaNumStr)
        .map { case (c, o, v) => ExpressionFilter(c, o, v) },
      Gen.zip(Gen.identifier, Gen.listOfN(3, Gen.alphaNumStr))
        .map { case (c, vs) => ColumnOperatorFilter(c, "isin", vs) },
      Gen.zip(Gen.identifier, Gen.listOfN(2, Gen.identifier))
        .map { case (c, ds) => SubsetDimensionFilter(c, ds) })
    val genRef: Gen[DatasetRef] = Gen.zip(Gen.identifier, Gen.listOf(genFilter), Gen.listOf(
      Gen.zip(Gen.identifier, Gen.identifier).map { case (d, m) => DimensionMappingRef(d, m) }))
      .map { case (id, fs, ms) => DatasetRef(id, mappings = ms, filters = fs) }
    forAll(Gen.zip(genRef, genRef)) { case (a, b) =>
      // deterministic: same structure → same canonical
      assert(canonical(a) == canonical(a.copy()))
      // distinct structure → distinct canonical (case-class toString over
      // data-free fields is injective up to field separators here)
      if (a != b) assert(canonical(a) != canonical(b))
    }
  }

  test("BPE greedy merge: concatenation invariant, length accounting, no surviving pair") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val ref = BoundReference(0, ArrayType(StringType), nullable = true)
    // tiny alphabet so pairs actually occur
    val genSym = Gen.oneOf("a", "b", "ab", "c")
    val genArr = Gen.listOf(genSym).map(_.take(12))
    forAll(Gen.zip(genArr, genSym, genSym)) { case (syms, l, r) =>
      val expr = graft.plans.MergeAdjacentPair(ref, l, r)
      val in = new GenericArrayData(syms.map(UTF8String.fromString).toArray[Any])
      val out = expr.eval(InternalRow(in)).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
      // merging never changes the concatenated text
      assert(out.mkString == syms.mkString, s"$syms / ($l,$r)")
      // merges only ever shrink the array, at most halving it
      assert(out.length <= syms.length && out.length >= (syms.length + 1) / 2)
      // the single greedy pass leaves no adjacent (l, r) — with one rule,
      // the merged token l+r can never equal l or r (both non-empty)
      out.sliding(2).foreach {
        case Seq(x, y) => assert(!(x == l && y == r), s"surviving pair in $out from $syms ($l,$r)")
        case _ => ()
      }
    }
  }

  test("unicode normalization: idempotent per form, identity on ASCII") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val ref = BoundReference(0, StringType, nullable = true)
    val genPiece = Gen.oneOf("a", "\u00e9", "e\u0301", "\uFB01", "Z", " ", "\u0301", "x\u0308y")
    val genStr = Gen.listOf(genPiece).map(_.take(10).mkString)
    val forms = Seq("NFC", "NFD", "NFKC", "NFKD")
    forAll(Gen.zip(genStr, Gen.oneOf(forms))) { case (s, form) =>
      val expr = graft.plans.UnicodeNormalize(ref, form)
      def run(x: String): String =
        expr.eval(InternalRow(UTF8String.fromString(x))).asInstanceOf[UTF8String].toString
      val once = run(s)
      assert(run(once) == once, s"not idempotent: '$s' under $form")
      assert(once == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
    }
    forAll(Gen.alphaNumStr) { s =>
      assert(graft.plans.UnicodeNormalize(ref, "NFKD")
        .eval(InternalRow(UTF8String.fromString(s))).asInstanceOf[UTF8String].toString == s)
    }
  }
}
