package graft.tools

/** DuckDB-SQL generator for XXH64(seed=42) — the hash behind Spark's
  * `xxhash64` — so hash-bearing queries (simhash signatures, rolling
  * fingerprints) get REAL value-level oracles instead of rows-only checks.
  *
  * The driver's correctness gate runs each oracle as plain SQL in DuckDB;
  * no UDF registration hook exists there, so the hash must be expressible
  * as a single SQL statement. That works because every XXH64 multiply is
  * by a constant: `(x*c) mod 2^64` decomposes into 32-bit halves in
  * HUGEINT, rotations become disjoint shift-adds, and the 32-byte stripe
  * loop becomes a `list_reduce` over per-stripe lane lists with the
  * accumulator state prepended (DuckDB's reduce takes no initial value).
  * Byte access goes through `hex(encode(s))` + `substr`, so any UTF-8
  * input hashes correctly. Each sequential step of the tail (at most
  * three 8-byte chunks, one 4-byte chunk, seven bytes) is one generated
  * SELECT stage naming its intermediate, which keeps the expression tree
  * linear instead of exponentiating through nested rotl/mul expansions.
  *
  * Validated bit-exact against `org.apache.spark.sql.functions.xxhash64`
  * over all documents tokens + full normalized texts at sf0.01 and every
  * length-boundary case (0, 1..8, 31, 32, 33, 63, 64, 65 bytes); the
  * equivalence is additionally pinned by the q31/q34 correctness rows. */
object OracleSql {

  private val M64 = "18446744073709551616::HUGEINT"
  private val P1 = java.lang.Long.parseUnsignedLong("11400714785074694791")
  private val P2 = java.lang.Long.parseUnsignedLong("14029467366897019727")
  private val P3 = 1609587929392839161L
  private val P4 = java.lang.Long.parseUnsignedLong("9650029242287828579")
  private val P5 = 2870177450012600261L
  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)
  // seed-42 initial accumulators and the <32-byte base, all mod 2^64
  private val V1 = u(42L + P1 + P2)
  private val V2 = u(42L + P2)
  private val V3 = "42"
  private val V4 = u(42L - P1)
  private val H0Small = u(42L + P5)

  /** (x * c) mod 2^64 for a constant multiplier, via 32-bit split. */
  private def mulc(x: String, c: Long): String =
    s"CAST(((($x) % 4294967296)::HUGEINT * ${u(c)} + " +
      s"(((($x) // 4294967296)::HUGEINT * ${u(c)}) % 4294967296) * 4294967296) " +
      s"% $M64 AS UBIGINT)"

  private def addm(a: String, b: String): String =
    s"CAST((($a)::HUGEINT + ($b)) % $M64 AS UBIGINT)"

  /** rotl(x, r): the shifted-out and shifted-in parts occupy disjoint
    * bits, so plain + replaces the |. */
  private def rotl(x: String, r: Int): String =
    s"(CAST((($x)::HUGEINT * ${u(1L << r)}) % $M64 AS UBIGINT) + (($x) >> ${64 - r}))"

  private def xor(a: String, b: String): String = s"xor($a, $b)"

  private def rnd(acc: String, lane: String): String =
    mulc(rotl(addm(acc, mulc(lane, P2)), 31), P1)

  private def rnd0(v: String): String = mulc(rotl(mulc(v, P2), 31), P1)

  /** Little-endian word of `bytes` hex-pairs at 0-based byte offset `o`. */
  private def word(hx: String, o: String, bytes: Int): String = {
    val parts = (bytes - 1) to 0 by -1 map { j =>
      s"substr($hx, (2*($o)+${2 * j + 1})::BIGINT, 2)"
    }
    s"('0x' || ${parts.mkString(" || ")})::UBIGINT"
  }

  /** Wraps relation SQL `rel` (exposing varchar column `src`) in stages
    * that add signed-BIGINT column `out` = xxhash64(src); all intermediate
    * columns (prefixed `pfx`) are dropped from the result. */
  def xxhash64Stages(rel: String, src: String, out: String, pfx: String = "__x"): String = {
    val hx = s"${pfx}hx"
    val n = s"${pfx}n"
    val dropped = scala.collection.mutable.ArrayBuffer(hx)
    var q = rel
    def wrap(expr: String, col: String, keep: Boolean = false): Unit = {
      q = s"SELECT *, $expr AS $col FROM ($q)"
      if (!keep) dropped += col
    }
    q = s"SELECT *, hex(encode($src)) AS $hx FROM ($rel)"
    wrap(s"octet_length(encode($src))::UBIGINT", n)
    // stripe list: one [lane1..lane4] entry per full 32-byte block
    wrap(
      s"CASE WHEN $n >= 32 THEN list_transform(range(($n // 32)::BIGINT), ${pfx}s -> " +
        s"[${word(hx, s"32*${pfx}s", 8)}, ${word(hx, s"32*${pfx}s+8", 8)}, " +
        s"${word(hx, s"32*${pfx}s+16", 8)}, ${word(hx, s"32*${pfx}s+24", 8)}]) ELSE [] END",
      s"${pfx}st")
    wrap(
      s"list_reduce([[$V1,$V2,$V3,$V4]::UBIGINT[]] || ${pfx}st, (${pfx}a, ${pfx}l) -> [" +
        (1 to 4).map(k => rnd(s"${pfx}a[$k]", s"${pfx}l[$k]")).mkString(", ") + "])",
      s"${pfx}f")
    wrap(
      addm(addm(addm(rotl(s"${pfx}f[1]", 1), rotl(s"${pfx}f[2]", 7)),
        rotl(s"${pfx}f[3]", 12)), rotl(s"${pfx}f[4]", 18)),
      s"${pfx}m0")
    for (k <- 1 to 4)
      wrap(addm(mulc(xor(s"${pfx}m${k - 1}", rnd0(s"${pfx}f[$k]")), P1), u(P4)), s"${pfx}m$k")
    wrap(s"CASE WHEN $n >= 32 THEN ${pfx}m4 ELSE $H0Small::UBIGINT END", s"${pfx}hb")
    wrap(addm(s"${pfx}hb", n), s"${pfx}h0")
    wrap(s"($n // 32) * 32", s"${pfx}base")
    // at most three 8-byte tail chunks
    for (j <- 0 until 3) {
      val off = s"${pfx}base + ${8 * j}"
      wrap(s"CASE WHEN $off + 8 <= $n THEN ${word(hx, off, 8)} ELSE 0::UBIGINT END", s"${pfx}w$j")
      val step = addm(mulc(rotl(xor(s"${pfx}h$j", rnd0(s"${pfx}w$j")), 27), P1), u(P4))
      wrap(s"CASE WHEN $off + 8 <= $n THEN $step ELSE ${pfx}h$j END", s"${pfx}h${j + 1}")
    }
    wrap(s"${pfx}base + 8 * (($n - ${pfx}base) // 8)", s"${pfx}o4")
    val step4 = addm(mulc(rotl(xor(s"${pfx}h3", mulc(word(hx, s"${pfx}o4", 4), P1)), 23), P2), u(P3))
    wrap(s"CASE WHEN ${pfx}o4 + 4 <= $n THEN $step4 ELSE ${pfx}h3 END", s"${pfx}g0")
    wrap(s"${pfx}o4 + CASE WHEN ${pfx}o4 + 4 <= $n THEN 4 ELSE 0 END", s"${pfx}ob")
    // at most seven single-byte tail steps
    for (j <- 0 until 7) {
      val off = s"${pfx}ob + $j"
      val stepb = mulc(rotl(xor(s"${pfx}g$j", mulc(word(hx, off, 1), P5)), 11), P1)
      wrap(s"CASE WHEN $off < $n THEN $stepb ELSE ${pfx}g$j END", s"${pfx}g${j + 1}")
    }
    wrap(mulc(xor(s"${pfx}g7", s"${pfx}g7 >> 33"), P2), s"${pfx}a1")
    wrap(mulc(xor(s"${pfx}a1", s"${pfx}a1 >> 29"), P3), s"${pfx}a2")
    wrap(xor(s"${pfx}a2", s"${pfx}a2 >> 32"), s"${pfx}u")
    wrap(
      s"CASE WHEN ${pfx}u >= 9223372036854775808 " +
        s"THEN CAST(${pfx}u::HUGEINT - $M64 AS BIGINT) ELSE CAST(${pfx}u AS BIGINT) END",
      out, keep = true)
    s"SELECT * EXCLUDE (${dropped.mkString(", ")}) FROM ($q)"
  }

  /** XXH64 of ONE BIGINT input (Spark's `xxhash64(longCol)`: the 8
    * little-endian bytes of the two's-complement value) — the fixed-width
    * special case of [[xxhash64Stages]]: no hex/substr byte machinery, no
    * stripe loop, just h0 = seed+P5+8, one 8-byte merge, avalanche. ~6
    * stages instead of ~40, which is what keeps BIGINT-keyed sketch
    * oracles (q113/q114/q125) inside the gate's time budget.
    *
    * `seed` is a SQL expression in `rel`'s scope yielding the UNSIGNED
    * 64-bit seed (default 42). Spark chains multi-argument xxhash64 by
    * seeding each argument's hash with the previous SIGNED result —
    * convert with [[unsignedOf]] when chaining. */
  def xxhash64LongStages(
      rel: String,
      src: String,
      out: String,
      pfx: String = "__l",
      seed: String = "42"): String = {
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    var q = rel
    def wrap(expr: String, col: String, keep: Boolean = false): Unit = {
      q = s"SELECT *, $expr AS $col FROM ($q)"
      if (!keep) dropped += col
    }
    wrap(unsignedOf(src), s"${pfx}u")
    wrap(addm(addm(s"($seed)::UBIGINT", u(P5)), "8"), s"${pfx}h0")
    wrap(addm(mulc(rotl(xor(s"${pfx}h0", rnd0(s"${pfx}u")), 27), P1), u(P4)), s"${pfx}h1")
    wrap(mulc(xor(s"${pfx}h1", s"${pfx}h1 >> 33"), P2), s"${pfx}a1")
    wrap(mulc(xor(s"${pfx}a1", s"${pfx}a1 >> 29"), P3), s"${pfx}a2")
    wrap(xor(s"${pfx}a2", s"${pfx}a2 >> 32"), s"${pfx}v")
    wrap(
      s"CASE WHEN ${pfx}v >= 9223372036854775808 " +
        s"THEN CAST(${pfx}v::HUGEINT - $M64 AS BIGINT) ELSE CAST(${pfx}v AS BIGINT) END",
      out, keep = true)
    s"SELECT * EXCLUDE (${dropped.mkString(", ")}) FROM ($q)"
  }

  /** Public wrap-arithmetic building blocks, for oracles that replay
    * custom 2⁶⁴-wrapping hash chains (the winnowing window hash): modular
    * (x·c) and (a+b) over UBIGINT-typed SQL expressions. `c` may be any
    * 64-bit constant — the 32-bit-split trick keeps every intermediate
    * product inside HUGEINT. */
  def mulConstSql(x: String, c: BigInt): String = {
    val cu = c.mod(BigInt(2).pow(64))
    s"CAST(((($x) % 4294967296)::HUGEINT * $cu + " +
      s"(((($x) // 4294967296)::HUGEINT * $cu) % 4294967296) * 4294967296) " +
      s"% $M64 AS UBIGINT)"
  }

  def addModSql(a: String, b: String): String = addm(a, b)

  /** The UBIGINT bit pattern of a signed BIGINT SQL expression. */
  def unsignedOf(e: String): String =
    s"CAST(CASE WHEN ($e) < 0 THEN ($e)::HUGEINT + $M64 ELSE ($e)::HUGEINT END AS UBIGINT)"

  /** The library's text normalization, spelled in DuckDB (DuckDB's
    * regexp_replace needs an explicit 'g' flag where Spark's is global). */
  def normalizeSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
}
