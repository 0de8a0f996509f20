package graft

import org.apache.spark.sql.functions._
import graft.ml.Features

/** Out-of-fold target-encoding contracts: hand-computed encodings, the
  * single-fold fallback, the DIRECT leak-freedom property (a row's own
  * target cannot move its own encoding), and partitioning invariance. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  // (id, cat, tgt, fold)
  private val base = Seq(
    (1L, "a", 10L, 0L), (2L, "a", 20L, 0L), (3L, "a", 30L, 1L), (4L, "a", 40L, 1L),
    (5L, "b", 100L, 0L), (6L, "b", 200L, 1L),
    (7L, "c", 7L, 0L), (8L, "c", 9L, 0L)) // c exists ONLY in fold 0 → fallback

  private def enc(rows: Seq[(Long, Long, Long, Long)] = Nil) = {
    val df = viaParquet((base.map(r => (r._1, r._2, r._3, r._4)) ++
      rows.map(r => (r._1, s"x${r._2}", r._3, r._4))).toDF("id", "cat", "tgt", "fold"))
    Features.targetEncodeOOF(df, "cat", "tgt", "fold")
      .select("id", "enc_num", "enc_den", "enc_ppm", "enc_fallback")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
  }

  test("hand-computed out-of-fold means and the single-fold fallback") {
    val e = enc()
    // rows 1,2 (a, fold 0): oof = folds≠0 of a = (30+40)/2 = 35
    assert(e(1L) == ((70L, 2L, 35000000L, false)) && e(2L) == e(1L))
    // rows 3,4 (a, fold 1): oof = (10+20)/2 = 15
    assert(e(3L) == ((30L, 2L, 15000000L, false)))
    // row 5 (b, fold 0): oof = 200/1
    assert(e(5L) == ((200L, 1L, 200000000L, false)))
    // rows 7,8 (c only in fold 0): global out-of-fold prior =
    // all targets outside fold 0 = (30+40+200)/3 = 90
    assert(e(7L) == ((270L, 3L, 90000000L, true)) && e(8L) == e(7L))
  }

  test("leak freedom: perturbing a row's own target never moves its own encoding") {
    val before = enc()
    val perturbed = base.map(r => if (r._1 == 3L) r.copy(_3 = r._3 + 1000L) else r)
    val after = {
      val df = viaParquet(perturbed.toDF("id", "cat", "tgt", "fold"))
      Features.targetEncodeOOF(df, "cat", "tgt", "fold")
        .select("id", "enc_ppm").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // row 3's own encoding is unchanged (its target is excluded by construction)
    assert(after(3L) == before(3L)._3)
    assert(after(4L) == before(4L)._3) // same (cat, fold) → also excluded
    // but its fold-0 siblings DO see the new target
    assert(after(1L) != before(1L)._3)
  }

  test("encodings are partitioning-invariant and missing columns refuse") {
    val big = (1 to 500).map(i =>
      (i.toLong, s"c${i % 17}", (i % 29).toLong, (i % 4).toLong))
    val df = viaParquet(big.toDF("id", "cat", "tgt", "fold"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Features.targetEncodeOOF(d, "cat", "tgt", "fold")
        .select("id", "enc_ppm").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(df.repartition(1)) == run(df.repartition(11, col("cat"))))
    intercept[IllegalArgumentException](Features.targetEncodeOOF(df, "nope", "tgt", "fold"))
  }
}
