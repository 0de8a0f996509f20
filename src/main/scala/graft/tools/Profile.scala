package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Scratch profiler for slow catalog queries — times each stage of a
  * pipeline separately (dev tool, not part of the library surface). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val clipped = d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      array_join(slice(split(trim(col("text")), "\\s+"), lit(1), size(split(trim(col("text")), "\\s+")) - 1), " ")
        .as("text"))
    val corpus = d.unionByName(clipped).cache()
    time("corpus materialize")(corpus.count())

    val sig = Dedup.minhashSignatures(corpus, "doc_id", "text", 64)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())

    val buckets = Dedup.lshBuckets(corpus, "doc_id", "text", 16, 4).cache()
    time("buckets materialize")(buckets.count())

    val pairs = Dedup.candidatePairs(buckets, "doc_id").cache()
    time("candidate pairs")(println("  pairs=" + pairs.count()))

    val out = Dedup.verifyJaccard(corpus, pairs, "doc_id", "text", 3, 0.8)
    time("verify jaccard")(println("  verified=" + out.count()))

    spark.stop()
  }
}
