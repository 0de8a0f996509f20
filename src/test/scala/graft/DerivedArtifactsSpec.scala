package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.registry.{DerivedArtifacts, Registry}

/** Registry-backed derived-artifact lifecycle: content-hash provenance,
  * rebuild-on-change, and the incremental-dedup composition. */
class DerivedArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusRegistry(): Registry = {
    val root = Files.createTempDirectory("graft-artifacts-reg").toString
    val reg = Registry(spark, root)
    Registry.registerDataset(reg, "corpus", Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "a completely different document about spark catalyst optimizer rules"),
      (3L, "one more unrelated piece of text mentioning parquet column pruning"))
      .toDF("doc_id", "text"), validate = false)
    reg
  }

  test("resolve builds once, reuses on matching provenance, rebuilds on corpus or param change") {
    val reg = corpusRegistry()
    var builds = 0
    def buildFp() = {
      builds += 1
      reg.dataset("corpus").select(col("doc_id"),
        graft.text.TextFunctions.fingerprint(col("text")).as("fp"))
    }
    val a1 = DerivedArtifacts.resolve(reg, "corpus__fp", "corpus", "v1")(buildFp())
    assert(builds == 1 && a1.count() == 3)
    // hit: same source state + params → zero builds, registered data read
    val a2 = DerivedArtifacts.resolve(reg, "corpus__fp", "corpus", "v1")(buildFp())
    assert(builds == 1)
    assert(sortedRows(a2) == sortedRows(a1))
    assert(DerivedArtifacts.provenance(reg, "corpus__fp").exists(_._2 == "v1"))
    // params change → rebuild
    DerivedArtifacts.resolve(reg, "corpus__fp", "corpus", "v2")(buildFp())
    assert(builds == 2)
    // corpus rewrite → token mismatch → rebuild (the invalidation contract)
    val tokenBefore = DerivedArtifacts.datasetToken(reg, "corpus")
    Registry.registerDataset(reg, "corpus", Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (4L, "a brand new document that changes the corpus content token"))
      .toDF("doc_id", "text"), validate = false)
    assert(DerivedArtifacts.datasetToken(reg, "corpus") != tokenBefore)
    val a3 = DerivedArtifacts.resolve(reg, "corpus__fp", "corpus", "v2")(buildFp())
    assert(builds == 3)
    assert(a3.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    // unknown source refused loudly
    assertThrows[IllegalArgumentException](
      DerivedArtifacts.datasetToken(reg, "no_such_dataset"))
  }

  test("minhash artifacts register as datasets; incremental dedup finds batch-vs-corpus pairs only") {
    val reg = corpusRegistry()
    val (sh, bk) = DerivedArtifacts.minhashArtifacts(reg, "corpus", bands = 8, rowsPerBand = 2)
    assert(sh.columns.toSet == Set("doc_id", "sh"))
    assert(bk.columns.toSet == Set("doc_id", "band", "bucket"))
    assert(reg.listDatasets().toSet ==
      Set("corpus", "corpus__minhash_shingles", "corpus__lsh_buckets"))
    // a batch with one near-copy of doc 1 (one word dropped) and one novel doc
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river"),
      (102L, "entirely novel content with no overlap whatsoever in any shingle"))
      .toDF("doc_id", "text")
    val pairs = DerivedArtifacts.incrementalMinhashNearDuplicates(
      reg, "corpus", batch, bands = 8, rowsPerBand = 2, threshold = 0.5)
    val got = pairs.select("new_id", "existing_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((101L, 1L)))
    // rerun resolves from the registry (no rebuild): provenance unchanged
    val prov = DerivedArtifacts.provenance(reg, "corpus__minhash_shingles")
    DerivedArtifacts.incrementalMinhashNearDuplicates(
      reg, "corpus", batch, bands = 8, rowsPerBand = 2, threshold = 0.5).count()
    assert(DerivedArtifacts.provenance(reg, "corpus__minhash_shingles") == prov)
  }
}
