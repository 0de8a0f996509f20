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

  private def vecRegistry(): Registry = {
    val root = Files.createTempDirectory("graft-artifacts-vec").toString
    val reg = Registry(spark, root)
    // 12 vectors in 3 well-separated axis clusters
    Registry.registerDataset(reg, "vecs", (0 until 12).map { i =>
      val v = Array.fill(6)(0.0)
      v((i % 3) * 2) = 10.0 + i
      v((i % 3) * 2 + 1) = 1.0
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding"), validate = false)
    reg
  }

  test("IVF centroid artifact: build-once / reuse / rebuild on corpus change (r15 item 2)") {
    val reg = vecRegistry()
    val c1 = DerivedArtifacts.ivfCentroidsArtifact(reg, "vecs", numCentroids = 3,
      iterations = 2, parallelInit = false)
    assert(c1.columns.toSet == Set("centroid_id", "centroid") && c1.count() == 3)
    assert(reg.listDatasets().contains("vecs__ivf_centroids"))
    val prov = DerivedArtifacts.provenance(reg, "vecs__ivf_centroids")
    // hit: same corpus + params — provenance untouched, same values
    val c2 = DerivedArtifacts.ivfCentroidsArtifact(reg, "vecs", numCentroids = 3,
      iterations = 2, parallelInit = false)
    assert(DerivedArtifacts.provenance(reg, "vecs__ivf_centroids") == prov)
    assert(sortedRows(c2) == sortedRows(c1))
    // param change (k) rebuilds
    val c3 = DerivedArtifacts.ivfCentroidsArtifact(reg, "vecs", numCentroids = 2,
      iterations = 2, parallelInit = false)
    assert(c3.count() == 2)
    assert(DerivedArtifacts.provenance(reg, "vecs__ivf_centroids") != prov)
    // corpus rewrite rebuilds (the invalidation contract)
    val prov2 = DerivedArtifacts.provenance(reg, "vecs__ivf_centroids")
    Registry.registerDataset(reg, "vecs",
      Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 1.0)))
        .toDF("vec_id", "embedding"), validate = false)
    DerivedArtifacts.ivfCentroidsArtifact(reg, "vecs", numCentroids = 2,
      iterations = 1, parallelInit = false)
    assert(DerivedArtifacts.provenance(reg, "vecs__ivf_centroids") != prov2)
  }

  test("PQ codebook artifact: parquet round-trip exact; resolve caches training") {
    val reg = vecRegistry()
    val m = 3; val k = 2; val sd = 2
    // direct training on the same corpus = the artifact's expected value
    val corpus = reg.dataset("vecs").select(col("vec_id"),
      graft.ml.Pq.quantized(col("embedding"), 16).as("qv"))
    val direct = graft.ml.Pq.train(corpus, "vec_id", "qv", m, k, sd, iters = 2)
    val cb1 = DerivedArtifacts.pqCodebooksArtifact(reg, "vecs", m, k, sd,
      iters = 2, scale = 16)
    assert(cb1 == direct, "artifact codebooks must equal direct training bit-for-bit")
    assert(reg.listDatasets().contains("vecs__pq_codebooks"))
    // resolve hit: provenance unchanged, identical codebooks
    val prov = DerivedArtifacts.provenance(reg, "vecs__pq_codebooks")
    val cb2 = DerivedArtifacts.pqCodebooksArtifact(reg, "vecs", m, k, sd,
      iters = 2, scale = 16)
    assert(cb2 == cb1 && DerivedArtifacts.provenance(reg, "vecs__pq_codebooks") == prov)
    // geometry change is a new params token -> rebuild
    DerivedArtifacts.pqCodebooksArtifact(reg, "vecs", m, k, sd, iters = 1, scale = 16)
    assert(DerivedArtifacts.provenance(reg, "vecs__pq_codebooks") != prov)
    // a malformed artifact (wrong row count) refuses loudly on reconstruct
    val e = intercept[IllegalArgumentException](
      DerivedArtifacts.codebooksFromDf(
        DerivedArtifacts.codebooksToDf(spark, cb1).limit(3), m, k, sd))
    assert(e.getMessage.contains("expected"))
  }
}
