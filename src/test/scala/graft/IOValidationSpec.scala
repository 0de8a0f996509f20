package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.FileSchema
import graft.operators.Validation
import graft.sources.{Readers, Writers}

class IOSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-io-spec").toString

  test("csv round-trip with declared schema, renames and ignores") {
    val dir = tmpDir() + "/t.csv"
    val df = Seq(("a", 1.0, "junk"), ("b", 2.0, "junk")).toDF("geo", "value", "extra")
    Writers.csv(df, dir, singleFile = true)
    val fs = FileSchema(
      columns = Seq("geo" -> "STRING", "value" -> "DOUBLE", "extra" -> "STRING"),
      renames = Map("geo" -> "geography"),
      ignoreColumns = Seq("extra"))
    val back = Readers.read(spark, dir, Some(fs))
    assert(back.columns.toSeq == Seq("geography", "value"))
    assert(back.count() == 2)
  }

  test("json reader FAILFAST") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(dir, "a.json"), """{"k":1}
{"k":2}
""")
    assert(Readers.read(spark, dir + "/a.json").count() == 2)
  }

  test("parquet auto-partition write keeps data intact") {
    val dir = tmpDir() + "/p.parquet"
    val df = spark.range(1000).toDF("id")
    Writers.parquetAutoPartition(spark, df, dir)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("auto-partition coalesces many tiny files, skips below the min-partition floor") {
    // 40 tiny files ≥ the 36-partition floor → coalesced toward ~128MB files
    val dir = tmpDir() + "/many.parquet"
    Writers.parquetAutoPartition(spark, spark.range(10000).toDF("id").repartition(40), dir)
    val n = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
    val parts = Iterator.continually(n).takeWhile(_.hasNext).map(_.next()).count(_.toString.endsWith(".parquet"))
    assert(parts == 1) // desired = ceil(tiny/128MB) = 1
    assert(spark.read.parquet(dir).count() == 10000)
    // 8 files < 36 floor → left alone (coalescing would cut parallelism)
    val dir2 = tmpDir() + "/few.parquet"
    Writers.parquetAutoPartition(spark, spark.range(10000).toDF("id").repartition(8), dir2)
    val m = java.nio.file.Files.list(java.nio.file.Paths.get(dir2)).iterator()
    val parts2 = Iterator.continually(m).takeWhile(_.hasNext).map(_.next()).count(_.toString.endsWith(".parquet"))
    assert(parts2 == 8)
  }

  test("overwriteInPlace swaps via tmp and re-reads") {
    val dir = tmpDir() + "/o.parquet"
    spark.range(10).toDF("id").write.parquet(dir)
    val doubled = spark.read.parquet(dir).withColumn("id", col("id") * 2)
    val back = Writers.overwriteInPlace(spark, doubled, dir)
    assert(back.agg(sum("id")).first().getLong(0) == 90)
  }

  test("crossProduct builds the cartesian product of id lists") {
    val out = Readers.crossProduct(spark, Seq(
      "geography" -> Seq("c1", "c2"),
      "sector" -> Seq("com", "res"),
      "scenario" -> Seq("base")))
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("geography", "sector", "scenario"))
  }

  test("readWithRecovery deletes corrupt parquet files and retries") {
    val dir = tmpDir() + "/r.parquet"
    spark.range(100).toDF("id").write.parquet(dir)
    // plant a corrupt file
    val bad = java.nio.file.Paths.get(dir, "part-corrupt.parquet")
    Files.write(bad, Array.fill[Byte](64)(7))
    val out = Readers.readWithRecovery(spark, dir)
    assert(out.count() == 100)
    assert(!Files.exists(bad))
  }

  test("warehouse sink saveAsTable round-trip") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val back = Writers.toTable(spark, df, "graft_test_table")
    assert(back.count() == 2)
    spark.sql("DROP TABLE graft_test_table")
  }

  test("bucketed tables join shuffle-free on the bucket key") {
    val facts = (1 to 200).map(i => (i % 40, s"f$i", i.toDouble)).toDF("key", "tag", "v")
    val dims = (0 until 40).map(i => (i, s"dim$i")).toDF("key", "name")
    val bf = Writers.toBucketedTable(spark, facts, "graft_bucketed_facts", Seq("key"), 4, Seq("key"))
    val bd = Writers.toBucketedTable(spark, dims, "graft_bucketed_dims", Seq("key"), 4, Seq("key"))
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1") // force SMJ so the check is about bucketing, not broadcast
      val joined = bf.join(bd, Seq("key"))
      assert(joined.count() == 200)
      // both sides pre-hashed into the same 4 buckets → zero exchanges
      assert(graft.plans.PlanChecks.shuffleCount(joined) == 0,
        "bucketed-bucketed equi-join must not shuffle")
      // a plain (unbucketed) join of the same data DOES shuffle — the
      // contrast proves the bucketing is what removed the exchanges
      val plain = facts.join(dims, Seq("key"))
      plain.count()
      assert(graft.plans.PlanChecks.shuffleCount(plain) > 0)
    } finally {
      spark.conf.set(thresholdKey, old)
      spark.sql("DROP TABLE graft_bucketed_facts")
      spark.sql("DROP TABLE graft_bucketed_dims")
    }
  }

  test("partitioned parquet prunes directories via partition filters") {
    val out = java.nio.file.Files.createTempDirectory("graft-partwrite").toString + "/events"
    val df = (1 to 300).map(i => (f"2024-01-${1 + i % 3}%02d", i.toLong, i * 1.5))
      .toDF("event_date", "event_id", "v")
    Writers.parquetPartitionedBy(df, out, Seq("event_date"), sortWithin = Seq("event_id"))
    // one directory per date
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(out)).iterator()
    val dateDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs).asScala
      .map(_.getFileName.toString).filter(_.startsWith("event_date=")).toSeq
    assert(dateDirs.size == 3)
    val read = spark.read.parquet(out).filter($"event_date" === "2024-01-02")
    assert(read.count() == 100)
    // the date predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated per row after IO
    assert(graft.plans.PlanChecks.partitionFilters(read).exists(_.contains("event_date")))
    assert(!graft.plans.PlanChecks.pushedFilters(read).exists(_.contains("event_date")))
  }

  test("registerDir exposes parquet tables as temp views") {
    Readers.registerDir(spark, "/root/testdata/sf0.001")
    assert(spark.table("region").count() == 5)
    assert(spark.sql("SELECT COUNT(*) FROM nation").first().getLong(0) == 25)
  }

  test("manifest skipping opens only intersecting files and loses no rows") {
    import graft.sources.Skipping
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skip").toString + "/t"
    // range-clustered layout: 4 files, values 0..399
    (0L until 400L).map(i => (i, i.toDouble)).toDF("id", "v")
      .repartitionByRange(4, col("v")).write.parquet(dir)
    val manifest = Skipping.buildManifest(spark, dir, "v")
    assert(manifest.count() == 4)
    // a range inside one quartile must open exactly 1 file
    val (files, df) = Skipping.readRange(spark, dir, manifest, "v", 110.0, 120.0)
    assert(files.size == 1, s"opened ${files.size} files")
    assert(df.select("id").as[Long].collect().sorted.toSeq == (110L to 120L))
    // a boundary-straddling range opens 2; results still exact
    val (f2, d2) = Skipping.readRange(spark, dir, manifest, "v", 95.0, 105.0)
    assert(f2.size == 2 && d2.count() == 11)
    // a miss range opens 0 files and returns an empty, correctly-typed frame
    val (f3, d3) = Skipping.readRange(spark, dir, manifest, "v", 1000.0, 2000.0)
    assert(f3.isEmpty && d3.isEmpty && d3.columns.toSeq == Seq("id", "v"))
    intercept[IllegalArgumentException] {
      Skipping.readRange(spark, dir, manifest, "v", 5.0, 1.0)
    }
  }

  test("value index opens only files containing the looked-up keys where min/max prunes nothing") {
    import graft.sources.Skipping
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vidx").toString + "/t"
    // anti-clustered layout: key i lands in file i % 4 — every file's
    // [min, max] spans nearly the whole domain
    (0L until 400L).map(i => (i, i % 4)).toDF("k", "b")
      .repartition(4, col("b")).write.parquet(dir)
    val manifest = Skipping.buildManifest(spark, dir, "k")
    val index = Skipping.buildValueIndex(spark, dir, "k")
    val nFiles = manifest.count()
    assert(nFiles >= 3) // hash partitioning may collide buckets; ≥3 real files
    // min/max: EVERY file covers key 42's point range — range stats are
    // useless on this layout
    assert(manifest.filter(col("min_v") <= 42 && col("max_v") >= 42).count() == nFiles)
    // value index: exactly the one file containing both (same bucket b=2)
    val (files, df) = Skipping.readKeys(spark, dir, index, "k", Seq(42L, 46L))
    assert(files.size == 1, s"opened ${files.size} files")
    assert(df.select("k").as[Long].collect().sorted.toSeq == Seq(42L, 46L))
    // keys in different buckets open at most their union — always < all files
    val (f2, d2) = Skipping.readKeys(spark, dir, index, "k", Seq(42L, 43L))
    assert(f2.size <= 2 && f2.size < nFiles && d2.count() == 2)
    // absent key: zero files, typed empty frame
    val (f3, d3) = Skipping.readKeys(spark, dir, index, "k", Seq(9999L))
    assert(f3.isEmpty && d3.isEmpty && d3.columns.toSeq == Seq("k", "b"))
    intercept[IllegalArgumentException](Skipping.readKeys(spark, dir, index, "k", Nil))
  }

  test("bloom skipping never false-negatives; a deliberately undersized filter over-opens but stays exact") {
    import graft.sources.Skipping
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bidx").toString + "/t"
    (0L until 400L).map(i => (i, i % 4)).toDF("k", "b")
      .repartition(4, col("b")).write.parquet(dir)
    val exact = Skipping.buildValueIndex(spark, dir, "k")
    // generous filter: bloom opens must equal the exact index's opens here
    // (fpp ≈ 0 at 2^16 bits over 100 keys/file) and rows must be exact
    val roomy = Skipping.buildBloomIndex(spark, dir, "k", numBits = 1L << 16)
    val keys = Seq(42L, 43L, 9999L)
    val (bf, bd) = Skipping.readKeysBloom(spark, dir, roomy, "k", keys)
    val (ef, ed) = Skipping.readKeys(spark, dir, exact, "k", keys)
    assert(bf == ef, s"bloom opened $bf, exact opened $ef")
    assert(sortedRows(bd) == sortedRows(ed))
    // undersized filter (64 bits for 100 keys/file → saturated): MAY open
    // extra files (false positives) but NEVER misses one, and the residual
    // filter keeps the rows exact
    val tiny = Skipping.buildBloomIndex(spark, dir, "k", numBits = 64L)
    val (tf, td) = Skipping.readKeysBloom(spark, dir, tiny, "k", keys)
    assert(ef.toSet.subsetOf(tf.toSet), s"false negative: exact $ef vs bloom $tf")
    assert(sortedRows(td) == sortedRows(ed))
  }
}

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("null violations") {
    val df = Seq(("a", Some(1.0)), ("b", None)).toDF("k", "v")
    assert(Validation.nullViolations(df, Seq("v")).count() == 1)
  }

  test("unknown dimension values surface as anti-join") {
    val df = Seq("c1", "c2", "cX").toDF("geography")
    val records = Seq("c1", "c2").toDF("id")
    val bad = Validation.unknownDimensionValues(df, "geography", records)
    assert(bad.as[String].collect().toSeq == Seq("cX"))
  }

  test("completeness: missing associations minus expected-missing") {
    val df = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1")).toDF("geography", "sector")
    val recs = Map(
      "geography" -> Seq("c1", "c2").toDF("id"),
      "sector" -> Seq("s1", "s2").toDF("id"))
    val missing = Validation.missingAssociations(df, Seq("geography", "sector"), recs)
    assert(rows(missing) == Seq(Seq("c2", "s2")))
    // now declare (c2, s2) expected-missing → complete
    val em = Seq(("c2", "s2")).toDF("geography", "sector")
    assert(Validation.missingAssociations(df, Seq("geography", "sector"), recs, Some(em)).isEmpty)
    assert(Validation.missingValueCounts(missing, Seq("geography", "sector")) ==
      Map("geography" -> 1L, "sector" -> 1L))
  }

  test("id mismatches both directions") {
    val a = Seq(1, 2, 3).toDF("id")
    val b = Seq(2, 3, 4).toDF("key")
    val (onlyA, onlyB) = Validation.idMismatches(a, "id", b, "key")
    assert(onlyA.as[Int].collect().toSeq == Seq(1))
    assert(onlyB.as[Int].collect().toSeq == Seq(4))
  }

  private def patternsOf(df: org.apache.spark.sql.DataFrame, maxDepth: Int = 0) =
    Validation.minimalClosedPatterns(df, maxDepth).collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1), r.getLong(2))).toSet

  test("minimal closed patterns name planted block-missing slabs once, by smallest description") {
    // the reference miner's flagship case (rust/src/lib.rs semantics via
    // dataset.py:241-291): missing = all of geography g7, plus all of
    // (scenario s2 × sector m1). Dictionaries come from the missing frame
    // itself — both slabs keep every other column's alphabet complete.
    val geos = (0 until 25).map(i => f"g$i%02d")
    val scens = (0 until 5).map(i => s"s$i")
    val secs = (0 until 3).map(i => s"m$i")
    val cube = for { g <- geos; s <- scens; m <- secs } yield (g, s, m)
    val missing = cube
      .filter { case (g, s, m) => g == "g07" || (s == "s2" && m == "m1") }
      .toDF("geography", "scenario", "sector")
    assert(patternsOf(missing) == Set(
      (Seq("geography"), Seq("g07"), 15L),
      (Seq("scenario", "sector"), Seq("s2", "m1"), 25L)))
    // a closed superset of a closed pattern is never reported: add the
    // full-column rows of a third slab INSIDE g07 — still just the slabs
    assert(patternsOf(missing, maxDepth = 2) == patternsOf(missing))
    // maxDepth 1 keeps only single-column patterns
    assert(patternsOf(missing, maxDepth = 1) == Set(
      (Seq("geography"), Seq("g07"), 15L)))
    // an isolated missing row that no slab explains reports as itself
    val plusOne = missing.union(Seq(("g01", "s0", "m0")).toDF("geography", "scenario", "sector"))
    assert(patternsOf(plusOne).contains(
      (Seq("geography", "scenario", "sector"), Seq("g01", "s0", "m0"), 1L)))
  }

  test("minimal closed patterns equal the brute-force closure definition on random frames") {
    // pin the operator to the DEFINITION (closed: rows cover the full
    // remaining cross product; minimal: no proper sub-assignment closed),
    // independently of the levelwise pruning path
    def brute(rows: Seq[Seq[String]], names: Seq[String]): Set[(Seq[String], Seq[String], Long)] = {
      val d = names.size
      val rs = rows.distinct
      val dict = (0 until d).map(i => rs.map(_(i)).distinct.size.toLong)
      def expected(s: Seq[Int]) = (0 until d).filterNot(s.contains).map(dict).product
      def matches(s: Seq[Int], vs: Seq[String]) =
        rs.count(r => s.zip(vs).forall { case (i, v) => r(i) == v }).toLong
      val closed = (for {
        k <- 1 to d
        s <- (0 until d).combinations(k).map(_.toSeq)
        vs <- rs.map(r => s.map(r)).distinct
        if matches(s, vs) == expected(s)
      } yield (s, vs)).toSet
      closed
        .filterNot { case (s, vs) => closed.exists { case (s2, vs2) =>
          s2.size < s.size && s2.forall(s.contains) &&
            s2.zip(vs2).forall { case (i, v) => vs(s.indexOf(i)) == v }
        }}
        .map { case (s, vs) => (s.map(names), vs, matches(s, vs)) }
    }
    val names = Seq("a", "b", "c", "dd")
    Seq(61, 97, 141).foreach { seed =>
      val rows = (0 until 160).map { i =>
        Seq(s"a${(i * 7 + seed) % 3}", s"b${(i * 13 + seed * 5) % 4}",
          s"c${(i * 5 + seed * 11) % 3}", s"d${(i * 17 + seed * 3) % 2}")
      }.distinct
      val df = rows.map { case Seq(a, b, c, dd) => (a, b, c, dd) }.toDF(names: _*)
      assert(patternsOf(df) == brute(rows, names), s"seed $seed diverged from brute force")
    }
    // degenerate: a frame that IS a full cube closes at every single value;
    // only the single-column patterns are minimal
    val cube = (for { a <- Seq("x", "y"); b <- Seq("p", "q") } yield (a, b)).toDF("a", "b")
    assert(patternsOf(cube) == Set(
      (Seq("a"), Seq("x"), 2L), (Seq("a"), Seq("y"), 2L),
      (Seq("b"), Seq("p"), 2L), (Seq("b"), Seq("q"), 2L)))
  }

  test("txn log: dense versions, atomic commits, as-of replay, refusals") {
    import spark.implicits._
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("txn_spec").toString
    val log = s"$root/_log"
    def fileOf(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val a = fileOf(Seq(1L, 2L).toDF("x"), "a")
    val b = fileOf(Seq(3L).toDF("x"), "b")
    TxnLog.commit(log, 0, Seq(a), Nil)
    TxnLog.commit(log, 1, Seq(b), Nil)
    TxnLog.commit(log, 2, Nil, Seq(a))
    assert(TxnLog.latestVersion(log).contains(2L))
    assert(TxnLog.readAsOf(spark, log, 0).count() == 2)
    assert(TxnLog.readAsOf(spark, log, 1).count() == 3)
    assert(TxnLog.readAsOf(spark, log, 2).count() == 1)
    // non-dense version refuses
    assertThrows[IllegalArgumentException](TxnLog.commit(log, 5, Seq(a), Nil))
    // removing a non-live file refuses (a was removed at v2)
    assertThrows[IllegalArgumentException](TxnLog.commit(log, 3, Nil, Seq(a)))
    // as-of beyond latest refuses
    assertThrows[IllegalArgumentException](TxnLog.readAsOf(spark, log, 9))
  }

  test("txn log merge: copy-on-write rewrites only files containing matched keys") {
    import spark.implicits._
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("txn_merge_spec").toString
    val log = s"$root/_log"
    def fileOf(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val f1 = fileOf(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), "f1")
    val f2 = fileOf(Seq((3L, 30L), (4L, 40L)).toDF("k", "v"), "f2")
    val f3 = fileOf(Seq((5L, 50L)).toDF("k", "v"), "f3")
    TxnLog.commit(log, 0, Seq(f1, f2, f3), Nil)

    // matched key 3 (only f2) + insert key 9 → f1/f3 must survive untouched
    val v1 = TxnLog.mergeCopyOnWrite(
      spark, log, s"$root/m1", Seq((3L, 333L), (9L, 99L)).toDF("k", "v"), "k")
    assert(v1 == 1L)
    val live = TxnLog.liveFiles(log, 1)
    assert(live.contains(f1) && live.contains(f3) && !live.contains(f2),
      s"expected f2 rewritten, f1/f3 carried: $live")
    assert(live.size == 3)
    assert(sortedRows(TxnLog.readAsOf(spark, log, 1)) ==
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 333L), Seq(4L, 40L), Seq(5L, 50L), Seq(9L, 99L)))
    // pre-merge snapshot still time-travelable, unchanged
    assert(sortedRows(TxnLog.readAsOf(spark, log, 0)) ==
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L), Seq(4L, 40L), Seq(5L, 50L)))

    // pure insert touches nothing: all three live files carry over
    val v2 = TxnLog.mergeCopyOnWrite(
      spark, log, s"$root/m2", Seq((100L, 1L)).toDF("k", "v"), "k")
    assert(TxnLog.liveFiles(log, v2).intersect(TxnLog.liveFiles(log, 1)).size == 3)
    assert(TxnLog.readAsOf(spark, log, v2).count() == 7)

    // duplicate update keys refuse; schema mismatch refuses
    assertThrows[IllegalArgumentException](TxnLog.mergeCopyOnWrite(
      spark, log, s"$root/m3", Seq((1L, 1L), (1L, 2L)).toDF("k", "v"), "k"))
    assertThrows[IllegalArgumentException](TxnLog.mergeCopyOnWrite(
      spark, log, s"$root/m4", Seq((1L, 1L)).toDF("k", "other"), "k"))
  }

  test("txn log deletion vectors: metadata deletes, visible-snapshot semantics, no CoW resurrection") {
    import spark.implicits._
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("txn_dv_spec").toString
    val log = s"$root/_log"
    def fileOf(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val f1 = fileOf(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), "f1")
    val f2 = fileOf(Seq((4L, 40L), (5L, 50L)).toDF("k", "v"), "f2")
    TxnLog.commit(log, 0, Seq(f1, f2), Nil)

    // DELETE WHERE k IN (2, 4): no data file changes, both files stay live
    TxnLog.deleteMergeOnRead(spark, log, s"$root/dv1", col("k").isin(2L, 4L))
    assert(TxnLog.liveFiles(log, 1) == Set(f1, f2))
    assert(sortedRows(TxnLog.readAsOfWithDeletes(spark, log, 1)) ==
      Seq(Seq(1L, 10L), Seq(3L, 30L), Seq(5L, 50L)))
    // version 0 still sees everything; the raw (DV-blind) read still has 5 rows
    assert(TxnLog.readAsOfWithDeletes(spark, log, 0).count() == 5)
    assert(TxnLog.readAsOf(spark, log, 1).count() == 5)

    // second delete overlapping the first records ONLY newly-killed rows
    TxnLog.deleteMergeOnRead(spark, log, s"$root/dv2", col("k") <= 2L)
    val dv2 = TxnLog.dvFiles(log, 2) -- TxnLog.dvFiles(log, 1)
    assert(spark.read.parquet(dv2.toSeq: _*).count() == 1) // only k=1; k=2 was dead
    assert(sortedRows(TxnLog.readAsOfWithDeletes(spark, log, 2)) ==
      Seq(Seq(3L, 30L), Seq(5L, 50L)))

    // copy-on-write merge of a file carrying dead rows must NOT resurrect
    // them: update k=3 (in f1, where k=1,2 are dead)
    val v3 = TxnLog.mergeCopyOnWrite(
      spark, log, s"$root/m1", Seq((3L, 333L)).toDF("k", "v"), "k")
    assert(sortedRows(TxnLog.readAsOfWithDeletes(spark, log, v3)) ==
      Seq(Seq(3L, 333L), Seq(5L, 50L)))
    // a dead row must not make a file "touched": update k=2 (dead) only —
    // no visible match anywhere → pure insert, both files carry over
    val v4 = TxnLog.mergeCopyOnWrite(
      spark, log, s"$root/m2", Seq((2L, 222L)).toDF("k", "v"), "k")
    assert(TxnLog.liveFiles(log, v4).intersect(TxnLog.liveFiles(log, v3)).size ==
      TxnLog.liveFiles(log, v3).size)
    assert(sortedRows(TxnLog.readAsOfWithDeletes(spark, log, v4)) ==
      Seq(Seq(2L, 222L), Seq(3L, 333L), Seq(5L, 50L)))
  }

  test("txn log vacuum: expires old snapshots, deletes exactly the unreferenced files, monotone watermark") {
    import spark.implicits._
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("txn_vac_spec").toString
    val log = s"$root/_log"
    def fileOf(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val a = fileOf(Seq((1L, 1L)).toDF("k", "v"), "a")
    val b = fileOf(Seq((2L, 2L)).toDF("k", "v"), "b")
    TxnLog.commit(log, 0, Seq(a, b), Nil)
    val c = fileOf(TxnLog.readAsOf(spark, log, 0), "c") // compaction
    TxnLog.commit(log, 1, Seq(c), Seq(a, b))
    val d = fileOf(Seq((3L, 3L)).toDF("k", "v"), "d")
    TxnLog.commit(log, 2, Seq(d), Nil)

    // retainFrom 0 deletes nothing (everything is referenced somewhere)
    assert(TxnLog.vacuum(log, 0).isEmpty)
    assert(new java.io.File(a).exists() && new java.io.File(b).exists())

    // retainFrom 1: a/b are only referenced by v0 → physically deleted
    assert(TxnLog.vacuum(log, 1).toSet == Set(a, b))
    assert(!new java.io.File(a).exists() && !new java.io.File(b).exists())
    assert(new java.io.File(c).exists() && new java.io.File(d).exists())
    // retained versions read unchanged; expired version refuses BY NAME
    assert(TxnLog.readAsOf(spark, log, 1).count() == 2)
    assert(TxnLog.readAsOf(spark, log, 2).count() == 3)
    val e = intercept[IllegalArgumentException](TxnLog.readAsOf(spark, log, 0))
    assert(e.getMessage.contains("expired") && e.getMessage.contains("1"))
    // the watermark is monotone: vacuuming backwards refuses
    assertThrows[IllegalArgumentException](TxnLog.vacuum(log, 0))
    // commits continue cleanly after a vacuum
    val f = fileOf(Seq((4L, 4L)).toDF("k", "v"), "f")
    TxnLog.commit(log, 3, Seq(f), Nil)
    assert(TxnLog.readAsOf(spark, log, 3).count() == 4)
  }

  test("txn log schema evolution: union-schema reads, evolved CDF and merge, evolved-column deletes") {
    import spark.implicits._
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("txn_evo_spec").toString
    val log = s"$root/_log"
    def fileOf(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    TxnLog.commit(log, 0, Seq(fileOf(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), "f0")), Nil)
    // v1 widens the schema with column w — no rewrite of the old file
    TxnLog.commit(log, 1, Seq(fileOf(Seq((3L, 30L, 300L)).toDF("k", "v", "w"), "f1")), Nil)
    assert(TxnLog.readAsOf(spark, log, 0).columns.toSeq == Seq("k", "v"))
    assert(sortedRows(TxnLog.readAsOf(spark, log, 1).orderBy("k")) ==
      Seq(Seq(1L, 10L, null), Seq(2L, 20L, null), Seq(3L, 30L, 300L)))
    // CDF across the evolution: pre-evolution rows conform to the union
    // schema, so only the appended row emits
    assert(TxnLog.changesBetween(spark, log, 0, 1)
      .collect().map(r => (r.getString(3), r.getLong(0), r.getLong(2))).toSeq ==
      Seq(("insert", 3L, 300L)))
    // CoW merge on the evolved table: the pre-evolution survivor null-fills w
    TxnLog.mergeCopyOnWrite(spark, log, s"$root/m1",
      Seq((2L, 222L, 22L)).toDF("k", "v", "w"), "k")
    assert(sortedRows(TxnLog.readAsOf(spark, log, 2).orderBy("k")) ==
      Seq(Seq(1L, 10L, null), Seq(2L, 222L, 22L), Seq(3L, 30L, 300L)))
    // a 2-column update on the evolved table refuses (schema mismatch)
    assertThrows[IllegalArgumentException](TxnLog.mergeCopyOnWrite(
      spark, log, s"$root/m2", Seq((1L, 1L)).toDF("k", "v"), "k"))
    // DV delete keyed on the EVOLVED column, hitting a pre-evolution row
    TxnLog.deleteMergeOnRead(spark, log, s"$root/dv", col("w").isNull)
    assert(sortedRows(TxnLog.readAsOfWithDeletes(spark, log, 3).orderBy("k")) ==
      Seq(Seq(2L, 222L, 22L), Seq(3L, 30L, 300L)))
  }

  test("txn log change feed: file-diff CDF emits exactly the row delta, carried rows cancel") {
    import spark.implicits._
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("txn_cdf_spec").toString
    val log = s"$root/_log"
    def fileOf(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val f1 = fileOf(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), "f1")
    val f2 = fileOf(Seq((4L, 40L)).toDF("k", "v"), "f2")
    TxnLog.commit(log, 0, Seq(f1, f2), Nil)
    // v1: merge updates k=2 and inserts k=9 — k=1,3 rewrite verbatim into
    // the merged file and must CANCEL in the feed
    TxnLog.mergeCopyOnWrite(spark, log, s"$root/m1",
      Seq((2L, 222L), (9L, 99L)).toDF("k", "v"), "k")
    // v2: DV delete of k=4 (in the untouched carried file f2)
    TxnLog.deleteMergeOnRead(spark, log, s"$root/dv1", col("k") === 4L)

    def feed(a: Long, b: Long): Set[(String, Long, Long)] =
      TxnLog.changesBetween(spark, log, a, b)
        .select(col("change_type"), col("k"), col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(feed(0, 1) == Set(
      ("delete", 2L, 20L), ("insert", 2L, 222L), ("insert", 9L, 99L)))
    assert(feed(1, 2) == Set(("delete", 4L, 40L)))
    assert(feed(0, 2) == Set(
      ("delete", 2L, 20L), ("delete", 4L, 40L),
      ("insert", 2L, 222L), ("insert", 9L, 99L)))
    assertThrows[IllegalArgumentException](TxnLog.changesBetween(spark, log, 2, 2))
  }

}
