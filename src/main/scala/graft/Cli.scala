package graft

import graft.core.GraftSession
import graft.query.{Json, Submitter}
import graft.registry.Registry

/** Command-line entry point mirroring the reference's CLI surface
  * (ref: dsgrid/cli/query.py — `dsgrid query project run`, registry
  * listing):
  *
  * {{{
  * graft.Cli query project <registryRoot> <query.json> <outDir> [--csv] [--cache <dir>]
  * graft.Cli query dataset <registryRoot> <query.json> <outDir> [--csv] [--cache <dir>]
  * graft.Cli registry list <registryRoot>
  * graft.Cli registry versions <registryRoot>
  * graft.Cli registry register-dimension <registryRoot> <name> <records-path> [--category base|subset|supplemental]
  * graft.Cli registry register-mapping <registryRoot> <name> <table-path> [--type <mappingType>] [--from-dimension <d>] [--to-dimension <d>] [--no-validate]
  * graft.Cli registry register-dataset <registryRoot> <datasetId> <load-data-path> [--lookup <path>] [--dim <name>=<records-path>]... [--no-validate]
  * graft.Cli registry register-bulk <registryRoot> <manifest.json> [--journal <path>] [--data-base-dir <dir>]
  * graft.Cli registry remove-dimension <registryRoot> <name>
  * graft.Cli registry remove-mapping <registryRoot> <name>
  * graft.Cli registry remove-dataset <registryRoot> <datasetId>
  * graft.Cli registry dump-dimension <registryRoot> <name> <out-path[.csv]>
  * graft.Cli registry new-version <registryRoot> <fromVersion> <toVersion>
  * graft.Cli registry check <registryRoot>
  * graft.Cli registry filter <srcRoot> <destRoot> [--datasets a,b] [--dimensions x,y] [--mappings m,n]
  * }}}
  *
  * The registration verbs delegate to the validated `Registry.*` APIs
  * (ref: dsgrid/cli/registry.py register_dimensions / register_dimension_
  * mappings / register_dataset; dsgrid_admin bump): a user can stand up a
  * registry from data files without writing Scala, and a validation
  * failure (bad mapping archetype, unresolvable ids, incompatible
  * dimension update) exits nonzero with the violation on stderr. Data
  * paths read as parquet, or as header+inferSchema CSV for `.csv`.
  *
  * `registry versions` lists `v<semver>` subtrees (latest last); pass
  * `<registryRoot>/<version>` to the query commands to pin one.
  *
  * Query documents are the JSON(5-tolerant) form `query.Json` accepts; the
  * result lands as parquet (auto-partitioned) or single-file CSV with the
  * query document copied beside it, like the reference's sidecar. */
object Cli {

  /** Registration inputs: parquet by default, CSV by extension (the shared
    * reader — bulk manifests read through the same code path). */
  private def readTable(spark: org.apache.spark.sql.SparkSession, path: String) =
    Registry.readRegistrationTable(spark, path)

  private def flagValue(rest: List[String], flag: String): Option[String] =
    rest.dropWhile(_ != flag).drop(1).headOption

  /** Validation errors become exit 1 + message, not a stack trace.
    * Returns the exit code so `run` (and specs) can observe it. */
  private def validated(f: => Unit): Int =
    try { f; 0 }
    catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage)
        1
    }

  def main(args: Array[String]): Unit = {
    val rc = run(args)
    if (rc != 0) sys.exit(rc)
  }

  /** The whole CLI as a function returning its exit code — testable
    * without killing the JVM. */
  def run(args: Array[String]): Int = args.toList match {
    case "query" :: kind :: registryRoot :: queryFile :: outDir :: rest
        if kind == "project" || kind == "dataset" =>
      val spark = GraftSession.get()
      val reg = Registry(spark, registryRoot)
      val cacheDir = rest.dropWhile(_ != "--cache").drop(1).headOption
      val queryText = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(queryFile)), "UTF-8")
      val submitter = new Submitter(reg, cacheDir)
      val (name, result) =
        if (kind == "project") {
          val q = Json.parseProjectQuery(queryText); (q.name, submitter.submit(q))
        } else {
          val q = Json.parseDatasetQuery(queryText); (q.name, submitter.submit(q))
        }
      if (rest.contains("--csv"))
        graft.sources.Writers.csv(result, s"$outDir/$name.csv", singleFile = true)
      else
        graft.sources.Writers.parquetAutoPartition(spark, result, s"$outDir/$name.parquet")
      // query sidecar, as the reference writes beside results
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/query.json"), queryText)
      println(s"wrote $outDir/$name")
      0

    case "registry" :: "list" :: registryRoot :: Nil =>
      val reg = Registry(GraftSession.get(), registryRoot)
      println("datasets:   " + reg.listDatasets().mkString(", "))
      println("dimensions: " + reg.listDimensions().mkString(", "))
      println("mappings:   " + reg.listMappings().mkString(", "))
      0

    case "registry" :: "versions" :: registryRoot :: Nil =>
      Registry.versions(GraftSession.get(), registryRoot).foreach(println)
      0

    case "registry" :: "register-dimension" :: registryRoot :: name :: recordsPath :: rest =>
      val spark = GraftSession.get()
      val rc = validated {
        Registry.registerDimension(
          Registry(spark, registryRoot), name, readTable(spark, recordsPath),
          category = flagValue(rest, "--category").getOrElse("base"))
      }
      if (rc == 0) println(s"registered dimension $name")
      rc

    case "registry" :: "register-mapping" :: registryRoot :: name :: tablePath :: rest =>
      val spark = GraftSession.get()
      val rc = validated {
        Registry.registerMapping(
          Registry(spark, registryRoot), name, readTable(spark, tablePath),
          mappingType = flagValue(rest, "--type")
            .getOrElse(graft.registry.MappingTypes.ManyToOneAggregation),
          validate = !rest.contains("--no-validate"),
          fromDimension = flagValue(rest, "--from-dimension"),
          toDimension = flagValue(rest, "--to-dimension"))
      }
      if (rc == 0) println(s"registered mapping $name")
      rc

    case "registry" :: "register-dataset" :: registryRoot :: datasetId :: dataPath :: rest =>
      val spark = GraftSession.get()
      // every `--dim name=path` pairs a data column with its dimension
      // records, arming the null/unknown-value registration checks
      val dims = rest.sliding(2).collect {
        case List("--dim", spec) if spec.contains("=") =>
          val Array(d, p) = spec.split("=", 2)
          d -> readTable(spark, p)
      }.toMap
      val rc = validated {
        Registry.registerDataset(
          Registry(spark, registryRoot), datasetId, readTable(spark, dataPath),
          lookup = flagValue(rest, "--lookup").map(readTable(spark, _)),
          dimensionRecords = dims,
          validate = !rest.contains("--no-validate"))
      }
      if (rc == 0) println(s"registered dataset $datasetId")
      rc

    case "registry" :: "register-bulk" :: registryRoot :: manifestPath :: rest =>
      val spark = GraftSession.get()
      val manifest = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(manifestPath)), "UTF-8")
      val journal = flagValue(rest, "--journal")
        .getOrElse(manifestPath + ".journal.json")
      val base = java.nio.file.Paths.get(manifestPath).toAbsolutePath.getParent.toString
      val rc = validated {
        val r = graft.registry.BulkRegister(
          Registry(spark, registryRoot), manifest,
          baseDir = Some(flagValue(rest, "--data-base-dir").getOrElse(base)),
          journalPath = Some(journal))
        println(s"registered ${r.registered.size} (skipped ${r.skipped.size} journaled)")
      }
      rc

    case "registry" :: "remove-dimension" :: registryRoot :: name :: Nil =>
      val rc = validated(Registry.removeDimension(Registry(GraftSession.get(), registryRoot), name))
      if (rc == 0) println(s"removed dimension $name")
      rc

    case "registry" :: "remove-mapping" :: registryRoot :: name :: Nil =>
      val rc = validated(Registry.removeMapping(Registry(GraftSession.get(), registryRoot), name))
      if (rc == 0) println(s"removed mapping $name")
      rc

    case "registry" :: "remove-dataset" :: registryRoot :: datasetId :: Nil =>
      val rc = validated(Registry.removeDataset(Registry(GraftSession.get(), registryRoot), datasetId))
      if (rc == 0) println(s"removed dataset $datasetId")
      rc

    case "registry" :: "dump-dimension" :: registryRoot :: name :: outPath :: Nil =>
      val rc = validated(Registry.dumpDimension(Registry(GraftSession.get(), registryRoot), name, outPath))
      if (rc == 0) println(s"dumped dimension $name to $outPath")
      rc

    case "registry" :: "new-version" :: registryRoot :: fromV :: toV :: Nil =>
      val rc = validated(Registry.newVersion(GraftSession.get(), registryRoot, fromV, toV))
      if (rc == 0) println(s"created $registryRoot/$toV from $fromV")
      rc

    case "registry" :: "check" :: registryRoot :: Nil =>
      val broken = Registry.checkIntegrity(Registry(GraftSession.get(), registryRoot))
      broken.foreach(System.err.println)
      if (broken.nonEmpty) 1
      else { println("registry is consistent"); 0 }

    case "registry" :: "filter" :: srcRoot :: destRoot :: rest =>
      def names(flag: String): Seq[String] =
        flagValue(rest, flag).map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      val rc = validated {
        Registry.filterTo(
          Registry(GraftSession.get(), srcRoot), destRoot,
          datasets = names("--datasets"),
          dimensions = names("--dimensions"),
          mappings = names("--mappings"))
      }
      if (rc == 0) println(s"filtered registry written to $destRoot")
      rc

    case _ =>
      System.err.println(
        """usage:
          |  graft.Cli query project <registryRoot> <query.json> <outDir> [--csv] [--cache <dir>]
          |  graft.Cli query dataset <registryRoot> <query.json> <outDir> [--csv] [--cache <dir>]
          |  graft.Cli registry list <registryRoot>
          |  graft.Cli registry versions <registryRoot>
          |  graft.Cli registry register-dimension <registryRoot> <name> <records-path> [--category base|subset|supplemental]
          |  graft.Cli registry register-mapping <registryRoot> <name> <table-path> [--type <mappingType>] [--from-dimension <d>] [--to-dimension <d>] [--no-validate]
          |  graft.Cli registry register-dataset <registryRoot> <datasetId> <load-data-path> [--lookup <path>] [--dim <name>=<records-path>]... [--no-validate]
          |  graft.Cli registry register-bulk <registryRoot> <manifest.json> [--journal <path>] [--data-base-dir <dir>]
          |  graft.Cli registry remove-dimension <registryRoot> <name>
          |  graft.Cli registry remove-mapping <registryRoot> <name>
          |  graft.Cli registry remove-dataset <registryRoot> <datasetId>
          |  graft.Cli registry dump-dimension <registryRoot> <name> <out-path[.csv]>
          |  graft.Cli registry new-version <registryRoot> <fromVersion> <toVersion>
          |  graft.Cli registry check <registryRoot>
          |  graft.Cli registry filter <srcRoot> <destRoot> [--datasets a,b] [--dimensions x,y] [--mappings m,n]""".stripMargin)
      2
  }
}
