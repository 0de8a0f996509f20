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
  * }}}
  *
  * `registry versions` lists `v<semver>` subtrees (latest last); pass
  * `<registryRoot>/<version>` to the query commands to pin one.
  *
  * Query documents are the JSON(5-tolerant) form `query.Json` accepts; the
  * result lands as parquet (auto-partitioned) or single-file CSV with the
  * query document copied beside it, like the reference's sidecar. */
object Cli {

  def main(args: Array[String]): Unit = args.toList match {
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

    case "registry" :: "list" :: registryRoot :: Nil =>
      val reg = Registry(GraftSession.get(), registryRoot)
      println("datasets:   " + reg.listDatasets().mkString(", "))
      println("dimensions: " + reg.listDimensions().mkString(", "))
      println("mappings:   " + reg.listMappings().mkString(", "))

    case "registry" :: "versions" :: registryRoot :: Nil =>
      Registry.versions(GraftSession.get(), registryRoot).foreach(println)

    case _ =>
      System.err.println(
        """usage:
          |  graft.Cli query project <registryRoot> <query.json> <outDir> [--csv] [--cache <dir>]
          |  graft.Cli query dataset <registryRoot> <query.json> <outDir> [--csv] [--cache <dir>]
          |  graft.Cli registry list <registryRoot>
          |  graft.Cli registry versions <registryRoot>""".stripMargin)
      sys.exit(2)
  }
}
