package graft

import java.nio.file.Files
import graft.core.Constants._
import graft.registry.Registry

class CliSpec extends SparkSpec {
  import spark.implicits._

  test("query project runs a JSON document end-to-end and writes parquet + sidecar") {
    val root = Files.createTempDirectory("graft-cli-reg").toString
    val reg = Registry(spark, root)
    Registry.registerDataset(reg, "ds",
      Seq(("a", 1.0), ("a", 2.0), ("b", 4.0)).toDF("geography", ValueColumn))
    val queryFile = Files.createTempFile("graft-cli", ".json")
    Files.writeString(queryFile, """{
      // cli spec query
      "name": "cli_q",
      "datasets": {"datasets": [{"dataset_id": "ds"}]},
      "result": {"aggregations": [{"group_by": ["geography"]}], "sort_by": ["geography"]}
    }""")
    val outDir = Files.createTempDirectory("graft-cli-out").toString
    Cli.main(Array("query", "project", root, queryFile.toString, outDir))
    val back = spark.read.parquet(s"$outDir/cli_q.parquet")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
    assert(back == Seq(("a", 3.0), ("b", 4.0)))
    assert(Files.exists(java.nio.file.Paths.get(s"$outDir/query.json")))
  }

  test("query dataset command runs a DatasetQuery document") {
    val root = Files.createTempDirectory("graft-cli-reg2").toString
    val reg = Registry(spark, root)
    Registry.registerDataset(reg, "ds",
      Seq(("a", 1.0), ("b", 4.0), ("b", 5.0)).toDF("geography", ValueColumn))
    val queryFile = Files.createTempFile("graft-cli2", ".json")
    Files.writeString(queryFile, """{
      "name": "cli_dq",
      "dataset": {"dataset_id": "ds"},
      "result": {"aggregations": [{"group_by": ["geography"]}], "sort_by": ["geography"]}
    }""")
    val outDir = Files.createTempDirectory("graft-cli-out2").toString
    Cli.main(Array("query", "dataset", root, queryFile.toString, outDir, "--csv"))
    assert(Files.exists(java.nio.file.Paths.get(s"$outDir/cli_dq.csv")))
  }
}
