package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.plans.PlanChecks

/** Round-18 pins: the streaming bench warm-up and the plan-lint gate's
  * cartesian mechanics (the q380 finding). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("StreamOps.warmup runs clean, drops its view, restores shuffle conf") {
    // warmup is invoked from Bench inside a swallow-all catch — a broken
    // warmup would silently no-op and the isolated-streaming-bench numbers
    // would quietly regress to the unwarmed 2x band; this spec keeps it loud
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    graft.streaming.StreamOps.warmup(spark)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev,
      "warmup must restore the scoped shuffle-partition conf")
    assert(!spark.catalog.tableExists("graft_stream_warmup"),
      "warmup must drop its memory-sink view")
    // runs twice in one JVM (Bench children + parent may both call it)
    graft.streaming.StreamOps.warmup(spark)
  }

  test("constant-key scalar join: bare = cartesian, broadcast = BNLJ (q380 mechanism)") {
    // both sides aggregate under a LITERAL group key; Catalyst's foldable
    // propagation folds the g = g equi-condition to true and the join
    // degenerates. Bare: CartesianProductExec (the plan-lint fail shape).
    // With an explicit broadcast on the one-row side: the bounded
    // BroadcastNestedLoopJoin the lint accepts.
    val base = spark.range(100)
      .select(lit("all").as("g"), (col("id") % 7).as("v"))
    val a = base.groupBy("g").agg(sum("v").as("s"))
    val b = base.groupBy("g").agg(max("v").as("m"))
    val bare = a.join(b, "g")
    // in q380 the aggregate sides' size statistics were far above the
    // auto-broadcast threshold (checkpoint-truncated corpus pipeline), so
    // the planner fell through to the cartesian; tiny test frames would
    // auto-broadcast, so scope the threshold off to reproduce that state
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try
      assert(PlanChecks.flatten(bare).exists(_.isInstanceOf[CartesianProductExec]),
        "expected the folded constant-key join to plan as a cartesian")
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    // the explicit hint works regardless of the threshold — the q380 fix
    val hinted = a.join(broadcast(b), "g")
    val nodes = PlanChecks.flatten(hinted)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "broadcast build side must avoid CartesianProductExec")
    assert(nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "expected the bounded BNLJ form")
    // values are identical either way
    assert(bare.collect().toSeq == hinted.collect().toSeq)
  }
}
