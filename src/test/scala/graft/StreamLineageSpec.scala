package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TableMerge
import graft.streaming.StreamLineage

/** Lineage discipline of the exactly-once foreachBatch sinks: the run
  * nonce, the replay skip, and — the ADVICE r18 defect — grandfathering
  * of UNTAGGED commits (state tables written by pre-run-id code under
  * the same continuous checkpoint must resume, not fail permanently).
  */
class StreamLineageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  test("untagged legacy commits are same-lineage: resume skips, no foreign trip") {
    val table = freshDir("lineage-legacy") + "/state"
    // a pre-run-id writer committed batches 0 and 1 with a batch tag
    // but NO run tag (exactly what pre-r18 code wrote)
    val df = spark.range(3).select(col("id"), lit(1L).as("v"))
    TableMerge.createOrReplace(df, table, meta = Map("graft.batchId" -> "0"))
    TableMerge.upsert(spark, table, df, Seq("id"),
      meta = Map("graft.batchId" -> "1"))

    val runId = "fresh-run-nonce"
    // foreign must be empty (grandfathered), and batch 1 already applied
    val (foreign1, already1) =
      StreamLineage.replayState(table, "graft.batchId", "graft.runId", 1L, runId)
    assert(foreign1.isEmpty, "untagged commits must not count as foreign")
    assert(already1, "legacy batchId 1 must join the replay-skip set")
    // batch 2 is new work
    val (_, already2) =
      StreamLineage.replayState(table, "graft.batchId", "graft.runId", 2L, runId)
    assert(!already2)
    // requireSameLineage passes — the resume proceeds
    StreamLineage.requireSameLineage("test", table, foreign1, runId)
  }

  test("a DIFFERENT non-empty run id still trips the foreign-lineage error") {
    val table = freshDir("lineage-foreign") + "/state"
    val df = spark.range(3).select(col("id"), lit(1L).as("v"))
    TableMerge.createOrReplace(df, table,
      meta = Map("graft.batchId" -> "0", "graft.runId" -> "old-run"))
    val (foreign, _) =
      StreamLineage.replayState(table, "graft.batchId", "graft.runId", 0L, "new-run")
    assert(foreign == Seq("old-run"))
    val e = intercept[IllegalArgumentException] {
      StreamLineage.requireSameLineage("test", table, foreign, "new-run")
    }
    assert(e.getMessage.contains("old-run"))
  }

  test("runIdFor is stable per checkpoint and fresh per recreated checkpoint") {
    val cp = freshDir("lineage-nonce")
    val id1 = StreamLineage.runIdFor(cp)
    assert(StreamLineage.runIdFor(cp) == id1)
    // wipe-and-recreate (the reset) produces a NEW nonce
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(cp))
    val id2 = StreamLineage.runIdFor(cp)
    assert(id2 != id1)
  }
}
