package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CmsStream

/** Streaming CMS maintenance: the persisted counters equal the batch
  * sketch over everything ingested at every boundary (addition IS the
  * sketch merge), and the batchId commit tag makes the non-idempotent
  * addition exactly-once under replay.
  */
class CmsStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def counters(table: String): Seq[Long] =
    graft.operators.TableMerge.read(spark, table)
      .head().getSeq[Long](0)

  private def sketchOf(rows: Seq[(Long, String)]): Seq[Long] = {
    import spark.implicits._
    CmsStream.batchSketch(rows.toDF("doc_id", "text")).head().getSeq[Long](0)
  }

  test("sketch sink: counters == batch sketch at each boundary; replay is a no-op") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-cms")
    val table = dir.resolve("cms").toString
    val ckpt = dir.resolve("ckpt").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (b1, rest) = docs.partition(_._1 % 3 == 0)
    val (b2, b3) = rest.partition(_._1 % 3 == 1)
    val stream = MemoryStream[(Long, String)]
    val q = CmsStream.sketchSink(
      stream.toDF().toDF("doc_id", "text"), table, ckpt)
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      assert(counters(table) == sketchOf(b1), "boundary 1: counters drifted")
      stream.addData(b2: _*)
      q.processAllAvailable()
      assert(counters(table) == sketchOf(b1 ++ b2), "boundary 2: counters drifted")
      stream.addData(b3: _*)
      q.processAllAvailable()
      assert(counters(table) == sketchOf(docs), "final: counters drifted")
    } finally q.stop()
    // replay the LAST batch id directly (foreachBatch's at-least-once
    // failure mode): addition would double-count without the tag. The
    // run id is the nonce persisted inside the live checkpoint.
    val runId = CmsStream.runIdFor(ckpt)
    val before = counters(table)
    val lastId = graft.operators.TableMerge.versions(table)
      .flatMap(v => graft.operators.TableMerge.versionMeta(table, v)
        .get(CmsStream.CmsBatchKey)).map(_.toLong).max
    CmsStream.applyCmsBatch(b3.toDF("doc_id", "text"), lastId, table, 4, 256, runId)
    assert(counters(table) == before, "replayed batch double-counted")
    // an EARLIER id is also a no-op (>= comparison)
    CmsStream.applyCmsBatch(b1.toDF("doc_id", "text"), lastId - 1, table, 4, 256, runId)
    assert(counters(table) == before, "stale replay double-counted")
    // the COMMON reset (ADVICE r16): wipe and recreate the checkpoint at
    // the SAME path — batchIds restart at 0 but the fresh nonce changes
    // the run id, so the guard fails loudly instead of silently dropping
    // every new batch as a "replay"
    def wipe(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).getOrElse(Array.empty).foreach(wipe)
      p.delete(); ()
    }
    wipe(new java.io.File(ckpt))
    val resetRunId = CmsStream.runIdFor(ckpt)
    assert(resetRunId != runId, "wiped checkpoint must mint a fresh run nonce")
    val e = intercept[IllegalArgumentException] {
      CmsStream.applyCmsBatch(b1.toDF("doc_id", "text"), 0L, table, 4, 256, resetRunId)
    }
    assert(e.getMessage.contains("run id"), s"unexpected message: ${e.getMessage}")
    assert(counters(table) == before, "foreign-run batch mutated the counters")
  }
}
