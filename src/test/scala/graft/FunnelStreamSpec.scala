package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream

/** Streaming funnel/retention twins (VERDICT r15 #6): the maintained
  * per-user state tables reproduce the batch `evt_funnel` /
  * `evt_retention` registry queries at EVERY micro-batch boundary, with
  * the sf0.001 events split into 3 interleaved batches (each batch
  * carries timestamps both older and newer than the previous one —
  * out-of-order by construction), and re-delivering any batch —
  * including the oldest — leaves the state bit-identical (the folds are
  * idempotent min/set-union monoids, no tag protocol).
  */
class FunnelStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Write the ingested slice as an events.parquet dir so the REAL
    * registry batch query computes the expected value at a boundary. */
  private def sliceDir(base: java.nio.file.Path, n: Int, slices: Int*): String = {
    val dir = base.resolve(s"slice$n")
    Tables.events(spark, sfDir)
      .filter(pmod(col("event_id"), lit(3)).isin(slices.map(Int.box): _*))
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def batchQ(name: String, d: String): DataFrame =
    graft.queries.PipelineQueries.queries.toMap.apply(name)(spark, d)

  test("funnel sink == batch evt_funnel at every boundary; replay is a no-op") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-funnel-stream")
    val table = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS tus")
      .as[(Long, Long, String, Long)].collect().toSeq
    // slice by event_id mod 3: each batch's timestamps interleave with
    // every other batch's — later batches deliver earlier events
    val batches = (0 to 2).map(i => ev.filter(_._1 % 3 == i).map(t => (t._2, t._3, t._4)))
    val stream = MemoryStream[(Long, String, Long)]
    val q = FunnelStream.funnelSink(
      stream.toDF().toDF("user_id", "event_type", "tus"), table, ckpt)
    try {
      for (i <- 0 to 2) {
        stream.addData(batches(i): _*)
        q.processAllAvailable()
        val expectDir = if (i == 2) sfDir else sliceDir(dir, i, 0 to i: _*)
        assert(rows(FunnelStream.funnelReport(spark, table)) ==
          rows(batchQ("evt_funnel", expectDir)),
          s"boundary $i: stream report != batch evt_funnel")
      }
      val before = rows(graft.operators.TableMerge.read(spark, table).orderBy("user_id"))
      // re-deliver the LAST batch and then the FIRST (oldest) batch —
      // both must be full no-ops on the state
      for (replay <- Seq(2, 0)) {
        FunnelStream.applyFunnelBatch(
          batches(replay).toDF("user_id", "event_type", "tus"), table, 64)
        assert(rows(graft.operators.TableMerge.read(spark, table).orderBy("user_id"))
          == before, s"replayed batch $replay mutated the funnel state")
      }
    } finally q.stop()
  }

  test("retention sink == batch evt_retention at every boundary; replay is a no-op") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-retention-stream")
    val table = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "CAST(ts AS DATE) AS day")
      .as[(Long, Long, java.sql.Date)].collect().toSeq
    val batches = (0 to 2).map(i => ev.filter(_._1 % 3 == i).map(t => (t._2, t._3)))
    val stream = MemoryStream[(Long, java.sql.Date)]
    val q = FunnelStream.retentionSink(
      stream.toDF().toDF("user_id", "day"), table, ckpt)
    try {
      for (i <- 0 to 2) {
        stream.addData(batches(i): _*)
        q.processAllAvailable()
        val expectDir = if (i == 2) sfDir else sliceDir(dir, i, 0 to i: _*)
        assert(rows(FunnelStream.retentionReport(spark, table)) ==
          rows(batchQ("evt_retention", expectDir)),
          s"boundary $i: stream report != batch evt_retention")
      }
      val before = rows(graft.operators.TableMerge.read(spark, table).orderBy("user_id"))
      for (replay <- Seq(2, 0)) {
        FunnelStream.applyRetentionBatch(
          batches(replay).toDF("user_id", "day"), table, 64)
        assert(rows(graft.operators.TableMerge.read(spark, table).orderBy("user_id"))
          == before, s"replayed batch $replay mutated the retention state")
      }
    } finally q.stop()
  }
}
