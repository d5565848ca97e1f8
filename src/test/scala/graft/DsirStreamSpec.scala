package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DsirStream

/** Streaming DSIR selection: with a frozen weight table, the
  * stream-maintained global top-k equals the batch selection over
  * everything ingested at every batch boundary, and re-delivery is
  * idempotent (the top-k fold is associative in the doc set).
  */
class DsirStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("topk select sink: stream == batch at each boundary; re-delivery idempotent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-dsir")
    val table = dir.resolve("sel").toString
    val ckpt = dir.resolve("ckpt").toString
    val k = 7
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    // weights frozen from the full reference corpus (the paper's
    // fixed-sample protocol); the stream then scores arrivals only
    val wts = DsirStream.trainWeights(corpus.toDF("doc_id", "source", "text"))
    val (batch1, rest) = corpus.partition(_._1 % 3 == 0)
    val (batch2, batch3) = rest.partition(_._1 % 3 == 1)
    def expected(rows: Seq[(Long, String, String)]) =
      DsirStream.batchSelect(rows.toDF("doc_id", "source", "text"), wts, k)
        .select("doc_id", "w_e6").as[(Long, Long)].collect().toSet
    def got() = graft.operators.TableMerge.read(spark, table)
      .select("doc_id", "w_e6").as[(Long, Long)].collect().toSet
    val stream = MemoryStream[(Long, String, String)]
    val q = DsirStream.topKSelectSink(
      stream.toDF().toDF("doc_id", "source", "text"), wts, table, ckpt, k = k)
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      assert(got() == expected(batch1), "boundary 1: stream != batch")
      stream.addData(batch2: _*)
      q.processAllAvailable()
      assert(got() == expected(batch1 ++ batch2), "boundary 2: stream != batch")
      // re-deliver batch 1 verbatim: scores are frozen, nothing moves
      stream.addData(batch1: _*)
      q.processAllAvailable()
      assert(got() == expected(batch1 ++ batch2), "re-delivery changed the selection")
      stream.addData(batch3: _*)
      q.processAllAvailable()
      assert(got() == expected(corpus), "final boundary: stream != full batch")
      assert(got().size == k)
    } finally q.stop()
  }
}
