package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SamplerStream

/** Streaming quota sampler: stream-maintained per-source bottom-k ==
  * the batch query over everything ingested, at every batch boundary;
  * re-delivered docs cannot displace anything; quiet source buckets
  * hard-link.
  */
class SamplerStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("quota sample sink: stream == batch at each boundary, idempotent re-delivery, quiet buckets") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-sampler")
    val table = dir.resolve("idx").toString
    val ckpt = dir.resolve("ckpt").toString
    val nBuckets = 32
    val k = 2
    def bucketOf(src: String): Int = spark.range(1)
      .select(pmod(hash(lit(src)), lit(nBuckets))).head().getInt(0)
    def inodesOf(bucket: Int): Set[Long] = {
      val live = Paths.get(table, Files.readString(Paths.get(table, "_current")).trim)
      val bdir = live.resolve(s"bucket=$bucket")
      val files = scala.collection.mutable.Set[Long]()
      if (Files.exists(bdir)) Files.walk(bdir).forEach { p: Path =>
        if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          files += Files.getAttribute(p, "unix:ino").asInstanceOf[Long]
      }
      files.toSet
    }
    // 3 sources x several docs; batch 2 touches only srcB/srcC
    val batch1 = Seq(
      (1L, "srcA"), (2L, "srcA"), (3L, "srcA"),
      (10L, "srcB"), (11L, "srcB"),
      (20L, "srcC"))
    val batch2 = Seq(
      (12L, "srcB"), (13L, "srcB"),
      (21L, "srcC"), (22L, "srcC"))
    assert(bucketOf("srcA") != bucketOf("srcB") && bucketOf("srcA") != bucketOf("srcC"),
      "fixture degenerate: srcA shares a bucket with a touched source")
    def expected(rows: Seq[(Long, String)]) =
      SamplerStream.batchSample(rows.toDF("doc_id", "source"), k)
        .select("source", "doc_id").as[(String, Long)].collect().toSet
    def got() = graft.operators.TableMerge.read(spark, table)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    val stream = MemoryStream[(Long, String)]
    val q = SamplerStream.quotaSampleSink(
      stream.toDF().toDF("doc_id", "source"), table, ckpt, k = k, nBuckets = nBuckets)
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      assert(got() == expected(batch1), "boundary 1: stream != batch")
      val aBefore = inodesOf(bucketOf("srcA"))
      stream.addData(batch2: _*)
      q.processAllAvailable()
      assert(got() == expected(batch1 ++ batch2), "boundary 2: stream != batch")
      assert(inodesOf(bucketOf("srcA")) == aBefore, "untouched srcA bucket rewritten")
      // re-deliver batch 1 verbatim: bottom-k is idempotent, nothing moves
      stream.addData(batch1: _*)
      q.processAllAvailable()
      assert(got() == expected(batch1 ++ batch2), "re-delivery changed the sample")
    } finally q.stop()
  }
}
