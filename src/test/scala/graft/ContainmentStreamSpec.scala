package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ContainmentStream

/** Streaming containment screen (VERDICT r13 #8): the shingle-index
  * sink's stream==batch proof, the set-replace semantics on re-scrape,
  * the quiet-bucket hard-link (inode) claim, and the asymmetric
  * excerpt-detection screen through the stream-built index.
  */
class ContainmentStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("shingle index sink: stream == batch, re-scrape replaces the set, excerpt screened") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-contain")
    val table = dir.resolve("idx").toString
    val ckpt = dir.resolve("ckpt").toString
    val nBuckets = 32
    def bucketOf(id: Long): Int = spark.range(1)
      .select(pmod(hash(lit(id)), lit(nBuckets))).head().getInt(0)
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
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "pack my box with five dozen liquor jugs today friend"),
      (3L, "sphinx of black quartz judge my vow right now ok"))
    // batch 2: a new doc + a RE-SCRAPE of doc 1 whose text change
    // CHANGES ITS SHINGLE SET (stale shingles must vanish, not linger)
    val batch2 = Seq(
      (4L, "another fresh document with its own vocabulary stream here"),
      (1L, "totally rewritten content with nothing shared at all anymore"))
    val stream = MemoryStream[(Long, String)]
    val q = ContainmentStream.shingleIndexSink(
      stream.toDF().toDF("doc_id", "text"), table, ckpt, nBuckets = nBuckets)
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      val touched2 = batch2.map(t => bucketOf(t._1)).toSet
      val quiet = batch1.map(t => bucketOf(t._1)).toSet -- touched2
      assert(quiet.nonEmpty, "fixture degenerate: every bucket touched by batch 2")
      val quietBefore = quiet.map(b => b -> inodesOf(b)).toMap
      stream.addData(batch2: _*)
      q.processAllAvailable()
      quiet.foreach { b =>
        assert(inodesOf(b) == quietBefore(b), s"quiet bucket $b rewritten")
      }
      // stream-built == batch-built over the latest text per doc — in
      // particular doc 1's ORIGINAL shingles are gone (set replace)
      val latest = (batch1 ++ batch2).groupBy(_._1).map(_._2.last).toSeq
      val expected = ContainmentStream.docShingles(latest.toDF("doc_id", "text"))
        .as[(Long, Long)].collect().toSet
      val got = graft.operators.TableMerge.read(spark, table)
        .select("doc_id", "sh").as[(Long, Long)].collect().toSet
      assert(got == expected, "stream-maintained shingle set != batch-built")
      // screen through the STREAM-built index: an interior excerpt of
      // doc 2 (first and last tokens dropped — a window NO Jaccard band
      // on the full set is guaranteed to catch) must be flagged
      // contained in doc 2; a fresh-vocabulary doc must match nothing
      val probe = Seq(
        (20L, "my box with five dozen liquor jugs today"),
        (21L, "entirely different sentence with brand new words only here")).toDF("doc_id", "text")
      val idx = graft.operators.TableMerge.read(spark, table).select("doc_id", "sh")
      val hits = ContainmentStream.containmentScreen(probe, idx)
        .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(hits == Set((20L, 2L)), s"containment screen wrong: $hits")
      // full-coverage sanity: an exact copy of doc 3 screens at 10000
      val copy = Seq((30L, batch1(2)._2)).toDF("doc_id", "text")
      val full = ContainmentStream.containmentScreen(copy, idx)
        .as[(Long, Long, Long)].collect().toSet
      assert(full == Set((30L, 3L, 10000L)), s"exact copy not fully contained: $full")
    } finally q.stop()
  }

  test("re-scrape to a too-short text clears the doc's index entry") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-contain-clear")
    val table = dir.resolve("idx").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val q = ContainmentStream.shingleIndexSink(
      stream.toDF().toDF("doc_id", "text"), table, ckpt)
    try {
      stream.addData((1L, "alpha beta gamma delta epsilon zeta"))
      q.processAllAvailable()
      assert(graft.operators.TableMerge.read(spark, table).count() > 0)
      stream.addData((1L, "too short")) // 2 tokens < shingle width
      q.processAllAvailable()
      val left = graft.operators.TableMerge.read(spark, table)
        .filter(col("doc_id") === 1L).count()
      assert(left == 0L, s"stale shingles lingered after short re-scrape: $left rows")
    } finally q.stop()
  }
}
