package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.BulkIndexer

/** Distributed bulk export: ES _bulk file shape, batch sizing, complete
  * coverage, and accumulator-backed stats — with no row ever reaching
  * the driver.
  */
class BulkIndexerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("writes action/doc line pairs covering every row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk").toString
    val df = (1 to 10).map(i => (s"id$i", s"text $i")).toDF("chunk_id", "text")
      .repartition(3)
    val stats = BulkIndexer.writeBulkFiles(df, "chunk_id", dir, batchSize = 2)
    assert(stats.docs == 10)
    assert(stats.batches == 5 || stats.batches == 6 || stats.batches == 7) // partition remainders
    assert(stats.partitions <= 3)

    val files = Files.list(Paths.get(dir)).iterator().asScala.toSeq
    assert(files.nonEmpty && files.forall(_.getFileName.toString.endsWith(".bulk.jsonl")))
    val lines = files.flatMap(f => Files.readAllLines(f).asScala)
    val actions = lines.filter(_.startsWith("{\"index\":"))
    val docs = lines.filterNot(_.startsWith("{\"index\":"))
    assert(actions.size == 10 && docs.size == 10)
    // every id appears exactly once as an action line
    val ids = actions.map(a => "\"_id\":\"(id\\d+)\"".r.findFirstMatchIn(a).get.group(1))
    assert(ids.sorted == (1 to 10).map(i => s"id$i").sorted)
    // doc lines are the full-row JSON
    assert(docs.forall(d => d.contains("\"chunk_id\"") && d.contains("\"text\"")))
  }

  test("ids are JSON-escaped; null ids are rejected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk3").toString
    val df = Seq(("doc\"quoted\\x", "a")).toDF("chunk_id", "text")
    BulkIndexer.writeBulkFiles(df, "chunk_id", dir, batchSize = 10)
    val line = Files.list(Paths.get(dir)).iterator().asScala.toSeq
      .flatMap(f => Files.readAllLines(f).asScala).find(_.startsWith("{\"index\":")).get
    assert(line == "{\"index\":{\"_id\":\"doc\\\"quoted\\\\x\"}}")

    val bad = Seq((null.asInstanceOf[String], "a")).toDF("chunk_id", "text")
    val err = intercept[org.apache.spark.SparkException] {
      BulkIndexer.writeBulkFiles(bad, "chunk_id",
        Files.createTempDirectory("graft-bulk4").toString)
    }
    assert(err.getMessage.contains("null") ||
      Option(err.getCause).exists(_.getMessage.contains("null")))
  }

  test("batch size bounds docs per file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bulk2").toString
    val df = (1 to 25).map(i => (s"c$i", i)).toDF("chunk_id", "n").repartition(2)
    BulkIndexer.writeBulkFiles(df, "chunk_id", dir, batchSize = 4)
    val files = Files.list(Paths.get(dir)).iterator().asScala.toSeq
    files.foreach { f =>
      val n = Files.readAllLines(f).size
      assert(n % 2 == 0 && n <= 8, s"file $f has $n lines") // ≤4 docs ⇒ ≤8 lines
    }
  }
}
