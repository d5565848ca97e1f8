package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ObjectStatEnricher
import graft.sources.ObjectStatEnricher.AssetRef

/** F16 enrichment: candidate-key resolution through the F4 expansion
  * (s3/bucket/percent-encoding forms), MinIO-style content-md5 etags,
  * and null stats for unresolved assets feeding the I2 drift join.
  */
class ObjectStatEnricherSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("resolves s3/bucket/encoded path forms and stats content") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-store")
    Files.createDirectories(root.resolve("bronze/pdfs"))
    Files.write(root.resolve("bronze/pdfs/a.pdf"), "hello".getBytes)
    Files.write(root.resolve("bronze/pdfs/x y.pdf"), "spaced".getBytes)

    val assets = Seq(
      AssetRef("u1", "s3://warehouse/bronze/pdfs/a.pdf"),     // bucket-prefixed s3 url
      AssetRef("u2", "/warehouse/bronze/pdfs/x%20y.pdf"),     // percent-encoded path
      AssetRef("u3", "bronze/pdfs/missing.pdf"))              // unresolved
      .toDS()
    val got = ObjectStatEnricher.enrich(assets, root.toString, Some("warehouse"))
      .collect().map(s => s.asset_uid -> s).toMap

    assert(got("u1").resolved_key == Some("bronze/pdfs/a.pdf"))
    // md5("hello")
    assert(got("u1").etag == Some("5d41402abc4b2a76b9719d911017c592"))
    assert(got("u1").size_bytes == Some(5L))
    assert(got("u1").last_modified_ms.exists(_ > 0))

    assert(got("u2").resolved_key == Some("bronze/pdfs/x y.pdf")) // decoded candidate won
    assert(got("u2").size_bytes == Some(6L))

    assert(got("u3").resolved_key == None && got("u3").etag == None)
  }

  test("enrichFrame attaches stats as columns for the I2 drift join") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-store2")
    Files.write(root.resolve("k.pdf"), "data".getBytes)
    val df = Seq(("a1", "k.pdf"), ("a2", "nope.pdf")).toDF("uid", "path")
    val enriched = ObjectStatEnricher.enrichFrame(df, "uid", "path", root.toString, None)
      .select("uid", "etag", "size_bytes")
      .as[(String, Option[String], Option[Long])].collect().map(t => t._1 -> t).toMap
    assert(enriched("a1")._3 == Some(4L))
    assert(enriched("a2")._2 == None)
  }
}
