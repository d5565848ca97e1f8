package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** The z-order layout's skipping property, measured on real data: files
  * from a z-sorted write cover bounded rectangles in BOTH dimensions,
  * where a single-column sort leaves the second dimension's per-file
  * extent near the full range (no pruning possible on it).
  */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("z-ordered files bound both dimensions; x-sorted files leave y unbounded") {
    val dims = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("CAST(o_custkey % 65536 AS BIGINT) AS x",
        "CAST(datediff(o_orderdate, DATE '1992-01-01') % 65536 AS BIGINT) AS y")
    val base = Files.createTempDirectory("graft-layout")
    val zdir = base.resolve("zorder").toString
    val ldir = base.resolve("linear").toString
    Layout.writeZOrdered(dims, zdir, "x", "y", numFiles = 8)
    dims.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)

    def avgExtents(dir: String): (Double, Double) = {
      val r = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .agg(avg("xr"), avg("yr")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zx, zy) = avgExtents(zdir)
    val (lx, ly) = avgExtents(ldir)
    val fullY = ly // x-sorted files see ~the full y range per file
    assert(zy < 0.75 * fullY,
      s"z-order did not bound y: avg y-extent $zy vs linear $fullY")
    // the x trade: z files give up some x-locality but must stay far
    // from unbounded (a random layout would cover ~the full x range)
    val r = dims.agg(max("x") - min("x")).head()
    val fullX = r.getLong(0).toDouble
    assert(zx < 0.9 * fullX, s"z-order x-extent $zx ~ unbounded ($fullX)")
    assert(lx < zx, "sanity: single-column sort should have the best x-locality")
  }

  test("IVF-bucketed layout: probe filter prunes partitions at the scan, same results") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = Files.createTempDirectory("graft-ivf").resolve("emb").toString
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Layout.writeIvfBucketed(embs, dir, nlist = 16)
    val probes = Seq(0, 3, 7, 11)
    val pruned = spark.read.parquet(dir)
      .filter(col("centroid_id").isin(probes: _*))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val scannedFiles = scan.metrics("numFiles").value
    def parquetFilesUnder(p: java.io.File): Long =
      Option(p.listFiles()).map(_.map(f =>
        if (f.isDirectory) parquetFilesUnder(f)
        else if (f.getName.endsWith(".parquet")) 1L else 0L).sum).getOrElse(0L)
    val totalFiles = parquetFilesUnder(new java.io.File(dir))
    assert(scannedFiles > 0 && scannedFiles < totalFiles,
      s"expected pruning: scanned $scannedFiles of $totalFiles files")
    // partition pruning must not change WHAT is read: same vec_id set as
    // computing the assignment on the fly over the unbucketed table
    val expected = embs
      .selectExpr("vec_id", "graft_ivf_assign(embedding, 16) AS c")
      .filter(col("c").isin(probes: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = pruned.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("wide-range dimensions (epoch-nanos scale) do not overflow the grid") {
    import spark.implicits._
    // range ~1.7e18: (c - lo) * 65536 would wrap a long; the grid
    // scales in double space instead
    val wide = Seq(
      (-900000000000000000L, 1L), (0L, 500L), (900000000000000000L, 1000L))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("graft-layout-wide").resolve("z").toString
    Layout.writeZOrdered(wide, dir, "x", "y", numFiles = 2)
    val back = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    assert(back == wide.as[(Long, Long)].collect().toSet)
  }
}
