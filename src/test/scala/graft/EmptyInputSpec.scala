package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input robustness sweep: EVERY registry query must plan and
  * execute against a zero-row twin of the testdata without throwing.
  *
  * At production scale this is not a corner case — empty partitions,
  * zero-row CDC batches, freshly-truncated tables, and filters that
  * match nothing are routine, and the classic failure modes are
  * `.head()` on an empty result, a divide-by-zero in a corpus-level
  * statistic, or an aggregate whose empty buffer evaluates to a
  * malformed value. Row counts here are free to be zero; the pinned
  * contract is no-crash (and that the golden-digest columns degrade to
  * NULL, not an error, away from their pinned scale factors).
  *
  * The twin preserves each table's exact on-disk schema (`limit(0)`
  * over the real sf0.001 files), including events' raw long-nanos `ts`
  * so `Tables.events`' rebuild path is exercised too.
  */
class EmptyInputSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val emptyDir: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = new java.io.File("target/graft-state/empty-sf")
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete(); ()
    }
    wipe(root) // stale twins from a previous run (dirs where files go)
    val dir = root.getAbsolutePath
    Tables.names.foreach { n =>
      // the real testdata tables are FLAT single files, not directories
      // (s4's pathGlobFilter matches the file name) — write the empty
      // twin as a directory, then promote the lone part file
      val tmp = s"$dir/_tmp_$n"
      Tables.t(spark, "/root/testdata/sf0.001", n).limit(0)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Option(new java.io.File(tmp).listFiles()).get
        .find(f => f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$n.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      part.getParentFile.listFiles().foreach(_.delete())
      Files.delete(Paths.get(tmp))
    }
    dir
  }

  SparkEntry.all.foreach { case (name, fn) =>
    test(s"$name survives zero-row tables") {
      fn(spark, emptyDir).write.mode("overwrite").format("noop").save()
    }
  }
}
