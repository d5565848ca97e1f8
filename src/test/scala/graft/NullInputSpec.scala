package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-injected robustness sweep: EVERY registry query must plan and
  * execute against a twin of the testdata in which every non-key column
  * is NULL on a deterministic ~20% of rows.
  *
  * Production bronze data is messy — scraped payloads carry missing
  * titles, texts, languages, prices — and the classic failure modes
  * are a Scala UDF with a primitive/String parameter NPE-ing on a null
  * cell, arithmetic assuming a non-null operand, and join keys that
  * were "always there" in the clean fixture. Like EmptyInputSpec this
  * pins the NO-CRASH contract (results on nulled rows are free to be
  * filtered/degraded); value-correctness on clean data stays with the
  * DuckDB oracle gate.
  *
  * The first column of every table (its key: doc_id, vec_id, event_id,
  * *_key) stays non-null so the twin keeps joinable spine rows.
  */
class NullInputSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val nullyDir: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = new java.io.File("target/graft-state/nully-sf")
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete(); ()
    }
    wipe(root)
    val dir = root.getAbsolutePath
    Tables.names.foreach { n =>
      val base = Tables.t(spark, "/root/testdata/sf0.001", n)
      val key = col(base.columns.head)
      val nulled = base.columns.tail.foldLeft(base) { (acc, c) =>
        acc.withColumn(c,
          when(pmod(xxhash64(key), lit(5)) === 0, lit(null)).otherwise(col(c)))
      }
      // flat single-file layout, like the real testdata (see EmptyInputSpec)
      val tmp = s"$dir/_tmp_$n"
      nulled.coalesce(1).write.mode("overwrite").parquet(tmp)
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
    test(s"$name survives null-injected rows") {
      fn(spark, nullyDir).write.mode("overwrite").format("noop").save()
    }
  }
}
