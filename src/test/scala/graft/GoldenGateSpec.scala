package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PipelineQueries

/** The golden-digest gate must be FATAL (VERDICT r9 #1): a rows-only
  * battery entry whose pinned per-sf digest mismatches has to fail the
  * whole query — flipping its CORRECTNESS row to `err` — rather than
  * quietly carrying `golden_ok=false` in a column nobody inspects.
  *
  * Proven at two levels: the gate primitive itself (wrong constant →
  * raise, right constant → true, no constant → NULL), and end-to-end —
  * a one-token perturbation of the sf0.001 corpus, written to a twin
  * dir NAMED `sf0.001` so the pinned constant applies, turns
  * `chunk_paragraph` into a hard failure while the pristine corpus
  * still passes.
  */
class GoldenGateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** raise_error surfaces wrapped differently under codegen vs
    * interpreted eval — search the whole cause chain. */
  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("gate primitive: mismatch raises, match passes, unpinned is NULL") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val digest = PipelineQueries.withGoldenDigestExpected(df, None, "unit")
      .select("golden_digest").head().getLong(0)

    val ok = PipelineQueries.withGoldenDigestExpected(df, Some(digest), "unit")
      .select("golden_ok").collect()
    assert(ok.length == 3 && ok.forall(_.getBoolean(0)))

    val unpinned = PipelineQueries.withGoldenDigestExpected(df, None, "unit")
      .select("golden_ok").collect()
    assert(unpinned.forall(_.isNullAt(0)))

    val e = intercept[Throwable] {
      PipelineQueries.withGoldenDigestExpected(df, Some(digest + 1), "unit").collect()
    }
    assert(messageChain(e).contains("golden digest drift in unit"),
      s"unexpected failure: ${messageChain(e)}")
  }

  test("end-to-end: perturbed corpus twin makes chunk_paragraph fatal") {
    val sf = "/root/testdata/sf0.001"
    // pristine corpus at the pinned sf: the gate passes and flags ok
    val pristine = SparkEntry.queries("chunk_paragraph")(spark, sf)
      .select("golden_ok").limit(5).collect()
    assert(pristine.nonEmpty && pristine.forall(_.getBoolean(0)))

    // one-token perturbation: append a token to a single document's text,
    // keep the dir name `sf0.001` so the pinned constant still applies
    val root = new java.io.File("target/graft-state/golden-gate/sf0.001")
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
    }
    wipe(root.getParentFile)
    val dir = root.getAbsolutePath
    val tmp = s"$dir/_tmp_documents"
    Tables.documents(spark, sf)
      .withColumn("text",
        when(col("doc_id") === 7, concat(col("text"), lit(" drifted")))
          .otherwise(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Option(new java.io.File(tmp).listFiles()).get
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(dir))
    Files.move(part.toPath, Paths.get(s"$dir/documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    wipe(new java.io.File(tmp))

    val e = intercept[Throwable] {
      SparkEntry.queries("chunk_paragraph")(spark, dir).collect()
    }
    assert(messageChain(e).contains("golden digest drift in chunk_paragraph"),
      s"unexpected failure: ${messageChain(e)}")
  }
}
