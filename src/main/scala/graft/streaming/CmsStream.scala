package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING COUNT-MIN maintenance — the stream twin of
  * `agg_cms_estimate`: a persisted one-row counter table
  * (`cms ARRAY<BIGINT>`, depth×width ≈ 8 KiB) absorbs each
  * micro-batch's sketch by element-wise addition. Counter addition is
  * the sketch's own merge, so the maintained table is BIT-IDENTICAL to
  * the batch sketch over everything ingested at any batch boundary —
  * but unlike the bottom-k/top-k samplers, ADDITION IS NOT IDEMPOTENT:
  * a replayed batch would double-count. Exactly-once therefore rides
  * the [[EventStreams]] matview protocol — each commit is tagged with
  * its batchId in [[graft.operators.TableMerge]] commit metadata, and
  * a replay that finds its id (or a later one) already committed is a
  * full no-op (CmsStreamSpec drives the replay path directly).
  *
  * This is the 100 TB heavy-hitter monitor shape: per-batch cost is
  * one fixed-size aggregate over the BATCH plus an 8 KiB read-modify-
  * write; the state never grows with the corpus, and any point's
  * frequency estimate reads off the live row with `element_at`+`least`.
  */
object CmsStream {

  /** Commit-metadata key for the exactly-once batch tag. */
  private[graft] val CmsBatchKey = "graft.cms.batch"

  /** Commit-metadata key for the owning run (checkpoint) id. BatchIds
    * are only monotone WITHIN one checkpoint lineage — if the
    * checkpoint is reset while the counter table is kept, ids restart
    * at 0 and a bare `>= batchId` skip would silently drop every new
    * batch forever. The run id scopes the skip to its own lineage; a
    * foreign lineage over a non-empty table fails loudly instead. */
  private[graft] val CmsRunKey = "graft.cms.run"

  /** One-row `(cms ARRAY<BIGINT>)` sketch of a docs frame's tokens —
    * the same expression as the battery row, so stream and batch
    * cannot drift. */
  def batchSketch(docs: DataFrame, depth: Int = 4, width: Int = 256): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(expr(s"graft_cms_agg(tok, $depth, $width)").as("cms"))

  /** The per-micro-batch apply, factored out so the replay protocol is
    * testable without crashing a real query: applying the same batchId
    * twice must leave the counters unchanged. */
  private[graft] def applyCmsBatch(batch: DataFrame, batchId: Long,
      tablePath: String, depth: Int, width: Int, runId: String): Unit = {
    import graft.operators.TableMerge
    val tagged = if (TableMerge.exists(tablePath))
      TableMerge.versions(tablePath).flatMap { v =>
        val m = TableMerge.versionMeta(tablePath, v)
        m.get(CmsBatchKey).map(b => (m.getOrElse(CmsRunKey, ""), b.toLong))
      } else Seq.empty
    val foreign = tagged.collect { case (r, _) if r != runId => r }.distinct
    require(foreign.isEmpty,
      s"CMS counter table $tablePath was built by run(s) ${foreign.mkString(",")} " +
        s"but this query's run id is $runId — a reset checkpoint over kept counters " +
        "would double-count (replayed source) or silently drop batches (restarted " +
        "ids). Point the query at a fresh table or delete the stale one.")
    val already = tagged.exists { case (_, b) => b >= batchId }
    if (!batch.isEmpty && !already) {
      val s = batch.sparkSession
      val add = batchSketch(batch, depth, width)
      val merged =
        if (TableMerge.exists(tablePath))
          TableMerge.read(s, tablePath).select(col("cms").as("cur"))
            .crossJoin(add.select(col("cms").as("nxt")))
            .selectExpr("zip_with(cur, nxt, (a, b) -> a + b) AS cms")
        else add
      TableMerge.createOrReplace(merged, tablePath,
        meta = Map(CmsBatchKey -> batchId.toString, CmsRunKey -> runId))
    }
  }

  /** Name of the nonce file that IS the run id. The checkpoint PATH is
    * not a sound run id (ADVICE r16): the most common reset — delete
    * and recreate the checkpoint at the same path — would keep the
    * same id while batchIds restart at 0, so `>= batchId` would
    * silently drop every new batch, the exact failure the lineage
    * guard exists to catch. A nonce file created WITH the checkpoint
    * changes identity on every wipe: a reset lineage over kept
    * counters now trips the loud foreign-run require. */
  private[graft] val RunNonceFile = "_graft_cms_run"

  /** Run id for a checkpoint dir: the persisted nonce, created on
    * first use (i.e. together with the checkpoint lineage itself). */
  private[graft] def runIdFor(checkpointDir: String): String = {
    val dir = java.nio.file.Paths.get(checkpointDir)
    java.nio.file.Files.createDirectories(dir)
    val nonce = dir.resolve(RunNonceFile)
    if (!java.nio.file.Files.exists(nonce)) {
      val id = java.util.UUID.randomUUID().toString
      val tmp = dir.resolve(s".$RunNonceFile.tmp-${System.nanoTime()}")
      java.nio.file.Files.writeString(tmp, id)
      // exclusive-create via hard LINK, not rename: POSIX rename onto
      // an existing target silently REPLACES it, so an ATOMIC_MOVE race
      // would clobber the winner's nonce after the winner already read
      // it — link(2) fails with EEXIST instead, and the loser adopts
      try java.nio.file.Files.createLink(nonce, tmp)
      catch { // concurrent creator won: adopt its nonce
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: UnsupportedOperationException =>
          // no hard-link support on this filesystem (ADVICE r17): fall
          // back to the pre-r17 ATOMIC_MOVE publication. Rename onto an
          // existing target silently replaces it, so a raced loser could
          // clobber the winner's nonce — acceptable only because BOTH
          // racers are creating the same brand-new lineage (neither has
          // read the nonce yet; the final readString below adopts
          // whichever publication survived).
          try java.nio.file.Files.move(tmp, nonce,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            // raced loser (winner already published) is benign; but if
            // the nonce STILL doesn't exist, both publication paths
            // failed — rethrow the real cause instead of letting the
            // unconditional read below mask it (ADVICE r18)
            case e: java.io.IOException =>
              if (!java.nio.file.Files.exists(nonce))
                throw new IllegalStateException(
                  s"cannot publish run nonce at $nonce (hard links " +
                    "unsupported and the atomic-move fallback failed)", e)
          }
      }
      finally java.nio.file.Files.deleteIfExists(tmp): Unit
    }
    java.nio.file.Files.readString(nonce).trim
  }

  /** Streaming maintenance of the persisted counter table. The run id
    * is a nonce persisted INSIDE the checkpoint dir (created with it,
    * wiped with it), so the batchId replay skip is scoped to exactly
    * one checkpoint lineage — same checkpoint → same nonce → sound
    * skip; wiped-and-recreated checkpoint → fresh nonce → loud
    * foreign-lineage failure instead of silent drops. */
  def sketchSink(docs: DataFrame, tablePath: String, checkpointDir: String,
                 depth: Int = 4,
                 width: Int = 256): org.apache.spark.sql.streaming.StreamingQuery = {
    val runId = runIdFor(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCmsBatch(batch, batchId, tablePath, depth, width, runId)
      }
      .start()
  }
}
