package graft.streaming

/** Shared exactly-once plumbing for foreachBatch sinks whose state
  * fold is NOT idempotent (running means, counter adds, view deltas):
  * the Delta txn-appId pattern over TableMerge commit metadata, as
  * pioneered by [[CmsStream]] (r16/r17) and generalized here.
  *
  * Two halves, both required:
  *  - a BATCH tag on every state commit: a replay that finds its
  *    batchId (or a later one) already committed is a full no-op;
  *  - a RUN id scoping the skip to one checkpoint lineage: batchIds
  *    are only monotone WITHIN a checkpoint — the common reset (wipe
  *    and recreate the checkpoint at the same path) restarts ids at 0,
  *    and a bare `>= batchId` skip would then silently drop every new
  *    batch forever. The run id is a nonce file created WITH the
  *    checkpoint (wiped with it), so a reset lineage over kept state
  *    trips a loud foreign-lineage error instead.
  */
private[graft] object StreamLineage {

  /** Nonce file name inside the checkpoint dir (created with the
    * lineage, destroyed with it). */
  val NonceFile = "_graft_run_nonce"

  /** Run id for a checkpoint dir: the persisted nonce, created on
    * first use. Exclusive-create via hard LINK (rename onto an
    * existing target silently replaces it; link fails with EEXIST and
    * the loser adopts), with an ATOMIC_MOVE fallback on filesystems
    * without hard links. */
  def runIdFor(checkpointDir: String): String = {
    val dir = java.nio.file.Paths.get(checkpointDir)
    java.nio.file.Files.createDirectories(dir)
    val nonce = dir.resolve(NonceFile)
    if (!java.nio.file.Files.exists(nonce)) {
      val id = java.util.UUID.randomUUID().toString
      val tmp = dir.resolve(s".$NonceFile.tmp-${System.nanoTime()}")
      java.nio.file.Files.writeString(tmp, id)
      try java.nio.file.Files.createLink(nonce, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => () // loser adopts
        case _: UnsupportedOperationException =>
          try java.nio.file.Files.move(tmp, nonce,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            // a raced loser's move fails AFTER the winner published —
            // benign. But if the nonce STILL doesn't exist, both the
            // link and the move failed (transient IO, perms): surface
            // the real cause instead of the masking NoSuchFileException
            // the unconditional read below would throw (ADVICE r18).
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

  /** Replay/lineage state of a tagged table: the distinct FOREIGN run
    * ids found on its commits (must be empty — see
    * [[requireSameLineage]]) and whether `batchId` is already applied
    * in THIS run's lineage. Commits with an EMPTY/missing run tag
    * (written by pre-run-id code against the same, continuous
    * checkpoint) are grandfathered as same-lineage — their batchIds
    * join the skip set under the bare `>= batchId` rule, and only a
    * DIFFERENT non-empty run id trips the foreign-lineage failure
    * (ADVICE r18: resuming a legacy state table under its original
    * checkpoint must not fail permanently when no reset occurred). */
  def replayState(tablePath: String, batchKey: String, runKey: String,
                  batchId: Long, runId: String): (Seq[String], Boolean) = {
    import graft.operators.TableMerge
    val tagged =
      if (TableMerge.exists(tablePath))
        TableMerge.versions(tablePath).flatMap { v =>
          val m = TableMerge.versionMeta(tablePath, v)
          m.get(batchKey).map(b => (m.getOrElse(runKey, ""), b.toLong))
        }
      else Seq.empty
    (tagged.collect { case (r, _) if r != runId && r.nonEmpty => r }.distinct,
      tagged.collect { case (r, b) if r == runId || r.isEmpty => b }.exists(_ >= batchId))
  }

  /** Fail loudly when a sink's state table carries another lineage's
    * tags — the reset-checkpoint-over-kept-state hazard. */
  def requireSameLineage(what: String, tablePath: String,
                         foreign: Seq[String], runId: String): Unit =
    require(foreign.isEmpty,
      s"$what table $tablePath was built by run(s) ${foreign.mkString(",")} " +
        s"but this query's run id is $runId — a reset checkpoint over kept " +
        "state would double-count (replayed source) or silently drop batches " +
        "(restarted ids). Point the query at a fresh table or delete the stale one.")
}
