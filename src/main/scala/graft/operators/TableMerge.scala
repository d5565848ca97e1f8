package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE emulation over plain Parquet directories — the one
  * genuinely custom engine piece (SURVEY.md §7.3). Reproduces the
  * reference's Iceberg sinks:
  *
  *  - K1 upsert  — `MERGE … WHEN MATCHED UPDATE SET * WHEN NOT MATCHED
  *    INSERT *` (`silver/transformer.py:2427-2458`)
  *  - K2 delete  — `WHEN MATCHED THEN DELETE` (`transformer.py:2460-2484`)
  *  - K3 create-or-replace (`transformer.py:1415-1426`)
  *  - K5 schema evolution — `ALTER TABLE ADD COLUMN` per new column before
  *    merge (`transformer.py:2421-2425`) → union-by-name with null padding
  *
  * Commit protocol (the Iceberg snapshot-pointer analogue for a plain
  * FS): a table directory holds immutable version dirs `v-<nanos>` plus
  * a `_current` pointer file naming the live one. Writers build a new
  * version dir, then atomically replace `_current`; readers resolve the
  * pointer once and scan an immutable snapshot — there is NO window in
  * which a concurrent reader sees a missing or half-written table (the
  * pre-r5 retire-then-promote double rename had one). The previous
  * version is retained through one commit so a reader that resolved just
  * before the swap can finish its scan; older versions are pruned.
  * Writers are still single-writer (no pointer CAS — the reference's
  * Airflow DAG serializes merges the same way).
  *
  * Scale posture: the rewrite is partition-scoped when the merge keys
  * cover the partition columns (key implies partition ⇒ untouched
  * partitions are HARD-LINKED into the new version, never read,
  * rewritten, or stolen from the live snapshot); the anti-join shuffles
  * only on the merge keys and AQE handles skew.
  */
object TableMerge {

  private val PointerName = "_current"

  private def pointerPath(tablePath: String): Path = Paths.get(tablePath, PointerName)

  /** Live version dir, if the table uses the versioned layout. */
  private def resolveLive(tablePath: String): Option[Path] = {
    val p = pointerPath(tablePath)
    if (!Files.exists(p)) None
    else {
      val dir = Paths.get(tablePath, Files.readString(p).trim)
      if (Files.exists(dir)) Some(dir) else None
    }
  }

  /** A committed table exists: versioned pointer, or a legacy plain
    * parquet dir (pre-pointer layout) with top-level content. */
  def exists(tablePath: String): Boolean =
    resolveLive(tablePath).isDefined || {
      val p = Paths.get(tablePath)
      !Files.exists(pointerPath(tablePath)) && Files.exists(p) &&
        Option(p.toFile.listFiles()).exists(_.exists(f =>
          !f.getName.startsWith(".") && !f.getName.startsWith("v-")))
    }

  def read(spark: SparkSession, tablePath: String): DataFrame =
    resolveLive(tablePath) match {
      case Some(dir) => spark.read.option("mergeSchema", "true").parquet(dir.toString)
      case None => spark.read.option("mergeSchema", "true").parquet(tablePath)
    }

  /** K3 — full replace with atomic pointer swap. */
  def createOrReplace(df: DataFrame, tablePath: String, partitionCols: Seq[String] = Seq.empty): Unit = {
    val version = newVersionDir(tablePath)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(version.toString)
    commitVersion(tablePath, version)
  }

  /** K1 + K5 — upsert `source` into the table at `tablePath` on `keys`.
    * Matched target rows are replaced wholesale by the source row
    * (`UPDATE SET *`); unmatched source rows are inserted; columns new to
    * either side are null-padded (additive schema evolution). `source`
    * must be unique per key (the reference dedups upstream, W1/A7); we
    * enforce it cheaply with a `dropDuplicates(keys)`.
    */
  def upsert(spark: SparkSession, tablePath: String, source: DataFrame,
             keys: Seq[String], partitionCols: Seq[String] = Seq.empty): Unit = {
    require(keys.nonEmpty, "merge keys required")
    val src = source.dropDuplicates(keys)
    if (!exists(tablePath)) { createOrReplace(src, tablePath, partitionCols); return }

    val target = read(spark, tablePath)
    val liveDir = resolveLive(tablePath).getOrElse(Paths.get(tablePath))
    val partitionScoped = partitionCols.nonEmpty && partitionCols.forall(keys.contains)
    if (partitionScoped) {
      // Key implies partition ⇒ a matched target row always lives in a
      // partition the source also touches; hard-link untouched partition
      // trees into the new version (no data read/rewrite, and the live
      // snapshot keeps its files for in-flight readers) and rewrite only
      // the touched ones.
      val touched = src.select(partitionCols.map(col): _*).distinct()
      val targetTouched = target.join(broadcast(touched), partitionCols, "left_semi")
      val merged = mergeRows(targetTouched, src, keys)
      val version = newVersionDir(tablePath)
      merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(version.toString)
      carryUntouchedPartitions(liveDir, version, partitionCols,
        touchedPartitionDirs(touched))
      commitVersion(tablePath, version)
    } else {
      val merged = mergeRows(target, src, keys)
      val version = newVersionDir(tablePath)
      val writer = merged.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(version.toString)
      commitVersion(tablePath, version)
    }
  }

  /** Fused K2+K1 — one copy-on-write rewrite that drops every target row
    * whose `groupKeys` tuple appears in `dropGroups`, then inserts `source`
    * wholesale: result = (target ⟕̸ dropGroups) ⊎ source. Equivalent to
    * `delete(dropGroups)` followed by `upsert(source)` when the source
    * rows all belong to dropped groups (the chunk-resync shape,
    * `transformer.py:2460-2484` delete + 2427-2458 insert), but pays ONE
    * table rewrite instead of two. */
  def replaceKeys(spark: SparkSession, tablePath: String, source: DataFrame,
                  dropGroups: DataFrame, groupKeys: Seq[String],
                  partitionCols: Seq[String] = Seq.empty): Unit = {
    require(groupKeys.nonEmpty, "group keys required")
    if (!exists(tablePath)) { createOrReplace(source, tablePath, partitionCols); return }
    val target = read(spark, tablePath)
    val remaining = target.join(
      dropGroups.select(groupKeys.map(col): _*).distinct(), groupKeys, "left_anti")
    val merged = remaining.unionByName(source, allowMissingColumns = true)
    val version = newVersionDir(tablePath)
    val writer = merged.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(version.toString)
    commitVersion(tablePath, version)
  }

  /** K2 — delete rows whose key appears in `deleteKeys`. */
  def delete(spark: SparkSession, tablePath: String, deleteKeys: DataFrame,
             keys: Seq[String], partitionCols: Seq[String] = Seq.empty): Unit = {
    if (!exists(tablePath)) return
    val target = read(spark, tablePath)
    val remaining = target.join(deleteKeys.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val version = newVersionDir(tablePath)
    val writer = remaining.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(version.toString)
    commitVersion(tablePath, version)
  }

  /** UPDATE-SET-* + INSERT-* semantics with union-by-name schema
    * evolution: result = (target ∖ source-keys) ⊎ source.
    */
  private def mergeRows(target: DataFrame, src: DataFrame, keys: Seq[String]): DataFrame = {
    val notMatched = target.join(src.select(keys.map(col): _*).distinct(), keys, "left_anti")
    notMatched.unionByName(src, allowMissingColumns = true)
  }

  private def newVersionDir(tablePath: String): Path = {
    val dir = Paths.get(tablePath, s"v-${System.nanoTime()}")
    Files.createDirectories(Paths.get(tablePath))
    dir
  }

  /** Atomic commit: stage the pointer content beside `_current`, rename
    * over it (atomic on POSIX), then prune versions older than the one
    * just replaced. Keeping exactly one prior version gives in-flight
    * readers a full commit-cycle grace period.
    */
  private def commitVersion(tablePath: String, version: Path): Unit = {
    val pointer = pointerPath(tablePath)
    val prev = if (Files.exists(pointer)) Some(Files.readString(pointer).trim) else None
    val tmp = pointer.resolveSibling(s".$PointerName.tmp-${System.nanoTime()}")
    Files.writeString(tmp, version.getFileName.toString)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE)
    val keep = Set(version.getFileName.toString) ++ prev
    Option(Paths.get(tablePath).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v-") && !keep(f.getName))
      .foreach(f => deleteRecursively(f.toPath))
  }

  /** Hive-style partition dir prefixes (`col=value`) touched by the merge. */
  private def touchedPartitionDirs(touched: DataFrame): Set[String] = {
    val cols = touched.columns
    touched.collect().map { row =>
      cols.zipWithIndex.map { case (c, i) =>
        val v = Option(row.get(i)).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")
        s"$c=$v"
      }.mkString("/")
    }.toSet
  }

  /** Hard-link untouched first-level partition trees from the live
    * snapshot into the new version (no data rewrite, live files stay in
    * place for concurrent readers; falls back to copy on filesystems
    * without link support).
    */
  private def carryUntouchedPartitions(live: Path, staging: Path,
                                       partitionCols: Seq[String],
                                       touched: Set[String]): Unit = {
    def walk(liveDir: Path, stagingDir: Path, depth: Int, prefix: String): Unit = {
      if (depth == partitionCols.length) return
      val children = Option(liveDir.toFile.listFiles()).getOrElse(Array.empty)
      children.filter(f => f.isDirectory && f.getName.contains("=")).foreach { d =>
        val rel = if (prefix.isEmpty) d.getName else s"$prefix/${d.getName}"
        val isTouchedPrefix = touched.exists(t => t == rel || t.startsWith(rel + "/"))
        val dest = stagingDir.resolve(d.getName)
        if (!isTouchedPrefix) {
          if (!Files.exists(dest)) linkTree(d.toPath, dest)
        } else if (depth + 1 < partitionCols.length) {
          Files.createDirectories(dest)
          walk(d.toPath, dest, depth + 1, rel)
        }
      }
    }
    walk(live, staging, 0, "")
  }

  private def linkTree(src: Path, dest: Path): Unit =
    if (Files.isDirectory(src)) {
      Files.createDirectories(dest)
      Option(src.toFile.listFiles()).getOrElse(Array.empty)
        .foreach(c => linkTree(c.toPath, dest.resolve(c.getName)))
    } else {
      try Files.createLink(dest, src)
      catch { case _: UnsupportedOperationException =>
        Files.copy(src, dest, StandardCopyOption.COPY_ATTRIBUTES): Unit
      }
    }

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(c => deleteRecursively(c.toPath))
    f.delete(): Unit
  }
}
