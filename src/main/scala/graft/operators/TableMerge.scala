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
  * Scale posture: the rewrite is partition-scoped when the merge keys
  * cover the partition columns (key implies partition ⇒ untouched
  * partitions are carried over as files, never read or rewritten); the
  * anti-join shuffles only on the merge keys and AQE handles skew. The
  * final commit is a single atomic directory rename, mirroring Iceberg's
  * snapshot swap.
  */
object TableMerge {

  def exists(tablePath: String): Boolean = Files.exists(Paths.get(tablePath))

  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath)

  /** K3 — full replace with atomic swap. */
  def createOrReplace(df: DataFrame, tablePath: String, partitionCols: Seq[String] = Seq.empty): Unit = {
    val tmp = stagingDir(tablePath)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    commitSwap(tmp, Paths.get(tablePath))
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
    val partitionScoped = partitionCols.nonEmpty && partitionCols.forall(keys.contains)
    if (partitionScoped) {
      // Key implies partition ⇒ a matched target row always lives in a
      // partition the source also touches; carry untouched partitions over
      // physically and rewrite only the touched ones.
      val touched = src.select(partitionCols.map(col): _*).distinct()
      val targetTouched = target.join(broadcast(touched), partitionCols, "left_semi")
      val merged = mergeRows(targetTouched, src, keys)
      val tmp = stagingDir(tablePath)
      merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(tmp.toString)
      carryUntouchedPartitions(Paths.get(tablePath), tmp, partitionCols,
        touchedPartitionDirs(touched))
      commitSwap(tmp, Paths.get(tablePath))
    } else {
      val merged = mergeRows(target, src, keys)
      val tmp = stagingDir(tablePath)
      val writer = merged.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(tmp.toString)
      commitSwap(tmp, Paths.get(tablePath))
    }
  }

  /** K2 — delete rows whose key appears in `deleteKeys`. */
  def delete(spark: SparkSession, tablePath: String, deleteKeys: DataFrame,
             keys: Seq[String], partitionCols: Seq[String] = Seq.empty): Unit = {
    if (!exists(tablePath)) return
    val target = read(spark, tablePath)
    val remaining = target.join(deleteKeys.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val tmp = stagingDir(tablePath)
    val writer = remaining.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    commitSwap(tmp, Paths.get(tablePath))
  }

  /** UPDATE-SET-* + INSERT-* semantics with union-by-name schema
    * evolution: result = (target ∖ source-keys) ⊎ source.
    */
  private def mergeRows(target: DataFrame, src: DataFrame, keys: Seq[String]): DataFrame = {
    val notMatched = target.join(src.select(keys.map(col): _*).distinct(), keys, "left_anti")
    notMatched.unionByName(src, allowMissingColumns = true)
  }

  private def stagingDir(tablePath: String): Path = {
    val p = Paths.get(tablePath)
    val parent = Option(p.getParent).getOrElse(Paths.get("."))
    Files.createDirectories(parent)
    parent.resolve(s".${p.getFileName}.staging-${System.nanoTime()}")
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

  /** Move untouched first-level partition trees from the live table into
    * the staging dir (file move, no data rewrite).
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
          if (!Files.exists(dest))
            Files.move(d.toPath, dest, StandardCopyOption.ATOMIC_MOVE)
        } else if (depth + 1 < partitionCols.length) {
          Files.createDirectories(dest)
          walk(d.toPath, dest, depth + 1, rel)
        }
      }
    }
    walk(live, staging, 0, "")
  }

  /** Atomic-ish commit: retire the live dir, promote staging, drop the
    * retired snapshot (the Iceberg snapshot-swap analogue for a plain FS).
    */
  private def commitSwap(staging: Path, live: Path): Unit = {
    val retired = live.resolveSibling(s".${live.getFileName}.retired-${System.nanoTime()}")
    if (Files.exists(live)) Files.move(live, retired, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, live, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(retired)) deleteRecursively(retired)
  }

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(c => deleteRecursively(c.toPath))
    f.delete(): Unit
  }
}
