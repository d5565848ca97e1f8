package graft.sources

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}

/** F16 — document enrichment with object-store stats (semantics of
  * `_enrich_document_with_client`, `silver/transformer.py:570-609`):
  * each asset path expands into candidate object keys (F4,
  * [[graft.functions.TextFunctions.buildObjectCandidates]] — s3/http
  * prefix strip, bucket strip, percent-decode), the first key that
  * exists is stat'ed for etag/size/mtime, and the stats ride back as
  * columns for the asset-level CDC join (I2).
  *
  * The store here is a filesystem directory (no MinIO in this
  * environment); the reference's `client.stat_object(bucket, key)`
  * maps 1:1 onto `stat(rootDir/key)` — swapping in an S3 client changes
  * only [[statOne]]. Etags are content-md5 like MinIO's single-part
  * uploads. Distribution: mapPartitions, one digest instance per
  * partition, no driver round-trips.
  */
object ObjectStatEnricher {

  final case class AssetRef(asset_uid: String, asset_path: String)

  final case class AssetStat(
      asset_uid: String,
      resolved_key: Option[String],
      etag: Option[String],
      size_bytes: Option[Long],
      last_modified_ms: Option[Long])

  /** STREAMING digest: never loads the object into memory — assets can
    * be multi-GB media files (readAllBytes would allocate the whole
    * object per executor thread and throws outright past 2 GB). */
  private def md5HexStreaming(md: MessageDigest, p: java.nio.file.Path): String = {
    md.reset()
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Stat a single candidate key against the store root; None if the
    * object doesn't exist — INCLUDING one deleted between the
    * existence check and the read (the reference "logs and continues"
    * with null stats; a raw NoSuchFileException would fail the whole
    * Spark task instead). */
  private def statOne(rootDir: String, key: String, md: MessageDigest): Option[(String, Long, Long)] = {
    val p = Paths.get(rootDir, key)
    if (!Files.isRegularFile(p)) None
    else
      try Some((
        md5HexStreaming(md, p),
        Files.size(p),
        Files.getLastModifiedTime(p).toMillis))
      catch { case _: java.io.IOException => None }
  }

  /** Enrich asset refs with stats from the store at `rootDir`; unresolved
    * assets keep null stats (the reference logs and continues —
    * transformer.py:604-609). */
  def enrich(assets: Dataset[AssetRef], rootDir: String,
             bucket: Option[String]): Dataset[AssetStat] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition, like a client
      rows.map { ref =>
        val candidates =
          graft.functions.TextFunctions.buildObjectCandidates(ref.asset_path, bucket)
        val hit = candidates.iterator
          .map(k => k -> statOne(rootDir, k, md))
          .collectFirst { case (k, Some(s)) => (k, s) }
        hit match {
          case Some((key, (etag, size, mtime))) =>
            AssetStat(ref.asset_uid, Some(key), Some(etag), Some(size), Some(mtime))
          case None => AssetStat(ref.asset_uid, None, None, None, None)
        }
      }
    }
  }

  /** DataFrame convenience: join the stats back onto the input. */
  def enrichFrame(df: DataFrame, uidCol: String, pathCol: String,
                  rootDir: String, bucket: Option[String]): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    val refs = df.select(col(uidCol).cast("string").as("asset_uid"),
      col(pathCol).cast("string").as("asset_path")).as[AssetRef]
    df.join(enrich(refs, rootDir, bucket).toDF(),
      col(uidCol).cast("string") === col("asset_uid"), "left")
      .drop("asset_uid")
  }
}
