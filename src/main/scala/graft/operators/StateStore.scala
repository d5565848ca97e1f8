package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** I4 — tiny keyed pipeline-state table (SURVEY §7.3; reference
  * `pipeline_state` at `silver/transformer.py:1310-1362`): memoizes a
  * content hash per state key so expensive rebuilds are skipped when the
  * input payload hasn't changed. Latest-wins read (W2: orderBy desc +
  * limit 1); appends are tiny single-row merges through [[TableMerge]].
  */
final class StateStore(spark: SparkSession, path: String) {

  /** Latest stored hash for `stateKey`, if any. */
  def latestHash(stateKey: String): Option[String] = {
    if (!TableMerge.exists(path)) return None
    TableMerge.read(spark, path)
      .filter(col("state_key") === stateKey)
      .orderBy(col("updated_at").desc_nulls_last)
      .limit(1)
      .collect()
      .headOption
      .map(_.getAs[String]("state_hash"))
  }

  /** True when the stored hash equals `payloadHash` — the caller skips
    * the rebuild (memoized bootstrap). */
  def isUnchanged(stateKey: String, payloadHash: String): Boolean =
    latestHash(stateKey).contains(payloadHash)

  /** Record a new state hash (upsert keyed by state_key — one live row
    * per key, the reference's latest-wins read collapses history anyway). */
  def update(stateKey: String, payloadHash: String, updatedAt: java.sql.Timestamp): Unit = {
    import spark.implicits._
    val row = Seq((stateKey, payloadHash, updatedAt))
      .toDF("state_key", "state_hash", "updated_at")
    TableMerge.upsert(spark, path, row, keys = Seq("state_key"))
  }

  /** Run `build` only if the payload changed; record the hash after a
    * successful build. Returns true when the build ran. */
  def runIfChanged(stateKey: String, payloadHash: String,
                   updatedAt: java.sql.Timestamp)(build: => Unit): Boolean = {
    if (isUnchanged(stateKey, payloadHash)) false
    else {
      build
      update(stateKey, payloadHash, updatedAt)
      true
    }
  }
}
