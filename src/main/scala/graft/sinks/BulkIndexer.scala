package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed bulk-index export (K6 at scale): the reference streams
  * the whole index through the DRIVER in 500-doc batches
  * (`elasticsearch_sync.py:364-371` `toLocalIterator`) — its own known
  * bottleneck. Here every partition emits its own batched bulk payloads
  * via `foreachPartition`: the driver never sees a row, output
  * parallelism equals partition count (`repartition(32)` upstream
  * mirrors the reference's sink parallelism knob), and per-partition
  * batch files are exactly the `_bulk` request bodies an HTTP sink
  * would POST — swapping the file write for an HTTP call changes one
  * line.
  *
  * Counts come back through accumulators (A8) — no second pass.
  */
object BulkIndexer {

  final case class BulkStats(docs: Long, batches: Long, partitions: Long)

  /** JSON string escape for the hand-built action line (the doc line is
    * escaped by to_json already). */
  private[sinks] def escapeJson(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Write ES-shaped bulk files: pairs of `{"index":{"_id":…}}` action
    * lines and document JSON lines, `batchSize` docs per file, one file
    * set per partition. `outDir` must be visible to the executors (a
    * shared mount in cluster mode — or swap the file write for the HTTP
    * POST, which has no such requirement). Rows with a null id are
    * rejected (a null would otherwise index under the literal id
    * "null"). */
  def writeBulkFiles(df: DataFrame, idCol: String, outDir: String,
                     batchSize: Int = 500): BulkStats = {
    require(batchSize > 0)
    val spark = df.sparkSession
    val docsAcc = spark.sparkContext.longAccumulator("bulk_docs")
    val batchesAcc = spark.sparkContext.longAccumulator("bulk_batches")
    val partsAcc = spark.sparkContext.longAccumulator("bulk_partitions")

    val payload = df.select(
      col(idCol).cast("string").as("_id"),
      to_json(struct(df.columns.map(col): _*)).as("_doc"))

    payload.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      // executor-side: the task, not the driver, must see/create outDir
      Files.createDirectories(Paths.get(outDir))
      val pid = TaskContext.getPartitionId()
      var batchNo = 0
      var any = false
      rows.grouped(batchSize).foreach { batch =>
        any = true
        val body = new StringBuilder
        batch.foreach { r =>
          if (r.isNullAt(0))
            throw new IllegalArgumentException(
              s"null $idCol in bulk export — refusing to index under id \"null\"")
          body.append("{\"index\":{\"_id\":\"").append(escapeJson(r.getString(0)))
            .append("\"}}\n")
          body.append(r.getString(1)).append('\n')
        }
        val file = Paths.get(outDir, f"part-$pid%05d-batch-$batchNo%04d.bulk.jsonl")
        Files.write(file, body.toString.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        docsAcc.add(batch.size)
        batchesAcc.add(1)
        batchNo += 1
      }
      if (any) partsAcc.add(1)
    }
    BulkStats(docsAcc.value, batchesAcc.value, partsAcc.value)
  }
}
