package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphAnnQueries
import graft.streaming.EventStreams

/** Streaming graph-index maintenance: the micro-batch sink must produce
  * the SAME neighbor table as the batch builders — a first batch equals
  * the from-scratch `edgesDf` build, an incremental batch over an
  * established corpus equals the `hnswMaintain` merged graph — and a
  * re-embed must leave NO stale pair scores anywhere (every stored
  * pair_e6 recomputable from the latest vectors).
  */
class GraphStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshDirs(tag: String): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory(s"graph-stream-$tag")
    (base.resolve("table").toString, base.resolve("ckpt").toString)
  }

  private def allVecs: Seq[(Long, Seq[Float])] = {
    import spark.implicits._
    Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
  }

  private def edgeSet(table: String): Set[(Long, Long, Long)] = {
    import spark.implicits._
    graft.operators.TableMerge.read(spark, table)
      .select("src", "dst", "pair_e6").as[(Long, Long, Long)].collect().toSet
  }

  test("first micro-batch degenerates to the from-scratch graph build") {
    import spark.implicits._
    val (table, ckpt) = freshDirs("build")
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.graphIndexSink(
      stream.toDF().toDF("vec_id", "embedding"), table, ckpt)
    try {
      stream.addData(allVecs: _*)
      q.processAllAvailable()
      val sig = GraphAnnQueries.sigOf(Tables.embeddings(spark, sf)).localCheckpoint()
      val expected = GraphAnnQueries.prune2M(
        GraphAnnQueries.symmetrize(GraphAnnQueries.outEdges(sig, sig)))
        .as[(Long, Long, Long)].collect().toSet
      assert(expected.nonEmpty && edgeSet(table) == expected)
    } finally q.stop()
  }

  test("incremental batch equals the batch hnswMaintain merged graph") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (table, ckpt) = freshDirs("incr")
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.graphIndexSink(
      stream.toDF().toDF("vec_id", "embedding"), table, ckpt)
    try {
      val (corpus, batch) = allVecs.partition(_._1 % 10 != 0)
      stream.addData(corpus: _*)
      q.processAllAvailable()
      stream.addData(batch: _*)
      q.processAllAvailable()
      // replay the batch audit's merged-graph construction directly
      val emb = Tables.embeddings(spark, sf)
      val corpusSig = GraphAnnQueries.sigOf(emb.filter(col("vec_id") % 10 =!= 0))
        .localCheckpoint()
      val batchSig = GraphAnnQueries.sigOf(emb.filter(col("vec_id") % 10 === 0))
        .localCheckpoint()
      val allSig = corpusSig.unionByName(batchSig)
      val gc = GraphAnnQueries.prune2M(GraphAnnQueries.symmetrize(
        GraphAnnQueries.outEdges(corpusSig, corpusSig)))
      val no = GraphAnnQueries.outEdges(batchSig, allSig).localCheckpoint()
      val expected = GraphAnnQueries.prune2M(
        gc.unionByName(no)
          .unionByName(no.select(col("dst").as("src"), col("src").as("dst"),
            col("pair_e6")))
          .distinct())
        .as[(Long, Long, Long)].collect().toSet
      assert(expected.nonEmpty && edgeSet(table) == expected)
      // and the count the battery audit reports agrees
      val audited = GraphAnnQueries.hnswMaintain(spark, sf, bits = 8)
        .collect().head.getAs[Long]("n_maintained")
      assert(audited == expected.size)
    } finally q.stop()
  }

  test("re-embed leaves no stale pair scores anywhere in the graph") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (table, ckpt) = freshDirs("reembed")
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.graphIndexSink(
      stream.toDF().toDF("vec_id", "embedding"), table, ckpt)
    try {
      val vecs = allVecs
      stream.addData(vecs: _*)
      q.processAllAvailable()
      // re-scrape one node with a reversed embedding: its direction moves
      val moved = vecs.head._1
      stream.addData((moved, vecs.head._2.reverse))
      q.processAllAvailable()
      val latest = graft.operators.TableMerge.read(spark, s"${table}_vectors")
        .select("vec_id", "embedding")
      val edges = graft.operators.TableMerge.read(spark, table)
        .select("src", "dst", "pair_e6")
      val mismatched = edges
        .join(latest.select(col("vec_id").as("src"), col("embedding").as("ea")), Seq("src"))
        .join(latest.select(col("vec_id").as("dst"), col("embedding").as("eb")), Seq("dst"))
        .filter(expr("pair_e6 <> CAST(floor(graft_cosine(ea, eb) * 1000000) AS BIGINT)"))
        .count()
      assert(mismatched == 0L)
      // the vectors table holds exactly one (latest) row for the moved id
      val movedRows = latest.filter(col("vec_id") === moved)
        .as[(Long, Seq[Float])].collect()
      assert(movedRows.length == 1 && movedRows.head._2 == vecs.head._2.reverse)
    } finally q.stop()
  }
}
