package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_topk_freq — the space-saving heavy-hitters
  * TypedImperativeAggregate: exactness below capacity, the
  * never-undercount / bounded-overcount contract past it, and
  * stability under partial aggregation (merge across partitions).
  */
class TopKFreqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("exact top-k equals groupBy-count when distinct items fit in capacity") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val items = Seq("a", "b", "c", "d", "e", "f")
    val rows = (1 to 5000).map(_ => (rnd.nextInt(4).toLong, items(rnd.nextInt(items.size))))
    val df = rows.toDF("g", "item").repartition(8) // force partial-agg merges
    val got = df.groupBy("g")
      .agg(expr("graft_topk_freq(item, 3, 32)").as("top"))
      .select($"g", $"top")
      .as[(Long, Seq[(String, Long)])].collect().toMap
    val exact = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.groupBy(_._2).map { case (i, xs) => (i, xs.size.toLong) }
        .toSeq.sortBy { case (i, c) => (-c, i) }.take(3)
    }
    got.foreach { case (g, top) => assert(top == exact(g), s"group $g") }
    assert(got.keySet == exact.keySet)
  }

  test("past capacity: never undercounts, overcount bounded by n/capacity") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // one heavy item + a long tail of singletons forcing evictions
    val n = 2000
    val rows = (1 to n).map { i =>
      if (rnd.nextInt(3) == 0) "heavy" else s"tail${rnd.nextInt(500)}"
    }
    val capacity = 16
    val trueHeavy = rows.count(_ == "heavy").toLong
    val top = rows.toDF("item").coalesce(1)
      .agg(expr(s"graft_topk_freq(item, 1, $capacity)"))
      .as[Seq[(String, Long)]].head()
    assert(top.head._1 == "heavy", s"heavy hitter lost: $top")
    val est = top.head._2
    assert(est >= trueHeavy, "space-saving must never undercount")
    assert(est - trueHeavy <= n.toLong / capacity,
      s"overcount ${est - trueHeavy} > n/capacity ${n / capacity}")
  }

  test("items beyond 64KB survive the partial-aggregation shuffle") {
    import spark.implicits._
    // writeUTF would throw UTFDataFormatException here; the buffer uses
    // length-prefixed raw UTF-8 so arbitrary column values round-trip
    val big = "x" * 100000
    val df = (1 to 6).map(i => if (i % 2 == 0) big else "small").toDF("item")
      .repartition(3) // force serialize/merge of partial buffers
    val top = df.agg(expr("graft_topk_freq(item, 2, 8)"))
      .as[Seq[(String, Long)]].head()
    // ties sort by item: "small" < "xxx…"
    assert(top == Seq(("small", 3L), (big, 3L)))
  }

  test("null items are ignored; empty input yields an empty list") {
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("x"), None).toDF("item")
    val top = df.agg(expr("graft_topk_freq(item, 2, 8)"))
      .as[Seq[(String, Long)]].head()
    assert(top == Seq(("x", 2L)))
    val empty = df.filter(col("item") === "nope")
      .agg(expr("graft_topk_freq(item, 2, 8)"))
      .as[Seq[(String, Long)]].head()
    assert(empty.isEmpty)
  }
}
