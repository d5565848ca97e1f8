package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Waterfill allocator branch sweep — the battery row
  * (`sample_budget_alloc`) always runs a binding 60% budget; this spec
  * pins the branches the oracle fixture can't reach and the exact cap
  * arithmetic on a hand-checkable frame.
  */
class SamplerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def alloc(masses: Seq[(String, Long)], num: Long, den: Long) = {
    import spark.implicits._
    SamplerQueries.waterfill(masses.toDF("source", "tokens"), num, den)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap // source -> (alloc, capped)
  }

  test("binding cap: small domains keep all, big ones clip, total ~ budget") {
    // total 1000, budget 500: a=50 and b=150 fit under the cap,
    // candidates: k=1 cand 125 ≤ 50? no (50 < 125) → not binding;
    // k=2 cand (500-50)/3=150 ≤ 150 → binds at 150
    val got = alloc(Seq("a" -> 50L, "b" -> 150L, "c" -> 300L, "d" -> 500L), 1, 2)
    assert(got == Map(
      "a" -> ((50L, 0L)), "b" -> ((150L, 0L)),
      "c" -> ((150L, 1L)), "d" -> ((150L, 1L))))
    // Σ alloc = 500 = budget exactly here
    assert(got.values.map(_._1).sum == 500L)
  }

  test("budget >= total: nothing binds, everything allocated") {
    val got = alloc(Seq("a" -> 10L, "b" -> 20L), 3, 2) // budget = 45 > 30
    assert(got == Map("a" -> ((10L, 0L)), "b" -> ((20L, 0L))))
  }

  test("zero budget clips every domain to zero") {
    val got = alloc(Seq("a" -> 10L, "b" -> 20L), 0, 1)
    assert(got == Map("a" -> ((0L, 1L)), "b" -> ((0L, 1L))))
  }

  test("dsir: target domain is never selected and at most 50 docs win") {
    val q = SamplerQueries.queries.toMap.apply("sample_dsir")
    val rows = q(spark, "/root/testdata/sf0.001").collect()
    val sources = rows.map(_.getString(0))
    assert(!sources.contains("src0"), "target corpus leaked into selection")
    assert(rows.map(_.getLong(1)).sum <= 50L)
    // weight range sanity: per-source min never exceeds its max
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
  }

  test("integer remainder: cap keeps total within n_domains of the budget") {
    val masses = Seq("a" -> 7L, "b" -> 13L, "c" -> 101L, "d" -> 97L, "e" -> 55L)
    val got = alloc(masses, 1, 3) // budget = 273/3 = 91
    val total = got.values.map(_._1).sum
    assert(total <= 91L && total > 91L - masses.length,
      s"allocated $total vs budget 91")
    // monotone: no domain exceeds its own mass
    masses.foreach { case (s, m) => assert(got(s)._1 <= m) }
  }
}
