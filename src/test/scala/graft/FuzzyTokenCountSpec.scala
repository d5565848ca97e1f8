package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native graft_fuzzy_tf: must count exactly the tokens the HOF
  * filter+levenshtein composition keeps (the form the DuckDB oracle
  * uses), including null-element and edge-distance behavior.
  */
class FuzzyTokenCountSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("matches filter+levenshtein on random token arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val vocab = Seq("spark", "spork", "sprk", "sparkk", "shark", "join", "jon",
      "joint", "filter", "filler", "fjlter", "filtre", "x", "", "sparkling")
    val rows = Seq.fill(60)(Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))))
    val df = rows.toDF("toks")
    for ((t, e) <- Seq(("spark", 1), ("join", 1), ("filter", 2))) {
      val got = df.selectExpr(
        s"graft_fuzzy_tf(toks, '$t', $e) AS native",
        s"size(filter(toks, x -> levenshtein(x, '$t') <= $e)) AS hof")
        .as[(Int, Int)].collect()
      got.foreach { case (native, hof) => assert(native == hof, s"term=$t e=$e") }
    }
  }

  test("null contract: null array is null, null elements don't count") {
    val r = spark.sql(
      "SELECT graft_fuzzy_tf(CAST(NULL AS ARRAY<STRING>), 'spark', 1) AS a, " +
        "graft_fuzzy_tf(array('spark', CAST(NULL AS STRING), 'spork'), 'spark', 1) AS b").head()
    assert(r.isNullAt(0))
    assert(r.getInt(1) == 2)
  }

  test("maxEdits 0 is exact match; distance boundary is inclusive") {
    val r = spark.sql(
      "SELECT graft_fuzzy_tf(array('spark', 'spork'), 'spark', 0) AS exact, " +
        "graft_fuzzy_tf(array('sprk'), 'spark', 1) AS del1, " +
        "graft_fuzzy_tf(array('sp'), 'spark', 2) AS del3").head()
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) == 0) // distance 3 > 2
  }

  test("rejects non-literal term and maxEdits") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_fuzzy_tf(array('a'), concat('s', rand()), 1)").head()
    }
    assert(e.getMessage.contains("STRING literal"))
  }
}
