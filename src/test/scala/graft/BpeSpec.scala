package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.BpeQueries

/** Pins the relational BPE operator: the parity-rule merge application
  * must equal a reference greedy left-to-right scan, token
  * concatenation must reconstruct every word, and whitespace
  * normalization must not move the result (the merge table and counts
  * are defined over non-empty words only).
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  /** Reference greedy LTR merge of one (lhs, rhs) rule — the scan the
    * parity rule must reproduce. */
  private def greedyLtr(t: Seq[String], lhs: String, rhs: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < t.length) {
      if (i < t.length - 1 && t(i) == lhs && t(i + 1) == rhs) {
        out += (lhs + rhs); i += 2
      } else { out += t(i); i += 1 }
    }
    out.toSeq
  }

  private def applyOnce(tokens: Seq[Seq[String]], lhs: String, rhs: String): Seq[Seq[String]] = {
    import spark.implicits._
    val df = tokens.zipWithIndex.map { case (t, i) => (i.toLong, 1L, t) }
      .toDF("w", "freq", "t")
    BpeQueries.applyMergeRound(df, lhs, rhs)
      .orderBy("w").select("t").as[Seq[String]].collect().toSeq
  }

  test("parity-rule application equals greedy left-to-right on runs and mixed pairs") {
    val cases = Seq(
      Seq("a", "a", "a", "a"),           // run of 3 pairs -> [aa, aa]
      Seq("a", "a", "a"),                // odd run -> [aa, a]
      Seq("a", "a"),                     // single pair
      Seq("a"),                          // too short
      Seq("b", "a", "a", "b", "a", "a"), // separated pairs
      Seq("a", "b", "a", "a", "b"),      // pair mid-word
      Seq.empty[String])
    val got = applyOnce(cases, "a", "a")
    cases.zip(got).foreach { case (in, out) =>
      assert(out == greedyLtr(in, "a", "a"), s"input $in")
    }
    assert(applyOnce(Seq(Seq("x", "y", "x", "y", "x")), "x", "y") ==
      Seq(greedyLtr(Seq("x", "y", "x", "y", "x"), "x", "y")))
  }

  test("randomized words: parity rule equals greedy LTR for every merge rule") {
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "ab", "c")
    val words = (1 to 60).map(_ => Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size))))
    for ((l, r) <- Seq(("a", "b"), ("a", "a"), ("ab", "c"), ("b", "a"))) {
      val got = applyOnce(words, l, r)
      words.zip(got).foreach { case (in, out) =>
        assert(out == greedyLtr(in, l, r), s"input $in rule ($l,$r)")
      }
    }
  }

  test("learned tokenization reconstructs every word by concatenation") {
    val (_, voc) = BpeQueries.learnMerges(spark, sf)
    val broken = voc.filter(concat_ws("", col("t")) =!= col("w")).count()
    assert(broken == 0)
  }

  test("merge table has full rank ladder and deterministic re-run") {
    val (m1, _) = BpeQueries.learnMerges(spark, sf)
    val (m2, _) = BpeQueries.learnMerges(spark, sf)
    assert(m1.size == 8)
    assert(m1 == m2)
  }

  test("whitespace normalization does not change counts (empty words dropped)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // double every space — the vocabulary and per-word counts must not move
    val doubled = docs.withColumn("text", regexp_replace(col("text"), " ", "  "))
    def counts(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val v = df.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("freq"))
      val (_, voc) = BpeQueries.learnMergesFrom(v)
      df.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .join(voc.select(col("w"), size(col("t")).cast("long").as("n_tok")), Seq("w"))
        .groupBy("doc_id").agg(sum("n_tok").as("n"))
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    }
    assert(counts(docs) == counts(doubled))
  }
}
