package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SubjectMatcher
import graft.functions.SubjectMatcher.Subject

/** F14 labeled accuracy spec. The corpus is the 6-subject test set the
  * reference ships (`semantic_matcher.py:219-287`); expectations follow
  * the SubjectMatcher's lexical+TF-IDF semantics (transformer.py:371-476)
  * — including the "E-Learning ≠ Machine Learning" false-positive trap.
  */
class SubjectMatcherSpec extends AnyFunSuite {

  private val subjects = Seq(
    Subject(1, Some("Học máy"), Some("Machine Learning"), Some("CS401")),
    Subject(2, Some("Cấu trúc dữ liệu"), Some("Data Structures and Algorithms"), Some("CS201")),
    Subject(3, Some("Khai phá dữ liệu"), Some("Data Mining"), Some("CS402")),
    Subject(4, Some("Mạng máy tính"), Some("Computer Networks"), Some("CS301")),
    Subject(5, Some("Cơ sở dữ liệu"), Some("Database Management Systems"), Some("CS302")),
    Subject(6, Some("Trí tuệ nhân tạo"), Some("Artificial Intelligence"), Some("CS403")))

  private val matcher = new SubjectMatcher(subjects)

  private def names(title: String, desc: String = ""): Seq[String] =
    matcher.matchSubjects(Some(title), if (desc.isEmpty) None else Some(desc))
      .flatMap(_.nameEn)

  test("English-name substring scores 0.94") {
    val m = matcher.matchSubjects(Some("Introduction to Machine Learning with Python"), None)
    assert(m.head.subjectId == 1)
    assert(m.head.similarity == 0.94)
    assert(m.head.matchedText == Some("Machine Learning"))
  }

  test("subject-code substring wins at 0.99") {
    val m = matcher.matchSubjects(Some("Advanced topics in CS401"), None)
    assert(m.head.subjectId == 1)
    assert(m.head.similarity == 0.99)
  }

  test("Vietnamese name matches through diacritic folding at 0.92") {
    val m = matcher.matchSubjects(Some("Giáo trình Học máy nâng cao"), None)
    assert(m.head.subjectId == 1)
    assert(m.head.similarity == 0.92)
  }

  test("TRAP: E-Learning Management System must NOT match Machine Learning") {
    // single shared token "learning" — overlap < 2 blocks the token path,
    // and the TF-IDF cosine (≈0.33) stays under even a 0.38 threshold.
    assert(names("E-Learning Management System", "Building online learning platforms").isEmpty)
    val lax = new SubjectMatcher(subjects, threshold = 0.38)
    assert(!lax.matchSubjects(Some("E-Learning Management System"),
      Some("Building online learning platforms")).exists(_.subjectId == 1))
  }

  test("token-overlap path: ≥2 shared tokens scores overlap/min(|tokens|,6)") {
    val small = new SubjectMatcher(Seq(Subject(7, None, Some("Spark SQL"), None)))
    val m = small.matchSubjects(Some("intro to spark sql engines"), None)
    assert(m.head.subjectId == 7)
    assert(m.head.similarity == 1.0) // overlap 2 / min(2,6)
  }

  test("TF-IDF model path contributes below the lexical rules") {
    // no substring, overlap=1 ⇒ only the model can score; "vision
    // learning" ⇒ cosine ≈ 0.24 vs Machine Learning
    val lax = new SubjectMatcher(subjects, threshold = 0.2)
    val m = lax.matchSubjects(Some("vision learning"), None)
    assert(m.exists(_.subjectId == 1))
    val sim = m.find(_.subjectId == 1).get.similarity
    assert(sim > 0.2 && sim < 0.55)
  }

  test("top-5 cap and score-desc, id-asc ordering") {
    val m = matcher.matchSubjects(
      Some("CS401 CS201 CS402 CS301 CS302 CS403 overview"), None)
    assert(m.size == 5)
    assert(m.map(_.similarity).forall(_ == 0.99))
    assert(m.map(_.subjectId) == Seq(1, 2, 3, 4, 5, 6).take(5))
  }

  test("labeled sweep: expected subjects hit, traps miss") {
    // F14-reachable subset of the reference's 8 labeled cases
    assert(names("Sorting and Searching with Data Structures and Algorithms")
      .contains("Data Structures and Algorithms"))
    assert(names("SQL and Database Management Systems").contains("Database Management Systems"))
    assert(names("TCP/IP and Computer Networks").contains("Computer Networks"))
    assert(names("Khai phá dữ liệu khách hàng", "Extract insights from transactions")
      .contains("Data Mining"))
    assert(names("Artificial Intelligence and Expert Systems")
      .contains("Artificial Intelligence"))
  }

  test("empty/blank input matches nothing") {
    assert(matcher.matchSubjects(None, None).isEmpty)
    assert(matcher.matchSubjects(Some("   "), Some("")).isEmpty)
  }

  test("matcher is serializable (broadcast-safe)") {
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(matcher)
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[SubjectMatcher]
    assert(back.matchSubjects(Some("Machine Learning"), None).head.subjectId == 1)
  }
}
