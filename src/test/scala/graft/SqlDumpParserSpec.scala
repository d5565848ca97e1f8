package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SqlDumpParser
import graft.sources.SqlDumpParser._

/** S8 — MySQL-dump parser spec: quote/paren-aware record splitting,
  * `''` and `\'` escapes, NULL/int/double conversion, multi-statement
  * dumps (semantics of `giaotrinh_reference_loader.py:94-237`).
  */
class SqlDumpParserSpec extends AnyFunSuite {

  private val dump =
    """-- MySQL dump
      |INSERT INTO `subjects` (`id`, `code`, `name`, `credits`, `gpa`) VALUES
      |(1, 'CS101', 'Intro to CS', 3, 3.5),
      |(2, 'CS201', 'Data Structures (Advanced)', NULL, 2.75),
      |(3, 'VN101', 'Nguyễn''s Course, part 2', 4, NULL);
      |INSERT INTO `faculties` VALUES (10, 'Engineering \'A\''), (11, 'Science');
      |""".stripMargin

  test("parses typed values with quote escapes") {
    val rows = SqlDumpParser.rows(dump, "subjects")
    assert(rows.size == 3)
    assert(rows(0) == Vector(SqlLong(1), SqlString("CS101"), SqlString("Intro to CS"),
      SqlLong(3), SqlDouble(3.5)))
    // parens inside a quoted string don't split records
    assert(rows(1)(2) == SqlString("Data Structures (Advanced)"))
    assert(rows(1)(3) == SqlNull)
    // '' escape and comma inside string
    assert(rows(2)(2) == SqlString("Nguyễn's Course, part 2"))
    assert(rows(2)(4) == SqlNull)
  }

  test("multiple INSERT statements and backslash escapes") {
    val rows = SqlDumpParser.rows(dump, "faculties")
    assert(rows == Seq(
      Vector(SqlLong(10), SqlString("Engineering 'A'")),
      Vector(SqlLong(11), SqlString("Science"))))
  }

  test("mysqldump character escapes decode to characters, not letters") {
    // mysqldump escapes every newline/tab/CR in text columns as \n \t
    // \r — the decoder must produce the control character, never drop
    // the backslash and keep the letter ('line1nline2' corruption)
    val d = """INSERT INTO `t` VALUES (1, 'line1\nline2'),
              |(2, 'a\tb'), (3, 'cr\rlf\n'), (4, 'keep\\slash'),
              |(5, 'lit\%pct\_us');""".stripMargin
    val rows = SqlDumpParser.rows(d, "t")
    assert(rows(0)(1) == SqlString("line1\nline2"))
    assert(rows(1)(1) == SqlString("a\tb"))
    assert(rows(2)(1) == SqlString("cr\rlf\n"))
    assert(rows(3)(1) == SqlString("keep\\slash"))
    // unknown escapes keep the char literally (MySQL's lenient rule)
    assert(rows(4)(1) == SqlString("lit%pct_us"))
  }

  test("unknown table yields no rows") {
    assert(SqlDumpParser.rows(dump, "nope").isEmpty)
  }

  test("missing semicolon is an error, not silent truncation") {
    intercept[IllegalArgumentException] {
      SqlDumpParser.rows("INSERT INTO `t` VALUES (1, 'a')", "t")
    }
  }

  test("accessors convert across types") {
    assert(stringAt(SqlLong(5)) == Some("5"))
    assert(longAt(SqlString("12")) == Some(12L))
    assert(longAt(SqlNull) == None)
    assert(stringAt(SqlNull) == None)
  }
}
