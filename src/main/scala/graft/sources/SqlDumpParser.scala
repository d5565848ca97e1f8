package graft.sources

/** S8 — MySQL-dump INSERT parser (a "source" in the engine: turns a SQL
  * dump into `Seq[Row]`-able records, then `toDS()`/`createDataFrame`).
  *
  * Re-implements the semantics of the reference's hand-rolled tokenizer
  * (`airflow/src/giaotrinh_reference_loader.py:94-237`): statement blocks
  * found by `INSERT INTO \`table\` … VALUES`, record splitting that is
  * quote- and paren-aware, `''` and `\'` escapes inside strings, bare
  * tokens converted NULL → None / integer / double / string.
  *
  * Pure driver-side code — dumps are small reference data; the resulting
  * rows become a broadcastable DataFrame.
  */
object SqlDumpParser {

  sealed trait SqlValue
  case object SqlNull extends SqlValue
  final case class SqlString(value: String) extends SqlValue
  final case class SqlLong(value: Long) extends SqlValue
  final case class SqlDouble(value: Double) extends SqlValue
  final case class SqlBare(value: String) extends SqlValue

  private val HeaderPattern =
    """(?is)INSERT INTO\s+`?(\w+)`?.*?VALUES""".r

  /** All `(table, valuesBlock)` statement bodies in the dump. */
  private def blocks(sql: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var idx = 0
    var continue = true
    while (continue && idx < sql.length) {
      HeaderPattern.findFirstMatchIn(sql.substring(idx)) match {
        case None => continue = false
        case Some(m) =>
          val table = m.group(1)
          val blockStart = idx + m.end
          var i = blockStart
          var depth = 0
          var inString = false
          var escape = false
          var endFound = false
          while (i < sql.length && !endFound) {
            val ch = sql.charAt(i)
            if (inString) {
              if (escape) escape = false
              else if (ch == '\\') escape = true
              else if (ch == '\'') {
                if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1
                else inString = false
              }
            } else ch match {
              case '\'' => inString = true
              case '(' => depth += 1
              case ')' => if (depth > 0) depth -= 1
              case ';' if depth == 0 =>
                out += ((table, sql.substring(blockStart, i)))
                idx = i + 1
                endFound = true
              case _ =>
            }
            i += 1
          }
          if (!endFound)
            throw new IllegalArgumentException(s"INSERT statement for table $table missing terminating semicolon")
      }
    }
    out.toSeq
  }

  /** Parse one `(v1, v2, …)` record starting just after its `(`. */
  private def parseRecord(text: String, startIdx: Int): (Vector[SqlValue], Int) = {
    val values = scala.collection.mutable.ArrayBuffer[SqlValue]()
    val current = new StringBuilder
    var rawType: Option[String] = None
    var idx = startIdx
    var inString = false
    var escape = false
    while (idx < text.length) {
      val ch = text.charAt(idx)
      if (inString) {
        if (escape) {
          // MySQL escape sequences (mysqldump emits these for every
          // newline/tab/CR/NUL/ctrl-Z in text columns): decode to the
          // CHARACTER, not the letter — `\n` is a newline, never 'n'.
          // Unknown escapes keep the escaped char literally (\' \" \\
          // and MySQL's lenient default for everything else).
          current.append(ch match {
            case 'n' => '\n'
            case 't' => '\t'
            case 'r' => '\r'
            case '0' => '\u0000'
            case 'Z' => '\u001a'
            case 'b' => '\b'
            case other => other
          })
          escape = false
        }
        else if (ch == '\\') escape = true
        else if (ch == '\'') {
          if (idx + 1 < text.length && text.charAt(idx + 1) == '\'') { current.append('\''); idx += 1 }
          else inString = false
        } else current.append(ch)
      } else ch match {
        case '\'' => inString = true; rawType = Some("string"); current.clear()
        case ',' =>
          values += convert(current.toString, rawType); current.clear(); rawType = None
        case ')' =>
          values += convert(current.toString, rawType)
          return (values.toVector, idx + 1)
        case ' ' | '\n' | '\r' | '\t' =>
        case other =>
          if (rawType.isEmpty) rawType = Some("bare")
          current.append(other)
      }
      idx += 1
    }
    throw new IllegalArgumentException(
      s"Unterminated record near: ${text.substring(startIdx, math.min(startIdx + 120, text.length)).replace("\n", " ")}")
  }

  private def convert(raw: String, rawType: Option[String]): SqlValue = {
    if (rawType.contains("string")) return SqlString(raw)
    val token = raw.trim
    if (token.isEmpty || token.equalsIgnoreCase("NULL")) return SqlNull
    if (token.matches("-?\\d+")) {
      try return SqlLong(token.toLong) catch { case _: NumberFormatException => }
    }
    try SqlDouble(token.toDouble) catch { case _: NumberFormatException => SqlBare(token) }
  }

  /** All value tuples for `table` across every INSERT block in the dump. */
  def rows(sql: String, table: String): Seq[Vector[SqlValue]] = {
    blocks(sql).filter(_._1 == table).flatMap { case (_, block) =>
      val out = scala.collection.mutable.ArrayBuffer[Vector[SqlValue]]()
      var idx = 0
      while (idx < block.length) {
        if (block.charAt(idx) == '(') {
          val (record, next) = parseRecord(block, idx + 1)
          out += record
          idx = next
        } else idx += 1
      }
      out.toSeq
    }
  }

  def stringAt(v: SqlValue): Option[String] = v match {
    case SqlString(s) => Some(s)
    case SqlBare(s) => Some(s)
    case SqlLong(l) => Some(l.toString)
    case SqlDouble(d) => Some(d.toString)
    case SqlNull => None
  }

  def longAt(v: SqlValue): Option[Long] = v match {
    case SqlLong(l) => Some(l)
    case SqlDouble(d) => Some(d.toLong)
    case SqlString(s) => s.toLongOption
    case SqlBare(s) => s.toLongOption
    case SqlNull => None
  }
}
