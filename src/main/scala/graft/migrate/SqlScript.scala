package graft.migrate

import scala.collection.mutable.ArrayBuffer

/** Quote/comment-aware splitting of a multi-statement SQL script into the
  * individual statements Spark SQL can run (M4). The reference hands whole
  * files to the DBMS CLI (Core.pm `_run_ddl`); Spark's `sql()` takes one
  * statement, so the splitter is the Spark-native equivalent.
  *
  * Handles: single/double/backtick quotes (with doubled-quote escapes),
  * `--` line comments, `/* */` block comments. Statements that are empty
  * or comment-only are dropped.
  */
object SqlScript {

  def split(script: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    val n = script.length

    var quote: Char = 0 // 0 = not in a quoted region; else ' " or `
    var lineComment = false
    var blockComment = false

    def flush(): Unit = {
      val stmt = cur.toString.trim
      if (stmt.nonEmpty && !isCommentOnly(stmt)) out += stmt
      cur.clear()
    }

    while (i < n) {
      val c = script.charAt(i)
      val next = if (i + 1 < n) script.charAt(i + 1) else 0.toChar

      if (lineComment) {
        cur.append(c)
        if (c == '\n') lineComment = false
        i += 1
      } else if (blockComment) {
        cur.append(c)
        if (c == '*' && next == '/') { cur.append(next); blockComment = false; i += 2 }
        else i += 1
      } else if (quote != 0) {
        cur.append(c)
        if (c == quote) {
          if (next == quote) { cur.append(next); i += 2 } // doubled escape
          else { quote = 0; i += 1 }
        } else i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur.append(c); i += 1
        case '-' if next == '-' => lineComment = true; cur.append(c); i += 1
        case '/' if next == '*' =>
          blockComment = true; cur.append(c).append(next); i += 2
        case ';' => flush(); i += 1
        case _ => cur.append(c); i += 1
      }
    }
    flush()
    out.toSeq
  }

  private def isCommentOnly(stmt: String): Boolean = {
    // strip block comments, then check every line is blank or `--`
    val noBlocks = stmt.replaceAll("(?s)/\\*.*?\\*/", " ")
    noBlocks.linesIterator.forall { l =>
      val t = l.trim
      t.isEmpty || t.startsWith("--")
    }
  }
}
