package graft.migrate

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SqlScriptSpec extends AnyFunSuite with Matchers {

  test("splits on semicolons") {
    SqlScript.split("CREATE TABLE a (x INT);\nCREATE TABLE b (y INT);") shouldBe
      Seq("CREATE TABLE a (x INT)", "CREATE TABLE b (y INT)")
  }

  test("semicolons inside quotes survive") {
    SqlScript.split("INSERT INTO t VALUES ('a;b');SELECT 1") shouldBe
      Seq("INSERT INTO t VALUES ('a;b')", "SELECT 1")
    SqlScript.split("""SELECT ";" AS c; SELECT 2""") shouldBe
      Seq("""SELECT ";" AS c""", "SELECT 2")
    SqlScript.split("SELECT `weird;col` FROM t") shouldBe
      Seq("SELECT `weird;col` FROM t")
  }

  test("doubled-quote escapes stay inside the string") {
    SqlScript.split("INSERT INTO t VALUES ('it''s;fine');SELECT 1") shouldBe
      Seq("INSERT INTO t VALUES ('it''s;fine')", "SELECT 1")
  }

  test("comments hide semicolons") {
    SqlScript.split("SELECT 1 -- trailing; not a split\n, 2;SELECT 3") shouldBe
      Seq("SELECT 1 -- trailing; not a split\n, 2", "SELECT 3")
    SqlScript.split("SELECT /* a;b */ 1; SELECT 2") shouldBe
      Seq("SELECT /* a;b */ 1", "SELECT 2")
  }

  test("empty and comment-only statements are dropped") {
    SqlScript.split(";;  ;\n-- just a comment;\n;SELECT 1;") shouldBe
      Seq("SELECT 1")
    SqlScript.split("/* block only */;SELECT 2") shouldBe Seq("SELECT 2")
    SqlScript.split("") shouldBe Seq.empty
  }
}
