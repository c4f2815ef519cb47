package graft.migrate

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-style checks (ScalaCheck generators, 200 samples each) for
  * the pure parts of the migration engine.
  */
class PropertySpec extends AnyFunSuite with Matchers {

  private def forSamples[T](g: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      g.sample.foreach { v => f(v); produced += 1 }
      attempts += 1
    }
    produced should be >= n / 2 // the generator actually fired
  }

  private val simpleStmt: Gen[String] = for {
    k <- Gen.choose(1, 3)
    words <- Gen.listOfN(k, Gen.alphaStr.suchThat(_.nonEmpty))
  } yield "SELECT " + words.mkString(", ")

  test("SqlScript.split: joining with ';' round-trips statement lists") {
    forSamples(Gen.listOf(simpleStmt)) { stmts =>
      SqlScript.split(stmts.mkString(";")) shouldBe
        stmts.map(_.trim).filter(_.nonEmpty)
    }
  }

  test("SqlScript.split: semicolons inside quotes never split") {
    forSamples(Gen.zip(Gen.alphaStr, Gen.alphaStr)) { case (a, b) =>
      val stmt = s"INSERT INTO t VALUES ('$a;$b')"
      SqlScript.split(stmt + ";SELECT 1") shouldBe Seq(stmt, "SELECT 1")
    }
  }

  private val migName: Gen[String] = for {
    num <- Gen.option(Gen.choose(0, 1000))
    suffix <- Gen.alphaStr
  } yield num.fold(suffix)(n => s"$n-$suffix")

  test("NumericOrAlpha.lt sorts deterministically and order-independently") {
    forSamples(Gen.listOf(migName), n = 100) { names =>
      val sorted = names.sortWith(NumericOrAlpha.lt)
      sorted.sortWith(NumericOrAlpha.lt) shouldBe sorted // idempotent
      names.reverse.sortWith(NumericOrAlpha.lt) shouldBe sorted
    }
    // numeric prefixes dominate: 2-x < 10-y despite "10" < "2" lexically
    NumericOrAlpha.lt("2-x", "10-y") shouldBe true
    NumericOrAlpha.lt("10-y", "2-x") shouldBe false
  }
}
