package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class TimeOpsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("sessionize: gap rule splits sessions per key") {
    import spark.implicits._
    val df = Seq(
      ("u1", 0L), ("u1", 5000L), ("u1", 20000L), ("u1", 22000L),
      ("u2", 1000L), ("u2", 50000L))
      .toDF("user", "ts_ms")
    val out = TimeOps.sessionize(df, col("user"), col("ts_ms"),
      gapMs = 10000).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set(
      ("u1", 0L, 1L), ("u1", 5000L, 1L),
      ("u1", 20000L, 2L), ("u1", 22000L, 2L),
      ("u2", 1000L, 1L), ("u2", 50000L, 2L))
  }

  test("asOfJoin attaches most recent at-or-before payload per key") {
    import spark.implicits._
    val purchases = Seq(("u1", 10L, "p1"), ("u1", 25L, "p2"),
      ("u2", 5L, "p3"), ("u3", 9L, "p4"))
      .toDF("user", "pts", "pid")
    val views = Seq(("u1", 10L, "v-equal"), ("u1", 20L, "v-mid"),
      ("u2", 9L, "v-late"))
      .toDF("user", "vts", "vid")

    val out = TimeOps.asOfJoin(purchases, views, "user", "pts", "vts",
      payload = Seq("vid")).collect()
      .map(r => (r.getAs[String]("pid"), r.getAs[String]("vid"))).toMap

    out("p1") shouldBe "v-equal" // same-timestamp view counts (at-OR-before)
    out("p2") shouldBe "v-mid"   // most recent of the two earlier views
    out("p3") shouldBe null      // only later views exist for u2
    out("p4") shouldBe null      // no right rows at all for u3
  }

  test("asOfJoin ties on (key, ts) resolve deterministically to the " +
    "greatest payload tuple") {
    import spark.implicits._
    val left = Seq(("k", 100L, "L")).toDF("k", "lts", "tag")
    // two right rows at the exact same (key, ts): winner must be stable
    val right = Seq(("k", 50L, "pA"), ("k", 50L, "pZ"))
      .toDF("k", "rts", "pid")
    (1 to 5).foreach { _ =>
      val out = TimeOps.asOfJoin(left, right, "k", "lts", "rts",
        payload = Seq("pid")).collect()
      out.map(_.getAs[String]("pid")).toSeq shouldBe Seq("pZ")
    }
  }

  test("asOfJoin rejects reserved working-column names") {
    import spark.implicits._
    val l = Seq(("k", 1L, 9L)).toDF("k", "lts", "__ts")
    val r = Seq(("k", 1L, "p")).toDF("k", "rts", "pid")
    an[IllegalArgumentException] should be thrownBy
      TimeOps.asOfJoin(l, r, "k", "lts", "rts", payload = Seq("pid"))
  }

  test("asOfJoin on real events matches the q28 shape (count + coverage)") {
    val e = graft.sources.Tables.load(spark, TestSpark.sfDir, "events")
      .select("event_id", "user_id", "ts_ms", "event_type")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ms")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ms").as("vts"),
        col("event_id").as("view_event_id"))

    val out = TimeOps.asOfJoin(purchases, views, "user_id", "ts_ms", "vts",
      payload = Seq("view_event_id"))
    out.count() shouldBe purchases.count() // exactly one row per left row
    // q28 (window formulation over the union) finds a view for the same
    // set of purchases
    val q28Covered = graft.SparkEntry
      .queries("q28_asof_join")(spark, TestSpark.sfDir)
      .filter(col("last_view_id").isNotNull).count()
    out.filter(col("view_event_id").isNotNull).count() shouldBe q28Covered
  }
}
