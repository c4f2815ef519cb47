package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side on one key — the shape AQE can't fully split
    val big = spark.range(0, 10000).select(
      when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 7).as("k"),
      col("id").as("payload"))
    val small = Seq((0L, "zero"), (1L, "hot"), (3L, "three"))
      .toDF("k", "name")

    val plain = big.join(small, "k")
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", buckets = 8)
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    salted shouldBe plain
    salted.size should be > 9000
  }

  test("the hot key spreads across salt buckets") {
    import spark.implicits._
    val big = spark.range(0, 4096).select(lit(42L).as("k"), col("id"))
    val salts = big.withColumn("s",
      pmod(hash(big.columns.map(col): _*), lit(8)))
      .groupBy("s").count().collect()
    salts.length shouldBe 8 // every bucket hit
    salts.map(_.getLong(1)).max.toDouble should be < 4096 * 0.25 // no bucket hogs
  }

  test("reserved salt column is rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "__salt")
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.saltedEquiJoin(df, df.drop("__salt"), "k", 4)
  }
}
