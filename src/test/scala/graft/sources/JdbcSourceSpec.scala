package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** IO5: exercised end-to-end against embedded Derby (the JDBC database
  * that ships with Spark) — write a real table over JDBC, read it back
  * both unpartitioned and as a 4-partition ranged read.
  */
class JdbcSourceSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("jdbc sink + source roundtrip, partitioned read") {
    val src = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 2)
    val sink = JdbcSource(url, "graft_t",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))
    sink.save(src)

    val back = sink.load(spark)
    back.count() shouldBe 1000
    back.agg(sum("v")).collect()(0).getLong(0) shouldBe 999000L

    val ranged = sink.copy(partitionColumn = Some("id"),
      lowerBound = Some(0L), upperBound = Some(1000L),
      numPartitions = Some(4))
    val df = ranged.load(spark)
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 1000
  }

  test("partition options must be set together") {
    an[IllegalArgumentException] should be thrownBy
      JdbcSource(url, "t", partitionColumn = Some("id")).options
  }

  test("reference-style connection attrs build a url") {
    val s = JdbcSource.forDatabase("postgresql", "db.example", 5432,
      "warehouse", "lineitem", user = Some("u"), password = Some("p"))
    s.options("url") shouldBe "jdbc:postgresql://db.example:5432/warehouse"
    s.options("user") shouldBe "u"
    s.options("dbtable") shouldBe "lineitem"
  }
}
