package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Bucketed warehouse layout (SURVEY IO7/F14): plan-proves the claim
  * that bucketing turns the big equi-joins shuffle-free — the "1-line
  * hint change at 100 TB" SURVEY §6 promises. Gates:
  *   - two tables bucketed on the join key join with ZERO Exchange;
  *   - a groupBy on the bucket key aggregates with ZERO Exchange;
  *   - the q4 star-join twin over bucketed lineitem/orders loses its
  *     fact-fact join shuffles and still returns the exact q4 rows;
  *   - SchemaEvolution.rebucket migrates an EXISTING catalog table
  *     into the layout (the warehouse-migration face of the same op).
  */
class BucketedLayoutSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffleCount(p: String): Int =
    p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))

  private def shuffleCount(df: DataFrame): Int = shuffleCount(planOf(df))

  private def noBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val custB =
    Tables.registerBucketed(spark, dir, "customer", 8, Seq("c_custkey"),
      Seq("c_custkey"))
  private lazy val ordB =
    Tables.registerBucketed(spark, dir, "orders", 8, Seq("o_custkey"),
      Seq("o_custkey"))
  private lazy val liByOrder =
    Tables.registerBucketed(spark, dir, "lineitem", 8, Seq("l_orderkey"),
      Seq("l_orderkey"))
  private lazy val ordByOrder =
    Tables.registerBucketed(spark, dir, "orders", 8, Seq("o_orderkey"),
      Seq("o_orderkey"))

  test("bucketed customer ⋈ orders on the bucket key: ZERO Exchange") {
    noBroadcast {
      val j = spark.table(custB)
        .join(spark.table(ordB), col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "o_orderkey")
      val p = planOf(j)
      withClue(p) {
        shuffleCount(j) shouldBe 0
        p should include ("SortMergeJoin")
        p should include ("Bucketed: true")
      }
      // and the co-located join is still CORRECT: row count matches the
      // plain parquet join
      val expect = Tables.load(spark, dir, "customer")
        .join(Tables.load(spark, dir, "orders"),
          col("c_custkey") === col("o_custkey")).count()
      j.count() shouldBe expect
    }
  }

  test("groupBy on the bucket key aggregates with ZERO Exchange") {
    val agg = spark.table(ordB).groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    withClue(planOf(agg)) { shuffleCount(agg) shouldBe 0 }
    agg.agg(sum("n")).collect().head.getLong(0) shouldBe
      Tables.load(spark, dir, "orders").count()
  }

  test("q4 star-join twin on bucketed lineitem/orders: fact-fact join " +
      "co-located, exact q4 rows") {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def q4Shape(li: DataFrame, orders: DataFrame): DataFrame = {
      val cust = Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey")
      val nation = Tables.load(spark, dir, "nation")
      val region = Tables.load(spark, dir, "region")
      li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(orders
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01")))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }
    // auto-broadcast off: at a 100 TB fact table neither lineitem nor
    // orders broadcasts — this pins the comparison to that regime (the
    // explicit dim hints still broadcast, as they would at any scale)
    val (flatP, bktP, flatRows, bktRows) = noBroadcast {
      val flat = q4Shape(Tables.load(spark, dir, "lineitem"),
        Tables.load(spark, dir, "orders"))
      val bkt = q4Shape(spark.table(liByOrder), spark.table(ordByOrder))
      (planOf(flat), planOf(bkt), flat.collect(), bkt.collect())
    }
    def orderkeyShuffles(p: String): Int = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(l_orderkey") ||
        l.contains("Exchange hashpartitioning(o_orderkey"))
    withClue(bktP) {
      // the flat plan re-shuffles BOTH fact sides onto the order key;
      // the bucketed layout sheds exactly those two exchanges — the
      // scans themselves report the hash distribution
      orderkeyShuffles(flatP) shouldBe 2
      orderkeyShuffles(bktP) shouldBe 0
      bktP should include ("Bucketed: true")
      shuffleCount(bktP) shouldBe shuffleCount(flatP) - 2
    }
    bktRows shouldBe flatRows
  }

  test("SchemaEvolution.rebucket migrates an existing table into the " +
      "shuffle-free layout") {
    val t = "cust_rebucket_mig"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Tables.load(spark, dir, "customer").write.saveAsTable(t)
    graft.migrate.SchemaEvolution.bucketSpec(spark, t) shouldBe None
    graft.migrate.SchemaEvolution.rebucket(spark, t, 8, Seq("c_custkey"),
      Seq("c_custkey"))
    graft.migrate.SchemaEvolution.bucketSpec(spark, t) shouldBe
      Some((8, Seq("c_custkey"), Seq("c_custkey")))
    spark.table(t).count() shouldBe
      Tables.load(spark, dir, "customer").count()
    noBroadcast {
      val j = spark.table(t).select("c_custkey")
        .join(spark.table(ordB), col("c_custkey") === col("o_custkey"))
      withClue(planOf(j)) { shuffleCount(j) shouldBe 0 }
    }
    spark.sql(s"DROP TABLE $t")
  }
}
