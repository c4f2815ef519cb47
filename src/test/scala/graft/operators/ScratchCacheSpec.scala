package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class ScratchCacheSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("scratch persists at the conf-keyed level, never the default") {
    ScratchCache.releaseAll()
    val df = spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
    ScratchCache.scratch(df)
    df.storageLevel shouldBe StorageLevel.DISK_ONLY
    ScratchCache.outstanding shouldBe 1

    spark.conf.set(ScratchCache.levelConf, "MEMORY_AND_DISK")
    try {
      val df2 = spark.range(0, 50).toDF("id")
      ScratchCache.scratch(df2)
      df2.storageLevel shouldBe StorageLevel.MEMORY_AND_DISK
    } finally spark.conf.unset(ScratchCache.levelConf)
    ScratchCache.releaseAll()
  }

  test("releaseAll unpersists every registered frame and empties the registry") {
    ScratchCache.releaseAll()
    val frames = (1 to 3).map(i => spark.range(0, 10L * i).toDF("id"))
    frames.foreach(ScratchCache.scratch(_))
    frames.foreach(_.count()) // materialize the blocks
    ScratchCache.outstanding shouldBe 3
    ScratchCache.releaseAll()
    ScratchCache.outstanding shouldBe 0
    frames.foreach(_.storageLevel shouldBe StorageLevel.NONE)
  }

  test("scratch is a materialization barrier with unchanged results") {
    ScratchCache.releaseAll()
    val base = spark.range(0, 20)
      .select(col("id"), sequence(lit(1), (col("id") % 5 + 1)).as("arr"))
    val plain = base.select(col("id"), explode(col("arr")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scr = ScratchCache.scratch(base)
      .select(col("id"), explode(col("arr")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    scr shouldBe plain
    ScratchCache.releaseAll()
  }
}
