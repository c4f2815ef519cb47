package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The events loader must survive testdata regeneration: generators have
  * shipped `ts` as int64 nanos (TIMESTAMP(NANOS) read under nanosAsLong),
  * as TIMESTAMP(MICROS, UTC) (TimestampType), and as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (TimestampNTZType). Every
  * encoding must surface the identical (ts_ms, ts) pair.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // epoch micros, deliberately sub-ms-offset so ms truncation is exercised
  private val micros = Seq(1700000000123456L, 1700000001999999L, 0L)
  private val expectMs = micros.map(_ / 1000L)

  private def writeFixture(name: String)(build: => org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft-events-$name").toString
    build.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    s"$dir/events.parquet"
  }

  private def check(path: String): Unit = {
    val loaded = Tables.loadEvents(spark, path).orderBy("event_id")
    assert(loaded.schema("ts_ms").dataType == LongType)
    assert(loaded.schema("ts").dataType == TimestampType)
    val got = loaded.select($"ts_ms").as[Long].collect().toSeq
    assert(got == expectMs, s"ts_ms mismatch for $path")
    // ts is the ms-truncated instant (UTC session): round-trips to ts_ms
    val ms = loaded.select(unix_millis($"ts")).as[Long].collect().toSeq
    assert(ms == expectMs)
  }

  test("loadEvents: int64-nanos encoding (legacy generator)") {
    val path = writeFixture("long") {
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us * 1000L) }
        .toDF("event_id", "ts")
    }
    check(path)
  }

  test("loadEvents: TimestampType (micros, adjusted-to-UTC) encoding") {
    val path = writeFixture("tstz") {
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us) }
        .toDF("event_id", "us")
        .withColumn("ts", timestamp_micros($"us")).drop("us")
    }
    check(path)
  }

  test("loadEvents: TimestampNTZType (micros, naive) encoding — current testdata") {
    val path = writeFixture("ntz") {
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us) }
        .toDF("event_id", "us")
        .withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType))
        .drop("us")
    }
    check(path)
  }

  test("loadEvents on driver testdata: analysis succeeds, rows > 0") {
    val e = Tables.load(spark, TestSpark.sfDir, "events")
    assert(e.schema("ts_ms").dataType == LongType)
    assert(e.limit(1).count() == 1L)
  }
}
