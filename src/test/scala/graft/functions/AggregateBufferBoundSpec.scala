package graft.functions

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The enforcement arm of [[BoundedPerKeyBuffer]]: GraftSession raises
  * the ObjectHashAggregate sort-fallback threshold to 1M keys globally,
  * which is safe ONLY while every TypedImperativeAggregate's buffer is
  * per-key bounded. This gate scans the main source tree so a future
  * unbounded-buffer aggregate (e.g. a collect_list-style accumulator)
  * fails HERE, at build time, instead of OOMing an executor at scale.
  */
class AggregateBufferBoundSpec extends AnyFunSuite with Matchers {

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src/main/scala")
    val stream = Files.walk(root)
    try stream.iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
    finally stream.close()
  }

  test("every TypedImperativeAggregate declares BoundedPerKeyBuffer") {
    val offenders = mainSources.flatMap { p =>
      val src = Files.readString(p)
      if (src.contains("extends TypedImperativeAggregate") &&
          !src.contains("with BoundedPerKeyBuffer"))
        Some(p.toString)
      else None
    }
    withClue("TypedImperativeAggregate without a declared per-key " +
      "buffer bound (see BoundedPerKeyBuffer's scaladoc for why the " +
      "1M-key ObjectHashAggregate threshold requires it): ") {
      offenders shouldBe empty
    }
  }

  test("declared bounds are the aggregates' actual k") {
    TopKByScore(org.apache.spark.sql.GraftBridge.expression(
        org.apache.spark.sql.functions.lit(1.0)),
      org.apache.spark.sql.GraftBridge.expression(
        org.apache.spark.sql.functions.lit(1L)), 7)
      .bufferBound shouldBe 7
    MisraGriesTopK(org.apache.spark.sql.GraftBridge.expression(
        org.apache.spark.sql.functions.lit(1L)), 9)
      .bufferBound shouldBe 9
  }
}
