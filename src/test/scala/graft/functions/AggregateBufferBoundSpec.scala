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

  /** Every compiled main class under the graft package — walked from
    * the build output so the gate sees exactly what ships, loaded
    * WITHOUT static init. Reflection (not a source-text scan): a
    * substring gate is file-granular (one compliant aggregate hides a
    * second non-compliant one in the same file) and blind to
    * inheritance through an intermediate base class (r16 advisory).
    */
  private def graftClasses: Seq[Class[_]] = {
    // derive the output dir from the LOADED trait's code source — a
    // hardcoded target/scala-N.NN/classes would either miss the build
    // after a Scala bump (throwing) or, worse, scan a stale sibling
    // output and pass the gate against classes that no longer ship
    val root = Paths.get(classOf[BoundedPerKeyBuffer]
      .getProtectionDomain.getCodeSource.getLocation.toURI)
    val loader = getClass.getClassLoader
    def load(name: String): Option[Class[_]] =
      try Some(Class.forName(name, false, loader))
      catch { case _: Throwable => None }
    if (Files.isDirectory(root)) {
      val stream = Files.walk(root)
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".class"))
        .flatMap { p =>
          load(root.relativize(p).toString.stripSuffix(".class")
            .replace(java.io.File.separatorChar, '.'))
        }
        .toSeq
      finally stream.close()
    } else {
      // packaged run: the code source is a JAR, not a classes dir —
      // walk its entries instead of throwing a NotDirectoryException
      // from Files.walk (r17 advisory)
      val jar = new java.util.jar.JarFile(root.toFile)
      try jar.entries().asScala
        .filter(e => !e.isDirectory && e.getName.endsWith(".class"))
        .flatMap(e =>
          load(e.getName.stripSuffix(".class").replace('/', '.')))
        .toSeq
      finally jar.close()
    }
  }

  test("every TypedImperativeAggregate subclass mixes in " +
      "BoundedPerKeyBuffer") {
    val aggBase = Class.forName(
      "org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate")
    val bound = classOf[BoundedPerKeyBuffer]
    val classes = graftClasses
    // self-check: the walk actually found the known aggregates — an
    // empty scan must fail loudly, not pass vacuously
    classes.count(c => aggBase.isAssignableFrom(c) &&
      !c.isInterface) should be >= 2
    val offenders = classes.filter { c =>
      aggBase.isAssignableFrom(c) && !c.isInterface &&
        c != aggBase && !bound.isAssignableFrom(c)
    }.map(_.getName)
    withClue("TypedImperativeAggregate subclass without a declared " +
      "per-key buffer bound (see BoundedPerKeyBuffer's scaladoc for " +
      "why the 1M-key ObjectHashAggregate threshold requires it): ") {
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
