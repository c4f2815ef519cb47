package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Property-style bit-identity checks for the native codegen
  * expressions against their HOF/built-in twins, over ScalaCheck-
  * generated inputs (adversarial shapes the real corpus never hits:
  * empty strings, runs of separators, unicode, degenerate vectors).
  * Each property evaluates ALL samples in one Spark job: the samples
  * become a DataFrame and the twin columns must agree on every row.
  */
class NativeExpressionPropertySpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] = {
    val out = Iterator.continually(g.sample).flatten.take(n).toSeq
    out.size shouldBe n
    out
  }

  private def agree(df: DataFrame, native: Column, twin: Column): Unit =
    df.filter(native =!= twin).count() shouldBe 0L

  // words with unicode, empties and odd lengths; texts with separator
  // runs and leading/trailing spaces. Includes supplementary-plane
  // characters (surrogate pairs) and LONE surrogates, so the "matches
  // on any text" claims cover the non-BMP path, not just manual
  // reasoning about Spark's Ascii/split behavior there.
  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("héllo", "wörld", "日本語", "", "a", "§±µ"),
    Gen.oneOf("😀", "a😀b", "𝒳𝒴",
      "\uD800", "\uDC00", "x\uDFFF"),
    Gen.listOfN(3, Gen.choose('!', '~')).map(_.mkString))
  private val text: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const(" "),
    Gen.const("   "),
    Gen.listOf(word).map(_.mkString(" ")),
    Gen.listOf(word).map(" " + _.mkString("  ") + " "))

  test("WordGramHashes equals the HOF chain on adversarial strings") {
    import spark.implicits._
    val df = samples(text).toDF("text").cache()
    def hof(n: Int, ds: Boolean): Column = {
      val wh = transform(split(col("text"), " "), w => xxhash64(w))
      val grams = when(org.apache.spark.sql.functions.size(wh) >= n,
        transform(sequence(lit(1), org.apache.spark.sql.functions.size(wh) - (n - 1)),
          i => xxhash64((0 until n).map(k => element_at(wh, i + k)): _*)))
        .otherwise(array().cast("array<bigint>"))
      if (ds) array_sort(array_distinct(grams)) else grams
    }
    for (n <- Seq(2, 3, 4, 5); ds <- Seq(true, false))
      withClue(s"n=$n ds=$ds: ") {
        agree(df, GraftBridge.column(
          WordGramHashes(GraftBridge.expression(col("text")), n, ds)),
          hof(n, ds))
      }
  }

  test("RollingHash equals the split/ascii fold on adversarial strings") {
    import spark.implicits._
    val df = samples(text).toDF("text")
    val hof = aggregate(
      transform(split(col("text"), ""),
        c => ascii(c).cast(org.apache.spark.sql.types.LongType)),
      lit(7L), (acc, x) => (acc * 31 + x) % 1000000007L)
    agree(df, GraftBridge.column(RollingHash(
      GraftBridge.expression(col("text")), 7L, 31L, 1000000007L)), hof)
  }

  test("HyperplaneSignature equals the HOF fold on random vectors") {
    import spark.implicits._
    val vec: Gen[Seq[Float]] = for {
      d <- Gen.choose(1, 24)
      v <- Gen.listOfN(d, Gen.chooseNum(-8f, 8f))
    } yield v
    val degenerate = Seq(Seq(0f), Seq(0f, 0f, 0f), Seq(Float.MinPositiveValue))
    val df = (samples(vec, 100) ++ degenerate).toDF("v")
    for (bits <- Seq(1, 4, 8, 13); seed <- Seq(0x5eed, 0xd8))
      withClue(s"bits=$bits seed=$seed: ") {
        agree(df, GraftBridge.column(HyperplaneSignature(
          GraftBridge.expression(col("v")), bits, seed)),
          graft.functions.VectorFunctions
            .hyperplaneSignatureHof(col("v"), bits, seed))
      }
  }

  test("SortedLongIntersectCount equals size(array_intersect) on random sets") {
    import spark.implicits._
    val sortedSet: Gen[Seq[Long]] = Gen.listOf(Gen.chooseNum(-50L, 50L))
      .map(_.distinct.sorted)
    val pairGen: Gen[(Seq[Long], Seq[Long])] = for {
      a <- sortedSet; b <- sortedSet
      // bias toward overlap so the merge path is exercised, not just misses
      mixed = (b ++ a.take(a.size / 2)).distinct.sorted
    } yield (a, mixed)
    val df = (samples(pairGen) ++ Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L), Seq.empty[Long]))).toDF("a", "b")
    agree(df, GraftBridge.column(SortedLongIntersectCount(
      GraftBridge.expression(col("a")), GraftBridge.expression(col("b")))),
      org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b"))))
  }

  test("FirstEqualIndex equals the HOF position fold on random arrays") {
    import spark.implicits._
    // small value range forces frequent equalities at random positions;
    // unequal lengths exercise the min-length scan against zip_with's
    // null padding (null <=> value is false — never a match)
    val arr: Gen[Seq[Long]] = Gen.listOf(Gen.chooseNum(0L, 6L))
    val pairGen: Gen[(Seq[Long], Seq[Long])] = for {
      a <- arr; b <- arr
    } yield (a, b)
    val df = (samples(pairGen) ++ Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L), Seq.empty[Long]),
      (Seq(5L), Seq(5L)))).toDF("a", "b")
    agree(df,
      VectorFunctions.firstEqualIndex(col("a"), col("b")),
      VectorFunctions.firstEqualIndexHof(col("a"), col("b")))
  }

  test("array expressions null-propagate on null ELEMENTS (HOF poison-fold)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fSchema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val fdf = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(1f, null, 3f), Seq(1f, 2f, 3f)),
        Row(Seq(1f, 2f), Seq(null, 2f))),
      fSchema)
    val dot = GraftBridge.column(FloatVecDot(
      GraftBridge.expression(col("a")), GraftBridge.expression(col("b"))))
    fdf.filter(dot.isNotNull).count() shouldBe 0L
    // sig reads only `a`: row 1's a carries the null, row 2's a is clean
    val sig = GraftBridge.column(HyperplaneSignature(
      GraftBridge.expression(col("a")), 4, 0x5eed))
    fdf.filter(sig.isNull).count() shouldBe 1L
    // non-null rows through the SAME nullable-element schema still agree
    // with the HOF twin (the null-checking codegen path, not the fast loop)
    val okdf = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq(1f, -2f, 3f), Seq(0.5f, 2f, -1f))),
      fSchema)
    okdf.filter(dot =!= graft.functions.VectorFunctions
      .dot(col("a"), col("b"))).count() shouldBe 0L
    val lSchema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = true)),
      StructField("b", ArrayType(LongType, containsNull = true))))
    val ldf = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq(1L, null), Seq(1L, 2L))),
      lSchema)
    val isect = GraftBridge.column(SortedLongIntersectCount(
      GraftBridge.expression(col("a")), GraftBridge.expression(col("b"))))
    ldf.filter(isect.isNotNull).count() shouldBe 0L
    // FirstEqualIndex scans in order and never looks past the first
    // equality: a null BEFORE it poisons, a null AFTER it is unreached
    val fdf2 = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(null, 1L), Seq(2L, 1L)), // null precedes the match → null
        Row(Seq(1L, null), Seq(1L, 2L))), // match at 0 precedes the null → 0
      lSchema)
    val fei = GraftBridge.column(FirstEqualIndex(
      GraftBridge.expression(col("a")), GraftBridge.expression(col("b"))))
    fdf2.select(fei).collect().map(r =>
      if (r.isNullAt(0)) null else r.get(0)) shouldBe Array(null, 0)
  }

  test("HyperplaneSignature rejects bits outside [1, 63] at construction") {
    val e = GraftBridge.expression(col("v"))
    an[IllegalArgumentException] should be thrownBy
      HyperplaneSignature(e, 0, 1)
    an[IllegalArgumentException] should be thrownBy
      HyperplaneSignature(e, 64, 1)
  }

  test("every native expression COMPILES under whole-stage codegen — " +
      "no silent interpreter fallback") {
    // Janino failures don't fail queries — Spark logs a WARN and falls
    // back to interpreted projection, silently evicting the expression
    // from codegen (pq_encode shipped that way for a round: a
    // margin-stripped '||' in its template). Calling the generator
    // DIRECTLY makes the fallback a test failure. Both element-null
    // variants compile, covering the null-scan and fast-loop templates.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types._
    // BOTH axes must vary: element nullability picks the null-scan vs
    // fast-loop template, and CHILD nullability decides whether
    // nullSafeCodeGen ever declares ev.isNull — a template referencing
    // it on a non-nullable child (e.g. a KnownNonNullElements-asserted
    // scan output or a literal codebook) is the exact shape that sent
    // the d8/s2 signature stages to the interpreter for two rounds
    for (n <- Seq(true, false); cn <- Seq(true, false)) {
      def floats(nullable: Boolean) =
        BoundReference(0, ArrayType(FloatType, nullable), nullable = cn)
      def floats1(nullable: Boolean) =
        BoundReference(1, ArrayType(FloatType, nullable), nullable = cn)
      def longs(nullable: Boolean) =
        BoundReference(0, ArrayType(LongType, nullable), nullable = cn)
      def longs1(nullable: Boolean) =
        BoundReference(1, ArrayType(LongType, nullable), nullable = cn)
      val doubles = BoundReference(1, ArrayType(DoubleType, false), false)
      val str = BoundReference(0, StringType, nullable = cn)
      val exprs = Seq(
        KnownNonNullElements(floats(n)),
        FloatVecDot(floats(n), floats1(n)),
        HyperplaneSignature(floats(n), 8, 0xd8),
        HyperplaneSignature(floats(n), 14, 0xd8),
        SortedLongIntersectCount(longs(n), longs1(n)),
        FirstEqualIndex(longs(n), longs1(n)),
        DemoteHotTokens(longs(n), new LongArrayParam(Array(3L, 7L, 11L))),
        DemoteHotTokens(longs(n), new LongArrayParam(Array.empty[Long])),
        RollingHash(str, 7L, 31L, 1000003L),
        WordGramHashes(str, 3, distinctSorted = true),
        WordGramHashes(str, 3, distinctSorted = false),
        PqEncode(floats(n), doubles, 4, 16))
      exprs.foreach { e =>
        withClue(s"${e.getClass.getSimpleName} (elemNullable=$n, " +
            s"childNullable=$cn): ") {
          noException should be thrownBy
            GenerateUnsafeProjection.generate(Seq(e))
        }
      }
    }
  }
}
