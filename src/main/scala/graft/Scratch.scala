package graft

import org.apache.spark.sql.functions._

// temporary diagnostic main (not committed)
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("QB_SF", "/tmp/graft_sf10")
    val spark = GraftSession.local(32, "scratch")
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val bits = graft.queries.DedupOps.d8BitsFor(n)
    val tables = graft.queries.DedupOps.d8TablesFor(bits)
    println(s"[scratch] n=$n bits=$bits tables=$tables")
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    def bandOf(extra: Seq[org.apache.spark.sql.Column]) =
      e.select((extra :+
          array((0 until tables).map(t =>
            VectorFunctions.hyperplaneSignature(col("embedding"), bits,
              0xd8 + t)): _*).as("sigs")): _*)
        .select(col("*"), posexplode(col("sigs")))
        .withColumnRenamed("pos", "table")
        .withColumnRenamed("col", "bucket")

    val narrow = bandOf(Seq(col("vec_id")))
    time("band_narrow_count")(narrow.count())
    val jNarrow = narrow.as("a").join(narrow.as("b").hint("merge"),
      col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id") &&
        VectorFunctions.firstEqualIndex(col("a.sigs"), col("b.sigs"))
          === col("a.table"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
    time("narrow_join_count")(jNarrow.count())

    val jNoSig = narrow.as("a").join(narrow.as("b").hint("merge"),
      col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"))
    time("nosig_join_count")(jNoSig.count())

    val wide = bandOf(Seq(col("vec_id"), col("embedding"),
      sqrt(VectorFunctions.dot(col("embedding"), col("embedding")))
        .as("nrm")))
    time("band_wide_count")(wide.count())
    val jWide = wide.as("a").join(wide.as("b").hint("merge"),
      col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id") &&
        VectorFunctions.firstEqualIndex(col("a.sigs"), col("b.sigs"))
          === col("a.table") &&
        (VectorFunctions.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))) >= 0.4)
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
    time("wide_join_count")(jWide.count())
    spark.stop()
  }
}
