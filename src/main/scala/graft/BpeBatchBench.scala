package graft

import graft.sources.Tables

/** Dev benchmark (r19): the batched BPE inducer's round-count claim.
  * The exact inducer is one Spark job pair PER MERGE (driver-latency
  * bound — a 32k vocabulary is 32k sequential rounds); the batched
  * variant accepts up to B symbol-disjoint merges per round. This
  * times both at the same merge count on the real corpus and prints
  * the merge-set agreement, so the speedup and the deviation are one
  * measurement. Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain
  * graft.BpeBatchBench [nMerges] [batchB]"`; recorded in BASELINE
  * §bpe-batched.
  */
object BpeBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val n = args.headOption.map(_.toInt).getOrElse(128)
    val b = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-bpe-batch")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")

    var t0 = System.nanoTime()
    val exact = graft.operators.BpeInduction.trainMerges(docs, "text", n)
    val exactSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val batched = graft.operators.BpeInduction
      .trainMergesBatched(docs, "text", n, batchB = b)
    val batchedSec = (System.nanoTime() - t0) / 1e9
    val overlap = batched.map(_._1).toSet
      .intersect(exact.map(_._1).toSet).size.toDouble /
      math.max(exact.size, 1)
    println(f"[bpe] n=$n exact_rounds=${exact.size} " +
      f"exact=$exactSec%.1f s batched(B=$b)=$batchedSec%.1f s " +
      f"speedup=${exactSec / batchedSec}%.1f set_overlap=$overlap%.3f " +
      f"sf=$sfDir")
    spark.stop()
  }
}
