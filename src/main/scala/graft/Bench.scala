package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * full materialization via the noop sink (a bare count() would let
  * Catalyst prune the projections being measured), one JSON line out.
  */
object Bench {

  /** Bench one query: one untimed warmup (codegen compile, JIT, page
    * cache), then UNCONDITIONAL min-of-2 timed runs — host stalls (GC
    * pause, CPU steal) poisoned single-run numbers by 5-10× three
    * rounds running; queries over 5 s get a third run so one stall
    * can't poison both samples of the queries that dominate the
    * headline total. A query that throws returns Left(message): a
    * failure must surface as an error marker, never as a bogus
    * time-to-exception averaged into the headline (r5 recorded d9's
    * crash as a 0.07 s "result").
    */
  /** The recursive-churn class (r20, BASELINE §noise): queries whose
    * wall is dominated by iterative CC rounds over localCheckpoint
    * blocks, where block placement varies run-to-run — same-code
    * spread measured 7.7–13.1 s on d15 across windows, wide enough to
    * masquerade as a round-over-round regression. These take min-of-4
    * so one noisy sample can't set the recorded number.
    */
  private[graft] val churnQueries =
    Set("d15_semantic_keep", "d15l_semantic_keep_ledger")

  /** @return Right((min seconds, every timed sample in run order)) —
    * the min is the recorded number (unchanged methodology); the full
    * sample list goes into the BENCH_FULL artifact so hot-window drift
    * (BASELINE §noise: same-code totals 150.6 vs 171.5 s two hours
    * apart in r20) is attributable from the artifact alone, without
    * narrative (r21, VERDICT-r20 #6).
    */
  private[graft] def benchOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => DataFrame,
      sfDir: String): Either[String, (Double, Seq[Double])] = {
    def once(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // drop cached/checkpointed blocks between runs — queries must not
    // interfere, and a prior run's blocks otherwise pile into the next
    // run's memory budget and show up as GC, not as the query's cost
    def clear(): Unit = {
      operators.ScratchCache.releaseAll() // also empties the registry
      spark.catalog.clearCache()
      // localCheckpoint blocks (d6/d7) are not catalog-cached
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
    def timed(): Either[String, Double] = {
      clear()
      val t0 = System.nanoTime()
      try {
        once()
        val s = (System.nanoTime() - t0) / 1e9
        samples += s
        Right(s)
      }
      catch { case e: Throwable =>
        Left(s"${e.getClass.getName}: ${e.getMessage}") }
    }
    val out =
      try { once()
        for {
          a <- timed(); b <- timed()
          m = math.min(a, b)
          f <- if (m > 5.0 || churnQueries(name))
            timed().map(math.min(m, _)) else Right(m)
          g <- if (churnQueries(name))
            timed().map(math.min(f, _)) else Right(f)
        } yield (g, samples.toSeq)
      } catch { case e: Throwable =>
        Left(s"${e.getClass.getName}: ${e.getMessage}") }
    clear()
    out.left.foreach(m => System.err.println(s"[bench] $name FAILED: $m"))
    out
  }

  /** @return (successful name→(min seconds, samples) in input order,
    *         name→error) */
  private[graft] def run(spark: SparkSession,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      sfDir: String)
      : (Seq[(String, (Double, Seq[Double]))], Seq[(String, String)]) = {
    val results = queries.map { case (name, fn) =>
      name -> benchOne(spark, name, fn, sfDir)
    }
    (results.collect { case (n, Right(t)) => n -> t },
      results.collect { case (n, Left(m)) => n -> m })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, "graft-bench")
    // warm up scan/codegen/shuffle machinery so the first timed query
    // doesn't absorb one-time session initialization
    graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().write
      .format("noop").mode("overwrite").save()
    // SPARK_GRAFT_ONLY: dev-only comma-list filter (sf1 scale runs);
    // the driver leaves it unset and benches everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val (times, errors) = run(spark,
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }, sfDir)
    // JSON string escape mirroring Verify's: backslash, quote, and ALL
    // control chars (<0x20) — an exception message carrying \f or ESC
    // would otherwise emit invalid JSON and break the driver's parse
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = times.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, m) => "\"" + k + "\":" + jstr(m) }
      .mkString("{", ",", "}")
    val total = times.map(_._2._1).sum
    // total repeated at the END: the driver archives a tail-truncated
    // copy of this line, which can cut the leading "value" field
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir","total_sec":$total}"""
    println(line)
    // the driver caps the archived stdout tail at 2,000 chars, which has
    // destroyed the per-query dict two rounds running — persist the full
    // line to durable files too (repo copy gets committed as evidence).
    // The FILE copies additionally carry every timed sample per query
    // ("samples", run order), so same-code window drift is attributable
    // from the artifact alone (r21, VERDICT-r20 #6); the printed line
    // stays sample-free — the driver's archived tail is char-capped.
    val ss = times.map { case (k, (_, sm)) =>
      "\"" + k + "\":[" + sm.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val fileLine = line.dropRight(1) + s""","samples":$ss}"""
    for (p <- Seq("/tmp/graft_bench.json", "/root/repo/BENCH_FULL.json")) {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (fileLine + "\n").getBytes("UTF-8"))
      } catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
