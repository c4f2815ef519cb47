package graft.migrate

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Bulk table movement source → transforms → sink (SURVEY M9): the
  * data-migration half of the reference, re-expressed as one declarative
  * Spark job. Reads stay pruned/pushed-down (the transform list is
  * column expressions, not row closures), writes can be partitioned so
  * downstream reads prune by partition at 100 TB.
  */
object BulkCopy {

  final case class Sink(
      table: Option[String] = None,
      path: Option[String] = None,
      format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil,
      /** (numBuckets, columns): hash-bucketed layout so later equi-joins
        * on these columns are co-located — no shuffle of the big table.
        * Requires a table sink (bucket metadata lives in the catalog).
        */
      bucketBy: Option[(Int, Seq[String])] = None,
      /** Sort within buckets (pairs with bucketBy for SMJ-ready files). */
      sortBy: Seq[String] = Nil,
      /** For skew/size control; None leaves AQE in charge. */
      repartition: Option[Int] = None)

  /** Copy `source` through column transforms into the sink.
    *
    * @param transforms (columnName → expression) pairs applied in order;
    *                   an expression may reference source columns
    *                   (derive), overwrite an existing column (cast /
    *                   cleanse), or add a new one.
    * @param select     optional final projection (column pruning — keeps
    *                   the scan narrow at scale).
    */
  def copy(
      source: DataFrame,
      sink: Sink,
      transforms: Seq[(String, Column)] = Nil,
      select: Seq[String] = Nil,
      filter: Option[Column] = None): Unit = {
    var df = source
    filter.foreach(f => df = df.filter(f))
    transforms.foreach { case (name, expr) => df = df.withColumn(name, expr) }
    if (select.nonEmpty) df = df.select(select.map(df.col): _*)
    sink.repartition.foreach(n => df = df.repartition(n))

    var writer = df.write.format(sink.format).mode(sink.mode)
    if (sink.partitionBy.nonEmpty)
      writer = writer.partitionBy(sink.partitionBy: _*)
    sink.bucketBy.foreach { case (n, cols) =>
      require(sink.table.nonEmpty, "bucketBy requires a table sink")
      writer = writer.bucketBy(n, cols.head, cols.tail: _*)
      if (sink.sortBy.nonEmpty)
        writer = writer.sortBy(sink.sortBy.head, sink.sortBy.tail: _*)
    }

    (sink.table, sink.path) match {
      case (Some(t), _) => writer.saveAsTable(t)
      case (_, Some(p)) => writer.save(p)
      case _ => throw new IllegalArgumentException(
        "Sink needs a table or a path")
    }
  }

  /** Key-based upsert (the MERGE a data migration needs): rows of
    * `updates` replace target rows sharing the key; new keys insert.
    * One anti-join + union + staged rewrite — a single distributed pass
    * over the target, which is the floor for merge-on-parquet (formats
    * with delete vectors make this cheaper; the API stays the same).
    */
  def upsertTable(spark: SparkSession, target: String, updates: DataFrame,
      keys: Seq[String]): Unit =
    SchemaEvolution.rewrite(spark, target) { current =>
      current.join(updates, keys, "left_anti").unionByName(updates)
    }

  /** Table-to-table convenience used from migration steps. */
  def copyTable(spark: SparkSession, from: String, to: String,
      transforms: Seq[(String, Column)] = Nil,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    copy(spark.table(from),
      Sink(table = Some(to), partitionBy = partitionBy, mode = mode),
      transforms)

  /** Incremental copy: append only source rows with `watermarkCol`
    * STRICTLY greater than the sink's current maximum (the standard
    * high-watermark delta pattern for repeated source→warehouse syncs).
    * The sink probe is a single max() aggregate; the source filter is a
    * pushed-down range predicate, so each sync scans only the delta's
    * row groups at any scale. Requires a monotonically advancing
    * watermark column (ingest time, autoincrement id); rows sharing the
    * current max are assumed already copied — use a strictly-increasing
    * key, or follow with [[upsertTable]] for late data.
    *
    * @return number of rows appended
    */
  def incrementalCopy(spark: SparkSession, source: DataFrame,
      target: String, watermarkCol: String): Long = {
    import org.apache.spark.sql.functions.max
    val hwm =
      if (!spark.catalog.tableExists(target)) None
      else spark.table(target).agg(max(watermarkCol)).collect()(0).get(0)
        match { case null => None; case v => Some(v) }
    val delta = hwm match {
      case Some(v) => source.filter(source.col(watermarkCol) > v)
      case None => source
    }
    // count once on the materialized append, not the source (counting
    // the plan would scan twice)
    val before =
      if (spark.catalog.tableExists(target)) spark.table(target).count()
      else 0L
    delta.write.format("parquet").mode(SaveMode.Append).saveAsTable(target)
    spark.table(target).count() - before
  }
}
