package graft.migrate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Schema-evolution operations on warehouse tables (SURVEY M10) — the
  * Spark-native equivalent of the ALTER TABLE statements reference
  * migrations run as DDL.
  *
  * Two cost classes, chosen automatically:
  *  - METADATA-ONLY: adding a nullable column is `ALTER TABLE ADD
  *    COLUMNS` — O(1) regardless of table size.
  *  - REWRITE: drop/rename/cast/backfill change existing bytes, so they
  *    are an honest one-pass distributed rewrite: CTAS into a staging
  *    table, swap via atomic-ish drop+rename. At 100 TB this is one scan
  *    + one write, the floor for a physical schema change on parquet.
  */
object SchemaEvolution {

  /** Metadata-only nullable column add. */
  def addColumn(spark: SparkSession, table: String, name: String,
      sqlType: String): Unit =
    spark.sql(s"ALTER TABLE $table ADD COLUMNS (`$name` $sqlType)")

  /** Add + backfill from an expression (rewrite). */
  def addColumnBackfill(spark: SparkSession, table: String, name: String,
      expr: Column): Unit =
    rewrite(spark, table)(_.withColumn(name, expr))

  def dropColumn(spark: SparkSession, table: String, name: String): Unit =
    rewrite(spark, table)(_.drop(name))

  def renameColumn(spark: SparkSession, table: String, from: String,
      to: String): Unit =
    rewrite(spark, table)(_.withColumnRenamed(from, to))

  /** Type widen / cast (e.g. INT → BIGINT, DECIMAL(10,2) → (18,2)). */
  def castColumn(spark: SparkSession, table: String, name: String,
      sqlType: String): Unit =
    rewrite(spark, table)(df => df.withColumn(name, col(name).cast(sqlType)))

  /** Backfill an existing column with an expression (constant or derived). */
  def backfill(spark: SparkSession, table: String, name: String,
      expr: Column): Unit =
    rewrite(spark, table)(df => df.withColumn(name, expr))

  /** One-pass rewrite via staging table + swap. The staging CTAS runs as
    * a distributed job; the swap is catalog metadata. The source table's
    * partition layout is preserved (for partition columns that survive
    * the transform) — losing it would silently kill partition pruning
    * for every downstream reader.
    */
  def rewrite(spark: SparkSession, table: String)(
      f: DataFrame => DataFrame): Unit =
    rewriteWithLayout(spark, table, bucketSpec(spark, table))(f)

  /** Re-layout a table into `numBuckets` hash buckets on `bucketCols`
    * (optionally sorted in-bucket) — the warehouse-layout migration
    * (SURVEY F14/IO7) that makes every downstream equi-join/aggregate
    * on the bucket keys SHUFFLE-FREE: two tables bucketed the same way
    * join with zero Exchange, and a groupBy on the keys skips its
    * exchange, because the parquet scan itself reports
    * hash-partitioned output. One scan + one write (the floor for any
    * physical re-layout); at 100 TB this is the once-per-table cost
    * that removes a per-QUERY re-shuffle of the fact table.
    * Plan-gated in BucketedLayoutSpec (zero-Exchange join + agg, and
    * the q4 star-join twin).
    */
  def rebucket(spark: SparkSession, table: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(numBuckets > 0 && bucketCols.nonEmpty,
      "rebucket needs numBuckets > 0 and at least one bucket column")
    // fail LOUDLY on a column typo: rewriteWithLayout's forall guard is
    // right for rewrite() (a transform may legitimately drop a
    // previously-bucketed column) but here a silent skip would swap in
    // an UNBUCKETED table and every downstream "shuffle-free" join
    // would quietly regrow its Exchange
    val cols = spark.table(table).columns.toSet
    val missing = (bucketCols ++ sortCols).filterNot(cols)
    require(missing.isEmpty,
      s"rebucket: column(s) ${missing.mkString(", ")} not in $table " +
        s"(has ${cols.mkString(", ")})")
    rewriteWithLayout(spark, table,
      Some((numBuckets, bucketCols, sortCols)))(identity)
  }

  private def rewriteWithLayout(spark: SparkSession, table: String,
      buckets: Option[(Int, Seq[String], Seq[String])])(
      f: DataFrame => DataFrame): Unit = {
    val partCols = spark.catalog.listColumns(table).collect()
      .filter(_.isPartition).map(_.name).toSeq
    val staging = s"${table}__evolve_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    val out = f(spark.table(table))
    val cols = out.schema.fieldNames.toSet
    val keptParts = partCols.filter(cols)
    var w = out.write.format("parquet")
    if (keptParts.nonEmpty) w = w.partitionBy(keptParts: _*)
    buckets.foreach { case (n, bCols, sCols) =>
      if (bCols.forall(cols)) {
        w = w.bucketBy(n, bCols.head, bCols.tail: _*)
        val keptSort = sCols.filter(cols)
        if (keptSort.nonEmpty) w = w.sortBy(keptSort.head, keptSort.tail: _*)
      }
    }
    w.saveAsTable(staging)
    require(spark.catalog.tableExists(staging),
      s"staging table $staging missing after CTAS — aborting before touching $table")
    // Swap with no data-loss window: the original is renamed aside (not
    // dropped) before staging takes its name, so at every instant the data
    // exists under some table; a crash leaves either the original intact
    // (possibly as __evolve_backup) or the swap complete. Readers can see
    // the table absent only for the instant between the two renames, and a
    // failed second rename restores the original immediately.
    val backup = s"${table}__evolve_backup"
    spark.sql(s"DROP TABLE IF EXISTS $backup")
    spark.sql(s"ALTER TABLE $table RENAME TO $backup")
    try spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    catch {
      case e: Throwable =>
        spark.sql(s"ALTER TABLE $backup RENAME TO $table")
        if (partCols.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
        throw e
    }
    // RENAME moves the data directory but does not migrate the partition
    // entries in the catalog — without a repair the table reads as empty
    if (keptParts.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
    spark.sql(s"DROP TABLE $backup")
  }

  /** (numBuckets, bucketCols, sortCols) from DESCRIBE EXTENDED — the
    * catalog API does not expose bucketing, but losing it on rewrite
    * would silently re-introduce shuffles into co-located joins.
    */
  private[graft] def bucketSpec(
      spark: SparkSession, table: String): Option[(Int, Seq[String], Seq[String])] = {
    val desc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def parseCols(v: String): Seq[String] =
      v.trim.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq
    desc.get("Num Buckets").map(_.trim.toInt).filter(_ > 0).map { n =>
      (n, desc.get("Bucket Columns").map(parseCols).getOrElse(Nil),
        desc.get("Sort Columns").map(parseCols).getOrElse(Nil))
    }
  }
}
