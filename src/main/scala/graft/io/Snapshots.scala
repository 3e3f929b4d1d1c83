package graft.io

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layer (SURVEY S4-S15): partitioned parquet export/reload,
  * snapshot versioning, CDC JSONL sink/replay.
  *
  * The reference's per-month COPY loop, DELETE+INSERT reload, and
  * .duckdb file backups (partitioning.py:48-242, etl_main.py:62-201)
  * all collapse into parquet-native idioms: `partitionBy` writes,
  * partition-pruned reads, and immutable snapshot directories (restore
  * = read the previous version; atomicity = write-then-swap). Sessions
  * run with partitionOverwriteMode=dynamic so an incremental month
  * rewrite replaces only the touched partitions.
  */
object Snapshots {

  /** S10: hive-style partitioned export on load_month.
    *
    * Clustering on the partition column first bounds the file count
    * (without it a 32-task write over 80 months emits ~2,500 tiny
    * files, the classic small-files explosion that kills 100 TB-scale
    * reads). The REBALANCE hint — rather than a plain
    * `repartition(col)` — lets AQE split a skewed hive partition
    * across several tasks, so one hot month doesn't become a
    * single-task straggler at scale (round-2 advice).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String = "load_month"): Unit =
    df.hint("rebalance", col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** S11: partition-pruned reload (pruning is automatic — the filter on
    * the partition column reaches PartitionFilters, not the data scan).
    */
  def readPartitions(spark: SparkSession, path: String, months: Seq[String]): DataFrame =
    spark.read.parquet(path).filter(col("load_month").isin(months: _*))

  /** S10 companion: the reference registers a NAMED VIEW per exported
    * month partition (partitioning.py:48-80 creates
    * `{table}_load_month_{value}` DuckDB views so BI queries can name a
    * month directly). Spark equivalent: temp views over the partitioned
    * directory with the month pinned — the equality on the partition
    * column prunes the scan to that month's directory
    * (PartitionFilters), so each view reads exactly what the
    * reference's per-month view reads. `-` sanitizes to `_` the same
    * way the reference sanitizes its view names (partitioning.py:55).
    * Returns the registered view names.
    */
  def registerPartitionViews(
      spark: SparkSession, table: String, path: String,
      months: Seq[String], partitionCol: String = "load_month"): Seq[String] = {
    val base = spark.read.parquet(path)
    val named = months.map { m =>
      m -> s"${table}_${partitionCol}_${m.replaceAll("[^A-Za-z0-9_]", "_")}"
    }
    // sanitization is lossy — two distinct partition values may map to
    // one view name, and the second createOrReplaceTempView would
    // silently shadow the first (a BI query then reads one month twice
    // and the other never); fail loudly instead
    val dups = named.groupBy(_._2).filter(_._2.map(_._1).distinct.size > 1)
    require(dups.isEmpty,
      s"partition view name collision after sanitizing: " +
        dups.map { case (n, ms) => s"$n <- ${ms.map(_._1).mkString(",")}" }.mkString("; "))
    named.map { case (m, name) =>
      base.filter(col(partitionCol) === m).createOrReplaceTempView(name)
      name
    }
  }

  /** Scale path for repeated co-located joins (SURVEY §4): write both
    * sides bucketed AND sorted by the join key into the same bucket
    * count — joins between them then read pre-partitioned, pre-sorted
    * buckets and skip both the Exchange and the Sort (asserted in
    * PlanSpec). This is how the fact↔bridge and staging↔dim joins
    * avoid re-shuffling 100 TB on every daily batch: the expensive
    * shuffle happens once at write time, not once per join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** S15: snapshot versioning — each version is an immutable directory;
    * restore = read it.
    */
  def writeSnapshot(df: DataFrame, baseDir: String, version: String): Unit =
    df.write.mode("overwrite").parquet(s"$baseDir/v=$version")

  def readSnapshot(spark: SparkSession, baseDir: String, version: String): DataFrame =
    spark.read.parquet(s"$baseDir/v=$version")

  /** S16: schema-evolution read across snapshot generations. The
    * reference evolves its staging table in place with `ALTER TABLE
    * ... ADD COLUMN IF NOT EXISTS` (stored_procedures.sql:111-116) and
    * adds `processed_to_dwh BOOLEAN DEFAULT FALSE` mid-flight
    * (dags/etl_pipeline.py:119-124). Parquet-native equivalent: a new
    * generation simply writes files with the wider schema next to the
    * old ones; `mergeSchema` unions the footers at read time, so
    * pre-evolution files surface the new column as NULL and NO old
    * data is rewritten — the only way an ADD COLUMN can work on 100 TB
    * of immutable files. mergeSchema costs a footer read per file at
    * planning; at real scale pin the merged schema in a catalog and
    * pass it via `.schema(...)` instead.
    */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** The ADD COLUMN default, applied at read time: rows from
    * generations predating `name` (surfaced as NULL by the merged
    * read) take `default`, exactly like the reference's `DEFAULT
    * FALSE` backfill — newer rows keep their written value. Also
    * covers the add-if-absent case when no generation carries the
    * column yet.
    */
  def withColumnDefault(df: DataFrame, name: String, default: Column): DataFrame =
    if (df.columns.contains(name)) df.withColumn(name, coalesce(col(name), default))
    else df.withColumn(name, default)

  /** S13: CDC JSONL append sink — one JSON object per line, the
    * reference's record shape (cdc.py:58-67).
    */
  def cdcAppend(records: DataFrame, dir: String): Unit =
    records.write.mode("append").json(dir)

  /** S14: CDC replay scan. */
  def cdcReplay(spark: SparkSession, dir: String): DataFrame = spark.read.json(dir)

  /** Shape events into CDC records: {timestamp, job_id, action, data,
    * metadata} (cdc.py:54-69). The action derives from PRIOR EXISTENCE,
    * the reference's actual rule: crawler.py:152-186 computes
    * `inserted_ids` from the upsert ONCE per batch and then marks EVERY
    * batch record of a newly-inserted job_id as `insert` (is_new checks
    * membership per record, not recency), so a new entity's whole batch
    * is `insert` and already-known entities are always `update` —
    * replayed here as one existence join, no window, no per-entity
    * ordering (which also removes the old min-timestamp tie ambiguity).
    * `priorIds` carries the previous snapshot's ids in a `job_id`
    * column. No forced broadcast: a mature crawler store's id
    * population is unbounded, so the join strategy is AQE's call — it
    * broadcasts while the id set is dimension-sized and degrades to a
    * shuffled join instead of an OOM when it isn't.
    */
  def toCdcRecords(events: DataFrame, priorIds: DataFrame): DataFrame =
    events
      .join(priorIds.select(col("job_id").as("__prior_id")).distinct(),
        col("event_id") === col("__prior_id"), "left")
      .select(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"),
        col("event_id").as("job_id"),
        when(col("__prior_id").isNull, "insert").otherwise("update").as("action"),
        struct(col("event_type"), col("value")).as("data"),
        struct(lit("crawler").as("source"), lit("1.0").as("version")).as("metadata"))

  /** Recursively delete a work dir (idempotent re-runs of the CDC
    * append test need a fresh log).
    */
  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}
