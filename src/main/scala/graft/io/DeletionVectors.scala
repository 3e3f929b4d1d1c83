package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletes via deletion vectors (the Delta/Iceberg v2
  * "position delete" shape).
  *
  * q_l83's delete propagation REWRITES every shard a deleted doc
  * touches — correct, but at 100 TB a GDPR batch touching 1% of files
  * rewrites 1 TB to remove kilobytes. The merge-on-read alternative:
  * the base files never move; each delete batch appends a tiny
  * sidecar of (file, row_index) positions, and readers subtract those
  * positions at scan time. Writes cost |deleted rows|, reads cost one
  * anti-join against a sidecar that is orders of magnitude smaller
  * than the table, and compaction (rewriting a file for real) is
  * deferred until a file's deleted fraction makes it worth it.
  *
  * Row positions come from the parquet reader's `_metadata.row_index`
  * hidden column — stable for a given physical file by the parquet
  * spec (row order within a file is fixed), which is exactly the
  * stability contract Delta deletion vectors rely on.
  *
  * Reference semantics: crawler job expiry/removal marks rows dead
  * without rewriting history (src/crawler/db_writer.py upsert path);
  * the DV form is the lake-native equivalent.
  */
object DeletionVectors {

  /** The internal position-key column names. Base tables may not use
    * them: build's output select and readWithDv's join key would
    * silently bind to the DATA column instead of the synthesized
    * metadata one, corrupting the subtraction. Checked up front so a
    * colliding table fails loudly instead.
    */
  private val Reserved = Seq("__file", "__pos", "file", "row_index")
  private def guardSchema(df: DataFrame, basePath: String): DataFrame = {
    val clash = df.columns.toSet.intersect(Reserved.toSet)
    require(clash.isEmpty,
      s"base table $basePath has reserved DV column name(s) ${clash.mkString(", ")}; " +
        "rename them before using deletion vectors")
    df
  }

  /** True if `dvDir` holds at least one DV parquet file. A stream
    * whose every micro-batch was empty may leave the directory
    * missing or schema-less (empty partitions emit no part files);
    * readers then fall back to the bare base scan.
    */
  private def hasDv(spark: SparkSession, dvDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dvDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next().getPath.getName
        found = f.endsWith(".parquet") && !f.startsWith("_") && !f.startsWith(".")
      }
      found
    }
  }

  /** Positions of base rows matching `pred`, as a (file, row_index)
    * deletion vector. One distributed scan; output is |matches| rows.
    * The predicate sees every data column of the base table.
    */
  def build(spark: SparkSession, basePath: String, pred: Column): DataFrame =
    guardSchema(spark.read.parquet(basePath), basePath)
      .select(col("*"), col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("row_index"))
      .filter(pred)
      .select("file", "row_index")

  /** Append one delete batch as its own sidecar dir (idempotent:
    * delete-first overwrite of that batch dir only — a replayed batch
    * lands byte-identical, the q_st8 sink contract).
    */
  def writeBatch(dv: DataFrame, dvDir: String, batchId: Int): Unit =
    dv.write.mode("overwrite").parquet(s"$dvDir/batch=$batchId")

  /** Merge-on-read scan: base rows minus every accumulated DV
    * position. The DV side is |deletes| rows (distinct — overlapping
    * batches may delete the same position twice), broadcast into an
    * anti-join against the base scan, so the read path adds no
    * shuffle of table data. If DVs ever outgrow the broadcast
    * threshold Spark falls back to a shuffled anti-join on
    * (file, row_index), which co-partitions fine — but a table whose
    * DVs are that large is past its compaction threshold anyway.
    */
  def readWithDv(spark: SparkSession, basePath: String, dvDir: String): DataFrame = {
    val raw = guardSchema(spark.read.parquet(basePath), basePath)
    if (!hasDv(spark, dvDir)) return raw // no deletes yet: bare base scan
    val base = raw
      .select(col("*"), col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__pos"))
    val dv = spark.read.parquet(dvDir)
      .select(col("file").as("__file"), col("row_index").as("__pos"))
      .distinct()
    base.join(broadcast(dv), Seq("__file", "__pos"), "left_anti")
      .drop("__file", "__pos")
  }

  /** Compaction plan: per-file live/deleted counts from ONE manifest
    * pass (|files| result rows), split at `threshold` deleted
    * fraction. Files above it are worth rewriting; the rest keep
    * riding their DVs.
    */
  def compactionPlan(spark: SparkSession, basePath: String, dvDir: String,
      threshold: Double): DataFrame = {
    val perFile = spark.read.parquet(basePath)
      .select(col("_metadata.file_path").as("file"))
      .groupBy("file").agg(count(lit(1)).as("n_rows"))
    val deleted = spark.read.parquet(dvDir)
      .select("file", "row_index").distinct()
      .groupBy("file").agg(count(lit(1)).as("n_deleted"))
    perFile.join(deleted, Seq("file"), "left")
      .withColumn("n_deleted", coalesce(col("n_deleted"), lit(0L)))
      .withColumn("rewrite", col("n_deleted") / col("n_rows") >= threshold)
  }

  /** Copy-on-write escalation for the hot files: rewrite ONLY the
    * files the plan marks (DV already applied) into `compactDir`,
    * leaving every cold file untouched on disk. Returns the cold
    * file list — the table is thereafter (cold files + compactDir)
    * with the residual DV restricted to cold files. Cost is
    * |rows in rewritten files|, never the table.
    */
  def compact(spark: SparkSession, basePath: String, dvDir: String,
      compactDir: String, threshold: Double): Seq[String] = {
    val plan = compactionPlan(spark, basePath, dvDir, threshold)
      .select("file", "rewrite").collect() // |files| rows: planner metadata
    val hot = plan.filter(_.getBoolean(1)).map(_.getString(0))
    val cold = plan.filterNot(_.getBoolean(1)).map(_.getString(0)).toSeq.sorted
    if (hot.nonEmpty) {
      val dv = spark.read.parquet(dvDir)
        .select(col("file").as("__file"), col("row_index").as("__pos"))
        .distinct()
      spark.read.parquet(hot.toSeq: _*)
        .select(col("*"), col("_metadata.file_path").as("__file"),
          col("_metadata.row_index").as("__pos"))
        .join(broadcast(dv), Seq("__file", "__pos"), "left_anti")
        .drop("__file", "__pos")
        .write.mode("overwrite").parquet(compactDir)
    } else {
      spark.read.parquet(basePath).limit(0)
        .write.mode("overwrite").parquet(compactDir)
    }
    cold
  }
}
