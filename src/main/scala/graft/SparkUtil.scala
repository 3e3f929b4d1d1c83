package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One place for session construction so every entrypoint (Verify,
  * Bench, Scratch, tests) runs with identical semantics-relevant conf.
  *
  * Scale notes (100 TB target): these knobs are the local[32] stand-ins
  * for cluster conf — shuffle partitions sized to cores here, to
  * 2-3× total executor cores on a real cluster; AQE handles runtime
  * coalescing and skew splitting either way; dynamic partition
  * overwrite enables incremental month rewrites of the fact table
  * without clobbering sibling partitions (SURVEY §4).
  */
object SparkUtil {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // events.parquet stores INT64 TIMESTAMP(NANOS); Spark's vectorized
      // reader rejects it unless nanos are surfaced as long. Set once,
      // session-wide, so scan behavior is not order-dependent (ADVICE r1).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed tables (co-located joins) land here instead of ./spark-warehouse
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      // Spark 4.1 turned on checksum generation+verification for every
      // streaming-checkpoint file (ChecksumCheckpointFileManager, a
      // thread pool per write). For ephemeral local checkpoints the
      // corruption-detection buys nothing and its pool stalls showed up
      // as multi-second per-batch overhead in the stateful operators
      // (q_st2/q_st3). Durable production checkpoints on object stores
      // can re-enable it per query.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // TypedImperativeAggregate aggregations (CollectUpTo in the
      // dedup cap) run on ObjectHashAggregateExec, whose default
      // fallback-to-sort threshold is 128 DISTINCT GROUPS — a
      // vocabulary-sized groupBy would sort every exploded partition.
      // The cap bounds each group's buffer, so a large in-memory group
      // count is safe; 1M groups × small buffers ≈ tens of MB per
      // task, and the sort fallback still engages past that.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)

  /** Fixed default core count so Bench/Verify numbers are comparable
    * across machines (ADVICE r2); override via SPARK_GRAFT_CPUS.
    */
  val DefaultCpus = 32

  private def envCpus: Option[Int] = sys.env.get("SPARK_GRAFT_CPUS").map { v =>
    try v.toInt
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_CPUS must be an integer, got '$v'")
    }
  }

  /** Widen a narrow input (e.g. a single small parquet file → 1-2 scan
    * partitions) to cluster parallelism before per-row-heavy work,
    * WITHOUT executing the plan — pure metadata. The previous
    * `df.rdd.getNumPartitions` check was a hidden execution: under AQE,
    * `Dataset.rdd` materializes every non-final query stage, so a plan
    * with an upstream shuffle ran in full at build time and the
    * downstream lazy checkpoint then re-executed it — the e2e staging
    * chain was computed TWICE per build.
    *
    * Parallelism is estimated per leaf file relation as
    * max(file count, total bytes / maxPartitionBytes) summed across
    * leaves: one LARGE splittable parquet file scans as many partitions
    * (the byte term sees that — a bare file count would fire a useless
    * full-data repartition on it), while many small files keep the file
    * count as the floor. Non-file-backed frames (checkpoint scans,
    * synthesized ranges) report no leaves and take the repartition — a
    * single bounded shuffle before the heavy map work, never a
    * re-execution. A real 100 TB scan has thousands of files/splits and
    * is left untouched.
    */
  def widenByFiles(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = math.max(1L,
      spark.sessionState.conf.filesMaxPartitionBytes)
    val plan = df.queryExecution.analyzed
    // Catalog (Hive) tables and DSv2 scans expose no file metadata
    // here; they'd estimate 0 splits and eat a full repartition on an
    // arbitrarily large table. Treat them as "unknown, assume wide" —
    // the widening premise (a known-small local input) can't hold.
    val hasOpaqueRelation = plan.exists {
      case _: org.apache.spark.sql.catalyst.catalog.HiveTableRelation => true
      case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
      case _ => false
    }
    if (hasOpaqueRelation) return df
    val estSplits = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            val loc = fs.location
            math.max(loc.inputFiles.length.toLong,
              (loc.sizeInBytes + maxSplit - 1) / maxSplit)
          case _ => 0L
        }
    }.sum
    if (estSplits < target) df.repartition(target) else df
  }

  /** Shuffle-partition count for STREAMING queries (state-store
    * partitioning). Batch queries get AQE coalescing, but structured
    * streaming runs with AQE off and pins the stateful-operator
    * partition count at first batch — so every stateful op otherwise
    * commits `spark.sql.shuffle.partitions` (= cores) state-store
    * deltas per micro-batch. These streams carry KB-scale bounded
    * state; 32-way state files are pure per-batch I/O floor (guide
    * §2.2: fewer, larger partitions). Parameterised for scale:
    * SPARK_GRAFT_STREAM_SHUFFLE overrides (a production deployment
    * sizes this to state volume / aggregate write throughput, e.g.
    * 2-3x executor cores when per-batch state is GBs); the local
    * default min(8, cores) stays fixed across the driver's core
    * counts (8 at both 32 and 16 cores), keeping the bench's scaling
    * measurement comparable. Partitioning never changes results:
    * every stateful operator here is key-hashed and order-insensitive.
    */
  def streamShufflePartitions(spark: SparkSession): Int =
    sys.env.get("SPARK_GRAFT_STREAM_SHUFFLE").map(_.toInt).getOrElse(
      math.min(8, spark.sparkContext.defaultParallelism))

  def local(cpus: Int = envCpus.getOrElse(DefaultCpus)): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The StableId offsets pass runs a cumulative-sum window over a
    // ≤#partitions-row frame — intentionally unpartitioned. Silence the
    // per-use warning; data-side window properties are enforced by
    // PlanSpec/StableIdSpec instead of log eyeballing.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
