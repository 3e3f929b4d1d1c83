package graft

import org.apache.spark.sql.SparkSession

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

  def local(cpus: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
              .getOrElse(Runtime.getRuntime.availableProcessors())): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
