package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): assign every event to a
  * session, where a new session starts when the gap to the key's
  * previous event exceeds `gapSec`.
  *
  * The streaming twin is `session_window` (q_st3); this is the batch
  * backfill shape every event pipeline also needs (reprocessing
  * historical days, building training labels). Plan: ONE hash shuffle
  * on the key, then lag + a running sum inside the per-key sort — both
  * windows share the same (partition, ordering), so Catalyst plans a
  * single Exchange + single Sort. No group ever materializes as an
  * array and nothing is collected, so a hot key costs one task's sort,
  * not driver memory.
  *
  * Scale note: parallelism is bounded by key cardinality (user count),
  * which for event data is the natural high-cardinality dimension —
  * the opposite of q_a10's low-cardinality caveat.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session number) to `df`.
    *
    * The ordering inside a key is (ts, tiebreak...) and must be total —
    * equal-timestamp events otherwise make the lag, and therefore the
    * session boundaries, partition-layout luck.
    */
  def sessionize(
      df: DataFrame, keys: Seq[String], tsCol: String, gapSec: Long,
      tiebreak: Seq[Column] = Nil): DataFrame = {
    val ord = col(tsCol) +: tiebreak
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val gap = col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long")
    df.withColumn("__new_session",
        when(gap.isNull || gap > gapSec, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }
}
