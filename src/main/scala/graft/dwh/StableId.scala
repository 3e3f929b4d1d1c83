package graft.dwh

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed stable surrogate-key assignment (SURVEY §7.4(1)).
  *
  * The naive `row_number().over(Window.orderBy(...))` funnels the whole
  * table through ONE task — fine for a dimension batch, fatal for a
  * fact table at the 100 TB design point. This assigner produces the
  * exact same dense ids (`base+1 .. base+N` in the total order of
  * `orderCols`) with no single-partition stage and exactly one shuffle
  * of the data:
  *
  *   1. range-repartition on the order columns + sort within each
  *      partition, then `localCheckpoint()` — the checkpoint
  *      materializes the partitions, so the sampled range boundaries
  *      and the row order are PINNED: every downstream consumer reads
  *      the same physical rows. (This is the fix for the
  *      exchange-reuse hazard: without it, the offsets aggregate and
  *      the data side could re-sample range boundaries independently
  *      and disagree on partition ids.)
  *   2. per-partition row counts → cumulative offsets. One row per
  *      partition; the cumulative-sum window runs over that tiny frame,
  *      not the data.
  *   3. id = base + offset(partition) + position-within-partition. The
  *      position comes from `monotonically_increasing_id()` (partition
  *      id in the upper bits, record index in the lower 33) on the
  *      checkpointed, sorted partitions — no window over the data, so
  *      no second exchange.
  *
  * Because partitions are contiguous ranges of the same total order,
  * the result equals the global row_number regardless of where the
  * boundaries fall; ties across a boundary still number consistently
  * (earlier range first — tie order inside a window is arbitrary in the
  * global-window formulation too). Determinism across re-runs holds
  * when `orderCols` is a (near-)unique ordering, same as the reference's
  * requirement on its sequences (etl_utils.py:364-433).
  *
  * Scale note: `localCheckpoint` persists to executor memory/disk —
  * the same storage cost as the shuffle it pins. On a cluster with
  * preemptible executors, swap for a reliable `checkpoint()` dir; the
  * id semantics are unchanged.
  */
object StableId {

  private val PidCol = "__sid_pid"
  private val MidCol = "__sid_mid"
  private val OffCol = "__sid_offset"

  private def requireClean(df: DataFrame, idCol: String): Unit = {
    require(!df.columns.contains(idCol),
      s"StableId.assign: input already has a '$idCol' column")
    Seq(PidCol, MidCol, OffCol).foreach(h =>
      require(!df.columns.contains(h), s"StableId.assign: reserved helper column '$h' present"))
  }

  /** Number a frame whose partitions are contiguous ranges of the id
    * order with rows sorted inside each: checkpoint (lazy — pins
    * boundaries + row order at first materialization; every consumer,
    * including the offsets aggregate riding the broadcast, reads the
    * same physical rows), then base + cumulative-offset + local
    * position.
    */
  private def numberArranged(arranged: DataFrame, idCol: String, base: Long): DataFrame = {
    val parted = arranged
      .localCheckpoint(false)
      .withColumn(PidCol, spark_partition_id())
      .withColumn(MidCol, monotonically_increasing_id())
    // offsets: ≤ #partitions rows — the Window.orderBy here is over that
    // tiny frame, not the data
    val offsets = parted.groupBy(col(PidCol)).agg(count(lit(1)).as("__n"))
      .withColumn(OffCol,
        coalesce(sum(col("__n")).over(Window.orderBy(col(PidCol))) - col("__n"), lit(0L)))
      .select(col(PidCol), col(OffCol))
    parted.join(broadcast(offsets), Seq(PidCol))
      .withColumn(idCol,
        // monotonically_increasing_id = (pid << 33) + 0-based record
        // index within the partition; subtract the pid part to recover
        // the local position in the checkpointed sort order
        (lit(base) + col(OffCol) +
          (col(MidCol) - shiftleft(col(PidCol).cast("long"), 33)) + lit(1L))
          .cast("long"))
      .drop(PidCol, MidCol, OffCol)
  }

  def assign(df: DataFrame, orderCols: Seq[Column], idCol: String, base: Long): DataFrame = {
    requireClean(df, idCol)
    numberArranged(
      df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*),
      idCol, base)
  }

  /** `assign` for inputs that are ALREADY range-partitioned and sorted
    * in the id order (e.g. a dedup window that just shuffled on the
    * same keys) — skips the repartition+sort, so the caller's exchange
    * and the id assignment are ONE data shuffle instead of two. The
    * caller owns the invariant: partitions must be contiguous key
    * ranges with rows sorted inside (a `repartitionByRange` +
    * `sortWithinPartitions` upstream, with only order-preserving
    * narrow ops — filter/project — in between).
    */
  def assignPrearranged(df: DataFrame, idCol: String, base: Long): DataFrame = {
    requireClean(df, idCol)
    numberArranged(df, idCol, base)
  }

  /** Assign ids continuing after `max(existing(existingIdCol))` (or
    * `defaultBase` when `existing` is empty) — the incremental-batch
    * form of the reference's sequences. The max rides a broadcast 1-row
    * aggregate; no driver collect.
    */
  def assignAfterMax(
      df: DataFrame, orderCols: Seq[Column], idCol: String,
      existing: DataFrame, existingIdCol: String, defaultBase: Long): DataFrame = {
    val baseDf = existing.agg(
      coalesce(max(col(existingIdCol)).cast("long"), lit(defaultBase)).as("__sid_base"))
    assign(df, orderCols, idCol, 0L)
      .crossJoin(broadcast(baseDf))
      .withColumn(idCol, (col(idCol) + col("__sid_base")).cast("long"))
      .drop("__sid_base")
  }
}
