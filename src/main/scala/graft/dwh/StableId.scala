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
  * `orderCols`) with no single-partition stage:
  *
  *   1. range-repartition on the order columns (the same shuffle a
  *      global sort would do — partitions are contiguous key ranges);
  *   2. per-partition row counts → cumulative offsets. This is a tiny
  *      aggregate (one row per partition) and its scan reuses the
  *      step-1 shuffle output (ReusedExchange), so data moves once;
  *   3. id = base + offset(partition) + row_number within the
  *      partition — a *partitioned* window, fully parallel.
  *
  * Because partitions are ranges of the same total order, the result
  * equals the global row_number regardless of where the sampled range
  * boundaries fall; ties across a boundary still number consistently
  * (earlier range first — tie order inside a window is arbitrary in the
  * global-window formulation too). Determinism across re-runs holds
  * when `orderCols` is a (near-)unique ordering, same as the reference's
  * requirement on its sequences (etl_utils.py:364-433).
  */
object StableId {

  def assign(df: DataFrame, orderCols: Seq[Column], idCol: String, base: Long): DataFrame = {
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    // offsets: ≤ #partitions rows — the Window.orderBy here is over that
    // tiny frame, not the data
    val offsets = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__pid"))) - col("__n"), lit(0L)))
      .select(col("__pid"), col("__offset"))
    parted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idCol,
        (lit(base) + col("__offset") +
          row_number().over(Window.partitionBy(col("__pid")).orderBy(orderCols: _*)))
          .cast("long"))
      .drop("__pid", "__offset")
  }
}
