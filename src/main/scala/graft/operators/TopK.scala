package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped top-k: the per-key "top N per group" operator.
  *
  * A GLOBAL top-k plans as TakeOrderedAndProject (per-partition heaps,
  * no shuffle of the losers — q_w2). The grouped variant has no such
  * physical operator, so the scale-safe shape is one hash shuffle on
  * the keys and a rank window inside each group: per-partition sort,
  * no group ever materializes as an array, no driver collect. The
  * ordering must be total (break ties explicitly) or survivors are
  * partition-layout luck — same determinism rule the dedup windows
  * follow.
  */
object TopK {

  /** @param rankCol output column carrying the 1-based rank; the input
    *   must not already have a column of that name (an unconditional
    *   rename would emit duplicate columns and poison downstream
    *   resolution) — pick another name via the parameter instead.
    */
  def groupedTopK(
      df: DataFrame, keys: Seq[String], ordering: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column; pass rankCol= a free name")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .withColumnRenamed("__rank", rankCol)
  }
}
