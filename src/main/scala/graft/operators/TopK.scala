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

  /** Map-combine grouped top-k: the 100 TB form of `groupedTopK` for
    * the common "k best ids per key by a numeric score" case. The
    * window form above shuffles EVERY row and sorts whole groups; this
    * one aggregates with a k-capped buffer (functions/TopKByScore), so
    * at most k rows per key per map partition cross the shuffle and no
    * sort exceeds k elements — exact (top-k under the total order
    * (score desc, id asc) is partition-order independent), hot-key
    * safe, and it keeps AQE in an ordinary aggregate exchange.
    *
    * Semantics deltas vs the window form, stated plainly: rows with a
    * NULL score or id are not ranked (the window form ranks NULL
    * scores last), so a key whose rows are ALL null-scored is absent
    * from this output while the window form emits it; and score/id are
    * coerced to double/long — callers with non-numeric ids should use
    * `groupedTopK`. On null-free numeric frames the two are
    * row-identical (spec-pinned across partition layouts).
    *
    * Output: keys, `id`, `score`, 1-based `rank`.
    */
  def groupedTopKAgg(
      df: DataFrame, keys: Seq[String], scoreCol: String, idCol: String,
      k: Int, rankCol: String = "rank"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.TopKByScore(
        col(scoreCol).cast("double"), col(idCol).cast("long"), k).as("__topk"))
      .select((keys.map(col) :+ posexplode(col("__topk"))): _*)
      .select((keys.map(col) :+
        (col("pos") + 1).cast("int").as(rankCol) :+
        col("col.id").as(idCol) :+
        col("col.score").as(scoreCol)): _*)
}
