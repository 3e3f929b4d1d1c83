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

  def groupedTopK(df: DataFrame, keys: Seq[String], ordering: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .withColumnRenamed("__rank", "rank")
  }
}
