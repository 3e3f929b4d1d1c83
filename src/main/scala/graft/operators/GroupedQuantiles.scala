package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles by two-level distributed histogram
  * selection — the scale-safe alternative to the
  * `row_number().over(Window.partitionBy(group))` order-statistic
  * query (q_a10), whose parallelism collapses to the number of groups:
  * with 5 priorities, one task sorts |orders|/5 rows however many
  * executors exist. Here no task ever holds more than a bounded slice:
  *
  *  - Pass A (`groupBy(group)`): per-group count / min / max. Hash
  *    aggregation with map-side partials — skew-safe.
  *  - Pass B (`groupBy(group, bucket)`): a B-bucket histogram of the
  *    value's position in the group's [min, max] range. The cumulative
  *    count per group then runs in a window over AT MOST B rows per
  *    group (a bounded constant, unlike the raw-row window), locating
  *    for each quantile the bucket containing its target rank
  *    ceil(q·n) and the residual rank within that bucket.
  *  - Pass C (`groupBy(group, q, bucket2)`): the same subdivision one
  *    level deeper, over only the rows of each quantile's selected
  *    bucket (~n/B rows per group, found by re-deriving the IDENTICAL
  *    bucket expression and filtering against the broadcast selection —
  *    no 100 TB intermediate is materialized). Buckets whose rows are
  *    all one value resolve immediately (this is what defuses the
  *    massive-tie pathology: a value cluster larger than any bucket
  *    always yields min==max sub-buckets).
  *  - Pass D: the residual order statistic over the ~n/B² rows of the
  *    selected sub-bucket, via a window whose partitions are that
  *    small by construction (only for (group, q) pairs not already
  *    resolved in pass C).
  *
  * Bucketing is done on the DOUBLE image of the value, which is
  * order-preserving (weakly monotone), and every pass derives bucket
  * ids from the same closed-form expression, so assignment is
  * consistent across passes; the returned values are original-typed
  * column values, never interpolations — the result is the exact
  * nearest-rank order statistic, bit-identical to the sort-based
  * definition (oracle-checked against DuckDB's explicit row_number
  * formulation in q_a10b).
  *
  * Cost shape at scale: three column-pruned scans of the input (full,
  * ~n/B, ~n/B²), two full-size shuffles (passes A and B — both
  * partial-aggregated), two bounded-window stages, two broadcast
  * joins of selection maps (G·|qs| rows; AQE degrades them to shuffle
  * joins if the group count is huge). Nulls in the value column are
  * excluded, matching SQL order-statistic semantics.
  *
  * ref: sql/views.sql percentile analyses (reference computes
  * quantiles per category over the jobs fact at single-node scale).
  */
object GroupedQuantiles {

  private val B = 1024

  /** Exact nearest-rank quantiles per group.
    *
    * @param qs (outputColumn, quantile) pairs, e.g. ("p50", 0.5)
    * @return one row per group: (groupCol, qs._1*) with original value type
    */
  def exactQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 })
    val rows = df.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
    val vd = col("__v").cast("double")

    // Pass A: per-group stats
    val stats = rows.groupBy("__g").agg(
      count(lit(1)).as("__n"), min("__v").as("__vmin"), max("__v").as("__vmax"))

    // (group, q, target rank); degenerate single-value groups answer now
    val qlit = qs.map { case (nm, q) => struct(lit(nm).as("__q"), lit(q).as("__qf")) }
    val qspec = stats
      .select(col("__g"), col("__n"), col("__vmin"), col("__vmax"),
        explode(array(qlit: _*)).as("__qs"))
      .select(col("__g"), col("__n"), col("__vmin"), col("__vmax"),
        col("__qs.__q").as("__q"),
        ceil(col("__qs.__qf") * col("__n")).cast("long").as("__r"))
      // tiny (G·|qs| rows); checkpointed ONCE so that BOTH the live
      // branch (three pass consumers) and the degenerate branch reuse
      // pass A — degenerate previously hung off the raw stats agg and
      // re-ran the full pass-A scan at final assembly
      .localCheckpoint(false)
    val degenerate = qspec.filter(col("__vmin") === col("__vmax"))
      .select(col("__g"), col("__q"), col("__vmin").as("__val"))
    val live = qspec.filter(col("__vmin") =!= col("__vmax"))
      .select("__g", "__q", "__r", "__vmin", "__vmax")

    // identical closed-form position/bucket expressions in every pass
    def posOf(lo: Column, hi: Column): Column = (vd - lo) / (hi - lo) * lit(B)
    def b1Of(lo: Column, hi: Column): Column =
      least(lit(B - 1), greatest(lit(0), floor(posOf(lo, hi)).cast("int")))
    def b2Of(lo: Column, hi: Column): Column =
      least(lit(B - 1), greatest(lit(0),
        floor((posOf(lo, hi) - b1Of(lo, hi)) * lit(B)).cast("int")))

    // Pass B: level-1 histogram; group ranges attach via the stats join
    // (AQE broadcasts the G-row side when it can)
    val groupRange = live.select("__g", "__vmin", "__vmax").distinct()
    val h1 = rows.join(groupRange, "__g")
      .groupBy(col("__g"),
        b1Of(col("__vmin").cast("double"), col("__vmax").cast("double")).as("__b1"))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy("__g").orderBy("__b1")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum1 = h1.withColumn("__cum", sum("__c").over(cumW))
    val sel1 = cum1.join(live, "__g")
      .filter(col("__cum") - col("__c") < col("__r") && col("__r") <= col("__cum"))
      .select(col("__g"), col("__q"), col("__b1"),
        (col("__r") - (col("__cum") - col("__c"))).as("__r1"),
        col("__vmin"), col("__vmax"))
      .localCheckpoint(false) // tiny (G·|qs| rows), consumed twice

    // Pass C: level-2 histogram inside each selected bucket only
    val lo = col("__vmin").cast("double")
    val hi = col("__vmax").cast("double")
    val inSel1 = rows.join(sel1, Seq("__g")).filter(b1Of(lo, hi) === col("__b1"))
    val h2 = inSel1
      .groupBy(col("__g"), col("__q"), b2Of(lo, hi).as("__b2"))
      .agg(count(lit(1)).as("__c"), min("__v").as("__bmin"), max("__v").as("__bmax"))
    val cumW2 = Window.partitionBy("__g", "__q").orderBy("__b2")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum2 = h2.withColumn("__cum", sum("__c").over(cumW2))
    val sel2 = cum2.join(
        sel1.select("__g", "__q", "__b1", "__r1", "__vmin", "__vmax"), Seq("__g", "__q"))
      .filter(col("__cum") - col("__c") < col("__r1") && col("__r1") <= col("__cum"))
      .select(col("__g"), col("__q"), col("__b1"), col("__b2"),
        (col("__r1") - (col("__cum") - col("__c"))).as("__r2"),
        col("__bmin"), col("__bmax"), col("__vmin"), col("__vmax"))
      .localCheckpoint(false)
    val resolved = sel2.filter(col("__bmin") === col("__bmax"))
      .select(col("__g"), col("__q"), col("__bmin").as("__val"))

    // Pass D: residual order statistic over ~n/B² rows per (group, q).
    // The candidate filter MUST constrain BOTH bucket levels: __b2 is
    // an index WITHIN the selected level-1 bucket, and rows of other
    // level-1 buckets reuse the same level-2 indices — filtering on
    // __b2 alone admits them and corrupts the residual rank (surfaced
    // at sf0.1, where pass C first left sub-buckets unresolved).
    val open = sel2.filter(col("__bmin") =!= col("__bmax"))
      .select("__g", "__q", "__b1", "__b2", "__r2", "__vmin", "__vmax")
    val rankW = Window.partitionBy("__g", "__q").orderBy("__v")
    val fromSort = rows.join(open, Seq("__g"))
      .filter(b1Of(lo, hi) === col("__b1") && b2Of(lo, hi) === col("__b2"))
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") === col("__r2"))
      .select(col("__g"), col("__q"), col("__v").as("__val"))

    // pivot the per-(group, q) answers wide, one column per quantile
    degenerate.unionByName(resolved).unionByName(fromSort)
      .groupBy(col("__g").as(groupCol))
      .agg(
        qs.head match { case (nm, _) => max(when(col("__q") === nm, col("__val"))).as(nm) },
        qs.tail.map { case (nm, _) => max(when(col("__q") === nm, col("__val"))).as(nm) }: _*)
  }
}
