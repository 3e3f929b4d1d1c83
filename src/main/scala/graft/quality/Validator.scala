package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality report (SURVEY A5, J10, D14) — the etl_validator suite
  * (/root/reference/src/utils/etl_validator.py:19-233) re-expressed as
  * one Dataset of (check_name, value) rows: duplicate current keys,
  * orphaned foreign keys (left_anti counts), null criticals, inverted
  * ranges, future timestamps, missing calendar days.
  *
  * Each check is a small aggregate; the union is one job. At scale the
  * orphan checks are the expensive legs (anti-joins against dims) —
  * dims broadcast, so they stay map-side.
  */
object Validator {

  def check(name: String, df: DataFrame, valueCol: Column): DataFrame =
    df.agg(valueCol.cast("long").as("value")).select(lit(name).as("check_name"), col("value"))

  /** One-pass column profile: for every column, its null count, exact
    * distinct count, and min/max rendered as strings — the
    * data-profiling sweep a warehouse runs after each load. ONE
    * aggregation over the table computes every column's stats
    * simultaneously (3·|cols|+1 aggregate expressions, partial-
    * aggregated map-side); the unpivot to a row per column happens on
    * the 1-row result, so a 100 TB table is scanned exactly once.
    * Min/max compare in the column's native type, then render via
    * cast — so numeric columns profile numerically, not
    * lexicographically.
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** Count of natural keys with more than one current row (A5). */
  def duplicateCurrentKeys(dim: DataFrame, naturalKey: String): DataFrame =
    check("duplicate_current_keys",
      dim.filter(col("is_current")).groupBy(naturalKey).count().filter(col("count") > 1),
      count(lit(1)))

  /** Facts referencing a missing dimension row (J10). */
  def orphanCount(name: String, fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    check(name, fact.join(broadcast(dim.select(key).distinct()), Seq(key), "left_anti"),
      count(lit(1)))

  /** Rows with a NULL in any critical column (A5). */
  def nullCriticals(name: String, df: DataFrame, criticalCols: Seq[String]): DataFrame =
    check(name, df.filter(criticalCols.map(col(_).isNull).reduce(_ || _)), count(lit(1)))

  /** salary_min > salary_max style inversions (A5). */
  def invertedRange(name: String, df: DataFrame, lo: String, hi: String): DataFrame =
    check(name, df.filter(col(lo) > col(hi)), count(lit(1)))

  /** Timestamps after the as-of instant (A5). */
  def futureTimestamps(name: String, df: DataFrame, tsCol: String, asOf: String): DataFrame =
    check(name, df.filter(col(tsCol) > lit(asOf).cast("timestamp")), count(lit(1)))

  /** Calendar days missing between min and max of a date column (A5). */
  def missingDays(name: String, df: DataFrame, dateCol: String): DataFrame =
    check(name,
      df.agg(
        (datediff(max(to_date(col(dateCol))), min(to_date(col(dateCol)))) + 1 -
          countDistinct(to_date(col(dateCol)))).as("missing")),
      max(col("missing")))

  /** D14: processed/source ratio gate (≥ threshold). */
  def integrityRatio(source: DataFrame, processed: DataFrame): DataFrame = {
    val s = source.agg(count(lit(1)).as("n_source"))
    val p = processed.agg(count(lit(1)).as("n_processed"))
    s.crossJoin(p).select(
      col("n_source"), col("n_processed"),
      round(col("n_processed").cast("double") / col("n_source"), 4).as("ratio"))
  }

  /** Assemble a full report from individual check DataFrames. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _).orderBy("check_name")
}
