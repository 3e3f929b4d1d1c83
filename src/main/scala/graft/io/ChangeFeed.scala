package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level change data feed derived from a [[TableLog]] history —
  * the Delta CDF idea WITHOUT stored change files: any version range's
  * changes are reconstructable from the log because data files are
  * immutable. The net file delta over (fromV, toV] (adds and removes
  * with in-range churn cancelled, same netting rule as
  * [[TableLog.squashMerge]]) gives a removed-rows side R and an
  * added-rows side A; a single keyed full-outer join classifies:
  *
  *   - key only in A                    → insert
  *   - key only in R                    → delete
  *   - both, any payload column differs → update_preimage (R values)
  *                                        + update_postimage (A values)
  *   - both, payload identical          → no change (the row was merely
  *     carried through a rewrite — compaction must emit NOTHING)
  *
  * Scale notes: reads only the net-delta files, never the table; the
  * one shuffle is the keyed join of those files; the update fan-out to
  * pre/post rows is a generated-column explode, not a second join.
  * At 100 TB the delta of a version range is what changed, so CDF cost
  * tracks churn, not table size.
  */
object ChangeFeed {

  /** Net (adds, removes) over the half-open version range (fromV, toV]:
    * a file added then removed inside the range never existed for a
    * range reader, and a file removed then re-added cancels to no-op.
    */
  def netDelta(
      commits: Seq[TableLog.Commit], fromV: Int, toV: Int): (Seq[String], Seq[String]) = {
    val adds = scala.collection.mutable.LinkedHashSet.empty[String]
    val removes = scala.collection.mutable.LinkedHashSet.empty[String]
    commits.filter(c => c.version > fromV && c.version <= toV).foreach { c =>
      c.adds.foreach { f =>
        if (removes.contains(f)) removes -= f else adds += f
      }
      c.removes.foreach { f =>
        if (adds.contains(f)) adds -= f else removes += f
      }
    }
    (adds.toSeq, removes.toSeq)
  }

  /** The change rows of (fromV, toV]: the base table's columns plus a
    * leading `change_type` column. `key` must be unique per version
    * (the table's merge key).
    */
  def changes(
      spark: SparkSession, logDir: String, fromV: Int, toV: Int,
      key: String): DataFrame = {
    val commits = TableLog.readCommits(spark, logDir)
    val (addFiles, removeFiles) = netDelta(commits, fromV, toV)
    val template = spark.read.parquet((addFiles ++ removeFiles): _*).limit(0)
    def side(files: Seq[String]): DataFrame =
      if (files.isEmpty) template else spark.read.parquet(files: _*)
    val a = side(addFiles).as("a")
    val r = side(removeFiles).as("r")
    val cols = template.columns.toSeq
    val payload = cols.filterNot(_ == key)
    val joined = r.join(a, col(s"r.$key") === col(s"a.$key"), "full_outer")
    val changed: Column = payload
      .map(c => !(col(s"r.$c") <=> col(s"a.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def img(side: String, ct: String) = struct(
      lit(ct).as("change_type") +: cols.map(c => col(s"$side.$c").as(c)): _*)
    val imgType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(
          "change_type", org.apache.spark.sql.types.StringType, nullable = true)
          +: template.schema.fields))
    val kinds = when(col(s"r.$key").isNull, array(img("a", "insert")))
      .when(col(s"a.$key").isNull, array(img("r", "delete")))
      .when(changed, array(img("r", "update_preimage"), img("a", "update_postimage")))
      .otherwise(array().cast(imgType))
    joined.select(explode(kinds).as("ch")).select("ch.*")
  }
}
