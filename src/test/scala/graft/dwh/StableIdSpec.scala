package graft.dwh

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StableIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("assign equals the global row_number numbering on unique keys") {
    val df = spark.range(0, 10000).select(
      (col("id") * 37 % 10007).as("k"), (col("id") % 5).as("payload"))
    val expected = df.withColumn("sk",
      (row_number().over(Window.orderBy(col("k"))) + 500L).cast("long"))
    val actual = StableId.assign(df, Seq(col("k")), "sk", 500L)
    assert(actual.count() === 10000L)
    assert(expected.exceptAll(actual).isEmpty && actual.exceptAll(expected).isEmpty)
  }

  test("ids are dense base+1..base+N and deterministic across runs") {
    val df = spark.range(0, 5000).select((col("id") * 13 % 4999).as("k"))
    val a = StableId.assign(df, Seq(col("k")), "sk", 0L)
    val b = StableId.assign(df, Seq(col("k")), "sk", 0L)
    val ids = a.agg(min("sk"), max("sk"), countDistinct("sk")).as[(Long, Long, Long)].head()
    assert(ids === ((1L, 5000L, 5000L)))
    assert(a.exceptAll(b).isEmpty)
  }

  test("no single-partition window stage in the physical plan") {
    val df = spark.range(0, 100).select(col("id").as("k"))
    val plan = StableId.assign(df, Seq(col("k")), "sk", 0L)
      .queryExecution.executedPlan.toString
    // the only Window.orderBy-without-partition is over the per-partition
    // count frame (≤ #partitions rows), never over the data: the data-side
    // window must be partitioned by __pid
    assert(plan.contains("windowspecdefinition(__pid"))
  }

  test("empty input yields empty output") {
    val df = spark.range(0).select(col("id").as("k"))
    assert(StableId.assign(df, Seq(col("k")), "sk", 0L).count() === 0L)
  }
}
