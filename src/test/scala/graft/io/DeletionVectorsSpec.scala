package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DeletionVectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Tmp = "/root/repo/target/tmp/dvspec"

  private def writeBase(): Unit = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, s"g${i % 4}", i * 3 % 17))
      .toDF("id", "grp", "v")
      .repartition(5, col("id"))
      .write.mode("overwrite").parquet(s"$Tmp/base")
  }

  test("merge-on-read equals row-wise delete; overlapping batches dedupe; base untouched") {
    import spark.implicits._
    writeBase()
    val baseFiles = spark.read.parquet(s"$Tmp/base")
      .select(input_file_name()).distinct().as[String].collect().sorted
    val dv1 = DeletionVectors.build(spark, s"$Tmp/base", col("id") % 10 === 0)
    DeletionVectors.writeBatch(dv1, s"$Tmp/dv", 1)
    // batch 2 overlaps batch 1 on id % 30 == 0 — positions repeat
    val dv2 = DeletionVectors.build(spark, s"$Tmp/base", col("id") % 15 === 0)
    DeletionVectors.writeBatch(dv2, s"$Tmp/dv", 2)
    val live = DeletionVectors.readWithDv(spark, s"$Tmp/base", s"$Tmp/dv")
    val expect = (0L until 1000L).filterNot(i => i % 10 == 0 || i % 15 == 0)
    val got = live.select("id").as[Long].collect().sorted
    assert(got.toSeq == expect, s"live set wrong: ${got.length} vs ${expect.length}")
    // merge-on-read must never touch the base files
    val after = spark.read.parquet(s"$Tmp/base")
      .select(input_file_name()).distinct().as[String].collect().sorted
    assert(after.toSeq == baseFiles.toSeq, "base files changed under merge-on-read")
  }

  test("replayed delete batch is a no-op (idempotent sidecar overwrite)") {
    import spark.implicits._
    writeBase()
    val dv = DeletionVectors.build(spark, s"$Tmp/base", col("id") < 100)
    DeletionVectors.writeBatch(dv, s"$Tmp/dv_replay", 1)
    val once = DeletionVectors.readWithDv(spark, s"$Tmp/base", s"$Tmp/dv_replay")
      .count()
    DeletionVectors.writeBatch(dv, s"$Tmp/dv_replay", 1) // retry lands again
    val twice = DeletionVectors.readWithDv(spark, s"$Tmp/base", s"$Tmp/dv_replay")
      .count()
    assert(once == 900L && twice == 900L)
  }

  test("compaction rewrites ONLY hot files; cold files + residual DV unchanged") {
    import spark.implicits._
    // skewed deletes: all ids in [0, 200) — under repartition(5, id)
    // each file holds ~20% of them, so make the skew explicit instead:
    // delete by grp so entire groups (25% of every file) die, then
    // push ONE file over the threshold by deleting its ids directly
    writeBase()
    val firstFile = spark.read.parquet(s"$Tmp/base")
      .select(col("_metadata.file_path").as("f"), col("id"))
    val hotIds = firstFile.filter(
        col("f") === firstFile.select(min("f")).as[String].head())
      .select("id").as[Long].collect().toSeq
    // delete 60% of the lexicographically-first file, 2% of the rest
    val dv = DeletionVectors.build(spark, s"$Tmp/base",
      (col("id").isin(hotIds.take(hotIds.length * 6 / 10): _*)) ||
        col("id") % 50 === 0)
    DeletionVectors.writeBatch(dv, s"$Tmp/dv_c", 1)
    val before = DeletionVectors.readWithDv(spark, s"$Tmp/base", s"$Tmp/dv_c")
      .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
    val plan = DeletionVectors.compactionPlan(spark, s"$Tmp/base", s"$Tmp/dv_c", 0.3)
      .collect()
    assert(plan.count(_.getAs[Boolean]("rewrite")) == 1,
      plan.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).mkString(","))
    val cold = DeletionVectors.compact(spark, s"$Tmp/base", s"$Tmp/dv_c",
      s"$Tmp/compacted", 0.3)
    assert(cold.length == 4, s"expected 4 cold files, got ${cold.length}")
    // post-compaction table: cold files (with residual DV) + compacted
    val coldLive = spark.read.parquet(cold: _*)
      .select(col("*"), col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__pos"))
      .join(spark.read.parquet(s"$Tmp/dv_c")
        .select(col("file").as("__file"), col("row_index").as("__pos")).distinct(),
        Seq("__file", "__pos"), "left_anti")
      .drop("__file", "__pos")
    val after = coldLive.unionByName(spark.read.parquet(s"$Tmp/compacted"))
      .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
    assert(after == before, s"compaction changed the table: $after vs $before")
  }
}
