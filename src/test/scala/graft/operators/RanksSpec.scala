package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RanksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("doubled average ranks equal min+max row_number positions, incl. ties") {
    import spark.implicits._
    val df = Seq(10, 20, 20, 20, 30, 30, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val viaCounts = Ranks.doubledAvgRank(df, "v", "r2")
      .select("id", "r2").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("v"), col("id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(w))
      .withColumn("r2",
        (min(col("rn")).over(Window.partitionBy("v"))
          + max(col("rn")).over(Window.partitionBy("v"))).cast("long"))
      .select("id", "r2").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCounts == viaWindow, s"$viaCounts vs $viaWindow")
    // spot values: the 20-tie occupies positions 2..4 → doubled avg 6
    assert(viaCounts(1L) == 6L && viaCounts(2L) == 6L && viaCounts(3L) == 6L)
  }

  test("NULL values are excluded explicitly and do not shift other ranks") {
    import spark.implicits._
    val df = Seq((1L, Some(10)), (2L, None), (3L, Some(20)))
      .toDF("id", "v")
    val out = Ranks.doubledAvgRank(df, "v", "r2")
      .select("id", "r2").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the NULL row is absent; 10 ranks 1 (doubled 2), 20 ranks 2 (doubled 4)
    assert(out == Map(1L -> 2L, 3L -> 4L), out.toString)
  }
}
