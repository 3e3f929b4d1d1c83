package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GroupedQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sort-based nearest-rank reference: the q_a10 window formulation. */
  private def reference(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Double)] = {
    val w = Window.partitionBy("g").orderBy(col("v"))
    val wn = Window.partitionBy("g")
    df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("g")
      .agg(
        max(when(col("rn") === ceil(lit(0.5) * col("n")).cast("long"), col("v"))).as("p50"),
        max(when(col("rn") === ceil(lit(0.9) * col("n")).cast("long"), col("v"))).as("p90"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  private def run(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Double)] =
    GroupedQuantiles.exactQuantiles(df, "g", "v", Seq("p50" -> 0.5, "p90" -> 0.9))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("matches the sort-based order statistic on skewed random groups") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      val g = s"g${i % 7}"
      // heavy-tailed values, some negative, dupes common
      (g, math.floor(math.pow(rnd.nextDouble(), 3) * 1000 - 100) / 4)
    }
    val df = rows.toDF("g", "v").repartition(16)
    assert(run(df) == reference(df))
  }

  test("massive tie cluster resolves without a big sort partition") {
    // half of one group is a single repeated value spanning the median
    val rows = (1 to 5000).map(i => ("g0", 42.0)) ++
      (1 to 2500).map(i => ("g0", i.toDouble)) ++
      (1 to 2500).map(i => ("g0", 10000.0 + i)) ++
      (1 to 100).map(i => ("g1", i.toDouble))
    val df = rows.toDF("g", "v").repartition(16)
    assert(run(df) == reference(df))
  }

  test("pass D constrains both bucket levels (cross-bucket b2 collision)") {
    // sentinels pin [vmin, vmax] = [0, 1024], so pos == v: every
    // level-1 bucket m then holds 7 distinct values inside its OWN
    // b2=512 sub-cell (offsets ~1e-9 ≪ the 1/1024² cell width). Pass C
    // can never resolve (bmin ≠ bmax) and every level-1 bucket shares
    // the same level-2 index — the residual sort must rank only the
    // selected (b1, b2) cell's rows, not every b2=512 row of the
    // group (the sf0.1 q_a32/q_a40 regression).
    val rows = (0 until 1024).flatMap(m =>
      (0 until 7).map(k => ("g0", m + 0.5 + k * 1e-9))) ++
      Seq(("g0", 0.0), ("g0", 1024.0))
    val df = rows.toDF("g", "v").repartition(16)
    assert(run(df) == reference(df))
  }

  test("single-value and tiny groups answer directly") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 1.0), ("c", 2.0), ("c", 9.0))
      .toDF("g", "v")
    assert(run(df) == reference(df))
  }
}
