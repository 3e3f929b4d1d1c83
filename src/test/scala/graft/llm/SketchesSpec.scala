package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("count-min never undercounts and is near-exact at small vocabulary") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(trim(col("text")))).as("tok"))
    val cells = Sketches.buildTokenSketch(toks, "tok").localCheckpoint(false)
    // sketch is bounded by construction: at most depth * width cells
    assert(cells.count() <= Sketches.Depth.toLong * Sketches.Width)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.estimate(exact, "tok", cells)
    // CM invariant: estimates NEVER undercount, for every token
    assert(est.filter(col("cm_est") < col("exact_n")).count() == 0L)
    // and the error bound is useful, not vacuous: the mean overcount
    // stays within the classic 2N/width envelope
    val n = toks.count()
    val meanOver = est.agg(avg(col("cm_est") - col("exact_n"))).head().getDouble(0)
    assert(meanOver <= 2.0 * n / Sketches.Width, s"mean overcount $meanOver vs bound")
  }

  test("linear counting bitmap bounds and tracks distinct counts") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g" + i % 3, "v" + i % (200 * (i % 3 + 1))))
      .toDF("g", "v")
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n")).as[(String, Long)]
      .collect().toMap
    val bits = Sketches.linearCountBits(df, "g", "v").as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      val b = bits(g)
      // bits can only collide downward, never exceed distinct values
      assert(b <= n && b <= Sketches.LinearCountBits)
      // and the linear-counting estimate recovers the cardinality well
      // at this load factor (n/m < 0.15 → error ~ 1-2%)
      val m = Sketches.LinearCountBits.toDouble
      val est = m * math.log(m / (m - b))
      assert(math.abs(est - n) / n < 0.1, s"g=$g est=$est n=$n")
    }
  }
}
