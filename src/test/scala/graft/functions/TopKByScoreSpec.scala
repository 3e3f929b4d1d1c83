package graft.functions

import graft.TestSpark
import graft.operators.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKByScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aggregate top-k equals the window form on every partition layout") {
    import spark.implicits._
    // adversarial layouts: 1 partition, many tiny ones, and skewed
    val rows = (1L to 500L).map(i => ("g" + (i % 3), i, (i % 37).toDouble))
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.createDataset(rows).toDF("grp", "id", "score").repartition(parts)
      val viaWindow = TopK.groupedTopK(
          df, Seq("grp"), Seq(col("score").desc, col("id")), 5)
        .select("grp", "id", "score", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val viaAgg = TopK.groupedTopKAgg(df, Seq("grp"), "score", "id", 5)
        .select("grp", "id", "score", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      assert(viaAgg == viaWindow, s"parts=$parts")
    }
  }

  test("score ties break on the smaller id; buffers stay capped at k") {
    import spark.implicits._
    val df = Seq(("g", 9L, 1.0), ("g", 3L, 1.0), ("g", 7L, 1.0), ("g", 1L, 0.5))
      .toDF("grp", "id", "score")
    val out = TopK.groupedTopKAgg(df, Seq("grp"), "score", "id", 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 3L), (2, 7L)), out.mkString(","))
  }
}
