package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("grouped top-k keeps k per key with deterministic tie-break ranks") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 5.0),
      ("b", 9L, 1.0))
      .toDF("grp", "id", "score")
    val out = TopK.groupedTopK(df, Seq("grp"), Seq(col("score").desc, col("id")), 2)
      .select("grp", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // ties at 30.0 break on id: 2 before 3; id 4 falls outside k=2
    assert(out == Set(("a", 2L, 1), ("a", 3L, 2), ("b", 9L, 1)), out.toString)
  }
}
