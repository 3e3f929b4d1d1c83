package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("vec_dot is bit-identical to the aggregate/zip_with form") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val rows = df.select(
      VectorExprs.dotCol(col("a"), col("b")).as("native"),
      hof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("null array, length mismatch, and null element all yield null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(1.0)))),         // length mismatch
      (None, Some(Seq(Some(1.0)))),                                    // null array
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))))   // null element
      .toDF("a", "b")
    val out = df.select(VectorExprs.dotCol(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)), out.mkString(","))
  }

  test("vec_cosine equals dot/(norm·norm) and survives SQL registration") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT vec_cosine(a, b) AS c FROM vecs").head().getDouble(0)
    val expected = 1.0 / (math.sqrt(2.0) * math.sqrt(2.0))
    assert(java.lang.Double.doubleToLongBits(viaSql) ==
      java.lang.Double.doubleToLongBits(expected))
    // dot via SQL too
    val d = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").head().getDouble(0)
    assert(d == 1.0)
  }
}
