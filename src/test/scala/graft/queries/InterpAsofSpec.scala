package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed semantics for q_w9_interp_asof (the value-exact DuckDB
  * oracle runs at sf0.01 via Verify; this pins the interpolation
  * algebra and the tie/extrapolation rules on a micro-case).
  */
class InterpAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) = Registry.all.find(_.name == name).get

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("interpolates between neighbors, extrapolates flat, skips userless series") {
    // user 1: views value 10 @ :00:00 and 20 @ :01:40 (100 s apart)
    //   purchase @ :00:25 -> 10 + (20-10)*25/100 = 12.5
    //   purchase @ :02:30 -> past the last view, flat 20
    //   duplicate-ts views (5 and 10 @ :00:00) dedup to max = 10
    // user 2: purchase with no views -> interp NULL (counted, not avgd)
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 5.0, "{}"),
      (2L, ts("2024-01-01 00:00:00"), 1L, "view", 10.0, "{}"),
      (3L, ts("2024-01-01 00:01:40"), 1L, "view", 20.0, "{}"),
      (4L, ts("2024-01-01 00:00:25"), 1L, "purchase", 0.0, "{}"),
      (5L, ts("2024-01-01 00:02:30"), 1L, "purchase", 0.0, "{}"),
      (6L, ts("2024-01-01 09:00:00"), 2L, "purchase", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("interp_asof").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q_w9_interp_asof").fn(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("day") == "2024-01-01")
    assert(r.getAs[Long]("n_purchases") == 3L)
    assert(r.getAs[Long]("n_interp") == 2L)
    assert(math.abs(r.getAs[Double]("avg_interp") - 16.25) < 1e-9)
  }

  test("a same-ts view is at-or-before: the purchase reads it exactly") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:10"), 1L, "view", 7.0, "{}"),
      (2L, ts("2024-01-01 00:00:10"), 1L, "purchase", 0.0, "{}"),
      (3L, ts("2024-01-01 00:00:20"), 1L, "view", 99.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("interp_tie").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("q_w9_interp_asof").fn(spark, dir).collect().head
    // prev = (t0=:10, v0=7), next = (t1=:20, v1=99): elapsed 0 of 10 s
    // -> interp is exactly v0
    assert(r.getAs[Long]("n_interp") == 1L)
    assert(math.abs(r.getAs[Double]("avg_interp") - 7.0) < 1e-9)
  }
}
