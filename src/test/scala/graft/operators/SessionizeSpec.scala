package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gap > gapSec opens a new session; boundary gap == gapSec does not") {
    import spark.implicits._
    // user u: events at 0s, 100s, 2000s (gap 1900 > 1800 → new session),
    // 3800s (gap exactly 1800 → SAME session), lone user v
    val df = Seq(
      ("u", 0L), ("u", 100L), ("u", 2000L), ("u", 3800L),
      ("v", 50L))
      .toDF("user", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Sessionize.sessionize(df, Seq("user"), "ts", gapSec = 1800,
        tiebreak = Seq(col("sec")))
      .select("user", "sec", "session_seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      ("u", 0L, 1L), ("u", 100L, 1L), ("u", 2000L, 2L), ("u", 3800L, 2L),
      ("v", 50L, 1L)), out.toString)
  }

  test("equal timestamps are ordered by the tiebreak, not partition luck") {
    import spark.implicits._
    val df = Seq(("u", 0L, 1L), ("u", 0L, 2L), ("u", 5000L, 3L))
      .toDF("user", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Sessionize.sessionize(df, Seq("user"), "ts", gapSec = 1800,
        tiebreak = Seq(col("event_id")))
      .select("event_id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 2L)), out.toString)
  }
}
