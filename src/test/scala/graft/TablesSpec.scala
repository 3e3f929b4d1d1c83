package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.normalizeTs` contract: the generator has shipped events.ts
  * as INT64 nanos (surfaced long) and as TIMESTAMP(MICROS) NTZ across
  * rounds; all encodings of the same instant must normalize to the
  * same UTC timestamp.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 2024-01-15 12:34:56.789012 UTC
  private val micros = 1705322096789012L

  test("nanos-as-long, NTZ micros, and UTC timestamp all normalize identically") {
    import spark.implicits._
    val fromLong = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("ts"))
    val fromTz = Tables.normalizeTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))
    val fromNtz = Tables.normalizeTs(
      Seq(micros).toDF("us")
        .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    val vals = Seq(fromLong, fromTz, fromNtz).map { df =>
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, df.schema.treeString)
      df.select(unix_micros(col("ts"))).first().getLong(0)
    }
    assert(vals.distinct == Seq(micros), vals.toString)
  }

  test("pre-1970 nanos floor-divide toward negative infinity (DuckDB parity)") {
    import spark.implicits._
    // -1 ns is inside microsecond -1 ([-1000 ns, 0)), not microsecond 0
    val out = Tables.normalizeTs(Seq(-1L).toDF("ts"))
      .select(unix_micros(col("ts"))).first().getLong(0)
    assert(out == -1L, s"expected -1 µs, got $out")
  }

  test("an unsupported ts type fails loudly") {
    import spark.implicits._
    val err = intercept[IllegalStateException] {
      Tables.normalizeTs(Seq("2024").toDF("ts"))
    }
    assert(err.getMessage.contains("unsupported events.ts type"))
  }
}
