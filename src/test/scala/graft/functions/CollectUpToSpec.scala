package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CollectUpToSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("collects every value for groups at or under the limit") {
    val df = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (2L, 22L), (3L, 30L))
      .toDF("k", "v")
    val got = df.groupBy("k")
      .agg(CollectUpTo(col("v"), 3).as("vs"))
      .select(col("k"), array_sort(col("vs")).as("vs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == Map(1L -> Seq(10L, 11L), 2L -> Seq(20L, 21L, 22L), 3L -> Seq(30L)))
  }

  test("hard-caps the buffer for over-limit groups") {
    val df = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "v")
      .repartition(8) // force partial buffers + merges across partitions
    val n = df.groupBy("k").agg(CollectUpTo(col("v"), 7).as("vs"))
      .select(size(col("vs"))).as[Int].head()
    assert(n == 7)
  }

  test("registers as a SQL function through the extension point") {
    graft.GraftExtensions.register(spark)
    Seq((1L, 5L), (1L, 6L), (1L, 7L)).toDF("k", "v").createOrReplaceTempView("cut_in")
    val got = spark.sql(
      "SELECT k, size(collect_up_to(v, 2)) AS n FROM cut_in GROUP BY k")
      .as[(Long, Int)].head()
    assert(got == ((1L, 2)))
  }

  test("count-filter contract: surviving groups have provably complete arrays") {
    // the cappedKeyed pattern: collect with limit cap+1, filter count<=cap
    val cap = 5
    val df = (1 to 200).flatMap { g =>
      (1 to (g % 9 + 1)).map(i => (g.toLong, (g * 100 + i).toLong))
    }.toDF("k", "v").repartition(8)
    val kept = df.groupBy("k")
      .agg(count(lit(1)).as("n"), CollectUpTo(col("v"), cap + 1).as("vs"))
      .filter(col("n") <= cap)
    val bad = kept.filter(size(col("vs")) =!= col("n")).count()
    assert(bad == 0L)
    // and over-cap groups were genuinely dropped, not truncated-in
    val keptGroups = kept.select("k").as[Long].collect().toSet
    assert(keptGroups == (1 to 200).filter(g => g % 9 + 1 <= cap).map(_.toLong).toSet)
  }
}
