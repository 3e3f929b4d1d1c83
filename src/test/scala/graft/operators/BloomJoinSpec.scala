package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bloom semi-join equals the plain semi-join (no false negatives survive)") {
    import spark.implicits._
    val fact = (1L to 1000L).toDF("k")
    val dim = Seq(3L, 500L, 999L, 999L).toDF("d") // dup in dim must not dup output
    val out = BloomJoin.semiJoin(fact, "k", dim, "d", mBits = 256, k = 3)
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(3L, 500L, 999L), out.mkString(","))
  }

  test("mixed INT dim / BIGINT fact key types still produce zero false negatives") {
    import spark.implicits._
    val fact = (1L to 200L).toDF("k") // BIGINT
    val dim = Seq(3, 50, 199).toDF("d") // INT — hashes as BIGINT via the coercion
    val out = BloomJoin.semiJoin(fact, "k", dim, "d", mBits = 256, k = 3)
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(3L, 50L, 199L), out.mkString(","))
  }

  test("non-integral keys are rejected loudly, not silently mishashed") {
    import spark.implicits._
    val fact = Seq("a", "b").toDF("k")
    val dim = Seq("a").toDF("d")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(fact, "k", dim, "d")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("bitmap is one row of m/64 or fewer words and the filter prunes most rows") {
    import spark.implicits._
    val dim = (1L to 10L).toDF("d")
    val bm = BloomJoin.bloomBitmap(dim, "d", mBits = 1024, k = 3)
      .collect()
    assert(bm.length == 1)
    val words = bm(0).getMap[Int, Long](0)
    assert(words.size <= 16, s"${words.size} words > m/64") // 1024 bits = 16 words max
    // a disjoint fact range should be mostly bloom-pruned BEFORE the
    // exact join: spot-check via the composed operator staying correct
    val fact = (100000L to 101000L).toDF("k")
    assert(BloomJoin.semiJoin(fact, "k", dim, "d", mBits = 1024, k = 3).count() == 0)
  }
}
