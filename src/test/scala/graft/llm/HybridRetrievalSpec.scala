package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rrfFuse ranks a both-lists candidate above single-list ones; ties break on id") {
    import spark.implicits._
    // cand 7 is rank 2 in both lists: 2/(60+2) beats any single 1/(60+1)
    val dense = Seq((1L, 5L, 1), (1L, 7L, 2), (1L, 9L, 3)).toDF("query_id", "neighbor_id", "rank")
    val sparse = Seq((1L, 6L, 1), (1L, 7L, 2), (1L, 8L, 3)).toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFuse(dense, sparse, kRrf = 60, topN = 5).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(out.head == (1L, 7L), s"both-lists candidate must fuse first, got ${out.toList}")
    // 5 and 6 share score 1/61: the tie must break on neighbor id
    assert(out(1) == (2L, 5L) && out(2) == (3L, 6L))
    // single-list rank-3 entries (8, 9) share 1/63 and follow, id order
    assert(out(3) == (4L, 8L) && out(4) == (5L, 9L))
  }

  test("bm25PerQuery equals the fixed-bag bm25 when the bag matches (up to rounding)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join merge"),
      (2L, "join merge sort sort"),
      (3L, "spark spark filter"),
      (4L, "filter scan scan scan"))
      .toDF("doc_id", "text")
    val probeTerms = Seq((99L, "spark"), (99L, "merge")).toDF("query_id", "term")
    val perQuery = Retrieval
      .bm25PerQuery(docs, "doc_id", "text", probeTerms, k1 = 1.2, b = 0.75)
      .collect().map(r => r.getAs[Long]("cand_id") ->
        r.getAs[java.math.BigDecimal]("score").doubleValue()).toMap
    val fixed = Retrieval
      .bm25(docs, "doc_id", "text", Seq("spark", "merge"), k1 = 1.2, b = 0.75, topN = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(perQuery.keySet == fixed.keySet)
    fixed.foreach { case (id, s) =>
      assert(math.abs(perQuery(id) - s) < 1e-6, s"doc $id: ${perQuery(id)} vs $s")
    }
  }
}
