package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("learns the hand-computed merge sequence on a tiny corpus") {
    import spark.implicits._
    // word freqs: low=3, lower=2, lowest=1
    val docs = Seq((1L, "low low low lower lower lowest")).toDF("doc_id", "text")
    val rows = Bpe.train(docs, "text", merges = 3).orderBy("step").collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"),
        r.getAs[Long]("pair_count"), r.getAs[Long]("n_sym")))
    // round 1: (l,o)=6 and (o,w)=6 tie -> lexicographic picks (l,o);
    // 3*3 + 2*5 + 1*6 = 25 weighted symbols, merge removes 6 -> 19
    assert(rows(0) == ("l", "o", 6L, 19L), s"got ${rows(0)}")
    // round 2: (lo,w)=6 wins; 19 - 6 = 13
    assert(rows(1) == ("lo", "w", 6L, 13L), s"got ${rows(1)}")
    // round 3: (low,e)=3 beats (e,r)=2,(e,s)=1,(s,t)=1; 13 - 3 = 10
    assert(rows(2) == ("low", "e", 3L, 10L), s"got ${rows(2)}")
  }

  test("counts overlapping pairs and merges leftmost-greedily") {
    import spark.implicits._
    // 'aaa': pair (a,a) counted twice per word (overlap), but the
    // merge rewrites greedily to [aa, a] - never [aaa]
    val docs = Seq((1L, "aaa aaa ab")).toDF("doc_id", "text")
    val rows = Bpe.train(docs, "text", merges = 1).collect()
    val r = rows(0)
    assert(r.getAs[String]("sym_a") == "a" && r.getAs[String]("sym_b") == "a")
    assert(r.getAs[Long]("pair_count") == 4L, "two overlapping pairs per 'aaa' word")
    // after merge: aaa -> [aa, a] (2 syms) x2 words + ab -> [a, b] (2) = 6
    assert(r.getAs[Long]("n_sym") == 6L)
  }

  test("tokenCounts reports per-group whitespace vs BPE token totals") {
    import spark.implicits._
    // after 2 merges (lo, then low): low->1 sym, lower->3, lowest->4
    val docs = Seq(
      ("s1", "low low lower"), // 3 ws tokens -> 1+1+3 = 5 bpe
      ("s2", "lowest low")) // 2 ws tokens -> 4+1 = 5 bpe
      .toDF("source", "text")
    val out = Bpe.tokenCounts(docs, "text", "source", merges = 2)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))).toMap
    assert(out("s1") == ((3L, 5L)), s"got ${out("s1")}")
    assert(out("s2") == ((2L, 5L)), s"got ${out("s2")}")
  }
}
