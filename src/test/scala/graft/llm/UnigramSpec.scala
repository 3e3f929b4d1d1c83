package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("viterbi picks the min-cost segmentation") {
    // ab: a|b costs 1+2=3, ab costs 2 -> ab wins outright
    val seg = Unigram.viterbi("ab", Map("a" -> 1L, "b" -> 2L, "ab" -> 2L), 4)
    assert(seg == Seq("ab"))
    // cheap singles beat an expensive merged piece
    val seg2 = Unigram.viterbi("ab", Map("a" -> 1L, "b" -> 1L, "ab" -> 3L), 4)
    assert(seg2 == Seq("a", "b"))
  }

  test("viterbi ties break on the lexicographically smaller delimited seg") {
    // a|b = 1+1 = 2 ties ab = 2; '|ab' < '|a|b' ('b' < '|' in ASCII)
    val seg = Unigram.viterbi("ab", Map("a" -> 1L, "b" -> 1L, "ab" -> 2L), 4)
    assert(seg == Seq("ab"))
  }

  test("viterbi respects the max piece length") {
    // 'abcd' priced as one piece, but maxPieceLen=2 forbids using it
    val cost = Map("abcd" -> 1L, "ab" -> 5L, "cd" -> 5L,
      "a" -> 9L, "b" -> 9L, "c" -> 9L, "d" -> 9L)
    assert(Unigram.viterbi("abcd", cost, 4) == Seq("abcd"))
    assert(Unigram.viterbi("abcd", cost, 2) == Seq("ab", "cd"))
  }

  test("one hard-EM round reproduces the hand-computed vocabulary") {
    import spark.implicits._
    // words: ab freq 2, b freq 1. chars: a=2, b=3; the only 2-gram is
    // ab=2. Seed vocab {a:2, b:3, ab:2}, T=7, V=3; micro-nat costs
    // round(-ln((c+1)/10)*1e6): a=1203973, b=916291, ab=1203973.
    // Viterbi: 'ab' -> [ab] (1203973 < a|b's 2120264); 'b' -> [b].
    // E-counts: ab=2, b=1, a=0; prune keeps ceil(3/4 * 1)=1 multi.
    // Final T=3, V=3: cost(ab)=round(-ln(3/6)*1e6)=693147,
    // cost(b)=round(-ln(2/6)*1e6)=1098612, cost(a)=round(-ln(1/6)*1e6)
    // =1791759.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val out = Unigram.train(docs, "text",
        maxWordLen = 8, maxPieceLen = 2, seedMultis = 1, rounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("ab", 2L, 693147L), ("b", 1L, 1098612L), ("a", 0L, 1791759L)))
  }

  test("tokenCounts reports whitespace vs unigram piece totals") {
    import spark.implicits._
    // train on "abc abc c" (1 round, pieces ≤ 2, 2 seed multis):
    // seed {a:2,b:2,c:3,ab:2,bc:2}; 'abc' Viterbi ties ab|c vs a|bc on
    // cost and the seg tie-break picks '|ab|c'. Final counts
    // {a:0,b:0,c:3,ab:2,bc:0}, T=5 V=5 → final costs make 'abc'
    // segment ab|c again (2 pieces), 'c' → 1 piece.
    // ws = 3 tokens; unigram = 2+2+1 = 5 pieces.
    val docs = Seq(("s", "abc abc c")).toDF("source", "text")
    val out = Unigram.tokenCounts(docs, "text", "source",
        maxWordLen = 8, maxPieceLen = 2, seedMultis = 2, rounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("s", 3L, 5L)))
  }

  test("single-char pieces survive pruning and words stay segmentable") {
    import spark.implicits._
    val docs = Seq((1L, "xyz xy yz x zzz")).toDF("doc_id", "text")
    val out = Unigram.train(docs, "text",
        maxWordLen = 8, maxPieceLen = 3, seedMultis = 4, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // every observed character is still in the final inventory
    assert(Set("x", "y", "z").subsetOf(out.keySet))
    // expected counts are conserved: total pieces cover total chars only
    // if segmentation stayed total for every word (no crash = total)
    assert(out.values.forall(_ >= 0L))
  }
}
