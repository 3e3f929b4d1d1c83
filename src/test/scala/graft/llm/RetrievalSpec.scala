package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark spark join"), // 'spark' frequent here, rare elsewhere
      (2L, "join merge sort"),
      (3L, "join merge merge"),
      (4L, "sort sort sort join"))
      .toDF("doc_id", "text")
  }

  test("tfidf ranks a doc's distinctive term first, common terms last") {
    val top = Retrieval.tfidfTopK(corpus, "doc_id", "text", k = 3)
      .filter("doc_id = 1 AND rank = 1").collect()
    // 'spark' (df=1, tf=2) must beat 'join' (df=4 → idf ln(5/5)=0)
    assert(top.length == 1 && top(0).getAs[String]("term") == "spark")
    // ubiquitous 'join' scores exactly 0 = tf·ln(1)
    val join = Retrieval.tfidfTopK(corpus, "doc_id", "text", k = 3)
      .filter("doc_id = 1 AND term = 'join'").collect()
    assert(join.length == 1 && join(0).getAs[Double]("score") == 0.0)
  }

  test("bm25 ranks the term-dense short doc above longer ones; absent terms score 0") {
    val out = Retrieval.bm25(corpus, "doc_id", "text",
        terms = Seq("merge"), k1 = 1.2, b = 0.75, topN = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 3 has tf=2 → top; docs 1 and 4 (no 'merge') score 0.0
    assert(out.head._1 == 3L, out.mkString(","))
    assert(out.filter(o => o._1 == 1L || o._1 == 4L).forall(_._2 == 0.0))
  }

  test("inverted index: df counts docs, postings ascending and capped") {
    val byTerm = Retrieval.invertedIndex(corpus, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byTerm("join") == (4L, "1,2")) // df=4, capped to first 2 ids
    assert(byTerm("spark") == (1L, "1"))
    assert(byTerm("merge") == (2L, "2,3"))
  }
}
