package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ContractChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every check fires on a deliberately dirty corpus") {
    import spark.implicits._
    // the gate's zeros on clean data don't prove detection; this does
    val dirty = Seq(
      (1L, "alpha beta", "en", 10L), // clean (n_chars matches)
      (2L, "   ", "en", 3L), // empty after trim
      (3L, "gamma", "en", 99L), // n_chars drift (5 actual)
      (3L, "delta", "en", 5L), // duplicate doc_id
      (4L, "alpha beta", "fr", 10L), // duplicate text + non-primary lang
      (5L, "short", "en", 5L)) // short (< 150)
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = Corpus.contractChecks(dirty, shortBelow = 150, primaryLang = "en")
      .collect().map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_violations"), r.getAs[Long]("n_checked"))).toMap
    assert(out.values.forall(_._2 == 6L))
    assert(out("empty_text")._1 == 1L)
    assert(out("chars_mismatch")._1 == 1L, "only doc 3 first row drifts") // '   ' has len 3 == n_chars
    assert(out("dup_doc_id")._1 == 1L, "6 rows, 5 distinct ids")
    assert(out("dup_text")._1 == 1L, "'alpha beta' appears twice")
    assert(out("non_primary_lang")._1 == 1L)
    assert(out("short_text")._1 == 6L, "all fixture docs are short")
  }
}
