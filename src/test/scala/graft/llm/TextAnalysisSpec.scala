package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetition signals match hand-computed values on planted docs") {
    val docs = Seq(
      // 4 lines, one duplicated → dup_line 1/4; bigrams: "a b","b a",
      // "a b" x2 span lines? no — tokens cross lines via \s+:
      // tokens = a b b a a b c → bigrams: "a b","b b","b a","a a","a b","b c"
      // 6 bigrams, 5 distinct → dup2 = 1/6
      ("looper", "a b\nb a\na b\nc"),
      // all lines distinct, all bigrams distinct
      ("clean", "x y\nz w"),
      // fewer than two tokens → no bigrams, no dup
      ("tiny", "x"),
      ("empty", "")
    ).toDF("doc_id", "text")
    val got = docs.select(
        col("doc_id"),
        TextAnalysis.dupLineFraction(col("text")).as("dupl"),
        TextAnalysis.dupBigramFraction(col("text")).as("dup2"),
        size(TextAnalysis.wordBigrams(col("text"))).as("n2"))
      .as[(String, Double, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("looper")._1 == 0.25)
    assert(math.abs(got("looper")._2 - 1.0 / 6) < 1e-9)
    assert(got("looper")._3 == 6)
    assert(got("clean") == ((0.0, 0.0, 3))) // "x y","y z","z w"
    assert(got("tiny") == ((0.0, 0.0, 0)))
    assert(got("empty") == ((0.0, 0.0, 0)))
  }

  test("unicodeNormalize: NFC composition, control strip, whitespace squeeze") {
    val f = TextAnalysis.unicodeNormalizeImpl _
    assert(f(null) == null)
    assert(f("a  b\t\nc") == "a b c")
    assert(f("  padded  ") == "padded")
    assert(f("x\u0007y\u0000z") == "xyz") // BEL + NUL stripped, no space left
    assert(f("e\u0301") == "\u00e9") // decomposed composes to one codepoint
    assert(f("e\u0301").length == 1)
    assert(f("\u00e9") == "\u00e9") // already-NFC input is a fixpoint
    assert(f("a\u000bb") == "ab") // VT is in the stripped control class
    assert(f("word1   word2") == "word1 word2")
  }
}
