package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // two clearly separable vocabularies + one doc mixing both
  private def seed = {
    import spark.implicits._
    Seq(
      (1L, "good clean helpful good", 1),
      (2L, "good useful clean", 1),
      (3L, "spam junk noise spam", 0),
      (4L, "junk noise junk", 0))
      .toDF("doc_id", "text", "label")
  }

  test("NB separates seed vocabularies and scores unlabeled docs by evidence") {
    import spark.implicits._
    val model = Classifier.nbTrain(seed, "text", "label", buckets = 64)
    val prior = Classifier.nbPrior(seed, "label")
    // model never exceeds the bucket budget, whatever the corpus size
    assert(model.count() <= 64)

    val apply = Seq(
      (10L, "good clean good"), // pure positive vocabulary
      (11L, "spam junk noise"), // pure negative vocabulary
      (12L, "good spam")) // balanced evidence -> prior decides
      .toDF("doc_id", "text")
    val scored = Classifier
      .nbScore(apply, "doc_id", "text", model, prior, buckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("accept")).toMap
    assert(scored(10L), "positive-vocabulary doc must be accepted")
    assert(!scored(11L), "negative-vocabulary doc must be rejected")
  }

  test("weights are Laplace-smoothed LLRs on exact counts (hand-checked bucket)") {
    val model = Classifier.nbTrain(seed, "text", "label", buckets = 64)
    // 'good' appears 3x in class 1, 0x in class 0; totals: 7 pos / 7 neg tokens
    val goodBucket = seed.sparkSession.range(1)
      .select(Classifier.tokenBucket(lit("good"), 64).as("b"))
      .collect()(0).getLong(0)
    val w = model.filter(col("bucket") === goodBucket)
      .collect()(0).getAs[java.math.BigDecimal]("w").doubleValue()
    val expected = math.log((3 + 1.0) / (7 + 64.0)) - math.log((0 + 1.0) / (7 + 64.0))
    assert(math.abs(w - expected) < 1e-9, s"got $w expected $expected")
  }
}
