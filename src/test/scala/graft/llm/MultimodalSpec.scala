package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Header construct→parse roundtrip and the dimension-range guard
  * (lpad would silently TRUNCATE an over-long hex string into a
  * corrupt header, so out-of-range must fail loudly instead).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("png/gif header roundtrip recovers the encoded dimensions") {
    val df = Seq((641, 479, "body"), (1, 1, ""), (65535, 65535, "x"))
      .toDF("w", "h", "body")
    val png = df.select(Multimodal.decodeImage(
      Multimodal.pngPayload(col("w"), col("h"), col("body"))).as("img"), col("w"), col("h"))
      .select("img.width", "img.height", "img.format", "w", "h").collect()
    png.foreach { r =>
      assert(r.getAs[String]("format") == "png")
      assert(r.getAs[Int]("width") == r.getAs[Int]("w"))
      assert(r.getAs[Int]("height") == r.getAs[Int]("h"))
    }
    val gif = df.select(Multimodal.decodeImage(
      Multimodal.gifPayload(col("w"), col("h"), col("body"))).as("img"), col("w"), col("h"))
      .select("img.width", "img.height", "img.format", "w", "h").collect()
    gif.foreach { r =>
      assert(r.getAs[String]("format") == "gif")
      assert(r.getAs[Int]("width") == r.getAs[Int]("w"))
      assert(r.getAs[Int]("height") == r.getAs[Int]("h"))
    }
  }

  test("gif payload rejects dimensions beyond the 2-byte range") {
    val bad = Seq((70000, 10, "b")).toDF("w", "h", "body")
    val e = intercept[Exception] {
      bad.select(Multimodal.gifPayload(col("w"), col("h"), col("body"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("out of range")))
  }

  test("non-image payloads fall back to the documented stub") {
    val r = Seq("plain text").toDF("t")
      .select(Multimodal.decodeImage(Multimodal.asPayload(col("t"))).as("img"))
      .select("img.format").as[String].collect()
    assert(r.sameElements(Array("stub/raw")))
  }
}
