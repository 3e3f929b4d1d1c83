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

  test("non-image payloads surface as unknown with null dims (no fake features)") {
    val r = Seq("plain text").toDF("t")
      .select(Multimodal.decodeImage(Multimodal.asPayload(col("t"))).as("img"))
      .select("img.format", "img.width").collect()
    assert(r.head.getString(0) == "unknown" && r.head.isNullAt(1))
  }

  test("decodeImage recognizes JPEG payloads via the SOF marker walk") {
    val jpegs = Seq((3L, 123, 45), (9L, 8, 8)).toDF("seed", "w", "h")
      .select(Multimodal.decodeImage(
        graft.llm.Jpeg.jpegPixelPayload(col("seed"), col("w"), col("h"))).as("img"),
        col("w"), col("h"))
      .select("img.width", "img.height", "img.format", "w", "h").collect()
    jpegs.foreach { r =>
      assert(r.getAs[String]("format") == "jpeg")
      assert(r.getAs[Int]("width") == r.getAs[Int]("w"))
      assert(r.getAs[Int]("height") == r.getAs[Int]("h"))
    }
  }

  test("pixel codec round-trips every filter type bit-exactly") {
    // h >= 5 exercises filters None/Sub/Up/Average/Paeth; seeds near
    // the 256 wrap check the modular row values
    for (seed <- Seq(0L, 7L, 200L, 250L, 1000003L); w <- Seq(1, 2, 64); h <- Seq(1, 5, 48)) {
      val got = Multimodal.decodePngPixelsImpl(Multimodal.pngGrayImpl(seed, w, h))
      val expectSum = w.toLong * (0 until h).map(y => (seed + y) % 256).sum
      assert(got.contains((w, h, w.toLong * h, expectSum)), s"seed=$seed w=$w h=$h got=$got")
    }
  }

  test("pixel decode is a REAL decoder: javax.imageio reads our PNGs identically") {
    // cross-validate against the JDK's independent PNG implementation
    for (seed <- Seq(3L, 123L, 254L)) {
      val bytes = Multimodal.pngGrayImpl(seed, 17, 11)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 17 && img.getHeight == 11)
      val raster = img.getRaster
      var sum = 0L
      for (y <- 0 until 11; x <- 0 until 17) sum += raster.getSample(x, y, 0)
      assert(Multimodal.decodePngPixelsImpl(bytes).map(_._4).contains(sum))
    }
  }

  test("thumbnail resample matches the closed form and per-pixel NN sampling") {
    // rows hold (seed+y)%256, so an 8×8 NN thumb sums 8·Σ_ty (seed+⌊ty·h/8⌋)%256;
    // w/h both below and above the 8-grid exercise repeat and skip sampling
    for (seed <- Seq(0L, 7L, 250L); w <- Seq(3, 8, 64); h <- Seq(2, 8, 48)) {
      val got = Multimodal.decodePngThumbImpl(Multimodal.pngGrayImpl(seed, w, h), 8, 8)
      val expect = 8L * (0 until 8).map(ty => (seed + ty.toLong * h / 8) % 256).sum
      assert(got.contains(expect), s"seed=$seed w=$w h=$h got=$got expect=$expect")
    }
    // undecodable → None, not zero
    assert(Multimodal.decodePngThumbImpl("junk".getBytes, 8, 8).isEmpty)
  }

  test("brightness histogram counts every pixel into its bucket") {
    for (seed <- Seq(0L, 100L, 250L); h <- Seq(5, 48)) {
      val w = 7
      val got = Multimodal.decodePngHistImpl(Multimodal.pngGrayImpl(seed, w, h), 4)
      val expect = Array.fill(4)(0L)
      (0 until h).foreach(y => expect((((seed + y) % 256) / 64).toInt) += w.toLong)
      assert(got.exists(_.sameElements(expect)),
        s"seed=$seed h=$h got=${got.map(_.mkString(","))} expect=${expect.mkString(",")}")
    }
    assert(Multimodal.decodePngHistImpl("junk".getBytes, 4).isEmpty)
  }

  test("pixel decode nulls out corrupt, truncated, and foreign payloads") {
    val good = Multimodal.pngGrayImpl(42L, 8, 8)
    // flip one IDAT byte: CRC check must reject it
    val corrupt = good.clone(); corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 1).toByte
    assert(Multimodal.decodePngPixelsImpl(corrupt).isEmpty)
    assert(Multimodal.decodePngPixelsImpl(good.take(good.length - 30)).isEmpty)
    assert(Multimodal.decodePngPixelsImpl("not a png at all, just text".getBytes).isEmpty)
    assert(Multimodal.decodePngPixelsImpl(null).isEmpty)
  }

  test("dHash matches the closed form and is brightness-shift invariant") {
    // fixture rows hold (seed%256 + y) % 256, so the expected hash is
    // the vertical row-comparison bits at the 8-grid NN sample rows
    def expected(seed: Long, h: Int): Long = {
      val a = (seed % 256).toInt
      val rv = (0 until 8).map(ty => (a + ty * h / 8) % 256)
      (0 until 7).foldLeft(0L) { (acc, ty) =>
        if (rv(ty + 1) > rv(ty))
          acc | (0xFFL << (8 * ty))
        else acc
      }
    }
    for (seed <- Seq(0L, 3L, 77L, 250L); (w, h) <- Seq((17, 11), (5, 48), (64, 3))) {
      val got = Multimodal.decodePngDHashImpl(Multimodal.pngGrayImpl(seed, w, h))
      assert(got.contains(expected(seed, h)), s"seed=$seed w=$w h=$h")
    }
    // same gradients at different base brightness (no mod-256 wrap in
    // either image) -> identical perceptual hash, though bytes differ
    val dim = (31, 40)
    val h1 = Multimodal.decodePngDHashImpl(Multimodal.pngGrayImpl(10L, dim._1, dim._2))
    val h2 = Multimodal.decodePngDHashImpl(Multimodal.pngGrayImpl(20L, dim._1, dim._2))
    assert(h1.isDefined && h1 == h2)
    // non-gray and garbage payloads surface as None, never a fake hash
    assert(Multimodal.decodePngDHashImpl("nope".getBytes).isEmpty)
  }
}
