package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** GIF LZW codec spec: closed-form round trips (GIF is lossless, so
  * unlike JPEG the checks are exact), javax.imageio cross-validation
  * of our bitstreams frame by frame, interlace handling, dictionary
  * reset, and loud rejection of corrupt streams.
  */
class GifSpec extends AnyFunSuite {

  private def expected(seed: Long, w: Int, h: Int, nFrames: Int): (Long, Long) = {
    var sum = 0L; var wsum = 0L
    for (f <- 0 until nFrames; y <- 0 until h) {
      val v = (((seed + 17L * f + y) % 256 + 256) % 256) * 3 * w // r+g+b, identity gray
      sum += v
      wsum += (y + 1) * v
    }
    (sum, wsum)
  }

  test("fixture encode→decode round-trips exactly (single frame, progressive)") {
    for (seed <- Seq(0L, 2L, 200L, 1000002L); (w, h) <- Seq((1, 1), (17, 11), (32, 24))) {
      val bytes = GifCodec.gifGrayImpl(seed, w, h, 1)
      val got = Gif.decodeGifPixelsImpl(bytes)
      val (sum, wsum) = expected(seed, w, h, 1)
      assert(got.contains((w, h, 1, sum, wsum)), s"seed=$seed w=$w h=$h got=$got")
    }
  }

  test("interlaced frames de-interlace to the correct display rows (odd seeds)") {
    // row_weighted_sum is row-permutation sensitive: decoding the
    // stored pass order as display order would change it
    for (seed <- Seq(1L, 7L, 255L); (w, h) <- Seq((9, 16), (20, 13))) {
      val bytes = GifCodec.gifGrayImpl(seed, w, h, 1)
      val got = Gif.decodeGifPixelsImpl(bytes)
      val (sum, wsum) = expected(seed, w, h, 1)
      assert(got.contains((w, h, 1, sum, wsum)), s"seed=$seed w=$w h=$h got=$got")
    }
  }

  test("multi-frame animation decodes every frame") {
    for (seed <- Seq(4L, 9L); nFrames <- Seq(2, 5)) {
      val bytes = GifCodec.gifGrayImpl(seed, 12, 10, nFrames)
      val got = Gif.decodeGifPixelsImpl(bytes)
      val (sum, wsum) = expected(seed, 12, 10, nFrames)
      assert(got.contains((12, 10, nFrames, sum, wsum)), s"seed=$seed n=$nFrames got=$got")
    }
  }

  test("javax.imageio (independent implementation) reads our frames bit-identically") {
    for (seed <- Seq(3L, 8L, 251L); nFrames <- Seq(1, 3)) {
      val w = 19; val h = 14
      val bytes = GifCodec.gifGrayImpl(seed, w, h, nFrames)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      assert(reader.getNumImages(true) == nFrames)
      val ours = GifCodec.decode(bytes).get
      for (f <- 0 until nFrames) {
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y)
          val o = (y * w + x) * 3
          assert(((rgb >> 16) & 0xFF) == (ours(f).rgb(o) & 0xFF) &&
            ((rgb >> 8) & 0xFF) == (ours(f).rgb(o + 1) & 0xFF) &&
            (rgb & 0xFF) == (ours(f).rgb(o + 2) & 0xFF),
            s"seed=$seed frame=$f pixel($x,$y)")
        }
      }
      reader.dispose()
    }
  }

  test("LZW dictionary growth beyond one width bump (large varied frame)") {
    // 128×96 with 96 distinct row values forces the dictionary well
    // past 512 entries (width 9→10+); imageio agrees on every pixel
    val bytes = GifCodec.gifGrayImpl(7L, 128, 96, 2)
    val got = Gif.decodeGifPixelsImpl(bytes)
    val (sum, wsum) = expected(7L, 128, 96, 2)
    assert(got.contains((128, 96, 2, sum, wsum)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 128)
    val ours = GifCodec.decode(bytes).get.head
    for (y <- 0 until 96; x <- 0 until 128 by 7)
      assert(((img.getRGB(x, y) >> 16) & 0xFF) == (ours.rgb((y * 128 + x) * 3) & 0xFF))
  }

  test("corrupt / truncated / non-GIF payloads return None") {
    assert(Gif.decodeGifPixelsImpl(null).isEmpty)
    assert(Gif.decodeGifPixelsImpl("GIF89a".getBytes).isEmpty)
    assert(Gif.decodeGifPixelsImpl("not a gif".getBytes).isEmpty)
    assert(Gif.decodeGifPixelsImpl(Multimodal.pngGrayImpl(1L, 8, 8)).isEmpty)
    val good = GifCodec.gifGrayImpl(5L, 16, 16, 1)
    assert(Gif.decodeGifPixelsImpl(good.take(good.length / 2)).isEmpty)
    // header-only gifPayload streams (q_m1 fixtures) have no image data
    // — they must be None here, not garbage
    val headerOnly = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      16, 0, 16, 0, 0x00, 0, 0, 0x3B) // no GCT, straight to trailer
    assert(Gif.decodeGifPixelsImpl(headerOnly).isEmpty)
  }
}
