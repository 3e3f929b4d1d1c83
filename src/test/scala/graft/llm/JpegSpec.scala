package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-JPEG codec spec: closed-form round trips on the exact
  * (DC + one-AC, q=1) fixture family, cross-validation against
  * javax.imageio as the INDEPENDENT decoder (both directions: imageio
  * reads our bitstreams; we read imageio-written real-world JPEGs),
  * and loud rejection of everything outside the baseline contract.
  */
class JpegSpec extends AnyFunSuite {

  private def fixtureExpected(seed: Long, w: Int, h: Int): (Long, Long) = {
    // closed-form pixel_sum / row0_sum of the jpegGrayImpl pattern
    var sum = 0L
    var row0 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val base = ((seed + 7L * (y / 8) + 13L * (x / 8)) % 192 + 192) % 192 + 32
      val amp = ((seed + y / 8 + x / 8) % 16 + 16) % 16
      val p = base + amp * JpegCodec.S4(y % 8)
      sum += p
      if (y == 0) row0 += p
    }
    (sum, row0)
  }

  test("fixture encode→decode is bit-lossless (exact DC+AC spectrum, q=1)") {
    for (seed <- Seq(0L, 7L, 191L, 255L, 1000003L); (w, h) <- Seq((8, 8), (48, 32), (16, 24))) {
      val bytes = JpegCodec.jpegGrayImpl(seed, w, h)
      val got = Jpeg.decodeJpegPixelsImpl(bytes)
      val (sum, row0) = fixtureExpected(seed, w, h)
      assert(got.contains((w, h, w.toLong * h, sum, row0)), s"seed=$seed w=$w h=$h got=$got")
    }
  }

  test("row0_sum is AC-sensitive: a DC-only decode cannot reproduce it") {
    // seed chosen so at least one block has amp > 0; zeroing the AC
    // leg changes row0 by sum(amp) over by=0 blocks
    val seed = 5L
    val ampSum = (0 until 6).map(bx => ((seed + bx) % 16 + 16) % 16).sum
    assert(ampSum > 0)
    val (_, row0) = fixtureExpected(seed, 48, 8)
    val dcOnlyRow0 = (0 until 6).map { bx =>
      8L * (((seed + 13L * bx) % 192 + 192) % 192 + 32)
    }.sum
    assert(row0 == dcOnlyRow0 + 8L * ampSum && row0 != dcOnlyRow0)
  }

  test("odd (non-multiple-of-8) dimensions crop the padded MCUs correctly") {
    for ((w, h) <- Seq((17, 11), (1, 1), (9, 25))) {
      val bytes = JpegCodec.jpegGrayImpl(42L, w, h)
      val got = Jpeg.decodeJpegPixelsImpl(bytes)
      val (sum, row0) = fixtureExpected(42L, w, h)
      assert(got.contains((w, h, w.toLong * h, sum, row0)), s"w=$w h=$h got=$got")
    }
  }

  private def imageioGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val r = img.getRaster
      val px = Array.tabulate(img.getHeight * img.getWidth) { i =>
        r.getSample(i % img.getWidth, i / img.getWidth, 0)
      }
      Some((img.getWidth, img.getHeight, px))
    }
  }

  test("javax.imageio (independent implementation) reads our gray bitstreams identically") {
    for (seed <- Seq(3L, 123L, 254L); (w, h) <- Seq((48, 32), (17, 11))) {
      val bytes = JpegCodec.jpegGrayImpl(seed, w, h)
      val Some((iw, ih, ipx)) = imageioGray(bytes)
      assert(iw == w && ih == h)
      val ours = JpegCodec.decode(bytes).get
      assert(ours.nComp == 1)
      var maxDiff = 0
      for (i <- ipx.indices)
        maxDiff = math.max(maxDiff, math.abs(ipx(i) - (ours.pixels(i) & 0xFF)))
      // both decoders are spec-compliant; their IDCTs may round the
      // last bit differently (T.83 allows it) — but on this exact
      // spectrum both must land the exact integers
      assert(maxDiff == 0, s"seed=$seed w=$w h=$h maxDiff=$maxDiff")
    }
  }

  test("we read imageio-ENCODED real-world JPEGs (std tables, real quant) within IDCT tolerance") {
    // a smooth gradient encoded by the JDK's own writer at quality .9:
    // independent encoder, perceptual quant tables, real AC spectra
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, math.min(255, 3 * x + 5 * y))
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.9f)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose()
    val bytes = bos.toByteArray
    val ours = JpegCodec.decode(bytes).get
    assert(ours.width == w && ours.height == h && ours.nComp == 1)
    val Some((_, _, ipx)) = imageioGray(bytes)
    var maxDiff = 0
    for (i <- ipx.indices)
      maxDiff = math.max(maxDiff, math.abs(ipx(i) - (ours.pixels(i) & 0xFF)))
    // different IDCT implementations (their fast-int vs our double)
    // may differ by one code value on real spectra — T.83 compliance
    // is per-pixel closeness, not bit equality
    assert(maxDiff <= 1, s"maxDiff=$maxDiff")
  }

  test("4:2:0 color: interleaved MCUs, chroma upsample, YCbCr→RGB — agrees with imageio") {
    // constant chroma per image: replication and fancy upsampling are
    // then identical, so the two decoders must agree to ±1 everywhere
    for ((seed, cb, cr) <- Seq((9L, 128, 128), (77L, 90, 160))) {
      val w = 34; val h = 18
      val bytes = JpegCodec.jpeg420Impl(seed, w, h, cb, cr)
      val ours = JpegCodec.decode(bytes).get
      assert(ours.width == w && ours.height == h && ours.nComp == 3)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xFF) - (ours.pixels(o) & 0xFF)))
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xFF) - (ours.pixels(o + 1) & 0xFF)))
        maxDiff = math.max(maxDiff, math.abs((rgb & 0xFF) - (ours.pixels(o + 2) & 0xFF)))
      }
      assert(maxDiff <= 1, s"seed=$seed maxDiff=$maxDiff")
    }
  }

  test("restart markers: DRI/RSTn streams decode with correct predictor resets") {
    // 6×2 = 12 MCUs with a restart every 2 — five RSTn markers, RST
    // index wrap untested at 5 so also run interval 1 (11 markers,
    // wrapping RST7→RST0). Content from the exact fixture family, so
    // equality is bit-for-bit against the no-restart encoding's decode.
    val w = 48; val h = 16; val seed = 11L
    val plane = {
      val p = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val base = ((seed + 7L * (y / 8) + 13L * (x / 8)) % 192 + 192) % 192 + 32
        val amp = ((seed + y / 8 + x / 8) % 16 + 16) % 16
        p(y * w + x) = (base + amp * JpegCodec.S4(y % 8)).toInt
      }
      p
    }
    val plain = JpegCodec.decode(
      JpegCodec.encode(w, h, Array((1, 1)), Array(plane))).get
    for (ri <- Seq(1, 2, 5)) {
      val withRst = JpegCodec.encode(w, h, Array((1, 1)), Array(plane), restartInterval = ri)
      // DRI segment actually present
      assert(withRst.sliding(2).exists(s => (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xDD))
      val dec = JpegCodec.decode(withRst).get
      assert(dec.pixels.sameElements(plain.pixels), s"restartInterval=$ri")
      // imageio agrees too — our RST emission is spec-legal
      val Some((iw, ih, ipx)) = imageioGray(withRst)
      assert(iw == w && ih == h)
      assert(ipx.indices.forall(i => ipx(i) == (dec.pixels(i) & 0xFF)), s"imageio ri=$ri")
    }
  }

  test("out-of-contract and corrupt payloads return None, never garbage") {
    assert(Jpeg.decodeJpegPixelsImpl(null).isEmpty)
    assert(Jpeg.decodeJpegPixelsImpl(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decodeJpegPixelsImpl("not a jpeg at all".getBytes).isEmpty)
    val good = JpegCodec.jpegGrayImpl(1L, 16, 16)
    // truncated mid-scan
    assert(Jpeg.decodeJpegPixelsImpl(good.take(good.length / 2)).isEmpty)
    // flip SOF0 to SOF2 (progressive — out of the baseline contract):
    // find the FFC0 marker and rewrite it
    val prog = good.clone()
    val sofAt = prog.indices.dropRight(1)
      .find(i => (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.decodeJpegPixelsImpl(prog).isEmpty)
    // PNG bytes through the JPEG decoder
    assert(Jpeg.decodeJpegPixelsImpl(Multimodal.pngGrayImpl(1L, 8, 8)).isEmpty)
    // hostile SOF dims (65535×65535): must reject via the plane-size
    // guard / entropy exhaustion, never a negative-size allocation
    val huge = good.clone()
    val sof0 = huge.indices.dropRight(1)
      .find(i => (huge(i) & 0xFF) == 0xFF && (huge(i + 1) & 0xFF) == 0xC0).get
    huge(sof0 + 5) = 0xFF.toByte; huge(sof0 + 6) = 0xFF.toByte // height
    huge(sof0 + 7) = 0xFF.toByte; huge(sof0 + 8) = 0xFF.toByte // width
    assert(Jpeg.decodeJpegPixelsImpl(huge).isEmpty)
  }

  test("header-only parse recovers SOF dimensions without entropy decode") {
    assert(JpegCodec.headerDims(JpegCodec.jpegGrayImpl(3L, 123, 45)).contains((123, 45)))
    assert(JpegCodec.headerDims(Multimodal.pngGrayImpl(1L, 8, 8)).isEmpty)
    assert(JpegCodec.headerDims("nope".getBytes).isEmpty)
  }
}
