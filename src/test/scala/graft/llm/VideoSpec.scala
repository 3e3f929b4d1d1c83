package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-AVI video spec: container round trips with closed-form frame
  * content, stride sampling semantics (and that skipped frames are
  * truly skipped), and rejection of non-AVI / corrupt containers.
  */
class VideoSpec extends AnyFunSuite {

  // closed form of one sampled frame (the q_m6 fixture family)
  private def frameSums(seed: Long, w: Int, h: Int): (Long, Long) = {
    var sum = 0L; var row0 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val base = ((seed + 7L * (y / 8) + 13L * (x / 8)) % 192 + 192) % 192 + 32
      val amp = ((seed + y / 8 + x / 8) % 16 + 16) % 16
      val p = base + amp * JpegCodec.S4(y % 8)
      sum += p
      if (y == 0) row0 += p
    }
    (sum, row0)
  }

  test("container decode samples every stride-th frame with exact pixel sums") {
    for (seed <- Seq(0L, 42L); nFrames <- Seq(1, 5, 7); stride <- Seq(1, 2, 3)) {
      val (w, h) = (16, 8)
      val bytes = AviCodec.aviMjpegImpl(seed, w, h, nFrames)
      val got = Video.decodeVideoSampledImpl(bytes, stride)
      val sampled = 0 until nFrames by stride
      val sums = sampled.map(f => frameSums(seed + 101L * f, w, h))
      assert(got.contains((w, h, nFrames, sampled.size,
        sums.map(_._1).sum, sums.map(_._2).sum)),
        s"seed=$seed n=$nFrames stride=$stride got=$got")
    }
  }

  test("stride sampling skips frame bytes without decoding them") {
    // corrupt every ODD frame's JPEG payload: stride=2 (even frames
    // only) must still decode — proof the walk skips by size rather
    // than decoding everything
    val bytes = AviCodec.aviMjpegImpl(3L, 16, 8, 6)
    // find each 00dc chunk and flip a byte mid-payload for odd frames
    def corruptOddFrames(b: Array[Byte]): Array[Byte] = {
      val out = b.clone()
      var idx = 0
      var p = 0
      while (p + 8 <= out.length) {
        if (out(p) == '0' && out(p + 1) == '0' && out(p + 2) == 'd' && out(p + 3) == 'c') {
          val size = (out(p + 4) & 0xFF) | ((out(p + 5) & 0xFF) << 8) |
            ((out(p + 6) & 0xFF) << 16) | ((out(p + 7) & 0xFF) << 24)
          if (idx % 2 == 1) out(p + 8) = 0 // break the SOI magic: frame is not a JPEG
          idx += 1
          p += 8 + size + (size & 1)
        } else p += 1
      }
      out
    }
    val corrupted = corruptOddFrames(bytes)
    val even = Video.decodeVideoSampledImpl(corrupted, 2)
    assert(even.exists(r => r._3 == 6 && r._4 == 3), s"got=$even")
    // stride=1 hits a corrupted frame -> whole decode is None (visible)
    assert(Video.decodeVideoSampledImpl(corrupted, 1).isEmpty)
  }

  test("non-AVI / corrupt / frame-less containers return None") {
    assert(Video.decodeVideoSampledImpl(null, 1).isEmpty)
    assert(Video.decodeVideoSampledImpl("RIFFxxxxWAVE".getBytes, 1).isEmpty)
    assert(Video.decodeVideoSampledImpl(JpegCodec.jpegGrayImpl(1L, 8, 8), 1).isEmpty)
    val good = AviCodec.aviMjpegImpl(1L, 8, 8, 2)
    assert(Video.decodeVideoSampledImpl(good.take(good.length / 3), 1).isEmpty)
  }
}
