package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** WAV/PCM codec spec: closed-form feature round trips, javax.sound
  * (the JDK's independent WAV implementation) cross-validation of the
  * PCM parse, stereo/8-bit paths, chunk skipping, and rejection.
  */
class WavSpec extends AnyFunSuite {

  private def fixture(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i => ((((seed + 37L * i) % 65536 + 65536) % 65536) - 32768).toInt)

  private def expected(seed: Long, n: Int): (Long, Long, Int, Int) = {
    val v = fixture(seed, n)
    val sumAbs = v.map(x => math.abs(x).toLong).sum
    val zc = (1 until n).count(i => (v(i) < 0) != (v(i - 1) < 0)).toLong
    val nFrames = (n + WavCodec.FrameSamples - 1) / WavCodec.FrameSamples
    val active = v.grouped(WavCodec.FrameSamples)
      .count(f => f.map(x => x.toLong * x).sum > WavCodec.ActivityThreshold)
    (sumAbs, zc, nFrames, active)
  }

  test("mono fixture decode matches the closed form exactly") {
    for (seed <- Seq(0L, 5L, 32768L, 999999L); n <- Seq(1, 63, 64, 65, 410)) {
      val bytes = WavCodec.wavMonoImpl(seed, n, 16000)
      val got = Wav.decodeWavImpl(bytes)
      val (sumAbs, zc, nf, na) = expected(seed, n)
      assert(got.contains((16000, 1, n, sumAbs, zc, nf, na)), s"seed=$seed n=$n got=$got")
    }
  }

  test("javax.sound (independent implementation) parses our PCM identically") {
    for (seed <- Seq(3L, 77L)) {
      val n = 200
      val bytes = WavCodec.wavMonoImpl(seed, n, 8000)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
        fmt.getSampleSizeInBits == 16)
      val raw = in.readAllBytes()
      assert(raw.length == n * 2)
      val v = fixture(seed, n)
      for (i <- 0 until n) {
        val s = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
        assert(s == v(i), s"seed=$seed sample $i: $s != ${v(i)}")
      }
      in.close()
    }
  }

  test("stereo PCM: per-channel sample count, sum over both, ch0 features") {
    // L = const +1000, R = alternating ±2000: crossings come from ch0
    // (none), sum_abs from both channels
    val n = 100
    val samples = new Array[Short](2 * n)
    for (i <- 0 until n) {
      samples(2 * i) = 1000
      samples(2 * i + 1) = (if (i % 2 == 0) 2000 else -2000).toShort
    }
    val bytes = WavCodec.encodePcm16(44100, 2, samples)
    val got = Wav.decodeWavImpl(bytes).get
    assert(got._1 == 44100 && got._2 == 2 && got._3 == n)
    assert(got._4 == 1000L * n + 2000L * n) // sum_abs both channels
    assert(got._5 == 0L) // ch0 never crosses
  }

  test("unknown chunks (LIST etc.) are skipped by size, incl. odd-size padding") {
    val base = WavCodec.wavMonoImpl(9L, 50, 22050)
    // splice a 5-byte LIST chunk (odd size -> 1 pad byte) between fmt and data
    val insertAt = 12 + 8 + 16 // after fmt chunk
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(insertAt) ++ extra ++ base.drop(insertAt)
    // fix the RIFF size field
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xFF).toByte; spliced(5) = ((riffLen >> 8) & 0xFF).toByte
    spliced(6) = ((riffLen >> 16) & 0xFF).toByte; spliced(7) = ((riffLen >> 24) & 0xFF).toByte
    val got = Wav.decodeWavImpl(spliced)
    assert(got == Wav.decodeWavImpl(base))
  }

  test("non-PCM / corrupt / truncated payloads return None") {
    assert(Wav.decodeWavImpl(null).isEmpty)
    assert(Wav.decodeWavImpl("RIFF".getBytes).isEmpty)
    assert(Wav.decodeWavImpl("definitely not audio data here".getBytes).isEmpty)
    assert(Wav.decodeWavImpl(Multimodal.pngGrayImpl(1L, 8, 8)).isEmpty)
    val good = WavCodec.wavMonoImpl(1L, 100, 8000)
    assert(Wav.decodeWavImpl(good.take(60)).isEmpty) // truncated data chunk
    val nonPcm = good.clone()
    nonPcm(20) = 2 // fmt tag -> ADPCM
    assert(Wav.decodeWavImpl(nonPcm).isEmpty)
  }
}
