package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WAV (RIFF/PCM) audio codec — the audio leg of the multimodal
  * column family (images: PNG/JPEG/GIF, all fully decoded; audio was
  * the remaining modality with no real parse).
  *
  * Decoder scope: canonical RIFF/WAVE containers, PCM (format 1) at
  * 8-bit unsigned or 16-bit signed little-endian, any channel count,
  * unknown chunks skipped by size (with odd-size padding per RIFF).
  * Compressed formats (ADPCM, float, extensible) return None — the
  * decode-failures-visible rule.
  *
  * Features come from a single streaming pass over the samples:
  *  - `sum_abs`: Σ|sample| over every channel (integer-exact — the
  *    RMS numerator without the cross-engine sqrt);
  *  - `zero_crossings`: sign alternations of channel 0 (the classic
  *    voicing/noisiness proxy; sign(0) counts as non-negative);
  *  - `n_active_frames`: frames of 64 channel-0 samples whose energy
  *    Σv² exceeds a threshold — the voice-activity-detection shape a
  *    silence-trimming corpus pipeline runs.
  * All integer arithmetic, so the q_m9 oracle replays them exactly in
  * closed form; javax.sound.sampled cross-validates the PCM parse in
  * WavSpec (the JDK's independent WAV reader).
  *
  * Scale: per-row streaming kernel like the image decoders — one
  * audio clip at a time, partitions like any map work.
  */
private[llm] object WavCodec {

  final case class Decoded(sampleRate: Int, nChannels: Int,
      /** per-channel sample count */ nSamples: Int,
      sumAbs: Long, zeroCrossings: Long, nFrames: Int, nActiveFrames: Int)

  private object WavFailed extends RuntimeException("wav decode failed") {
    override def fillInStackTrace(): Throwable = this
  }

  /** Frame size (channel-0 samples) and energy threshold for the
    * activity counter — fixed constants of the feature contract.
    */
  val FrameSamples = 64
  val ActivityThreshold = 20000000000L // Σv² over 64 samples

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decodeOrThrow(bytes)
    catch { case WavFailed | _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(p: Int, s: String): Boolean =
      s.indices.forall(i => bytes(p + i) == s.charAt(i).toByte)
    def u16(p: Int): Int = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
    def u32(p: Int): Long = (u16(p) & 0xFFFFL) | ((u16(p + 2) & 0xFFFFL) << 16)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var pos = 12
    var fmt = -1; var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataPos = -1; var dataLen = 0
    while (pos + 8 <= bytes.length && (dataPos < 0 || fmt < 0)) {
      val size = u32(pos + 4)
      if (size < 0 || size > Int.MaxValue || pos + 8 + size > bytes.length) return None
      if (ascii(pos, "fmt ")) {
        if (size < 16) return None
        fmt = u16(pos + 8)
        channels = u16(pos + 10)
        rate = u32(pos + 12).toInt
        blockAlign = u16(pos + 20)
        bits = u16(pos + 22)
      } else if (ascii(pos, "data")) {
        dataPos = pos + 8; dataLen = size.toInt
      }
      pos += 8 + size.toInt + (size.toInt & 1) // RIFF pads odd chunks
    }
    if (fmt != 1 || dataPos < 0) return None // PCM only
    if ((bits != 8 && bits != 16) || channels < 1 || rate <= 0) return None
    val bytesPerSample = bits / 8
    if (blockAlign != bytesPerSample * channels) return None
    val nSamples = dataLen / blockAlign
    var sumAbs = 0L
    var crossings = 0L
    var prevNeg = false
    var first = true
    var frameEnergy = 0L
    var inFrame = 0
    var nFrames = 0
    var nActive = 0
    var i = 0
    while (i < nSamples) {
      var c = 0
      while (c < channels) {
        val off = dataPos + (i * channels + c) * bytesPerSample
        val v =
          if (bits == 16) (u16(off) << 16) >> 16 // sign-extend LE
          else (bytes(off) & 0xFF) - 128
        sumAbs += math.abs(v)
        if (c == 0) {
          val neg = v < 0
          if (!first && neg != prevNeg) crossings += 1
          prevNeg = neg; first = false
          frameEnergy += v.toLong * v
          inFrame += 1
          if (inFrame == FrameSamples) {
            nFrames += 1
            if (frameEnergy > ActivityThreshold) nActive += 1
            frameEnergy = 0; inFrame = 0
          }
        }
        c += 1
      }
      i += 1
    }
    if (inFrame > 0) { // trailing partial frame counts
      nFrames += 1
      if (frameEnergy > ActivityThreshold) nActive += 1
    }
    Some(Decoded(rate, channels, nSamples, sumAbs, crossings, nFrames, nActive))
  }

  /** Canonical 44-byte-header WAV with the given interleaved samples
    * (16-bit signed LE PCM).
    */
  private[llm] def encodePcm16(rate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(rate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic mono fixture: sample i = ((seed + 37·i) % 65536)
    * − 32768 — a full-range ramp sweep whose |v| sums, sign
    * alternations, and frame energies all have integer closed forms.
    */
  private[llm] def wavMonoImpl(seed: Long, nSamples: Int, rate: Int): Array[Byte] = {
    require(nSamples > 0 && rate > 0, "wav fixture params must be positive")
    val s = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      s(i) = ((((seed + 37L * i) % 65536 + 65536) % 65536) - 32768).toShort
      i += 1
    }
    encodePcm16(rate, 1, s)
  }
}

/** Column-level WAV audio operators. */
object Wav {
  import WavCodec._

  private val wavMonoUdf = udf(WavCodec.wavMonoImpl _)

  /** Column builder for the complete-WAV fixture stream (q_m9). */
  def wavPayload(seed: Column, nSamples: Column, sampleRate: Column): Column =
    wavMonoUdf(seed, nSamples, sampleRate)

  /** REAL PCM decode + one-pass audio features: struct(sample_rate,
    * n_channels, n_samples, sum_abs, zero_crossings, n_frames,
    * n_active_frames) or null for non-PCM/corrupt payloads.
    */
  private[llm] def decodeWavImpl(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Long, Int, Int)] =
    decode(bytes).map(d => (d.sampleRate, d.nChannels, d.nSamples,
      d.sumAbs, d.zeroCrossings, d.nFrames, d.nActiveFrames))
  private val decodeWavUdf = udf(decodeWavImpl _)

  def decodeWav(payload: Column): Column =
    decodeWavUdf(payload).cast(
      "struct<sample_rate:int,n_channels:int,n_samples:int," +
        "sum_abs:bigint,zero_crossings:bigint,n_frames:int,n_active_frames:int>")
}
