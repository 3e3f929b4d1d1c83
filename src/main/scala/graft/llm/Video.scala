package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Video leg of the multimodal family: MJPEG-in-AVI (RIFF container,
  * public spec: Microsoft AVI RIFF + OpenDML) — the composition a
  * training-data pipeline actually runs: walk the container, SAMPLE
  * every k-th frame (never materializing the rest), and decode only
  * the sampled frames through the baseline-JPEG codec (Jpeg.scala).
  *
  * Decoder scope: RIFF 'AVI ' files; the 'movi' LIST is walked
  * chunk-by-chunk and every '..dc'/'..db' video chunk is a frame
  * payload (MJPEG = one baseline JPEG per frame). Frame sampling
  * happens AT THE CONTAINER WALK — unsampled frames are skipped by
  * size without ever being decoded, so a stride-k scan does 1/k of
  * the decode work (the property that matters when the corpus is
  * mostly video bytes). hdrl/idx1/other chunks are skipped by size.
  * Non-AVI, non-decodable frames, or frame-less files return None.
  *
  * The encoder builds spec-shaped fixtures: RIFF/hdrl(avih,
  * strl(strh 'vids' 'MJPG', strf BITMAPINFOHEADER)) + movi with one
  * '00dc' chunk per frame, each a real JPEG from `JpegCodec`. The
  * JPEG layer is independently imageio-cross-validated (JpegSpec);
  * the container layer round-trips here and replays in closed form in
  * q_m10 (frames use the exact DC+AC spectrum, so the lossy codec is
  * bit-lossless — see Jpeg.scala).
  */
private[llm] object AviCodec {

  private object AviFailed extends RuntimeException("avi decode failed") {
    override def fillInStackTrace(): Throwable = this
  }

  final case class VideoFeatures(width: Int, height: Int, nFrames: Int,
      nSampled: Int, pixelSum: Long, row0Sum: Long)

  /** Walk the container, decode every `stride`-th video frame. */
  def decodeSampled(bytes: Array[Byte], stride: Int): Option[VideoFeatures] = {
    try decodeOrThrow(bytes, stride)
    catch { case AviFailed | _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeOrThrow(bytes: Array[Byte], stride: Int): Option[VideoFeatures] = {
    require(stride >= 1, "stride must be >= 1")
    if (bytes == null || bytes.length < 24) return None
    def ascii(p: Int, s: String): Boolean =
      s.indices.forall(i => bytes(p + i) == s.charAt(i).toByte)
    def u32(p: Int): Long =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    if (!ascii(0, "RIFF") || !ascii(8, "AVI ")) return None
    // find the movi LIST among the top-level chunks
    var pos = 12
    var moviStart = -1; var moviEnd = -1
    while (pos + 8 <= bytes.length && moviStart < 0) {
      val size = u32(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (ascii(pos, "LIST") && size >= 4 && ascii(pos + 8, "movi")) {
        moviStart = pos + 12; moviEnd = pos + 8 + size.toInt
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    if (moviStart < 0) return None
    // walk movi: '..dc'/'..db' chunks are video frames; sample every
    // stride-th — skipped frames are never decoded
    var p = moviStart
    var frameIdx = 0
    var nSampled = 0
    var w = -1; var h = -1
    var pixelSum = 0L; var row0Sum = 0L
    while (p + 8 <= moviEnd) {
      val size = u32(p + 4)
      if (size < 0 || p + 8 + size > moviEnd) throw AviFailed
      val isVideo = (bytes(p + 2) == 'd' && (bytes(p + 3) == 'c' || bytes(p + 3) == 'b'))
      if (isVideo) {
        if (frameIdx % stride == 0) {
          val frame = java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size.toInt)
          val d = JpegCodec.decode(frame).getOrElse(throw AviFailed)
          if (w < 0) { w = d.width; h = d.height }
          else if (w != d.width || h != d.height) throw AviFailed
          var i = 0
          while (i < d.pixels.length) { pixelSum += d.pixels(i) & 0xFF; i += 1 }
          val rowBytes = d.width * d.nComp
          i = 0
          while (i < rowBytes) { row0Sum += d.pixels(i) & 0xFF; i += 1 }
          nSampled += 1
        }
        frameIdx += 1
      }
      p += 8 + size.toInt + (size.toInt & 1)
    }
    if (frameIdx == 0) None
    else Some(VideoFeatures(w, h, frameIdx, nSampled, pixelSum, row0Sum))
  }

  // ----------------------------------------------------------- encoder
  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 9)
    fourcc(out, id); le32(out, body.length); out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }
  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 13)
    fourcc(out, "LIST"); le32(out, body.length + 4); fourcc(out, kind)
    out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** A spec-shaped MJPEG AVI: avih + 'vids'/'MJPG' stream headers,
    * movi with one '00dc' JPEG per frame (frame f = the q_m6 exact
    * fixture at seed + 101·f).
    */
  private[llm] def aviMjpegImpl(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, "avi fixture params must be positive")
    def u32s(vs: Long*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(vs.length * 4)
      vs.foreach(le32(o, _)); o.toByteArray
    }
    // avih: usPerFrame, maxBytesPerSec, pad, flags, totalFrames,
    // initialFrames, streams, bufSize, width, height, reserved×4
    val avih = chunk("avih", u32s(40000L, 0, 0, 0, nFrames, 0, 1, 0, w, h, 0, 0, 0, 0))
    // strh: 'vids','MJPG', flags, prio/lang, initial, scale, rate,
    // start, length, bufSize, quality, sampleSize, rcFrame(4×u16=2×u32)
    val strhBody = new java.io.ByteArrayOutputStream()
    fourcc(strhBody, "vids"); fourcc(strhBody, "MJPG")
    strhBody.write(u32s(0, 0, 0, 1, 25, 0, nFrames, 0, 0xFFFFFFFFL, 0, 0, 0), 0, 48)
    val strh = chunk("strh", strhBody.toByteArray)
    // strf: BITMAPINFOHEADER (biSize 40, w, h, planes|bitcount, 'MJPG', ...)
    val strfBody = new java.io.ByteArrayOutputStream()
    strfBody.write(u32s(40, w, h), 0, 12)
    strfBody.write(Array[Byte](1, 0, 24, 0), 0, 4) // planes=1, bitcount=24
    fourcc(strfBody, "MJPG")
    strfBody.write(u32s(w.toLong * h * 3, 0, 0, 0, 0), 0, 20)
    val strf = chunk("strf", strfBody.toByteArray)
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val frames = (0 until nFrames).toArray.flatMap { f =>
      chunk("00dc", JpegCodec.jpegGrayImpl(seed + 101L * f, w, h))
    }
    val movi = list("movi", frames)
    val out = new java.io.ByteArrayOutputStream(hdrl.length + movi.length + 12)
    fourcc(out, "RIFF"); le32(out, 4L + hdrl.length + movi.length); fourcc(out, "AVI ")
    out.write(hdrl, 0, hdrl.length); out.write(movi, 0, movi.length)
    out.toByteArray
  }
}

/** Column-level video operators. */
object Video {
  import AviCodec._

  private val aviUdf = udf(AviCodec.aviMjpegImpl _)

  /** Column builder for the complete MJPEG-AVI fixture stream (q_m10). */
  def aviPayload(seed: Column, width: Column, height: Column, nFrames: Column): Column =
    aviUdf(seed, width, height, nFrames)

  /** Container walk + stride-k frame sampling + per-sampled-frame JPEG
    * decode: struct(width, height, n_frames, n_sampled, pixel_sum,
    * row0_sum) or null. Unsampled frames are size-skipped, never
    * decoded.
    */
  private[llm] def decodeVideoSampledImpl(bytes: Array[Byte], stride: Int)
      : Option[(Int, Int, Int, Int, Long, Long)] =
    decodeSampled(bytes, stride).map(v =>
      (v.width, v.height, v.nFrames, v.nSampled, v.pixelSum, v.row0Sum))
  private val decodeVideoUdf =
    udf((b: Array[Byte], stride: Int) => decodeVideoSampledImpl(b, stride))

  def decodeVideoSampled(payload: Column, stride: Int): Column =
    decodeVideoUdf(payload, lit(stride)).cast(
      "struct<width:int,height:int,n_frames:int,n_sampled:int," +
        "pixel_sum:bigint,row0_sum:bigint>")
}
