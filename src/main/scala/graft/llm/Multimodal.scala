package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The DECODE STEP IS A STUB: real image/audio decoding needs native
  * libraries this container doesn't ship, so `decodeImageStub` derives
  * deterministic fake features from the bytes. Everything around it —
  * binary schema, metadata struct, batch shapes, partition behavior,
  * frame arithmetic — is real and oracle-tested; swapping the stub for
  * a JNI/Pandas-UDF decoder changes one function.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no base64
  * round-trips); metadata extraction is native expressions over the
  * bytes; frame sampling is arithmetic on offsets, so a 100 TB video
  * table only materializes the sampled frames.
  */
object Multimodal {

  /** Wrap a source column as an opaque media payload. */
  def asPayload(c: Column): Column = c.cast("binary")

  /** Typed metadata carried next to every payload. */
  def payloadMeta(payload: Column): Column = struct(
    octet_length(payload).as("n_bytes"),
    md5(payload).as("checksum"))

  /** STUB decoder — deterministic fake image features from the bytes.
    * Real implementation: a vectorized decoder over the binary batches
    * (mapInArrow / native Expression); feature shape stays identical.
    */
  def decodeImageStub(payload: Column): Column = struct(
    (octet_length(payload) % 640).cast("int").as("width"),
    ((octet_length(payload) * 7) % 480).cast("int").as("height"),
    lit("stub/raw").as("format"))

  // ------------------------------------------------------- real headers
  // PNG: 8-byte magic, then the IHDR chunk (length 13 + "IHDR") whose
  // first 8 data bytes are width/height as 4-byte big-endian ints.
  // GIF: "GIF89a", then width/height as 2-byte little-endian at 7/9.
  private val PngMagic: Array[Byte] =
    Array(0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
  private val IhdrPrefix: Array[Byte] =
    Array[Byte](0, 0, 0, 13, 'I', 'H', 'D', 'R')
  // bit depth 8, color type 6 (RGBA), default compression/filter/interlace
  private val IhdrTail: Array[Byte] = Array[Byte](8, 6, 0, 0, 0)
  private val GifMagic: Array[Byte] = "GIF89a".getBytes("US-ASCII")

  // lpad TRUNCATES a too-long hex string (keeping the high digits), so
  // an out-of-range dimension would silently encode a corrupt header —
  // fail the task instead
  private def inRange(v: Column, max: Long, what: String): Column =
    when(v.isNull || v < 0 || v > max,
      raise_error(concat(lit(s"$what out of range [0, $max]: "), v.cast("string"))))
      .otherwise(v)
  private def be4(v: Column): Column =
    unhex(lpad(hex(inRange(v, 0xFFFFFFFFL, "be4 value")), 8, "0"))
  private def le2(v: Column): Column = {
    val h = lpad(hex(inRange(v, 0xFFFFL, "le2 value")), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** A REAL PNG byte stream up to the end of IHDR (magic + IHDR chunk
    * with the given dimensions), with `body` as the opaque remainder —
    * enough structure for any PNG parser to read the dimensions.
    */
  def pngPayload(width: Column, height: Column, body: Column): Column =
    concat(lit(PngMagic), lit(IhdrPrefix), be4(width), be4(height),
      lit(IhdrTail), body.cast("binary"))

  /** A REAL GIF89a header (logical screen width/height little-endian)
    * with `body` as the opaque remainder.
    */
  def gifPayload(width: Column, height: Column, body: Column): Column =
    concat(lit(GifMagic), le2(width), le2(height), body.cast("binary"))

  /** REAL per-format image decode over the raw bytes: detects the PNG
    * magic (dims = 4-byte big-endian at IHDR offsets 17/21) and the
    * GIF89a magic (dims = 2-byte little-endian at 7/9); anything else
    * falls back to the documented stub. All native expressions
    * (substring/hex/conv on binary) — no UDF, stays in codegen, so a
    * 100 TB media table pays one projection. Full-image pixel decode
    * still needs a native library (mapInArrow at scale); HEADER decode
    * is real and oracle-checked (q_m1).
    */
  def decodeImage(payload: Column): Column = {
    val isPng = substring(payload, 1, 8) === lit(PngMagic)
    val isGif = substring(payload, 1, 6) === lit(GifMagic)
    def be(pos: Int) = conv(hex(substring(payload, pos, 4)), 16, 10).cast("int")
    def le(pos: Int) = conv(
      concat(hex(substring(payload, pos + 1, 1)), hex(substring(payload, pos, 1))),
      16, 10).cast("int")
    when(isPng, struct(be(17).as("width"), be(21).as("height"), lit("png").as("format")))
      .when(isGif, struct(le(7).as("width"), le(9).as("height"), lit("gif").as("format")))
      .otherwise(decodeImageStub(payload))
  }

  /** Fixed-size frame count of a payload (frameSize bytes per frame). */
  def frameCount(payload: Column, frameSize: Int): Column =
    floor((octet_length(payload) - 1) / frameSize) + 1

  /** Number of frames kept when sampling every `stride`-th frame. */
  def sampledFrameCount(payload: Column, frameSize: Int, stride: Int): Column =
    floor((frameCount(payload, frameSize) - 1) / stride) + 1

  /** Checksum of the first frame (cheap content probe / thumbnail proxy). */
  def firstFrameChecksum(payload: Column, frameSize: Int): Column =
    md5(substring(payload, 1, frameSize))
}
