package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GIF87a/89a pixel codec (public spec: GIF89a specification /
  * RFC-adjacent CompuServe docs) — closes the last header-only
  * container: with PNG and baseline JPEG already fully decoded, every
  * image format `decodeImage` recognizes now has a REAL pixel path.
  *
  * Decoder scope: logical screen descriptor, global + local color
  * tables, graphic-control/comment/application extensions (skipped by
  * sub-block walking), MULTI-FRAME image data with per-frame LZW
  * decompression (variable 3–12-bit codes, LSB-first packing, CLEAR /
  * EOI handling, 4096-entry dictionary with reset), and interlaced
  * frames (the 8/8/4/2 four-pass row order de-interlaced per spec).
  * Frames are decoded INDEPENDENTLY at their own sub-rectangle size —
  * no canvas compositing/disposal (features are per-frame rasters,
  * the shape a frame-sampling pipeline consumes). Corrupt streams,
  * missing color tables, or code overflows return None — decode
  * failures must be visible (the PNG/JPEG rule).
  *
  * The encoder exists for fixtures and cross-validation: real LZW
  * compression (greedy longest-match dictionary, clear-on-full),
  * 256-entry grayscale palette, optional interlacing — javax.imageio
  * reads every fixture frame bit-identically in GifSpec (GIF is
  * lossless, so unlike JPEG the cross-check is exact equality).
  *
  * Oracle exactness (q_m8): GIF is lossless, so any deterministic
  * frame content replays in closed form. Fixture frame f holds
  * constant rows (seed + 17·f + y) % 256 under an identity-gray
  * palette; `row_weighted_sum` = Σ (y+1)·(r+g+b) is row-PERMUTATION
  * sensitive, so a decoder that mis-handles the interlace pass order
  * (exercised on odd seeds) cannot fake it even though plain sums
  * would cancel.
  */
private[llm] object GifCodec {

  private val Magic89 = "GIF89a".getBytes("US-ASCII")
  private val Magic87 = "GIF87a".getBytes("US-ASCII")

  final case class Frame(width: Int, height: Int, interlaced: Boolean,
      /** RGB bytes, 3 per pixel, de-interlaced display order */
      rgb: Array[Byte])

  private object GifFailed extends RuntimeException("gif decode failed") {
    override def fillInStackTrace(): Throwable = this
  }

  // ----------------------------------------------------------- decoder
  def decode(bytes: Array[Byte]): Option[Seq[Frame]] = {
    try decodeOrThrow(bytes)
    catch { case GifFailed | _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Seq[Frame]] = {
    if (bytes == null || bytes.length < 13) return None
    val magicOk = (0 until 6).forall(i => bytes(i) == Magic89(i)) ||
      (0 until 6).forall(i => bytes(i) == Magic87(i))
    if (!magicOk) return None
    def u8(p: Int): Int = bytes(p) & 0xFF
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8) // little-endian
    var pos = 6
    pos += 4 // logical screen w/h
    val lsdFlags = u8(pos); pos += 3 // flags, bg index, aspect
    var gct: Array[Byte] = null
    if ((lsdFlags & 0x80) != 0) {
      val n = 2 << (lsdFlags & 7)
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    val frames = Vector.newBuilder[Frame]
    var done = false
    while (!done) {
      if (pos >= bytes.length) throw GifFailed
      u8(pos) match {
        case 0x3B => done = true // trailer
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (u8(pos) != 0) pos += 1 + u8(pos)
          pos += 1
        case 0x2C => // image descriptor
          pos += 1
          val fw = u16(pos + 4); val fh = u16(pos + 6)
          val flags = u8(pos + 8)
          pos += 9
          if (fw <= 0 || fh <= 0 || fw.toLong * fh > (1L << 26)) throw GifFailed
          var table = gct
          if ((flags & 0x80) != 0) {
            val n = 2 << (flags & 7)
            table = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (table == null) throw GifFailed
          val interlaced = (flags & 0x40) != 0
          val minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 8) throw GifFailed
          // collect the LZW sub-blocks for this frame
          val data = new java.io.ByteArrayOutputStream()
          while (u8(pos) != 0) {
            val n = u8(pos)
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val indices = lzwDecode(data.toByteArray, minCode, fw * fh)
          // de-interlace: spec pass rows 0%8, 4%8, 2%4, 1%2
          val order = new Array[Int](fh)
          if (interlaced) {
            var i = 0
            for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                 y <- start until fh by step) { order(i) = y; i += 1 }
          } else {
            var y = 0
            while (y < fh) { order(y) = y; y += 1 }
          }
          val rgb = new Array[Byte](fw * fh * 3)
          var row = 0
          while (row < fh) {
            val dy = order(row)
            var x = 0
            while (x < fw) {
              val idx = indices(row * fw + x) & 0xFF
              if (3 * idx + 2 >= table.length) throw GifFailed
              val o = (dy * fw + x) * 3
              rgb(o) = table(3 * idx); rgb(o + 1) = table(3 * idx + 1)
              rgb(o + 2) = table(3 * idx + 2)
              x += 1
            }
            row += 1
          }
          frames += Frame(fw, fh, interlaced, rgb)
        case _ => throw GifFailed
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some(fs)
  }

  /** GIF-LZW decompression: LSB-first variable-width codes. */
  private def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix link, appended byte); literals are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCode + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var acc = 0L; var nBits = 0; var bytePos = 0
    def readCode(): Int = {
      while (nBits < width) {
        if (bytePos >= data.length) return -1
        acc |= (data(bytePos) & 0xFFL) << nBits
        bytePos += 1; nBits += 8
      }
      val c = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nBits -= width
      c
    }
    val stack = new Array[Byte](4096)
    def emit(code: Int, first: Array[Byte]): Unit = { // expand code to out
      var sp = 0
      var c = code
      while (c >= clear) { // walk dictionary links (codes >= clear+2)
        if (sp >= stack.length || c >= next) throw GifFailed
        stack(sp) = append(c); sp += 1; c = prefix(c)
      }
      if (c >= clear) throw GifFailed
      first(0) = c.toByte
      if (outPos + sp + 1 > out.length) throw GifFailed
      out(outPos) = c.toByte; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
    }
    val firstByte = new Array[Byte](1)
    var prev = -1
    var running = true
    while (running && outPos < nPixels) {
      val code = readCode()
      if (code < 0 || code == eoi) running = false
      else if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (prev < 0) {
        if (code >= clear) throw GifFailed
        emit(code, firstByte)
        prev = code
      } else {
        if (code > next) throw GifFailed
        if (code == next) { // KwKwK case: cur = prev + firstChar(prev)
          if (next >= 4096) throw GifFailed
          prefix(next) = prev
          // first char of prev's expansion
          var c = prev
          while (c >= clear) c = prefix(c)
          append(next) = c.toByte
          next += 1
          emit(code, firstByte)
        } else {
          emit(code, firstByte)
          if (next < 4096) {
            prefix(next) = prev; append(next) = firstByte(0); next += 1
          }
        }
        prev = code
        if (next == (1 << width) && width < 12) width += 1
      }
    }
    if (outPos != nPixels) throw GifFailed
    out
  }

  // ----------------------------------------------------------- encoder
  /** Real LZW compression of an index stream (greedy longest match,
    * CLEAR emitted on dictionary overflow), packed LSB-first into
    * ≤255-byte sub-blocks.
    */
  private def lzwEncode(indices: Array[Byte], minCode: Int,
      out: java.io.ByteArrayOutputStream): Unit = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val packed = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    var width = minCode + 1
    def write(code: Int): Unit = {
      acc |= code.toLong << nBits; nBits += width
      while (nBits >= 8) { packed.write((acc & 0xFF).toInt); acc >>>= 8; nBits -= 8 }
    }
    var dict = new java.util.HashMap[Int, Int]() // (prefixCode<<8 | byte) -> code
    var next = eoi + 1
    write(clear)
    var cur = -1
    var i = 0
    while (i < indices.length) {
      val b = indices(i) & 0xFF
      if (cur < 0) cur = b
      else {
        val key = (cur << 8) | b
        val hit = dict.getOrDefault(key, -1)
        if (hit >= 0) cur = hit
        else {
          write(cur)
          if (next < 4096) {
            dict.put(key, next); next += 1
            if (next - 1 == (1 << width) && width < 12) width += 1
          } else { // dictionary full: reset (keeps the decoder honest)
            write(clear)
            dict = new java.util.HashMap[Int, Int](); next = eoi + 1
            width = minCode + 1
          }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) write(cur)
    write(eoi)
    if (nBits > 0) packed.write((acc & 0xFF).toInt)
    val bytes = packed.toByteArray
    var p = 0
    while (p < bytes.length) {
      val n = math.min(255, bytes.length - p)
      out.write(n); out.write(bytes, p, n)
      p += n
    }
    out.write(0) // block terminator
  }

  /** Width-increment discipline note: GIF widens when the NEXT code to
    * assign would not fit, i.e. after assigning code 2^width - 1. The
    * encoder above increments when `next-1 == 2^width` (the first code
    * of the new width was just assigned), matching the decoder's
    * `next == 2^width` post-assignment check — and javax.imageio's
    * reader agrees (GifSpec cross-check).
    */

  /** Complete GIF89a: identity-gray 256-entry palette, `nFrames`
    * full-size frames where frame f row y holds constant index
    * (seed + 17·f + y) % 256; interlace on odd seeds (all frames).
    */
  private[llm] def gifGrayImpl(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, "gif dims/frames must be positive")
    val out = new java.io.ByteArrayOutputStream(1 << 12)
    out.write(Magic89)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(w); le16(h)
    out.write(0xF7) // GCT present, 256 entries, 8-bit color resolution
    out.write(0); out.write(0) // bg index, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 } // identity gray
    val interlaced = (seed % 2 + 2) % 2 == 1
    val rowOrder = {
      val order = Vector.newBuilder[Int]
      if (interlaced)
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step)
          order += y
      else (0 until h).foreach(order += _)
      order.result()
    }
    var f = 0
    while (f < nFrames) {
      out.write(0x2C) // image descriptor: full-size frame at (0,0)
      le16(0); le16(0); le16(w); le16(h)
      out.write(if (interlaced) 0x40 else 0x00) // no LCT
      out.write(8) // LZW min code size
      val indices = new Array[Byte](w * h)
      var r = 0
      while (r < h) {
        val y = rowOrder(r) // stored order: interlace passes
        val v = (((seed + 17L * f + y) % 256 + 256) % 256).toInt
        java.util.Arrays.fill(indices, r * w, (r + 1) * w, v.toByte)
        r += 1
      }
      lzwEncode(indices, 8, out)
      f += 1
    }
    out.write(0x3B)
    out.toByteArray
  }
}

/** Column-level GIF pixel operators. */
object Gif {
  import GifCodec._

  private val gifGrayUdf = udf(GifCodec.gifGrayImpl _)

  /** Column builder for the complete-GIF fixture stream (q_m8). */
  def gifPixelPayload(seed: Column, width: Column, height: Column, nFrames: Column): Column =
    gifGrayUdf(seed, width, height, nFrames)

  /** REAL pixel decode of a (possibly animated, possibly interlaced)
    * GIF: per-frame LZW decompression, de-interlacing, palette
    * mapping. Returns (width, height, n_frames, pixel_sum,
    * row_weighted_sum) where pixel_sum = Σ(r+g+b) over every frame
    * raster and row_weighted_sum = Σ(y+1)·(r+g+b) — the row-weighted
    * moment detects interlace-order errors plain sums cancel. Null
    * for anything that is not a decodable GIF.
    */
  private[llm] def decodeGifPixelsImpl(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Long)] =
    decode(bytes).map { frames =>
      var sum = 0L
      var wsum = 0L
      frames.foreach { fr =>
        var y = 0
        while (y < fr.height) {
          var rowSum = 0L
          var i = y * fr.width * 3
          val end = (y + 1) * fr.width * 3
          while (i < end) { rowSum += fr.rgb(i) & 0xFF; i += 1 }
          sum += rowSum
          wsum += (y + 1) * rowSum
          y += 1
        }
      }
      (frames.head.width, frames.head.height, frames.length, sum, wsum)
    }
  private val decodeGifPixelsUdf = udf(decodeGifPixelsImpl _)

  /** Pixel-decode column: struct(width, height, n_frames, pixel_sum,
    * row_weighted_sum) or null.
    */
  def decodeGifPixels(payload: Column): Column =
    decodeGifPixelsUdf(payload).cast(
      "struct<width:int,height:int,n_frames:int,pixel_sum:bigint,row_weighted_sum:bigint>")
}
