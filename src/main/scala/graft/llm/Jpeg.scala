package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec) — the
  * round-10 closure of the last multimodal stub: a REAL pixel decoder
  * for the format class a production image corpus is mostly made of.
  *
  * Decoder scope (an honest "baseline JPEG" contract, rejected loudly
  * outside it): baseline/extended sequential DCT (SOF0/SOF1), 8-bit
  * samples, Huffman entropy coding, 1-component grayscale or
  * 3-component YCbCr with sampling factors 1-4 (4:4:4 / 4:2:2 / 4:2:0
  * all covered by the generic MCU loop), restart markers (DRI/RSTn).
  * Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical
  * modes return None — decode failures must be visible, not
  * zero-filled (the PNG decoder's rule).
  *
  * The encoder exists for FIXTURES (and the spec's cross-validation):
  * spec-complete byte streams — JFIF APP0, DQT, SOF0, the standard
  * Annex-K Huffman tables in DHT, entropy-coded scans with 0xFF byte
  * stuffing — that any decoder reads (JpegSpec decodes every fixture
  * with javax.imageio as the independent implementation).
  *
  * Oracle exactness: JPEG is lossy, so the correctness-gate fixture
  * (q_m6) is built from block patterns whose DCT spectrum is EXACTLY
  * representable after quantization — per 8×8 block, pixel(x,y) =
  * base + amp·s(y) with s = [+,−,−,+,+,−,−,+] (the v=4 vertical DCT
  * basis scaled to integers): its spectrum is DC = 8·(base−128) and
  * one AC coefficient F(4,0) = 8·amp, both exact integers under the
  * all-ones quant table, so encode→decode is bit-lossless and DuckDB
  * can replay the decoded pixel sums in closed form. The nonzero AC
  * makes the fixture unfakeable by a DC-only shortcut decoder: row 0
  * sums (base + amp) only come out right if the AC coefficient is
  * Huffman-decoded (run-9 + magnitude), dequantized, and inverse-
  * transformed exactly.
  *
  * Scale: per-row procedural kernel (a UDF by necessity — Huffman bit
  * streams are not relational algebra), streaming one image at a time;
  * partitions like any map work, same as the PNG decoder.
  */
private[llm] object JpegCodec {

  // ------------------------------------------------------------ tables
  // zigzag index -> raster index (row*8 + col); T.81 Figure 5
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3 typical Huffman tables: (bits per code length 1..16, values)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA).map(_.toByte)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA).map(_.toByte)

  // cos((2x+1)·u·π/16) — shared by forward and inverse DCT
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16)
  }
  private val C: Array[Double] = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)

  // ----------------------------------------------------------- huffman
  /** Canonical Huffman decode table built from a DHT (bits, vals). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // firstCode(l)/firstIdx(l): the smallest code of length l+1 and its
    // index into vals — the textbook canonical-code decoder
    val firstCode = new Array[Int](16)
    val firstIdx = new Array[Int](16)
    val count: Array[Int] = bits.clone()
    locally {
      var code = 0; var idx = 0; var l = 0
      while (l < 16) {
        firstCode(l) = code; firstIdx(l) = idx
        code += bits(l); idx += bits(l)
        code <<= 1
        l += 1
      }
    }
    def value(len1: Int, code: Int): Int = // len1 = length-1
      vals(firstIdx(len1) + (code - firstCode(len1))) & 0xFF

    // encode side: code + length per symbol (fixtures only)
    val encCode = new Array[Int](256)
    val encLen = new Array[Int](256)
    locally {
      var code = 0; var idx = 0; var l = 0
      while (l < 16) {
        var i = 0
        while (i < bits(l)) {
          encCode(vals(idx) & 0xFF) = code
          encLen(vals(idx) & 0xFF) = l + 1
          code += 1; idx += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private object DecodeFailed extends RuntimeException("jpeg decode failed") {
    override def fillInStackTrace(): Throwable = this // control flow, not diagnostics
  }

  /** Bit reader over the entropy-coded segment: 0xFF00 unstuffing,
    * RSTn consumption at restart boundaries, any other marker = end of
    * scan (reads past it fail the decode).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def readBit(): Int = {
      if (nBits == 0) {
        if (pos >= bytes.length) throw DecodeFailed
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) throw DecodeFailed
          val m = bytes(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed literal 0xFF
          else throw DecodeFailed // marker mid-entropy: corrupt/unsupported
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = readBit()
      var l = 0
      while (l < 16) {
        if (t.count(l) > 0 && code - t.firstCode(l) < t.count(l)) return t.value(l, code)
        code = (code << 1) | readBit()
        l += 1
      }
      throw DecodeFailed
    }
    /** Byte-align and consume the expected RSTn marker. The encoder's
      * 1-padding byte (and its 0x00 stuffing if the pad landed on
      * 0xFF) may be entirely unconsumed here, so scan forward to the
      * next real marker before checking it — the standard decoder
      * resync behavior.
      */
    def expectRst(n: Int): Unit = {
      nBits = 0
      while (pos + 1 < bytes.length &&
        !((bytes(pos) & 0xFF) == 0xFF && (bytes(pos + 1) & 0xFF) != 0x00)) pos += 1
      if (pos + 2 > bytes.length || (bytes(pos + 1) & 0xFF) != (0xD0 + n)) throw DecodeFailed
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // -------------------------------------------------------------- idct
  /** Separable double-precision IDCT of one dequantized block (raster
    * order, row = vertical frequency), output level-shifted + clamped.
    */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64) // tmp(v, x) = Σ_u C_u F(v,u) cos_u(x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += C(u) * coef(v * 8 + u) * Cos(u)(x); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += C(vv) * tmp(vv * 8 + x) * Cos(vv)(y); vv += 1 }
        val p = math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  private def fdctBlock(pix: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64) // tmp(y, u) = Σ_x f(x,y) cos_u(x)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (pix(y * 8 + x) - 128) * Cos(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(v)(yy); yy += 1 }
        out(v * 8 + u) = 0.25 * C(u) * C(v) * s
        u += 1
      }
      v += 1
    }
  }

  // ----------------------------------------------------------- decoder
  final case class Decoded(width: Int, height: Int, nComp: Int,
      /** interleaved samples, nComp per pixel: gray, or R,G,B */
      pixels: Array[Byte])

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTbl: HuffTable = _
    var acTbl: HuffTable = _
    var plane: Array[Int] = _ // padded plane, pw × ph
    var pw = 0
    var ph = 0
    var pred = 0
  }

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decodeOrThrow(bytes)
    catch { case DecodeFailed | _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    val quant = new Array[Array[Int]](4) // natural (raster) order
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { pos += 2 }
      else if (marker == 0xD9) return None // EOI before any scan
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        marker match {
          case 0xDB => // DQT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (bytes(p) & 0xF0) >> 4
              val tq = bytes(p) & 0x0F
              if (tq > 3 || pq > 1) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(Zigzag(k)) =
                  if (pq == 0) bytes(p + 1 + k) & 0xFF else u16(p + 1 + 2 * k)
                k += 1
              }
              quant(tq) = t
              p += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val tc = (bytes(p) & 0xF0) >> 4
              val th = bytes(p) & 0x0F
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
              val n = bits.sum
              if (n > 256 || p + 17 + n > pos + 2 + len) return None
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
              val tbl = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
              p += 17 + n
            }
          case 0xC0 | 0xC1 => // SOF0/SOF1: baseline / extended sequential
            if ((bytes(seg) & 0xFF) != 8) return None // 8-bit only
            h = u16(seg + 1); w = u16(seg + 3)
            val nc = bytes(seg + 5) & 0xFF
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            comps = Array.tabulate(nc) { i =>
              val b = seg + 6 + 3 * i
              val cc = Comp(bytes(b) & 0xFF, (bytes(b + 1) & 0xF0) >> 4,
                bytes(b + 1) & 0x0F, bytes(b + 2) & 0x0F)
              if (cc.h < 1 || cc.h > 4 || cc.v < 1 || cc.v > 4 || cc.tq > 3) throw DecodeFailed
              cc
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // progressive / arithmetic / hierarchical: out of contract
          case 0xDD => restartInterval = u16(seg)
          case 0xDA => // SOS: decode the scan and finish
            if (comps == null) return None
            val ns = bytes(seg) & 0xFF
            if (ns != comps.length) return None // non-interleaved multi-scan: unsupported
            var i = 0
            while (i < ns) {
              val id = bytes(seg + 1 + 2 * i) & 0xFF
              val c = comps.find(_.id == id).getOrElse(throw DecodeFailed)
              c.dcTbl = dcTables((bytes(seg + 2 + 2 * i) & 0xF0) >> 4)
              c.acTbl = acTables(bytes(seg + 2 + 2 * i) & 0x0F)
              if (c.dcTbl == null || c.acTbl == null || quant(c.tq) == null) throw DecodeFailed
              i += 1
            }
            val hMax = comps.map(_.h).max
            val vMax = comps.map(_.v).max
            val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            comps.foreach { c =>
              c.pw = mcusX * 8 * c.h; c.ph = mcusY * 8 * c.v
              // a hostile SOF (65535×65535, 4×4 factors) would overflow
              // pw·ph into a negative allocation — reject, don't throw OOM
              if (c.pw.toLong * c.ph > (1L << 28)) throw DecodeFailed
              c.plane = new Array[Int](c.pw * c.ph)
            }
            val br = new BitReader(bytes, pos + 2 + len)
            val coef = new Array[Int](64)
            val blk = new Array[Int](64)
            var mcu = 0
            var rstN = 0
            val nMcus = mcusX * mcusY
            while (mcu < nMcus) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                br.expectRst(rstN)
                rstN = (rstN + 1) & 7
                comps.foreach(_.pred = 0)
              }
              val my = mcu / mcusX
              val mx = mcu % mcusX
              comps.foreach { c =>
                val q = quant(c.tq)
                var by = 0
                while (by < c.v) {
                  var bx = 0
                  while (bx < c.h) {
                    java.util.Arrays.fill(coef, 0)
                    val t = br.decode(c.dcTbl)
                    if (t > 15) throw DecodeFailed
                    c.pred += extend(br.readBits(t), t)
                    coef(0) = c.pred * q(0)
                    var k = 1
                    var open = true
                    while (open && k < 64) {
                      val rs = br.decode(c.acTbl)
                      val r = rs >> 4
                      val s = rs & 0x0F
                      if (s == 0) {
                        if (r == 15) k += 16 // ZRL
                        else open = false    // EOB
                      } else {
                        k += r
                        if (k > 63) throw DecodeFailed
                        coef(Zigzag(k)) = extend(br.readBits(s), s) * q(Zigzag(k))
                        k += 1
                      }
                    }
                    idctBlock(coef, blk)
                    // blit into the padded plane
                    val ox = (mx * c.h + bx) * 8
                    val oy = (my * c.v + by) * 8
                    var yy = 0
                    while (yy < 8) {
                      System.arraycopy(blk, yy * 8, c.plane, (oy + yy) * c.pw + ox, 8)
                      yy += 1
                    }
                    bx += 1
                  }
                  by += 1
                }
              }
              mcu += 1
            }
            // assemble output: crop planes, upsample (replication), convert
            val nc = comps.length
            if (w.toLong * h * nc > Int.MaxValue) throw DecodeFailed
            val out = new Array[Byte](w * h * nc)
            if (nc == 1) {
              val c = comps(0)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  out(y * w + x) = c.plane(y * c.pw + x).toByte
                  x += 1
                }
                y += 1
              }
            } else {
              val cy = comps(0); val cb = comps(1); val cr = comps(2)
              def sample(c: Comp, x: Int, y: Int): Int =
                c.plane((y * c.v / vMax) * c.pw + (x * c.h / hMax))
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val yv = sample(cy, x, y)
                  val cbv = sample(cb, x, y) - 128
                  val crv = sample(cr, x, y) - 128
                  def clamp(d: Double): Byte = {
                    val r = math.round(d).toInt
                    (if (r < 0) 0 else if (r > 255) 255 else r).toByte
                  }
                  val o = (y * w + x) * 3
                  out(o) = clamp(yv + 1.402 * crv)
                  out(o + 1) = clamp(yv - 0.344136 * cbv - 0.714136 * crv)
                  out(o + 2) = clamp(yv + 1.772 * cbv)
                  x += 1
                }
                y += 1
              }
            }
            return Some(Decoded(w, h, nc, out))
          case _ => // APPn / COM / others: skip
        }
        pos += 2 + len
      }
    }
    None // no SOS reached
  }

  // ----------------------------------------------------------- encoder
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { write((1 << (8 - nBits)) - 1, 8 - nBits) }
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int, body: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(body, 0, body.length)
  }

  private def dhtBody(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] =
    Array(((tc << 4) | th).toByte) ++ bits.map(_.toByte) ++ vals

  private def magnitude(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def writeCoef(bw: BitWriter, v: Int, size: Int): Unit =
    bw.write(if (v < 0) v + (1 << size) - 1 else v, size)

  /** Encode planar samples as a baseline JFIF JPEG. `planes(i)` holds
    * component i's samples at its own resolution (ceil(w·h_i/hMax) ×
    * ceil(h·v_i/vMax), padded to whole blocks by edge replication
    * here). Quant tables are ALL-ONES (fixture exactness — a real
    * encoder would pass perceptual tables; the bitstream shape is
    * identical). Grayscale when one plane, YCbCr when three.
    */
  def encode(w: Int, h: Int, factors: Array[(Int, Int)], planes: Array[Array[Int]],
      restartInterval: Int = 0): Array[Byte] = {
    require(factors.length == planes.length && (planes.length == 1 || planes.length == 3))
    val nc = planes.length
    val hMax = factors.map(_._1).max
    val vMax = factors.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val out = new java.io.ByteArrayOutputStream(1 << 12)
    out.write(0xFF); out.write(0xD8) // SOI
    // APP0 JFIF
    seg(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0, all ones (zigzag order in the stream)
    seg(out, 0xDB, Array.tabulate(65)(i => if (i == 0) 0.toByte else 1.toByte))
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8); sof.write((h >> 8) & 0xFF); sof.write(h & 0xFF)
    sof.write((w >> 8) & 0xFF); sof.write(w & 0xFF); sof.write(nc)
    var ci = 0
    while (ci < nc) {
      sof.write(ci + 1); sof.write((factors(ci)._1 << 4) | factors(ci)._2); sof.write(0)
      ci += 1
    }
    seg(out, 0xC0, sof.toByteArray)
    // DHT: Annex K tables (lum always; chrom for color)
    seg(out, 0xC4, dhtBody(0, 0, DcLumBits, DcLumVals))
    seg(out, 0xC4, dhtBody(1, 0, AcLumBits, AcLumVals))
    if (nc == 3) {
      seg(out, 0xC4, dhtBody(0, 1, DcChrBits, DcChrVals))
      seg(out, 0xC4, dhtBody(1, 1, AcChrBits, AcChrVals))
    }
    if (restartInterval > 0)
      seg(out, 0xDD, Array(((restartInterval >> 8) & 0xFF).toByte,
        (restartInterval & 0xFF).toByte))
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nc)
    ci = 0
    while (ci < nc) {
      sos.write(ci + 1); sos.write(if (ci == 0) 0x00 else 0x11)
      ci += 1
    }
    sos.write(0); sos.write(63); sos.write(0)
    seg(out, 0xDA, sos.toByteArray)
    // entropy-coded MCUs
    val bw = new BitWriter(out)
    val dcT = Array(new HuffTable(DcLumBits, DcLumVals), new HuffTable(DcChrBits, DcChrVals))
    val acT = Array(new HuffTable(AcLumBits, AcLumVals), new HuffTable(AcChrBits, AcChrVals))
    val preds = new Array[Int](nc)
    val pix = new Array[Int](64)
    val freq = new Array[Double](64)
    var mcu = 0
    var rstN = 0
    while (mcu < mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush() // byte-align (1-padded) before the marker
        out.write(0xFF); out.write(0xD0 + rstN)
        rstN = (rstN + 1) & 7
        java.util.Arrays.fill(preds, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      ci = 0
      while (ci < nc) {
        val (fh, fv) = factors(ci)
        val cw = (w * fh + hMax - 1) / hMax // component resolution
        val ch = (h * fv + vMax - 1) / vMax
        val plane = planes(ci)
        val tblIdx = if (ci == 0) 0 else 1
        var by = 0
        while (by < fv) {
          var bx = 0
          while (bx < fh) {
            val ox = (mx * fh + bx) * 8
            val oy = (my * fv + by) * 8
            var yy = 0
            while (yy < 8) {
              val sy = math.min(oy + yy, ch - 1) // edge-replicate pad
              var xx = 0
              while (xx < 8) {
                val sx = math.min(ox + xx, cw - 1)
                pix(yy * 8 + xx) = plane(sy * cw + sx)
                xx += 1
              }
              yy += 1
            }
            fdctBlock(pix, freq)
            // quantize (q = 1): round to nearest integer
            val dc = math.round(freq(0)).toInt
            val diff = dc - preds(ci)
            preds(ci) = dc
            val t = if (diff == 0) 0 else magnitude(diff)
            bw.write(dcT(tblIdx).encCode(t), dcT(tblIdx).encLen(t))
            if (t > 0) writeCoef(bw, diff, t)
            var run = 0
            var k = 1
            while (k < 64) {
              val v = math.round(freq(Zigzag(k))).toInt
              if (v == 0) run += 1
              else {
                while (run > 15) {
                  bw.write(acT(tblIdx).encCode(0xF0), acT(tblIdx).encLen(0xF0)) // ZRL
                  run -= 16
                }
                val s = magnitude(v)
                val rs = (run << 4) | s
                bw.write(acT(tblIdx).encCode(rs), acT(tblIdx).encLen(rs))
                writeCoef(bw, v, s)
                run = 0
              }
              k += 1
            }
            if (run > 0) bw.write(acT(tblIdx).encCode(0x00), acT(tblIdx).encLen(0x00)) // EOB
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------- fixture
  /** The s-pattern of the v=4 vertical DCT basis scaled to ±1. */
  private[llm] val S4: Array[Int] = Array(1, -1, -1, 1, 1, -1, -1, 1)

  /** Deterministic grayscale fixture: block (by,bx) holds pixel(x,y) =
    * base + amp·s(y) with base = (seed + 7·by + 13·bx) % 192 + 32 and
    * amp = (seed + by + bx) % 16 — DC and one AC(4,0) coefficient,
    * both exact integers under q=1, so the encode→decode round trip is
    * bit-lossless (see object doc). Any w,h ≥ 1 (edge blocks padded by
    * replication like any encoder; q_m6 uses multiples of 8 so its
    * closed form needs no partial-block terms).
    */
  private[llm] def jpegGrayImpl(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "jpeg dims must be positive")
    val plane = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val by = y / 8; val bx = x / 8
        val base = ((seed + 7L * by + 13L * bx) % 192 + 192) % 192 + 32
        val amp = ((seed + by + bx) % 16 + 16) % 16
        plane(y * w + x) = (base + amp * S4(y % 8)).toInt
        x += 1
      }
      y += 1
    }
    encode(w, h, Array((1, 1)), Array(plane))
  }

  /** Deterministic 4:2:0 color fixture: luma is the grayscale pattern,
    * chroma is CONSTANT per image (cb, cr) — constant chroma makes
    * replication and fancy upsampling identical, so javax.imageio and
    * this decoder must agree pixel-for-pixel (JpegSpec).
    */
  private[llm] def jpeg420Impl(seed: Long, w: Int, h: Int, cb: Int, cr: Int): Array[Byte] = {
    require(w > 0 && h > 0, "jpeg dims must be positive")
    val yPlane = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = ((seed + 7L * (y / 8) + 13L * (x / 8)) % 192 + 192) % 192 + 32
        val amp = ((seed + y / 8 + x / 8) % 16 + 16) % 16
        yPlane(y * w + x) = (base + amp * S4(y % 8)).toInt
        x += 1
      }
      y += 1
    }
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    encode(w, h, Array((2, 2), (1, 1), (1, 1)),
      Array(yPlane, Array.fill(cw * ch)(cb), Array.fill(cw * ch)(cr)))
  }

  /** Header-only parse: walk markers to SOFn and return (w, h). None
    * when not a JPEG or no frame header before EOI/corruption.
    */
  def headerDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var pos = 2
    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val m = bytes(pos + 1) & 0xFF
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) pos += 2
      else if (m == 0xD9 || m == 0xDA) return None // scan/end before SOF
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        if ((m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC)
          return Some((u16(pos + 7), u16(pos + 5))) // (width, height)
        pos += 2 + len
      }
    }
    None
  }
}

/** Column-level JPEG operators (the `Multimodal` family's JPEG leg). */
object Jpeg {
  import JpegCodec._

  private val jpegGrayUdf = udf(JpegCodec.jpegGrayImpl _)

  /** Column builder for the complete-JPEG fixture stream (q_m6). */
  def jpegPixelPayload(seed: Column, width: Column, height: Column): Column =
    jpegGrayUdf(seed, width, height)

  /** REAL pixel decode of a baseline JPEG: full marker walk, Huffman
    * entropy decode, dequantization, IDCT, level shift (+ chroma
    * upsample and YCbCr→RGB for color). Returns (width, height,
    * n_pixel_bytes, pixel_sum, row0_sum) where pixel_sum is the sum of
    * every output sample byte and row0_sum the sum over image row 0 —
    * row0_sum is sensitive to the AC spectrum that full-block sums
    * cancel, so a DC-only shortcut decoder cannot fake it. Null for
    * anything outside the baseline contract (progressive, 12-bit,
    * arithmetic, corrupt, non-JPEG): decode failures must be visible.
    */
  private[llm] def decodeJpegPixelsImpl(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    decode(bytes).map { d =>
      var sum = 0L
      var i = 0
      while (i < d.pixels.length) { sum += d.pixels(i) & 0xFF; i += 1 }
      var row0 = 0L
      val rowBytes = d.width * d.nComp
      i = 0
      while (i < rowBytes) { row0 += d.pixels(i) & 0xFF; i += 1 }
      (d.width, d.height, d.pixels.length.toLong, sum, row0)
    }
  private val decodeJpegPixelsUdf = udf(decodeJpegPixelsImpl _)

  /** Pixel-decode column: struct(width, height, n_pixel_bytes,
    * pixel_sum, row0_sum) or null for non-decodable payloads.
    */
  def decodeJpegPixels(payload: Column): Column =
    decodeJpegPixelsUdf(payload).cast(
      "struct<width:int,height:int,n_pixel_bytes:bigint,pixel_sum:bigint,row0_sum:bigint>")

  private val headerUdf = udf((b: Array[Byte]) => JpegCodec.headerDims(b))

  /** Header-only dims column: struct(width, height) or null. */
  def jpegHeaderDims(payload: Column): Column =
    headerUdf(payload).cast("struct<width:int,height:int>")
}
