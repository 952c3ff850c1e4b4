package graft.multimodal

/** Real public-format media codec — 24-bit BMP (BITMAPINFOHEADER,
  * bottom-up rows, 4-byte row padding) and 16-bit PCM RIFF/WAVE (chunk
  * walk to the `data` chunk). The container ships no codec libraries,
  * so payloads are SYNTHESIZED — each document's pixels/samples are a
  * closed-form function of doc_id — but the parse is a true header
  * decode: magic check, LE field extraction, padding arithmetic, chunk
  * traversal. Malformed payloads are rejected, not guessed at.
  *
  * Reference analog: binary cell handling in the HBase ingest
  * (load_hbase_sessions_stream.py:15–18) — generalized to typed media
  * decode, the operation a 100 TB multimodal training pipeline runs on
  * every image/audio row.
  */
object MediaCodec {

  /** Decoded per-payload statistics. For BMP: width × height pixels,
    * stats over the blue channel. For WAV: n samples, height = 1,
    * stats over signed sample values.
    */
  final case class Media(
      kind: String, width: Long, height: Long, nUnits: Long,
      meanVal: Double, maxVal: Long)

  // ---- little-endian helpers -------------------------------------------

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  // ---- synthesis formulas (mirrored in the DuckDB oracle) --------------

  def bmpWidth(docId: Long): Int  = (docId % 21).toInt + 2
  def bmpHeight(docId: Long): Int = (docId % 13).toInt + 2
  /** Grayscale value of pixel k (row-major), k in [0, w·h). */
  def bmpPixel(docId: Long, k: Int): Int = ((docId * 31 + k * 7) % 256).toInt

  def wavSamples(docId: Long): Int = (docId % 50).toInt + 10
  /** Signed 16-bit sample k. */
  def wavSample(docId: Long, k: Int): Int = ((docId * 13 + k * 11) % 4096).toInt - 2048

  // ---- encoders --------------------------------------------------------

  /** 24-bit uncompressed BMP; all three channels carry the pixel value. */
  def encodeBmp(docId: Long): Array[Byte] = {
    val w = bmpWidth(docId); val h = bmpHeight(docId)
    val rowSize  = (3 * w + 3) & ~3
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, out.length); le32(out, 10, 54)
    le32(out, 14, 40); le32(out, 18, w); le32(out, 22, h)
    le16(out, 26, 1); le16(out, 28, 24)
    le32(out, 34, dataSize); le32(out, 38, 2835); le32(out, 42, 2835)
    var r = 0
    while (r < h) {
      val y   = h - 1 - r // bottom-up storage
      val off = 54 + r * rowSize
      var x = 0
      while (x < w) {
        val v = bmpPixel(docId, y * w + x).toByte
        out(off + 3 * x) = v; out(off + 3 * x + 1) = v; out(off + 3 * x + 2) = v
        x += 1
      }
      r += 1
    }
    out
  }

  /** Mono 16-bit PCM WAV at 8 kHz. */
  def encodeWav(docId: Long): Array[Byte] = {
    val n   = wavSamples(docId)
    val out = new Array[Byte](44 + 2 * n)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, out.length - 8)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16); le16(out, 20, 1); le16(out, 22, 1)
    le32(out, 24, 8000); le32(out, 28, 16000); le16(out, 32, 2); le16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, 2 * n)
    var k = 0
    while (k < n) { le16(out, 44 + 2 * k, wavSample(docId, k) & 0xffff); k += 1 }
    out
  }

  // ---- decoders --------------------------------------------------------

  def decode(bytes: Array[Byte]): Media =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') decodeWav(bytes)
    else throw new IllegalArgumentException(
      s"unrecognized media payload (${bytes.length} bytes)")

  private def decodeBmp(b: Array[Byte]): Media = {
    require(b.length >= 54, "BMP truncated before headers")
    val dataOff = rd32(b, 10)
    val w       = rd32(b, 18)
    val h       = rd32(b, 22)
    val bpp     = rd16(b, 28)
    require(bpp == 24, s"unsupported BMP bpp $bpp")
    require(w > 0 && h > 0, s"bad BMP dimensions ${w}x$h")
    require(dataOff >= 54 && dataOff <= b.length, s"bad BMP data offset $dataOff")
    // row size in LONG: 3*w wraps Int for a corrupt width, and a
    // wrapped-negative rowSize would sail through the bound check
    val rowSizeL = (3L * w + 3L) & ~3L
    require(b.length.toLong >= dataOff.toLong + rowSizeL * h,
      "BMP truncated before pixel data")
    val rowSize = rowSizeL.toInt // safe: bound above caps it at b.length
    var sum = 0L; var max = Long.MinValue
    var r = 0
    while (r < h) {
      val off = dataOff + r * rowSize
      var x = 0
      while (x < w) {
        val v = b(off + 3 * x) & 0xff // blue channel
        sum += v; if (v > max) max = v
        x += 1
      }
      r += 1
    }
    val n = w.toLong * h
    Media("bmp", w, h, n, sum.toDouble / n, max)
  }

  /** Full BMP pixel decode: (width, height, row-major grayscale values)
    * — undoes the bottom-up row storage and padding, so pixel (x, y) is
    * at index y·w + x exactly as synthesized.
    */
  def decodeBmpPixels(b: Array[Byte]): (Int, Int, Array[Int]) = {
    require(b.length >= 54, "BMP truncated before headers")
    require(b(0) == 'B' && b(1) == 'M', "not a BMP payload")
    val dataOff = rd32(b, 10)
    val w       = rd32(b, 18)
    val h       = rd32(b, 22)
    require(rd16(b, 28) == 24, "unsupported BMP bpp")
    require(w > 0 && h > 0, s"bad BMP dimensions ${w}x$h")
    require(dataOff >= 54 && dataOff <= b.length, s"bad BMP data offset $dataOff")
    // row size in LONG: 3*w wraps Int for a corrupt width, and a
    // wrapped-negative rowSize would sail through the bound check
    val rowSizeL = (3L * w + 3L) & ~3L
    require(b.length.toLong >= dataOff.toLong + rowSizeL * h,
      "BMP truncated before pixel data")
    val rowSize = rowSizeL.toInt // safe: bound above caps it at b.length
    val px = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      val y   = h - 1 - r // rows are stored bottom-up
      val off = dataOff + r * rowSize
      var x = 0
      while (x < w) { px(y * w + x) = b(off + 3 * x) & 0xff; x += 1 }
      r += 1
    }
    (w, h, px)
  }

  /** Nearest-neighbor resize of a row-major image to w2×h2:
    * out(x2, y2) = in(⌊x2·w/w2⌋, ⌊y2·h/h2⌋) — the standard integer
    * formulation, mirrored verbatim in the DuckDB oracle.
    */
  def resizeNearest(
      w: Int, h: Int, px: Array[Int], w2: Int, h2: Int): Array[Int] = {
    require(px.length == w * h, "pixel buffer does not match dimensions")
    val out = new Array[Int](w2 * h2)
    var y2 = 0
    while (y2 < h2) {
      val sy = y2 * h / h2
      var x2 = 0
      while (x2 < w2) {
        out(y2 * w2 + x2) = px(sy * w + x2 * w / w2)
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Average hash (aHash) of an image: 8×8 nearest-neighbor thumbnail,
    * bit j set when thumb_j ≥ mean — compared as v·64 ≥ Σv, pure integer
    * arithmetic, so there is no float-rounding seam to diverge from a
    * SQL oracle. Cheap but FRAGILE under clamped brightness/contrast
    * shifts (saturation moves the mean relative to mid pixels);
    * [[phash64]] is the robust production hash — aHash is kept as the
    * comparison baseline MultimodalSpec grades pHash against.
    */
  def ahash64(w: Int, h: Int, px: Array[Int]): Long = {
    val t = resizeNearest(w, h, px, 8, 8)
    var sum = 0L
    var j   = 0
    while (j < t.length) { sum += t(j); j += 1 }
    var bits = 0L
    j = 0
    while (j < t.length) {
      if (t(j).toLong * 64 >= sum) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** DCT bin width for [[phash64]]: cos(π(2x+1)u/32)·2^14 rounded to the
    * nearest long, u ∈ [0,8) (the low-frequency block), x ∈ [0,16) (the
    * thumbnail axis). The FIXED-POINT table — not a runtime cos() — is
    * what makes the hash bit-exact across engines: the DuckDB oracle
    * receives these exact integers as a VALUES literal, so both sides
    * run the identical all-integer DCT with zero float seams.
    */
  val PhashCos: Array[Array[Long]] =
    Array.tabulate(8, 16)((u, x) =>
      math.round(math.cos(math.Pi * (2 * x + 1) * u / 32.0) * 16384.0))

  /** Perceptual DCT hash (pHash): 16×16 thumbnail → exact integer 2-D
    * DCT-II (two separable passes over [[PhashCos]]) → the 8×8
    * low-frequency block minus the DC term (63 coefficients) → bit
    * j=u·8+v set when the coefficient exceeds the block median (the
    * 32nd-smallest of the 63, so bit 0 is always clear). Sign-vs-median
    * of low-frequency structure survives the clamped brightness shifts
    * that flip aHash's mean comparisons, which is why image dedup ships
    * on this hash. Overflow-safe by construction: |pass1| ≤
    * 255·2^14·16 < 2^27, |pass2| ≤ 2^27·2^14·16 < 2^55.
    */
  def phash64(w: Int, h: Int, px: Array[Int]): Long = {
    val t = resizeNearest(w, h, px, 16, 16)
    // pass 1: per row y, frequency u over x
    val f1 = Array.ofDim[Long](16, 8)
    var y = 0
    while (y < 16) {
      var u = 0
      while (u < 8) {
        var s = 0L
        var x = 0
        while (x < 16) { s += t(y * 16 + x) * PhashCos(u)(x); x += 1 }
        f1(y)(u) = s
        u += 1
      }
      y += 1
    }
    // pass 2: per (u, v), frequency v over y; skip DC (0,0)
    val coeffs = new Array[Long](63)
    var u = 0
    var i = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var s  = 0L
          var yy = 0
          while (yy < 16) { s += f1(yy)(u) * PhashCos(v)(yy); yy += 1 }
          coeffs(i) = s
          i += 1
        }
        v += 1
      }
      u += 1
    }
    val sorted = coeffs.clone()
    java.util.Arrays.sort(sorted)
    val med  = sorted(31) // 32nd smallest of 63 — the discrete median
    var bits = 0L
    u = 0
    i = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          if (coeffs(i) > med) bits |= (1L << (u * 8 + v))
          i += 1
        }
        v += 1
      }
      u += 1
    }
    bits
  }

  /** Chunk walk shared by the WAV stat and sample decoders: validates
    * the fmt chunk (PCM, mono, 16-bit) and returns the data chunk's
    * (offset, byte length).
    */
  private def wavData(b: Array[Byte]): (Int, Int) = {
    require(b.length >= 44, "WAV truncated before chunks")
    // walk chunks from offset 12 until the data chunk
    var off = 12
    var fmtOk = false
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length && dataOff < 0) {
      val id   = new String(b.slice(off, off + 4), "US-ASCII")
      val size = rd32(b, off + 4)
      // a corrupt negative size would make the cursor stall or move
      // backwards — an infinite loop on one bad row, not a parse error
      require(size >= 0, s"negative WAV chunk size $size")
      if (id == "fmt ") {
        require(off + 24 <= b.length, "fmt chunk truncated")
        require(rd16(b, off + 8) == 1, "non-PCM WAV")
        require(rd16(b, off + 10) == 1, "non-mono WAV")
        require(rd16(b, off + 22) == 16, "non-16-bit WAV")
        fmtOk = true
      } else if (id == "data") {
        dataOff = off + 8; dataLen = size
      }
      // Long math, like the BMP side's 3*w guard: a huge declared size
      // (e.g. 0x7FFFFFF8) wraps Int addition negative, which would both
      // stall this cursor and sail through the range check below —
      // decodeWavSamples would then allocate a bogus multi-GiB array
      val next = off.toLong + 8L + size.toLong + (size & 1)
      require(next <= b.length.toLong + 8L, s"WAV chunk size $size overruns payload")
      off = next.toInt
    }
    require(fmtOk, "WAV missing fmt chunk")
    require(
      dataOff > 0 && dataOff.toLong + dataLen.toLong <= b.length,
      "WAV data chunk out of range")
    require(dataLen / 2 > 0, "empty WAV")
    (dataOff, dataLen)
  }

  /** Raw sign-extended 16-bit samples — the frame-analysis decoders'
    * input (audio_energy_windows).
    */
  def decodeWavSamples(b: Array[Byte]): Array[Int] = {
    val (dataOff, dataLen) = wavData(b)
    val n   = dataLen / 2
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = (rd16(b, dataOff + 2 * k) << 16) >> 16 // sign-extend
      k += 1
    }
    out
  }

  private def decodeWav(b: Array[Byte]): Media = {
    val (dataOff, dataLen) = wavData(b)
    val n = dataLen / 2
    var sum = 0L; var max = Long.MinValue
    var k = 0
    while (k < n) {
      val v = (rd16(b, dataOff + 2 * k) << 16) >> 16 // sign-extend
      sum += v; if (v > max) max = v
      k += 1
    }
    Media("wav", n, 1, n, sum.toDouble / n, max)
  }
}
