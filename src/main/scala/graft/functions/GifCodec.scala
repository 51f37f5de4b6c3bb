package graft.functions

import graft.functions.ImageCodec.DecodedImage

/** Pure-JVM GIF87a codec — the second COMPRESSED image format in the
  * media family (after PNG), and the first whose compressor is
  * implemented here end to end: PNG leans on the JDK's DEFLATE, but GIF's
  * LZW has no JDK implementation, so both directions of the
  * variable-width LZW coder live in this file. Everything is public
  * spec (the CompuServe GIF87a specification / ISO 10918-agnostic):
  *
  *  - 6-byte signature `GIF87a` (decode also accepts `GIF89a` and skips
  *    its 0x21 extension blocks — sub-block framing makes that cheap);
  *  - logical screen descriptor (little-endian u16 dims) + a 256-entry
  *    global color table; the encoder writes the identity gray ramp
  *    (palette[i] = (i,i,i)) and the decoder maps indices through the
  *    palette's red channel — a non-gray GIF still decodes, as gray;
  *  - image descriptor at (0,0), no local color table (loud error
  *    otherwise); decode also accepts INTERLACED images (the four-pass
  *    row order of spec appendix E — the JDK's ImageIO GIF writer
  *    emits these, which is what the interop spec decodes);
  *  - LZW image data: 8-bit min code size, clear=256, EOI=257, codes
  *    grow 9→12 bits (width bumps when nextCode reaches 2^width, the
  *    GIF convention), dictionary reset via CLEAR when 4096 fills, all
  *    packed LSB-first into ≤255-byte sub-blocks.
  *
  * The dictionary is stored as (prefixCode, appendByte) pairs — decode
  * materializes a sequence by walking prefixes, so no per-entry byte
  * copies; encode keys a HashMap on `prefix<<8 | byte`. LZW is lossless,
  * so the m5-style closed-form codepoint oracle replays decoded stats
  * unchanged — and m26 additionally pins the LZW path against the
  * DEFLATE (png_gray) path on the same raster.
  *
  * Decoded output is normalized to the same [[DecodedImage]] contract as
  * Netpbm/BMP/PNG (row-major top-down, 0..255), so every downstream
  * stats/hash/pooling expression is format-agnostic.
  *
  * Reference scope: the reference pipeline has no media path at all
  * (/root/reference/tools.py is CSV/JSON/SQL only); beyond-reference
  * LLM-pipeline surface per the build brief.
  */
object GifCodec {

  /** True iff the payload starts with `GIF87a` or `GIF89a`. */
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private val ClearCode = 256
  private val EoiCode = 257
  private val FirstFree = 258
  private val MaxCode = 4096

  // ── LZW encoder ─────────────────────────────────────────────────────────

  /** GIF-LZW compress `data` (8-bit symbols) into the raw code stream
    * (NOT yet sub-block framed).
    *
    * Width discipline (the interop-critical part): the width check runs
    * AFTER each emitted code — any kind, data/CLEAR/EOI — against the
    * next free dictionary code, and bumps when `nextCode >= 2^width`.
    * The decoder mirrors it with a post-increment `> 2^width` check on
    * a per-code-READ counter; the pairing stays in sync even at the
    * flush/EOI boundary where the encoder's final data code adds no
    * dictionary entry (the classic GIF LZW off-by-one). */
  private[functions] def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    var bitBuf = 0; var bitCnt = 0
    var width = 9
    val dict = new java.util.HashMap[Integer, Integer](8192)
    var nextCode = FirstFree
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt; bitCnt += width
      while (bitCnt >= 8) {
        out.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8
      }
      if (nextCode >= (1 << width) && width < 12) width += 1
    }
    emit(ClearCode)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          if (nextCode >= MaxCode - 1) {
            // one short of full: reset rather than assign 4095 (the
            // GIFLIB convention; avoids the deferred-clear ambiguity)
            emit(ClearCode)
            dict.clear(); nextCode = FirstFree; width = 9
          } else {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
          }
          cur = k
        }
        i += 1
      }
      emit(cur)
    }
    emit(EoiCode)
    if (bitCnt > 0) out.write(bitBuf & 0xff)
    out.toByteArray
  }

  // ── encoder ─────────────────────────────────────────────────────────────

  /** Encode a grayscale raster as GIF87a with the identity gray
    * palette. `gray` is row-major top-down, one byte per pixel. */
  def encodeGif(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height,
      s"gif: raster ${gray.length} != ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(gray.length + 1024)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xf7) // GCT present, color res 8, GCT size 2^(7+1)=256
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio: unspecified
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no LCT, no interlace
    out.write(8)    // LZW min code size
    val codes = lzwCompress(gray)
    var off = 0
    while (off < codes.length) {
      val n = math.min(255, codes.length - off)
      out.write(n); out.write(codes, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ── decoder ─────────────────────────────────────────────────────────────

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"gif: $msg")

  /** Decode a GIF87a/89a payload to a grayscale [[DecodedImage]]
    * (indices mapped through the palette's red channel). */
  def decodeGif(b: Array[Byte]): DecodedImage = {
    if (!sniff(b)) fail("bad signature")
    var pos = 6
    def u8(): Int = {
      if (pos >= b.length) fail("truncated"); val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val lo = u8(); val hi = u8(); lo | (hi << 8) }
    val sw = u16(); val sh = u16()
    val packed = u8(); u8(); u8() // bg index, aspect
    val hasGct = (packed & 0x80) != 0
    if (!hasGct) fail("missing global color table")
    val gctSize = 2 << (packed & 0x07)
    val palette = new Array[Byte](gctSize)
    var i = 0
    while (i < gctSize) { palette(i) = u8().toByte; u8(); u8(); i += 1 }
    // skip extension blocks (GIF89a), find the image descriptor
    var sep = u8()
    while (sep == 0x21) {
      u8() // extension label
      var len = u8()
      while (len != 0) { pos += len; len = u8() }
      sep = u8()
    }
    if (sep != 0x2c) fail(f"expected image descriptor, got 0x$sep%02x")
    val left = u16(); val top = u16(); val w = u16(); val h = u16()
    if (left != 0 || top != 0 || w != sw || h != sh)
      fail(s"sub-rectangle images unsupported ($left,$top ${w}x$h vs ${sw}x$sh)")
    val idPacked = u8()
    if ((idPacked & 0x80) != 0) fail("local color tables unsupported")
    val interlaced = (idPacked & 0x40) != 0
    val minCodeSize = u8()
    if (minCodeSize != 8) fail(s"min code size $minCodeSize (want 8)")
    // concatenate the data sub-blocks
    val codeBytes = new java.io.ByteArrayOutputStream(w * h)
    var len = u8()
    while (len != 0) {
      if (pos + len > b.length) fail("truncated data sub-block")
      codeBytes.write(b, pos, len); pos += len; len = u8()
    }
    val raw = lzwDecompress(codeBytes.toByteArray, w * h)
    // undo interlacing if present: stored row order is the four GIF
    // passes (y ≡ 0 mod 8; 4 mod 8; 2 mod 4; odd), spec appendix E
    val px =
      if (!interlaced) raw
      else {
        val o = new Array[Byte](w * h)
        var row = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var y = start
          while (y < h) {
            System.arraycopy(raw, row * w, o, y * w, w)
            row += 1; y += step
          }
        }
        o
      }
    // map indices through the palette (red channel)
    val out = new Array[Int](w * h)
    i = 0
    while (i < out.length) {
      val idx = px(i) & 0xff
      if (idx >= gctSize) fail(s"palette index $idx >= $gctSize")
      out(i) = palette(idx) & 0xff
      i += 1
    }
    DecodedImage(w, h, 1, out)
  }

  /** GIF-LZW decompress the raw code stream into exactly `expect`
    * 8-bit symbols. */
  private[functions] def lzwDecompress(codes: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var outPos = 0
    var bitPos = 0
    val totalBits = codes.length * 8
    var width = 9
    // dictionary as (prefix, append) pairs; 0..255 are roots
    val prefix = new Array[Int](MaxCode)
    val append = new Array[Byte](MaxCode)
    var nextCode = FirstFree
    var prev = -1
    // per-code-READ counter mirroring the encoder's emission-side width
    // checks (see lzwCompress): post-increment, strict `>` — the extra
    // count vs `nextCode` absorbs the encoder's add-free flush emit
    var runningCode = FirstFree
    def readCode(): Int = {
      if (bitPos + width > totalBits) fail("code stream exhausted")
      var v = 0; var got = 0
      while (got < width) {
        val byteIdx = (bitPos + got) >> 3
        val bitIdx = (bitPos + got) & 7
        val take = math.min(8 - bitIdx, width - got)
        v |= (((codes(byteIdx) & 0xff) >> bitIdx) & ((1 << take) - 1)) << got
        got += take
      }
      bitPos += width
      runningCode += 1
      if (runningCode > (1 << width) && width < 12) width += 1
      v
    }
    // materialize `code`'s sequence into out (walking the prefix chain)
    val stack = new Array[Byte](MaxCode)
    def writeSeq(code: Int): Byte = {
      var sp = 0; var c = code
      while (c >= FirstFree) {
        stack(sp) = append(c); sp += 1; c = prefix(c)
        if (sp > MaxCode) fail("prefix cycle")
      }
      val first = c.toByte
      if (outPos + sp + 1 > expect) fail("more pixels than expected")
      out(outPos) = first; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      first
    }
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= FirstFree) c = prefix(c)
      c.toByte
    }
    def addEntry(pfx: Int, app: Byte): Unit =
      // silently stop adding when full (deferred-clear tolerance; our
      // own encoder CLEARs one entry before this point)
      if (nextCode < MaxCode) {
        prefix(nextCode) = pfx; append(nextCode) = app
        nextCode += 1
      }
    var done = false
    while (!done) {
      val code = readCode()
      if (code == ClearCode) {
        nextCode = FirstFree; runningCode = FirstFree; width = 9; prev = -1
      }
      else if (code == EoiCode) done = true
      else if (prev == -1) {
        if (code >= FirstFree) fail(s"first code $code not a root")
        writeSeq(code); prev = code
      } else if (code < nextCode) {
        // known sequence: emit it, then add seq(prev)+first(seq(code))
        addEntry(prev, firstByteOf(code))
        writeSeq(code)
        prev = code
      } else if (code == nextCode) {
        // the KwKwK case: the entry being referenced is the one the
        // encoder just created — seq(prev) + first(seq(prev))
        addEntry(prev, firstByteOf(prev))
        writeSeq(code)
        prev = code
      } else fail(s"code $code beyond dictionary ($nextCode)")
    }
    if (outPos != expect) fail(s"decoded $outPos pixels, want $expect")
    out
  }
}
