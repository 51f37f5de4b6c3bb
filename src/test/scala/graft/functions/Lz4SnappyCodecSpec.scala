package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-JVM LZ4 + Snappy codecs (the shard-codec pair next to
  * ShardCodec's gzip): spec test vectors for xxHash32, hand-decoded
  * sequence layouts for both block formats, frame-level integrity
  * checks (magic / header checksum / content checksum), loud failure on
  * corruption, and deterministic round trips across adversarial inputs
  * (empty, incompressible pseudo-random, highly repetitive / RLE
  * overlap, block-boundary sizes). */
class Lz4SnappyCodecSpec extends AnyFunSuite {

  // deterministic pseudo-random bytes (no Math.random in tests either)
  private def prBytes(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed | 1
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 56).toByte
      i += 1
    }
    out
  }

  // ── xxHash32 spec vectors ─────────────────────────────────────────────
  test("xxh32 matches the published spec vectors") {
    // xxhash_spec.md: XXH32 of an empty input with seed 0
    assert(Lz4Codec.xxh32(Array.emptyByteArray, 0) === 0x02CC5D05)
    // one-shot vs chunk-path consistency: 0-, 3-, 4-, 15-, 16-, 17-byte
    // inputs walk every branch (stripe loop, 4-byte tail, byte tail)
    for (n <- Seq(0, 1, 3, 4, 5, 15, 16, 17, 31, 32, 33, 255)) {
      val b = prBytes(n, n + 7L)
      // offset/len variant must agree with the full-array variant
      val padded = (prBytes(8, 99L) ++ b) ++ prBytes(8, 101L)
      assert(Lz4Codec.xxh32(padded, 8, n, 12345) ===
        Lz4Codec.xxh32(b, 12345))
    }
  }

  test("xxh32 seed changes the hash; input bit flips change the hash") {
    val b = prBytes(64, 5L)
    assert(Lz4Codec.xxh32(b, 0) !== Lz4Codec.xxh32(b, 1))
    val b2 = b.clone(); b2(17) = (b2(17) ^ 1).toByte
    assert(Lz4Codec.xxh32(b, 0) !== Lz4Codec.xxh32(b2, 0))
  }

  // ── LZ4 block format ─────────────────────────────────────────────────
  test("lz4 block: hand-decodable layout for a known repetitive input") {
    // "abcd" * 8: greedy parser finds the period-4 match at i=4 and
    // extends it to n-5 (the last-5-literals rule), so the layout is
    // token(lit=4, mlen-ext), "abcd", offset=4, ext byte, 5 literals
    val src = ("abcd" * 8).getBytes("UTF-8")
    val comp = Lz4Codec.compressBlock(src)
    assert(((comp(0) >> 4) & 0xF) === 4) // 4 leading literals
    assert((comp(0) & 0xF) === 15) // match len 23 → nibble 15 + ext
    assert(((comp(5) & 0xFF) | ((comp(6) & 0xFF) << 8)) === 4) // offset 4
    assert((comp(7) & 0xFF) === 23 - 4 - 15) // length extension byte
    assert(Lz4Codec.decompressBlock(comp, src.length).toSeq === src.toSeq)
  }

  test("lz4 block: round trip across adversarial inputs") {
    val inputs = Seq(
      Array.emptyByteArray,
      "x".getBytes("UTF-8"),
      "hello".getBytes("UTF-8"),
      prBytes(11, 3L), // below the 12-byte match window: all literals
      prBytes(4096, 17L), // incompressible
      Array.fill(70000)('z'.toByte), // RLE overlap + >64KB length runs
      ("the quick brown fox " * 400).getBytes("UTF-8"),
      prBytes(300, 23L) ++ Array.fill(300)('q'.toByte) ++ prBytes(300, 23L))
    for (src <- inputs) {
      val comp = Lz4Codec.compressBlock(src)
      assert(Lz4Codec.decompressBlock(comp, src.length).toSeq === src.toSeq,
        s"lz4 block round trip failed for n=${src.length}")
    }
  }

  test("lz4 block: repetitive input actually compresses") {
    val src = ("lorem ipsum dolor sit amet " * 200).getBytes("UTF-8")
    assert(Lz4Codec.compressBlock(src).length < src.length / 4)
  }

  test("lz4 block decoder rejects bad offsets and overruns") {
    // token: 0 literals + match, offset 1 with nothing decoded yet
    val bad = Array[Byte](0x01, 0x01, 0x00, 0x00)
    intercept[IllegalArgumentException] {
      Lz4Codec.decompressBlock(bad, 8)
    }
    // capacity semantics (round-13 advisory fix): a block smaller than
    // the cap decodes to its ACTUAL length — foreign frames flush
    // non-full blocks routinely; whole-content length is the frame
    // layer's job (content-size field + xxh32 trailer)
    val src = "abcdabcdabcdabcd".getBytes("UTF-8")
    val good = Lz4Codec.compressBlock(src)
    assert(Lz4Codec.decompressBlock(good, 999).toSeq === src.toSeq)
    // ...but output beyond the cap still throws
    intercept[IllegalArgumentException] {
      Lz4Codec.decompressBlock(good, 7)
    }
  }

  test("lz4 frame: foreign frames with non-full blocks and no content size") {
    // hand-build a conformant frame our encoder would never emit:
    // FLG without the content-size bit, tiny non-full blocks (streaming
    // flush),
    // content checksum present — a spec-conformant foreign writer
    val parts = Seq("alpha beta gamma ", "d", "elta epsilon zeta eta theta ",
      "iota kappa lambda mu nu xi omicron pi rho sigma tau ")
    val raw = parts.mkString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    w32(0x184D2204)
    val flg = (1 << 6) | (1 << 2) // v1, content checksum, NO content size
    val bd = 0x40 // 64 KB block max
    w8(flg); w8(bd)
    w8(Lz4Codec.xxh32(Array(flg.toByte, bd.toByte), 0, 2, 0) >>> 8)
    for (p <- parts) {
      val block = p.getBytes("UTF-8")
      val comp = Lz4Codec.compressBlock(block)
      if (comp.length < block.length) { w32(comp.length); out.write(comp) }
      else { w32(block.length | 0x80000000); out.write(block) }
    }
    w32(0)
    w32(Lz4Codec.xxh32(raw, 0, raw.length, 0))
    assert(Lz4Codec.decompressFrame(out.toByteArray).toSeq === raw.toSeq)
  }

  // ── LZ4 frame format ─────────────────────────────────────────────────
  test("lz4 frame: magic + flags + round trip, multi-block above 64KB") {
    val src = ("shard line payload " * 9000).getBytes("UTF-8") // >64KB
    val frame = Lz4Codec.compressFrame(src)
    assert((frame(0) & 0xFF) === 0x04 && (frame(1) & 0xFF) === 0x22 &&
      (frame(2) & 0xFF) === 0x4D && (frame(3) & 0xFF) === 0x18) // LE magic
    assert(frame.length < src.length / 4)
    assert(Lz4Codec.decompressFrame(frame).toSeq === src.toSeq)
    // incompressible content survives via stored blocks
    val rnd = prBytes(100000, 77L)
    assert(Lz4Codec.decompressFrame(Lz4Codec.compressFrame(rnd)).toSeq
      === rnd.toSeq)
    // empty content is a legal frame
    assert(Lz4Codec.decompressFrame(
      Lz4Codec.compressFrame(Array.emptyByteArray)).isEmpty)
  }

  test("lz4 frame fails loudly on header or content corruption") {
    val src = ("abc " * 100).getBytes("UTF-8")
    val frame = Lz4Codec.compressFrame(src)
    val badMagic = frame.clone(); badMagic(0) = 0x05
    intercept[IllegalArgumentException] { Lz4Codec.decompressFrame(badMagic) }
    val badHc = frame.clone(); badHc(14) = (badHc(14) ^ 0x5A).toByte
    intercept[IllegalArgumentException] { Lz4Codec.decompressFrame(badHc) }
    // flip one payload byte → the parse must never return WRONG content:
    // either it throws (structure or xxh32 content checksum), or the
    // output is byte-identical (the one such bit is the final token's
    // match nibble, which the format defines as meaningless — the last
    // sequence is literals-only and decoders ignore its match half)
    for (k <- 15 until frame.length - 4) {
      val bad = frame.clone(); bad(k) = (bad(k) ^ 1).toByte
      val out = try Some(Lz4Codec.decompressFrame(bad))
        catch { case _: Exception => None }
      out.foreach(o => assert(o.toSeq === src.toSeq,
        s"flip at $k returned silently-corrupted content"))
    }
  }

  // ── Snappy raw format ────────────────────────────────────────────────
  test("snappy: varint preamble and hand-decodable literal layout") {
    val src = "hi".getBytes("UTF-8")
    val comp = SnappyCodec.compress(src)
    assert((comp(0) & 0xFF) === 2) // varint 2
    assert((comp(1) & 0xFF) === ((2 - 1) << 2)) // literal tag, len 2
    assert(comp(2) === 'h'.toByte && comp(3) === 'i'.toByte)
    // 300 bytes forces the multi-byte varint path (300 = 0xAC 0x02)
    val big = prBytes(300, 9L)
    val c2 = SnappyCodec.compress(big)
    assert((c2(0) & 0xFF) === 0xAC && (c2(1) & 0xFF) === 0x02)
    assert(SnappyCodec.decompress(c2).toSeq === big.toSeq)
  }

  test("snappy: round trip across adversarial inputs") {
    val inputs = Seq(
      Array.emptyByteArray,
      "x".getBytes("UTF-8"),
      prBytes(3, 1L),
      prBytes(4096, 41L), // incompressible
      Array.fill(70000)('z'.toByte), // RLE overlap, >64-byte copies
      ("the quick brown fox " * 400).getBytes("UTF-8"),
      ("ab" * 40000).getBytes("UTF-8")) // period-2 overlap copies
    for (src <- inputs) {
      val comp = SnappyCodec.compress(src)
      assert(SnappyCodec.decompress(comp).toSeq === src.toSeq,
        s"snappy round trip failed for n=${src.length}")
    }
  }

  test("snappy: repetitive input compresses; 1-byte-offset form used") {
    val src = ("lorem ipsum dolor sit amet " * 200).getBytes("UTF-8")
    assert(SnappyCodec.compress(src).length < src.length / 4)
    // a short near repeat (len 4..11, offset < 2048) must take the
    // compact tag-01 form: "abcdefgh.XY.abcdefgh" + incompressible tail
    // → greedy emits copy(off=12, len=8)
    val near = "abcdefgh.XY.abcdefgh".getBytes("UTF-8") ++ prBytes(32, 3L)
    val comp = SnappyCodec.compress(near)
    var i = 0
    while ((comp(i) & 0x80) != 0) i += 1
    i += 1
    var sawTag1 = false
    while (i < comp.length && !sawTag1) {
      val tag = comp(i) & 0xFF
      (tag & 3) match {
        case 0 =>
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60; len = 0
            for (k <- 0 until extra) len |= (comp(i + 1 + k) & 0xFF) << (8 * k)
            len += 1; i += extra
          }
          i += 1 + len
        case 1 =>
          sawTag1 = true
          assert((((tag >>> 2) & 0x7) + 4) === 8) // len 8
          assert(((tag >>> 5) << 8 | (comp(i + 1) & 0xFF)) === 12) // off 12
        case 2 => i += 3
        case _ => i += 5
      }
    }
    assert(sawTag1, "expected at least one 1-byte-offset copy")
    assert(SnappyCodec.decompress(comp).toSeq === near.toSeq)
  }

  test("snappy decoder rejects malformed streams") {
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(Array[Byte](0x08, 0x01, 0x01)) // copy before data
    }
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(Array[Byte](-1, -1, -1, -1, -1)) // varint runaway
    }
    val good = SnappyCodec.compress(prBytes(100, 13L))
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(good.dropRight(5)) // truncated literals
    }
  }

  test("snappy decoder rejects hostile Int-overflow inputs with the " +
      "documented exception (round-13 advisory fix)") {
    // 5-byte varint declaring 2^31 (sign bit): must be
    // IllegalArgumentException, not NegativeArraySizeException
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(
        Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x08))
    }
    // literal with a 4-extra-byte length whose sign bit is set: the
    // assembled len is negative and must be rejected before the copy
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(Array[Byte](
        0x05, // declared length 5
        0xFC.toByte, // literal tag, 4 extra length bytes
        0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, // len = -1 + 1
        0x61, 0x62))
    }
    // truncated copy tags: contract exception, not ArrayIndexOutOfBounds
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(Array[Byte](0x08, 0x61)) // copy-1 tag, offset byte missing
    }
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(Array[Byte](0x08, 0x62, 0x01)) // copy-2 tag, one offset byte
    }
    intercept[IllegalArgumentException] {
      SnappyCodec.decompress(Array[Byte](0x08, 0x63, 0x01, 0x01)) // copy-4 tag, two bytes
    }
  }
}
