package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the zstd RAW/RLE frame codec and xxHash64: spec vectors,
  * hand-decoded frame layout, block planning (runs → RLE), loud
  * failures (magic, checksum, the labeled Compressed_Block seam). */
class ZstdCodecSpec extends AnyFunSuite {

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

  test("xxh64 matches the published spec vector and is offset-consistent") {
    assert(ZstdCodec.xxh64(Array.emptyByteArray, 0L) === 0xEF46DB3751D8E999L)
    for (n <- Seq(0, 1, 3, 4, 7, 8, 31, 32, 33, 100)) {
      val b = prBytes(n, n + 3L)
      val padded = prBytes(8, 1L) ++ b ++ prBytes(8, 2L)
      assert(ZstdCodec.xxh64(padded, 8, n, 42L) === ZstdCodec.xxh64(b, 42L))
    }
    val b = prBytes(64, 9L)
    assert(ZstdCodec.xxh64(b, 0L) !== ZstdCodec.xxh64(b, 1L))
  }

  test("frame layout: magic, descriptor, FCS; hand-decoded blocks") {
    val src = "abcdef".getBytes("UTF-8")
    val f = ZstdCodec.compressFrame(src)
    // LE magic 0xFD2FB528
    assert((f(0) & 0xFF, f(1) & 0xFF, f(2) & 0xFF, f(3) & 0xFF)
      === ((0x28, 0xB5, 0x2F, 0xFD)))
    assert((f(4) & 0xFF) === 0xA4) // single-segment + FCS-4B + checksum
    assert(ZstdCodec.contentSize(f) === 6L)
    // one RAW last block: header = 1 | (0<<1) | (6<<3) = 0x31
    assert((f(9) & 0xFF) === 0x31 && f(10) === 0 && f(11) === 0)
    assert(new String(f, 12, 6, "UTF-8") === "abcdef")
    assert(ZstdCodec.decompressFrame(f).toSeq === src.toSeq)
  }

  test("runs become RLE blocks; frame shrinks accordingly") {
    val src = ("head" + "z" * 10000 + "tail").getBytes("UTF-8")
    val f = ZstdCodec.compressFrame(src)
    assert(f.length < 100, s"RLE should collapse the run, got ${f.length}")
    assert(ZstdCodec.decompressFrame(f).toSeq === src.toSeq)
    // run at the very END must still close the frame correctly
    val src2 = ("head" + "q" * 5000).getBytes("UTF-8")
    assert(ZstdCodec.decompressFrame(ZstdCodec.compressFrame(src2)).toSeq
      === src2.toSeq)
    // run at the very START
    val src3 = ("r" * 5000 + "tail").getBytes("UTF-8")
    assert(ZstdCodec.decompressFrame(ZstdCodec.compressFrame(src3)).toSeq
      === src3.toSeq)
  }

  test("round trip across adversarial inputs") {
    val inputs = Seq(
      Array.emptyByteArray,
      "x".getBytes("UTF-8"),
      prBytes(200000, 7L), // incompressible, multi-block (>64KB RAW)
      Array.fill(300000)('z'.toByte), // one giant RLE (>21-bit? no, fits)
      ("ab" * 31).getBytes("UTF-8"), // short run below MinRleRun
      prBytes(100, 5L) ++ Array.fill(40)('k'.toByte) ++ prBytes(100, 6L))
    for (src <- inputs) {
      val f = ZstdCodec.compressFrame(src)
      assert(ZstdCodec.decompressFrame(f).toSeq === src.toSeq,
        s"round trip failed n=${src.length}")
    }
  }

  test("xxh64 agrees with the INDEPENDENT lz4-java implementation " +
      "across all length classes and seeds (round-13 triangulation)") {
    // lz4-java ships on the Spark classpath; its XXHash64 is a separate
    // implementation of the same public spec — disagreement anywhere
    // means our from-spec port is wrong even if self-consistent
    val jni = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance().hash64()
    for (len <- Seq(0, 1, 3, 4, 5, 7, 8, 9, 16, 31, 32, 33, 63, 64, 127,
        1000, 65536); seed <- Seq(0L, 1L, 0x123456789ABCDEFL)) {
      val buf = prBytes(len, len * 31 + seed)
      assert(ZstdCodec.xxh64(buf, 0, len, seed) ===
        jni.hash(buf, 0, len, seed), s"len=$len seed=$seed")
    }
  }

  test("zstd-jni (the reference C implementation) decodes our frames " +
      "bit-identically — RAW, RLE, multi-block (round-13 triangulation)") {
    val inputs = Seq(
      prBytes(10000, 7L),
      Array.fill(5000)('z'.toByte),
      prBytes(200000, 11L), // multi-block RAW
      ("head" + "q" * 5000 + "tail").getBytes("UTF-8"),
      "shard line one\nshard line two\n".getBytes("UTF-8"),
      Array.emptyByteArray)
    for (src <- inputs) {
      val f = ZstdCodec.compressFrame(src)
      val back = com.github.luben.zstd.Zstd.decompress(f, src.length)
      assert(back.toSeq === src.toSeq, s"zstd-jni reject at n=${src.length}")
    }
  }

  test("loud failures: magic, checksum, compressed-block seam, dict") {
    val f = ZstdCodec.compressFrame("payload data here".getBytes("UTF-8"))
    val badMagic = f.clone(); badMagic(0) = 0x29
    intercept[IllegalArgumentException] { ZstdCodec.decompressFrame(badMagic) }
    val badData = f.clone(); badData(13) = (badData(13) ^ 1).toByte
    intercept[IllegalArgumentException] { ZstdCodec.decompressFrame(badData) }
    // block type 2 (Compressed_Block) → labeled rejection
    val comp = f.clone(); comp(9) = (comp(9) | 0x04).toByte // type bits ← 2
    val e = intercept[IllegalArgumentException] {
      ZstdCodec.decompressFrame(comp)
    }
    assert(e.getMessage.contains("labeled"))
    // dict-id flag set → unsupported
    val dict = f.clone(); dict(4) = (dict(4) | 0x01).toByte
    intercept[IllegalArgumentException] { ZstdCodec.decompressFrame(dict) }
  }
}
