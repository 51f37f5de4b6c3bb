package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the MP3 container census: syncsafe ID3 size, tag text
  * round trip, the frame-length formula against the public table, VBR
  * hop correctness, and loud rejection of malformed streams. */
class Mp3CensusSpec extends AnyFunSuite {

  test("round trip: planted tags and frame structure come back exactly") {
    for (id <- Seq(0L, 3L, 96L, 4999L)) {
      val info = Mp3Census.census(Mp3Census.buildMp3(id))
      assert(info.title === Mp3Census.plantedTitle(id))
      assert(info.artist === Mp3Census.plantedArtist(id))
      assert(info.nFrames === Mp3Census.plantedFrames(id))
      val expectBytes = (0 until info.nFrames).map { f =>
        Mp3Census.frameLength(
          Mp3Census.BitrateKbps(Mp3Census.plantedBitrateIdx(id, f)),
          Mp3Census.plantedPadding(id, f))
      }.sum
      assert(info.audioBytes === expectBytes.toLong)
      assert(info.durationMs ===
        info.nFrames.toLong * 1152 * 1000 / 44100)
      assert(info.id3Bytes === 22 + info.title.length + info.artist.length)
    }
  }

  test("syncsafe size: a tag body over 127 bytes still parses") {
    // id chosen so title+artist are long; the layout math must match the
    // 7-bit-per-byte coding, not a straight 32-bit read
    val id = 999L
    val b = Mp3Census.buildMp3(id)
    val tagSize = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    assert(tagSize === Mp3Census.census(b).id3Bytes)
    assert((b(6) | b(7) | b(8) | b(9)) >= 0) // high bits clear
  }

  test("frame lengths follow 144000·kbps/44100 + padding") {
    assert(Mp3Census.frameLength(128, 0) === 417)
    assert(Mp3Census.frameLength(128, 1) === 418)
    assert(Mp3Census.frameLength(320, 0) === 1044)
    assert(Mp3Census.frameLength(32, 1) === 105)
  }

  test("a corrupted sync byte is a loud failure, not a silent skip") {
    val b = Mp3Census.buildMp3(7L)
    val tagSize = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val bad = b.clone()
    bad(10 + tagSize) = 0x00 // first frame header byte
    val e = intercept[IllegalArgumentException](Mp3Census.census(bad))
    assert(e.getMessage.contains("sync"))
  }

  test("a Layer II stream is rejected (layer bits checked, not assumed)") {
    val b = Mp3Census.buildMp3(1L)
    val tagSize = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val bad = b.clone()
    val h1 = 10 + tagSize + 1
    bad(h1) = (bad(h1) & 0xf9 | 0x04).toByte // layer bits 10 = Layer II
    val e = intercept[IllegalArgumentException](Mp3Census.census(bad))
    assert(e.getMessage.contains("Layer III"))
  }
}
