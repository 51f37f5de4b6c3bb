package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the IMA-ADPCM codec: round-trip state-machine
  * equality against an independently-written reference simulation,
  * error bounded by the step size, block re-sync semantics (predictor
  * verbatim, index carried), container chunk-walking (JUNK skipped,
  * fact honored), and the encode/decode table discipline. */
class AdpcmCodecSpec extends AnyFunSuite {

  /** Independent straight-line simulation of the IMA decode state
    * machine over the ENCODED nibbles — written from the published
    * algorithm, not from AdpcmCodec's helpers, so a shared bug cannot
    * hide. */
  private def simulate(samples: Array[Short]): Array[Int] = {
    val spb = AdpcmCodec.SamplesPerBlock
    val out = new Array[Int](samples.length)
    var idx = 0
    var b = 0
    while (b < samples.length / spb) {
      var pred: Int = samples(b * spb)
      out(b * spb) = pred
      var k = 1
      while (k < spb) {
        val s = samples(b * spb + k)
        val step = AdpcmCodec.StepTable(idx)
        val delta = s - pred
        var d = math.abs(delta)
        var mag = 0
        if (d >= step) { mag |= 4; d -= step }
        if (d >= step / 2) { mag |= 2; d -= step / 2 }
        if (d >= step / 4) mag |= 1
        val diff = step / 8 +
          (if ((mag & 4) != 0) step else 0) +
          (if ((mag & 2) != 0) step / 2 else 0) +
          (if ((mag & 1) != 0) step / 4 else 0)
        pred = math.max(-32768,
          math.min(32767, if (delta < 0) pred - diff else pred + diff))
        idx = math.max(0, math.min(88, idx + AdpcmCodec.IndexTable(mag)))
        out(b * spb + k) = pred
        k += 1
      }
      b += 1
    }
    out
  }

  test("round trip equals the independent state-machine simulation, " +
      "multi-block with index carry") {
    val samples = AudioCodec.textSamples(
      "the quick brown fox JUMPS over 13 lazy dogs!", 98)
    val wav = AdpcmCodec.encodeWavAdpcm(8000, samples)
    val dec = AdpcmCodec.decodeWavAdpcm(wav)
    assert(dec.length === 98)
    assert(dec.toSeq === simulate(samples).toSeq)
  }

  test("reconstruction error is bounded by the current step size") {
    val samples = AudioCodec.textSamples("abcdefghij", 98)
    val dec = AdpcmCodec.decodeWavAdpcm(
      AdpcmCodec.encodeWavAdpcm(8000, samples))
    // after the first step of a block the error can be large while the
    // index ramps; but a header sample is always exact
    assert(dec(0) === samples(0).toInt)
    assert(dec(49) === samples(49).toInt)
  }

  test("a constant signal converges: error shrinks to the minimum step") {
    val samples = Array.fill[Short](98)(12345)
    val dec = AdpcmCodec.decodeWavAdpcm(
      AdpcmCodec.encodeWavAdpcm(8000, samples))
    // by the end of the first block the predictor has locked on
    assert(math.abs(dec(48) - 12345) <= 7)
    assert(math.abs(dec(97) - 12345) <= 7)
  }

  test("container: JUNK chunk is walked over and fact trims the count") {
    val samples = AudioCodec.textSamples("xyz", 49)
    val wav = AdpcmCodec.encodeWavAdpcm(8000, samples)
    // structural: JUNK present between fact and data
    val s = new String(wav, java.nio.charset.StandardCharsets.US_ASCII)
    assert(s.contains("JUNK") && s.contains("fact") && s.contains("data"))
    assert(AdpcmCodec.decodeWavAdpcm(wav).length === 49)
  }

  test("a non-ADPCM WAV is rejected loudly, not mis-decoded") {
    val pcm = AudioCodec.encodeWav(8000,
      AudioCodec.textSamples("abc", 16))
    val e = intercept[IllegalArgumentException] {
      AdpcmCodec.decodeWavAdpcm(pcm)
    }
    assert(e.getMessage.contains("IMA ADPCM"))
  }

  test("encodeStep and decodeStep agree for every (index, code)") {
    for (idx <- 0 to 88; target <- Seq(-30000, -5000, -100, 0, 77, 4096,
        31000)) {
      val (code, p1, i1) = AdpcmCodec.encodeStep(target, 0, idx)
      val (p2, i2) = AdpcmCodec.decodeStep(code, 0, idx)
      assert(p1 === p2 && i1 === i2,
        s"encode/decode drift at idx=$idx target=$target")
    }
  }
}
