package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the WebVTT parser: both timestamp forms, identifiers,
  * settings, NOTE blocks, malformed input, and the fixture closed
  * forms the t76 oracle replays. */
class WebVttSpec extends AnyFunSuite {

  private def census(vtt: String): (Int, Int, Int, Long, Long, Long, Long) = {
    val r = WebVtt.parseRow(UTF8String.fromString(vtt))
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
  }

  test("timestamps: both forms, round trip through fmt") {
    assert(WebVtt.parseTs("00:01.000") === 1000L)
    assert(WebVtt.parseTs("01:02.003") === 62003L)
    assert(WebVtt.parseTs("01:02:03.004") === 3723004L)
    assert(WebVtt.parseTs("10:00:00.000") === 36000000L)
    for (ms <- Seq(0L, 999L, 59999L, 60000L, 3599999L, 3600000L, 7261234L))
      assert(WebVtt.parseTs(WebVtt.fmt(ms)) === ms, s"ms=$ms")
    // short form under an hour, long form above
    assert(WebVtt.fmt(3599999L) === "59:59.999")
    assert(WebVtt.fmt(3600000L) === "01:00:00.000")
    intercept[IllegalArgumentException] { WebVtt.parseTs("00:61.000") }
    intercept[IllegalArgumentException] { WebVtt.parseTs("nonsense") }
  }

  test("cue blocks: ids, settings, notes, payload accounting") {
    val vtt =
      """WEBVTT
        |
        |intro
        |00:01.000 --> 00:03.000 align:start
        |hello world
        |second line
        |
        |NOTE a comment
        |spanning lines
        |
        |00:05.000 --> 00:06.500
        |bye
        |""".stripMargin
    val (cues, notes, withId, dur, first, last, chars) = census(vtt)
    assert(cues === 2)
    assert(notes === 1)
    assert(withId === 1)
    assert(dur === 2000L + 1500L)
    assert(first === 1000L)
    assert(last === 6500L)
    assert(chars === "hello world".length + "second line".length +
      "bye".length)
  }

  test("missing signature and inverted cues fail loudly") {
    intercept[IllegalArgumentException] {
      WebVtt.parseRow(UTF8String.fromString("no header\n"))
    }
    intercept[IllegalArgumentException] {
      WebVtt.parseRow(UTF8String.fromString(
        "WEBVTT\n\n00:05.000 --> 00:04.000\nbackwards\n"))
    }
  }

  test("fixture closed forms match the t76 oracle") {
    val text = "alpha beta gamma delta"
    for (id <- 0L to 12L) {
      val vtt = WebVtt.encode(UTF8String.fromString(text), id).toString
      val (cues, notes, withId, dur, first, last, chars) = census(vtt)
      val n = (2 + id % 4).toInt
      assert(cues === n, s"id=$id")
      assert(notes === 1)
      val expWithId = (0 until n).count(j => (id + j) % 2 == 0)
      assert(withId === expWithId, s"id=$id")
      assert(dur === (0 until n).map(j => 2000L + 100 * (j % 5)).sum)
      assert(first === id * 1000)
      assert(last === id * 1000 + (n - 1) * 2500L + 2000 + 100 * ((n - 1) % 5))
      val words = text.split(" ")
      assert(chars === (0 until n).map(j => words(j % words.length).length)
        .sum.toLong, s"id=$id")
    }
    // hour-boundary crossing: doc_id 4000 → starts at 01:06:40.000
    val vtt = WebVtt.encode(UTF8String.fromString(text), 4000L).toString
    assert(vtt.contains("01:06:40.000"))
    assert(census(vtt)._5 === 4000000L)
  }
}
