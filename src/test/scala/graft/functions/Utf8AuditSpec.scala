package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the UTF-8 validator against the Unicode Standard's own
  * maximal-subpart substitution examples (§3.9, Tables 3-8..3-11) and
  * the well-formed boundary sequences of Table 3-7, then the planted-
  * corruption closed forms the t73/e40 oracles replay. */
class Utf8AuditSpec extends AnyFunSuite {

  private def audit(bytes: Int*): (Long, Long, Long, Long, Long, Long, Long, Long, Long) = {
    val row = Utf8Audit.audit(bytes.map(_.toByte).toArray)
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7),
      row.getLong(8))
  }
  private def errs(bytes: Int*): Long = audit(bytes: _*)._6
  private def cps(bytes: Int*): Long = audit(bytes: _*)._1

  test("well-formed boundaries (Table 3-7) validate with zero errors") {
    // U+007F, U+0080, U+07FF, U+0800, U+D7FF, U+E000, U+FFFF,
    // U+10000, U+10FFFF
    assert(audit(0x7F) === ((1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(audit(0xC2, 0x80) === ((1L, 0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(audit(0xDF, 0xBF)._6 === 0L)
    assert(audit(0xE0, 0xA0, 0x80) === ((1L, 0L, 0L, 1L, 0L, 0L, 0L, 0L, 0L)))
    assert(audit(0xED, 0x9F, 0xBF)._6 === 0L) // U+D7FF: highest pre-surrogate
    assert(audit(0xEE, 0x80, 0x80)._6 === 0L) // U+E000
    assert(audit(0xEF, 0xBF, 0xBF)._6 === 0L) // U+FFFF
    assert(audit(0xF0, 0x90, 0x80, 0x80)
      === ((1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L, 0L))) // U+10000
    assert(audit(0xF4, 0x8F, 0xBF, 0xBF)._6 === 0L) // U+10FFFF
  }

  test("maximal-subpart error counting (Unicode §3.9 examples)") {
    // C0 AF: C0 is never well-formed → one error per byte
    assert(errs(0xC0, 0xAF) === 2L)
    // E0 80 80: E0 requires A0..BF second → E0 alone, then two lone
    // continuations (Table 3-8 yields three U+FFFDs)
    assert(errs(0xE0, 0x80, 0x80) === 3L)
    // F0 80 80 41: three U+FFFDs then 'A' (Table 3-8)
    assert(audit(0xF0, 0x80, 0x80, 0x41) === ((1L, 1L, 0L, 0L, 0L, 3L, 1L, 0L, 0L)))
    // ED A0 80 (surrogate D800 as CESU-8): ED alone + two lone
    // continuations, flagged as a surrogate attempt
    assert(audit(0xED, 0xA0, 0x80)._6 === 3L)
    assert(audit(0xED, 0xA0, 0x80)._8 === 1L)
    // F4 90 80 80 (U+110000, out of range): F4 alone + three lone
    // continuations, flagged out-of-bounds
    assert(audit(0xF4, 0x90, 0x80, 0x80) === ((0L, 0L, 0L, 0L, 0L, 4L, 0L, 0L, 1L)))
    // F5 lead byte is never well-formed
    assert(audit(0xF5, 0x80)._9 === 1L)
    // truncated-but-valid prefixes: ONE error each (Table 3-9/3-10)
    assert(errs(0xC3) === 1L)
    assert(errs(0xE1, 0x80) === 1L)
    assert(errs(0xF1, 0x80, 0x80) === 1L)
    // valid prefix then ASCII: E1 80 41 → one error + one cp
    assert(audit(0xE1, 0x80, 0x41) === ((1L, 1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L)))
  }

  test("mixed stream counts every class") {
    // "ab" + U+20AC + lone 80 + U+1F600
    val r = audit(0x61, 0x62, 0xE2, 0x82, 0xAC, 0x80, 0xF0, 0x9F, 0x98, 0x80)
    assert(r === ((4L, 2L, 0L, 1L, 1L, 1L, 0L, 0L, 0L)))
  }

  test("planted-corruption classes match the oracle closed forms") {
    val text = UTF8String.fromString("alpha beta gamma")
    val tl = 16L
    // (errors, overlong, surrogate, extra3, extra4) per class
    val expect = Map(
      0L -> ((0L, 0L, 0L, 0L, 0L)), 1L -> ((1L, 0L, 0L, 0L, 0L)),
      2L -> ((2L, 1L, 0L, 0L, 0L)), 3L -> ((1L, 0L, 0L, 0L, 0L)),
      4L -> ((2L, 0L, 0L, 0L, 0L)), 5L -> ((3L, 0L, 1L, 0L, 0L)),
      6L -> ((0L, 0L, 0L, 1L, 1L)))
    for (docId <- 0L to 13L) {
      val row = Utf8Audit.audit(Utf8Audit.payload(text, docId))
      val (e, o, su, x3, x4) = expect(docId % 7)
      assert(row.getLong(5) === e, s"errors docId=$docId")
      assert(row.getLong(6) === o, s"overlong docId=$docId")
      assert(row.getLong(7) === su, s"surrogate docId=$docId")
      assert(row.getLong(3) === x3, s"n_3b docId=$docId")
      assert(row.getLong(4) === x4, s"n_4b docId=$docId")
      assert(row.getLong(1) === tl, s"ascii docId=$docId")
      assert(row.getLong(0) === tl + x3 + x4, s"n_cp docId=$docId")
    }
  }
}
