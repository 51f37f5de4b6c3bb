package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the markdown extractor block/inline semantics and the fixture
  * encoder's closed-form rules (the t75 oracle's contract). */
class MarkdownTextSpec extends AnyFunSuite {

  private def extract(md: String): (String, Int, Int, Int, Int) = {
    val r = MarkdownText.extractRow(UTF8String.fromString(md))
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4))
  }
  private def body(md: String): String = extract(md)._1

  test("headings extract their text and are counted") {
    val (b, h, _, _, blocks) = extract("# Title\n\nprose here\n")
    assert(b === "Title\nprose here")
    assert(h === 1)
    assert(blocks === 2)
    // 7+ hashes or no space → not a heading
    assert(extract("#######nope\n")._2 === 0)
    assert(body("#nope\n") === "#nope")
  }

  test("fenced code is excluded whole and counted; decoys cannot leak") {
    val md = "before\n\n```python\nDECOY = 1\n# not a heading\n```\n\nafter\n"
    val (b, h, fences, _, _) = extract(md)
    assert(b === "before\nafter")
    assert(h === 0)
    assert(fences === 1)
    // a longer closer is required for a longer opener
    val md2 = "````\n```\nstill code\n````\nout\n"
    assert(body(md2) === "out")
    // ~~~ fences too
    assert(body("~~~\nhidden\n~~~\nvisible\n") === "visible")
  }

  test("inline: emphasis unwraps, links keep text, images drop, code keeps content") {
    assert(body("**bold** and *ital* and _under_\n")
      === "bold and ital and under")
    val (b, _, _, links, _) = extract("[click here](https://x.y) now\n")
    assert(b === "click here now")
    assert(links === 1)
    assert(body("![alt text](img.png) kept\n") === "kept")
    assert(body("`code *not* emphasis` kept\n") === "code *not* emphasis kept")
    assert(body("escaped \\* star\n") === "escaped * star")
  }

  test("flanking rules: intra-word underscores and literal stars survive " +
      "(round-13 advisory fix)") {
    // snake_case / file_names are prose tokens, not emphasis (CommonMark:
    // '_' may not open or close intra-word)
    assert(body("use snake_case and my_file_name.txt here\n")
      === "use snake_case and my_file_name.txt here")
    // space-surrounded runs are neither left- nor right-flanking
    assert(body("compute 2 * 3 and a _ b\n") === "compute 2 * 3 and a _ b")
    // intra-word '*' CAN be emphasis per CommonMark — still unwraps
    assert(body("intra*word*stars\n") === "intrawordstars")
    // real emphasis still unwraps in the same text
    assert(body("_ital_ touches file_name\n") === "ital touches file_name")
    assert(body("**bold** next to snake_case\n") === "bold next to snake_case")
  }

  test("blockquotes, lists, thematic breaks strip to text") {
    assert(body("> quoted line\n> > nested\n") === "quoted line nested")
    assert(body("- item one\n* item two\n+ item three\n")
      === "item one item two item three")
    assert(body("1. first\n12. twelfth\n") === "first twelfth")
    assert(body("above\n\n---\n\nbelow\n") === "above\nbelow")
  }

  test("fixture round trip matches the closed forms") {
    val texts = Seq(
      "key agg row scan slow fast table value part hash value table part",
      "a", "one two three", ("word " * 30).trim)
    for (t <- texts; id <- Seq(0L, 1L, 2L, 3L, 7L, 11L, 23L)) {
      val md = MarkdownText.encode(UTF8String.fromString(t), id).toString
      val (b, h, fences, links, blocks) = extract(md)
      assert(b.replace('\n', ' ') === s"doc $id $t", s"roundtrip id=$id")
      assert(!b.contains("DECOY"))
      assert(h === 1)
      assert(fences === 1)
      val nw = t.split(" ").length
      val k = (7 + id % 4).toInt
      val np = (nw + k - 1) / k
      val j0 = ((3 - id % 3) % 3).toInt
      assert(blocks === 1 + np, s"blocks id=$id")
      assert(links === (np - j0 + 2) / 3, s"links id=$id")
    }
  }
}
