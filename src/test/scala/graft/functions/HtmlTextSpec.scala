package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the HTML tokenizer/extractor against the tricky cases a regex
  * strip gets wrong, and the fixture encoder's closed-form rules. */
class HtmlTextSpec extends AnyFunSuite {

  private def body(html: String): String = HtmlText.extract(html)._2

  test("plain tags strip; block elements separate; inline do not") {
    assert(body("<p>hello world</p><p>second block</p>")
      === "hello world\nsecond block")
    assert(body("<p>an <b>inline</b> <span>run</span> stays one block</p>")
      === "an inline run stays one block")
    assert(body("one<br>two") === "one\ntwo")
  }

  test("a '>' inside a quoted attribute does not end the tag") {
    assert(body("""<div data-note="a>b"><p>text</p></div>""") === "text")
    assert(body("""<div data-note='x > y'>keep</div>""") === "keep")
  }

  test("comments drop whole, including tag-looking content") {
    assert(body("a<!-- <p>DECOY</p> -->b") === "ab")
    assert(body("pre<!-- unterminated") === "pre")
  }

  test("script/style are raw-text: markup inside them never leaks") {
    assert(body("<script>var a = \"<p>DECOY</p>\"; if (1 < 2) {}</script>ok")
      === "ok")
    assert(body("<style>p { color: red; } /* DECOY */</style>ok") === "ok")
    // case-insensitive close tag
    assert(body("<script>x</SCRIPT>ok") === "ok")
  }

  test("title is captured as metadata, not body text") {
    val (title, b, _, _) =
      HtmlText.extract("<head><title>doc 7</title></head><body><p>t</p></body>")
    assert(title === "doc 7")
    assert(b === "t")
  }

  test("character references: named, decimal, hex; bad ones literal") {
    assert(body("<p>&amp;&lt;&gt;&quot;&apos;</p>") === "&<>\"'")
    assert(body("<p>&#97;&#x62;&#X63;</p>") === "abc")
    assert(body("<p>&#x1F600;</p>") === new String(Character.toChars(0x1F600)))
    assert(body("<p>5 &notarealref; 6</p>") === "5 &notarealref; 6")
    assert(body("<p>AT&T</p>") === "AT&T") // no semicolon within 12 chars
  }

  test("whitespace collapses within a block; empty blocks drop") {
    assert(body("<p>  a   b  </p><div></div><p>c</p>") === "a b\nc")
  }

  test("link counting") {
    val (_, _, links, _) = HtmlText.extract(
      """<p><a href="x">one</a> and <a href="y">two</a></p><p>none</p>""")
    assert(links === 2)
  }

  test("fixture round trip: extracted text equals the original exactly") {
    val texts = Seq(
      "key agg row scan slow fast table value part hash value table part",
      "a", "one two", "x " + ("word " * 40).trim)
    for (t <- texts; id <- Seq(0L, 1L, 2L, 3L, 5L, 11L, 12L, 37L)) {
      val html =
        HtmlText.encode(UTF8String.fromString(t), id).toString
      val (title, b, links, blocks) = HtmlText.extract(html)
      assert(title === s"doc $id")
      assert(b.replace('\n', ' ') === t, s"roundtrip failed id=$id")
      assert(!b.contains("DECOY"), "script/style/comment text leaked")
      // closed forms the oracle replays
      val nw = t.split(" ").length
      val k = (8 + id % 5).toInt
      val np = (nw + k - 1) / k
      val j0 = ((3 - id % 3) % 3).toInt
      assert(blocks === np, s"blocks id=$id")
      assert(links === math.max(0, (np - j0 + 2) / 3), s"links id=$id")
    }
  }

  test("entity rules in the fixture actually produce references") {
    // id=0, paragraph 0: (0+0)%4==0 → 'a' encoded as &#97;
    val html = HtmlText.encode(
      UTF8String.fromString("alpha beta"), 0L).toString
    assert(html.contains("&#97;lph&#97;"))
    // id=2, paragraph 0: (2+0)%4==2 → 'e' encoded as &#x65;
    val html2 = HtmlText.encode(
      UTF8String.fromString("eel tree"), 2L).toString
    assert(html2.contains("&#x65;"))
  }
}
