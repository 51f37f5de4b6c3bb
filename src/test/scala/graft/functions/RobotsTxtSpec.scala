package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the RFC 9309 semantics: longest-match precedence, allow wins
  * ties, `*`/`$` patterns, group selection and scoping, parser
  * robustness (comments, unknown keys, case, stacked agents). */
class RobotsTxtSpec extends AnyFunSuite {

  private val basic =
    """User-agent: *
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /*.tmp$
      |""".stripMargin

  test("longest match wins; allow beats disallow on ties") {
    assert(RobotsTxt.isAllowed(basic, "graftbot", "/public/x.html"))
    assert(!RobotsTxt.isAllowed(basic, "graftbot", "/private/data.html"))
    // /private/ok/: Allow (12) outranks Disallow /private/ (9)
    assert(RobotsTxt.isAllowed(basic, "graftbot", "/private/ok/x.html"))
    // RFC 9309 §2.2.2 example: equivalent patterns → allow wins
    val tie = "User-agent: *\nAllow: /page\nDisallow: /page\n"
    assert(RobotsTxt.isAllowed(tie, "bot", "/page/x"))
  }

  test("wildcards and end anchors") {
    assert(!RobotsTxt.isAllowed(basic, "graftbot", "/cache/f.tmp"))
    // $ anchors: .tmp in the middle does NOT match
    assert(RobotsTxt.isAllowed(basic, "graftbot", "/cache/f.tmp.save"))
    val multi = "User-agent: *\nDisallow: /a*b*c\n"
    assert(!RobotsTxt.isAllowed(multi, "bot", "/aXXbYYc-and-more"))
    assert(RobotsTxt.isAllowed(multi, "bot", "/acb"))
  }

  test("group selection: specific product token over *, and scoping") {
    val txt = basic +
      "\nUser-agent: graftbot\nDisallow: /secret/\nAllow: /\n"
    // graftbot group applies: /private/ and *.tmp rules are NOT in it
    assert(RobotsTxt.isAllowed(txt, "graftbot", "/private/data.html"))
    assert(RobotsTxt.isAllowed(txt, "graftbot", "/cache/f.tmp"))
    assert(!RobotsTxt.isAllowed(txt, "graftbot", "/secret/x"))
    // other agents still get the * group
    assert(!RobotsTxt.isAllowed(txt, "otherbot", "/private/data.html"))
    assert(RobotsTxt.isAllowed(txt, "otherbot", "/secret/x"))
  }

  test("parser robustness: comments, case, unknown keys, stacking") {
    val txt =
      """# a comment
        |Sitemap: https://example.com/s.xml
        |USER-AGENT: alpha
        |User-Agent: beta
        |DISALLOW: /x/   # trailing comment
        |Crawl-delay: 10
        |Disallow:
        |""".stripMargin
    // stacked agents share the group; empty Disallow matches nothing
    assert(!RobotsTxt.isAllowed(txt, "alpha", "/x/1"))
    assert(!RobotsTxt.isAllowed(txt, "beta", "/x/1"))
    assert(RobotsTxt.isAllowed(txt, "beta", "/y/1"))
    // no * group and no match → allowed
    assert(RobotsTxt.isAllowed(txt, "gamma", "/x/1"))
  }

  test("no robots rules at all → everything allowed") {
    assert(RobotsTxt.isAllowed("", "bot", "/anything"))
    assert(RobotsTxt.isAllowed("# only comments\n", "bot", "/anything"))
  }
}
