package graft

import graft.text.Robots
import graft.text.Robots.Rule

class RobotsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("parse: groups, comments, empty Disallow, unknown fields") {
    val body =
      """# top comment
        |User-agent: GraftBot
        |Disallow: /private/   # trailing comment
        |Allow: /private/ok
        |Crawl-delay: 5
        |Sitemap: http://x/s.xml
        |
        |User-agent: other
        |Disallow:
        |""".stripMargin
    val rules = Robots.parse(body)
    assert(rules == Seq(
      Rule("graftbot", "/private/", false),
      Rule("graftbot", "/private/ok", true)))
    // empty Disallow produced no rule for 'other'
    assert(Robots.resolveAgent(rules, "other").isEmpty)
  }

  test("multi-UA groups share rules; a later UA line starts a new group") {
    val rules = Robots.parse(
      "User-agent: a\nUser-agent: b\nDisallow: /x\nUser-agent: c\nDisallow: /y")
    assert(Robots.resolveAgent(rules, "A") == Seq(Rule("a", "/x", false)))
    assert(Robots.resolveAgent(rules, "b") == Seq(Rule("b", "/x", false)))
    assert(Robots.resolveAgent(rules, "c") == Seq(Rule("c", "/y", false)))
  }

  test("exact agent group beats the * fallback; * used otherwise") {
    val rules = Robots.parse(
      "User-agent: *\nDisallow: /\nUser-agent: graftbot\nAllow: /")
    assert(Robots.resolveAgent(rules, "GraftBot") == Seq(Rule("graftbot", "/", true)))
    assert(Robots.resolveAgent(rules, "stranger") == Seq(Rule("*", "/", false)))
  }

  test("LIKE compilation: wildcards, anchors, escapes, specificity") {
    assert(Robots.toLikePattern("/p/") == "/p/%")
    assert(Robots.toLikePattern("/p/*3$") == "/p/%3")
    assert(Robots.toLikePattern("/a_b%c") == "/a\\_b\\%c%")
    assert(Robots.ruleLen("/p/*3$") == 5)
    assert(Robots.ruleLen("/p/") == 3)
  }
}
