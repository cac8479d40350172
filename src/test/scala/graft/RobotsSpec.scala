package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Edge-case gate for the robots.txt parser/filter (q155's oracle is
  * closed-form over the synthesis schedule; these pin the parse
  * semantics the schedule doesn't reach). */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def decide(content: String, path: String): (Boolean, Option[String]) = {
    val urls = Seq((1L, "d", path)).toDF("id", "domain", "path")
    val robots = Seq(("d", content)).toDF("domain", "robots_txt")
    val r = TextOps.robotsFilter(urls, "id", "domain", "path",
      robots, "domain", "robots_txt").head()
    (r.getBoolean(3), Option(r.getString(4)))
  }

  test("inline comments are stripped before prefix extraction") {
    val (allowed, pfx) = decide(
      "User-agent: *\nDisallow: /secret/ # staging only", "/secret/x")
    assert(!allowed && pfx.contains("/secret/"))
  }

  test("directives are case-insensitive, prefix case is preserved") {
    val (allowed, pfx) = decide(
      "uSeR-aGeNt: *\nDISALLOW: /Secret/", "/Secret/x")
    assert(!allowed && pfx.contains("/Secret/"))
  }

  test("empty Disallow means no restriction") {
    val (allowed, pfx) = decide("User-agent: *\nDisallow:", "/anything")
    assert(allowed && pfx.isEmpty)
  }

  test("rules outside the wildcard group never apply") {
    val (allowed, _) = decide(
      "User-agent: specialbot\nDisallow: /\n\nUser-agent: *\nAllow: /", "/x")
    assert(allowed)
  }

  test("equal-length Allow and Disallow tie-breaks to allow") {
    val (allowed, pfx) = decide(
      "User-agent: *\nDisallow: /a/bb/\nAllow: /a/bb/", "/a/bb/c")
    assert(allowed && pfx.contains("/a/bb/"))
  }

  test("longer Disallow beats shorter Allow") {
    val (allowed, pfx) = decide(
      "User-agent: *\nAllow: /a/\nDisallow: /a/private/", "/a/private/x")
    assert(!allowed && pfx.contains("/a/private/"))
  }

  test("a domain with no robots entry defaults to allowed") {
    val urls = Seq((1L, "nowhere", "/x")).toDF("id", "domain", "path")
    val robots = Seq(("d", "User-agent: *\nDisallow: /")).toDF("domain", "robots_txt")
    val r = TextOps.robotsFilter(urls, "id", "domain", "path",
      robots, "domain", "robots_txt").head()
    assert(r.getBoolean(3) && r.isNullAt(4))
  }

  test("stacked agent lines: the last one before rules defines the group") {
    // documented simplification vs RFC 9309 group semantics
    val (allowed, _) = decide(
      "User-agent: otherbot\nUser-agent: *\nDisallow: /", "/x")
    assert(!allowed)
  }

  // ---- RFC 9309 §2.2.3 wildcard path patterns (round 12) ----

  test("* matches any run, including empty and across segments") {
    val content = "User-agent: *\nDisallow: /private/*/secret"
    assert(!decide(content, "/private/a/secret")._1)
    assert(!decide(content, "/private/a/b/c/secret")._1) // * spans slashes
    assert(!decide(content, "/private//secret")._1)      // * matches empty
    assert(decide(content, "/private/a/secrex")._1)
  }

  test("trailing $ anchors the rule to the path end") {
    val content = "User-agent: *\nDisallow: /*.pdf$"
    assert(!decide(content, "/docs/report.pdf")._1)
    assert(decide(content, "/docs/report.pdf.html")._1) // not at the end
    assert(decide(content, "/docs/report.pdfx")._1)
  }

  test("non-trailing $ and regex metacharacters are literal octets") {
    val (blocked, _) = decide(
      "User-agent: *\nDisallow: /a$b(c).d", "/a$b(c).dzz")
    assert(!blocked)
    // the '.' must not match an arbitrary character
    assert(decide("User-agent: *\nDisallow: /a.b", "/aXb")._1)
  }

  test("specificity counts the rule path as written, wildcards included") {
    // Allow (10 octets incl '*') vs Disallow (8 octets): allow wins
    val content = "User-agent: *\nDisallow: /private\nAllow: /pri*te/ok"
    val (allowed, rule) = decide(content, "/private/ok")
    assert(allowed && rule.contains("/pri*te/ok"))
  }

  test("a $-anchored Allow overrides a shorter plain Disallow exactly") {
    val content = "User-agent: *\nDisallow: /tmp\nAllow: /tmp/keep$"
    assert(decide(content, "/tmp/keep")._1)
    assert(!decide(content, "/tmp/keep2")._1)
  }
}
