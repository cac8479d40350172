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
}
