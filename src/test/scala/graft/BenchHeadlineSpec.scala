package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the round-15 bench-headline invariant: the driver parses only the
  * last 2000 chars of Bench's stdout, and rounds 3–6 and 14 all lost their
  * per-query record (`parsed: null`) because the headline outgrew that
  * window as the suite grew. This spec ties the invariant to the CURRENT
  * registered-query count — adding queries can no longer silently break it.
  */
class BenchHeadlineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Worst-case synthetic medians for every registered query: 4-digit
    * seconds → 6-digit centiseconds, wider than any real suite entry. */
  private def worstCase: Seq[(String, Double)] =
    Queries.all.map(q => q.name -> 9999.99)

  test("headline + runner epilogue fit the driver's 2000-char window at the CURRENT query count") {
    val line = Bench.headline(worstCase, total = 999999.99,
      sfDir = "/root/testdata/sf0.1", nReps = 3, nTotal = Queries.all.size,
      failed = Seq.empty, flaky = Seq.empty, truncated = false,
      outPath = "BENCH_local_latest.json")
    // the window holds the TAIL of combined output: after the headline
    // the runner prints "[bench] done: ..." and sbt's "[success] Total
    // time ..." epilogue — budget those ~130 chars at 300 so the whole
    // headline still starts inside the window (round-15 fix: a
    // window-sized headline got its head cut off by its own epilogue)
    assert(line.length + 300 <= 2000,
      s"headline ${line.length} chars leaves <300 for the runner epilogue")
    assert(!line.contains("\n"))
  }

  test("headline is complete JSON with run-health fields and an exact omitted summary") {
    val meds = worstCase
    val line = Bench.headline(meds, total = 1.23, sfDir = "sf", nReps = 2,
      nTotal = meds.size, failed = Seq("q07"), flaky = Seq("q11"),
      truncated = true, outPath = "out.json")
    val node = mapper.readTree(line) // throws on malformed JSON
    assert(node.get("metric").asText == "total")
    assert(node.get("n_total").asLong == meds.size)
    assert(node.get("failed").get(0).asText == "q07")
    assert(node.get("flaky").get(0).asText == "q11")
    assert(node.get("truncated").asBoolean)
    assert(node.get("detail").asText == "out.json")
    val listed = node.get("queries").size
    val omitted = Option(node.get("q_omitted")).map(_.asLong).getOrElse(0L)
    assert(listed + omitted == meds.size,
      s"listed $listed + omitted $omitted != ${meds.size}")
    // centisecond encoding: every listed median is the worst-case 999999
    val it = node.get("queries").elements()
    while (it.hasNext) assert(it.next().asLong == 999999L)
    if (omitted > 0)
      assert(node.get("omitted_cs").asLong == omitted * 999999L)
  }

  test("small suites list every query with centisecond medians, no omission") {
    val meds = Seq("q00_a" -> 1.234, "q01_b" -> 0.005, "q02_c" -> 12.0)
    val line = Bench.headline(meds, total = 13.24, sfDir = "sf", nReps = 3,
      nTotal = 3, failed = Seq.empty, flaky = Seq.empty, truncated = false,
      outPath = "o.json")
    val node = mapper.readTree(line)
    assert(node.get("q_omitted") == null)
    assert(node.get("queries").get("q00").asLong == 123L)
    assert(node.get("queries").get("q01").asLong == 0L) // rint half-to-even: 0.5 cs -> 0
    assert(node.get("queries").get("q02").asLong == 1200L)
  }

  test("heaviest queries are the ones listed when the budget bites") {
    val meds = (0 until 400).map(i => f"q$i%03d_x" -> (400 - i) * 1.0)
    val line = Bench.headline(meds, total = meds.map(_._2).sum,
      sfDir = "sf", nReps = 1, nTotal = 400, failed = Seq.empty,
      flaky = Seq.empty, truncated = false, outPath = "o.json")
    assert(line.length <= 2000)
    val node = mapper.readTree(line)
    // q000 (400 s) must be present; the cheapest entries are the omitted ones
    assert(node.get("queries").has("q000"))
    assert(!node.get("queries").has("q399"))
    assert(node.get("q_omitted").asLong > 0)
  }
}
