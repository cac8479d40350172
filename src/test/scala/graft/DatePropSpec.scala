package graft

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** Property-style test for T3 (SURVEY.md §5.2): all four formats
  * round-trip for arbitrary dates, generated deterministically and
  * evaluated in one Spark pass (per-sample Spark jobs would be
  * pathologically slow).
  */
class DatePropSpec extends SparkSpec {
  import spark.implicits._

  test("T3 property: every format of every generated date normalizes back") {
    val rnd = new scala.util.Random(42)
    val fmts = Seq("yyyy-MM-dd", "dd-MM-yyyy", "yyyy/MM/dd", "dd/MM/yyyy")
      .map(DateTimeFormatter.ofPattern)
    val rows = for {
      _ <- 1 to 300
      d = LocalDate.of(1900, 1, 1).plusDays(rnd.nextInt(365 * 200))
      f <- fmts
    } yield (d.toString, f.format(d))
    // Strict 4-digit-year patterns make the precedence unambiguous: a
    // day-first rendering can never match a year-first pattern, so every
    // rendering parses back to exactly its source date.
    val df = rows.toDF("expected", "rendered")
    val bad = df.filter(
      Transforms.normalizeDate(col("rendered")).cast("string") =!= col("expected"))
    assert(bad.count() == 0, s"non-round-tripping: ${bad.take(5).mkString(",")}")
  }

  test("T3 property: garbage never parses, passthrough preserves input") {
    val rnd = new scala.util.Random(7)
    val junk = Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
      .filter(s => !s.forall(_.isDigit))
    val df = junk.toDF("s")
    assert(df.filter(Transforms.normalizeDate(col("s")).isNotNull).count() == 0)
    assert(df.filter(Transforms.normalizeDateString(col("s")) =!= col("s")).count() == 0)
  }
}
