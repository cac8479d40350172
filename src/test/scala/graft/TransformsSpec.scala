package graft

import org.apache.spark.sql.functions._
import graft.operators.Transforms

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String = {
    val r = Seq(s).toDF("d")
      .select(Transforms.normalizeDate(col("d")).cast("string")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("T3 four formats normalize to the same date") {
    assert(norm("1997-03-15") == "1997-03-15")
    assert(norm("15-03-1997") == "1997-03-15")
    assert(norm("1997/03/15") == "1997-03-15")
    assert(norm("15/03/1997") == "1997-03-15")
  }

  test("T3 precedence: ambiguous day-first strings resolve in declared order") {
    // '03-04-2025' cannot be yyyy-MM-dd (2-digit year is rejected by the
    // strict parser) → dd-MM-yyyy wins: April 3rd.
    assert(norm("03-04-2025") == "2025-04-03")
    // 4-digit-first slash date prefers yyyy/MM/dd
    assert(norm("2025/03/04") == "2025-03-04")
  }

  test("T3 unparseable input → null date, passthrough string") {
    assert(norm("not-a-date") == null)
    val r = Seq("junk").toDF("d")
      .select(Transforms.normalizeDateString(col("d"))).head().getString(0)
    assert(r == "junk") // reference transactions.py:81 semantics
  }

  test("T4 created_at renders midnight-truncated ISO") {
    val r = Seq("15/03/1997").toDF("d")
      .select(Transforms.createdAt(col("d"))).head().getString(0)
    assert(r == "1997-03-15T00:00:00")
  }

  test("T2 checksum: null fields render as empty string (dict.get default)") {
    val df = Seq((Some("a"), Option.empty[String]), (Some("a"), Some(""))).toDF("x", "y")
    val sums = df.select(Transforms.etlChecksum(col("x"), col("y"))).collect().map(_.getString(0))
    assert(sums(0) == sums(1)) // null ≡ "" in checksum input
  }

  test("centsString is an exact integer rendering") {
    val r = Seq(1234.56, 25.0, 0.1).toDF("v")
      .select(Transforms.centsString(col("v"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("123456", "2500", "10"))
  }

  test("quarantine: NULL predicate rows land in quarantine, partition is total") {
    val df = Seq(("2024-01-01", 1), (null, 2), ("garbage", 3)).toDF("d", "id")
    val (good, bad) = Transforms.quarantine(df,
      Transforms.normalizeDate(col("d")).isNotNull)
    assert(good.select("id").collect().map(_.getInt(0)).toSet == Set(1))
    // null date AND unparseable date both quarantined — nothing vanishes
    assert(bad.select("id").collect().map(_.getInt(0)).toSet == Set(2, 3))
    assert(good.count() + bad.count() == df.count())
  }

  test("exactSum is order-independent (decimal, not double)") {
    val vals = (1 to 1000).map(i => i * 0.01)
    val a = vals.toDF("v").repartition(7).agg(Transforms.exactSum(col("v"))).head().getDouble(0)
    val b = vals.reverse.toDF("v").repartition(3).agg(Transforms.exactSum(col("v"))).head().getDouble(0)
    assert(a == b)
    assert(math.abs(a - 5005.0) < 1e-9)
  }
}
