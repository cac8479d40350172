package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Error-bound contracts for the two sketch queries whose driver check is
  * rows-only (sketch answers are engine-specific, so no DuckDB hash
  * parity is possible):
  *
  *  - q33 `approx_count_distinct` (HyperLogLog++): Spark's default
  *    relative standard deviation is 0.05; the gate is 3σ = 15% relative
  *    error against the oracle-checked exact distinct counts (q32's
  *    shape) — on this data the observed error is ~1-3%.
  *  - q93 `approx_percentile` (mergeable quantile sketch, accuracy
  *    10000): the published guarantee is RANK error ≤ 1/accuracy, so the
  *    returned element's rank in the exact sorted group must fall within
  *    n/10000 (+1 for rounding) of the target rank q·n — checked against
  *    q41's exact-percentile data.
  */
class SketchBoundsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val li = Ingest.table(spark, sfDir, "lineitem")

  test("q33 HLL distinct counts within 3*rsd (15%) of exact (q32 twin)") {
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      Seq(("parts", r.getLong(1), r.getLong(2)),
          ("orders", r.getLong(3), r.getLong(4))).foreach {
        case (what, exact, approx) =>
          val rel = math.abs(approx - exact).toDouble / exact
          info(f"$flag/$what: exact=$exact approx=$approx rel-err=$rel%.4f")
          assert(rel <= 0.15,
            f"$flag/$what HLL error $rel%.4f exceeds the 3-sigma 0.15 bound")
      }
    }
  }

  test("q105 Misra-Gries counts within the dec certificate of exact (q47 twin)") {
    graft.functions.GraftFunctions.register(spark)
    val k = 64
    val toks = Ingest.table(spark, sfDir, "documents")
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("term"))
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val sk = toks.agg(expr(s"graft_freq(term, $k)").as("sk")).select("sk.*")
      .collect().head
    val items = sk.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dec = sk.getLong(1)
    assert(sk.getLong(2) === n, "sketch n must equal the stream length")
    // published MG bound: total decrement <= n/(k+1)
    info(s"n=$n dec=$dec bound=${n / (k + 1)} counters=${items.size}")
    assert(dec <= n / (k + 1))
    // per-item certificate: cnt <= true <= cnt + dec
    items.foreach { case (term, cnt) =>
      val c = exact.getOrElse(term, 0L)
      assert(cnt <= c && c <= cnt + dec,
        s"$term: sketch $cnt not within [true - dec, true] (true=$c, dec=$dec)")
    }
    // completeness: anything with true count > dec must have survived
    exact.filter(_._2 > dec).keys.foreach { term =>
      assert(items.contains(term), s"heavy item $term (c=${exact(term)}) missing")
    }
  }

  test("q93 approx percentiles within the 1/accuracy rank bound of exact (q41 twin)") {
    val cents = li.select(col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val sketched = cents.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(cents, array(0.5, 0.9), 10000)").as("p"),
        count(lit(1)).as("n"))
      .collect()
    assert(sketched.nonEmpty)
    sketched.foreach { r =>
      val flag = r.getString(0)
      val ps = r.getSeq[Long](1)
      val n = r.getLong(2)
      val tol = n / 10000.0 + 1 // rank guarantee + integer-rank rounding
      Seq((0.5, ps.head), (0.9, ps(1))).foreach { case (q, approxVal) =>
        val grp = cents.filter(col("l_returnflag") === flag)
        val rankLt = grp.filter(col("cents") < approxVal).count()
        val rankLe = grp.filter(col("cents") <= approxVal).count()
        val target = q * n
        info(f"$flag p$q%.1f: approx=$approxVal rank-interval=[$rankLt,$rankLe] target=$target%.0f tol=$tol%.1f n=$n")
        assert(rankLt - tol <= target && target <= rankLe + tol,
          f"$flag p$q%.1f: approx value $approxVal rank [$rankLt,$rankLe] misses target $target%.0f by more than $tol%.1f")
      }
    }
  }

  test("q187 count-min sketch: matrix replay, merge-order independence, eps*n bound") {
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.TextOps
    val d = 4; val w = 16
    val toks = Ingest.table(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    def sketchOf(df: org.apache.spark.sql.DataFrame): (Seq[Long], Long) = {
      val r = df.agg(expr(s"graft_cms(token, $d, $w)").as("sk"))
        .select("sk.*").collect().head
      (r.getSeq[Long](0), r.getLong(3))
    }
    // merge-order independence: 1 partition (update-only path) vs 13
    // partitions (13 partial buffers merged) must produce the identical
    // counter matrix — the property that makes the sketch safe to persist
    // and UNION across daily increments
    val (c1, n1) = sketchOf(toks.repartition(1))
    val (c13, n13) = sketchOf(toks.repartition(13, col("token")))
    assert(c1 == c13 && n1 == n13,
      "counter matrix must be independent of partitioning / merge order")
    // full matrix replay: every counter equals the exact (row, bucket)
    // occurrence mass computed with the COLUMN-form md5-affine bucket —
    // the strongest possible equivalence between the JVM update path and
    // the SQL contract the scaladoc publishes
    val exact = toks
      .crossJoin(spark.range(d).select(col("id").cast("int").as("r")))
      .select(col("r"),
        pmod(conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col("token"))), 1, 15), 16, 10).cast("long"), lit(w.toLong)).as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    for (r <- 0 until d; b <- 0 until w) {
      val expected = exact.getOrElse((r, b.toLong), 0L)
      assert(c1(r * w + b) == expected,
        s"counter ($r,$b): sketch=${c1(r * w + b)} exact=$expected")
    }
    // stream length and per-row mass: each of the d rows counts every
    // update exactly once
    val total = toks.count()
    assert(n1 == total)
    (0 until d).foreach { r =>
      assert(c1.slice(r * w, (r + 1) * w).sum == total,
        s"row $r counters must sum to the stream length")
    }
    // estimate contract over EVERY token (not just q187's top 25):
    // never underestimates; overestimates by at most eps*n = (e/w)*n
    // (Cormode & Muthukrishnan 2005) — and the bound is exercised, not
    // vacuous (some token really collides at w=16 < |vocab|)
    val epsN = math.E / w * total
    val truec = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .collect().map(x => x.getString(0) -> x.getLong(1))
    var maxOver = 0L
    truec.foreach { case (tok, cnt) =>
      val est = (0 until d).map(r =>
        c1(r * w + graft.functions.CountMinSketchAgg.bucket(r, tok, w))).min
      assert(est >= cnt, s"'$tok': est $est underestimates true $cnt")
      assert(est - cnt <= epsN,
        f"'$tok': overcount ${est - cnt} exceeds eps*n = $epsN%.1f")
      maxOver = math.max(maxOver, est - cnt)
    }
    info(s"tokens=${truec.length} n=$total maxOvercount=$maxOver epsN=$epsN")
    assert(maxOver > 0, "w=16 must force at least one real collision")
  }
}
