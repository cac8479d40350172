package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.VectorOps

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native graft_dot matches the higher-order fold bitwise") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(VectorOps.quantize(col("a")).as("qa"), VectorOps.quantize(col("b")).as("qb"))
    val mismatches = df.filter(
      VectorOps.nativeDot(col("qa"), col("qb")) =!= VectorOps.dot(col("qa"), col("qb"))
        || VectorOps.nativeCosine(col("qa"), col("qb")) =!= VectorOps.cosine(col("qa"), col("qb")))
    assert(mismatches.count() == 0)
  }

  test("native graft_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // non-literal inputs so the projection can't constant-fold away
    val df = spark.range(3)
      .select(
        array(col("id").cast("double"), (col("id") + 1).cast("double")).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(col("a"), VectorOps.nativeDot(col("a"), col("b")).as("d"))
    val rows = df.collect().map(r => (r.getSeq[Double](0).head, r.getDouble(1))).toMap
    assert(rows(1.0) == 1.0 * 3 + 2.0 * 4)
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage in
    // the compact plan rendering; the graft_dot Project must carry one.
    val plan = df.queryExecution.executedPlan.toString()
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).get
    assert(dotLine.trim.startsWith("*("))
    assert(!plan.contains("CodegenFallback"))
  }

  test("registration is idempotent and null-safe") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorOps.nativeDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("graft_dot rejects wrong arity with an analysis error") {
    GraftFunctions.register(spark)
    val df = Seq(Seq(1.0, 2.0)).toDF("a")
    val e = intercept[Exception] {
      df.select(call_function(GraftFunctions.DotName, col("a"))).collect()
    }
    assert(e.getMessage.contains("2") || e.getMessage.contains("WRONG_NUM_ARGS"))
  }

  test("packed sparse dot multiplies weights on matching keys only") {
    GraftFunctions.register(spark)
    def pack(kv: (Long, Long)*): Seq[Long] = kv.sortBy(_._1).map { case (k, w) => (k << 32) | w }
    val rows = Seq((
      pack(1L -> 2L, 5L -> 3L, 9L -> 7L),
      pack(1L -> 10L, 9L -> 1L, 11L -> 100L)))
    val df = rows.toDF("a", "b")
      .select(call_function(GraftFunctions.PackedDotName, col("a"), col("b")).as("d"))
    assert(df.head().getLong(0) == 2 * 10 + 7 * 1)
    // brute-force cross-check on random sparse vectors
    val rnd = new scala.util.Random(3)
    val rand = Seq.fill(100)((
      Seq.fill(20)(rnd.nextInt(50).toLong).distinct.map(k => k -> (rnd.nextInt(1000) + 1).toLong),
      Seq.fill(20)(rnd.nextInt(50).toLong).distinct.map(k => k -> (rnd.nextInt(1000) + 1).toLong)))
    val expected = rand.map { case (x, y) =>
      val ym = y.toMap
      x.map { case (k, w) => w * ym.getOrElse(k, 0L) }.sum
    }
    val got = rand.map { case (x, y) => (pack(x: _*), pack(y: _*)) }
      .toDF("a", "b")
      .select(call_function(GraftFunctions.PackedDotName, col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(got == expected)
  }

  test("graft_kmv: exact below k, k-bounded, sorted, partitioning-invariant") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    // 500 distinct hashes (values 0..499 scrambled via a fixed affine map),
    // plus duplicates and nulls
    val vals = (0 until 500).map(i => ((i * 2654435761L) % 1000003L)) ++
      (0 until 100).map(i => ((i * 2654435761L) % 1000003L))
    val df = (vals.map(Option(_)) :+ (None: Option[Long])).toDF("h")
    def run(d: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      d.agg(call_function(GraftFunctions.KmvName, col("h"), lit(k)).as("m"))
        .collect().head.getSeq[Long](0)
    val expected = vals.distinct.sorted
    // below k: the sketch IS the distinct set (nulls ignored)
    assert(run(df, 1000) == expected)
    // at k: exactly the k smallest, ascending
    assert(run(df, 64) == expected.take(64))
    // partitioning must not change the sketch (merge path exercised)
    assert(run(df.repartition(13), 64) == expected.take(64))
    assert(run(df.repartition(1), 64) == expected.take(64))
  }

  test("sorted intersect size matches array_intersect on random sorted sets") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((
      Seq.fill(rnd.nextInt(50))(rnd.nextInt(100).toLong).distinct.sorted,
      Seq.fill(rnd.nextInt(50))(rnd.nextInt(100).toLong).distinct.sorted))
    val df = rows.toDF("a", "b")
    val mismatches = df.filter(
      call_function(GraftFunctions.SortedIntersectName, col("a"), col("b"))
        =!= size(array_intersect(col("a"), col("b"))))
    assert(mismatches.count() == 0)
    // empty-side edge
    val empty = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(call_function(GraftFunctions.SortedIntersectName, col("a"), col("b")))
    assert(empty.head().getInt(0) == 0)
  }

  test("graft_intersect_size: array_intersect semantics on unsorted arrays with duplicates and nulls") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    def mk(): Seq[Option[Long]] = Seq.fill(rnd.nextInt(60))(
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(40).toLong))
    val rows = Seq.fill(400)((mk(), mk()))
    val got = rows.toDF("a", "b")
      .select(call_function(GraftFunctions.IntersectSizeName,
        col("a"), col("b")).as("n"))
      .as[Int].collect().toSeq
    // ground truth computed in Scala, independent of any Spark rewrite:
    // distinct common elements, None (null) matching None once — the
    // documented size(array_intersect) semantics
    val want = rows.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got == want)
    // null ARRAY input → null result (ANSI size-of-null contract)
    val nullSide = Seq((null.asInstanceOf[Seq[Long]], Seq(1L, 2L)))
      .toDF("a", "b")
      .select(call_function(GraftFunctions.IntersectSizeName, col("a"), col("b")))
    assert(nullSide.head().isNullAt(0))
    // empty side
    val empty = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(call_function(GraftFunctions.IntersectSizeName, col("a"), col("b")))
    assert(empty.head().getInt(0) == 0)
  }

  test("SQL surface: graft functions callable from spark.sql over temp views") {
    GraftFunctions.register(spark)
    // the engine's other entry point — a user writing ANSI SQL text
    // against registered views gets the same native expressions
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql("""
      SELECT vec_id,
             graft_dot(transform(embedding, x -> CAST(round(x * 1000) AS DOUBLE)),
                       transform(embedding, x -> CAST(round(x * 1000) AS DOUBLE))) AS nrm
      FROM emb_sql WHERE vec_id < 10 ORDER BY vec_id""")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), VectorOps.nativeDot(
        VectorOps.quantize(col("embedding")), VectorOps.quantize(col("embedding"))).as("nrm"))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaDf.toSeq)
    // and a full SQL query with aggregation over the KMV sketch aggregate
    val sketch = spark.sql(
      "SELECT graft_kmv(vec_id, 64) FROM emb_sql").head().getSeq[Long](0)
    assert(sketch.nonEmpty && sketch.length <= 64 && sketch == sketch.sorted)
  }
  test("graft_nfc matches java.text.Normalizer on combining sequences") {
    GraftFunctions.register(spark)
    val cases = Seq(
      "plain ascii",
      "cafe\u0301",            // e + combining acute -> composes
      "caf\u00e9",             // precomposed, NFC-invariant
      "A\u030angstro\u0308m", // two combining marks
      "a\u0328\u0301",        // stacked combining marks on one base
      "\ufb01sh",              // fi ligature: NFC keeps it (NFKC would not)
      "",                       // empty
      "\ud55c\u1100\u1161")  // Hangul: precomposed + decomposed jamo pair
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "raw")
      .select(col("i"), col("raw"), expr("graft_nfc(raw)").as("nfc"))
    val got = df.orderBy(col("i")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    got.foreach { case (raw, nfc) =>
      assert(nfc == java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC),
        s"mismatch for ${raw.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
    // the decomposed forms actually changed (the test isn't vacuous)...
    assert(got(1)._2 == "caf\u00e9" && got(1)._1 != got(1)._2)
    // ...and the NFC-invariant forms passed through unchanged
    assert(got(2)._1 == got(2)._2 && got(5)._1 == got(5)._2)
  }

  test("graft_nfc participates in whole-stage codegen and is null-safe") {
    GraftFunctions.register(spark)
    val df = spark.range(3)
      .select(when(col("id") =!= 1, concat(lit("e\u0301x"), col("id"))).as("raw"))
      .select(col("raw"), expr("graft_nfc(raw)").as("nfc"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(1)) == 1) // null in -> null out
    assert(rows.filter(!_.isNullAt(1)).forall(r => r.getString(1).startsWith("\u00e9x")))
    val plan = df.queryExecution.executedPlan.toString()
    val line = plan.linesIterator.find(_.contains("graft_nfc")).get
    assert(line.trim.startsWith("*("))
    assert(!plan.contains("CodegenFallback"))
  }
}
