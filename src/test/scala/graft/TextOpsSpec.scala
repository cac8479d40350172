package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: short docs empty, distinct sliding windows otherwise") {
    import graft.operators.TextOps
    import org.apache.spark.sql.functions.col
    val df = Seq("", "a b", "a b c d", "x y x y x y").toDF("t")
      .select(TextOps.wordNgrams(TextOps.tokens(col("t")), 3).as("ng"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) == Seq.empty && out(1) == Seq.empty)
    assert(out(2) == Seq("a b c", "b c d"))
    // distinct: "x y x" and "y x y" each appear twice in the slide
    assert(out(3) == Seq("x y x", "y x y"))
  }

  test("bigrams: empty / one-token docs yield empty shingle sets") {
    val df = Seq("", "one", "one two", "a b c").toDF("t")
    val out = df.select(TextOps.wordBigrams(TextOps.tokens(col("t"))))
      .collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set())
    assert(out(1) == Set())
    assert(out(2) == Set("one two"))
    assert(out(3) == Set("a b", "b c"))
  }

  test("decontaminate: probe n-gram hits, self-matches excluded, clean docs absent") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),    // shares "quick brown fox" with probe 10
      (2L, "totally unrelated words here"), // clean
      (3L, "quick brown fox quick brown fox again"), // same hit, twice in text → counted once
      (10L, "benchmark quick brown fox prompt")      // the probe itself
    ).toDF("doc_id", "text")
    val probes = corpus.where(col("doc_id") === 10)
    val out = TextOps.decontaminate(corpus, probes, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    // doc 10 is the probe: its self-match is excluded, so only 1 and 3 flag
    assert(out.map(_._1).toSeq == Seq(1L, 3L))
    assert(out.forall { case (_, nProbes, nGrams) => nProbes == 1 && nGrams == 1 })
  }

  test("jaccard basics") {
    val df = Seq((Seq("a", "b"), Seq("b", "c")), (Seq.empty[String], Seq.empty[String]))
      .toDF("x", "y")
    val out = df.select(TextOps.jaccard(col("x"), col("y"))).collect().map(_.getDouble(0))
    assert(out(0) == 1.0 / 3.0)
    assert(out(1) == 0.0)
  }

  test("minhash: identical sets → identical signatures; supersets differ") {
    val df = Seq(
      ("d1", Seq("x y", "y z")), ("d2", Seq("y z", "x y")), ("d3", Seq("x y", "q r"))
    ).toDF("id", "sh")
    val sigs = df.select(col("id"),
        TextOps.minhashSignature(TextOps.shingleHashes(col("sh")), 4))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("d1") == sigs("d2")) // order-insensitive
    assert(sigs("d1") != sigs("d3"))
    assert(sigs("d1").forall(h => h >= 0 && h < TextOps.MinhashP))
  }

  test("simhash: deterministic, identical for identical token bags") {
    val df = Seq((1L, "spark scan join"), (2L, "spark scan join"),
      (3L, "totally different words here"), (4L, "")).toDF("id", "t")
    val out = TextOps.simhash(df, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out(1L) >= 0 && out(1L) <= 0xFFFFFFFFL)
    assert(out(4L) == 0L) // empty doc → zero fingerprint
  }

  test("langid: marker voting with first-match tie-break") {
    val df = Seq("the cat and the dog", "el gato de la casa", "nothing matching")
      .toDF("t")
    val out = df.select(TextOps.predictLang(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("fingerprint normalizes whitespace and case") {
    val df = Seq(("A  b\tc", "a b c")).toDF("x", "y")
    val r = df.select(
      TextOps.fingerprint(col("x")) === TextOps.fingerprint(col("y"))).head()
    assert(r.getBoolean(0))
  }

  test("extractHtml strips markup bodily and decodes entities once") {
    val cases = Seq(
      // script/style bodies vanish ENTIRELY (incl. a bare < inside js)
      ("<p>keep</p><script>if (1 < 2) { alert('x'); }</script><b>this</b>",
        "keep this"),
      ("<style>.nav { display: none; }</style>real content", "real content"),
      // comments vanish; tags become whitespace (no word gluing)
      ("before<!-- secret -->after<br>line", "before after line"),
      // attribute-laden and self-closing tags
      ("""<a href="http://x" class='y'>link</a><img src="z"/>end""", "link end"),
      // entities: one decode pass; &amp;lt; is literal "&lt;", not "<"
      ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; c&nbsp;d &amp;lt;",
        "a & b <tag> \"q\" 's' c d &lt;"),
      // entity without semicolon and unknown entity stay as-is
      ("&amp x &bogus; y", "&amp x &bogus; y"),
      // whitespace collapse across newlines/tabs
      ("<div>\n  spaced \t text\n</div>", "spaced text"),
      // empty and markup-only inputs
      ("", ""),
      ("<html><head></head><body></body></html>", ""),
      // DOCUMENTED naive-regex limit: a bare < in text with a later >
      // is treated as a tag and over-stripped (malformed HTML input)
      ("a < b then c > d", "a d"))
    val out = Seq.tabulate(cases.length)(i => (i.toLong, cases(i)._1))
      .toDF("id", "html")
    val got = TextOps.extractHtml(out, "id", "html")
      .orderBy("id").collect()
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i).getString(1) == want, s"case $i: input $in")
    }
    // boilerplate_ratio: 0 on empty input, 1 on markup-only, in (0,1) on mixed
    val ratios = got.map(_.getDouble(2))
    assert(ratios(7) == 0.0)
    assert(ratios(8) == 1.0)
    assert(ratios(0) > 0 && ratios(0) < 1)
    assert(math.abs(ratios(0) - (1.0 - "keep this".length.toDouble / cases(0)._1.length)) < 1e-15)
  }
}
