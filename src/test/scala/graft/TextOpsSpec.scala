package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigrams: empty / one-token docs yield empty shingle sets") {
    val df = Seq("", "one", "one two", "a b c").toDF("t")
    val out = df.select(TextOps.wordBigrams(TextOps.tokens(col("t"))))
      .collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set())
    assert(out(1) == Set())
    assert(out(2) == Set("one two"))
    assert(out(3) == Set("a b", "b c"))
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
    val sigs = df.select(col("id"), TextOps.minhashSignature(col("sh"), 4))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sigs("d1") == sigs("d2")) // order-insensitive
    assert(sigs("d1") != sigs("d3"))
  }

  test("simhash: deterministic, identical for identical token bags") {
    val df = Seq("spark scan join", "spark scan join", "totally different words here")
      .toDF("t")
    val out = df.select(TextOps.simhash32(TextOps.tokens(col("t"))))
      .collect().map(_.getLong(0))
    assert(out(0) == out(1))
    assert(out(0) != out(2))
    assert(out(0) >= 0 && out(0) <= 0xFFFFFFFFL)
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
}
