package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val yaml =
    """# reference config/transactions.yaml shape
      |pipelines:
      |  - name: transactions
      |    extraction: numbers
      |    transformations:
      |      - double
      |    filters:
      |      - keep_even
      |    loads:
      |      - remember
      |  - name: passthrough
      |    extraction: numbers
      |""".stripMargin

  test("P1 yaml parse: stages land in the right sections") {
    val confs = Pipeline.parseYaml(yaml)
    assert(confs.map(_.name) == Seq("transactions", "passthrough"))
    val t = confs.head
    assert(t.extraction == "numbers")
    assert(t.transformations == Seq("double"))
    assert(t.filters == Seq("keep_even"))
    assert(t.loads == Seq("remember"))
    assert(confs(1).transformations.isEmpty)
  }

  test("P3/P4 run: extraction → fold transforms → fold filters → loads") {
    var loaded = 0L
    val reg = new Pipeline.Registry()
      .extraction("numbers")((s, _) => s.range(1, 6).toDF("n"))
      .stage("double")(df => df.withColumn("n", col("n") * 2))
      .stage("keep_even")(df => df.filter(col("n") % 4 === 0))
      .load("remember")(df => loaded = df.count())
    val conf = Pipeline.parseYaml(yaml).head
    val out = Pipeline.run(spark, conf, reg)
    val ns = out.select("n").as[Long].collect().sorted.toSeq
    assert(ns == Seq(4L, 8L)) // (1..5)*2 = 2,4,6,8,10 → %4==0 → 4,8
    assert(loaded == 2)
  }

  test("P2 unregistered stage fails fast with its name") {
    val reg = new Pipeline.Registry()
    val e = intercept[NoSuchElementException] { reg.resolveStage("nope") }
    assert(e.getMessage.contains("nope"))
  }
}
