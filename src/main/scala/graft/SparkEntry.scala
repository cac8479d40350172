package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are derived from the colocated registry in
  * [[Queries]] so a query and its oracle can never drift apart.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): the full bronze→silver reference
    * pipeline E2 — build nested bronze, flatten (S1), transform to the
    * 16-field silver record (T1–T5), dedup in-batch (F3) and against the
    * ledger (F1), aggregate per company. Driver smoke-checks rows>0 on
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q00.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. `run` bundles
    * any setup (e.g. q108's bucketed-layout build) with the query, so the
    * map is self-contained for whoever invokes it. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> ((s: SparkSession, dir: String) => q.run(s, dir))).toMap

  /** DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    * (spark.ml LSH/TF-IDF, HLL sketches, simhash) get the driver's
    * weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
