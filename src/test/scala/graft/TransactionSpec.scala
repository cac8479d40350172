package graft

import graft.schema.Transaction
import graft.sources.Ingest

class TransactionSpec extends SparkSpec {

  test("silver frame round-trips through the typed Dataset[Transaction]") {
    val dir = "/root/testdata/sf0.001"
    val silver = Ingest.toSilver(Ingest.flattenBronze(
      Ingest.bronzeFromTpch(
        Ingest.table(spark, dir, "lineitem").limit(300),
        Ingest.table(spark, dir, "orders"))))
    val ds = Transaction.dataset(silver)
    assert(ds.count() == silver.count())
    val tx = ds.head()
    assert(tx.checksum.length == 32)
    assert(tx.etl_checksum.length == 32)
    assert(tx.company_id.startsWith("company-"))
    assert(tx.metadata.keySet == Set("flag", "status"))
    assert(tx.created_at.endsWith("T00:00:00"))
    assert(tx.transaction_date != null)
  }
}
