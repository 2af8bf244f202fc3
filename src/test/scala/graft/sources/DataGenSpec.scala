package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataGenSpec extends SparkSpec {

  test("deterministic: same seed produces identical rows") {
    val a = DataGen.transactions(spark, 500, seed = 7).collect().toSeq
    val b = DataGen.transactions(spark, 500, seed = 7).collect().toSeq
    assert(a == b)
    val c = DataGen.transactions(spark, 500, seed = 8).collect().toSeq
    assert(a != c)
  }

  test("field domains match the reference producer") {
    val df = DataGen.transactions(spark, 2000).cache()
    try {
      val bad = df.filter(
        col("customer_id").cast("int") < 1 || col("customer_id").cast("int") > 1000 ||
          col("merchant_id") < 1 || col("merchant_id") > 500 ||
          col("amount") < 1.0 || col("amount") > 1000.0 ||
          !col("payment_method").isin("Credit Card", "Debit Card", "PayPal", "UPI", "Net Banking") ||
          !col("status").isin("Success", "Pending", "Failed"))
      assert(bad.count() == 0)
      // amounts are 2-dp (wire format parity with the reference producer)
      assert(df.filter(col("amount") =!= round(col("amount"), 2)).count() == 0)
      // transaction ids unique
      assert(df.select("transaction_id").distinct().count() == 2000)
    } finally df.unpersist()
  }

  test("json wire shape round-trips through Ingest") {
    val parsed = graft.operators.Ingest.parseTransactions(
      DataGen.transactionsJson(spark, 100))
    assert(parsed.filter(col("transaction_id").isNull || col("timestamp").isNull).count() == 0)
    assert(parsed.count() == 100)
  }
}
