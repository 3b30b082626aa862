package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Validate

class ValidateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("constraint report counts injected violations of every rule") {
    val li = Seq(
      // clean
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.0, "A", "O",
        java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      // quantity out of range + bad flag + dangling orderkey
      (99L, 1L, 1L, 1, 99.0, 100.0, 0.05, 0.0, "X", "O",
        java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      // discount out of range + null shipdate
      (2L, 1L, 1L, 2, 10.0, 100.0, 0.5, 0.0, "N", "O", null)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val ord = Seq(
      (1L, 10L, "O", 100.0), (1L, 10L, "O", 100.0), // duplicate key
      (2L, 11L, "F", -5.0)                          // non-positive price
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Seq((10L, "a"), (10L, "b"), (11L, "c"))
      .toDF("c_custkey", "c_name") // duplicate key
    val docs = Seq((1L, "abc", "en", "s", 3L), (2L, "abc", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Validate.constraintReport(li, ord, cust, docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("lineitem.quantity_in_1_50") == ((3L, 1L)))
    assert(got("lineitem.discount_in_0_0.1") == ((3L, 1L)))
    assert(got("lineitem.returnflag_enum") == ((3L, 1L)))
    assert(got("lineitem.shipdate_not_null") == ((3L, 1L)))
    assert(got("lineitem.orderkey_references_orders") == ((3L, 1L)))
    assert(got("orders.orderkey_unique") == ((3L, 1L)))
    assert(got("orders.totalprice_positive") == ((3L, 1L)))
    assert(got("customer.custkey_unique") == ((3L, 1L)))
    assert(got("documents.n_chars_matches_text") == ((2L, 1L)))
    assert(got.size == 9)
  }
}
