package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TableLoader

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("readDbgen parses pipe-delimited .tbl with trailing separator") {
    val dir = Files.createTempDirectory("graft_dbgen")
    val f = dir.resolve("region.tbl")
    Files.writeString(f,
      "0|AFRICA|nothing special|\n1|AMERICA|also nothing|\n")
    val df = TableLoader.readDbgen(spark, f.toString, "region")
    assert(df.columns.toSeq == Seq("r_regionkey", "r_name", "r_comment"))
    val rows = df.orderBy("r_regionkey").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 0 && rows(0).getString(1) == "AFRICA")
    assert(rows(1).getString(2) == "also nothing")
  }

  test("dbgen schemas cover all 8 TPC-H tables") {
    assert(TableLoader.dbgenSchemas.keySet == Set("part", "supplier",
      "partsupp", "customer", "orders", "lineitem", "nation", "region"))
    assert(TableLoader.dbgenSchemas("lineitem").fields.length == 16)
  }

  test("fixture loader reads every driver table") {
    for (t <- TableLoader.fixtureTables) {
      val df = TableLoader.table(spark, "/root/testdata/sf0.001", t)
      assert(df.columns.nonEmpty, t)
    }
  }
}
