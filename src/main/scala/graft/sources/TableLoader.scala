package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table ingestion, mirroring the reference's loaders.
  *
  * Two paths:
  *  1. Parquet fixtures (`/root/testdata/sf*`; schemas in FIXTURES.md §B) —
  *     the driver's correctness/bench inputs. Parquet carries its own
  *     schema; predicate pushdown and column pruning reach the scan for
  *     free (verify via `.explain`: `PushedFilters`, `ReadSchema`).
  *  2. dbgen `.tbl`/CSV — the reference's own format: pipe-delimited, no
  *     header, explicit column names, one trailing empty column
  *     (`/root/reference/benchmark/tpch/loaddata.py:14-29` for part,
  *     `:103-134` lineitem, `:151-161` region; `dd.read_csv` variant
  *     `:51-63`). Unlike the reference (dtype inference left to pandas,
  *     `loaddata.py` passes only `names=`), we give Spark explicit
  *     `StructType`s: schema-on-read is mandatory at 100 TB — sampling
  *     inference is a full extra scan.
  *
  * Paths may be local, globs, or any Hadoop FS URL (`s3a://`, `hdfs://`),
  * matching the reference's multi-protocol loaders
  * (`loaddata.py:8-9`, `benchmark/test_tpch.py:15-24`).
  */
object TableLoader {

  /** Fixture tables (TESTDATA.md). */
  val fixtureTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Opt-in table caching (`-Dgraft.cacheTables=true`), mirroring the
    * reference harness's `client.persist` of loaded tables before
    * timing (`/root/reference/benchmark/test_tpch.py:114-115`): each
    * (dir, table) is read once and kept in the storage layer. Off by
    * default — the correctness gate measures cold-path reads.
    */
  private val cacheTables: Boolean =
    sys.props.get("graft.cacheTables").contains("true")
  private val cached =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Read one driver fixture table: `dir/name.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (cacheTables)
      cached.getOrElseUpdate((dir, name),
        spark.read.parquet(s"$dir/$name.parquet").cache())
    else spark.read.parquet(s"$dir/$name.parquet")

  // --- dbgen path (reference format A) -------------------------------

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  /** Full TPC-H dbgen schemas, columns per
    * `/root/reference/benchmark/tpch/loaddata.py` (part `:17-28`,
    * supplier `:37-46`, partsupp `:54-61`, customer `:69-78`, orders
    * `:87-97`, lineitem `:106-123`, nation `:140-145`, region
    * `:153-158`). Dates stay strings on this path — the reference never
    * parses them (`loaddata.py:126-131` commented out) and compares
    * ISO-8601 strings lexicographically, which is order-equivalent.
    */
  val dbgenSchemas: Map[String, StructType] = Map(
    "part" -> st(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_mfgr" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_container" -> StringType, "p_retailprice" -> DoubleType,
      "p_comment" -> StringType),
    "supplier" -> st(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_address" -> StringType, "s_nationkey" -> IntegerType,
      "s_phone" -> StringType, "s_acctbal" -> DoubleType,
      "s_comment" -> StringType),
    "partsupp" -> st(
      "ps_partkey" -> LongType, "ps_suppkey" -> LongType,
      "ps_availqty" -> IntegerType, "ps_supplycost" -> DoubleType,
      "ps_comment" -> StringType),
    "customer" -> st(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_address" -> StringType, "c_nationkey" -> IntegerType,
      "c_phone" -> StringType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType, "c_comment" -> StringType),
    "orders" -> st(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> StringType, "o_orderpriority" -> StringType,
      "o_clerk" -> StringType, "o_shippriority" -> IntegerType,
      "o_comment" -> StringType),
    "lineitem" -> st(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> StringType, "l_commitdate" -> StringType,
      "l_receiptdate" -> StringType, "l_shipinstruct" -> StringType,
      "l_shipmode" -> StringType, "l_comment" -> StringType),
    "nation" -> st(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType, "n_comment" -> StringType),
    "region" -> st(
      "r_regionkey" -> IntegerType, "r_name" -> StringType,
      "r_comment" -> StringType)
  )

  /** Read a dbgen pipe-delimited file (S1/S2 in SURVEY §2.1). dbgen rows
    * end with a trailing `|`, which Spark parses as one extra null
    * column when the schema carries a sentinel field — we append it to
    * the read schema and drop it, the moral equivalent of the
    * reference's unnamed trailing column (`loaddata.py:28,47`).
    */
  def readDbgen(spark: SparkSession, path: String, tableName: String): DataFrame =
    if (cacheTables)
      cached.getOrElseUpdate((path, tableName), readDbgenRaw(spark, path, tableName).cache())
    else readDbgenRaw(spark, path, tableName)

  private def readDbgenRaw(spark: SparkSession, path: String, tableName: String): DataFrame = {
    val schema = dbgenSchemas(tableName)
    val withTrailer = StructType(
      schema.fields :+ StructField("_trailing_empty", StringType, nullable = true))
    spark.read
      .option("sep", "|")
      .option("header", "false")
      .schema(withTrailer)
      .csv(path)
      .drop("_trailing_empty")
  }
}
