package graft

import graft.core.{Graph, ServiceRegistry}
import graft.sources._

class SelectSpec extends SparkSpec {

  private val services =
    ServiceRegistry(Map("sql.backend" -> ParquetCatalog(sf)))

  test("sanitize strips trailing/leading ' \\n;' (readers.py:52)") {
    Select.sanitize("SELECT 1 ;\n") shouldBe "SELECT 1"
    Select.sanitize("\n  SELECT 1") shouldBe "SELECT 1"
    Select.sanitize("SELECT ';' AS c") shouldBe "SELECT ';' AS c"
  }

  test("defaults mirror readers.py:45-47 (query='SELECT 1', packSize=1000)") {
    val cfg = SelectConfig()
    cfg.query shouldBe "SELECT 1"
    cfg.packSize shouldBe 1000
    cfg.limit shouldBe None
  }

  test("parquet-backend select end-to-end through Graph") {
    val g = Graph(Select("SELECT n_nationkey, n_name FROM nation;\n"))
    val out = g.run(spark, services)
    out.count() shouldBe 25
    out.columns.toSeq shouldBe Seq("n_nationkey", "n_name")
  }

  test("file-catalog backend reads csv and json table directories through " +
    "the same Graph/Select surface") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    nation.coalesce(1).write.option("header", "true").csv(s"$tmp/nation.csv")
    nation.coalesce(1).write.json(s"$tmp/nation.json")
    def norm(rows: Array[org.apache.spark.sql.Row]): Seq[(Long, String)] =
      rows.map(r => (r.getAs[Number](0).longValue(), r.getString(1))).toSeq
    val expected = norm(nation.orderBy("n_nationkey").collect())

    val csvOut = norm(Graph(Select("SELECT n_nationkey, n_name FROM nation"))
      .run(spark, ServiceRegistry(Map("sql.backend" ->
        FileCatalog(tmp, "csv", Map("header" -> "true", "inferSchema" -> "true")))))
      .orderBy("n_nationkey").collect())
    csvOut shouldBe expected

    val jsonOut = norm(Graph(Select("SELECT n_nationkey, n_name FROM nation"))
      .run(spark, ServiceRegistry(Map("sql.backend" -> FileCatalog(tmp, "json"))))
      .orderBy("n_nationkey").collect())
    jsonOut shouldBe expected
  }

  test("limit caps total rows (readers.py:47) — exhaustive otherwise " +
    "(single-pack bug readers.py:55 NOT reproduced)") {
    val g = Graph(Select("SELECT l_orderkey FROM lineitem", limit = 10))
    g.run(spark, services).count() shouldBe 10
    // A query larger than the default pack_size must NOT stop at one page.
    val full = Graph(Select("SELECT l_orderkey FROM lineitem"))
      .run(spark, services).count()
    full should be > 1000L
  }

  test("JDBC option map: serial query mode vs range-partitioned parallel mode") {
    val serial = Select.jdbcOptions(SelectConfig("SELECT * FROM t;", packSize = 500))
    serial shouldBe Map("fetchsize" -> "500", "query" -> "SELECT * FROM t")
    val par = Select.jdbcOptions(SelectConfig("SELECT * FROM t",
      partition = Some(JdbcPartitioning("id", 0L, 1000000L, 32))))
    par("dbtable") shouldBe "(SELECT * FROM t) graft_select"
    par("partitionColumn") shouldBe "id"
    par("numPartitions") shouldBe "32"
    par.keySet should not contain "query"
  }

  test("labeled projection = use_labels aliasing (readers.py:66)") {
    val df = Tables.load(spark, sf, "region")
    Select.labeled(df, "region").columns.toSeq shouldBe
      Seq("region_r_regionkey", "region_r_name")
  }
}
