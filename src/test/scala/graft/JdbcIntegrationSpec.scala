package graft

import java.sql.DriverManager

import graft.core.{JdbcEngine, Operation, ProhibitedOperationError}
import graft.sinks.{JdbcUpsert, UpsertConfig}
import graft.sources.{JdbcBackend, JdbcPartitioning, Select, SelectConfig}

/** Live-database integration round-trip mirroring the reference's
  * dockerized-Postgres test (`tests/test_integration.py:171-207`), using
  * embedded Derby (already on Spark's classpath for the Hive metastore) as
  * the stand-in database: generator → table_1 → Select (serial and
  * range-partitioned JDBC reads) → JdbcUpsert → table_2 → Select → golden
  * compare. Identifiers stay UPPERCASE throughout — Derby folds unquoted
  * DDL up, and JdbcUpsert quotes whatever it is given verbatim.
  *
  * The Postgres-dialect `INSERT … ON CONFLICT` path cannot run on Derby
  * (syntax is Postgres-only, per the backend contract note in
  * [[JdbcUpsert.write]]); the update-only plain-`UPDATE` path is standard
  * SQL and runs here for real, exercising the per-partition
  * connect/batch/commit machinery and the prohibited-row counting.
  */
class JdbcIntegrationSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft_derby").toString)

  private val engine = JdbcEngine(
    url = "jdbc:derby:memory:graftdb;create=true",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private val golden = (0 until 10).map(i => (i, s"value for $i"))

  private def withConn[A](f: java.sql.Connection => A): A = {
    Class.forName(engine.driver)
    val c = DriverManager.getConnection(engine.url)
    try f(c) finally c.close()
  }

  private def exec(sql: String): Unit =
    withConn { c => val s = c.createStatement(); try s.execute(sql) finally s.close() }

  override def beforeAll(): Unit = {
    super.beforeAll()
    exec("CREATE TABLE table_1 (id INT PRIMARY KEY, payload VARCHAR(64))")
    exec("CREATE TABLE table_2 (id INT PRIMARY KEY, payload VARCHAR(64))")
    withConn { c =>
      val ps = c.prepareStatement("INSERT INTO table_1 VALUES (?, ?)")
      try golden.foreach { case (i, v) =>
        ps.setInt(1, i); ps.setString(2, v); ps.addBatch()
      } finally { ps.executeBatch(); ps.close() }
      // table_2 pre-seeded stale, with id 9 missing (the prohibited row)
      val ps2 = c.prepareStatement("INSERT INTO table_2 VALUES (?, ?)")
      try (0 until 9).foreach { i =>
        ps2.setInt(1, i); ps2.setString(2, "stale"); ps2.addBatch()
      } finally { ps2.executeBatch(); ps2.close() }
    }
  }

  test("Select reads a live JDBC table, serially and range-partitioned " +
    "(readers.py:59-77 replaced by parallel cursors)") {
    val serial = Select.run(spark, JdbcBackend(engine),
      SelectConfig("SELECT id, payload FROM table_1", packSize = 3))
    serial.orderBy("ID").collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq shouldBe golden

    val partitioned = Select.run(spark, JdbcBackend(engine),
      SelectConfig("SELECT id, payload FROM table_1",
        partition = Some(JdbcPartitioning("ID", 0, 10, 4))))
    partitioned.rdd.getNumPartitions shouldBe 4
    partitioned.orderBy("ID").collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq shouldBe golden
  }

  test("JdbcUpsert writes through real connections: update-only batch " +
    "updates matched rows and counts the prohibited (missing) row") {
    val updates = Select.run(spark, JdbcBackend(engine),
      SelectConfig("SELECT id, payload FROM table_1"))
    val prohibited = JdbcUpsert.write(updates.repartition(3), engine, "TABLE_2",
      UpsertConfig(discriminant = Seq("ID"),
        allowedOperations = Set(Operation.Update)))
    prohibited shouldBe 1L // id 9 does not exist in table_2

    val after = Select.run(spark, JdbcBackend(engine),
      SelectConfig("SELECT id, payload FROM table_2"))
      .orderBy("ID").collect().map(r => (r.getInt(0), r.getString(1)))
    after.toSeq shouldBe golden.take(9) // updated in place; no insert path
  }

  test("strict mode (errorsAsData=false) raises on prohibited rows, " +
    "reference parity (writers.py:115-116,125-126)") {
    val updates = Seq((42, "nobody home")).toDF("ID", "PAYLOAD")
    intercept[ProhibitedOperationError] {
      JdbcUpsert.write(updates, engine, "TABLE_2",
        UpsertConfig(discriminant = Seq("ID"),
          allowedOperations = Set(Operation.Update), errorsAsData = false))
    }
  }

  test("Main --drop/--create DDL mode (commands.py:20-59): statements " +
    "synthesized from the catalog parquet schema echo in dry-run and " +
    "execute against live Derby through the dialect seam") {
    val derbyTypes: org.apache.spark.sql.types.DataType => String = {
      case org.apache.spark.sql.types.StringType => "VARCHAR(255)"
      case org.apache.spark.sql.types.BinaryType => "BLOB"
      case other => graft.sinks.JdbcDdl.sqlType(other)
    }
    // dry-run form: no --jdbc → echoed, not executed (drop precedes create)
    val echoed = scala.collection.mutable.Buffer[String]()
    Main.runDdl(spark, sf, drop = Some("region"), create = Some("region"),
      pk = Seq.empty, jdbcUrl = None, echo = false,
      typeFor = derbyTypes, existenceGuard = false, out = echoed += _)
    echoed.toSeq shouldBe Seq(
      """DROP TABLE "region"""",
      """CREATE TABLE "region" ("r_regionkey" INTEGER, """ +
        """"r_name" VARCHAR(255))""")
    // the default Postgres dialect keeps the reference's guarded DDL
    val pg = scala.collection.mutable.Buffer[String]()
    Main.runDdl(spark, sf, drop = Some("region"), create = None,
      pk = Seq.empty, jdbcUrl = None, echo = false, out = pg += _)
    pg.head shouldBe """DROP TABLE IF EXISTS "region""""
    // live form: create against Derby, prove it exists, drop, prove gone
    Main.runDdl(spark, sf, drop = None, create = Some("region"),
      pk = Seq.empty, jdbcUrl = Some(engine.url), echo = false,
      typeFor = derbyTypes, existenceGuard = false)
    withConn { c =>
      val rs = c.createStatement()
        .executeQuery("""SELECT count(*) FROM "region"""")
      rs.next() shouldBe true
      rs.getInt(1) shouldBe 0
    }
    Main.runDdl(spark, sf, drop = Some("region"), create = None,
      pk = Seq.empty, jdbcUrl = Some(engine.url), echo = false,
      existenceGuard = false)
    intercept[java.sql.SQLException] {
      withConn(_.createStatement()
        .executeQuery("""SELECT count(*) FROM "region""""))
    }
  }
}
