package graft.sinks

import org.apache.spark.sql.types._

import graft.core.JdbcEngine

/** DDL management helpers, the analog of the reference's CLI `--drop /
  * --create / --echo` table management (`/root/reference/examples/
  * commands.py:20-59`). SQL synthesis is pure (unit-testable); execution
  * goes through a plain JDBC statement on the driver — DDL is not data-
  * parallel work. Postgres dialect, matching the only engine the reference
  * exercises. */
object JdbcDdl {

  /** Map a Spark type to its Postgres column type. String length metadata
    * is not modeled (Spark's StringType is unbounded; the reference's
    * String(255) columns land on TEXT — Spark JDBC does the same). */
  def sqlType(dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "TEXT"
    case BinaryType => "BYTEA"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no JDBC DDL mapping for $other")
  }

  def createTableSql(table: String, schema: StructType,
                     primaryKey: Seq[String] = Seq.empty): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s""""${f.name}" ${sqlType(f.dataType)}$nn"""
    }
    val pk =
      if (primaryKey.isEmpty) ""
      else primaryKey.mkString(", PRIMARY KEY (\"", "\", \"", "\")")
    s"""CREATE TABLE IF NOT EXISTS "$table" (${cols.mkString(", ")}$pk)"""
  }

  def dropTableSql(table: String): String = s"""DROP TABLE IF EXISTS "$table""""

  def execute(engine: JdbcEngine, sql: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(
      engine.url, engine.user, engine.password)
    try { conn.createStatement().execute(sql); () } finally conn.close()
  }
}
