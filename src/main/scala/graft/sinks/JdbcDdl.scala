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

  /** `typeFor` is the dialect seam: the default synthesizes Postgres
    * (what the reference manages); tests run the same statements against
    * embedded Derby by mapping the two Postgres-only types (TEXT, BYTEA)
    * to their Derby spellings. `existenceGuard` controls the
    * `IF NOT EXISTS` clause — the reference gets the same tolerance from
    * SQLAlchemy's `checkfirst` catalog probe; engines without the clause
    * (Derby) pass `false` and manage existence themselves. */
  def createTableSql(table: String, schema: StructType,
                     primaryKey: Seq[String] = Seq.empty,
                     typeFor: DataType => String = sqlType,
                     existenceGuard: Boolean = true): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s""""${f.name}" ${typeFor(f.dataType)}$nn"""
    }
    val pk =
      if (primaryKey.isEmpty) ""
      else primaryKey.mkString(", PRIMARY KEY (\"", "\", \"", "\")")
    val guard = if (existenceGuard) "IF NOT EXISTS " else ""
    s"""CREATE TABLE $guard"$table" (${cols.mkString(", ")}$pk)"""
  }

  def dropTableSql(table: String, existenceGuard: Boolean = true): String = {
    val guard = if (existenceGuard) "IF EXISTS " else ""
    s"""DROP TABLE $guard"$table""""
  }

  def execute(engine: JdbcEngine, sql: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(
      engine.url, engine.user, engine.password)
    try { conn.createStatement().execute(sql); () } finally conn.close()
  }
}
