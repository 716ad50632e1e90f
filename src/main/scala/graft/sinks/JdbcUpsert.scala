package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}

import graft.core.{JdbcEngine, Operation, ProhibitedOperationError, UnrecoverableOperationalError}

/** JDBC backend for [[InsertOrUpdate]]: distributed batched upserts via
  * `INSERT … ON CONFLICT (discriminant) DO UPDATE` (Postgres dialect — the
  * only engine the reference exercises, `/root/reference/docker-compose.yml:7-12`).
  *
  * Replaces the reference's 1-connection/1-thread writer with its per-row
  * `SELECT … LIMIT 1` probe (`writers.py:161-165`, 2+ round-trips per row)
  * with one connection **per partition** and one statement batch per
  * `bufferSize` rows — the database resolves insert-vs-update atomically, so
  * no read-before-write race and N-way write parallelism. Transaction
  * granularity matches the reference: commit per buffer flush
  * (`writers.py:88-95`), final partial batch flushed at partition end
  * (`writers.py:70-72`), so re-running converges (at-least-once + upsert
  * keys = the reference's idempotence model, SURVEY.md §4.2).
  */
object JdbcUpsert {

  /** Backend contract notes (vs the set-oriented [[InsertOrUpdate.merge]]):
    * timestamp bookkeeping is done by including stamped `created_at`/
    * `updated_at` columns in `df` (e.g. `current_timestamp()`) — the SET
    * clause automatically excludes `createdAtField` so the insert-time
    * value survives updates; `cfg.clock`/`fetchColumns` do not apply here
    * (no post-write re-read; row-level DB errors fail the batch
    * transaction, the reference's rollback granularity, writers.py:88-95).
    *
    * Prohibited rows (an existing row in insert-only mode, a missing row in
    * update-only mode) are no-ops at the SQL level (`DO NOTHING` / an
    * unmatched `UPDATE`); the reference raises ProhibitedOperationError per
    * such row (writers.py:115-116,125-126). This backend counts them from
    * `executeBatch`'s per-statement update counts (0 affected = prohibited)
    * and returns the count; with `cfg.errorsAsData = false` it throws
    * [[ProhibitedOperationError]] after the write (already-committed
    * buffers stay committed — the reference's per-buffer commit has the
    * same partial-failure shape). Under at-least-once execution (a Spark
    * task retry replaying a partially-committed partition) replayed rows
    * count as prohibited in insert-only mode — exactly as re-running the
    * reference's loop re-raises for rows its earlier run committed
    * (writers.py:88-95,115-116); the count is per-execution, not
    * exactly-once. Drivers that report `Statement.SUCCESS_NO_INFO` instead
    * of real counts are not countable; the PostgreSQL driver reports real
    * counts. */
  def write(df: DataFrame, engine: JdbcEngine, table: String,
            cfg: UpsertConfig = UpsertConfig(),
            dialect: UpsertDialect = PostgresUpsertDialect): Long = {
    val canInsert = cfg.allowedOperations.contains(Operation.Insert)
    val canUpdate = cfg.allowedOperations.contains(Operation.Update)
    if (!canInsert && !canUpdate)
      throw new ProhibitedOperationError(
        "Neither INSERT nor UPDATE operations are allowed by this transformation.")

    val columns = df.columns.toSeq
    require(cfg.discriminant.forall(columns.contains),
      s"rows missing discriminant columns ${cfg.discriminant.filterNot(columns.contains)}")
    val (sql, bindOrder) = dialect.upsertSql(table, columns, cfg, canInsert, canUpdate)
    val props = engine
    val bufferSize = cfg.bufferSize
    // a gated statement can only affect 0 rows when a branch is prohibited
    val gated = !(canInsert && canUpdate)
    val prohibited = df.sparkSession.sparkContext
      .longAccumulator("graft.jdbc.upsert.prohibitedRows")

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = connect(props)
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          def flush(): Unit = {
            val counts = stmt.executeBatch()
            conn.commit()
            if (gated) {
              var i = 0
              while (i < counts.length) {
                if (counts(i) == 0) prohibited.add(1L)
                i += 1
              }
            }
          }
          try {
            var n = 0
            rows.foreach { row =>
              bind(stmt, row, bindOrder)
              stmt.addBatch()
              n += 1
              if (n >= bufferSize) { flush(); n = 0 }
            }
            if (n > 0) flush()
          } finally stmt.close()
        } catch {
          case e: java.sql.SQLException =>
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      }
    }
    if (!cfg.errorsAsData && prohibited.value > 0)
      throw new ProhibitedOperationError(
        s"${prohibited.value} row(s) hit a prohibited operation " +
          "(existing rows in insert-only mode or missing rows in update-only mode).")
    prohibited.value
  }

  /** SQL synthesis for the default (Postgres) dialect — see
    * [[UpsertDialect]] for the seam and the other dialects. */
  private[graft] def upsertSql(table: String, columns: Seq[String],
                               cfg: UpsertConfig, canInsert: Boolean,
                               canUpdate: Boolean): (String, Seq[String]) =
    PostgresUpsertDialect.upsertSql(table, columns, cfg, canInsert, canUpdate)

  private def connect(engine: JdbcEngine): Connection =
    try {
      Class.forName(engine.driver)
      DriverManager.getConnection(engine.url, engine.user, engine.password)
    } catch {
      case e: Exception =>
        // Connection failure at setup is fatal (`writers.py:47-51`).
        throw new UnrecoverableOperationalError(
          s"Could not create JDBC connection: ${e.getMessage}", e)
    }

  private def bind(stmt: PreparedStatement, row: Row, columns: Seq[String]): Unit =
    columns.zipWithIndex.foreach { case (c, i) =>
      val v = row.get(row.fieldIndex(c))
      v match {
        case null => stmt.setObject(i + 1, null)
        case t: Timestamp => stmt.setTimestamp(i + 1, t)
        case other => stmt.setObject(i + 1, other)
      }
    }
}
