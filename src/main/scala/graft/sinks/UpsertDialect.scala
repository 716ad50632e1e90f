package graft.sinks

/** SQL dialect seam for [[JdbcUpsert]]: a dialect synthesizes the single
  * prepared statement that resolves insert-vs-update atomically on the
  * database, honoring `allowedOperations` gating. The write loop
  * (connection-per-partition, batched binds, commit-per-buffer, prohibited
  * row counting) is dialect-independent; only the statement text and its
  * bind order vary per engine.
  *
  * Shared rules (reference semantics, `writers.py:115-129,167-176`):
  * update SET clauses exclude the discriminant, `insertOnlyFields`, and
  * `createdAtField` (created_at is stamped on insert only — callers stamp
  * both timestamp columns in the DataFrame and the exclusion keeps the
  * insert-time value across updates); update-only mode is a plain
  * `UPDATE … WHERE` on the discriminant, which is engine-independent ANSI
  * SQL and shared by every dialect.
  *
  * Live-execution status in this sandbox: the JDBC write LOOP
  * (connections, batched binds, commit-per-buffer) runs live on embedded
  * Derby (`JdbcIntegrationSpec`), and the POSTGRES dialect's statements
  * now also round-trip on a LIVE local PostgreSQL 15 server
  * (`PostgresLiveSpec` — the sandbox ships server binaries but no JDBC
  * jar, so the generated SQL executes through psql over a throwaway
  * unix-socket cluster: ON CONFLICT insert-vs-update, EXCLUDED values,
  * insert-only/created_at shielding, DO-NOTHING gating and update-only
  * mode are all engine-verified). The ANSI MERGE dialect remains
  * synthesis-tested only: Derby's MERGE rejects derived-table sources
  * ("The source table of a MERGE statement must be a base table or table
  * function" — probed against Derby 10.16; the `USING (VALUES …)` form
  * needs DB2/SQL Server/H2-class MERGE support).
  */
trait UpsertDialect {

  /** Statement honoring `allowedOperations`; returns the SQL plus the
    * column order its `?` placeholders bind in. */
  def upsertSql(table: String, columns: Seq[String], cfg: UpsertConfig,
                canInsert: Boolean, canUpdate: Boolean): (String, Seq[String])

  protected final def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  protected final def updatable(cfg: UpsertConfig)(c: String): Boolean =
    !cfg.discriminant.contains(c) && !cfg.insertOnlyFields.contains(c) &&
      c != cfg.createdAtField

  /** Update-only mode: a plain `UPDATE … WHERE` (no insert path) — ANSI,
    * shared by all dialects. Rejected up front when nothing is updatable
    * (an empty SET is a syntax error). */
  protected final def updateOnlySql(table: String, columns: Seq[String],
                                    cfg: UpsertConfig): (String, Seq[String]) = {
    val setCols = columns.filter(updatable(cfg))
    require(setCols.nonEmpty,
      s"update-only upsert into $table has no updatable columns " +
        s"(all of $columns are discriminant/insert-only/created-at)")
    val sql =
      s"UPDATE ${quote(table)} SET ${setCols.map(c => s"${quote(c)} = ?").mkString(", ")}" +
        s" WHERE ${cfg.discriminant.map(c => s"${quote(c)} = ?").mkString(" AND ")}"
    (sql, setCols ++ cfg.discriminant)
  }
}

/** PostgreSQL (and SQLite ≥3.24) dialect:
  * `INSERT … ON CONFLICT (discriminant) DO UPDATE SET c = EXCLUDED.c` —
  * the engine the reference exercises
  * (`/root/reference/docker-compose.yml:7-12`, `writers.py:161-176`).
  * insert-only → `DO NOTHING`; if nothing remains updatable, `DO UPDATE`
  * degrades to `DO NOTHING`. */
object PostgresUpsertDialect extends UpsertDialect {
  override def upsertSql(table: String, columns: Seq[String], cfg: UpsertConfig,
                         canInsert: Boolean, canUpdate: Boolean): (String, Seq[String]) = {
    if (!canInsert) updateOnlySql(table, columns, cfg)
    else {
      val quoted = columns.map(quote)
      val placeholders = columns.map(_ => "?").mkString(", ")
      val base =
        s"INSERT INTO ${quote(table)} (${quoted.mkString(", ")}) VALUES ($placeholders)"
      val conflict = s" ON CONFLICT (${cfg.discriminant.map(quote).mkString(", ")})"
      val set = columns.filter(updatable(cfg))
        .map(c => s"${quote(c)} = EXCLUDED.${quote(c)}")
      if (!canUpdate || set.isEmpty) (base + conflict + " DO NOTHING", columns)
      else (base + conflict + s" DO UPDATE SET ${set.mkString(", ")}", columns)
    }
  }
}

/** SQL:2003 `MERGE` dialect for engines that accept a parameterized
  * `USING (VALUES (…)) AS V(cols)` derived-table source with this exact
  * spelling — DB2 and H2. (SQL Server additionally requires a terminating
  * semicolon and Oracle pre-23ai rejects both the VALUES source and the
  * `AS V(cols)` alias form — those engines need their own dialects, which
  * is the point of the seam.) One parameter row is the source; matched
  * rows update (when allowed), unmatched rows insert (when allowed).
  * Gating maps to simply OMITTING the corresponding WHEN clause, so
  * prohibited rows are no-ops whose 0 update counts the write loop
  * surfaces, same as the Postgres dialect. */
object AnsiMergeUpsertDialect extends UpsertDialect {
  override def upsertSql(table: String, columns: Seq[String], cfg: UpsertConfig,
                         canInsert: Boolean, canUpdate: Boolean): (String, Seq[String]) = {
    if (!canInsert) updateOnlySql(table, columns, cfg)
    else {
      val quoted = columns.map(quote)
      val placeholders = columns.map(_ => "?").mkString(", ")
      val on = cfg.discriminant
        .map(c => s"T.${quote(c)} = V.${quote(c)}").mkString(" AND ")
      val set = columns.filter(updatable(cfg))
        .map(c => s"${quote(c)} = V.${quote(c)}")
      val matched =
        if (canUpdate && set.nonEmpty)
          s" WHEN MATCHED THEN UPDATE SET ${set.mkString(", ")}"
        else ""
      val insert =
        s" WHEN NOT MATCHED THEN INSERT (${quoted.mkString(", ")})" +
          s" VALUES (${columns.map(c => s"V.${quote(c)}").mkString(", ")})"
      val sql =
        s"MERGE INTO ${quote(table)} T USING (VALUES ($placeholders))" +
          s" AS V(${quoted.mkString(", ")}) ON $on$matched$insert"
      (sql, columns)
    }
  }
}
