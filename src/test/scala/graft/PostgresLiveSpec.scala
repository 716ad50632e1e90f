package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sinks.{PostgresUpsertDialect, UpsertConfig}

/** Throwaway local PostgreSQL cluster for live dialect validation — the
  * reference's own integration surface runs dockerized Postgres
  * (`tests/test_integration.py:21-61,171-207`). This sandbox ships the
  * SERVER binaries (PostgreSQL 15, Debian packaging) but no JDBC driver
  * jar (zero egress), so the dialect's generated statements execute
  * through `psql` over a unix socket: that validates the SQL TEXT and its
  * `ON CONFLICT` semantics against the real engine — the only
  * Postgres-specific part of the write path, by the dialect seam's
  * design — while the JDBC write LOOP (connections, batched binds,
  * commit-per-buffer) runs live on embedded Derby in
  * `JdbcIntegrationSpec`. One cluster per JVM, initdb'd as the `postgres`
  * system user (initdb refuses root), unix-socket-only (no TCP port to
  * collide on), stopped and deleted by a shutdown hook. */
object PostgresLive {
  import scala.sys.process._

  private def sh(cmd: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val logger = ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n'))
    val code = try Process(cmd).!(logger) catch { case _: Throwable => -1 }
    (code, out.toString)
  }

  private def asPostgres(bin: String, args: String): (Int, String) =
    sh(Seq("su", "postgres", "-s", "/bin/bash", "-c", s"$bin $args"))

  /** Socket directory of the running cluster, or None when the sandbox
    * cannot host one (missing binaries/user) — tests `assume` on it. */
  lazy val cluster: Option[String] =
    try {
      val binDir = Option(new java.io.File("/usr/lib/postgresql").listFiles())
        .getOrElse(Array.empty)
        .map(v => new java.io.File(v, "bin"))
        .filter(b => new java.io.File(b, "initdb").canExecute)
        .sortBy(_.getPath).lastOption
      binDir.flatMap { b =>
        val dir = java.nio.file.Files.createTempDirectory("graft_pglive")
          .toString
        if (sh(Seq("chown", "-R", "postgres:postgres", dir))._1 != 0) None
        else if (asPostgres(s"$b/initdb", s"-D $dir/data -A trust")._1 != 0)
          None
        else if (asPostgres(s"$b/pg_ctl",
            s"""-D $dir/data -l $dir/log -o "-c listen_addresses='' """ +
              s"""-k $dir" start""")._1 != 0) None
        else {
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            asPostgres(s"$b/pg_ctl", s"-D $dir/data -m immediate stop")
            sh(Seq("rm", "-rf", dir))
            ()
          }))
          Some(dir)
        }
      }
    } catch { case _: Throwable => None }

  /** One statement through psql; (exit code, data rows, all output). */
  def psql(sock: String, sql: String): (Int, Seq[String], String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val code = Process(Seq("psql", "-h", sock, "-U", "postgres",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-At", "-c", sql)).!(
      ProcessLogger(s => out.append(s).append('\n'),
        s => err.append(s).append('\n')))
    (code, out.toString.trim.linesIterator.filter(_.nonEmpty).toSeq,
      out.toString + err.toString)
  }
}

/** The Postgres dialect against a LIVE PostgreSQL server — closing the
  * reference's `tests/test_integration.py:171-207` gap to the extent the
  * sandbox allows (server present, JDBC jar absent; see [[PostgresLive]]). */
class PostgresLiveSpec extends AnyFunSuite with Matchers {

  // literal-substitute the dialect's `?` placeholders in its declared
  // bind order — the JDBC executor binds the same order; psql has no
  // binds, so the literals stand in (quoted, so injection-shaped values
  // round-trip too)
  private def lit(v: String): String = "'" + v.replace("'", "''") + "'"
  // split on '?' and interleave positionally — iterative replaceFirst
  // would match a '?' INSIDE an already-substituted literal and mis-bind
  // every subsequent column
  private def fill(stmt: (String, Seq[String]),
                   row: Map[String, String]): String = {
    val parts = stmt._1.split("\\?", -1)
    require(parts.length == stmt._2.length + 1,
      s"${parts.length - 1} placeholders for ${stmt._2.length} bind columns")
    parts.head + stmt._2.zip(parts.tail)
      .map { case (c, rest) => row(c) + rest }.mkString
  }

  test("PostgresUpsertDialect statements round-trip on a LIVE PostgreSQL " +
    "server: ON CONFLICT resolves insert-vs-update atomically, EXCLUDED " +
    "carries the new values, insert-only fields and created_at survive " +
    "updates, DO NOTHING gates inserts-only mode, and update-only mode " +
    "touches no absent key (the reference's dockerized-Postgres " +
    "integration surface, tests/test_integration.py:171-207)") {
    assume(PostgresLive.cluster.isDefined,
      "no local PostgreSQL cluster available in this environment")
    val sock = PostgresLive.cluster.get
    def run(sql: String): Seq[String] = {
      val (code, rows, all) = PostgresLive.psql(sock, sql)
      withClue(s"SQL: $sql\n$all\n") { code shouldBe 0 }
      rows
    }
    run("DROP TABLE IF EXISTS upsert_live")
    run("CREATE TABLE upsert_live (id int PRIMARY KEY, value text, " +
      "locked text, created_at timestamp, updated_at timestamp)")
    val cols = Seq("id", "value", "locked", "created_at", "updated_at")
    val cfg = UpsertConfig(discriminant = Seq("id"),
      insertOnlyFields = Set("locked"))
    def row(id: Int, value: String, locked: String,
            ts: String): Map[String, String] =
      Map("id" -> id.toString, "value" -> lit(value),
        "locked" -> lit(locked), "created_at" -> lit(ts),
        "updated_at" -> lit(ts))
    def state(): Seq[String] =
      run("SELECT id, value, locked, created_at, updated_at " +
        "FROM upsert_live ORDER BY id")

    // full upsert: first execution inserts
    val both = PostgresUpsertDialect.upsertSql("upsert_live", cols, cfg,
      canInsert = true, canUpdate = true)
    both._1 should include("ON CONFLICT")
    both._1 should include("EXCLUDED.")
    run(fill(both, row(1, "v1", "L1", "2026-01-01 00:00:00")))
    state() shouldBe Seq(
      "1|v1|L1|2026-01-01 00:00:00|2026-01-01 00:00:00")
    // same key again: the UPDATE arm fires — value and updated_at take
    // the new row's values, locked (insert-only) and created_at keep the
    // insert-time ones (writers.py:115-129,167-176 semantics)
    run(fill(both, row(1, "v2", "L2", "2026-02-02 00:00:00")))
    state() shouldBe Seq(
      "1|v2|L1|2026-01-01 00:00:00|2026-02-02 00:00:00")

    // inserts-only gating: DO NOTHING leaves matched keys untouched and
    // still inserts new ones
    val insOnly = PostgresUpsertDialect.upsertSql("upsert_live", cols, cfg,
      canInsert = true, canUpdate = false)
    insOnly._1 should include("DO NOTHING")
    run(fill(insOnly, row(1, "v9", "L9", "2026-03-03 00:00:00")))
    run(fill(insOnly, row(2, "w1", "M1", "2026-03-03 00:00:00")))
    state() shouldBe Seq(
      "1|v2|L1|2026-01-01 00:00:00|2026-02-02 00:00:00",
      "2|w1|M1|2026-03-03 00:00:00|2026-03-03 00:00:00")

    // update-only gating: plain UPDATE ... WHERE — matched key updated
    // (insert-only column still shielded), absent key a no-op
    val updOnly = PostgresUpsertDialect.upsertSql("upsert_live", cols, cfg,
      canInsert = false, canUpdate = true)
    updOnly._1 should startWith("UPDATE")
    run(fill(updOnly, Map("value" -> lit("w2"), "locked" -> lit("M9"),
      "updated_at" -> lit("2026-04-04 00:00:00"), "id" -> "2")))
    run(fill(updOnly, Map("value" -> lit("x1"), "locked" -> lit("X1"),
      "updated_at" -> lit("2026-04-04 00:00:00"), "id" -> "42")))
    state() shouldBe Seq(
      "1|v2|L1|2026-01-01 00:00:00|2026-02-02 00:00:00",
      "2|w2|M1|2026-03-03 00:00:00|2026-04-04 00:00:00")

    // quoted identifiers survive the real parser (reserved-word column)
    run("DROP TABLE IF EXISTS \"select\"")
    run("CREATE TABLE \"select\" (id int PRIMARY KEY, \"order\" text, " +
      "created_at timestamp, updated_at timestamp)")
    val tricky = PostgresUpsertDialect.upsertSql("select",
      Seq("id", "order", "created_at", "updated_at"),
      UpsertConfig(discriminant = Seq("id")),
      canInsert = true, canUpdate = true)
    // the '?' inside these literals must NOT capture the next column's
    // placeholder (fill() substitutes positionally, like JDBC binds)
    run(fill(tricky, Map("id" -> "7", "order" -> lit("o?'1"),
      "created_at" -> lit("2026-01-01 00:00:00"),
      "updated_at" -> lit("2026-01-01 00:00:00"))))
    run(fill(tricky, Map("id" -> "7", "order" -> lit("o?'2"),
      "created_at" -> lit("2026-05-05 00:00:00"),
      "updated_at" -> lit("2026-05-05 00:00:00"))))
    run("SELECT \"order\", created_at FROM \"select\" WHERE id = 7") shouldBe
      Seq("o?'2|2026-01-01 00:00:00")
  }
}
