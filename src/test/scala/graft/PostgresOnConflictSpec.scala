package graft

import graft.sinks.JdbcSink
import graft.sources.Logs
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Executes the reference's ACTUAL idempotence contract —
  * `INSERT … ON CONFLICT (pk) DO NOTHING` (get_logs.go:118-126) —
  * against a REAL PostgreSQL server, closing the one reference code
  * path that had never run against its real target (carried since
  * r7; the Derby integration executes the shared batching executor
  * through the portable WHERE NOT EXISTS dialect, but Derby rejects
  * the ON CONFLICT syntax itself).
  *
  * No Postgres JDBC driver jar exists in the sandbox, so the drive
  * goes through `psql` instead of `JdbcSink.appendBatched`: the spec
  * takes the EXACT statement text `OnConflictDoNothingDialect`
  * renders, applies the same `?` → `$n` placeholder rewrite the pg
  * JDBC driver performs on the wire, PREPAREs it, and EXECUTEs rows
  * — replays, intra-batch duplicates and typed NULLs included. What
  * is certified here is therefore the statement's semantics on its
  * real engine; the executor plumbing stays certified by Derby.
  *
  * The server runs as `nobody` (postgres refuses root) on a
  * unix socket in a temp dir — no ports, no network. If the
  * binaries are missing or the cluster cannot start, the test
  * CANCELS (sandbox without Postgres) rather than fails. */
class PostgresOnConflictSpec extends AnyFunSuite {

  private def sh(cmd: String): (Int, String) = {
    val out = new StringBuilder
    val rc = Process(Seq("sh", "-c", cmd)) ! ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n'))
    (rc, out.toString)
  }
  private def asNobody(cmd: String): (Int, String) =
    sh(s"""su nobody -s /bin/sh -c 'cd / && $cmd' 2>&1""")

  test("reference ON CONFLICT statement is idempotent on real PostgreSQL") {
    val haveBins = Seq("initdb", "pg_ctl", "psql").forall(b => sh(s"which $b")._1 == 0)
    assume(haveBins, "postgres binaries not in this sandbox")
    val work = java.nio.file.Files.createTempDirectory("graft_pg").toString
    sh(s"chown nobody $work")
    val data = s"$work/data"
    val (rcInit, outInit) = asNobody(s"initdb -D $data")
    assume(rcInit == 0, s"initdb failed: $outInit")
    val (rcStart, outStart) = asNobody(
      s"""pg_ctl -D $data -l $work/log -o "-k $work -c listen_addresses=" start""")
    assume(rcStart == 0, s"pg_ctl start failed: $outStart")
    try {
      def psqlFile(path: String): (Int, String) =
        asNobody(s"psql -h $work -d postgres -v ON_ERROR_STOP=1 -q -t -A -f $path")
      def runSql(sql: String): String = {
        val f = java.nio.file.Files.createTempFile("graft_pg_sql", ".sql")
        java.nio.file.Files.writeString(f, sql)
        f.toFile.setReadable(true, false)
        val (rc, out) = psqlFile(f.toString)
        assert(rc == 0, s"psql failed:\n$out\nfor sql:\n$sql")
        out.trim
      }
      // table DDL from OUR analytic schema (mirrors schema.sql's
      // column set) with the reference PK
      val pgType: org.apache.spark.sql.types.DataType => String = {
        case org.apache.spark.sql.types.StringType => "text"
        case org.apache.spark.sql.types.LongType => "bigint"
        case org.apache.spark.sql.types.BooleanType => "boolean"
        case org.apache.spark.sql.types.TimestampType => "timestamp"
        case other => fail(s"unmapped type $other")
      }
      val ddlCols = Logs.schema.fields.map(f => s"${f.name} ${pgType(f.dataType)}")
      runSql(s"""create table logs (${ddlCols.mkString(", ")},
        |  primary key (${Logs.pk.mkString(", ")}));""".stripMargin)

      // THE statement under test: the dialect's exact text, with the
      // same ?→$n rewrite the pg JDBC driver applies on the wire
      val stmt = JdbcSink.OnConflictDoNothingDialect.statement(
        "logs", Logs.schema.fields.toSeq, Logs.pk)
      assert(stmt.contains("on conflict (block_hash, transaction_hash, log_index) do nothing"))
      var i = 0
      val dollar = stmt.flatMap { c =>
        if (c == '?') { i += 1; s"$$$i" } else c.toString
      }
      def exec(blockHash: String, txHash: String, logIdx: Long, data: String): String =
        s"""execute ins('0xaaa', '0xsig', null, null, null, $data,
           |  '$blockHash', 1, '$txHash', 0, $logIdx, false, null);""".stripMargin
      val script =
        s"""prepare ins as
           |$dollar;
           |${exec("0xb1", "0xt1", 0, "'0x01'")}
           |${exec("0xb1", "0xt1", 1, "'0x02'")}
           |${exec("0xb2", "0xt2", 0, "null")}
           |${exec("0xb1", "0xt1", 0, "'0xff'")}
           |select count(*) from logs;""".stripMargin
      // first run: 3 unique PKs land, the intra-batch duplicate is
      // absorbed IN-STATEMENT (the contract Derby cannot execute)
      assert(runSql(script) === "3")
      // full replay: every insert conflicts, count unchanged — the
      // reference's crash-replay idempotence, on its real engine
      assert(runSql(script) === "3")
      // DO NOTHING means first write wins: the duplicate's data value
      // did not overwrite the original, and typed nulls round-trip
      val row = runSql(
        "select data, block_timestamp is null from logs where block_hash='0xb1' and log_index=0;")
      assert(row === "0x01|t")
      assert(runSql("select data is null from logs where block_hash='0xb2';") === "t")
    } finally {
      asNobody(s"pg_ctl -D $data stop -m fast")
      sh(s"rm -rf $work")
    }
  }
}
