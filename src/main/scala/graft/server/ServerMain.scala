package graft.server

import graft.server.ch.ChServer
import graft.server.pg.PgServer

/** Entry point: one SparkSession, PG frontend on --pg_port (default
  * 5433), ClickHouse HTTP frontend on --ch_port (default 8124) —
  * mirroring the reference's main.go flags (pg 5432 / ch 8123 there;
  * shifted +1 here to avoid clashing with local services).
  *
  * Security posture mirrors the reference (main.go:21 `auth` defaults
  * TRUE): SCRAM auth is ON unless explicitly disabled, and loopback
  * connections are trusted exactly as the reference does
  * (pg_auth.go:22-25) so the first `CREATE USER` can be issued
  * locally. Hardening beyond the reference: with auth disabled the
  * listeners bind 127.0.0.1 only, and server-side `COPY … TO/FROM
  * 'file'` host file I/O is refused unless --allow-file-io is given.
  *
  * Usage: runMain graft.server.ServerMain [pgPort] [chPort] [sfDir]
  *          [--auth=false] [--allow-file-io] [--db_path=DIR]
  * Env equivalents: GRAFT_AUTH, GRAFT_ALLOW_FILE_IO, GRAFT_DB_PATH.
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    def flag(name: String): Option[String] =
      flags.collectFirst {
        case f if f == s"--$name" => "true"
        case f if f.startsWith(s"--$name=") => f.drop(name.length + 3)
      }
    val pgPort = pos.lift(0).map(_.toInt).getOrElse(5433)
    val chPort = pos.lift(1).map(_.toInt).getOrElse(8124)
    val sfDir = pos.lift(2).getOrElse("/root/testdata/sf0.001")
    // auth defaults ON, like the reference (main.go:21)
    val authEnabled =
      flag("auth").orElse(sys.env.get("GRAFT_AUTH")).forall(_.toBoolean)
    val allowFileIo =
      flag("allow-file-io").orElse(sys.env.get("GRAFT_ALLOW_FILE_IO")).exists(_.toBoolean)
    val dbPath = flag("db_path").orElse(sys.env.get("GRAFT_DB_PATH"))

    val spark = dbPath match {
      case Some(p) => graft.engine.GraftSession.local(warehouse = Some(s"$p/warehouse"))
      case None => graft.engine.GraftSession.local()
    }
    // wire results drain through one client socket: a root ORDER BY is
    // presentation order, sorted at the gather point (PresentationSort)
    spark.conf.set(graft.plans.PresentationSort.ConfKey, "true")
    val engine = Engine.bootstrap(spark, sfDir, allowFileIo = allowFileIo, dbPath = dbPath)
    // auth off ⇒ loopback-only bind (no unauthenticated remote surface);
    // auth on ⇒ all interfaces, like the reference's ":5432"
    val bindAddr = if (authEnabled) "0.0.0.0" else "127.0.0.1"
    new PgServer(engine, pgPort, authEnabled, bindAddr).start()
    new ChServer(engine, chPort, authEnabled, bindAddr).start()
    println(s"graft server ready: pg=$pgPort ch=$chPort data=$sfDir auth=$authEnabled " +
      s"fileIo=$allowFileIo db=${dbPath.getOrElse("(ephemeral)")}")
    Thread.currentThread.join() // serve forever
  }
}
