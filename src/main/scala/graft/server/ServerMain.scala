package graft.server

import graft.server.ch.ChServer
import graft.server.pg.PgServer

/** Entry point: one SparkSession, PG frontend on --pg_port (default
  * 5433), ClickHouse HTTP frontend on --ch_port (default 8124) —
  * mirroring the reference's main.go flags (pg 5432 / ch 8123 there;
  * shifted +1 here to avoid clashing with local services).
  *
  * Usage: runMain graft.server.ServerMain [pgPort] [chPort] [sfDir]
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val pgPort = args.lift(0).map(_.toInt).getOrElse(5433)
    val chPort = args.lift(1).map(_.toInt).getOrElse(8124)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val authEnabled = sys.env.get("GRAFT_AUTH").contains("true")

    val spark = graft.engine.GraftSession.local()
    val engine = Engine.bootstrap(spark, sfDir)
    new PgServer(engine, pgPort, authEnabled).start()
    new ChServer(engine, chPort, authEnabled).start()
    println(s"graft server ready: pg=$pgPort ch=$chPort data=$sfDir auth=$authEnabled")
    Thread.currentThread.join() // serve forever
  }
}
