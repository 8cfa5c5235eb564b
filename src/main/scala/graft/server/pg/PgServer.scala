package graft.server.pg

import java.net.{InetAddress, ServerSocket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import scala.util.control.NonFatal

import graft.server.Engine

/** PG frontend: accept loop, thread per connection, cancel registry
  * (reference pg_server.go:78-148). One shared SparkSession; each
  * connection tags its Spark jobs with a job group so CancelRequest →
  * cancelJobGroup replaces the reference's context.CancelFunc
  * (SURVEY A14).
  */
final class PgServer(val engine: Engine, port: Int, val authEnabled: Boolean,
    bindAddr: String = "0.0.0.0") {

  /** Loopback connections skip SCRAM exactly as the reference does
    * (pg_auth.go:22-25) — it's how the first CREATE USER is issued.
    * GRAFT_TRUST_LOOPBACK=false turns the bypass off. */
  val trustLoopback: Boolean = sys.env.get("GRAFT_TRUST_LOOPBACK").forall(_ != "false")
  private val pidCounter = new AtomicInteger(1000)
  private val backends = new ConcurrentHashMap[Int, PgConnection]()
  @volatile private var serverSocket: ServerSocket = _

  def nextPid(): Int = pidCounter.incrementAndGet()
  def register(c: PgConnection): Unit = backends.put(c.backendPid, c)
  def unregister(c: PgConnection): Unit = backends.remove(c.backendPid)

  def cancel(pid: Int, secret: Int): Unit = {
    val c = backends.get(pid)
    if (c != null && c.backendSecret == secret) c.cancelRunning()
  }

  def boundPort: Int = serverSocket.getLocalPort

  /** Start accepting; returns immediately (accept loop on a daemon
    * thread). */
  def start(): PgServer = {
    serverSocket = new ServerSocket(port, 128, InetAddress.getByName(bindAddr))
    val t = new Thread(() => acceptLoop(), s"pg-accept-$port")
    t.setDaemon(true)
    t.start()
    this
  }

  private def acceptLoop(): Unit =
    while (!serverSocket.isClosed) {
      try {
        val sock = serverSocket.accept()
        sock.setTcpNoDelay(true)
        val t = new Thread(new PgConnection(sock, this), s"pg-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case NonFatal(e) if !serverSocket.isClosed =>
          System.err.println(s"[pg] accept error: $e")
        case _: Throwable => return
      }
    }

  def stop(): Unit = if (serverSocket != null) serverSocket.close()
}
