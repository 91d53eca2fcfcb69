package graft.tgraph.query

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

/** MULTI-NAMESPACE queryable state — one live endpoint fronting the
  * state stores of SEVERAL running streaming queries, the analog of
  * the reference's `tgraph/query/MultiStateQuery.java` applied to the
  * serving tier (one [[QueryServer]] fronts one store; a
  * multi-namespace pipeline like the purchases graph runs one
  * streaming query PER namespace, so its live surface is several
  * stores behind one address).
  *
  * Protocol: every request is namespace-tagged —
  * {{{
  *   NS <namespace> <request>   → the inner QueryServer's answer for
  *                                <request> (POINT/PRED/COUNT, with
  *                                all cursor clauses), with
  *                                "ns":"<namespace>" prepended
  *   anything else              → {"error":"..."}
  * }}}
  *
  * Consistency contract: each namespace runs as its OWN streaming
  * query with its own committed-batch sequence, so one answer pins ONE
  * epoch of ONE namespace (the response's `"batch"` field); answers
  * never mix epochs within a namespace (the inner server's snapshot
  * discipline), and a cross-namespace reader correlates epochs through
  * the per-answer `(ns, batch)` pair — exactly the per-namespace
  * watermark the reference's multi-state query reports per result
  * partition. `AT <batch>` pins follow-up pages per namespace as in
  * the single-store protocol.
  *
  * The inner servers are OWNED: closing this endpoint closes them.
  */
final class MultiQueryServer(
    namespaces: Map[String, QueryServer],
    port: Int = 0) extends AutoCloseable {
  require(namespaces.nonEmpty, "at least one namespace required")

  private val running = new AtomicBoolean(true)
  private val server = new ServerSocket(port)
  private val pool = Executors.newFixedThreadPool(8)

  def boundPort: Int = server.getLocalPort

  /** The committed epoch namespace `ns`'s next answer will reflect. */
  def servedBatchId(ns: String): Long = namespaces(ns).servedBatchId

  private def respond(req: String): String = {
    val parts = req.trim.split("\\s+", 3)
    if (!parts(0).equalsIgnoreCase("NS") || parts.length < 3)
      s"""{"error":"requests must be NS <namespace> <request>"}"""
    else namespaces.get(parts(1)) match {
      case None =>
        // raw client input inside a JSON string: strip the two
        // JSON-breaking characters (the exception path does the same)
        val safe = parts(1).take(40).replace('"', '\'').replace('\\', '/')
        s"""{"error":"unknown namespace $safe"}"""
      case Some(inner) =>
        val r = inner.respond(parts(2))
        if (r.startsWith("{")) s"""{"ns":"${parts(1)}",${r.drop(1)}"""
        else r
    }
  }

  private def handle(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(sock.getOutputStream, true)
      var line = in.readLine()
      while (line != null && running.get()) {
        val resp =
          try respond(line)
          catch { case e: Throwable =>
            s"""{"error":"${Option(e.getMessage).getOrElse(e.getClass.getName).take(80).replace('"', '\'')}"}"""
          }
        out.println(resp)
        line = in.readLine()
      }
    } catch { case _: Throwable => () }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        pool.submit(new Runnable { def run(): Unit = handle(sock) })
      } catch {
        case _: SocketException => () // closed during accept — shutting down
        case e: Throwable =>
          if (running.get())
            System.err.println(s"[multi-query-server] accept failed: ${e.getMessage}")
      }
    }
  }, "multi-query-server-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => () }
    pool.shutdownNow()
    namespaces.values.foreach { s =>
      try s.close() catch { case _: Throwable => () }
    }
  }
}
