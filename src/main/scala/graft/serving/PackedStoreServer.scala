package graft.serving

import graft.operators.Incremental
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

/** TIME-TRAVEL reads over the wire — the CDC packed store (the
  * training-consumer output, manifest-committed by
  * [[graft.operators.IncrementalCdc]]) served through a line-protocol
  * TCP endpoint with `AT VERSION` pinning: rows 127 + 128 composed.
  * A consumer pins the version it first resolved and keeps reading a
  * CONSISTENT snapshot however many commits the live writer publishes
  * under it (the retention contract: a reader ≤ `retainVersions`
  * behind never loses a file); a version past retention is a DEFINED
  * error, not a wrong read.
  *
  * Protocol (one request line → one JSON response line; `v` optional
  * everywhere, default = the store's latest at request time):
  * {{{
  *   VERSION            → {"version":N}
  *   COUNT [v]          → {"version":v,"count":N}
  *   SCAN grp [v]       → {"version":v,"rows":[[doc_id,seq_id,begin_in_seq,end_in_seq,doc_begin,n_piece,starts_doc],...]}
  *   RANGE grp lo hi [v] → same rows shape, doc_id ∈ [lo, hi]
  *   anything else      → {"error":"..."}
  * }}}
  *
  * SCAN reads exactly the pinned manifest's files of one `grp`
  * partition (pruned — nothing else opens), ordered (seq_id,
  * begin_in_seq, doc_begin): the shard-consumer read shape. RANGE
  * additionally prunes by the manifest ZONE MAPS (the per-file doc_id
  * bounds the CDC packed commits record) before the exact predicate —
  * a consumer after one doc-id slice opens only the partition files
  * whose bounds intersect. Requests run Spark jobs (this is the
  * bulk-consumer tier, not the microsecond point-query tier — that is
  * [[graft.tgraph.query.QueryServer]]).
  */
final class PackedStoreServer(
    spark: SparkSession,
    storeDir: String,
    port: Int = 0,
    txDir: Option[String] = None) extends AutoCloseable {

  private val running = new AtomicBoolean(true)
  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  private def latest: Option[Long] =
    graft.sources.ManifestStore.latestVersion(storeDir)

  private def respond(req: String): String = {
    val parts = req.trim.split("\\s+")
    parts(0).toUpperCase match {
      case "VERSION" =>
        latest match {
          case Some(v) => s"""{"version":$v}"""
          case None => s"""{"error":"empty store (no manifest)"}"""
        }
      case "TX" if parts.length <= 2 =>
        // resolve a CROSS-STORE tx record (latest or pinned): the
        // client reads "packed" for its SCAN pins here and the other
        // stores' versions for whatever else it consults — N reads,
        // ONE consistent combination (rows 132 + 133 composed)
        txDir match {
          case None => s"""{"error":"no tx log behind this store"}"""
          case Some(td) =>
            val tx = graft.sources.TxLog.read(td,
              if (parts.length == 2) Some(parts(1).toLong) else None)
            val vs = tx.versions.toSeq.sortBy(_._1)
              .map { case (k, v) => s""""$k":$v""" }.mkString(",")
            s"""{"tx":${tx.txId},"batch":${tx.batchId},"versions":{$vs}}"""
        }
      case "COUNT" if parts.length <= 2 =>
        val v = if (parts.length == 2) parts(1).toLong
          else latest.getOrElse(
            return s"""{"error":"empty store (no manifest)"}""")
        val n = graft.sources.ManifestStore.read(
          spark, storeDir, Incremental.PackedSchema, "grp",
          partVals = None, version = Some(v)).count()
        s"""{"version":$v,"count":$n}"""
      case "SCAN" if parts.length == 2 || parts.length == 3 =>
        val grp = parts(1).toLong
        val v = if (parts.length == 3) parts(2).toLong
          else latest.getOrElse(
            return s"""{"error":"empty store (no manifest)"}""")
        scanRows(grp, v, idRange = None)
      case "RANGE" if parts.length == 4 || parts.length == 5 =>
        val grp = parts(1).toLong
        val (lo, hi) = (parts(2).toLong, parts(3).toLong)
        val v = if (parts.length == 5) parts(4).toLong
          else latest.getOrElse(
            return s"""{"error":"empty store (no manifest)"}""")
        scanRows(grp, v, idRange = Some((lo, hi)))
      case other =>
        s"""{"error":"unknown request ${other.take(40)}"}"""
    }
  }

  /** One partition's rows at a pinned version; `idRange` engages the
    * manifest zone maps (file-granular) and then the exact predicate.
    */
  private def scanRows(
      grp: Long, v: Long, idRange: Option[(Long, Long)]): String = {
    val base = graft.sources.ManifestStore.read(
      spark, storeDir, Incremental.PackedSchema, "grp",
      partVals = Some(Seq(grp)), version = Some(v),
      range = idRange.map { case (lo, hi) => ("doc_id", lo, hi) })
    val exact = idRange.fold(base) { case (lo, hi) =>
      base.filter(col("doc_id").between(lo, hi)) }
    val rows = exact
      .orderBy("seq_id", "begin_in_seq", "doc_begin")
      .select(col("doc_id"), col("seq_id"), col("begin_in_seq"),
        col("end_in_seq"), col("doc_begin"), col("n_piece"),
        col("starts_doc").cast("int"))
      .collect()
      .map(r => s"[${(0 until 7).map(r.get(_)).mkString(",")}]")
    s"""{"version":$v,"rows":[${rows.mkString(",")}]}"""
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
            // a pinned version aged out of retention surfaces here as
            // ManifestStore.files' require — the defined-error path
            s"""{"error":"${Option(e.getMessage).getOrElse(e.getClass.getName).take(120).replace('"', '\'')}"}"""
          }
        out.println(resp)
        line = in.readLine()
      }
    } catch { case _: Throwable => () }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  private val acceptor = new Thread(() => {
    try {
      while (running.get()) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "packed-server-client")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: Throwable => () }
  }, "packed-server-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => () }
  }
}

/** Minimal line-protocol client for [[PackedStoreServer]]. */
final class PackedStoreClient(host: String, port: Int) extends AutoCloseable {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new BufferedReader(
    new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
  private val out = new PrintWriter(sock.getOutputStream, true)

  def request(line: String): String = {
    out.println(line)
    val r = in.readLine()
    require(r != null, "server closed the connection")
    r
  }

  def version(): Long =
    PackedStoreClient.VerRe.findFirstMatchIn(request("VERSION"))
      .map(_.group(1).toLong)
      .getOrElse(sys.error(s"no version: ${request("VERSION")}"))

  def count(at: Option[Long] = None): Long =
    PackedStoreClient.CountRe.findFirstMatchIn(
      request(s"COUNT${at.fold("")(v => s" $v")}"))
      .map(_.group(1).toLong)
      .getOrElse(sys.error("malformed COUNT response"))

  /** Raw SCAN response line (callers parse rows or check errors). */
  def scan(grp: Long, at: Option[Long] = None): String =
    request(s"SCAN $grp${at.fold("")(v => s" $v")}")

  /** Raw RANGE response line: one partition, doc_id ∈ [lo, hi],
    * zone-map-pruned server-side.
    */
  def scanRange(
      grp: Long, lo: Long, hi: Long, at: Option[Long] = None): String =
    request(s"RANGE $grp $lo $hi${at.fold("")(v => s" $v")}")

  /** Resolve a cross-store tx (latest or pinned): (txId, store →
    * version). Pin SCANs to `versions("packed")` and read any other
    * store AT its recorded version for one consistent combination.
    */
  def tx(at: Option[Long] = None): (Long, Map[String, Long]) = {
    val r = request(s"TX${at.fold("")(v => s" $v")}")
    require(!r.contains("\"error\""), s"TX failed: $r")
    val id = PackedStoreClient.TxRe.findFirstMatchIn(r)
      .map(_.group(1).toLong).getOrElse(sys.error(s"malformed TX: $r"))
    val vs = PackedStoreClient.KvRe.findAllMatchIn(r)
      .map(m => m.group(1) -> m.group(2).toLong).toMap - "tx" - "batch"
    (id, vs)
  }

  override def close(): Unit = {
    try sock.close() catch { case _: Throwable => () }
  }
}

object PackedStoreClient {
  private val VerRe = """"version":(\d+)""".r
  private val CountRe = """"count":(\d+)""".r
  private[serving] val TxRe = """"tx":(\d+)""".r
  private[serving] val KvRe = """"(\w+)":(\d+)""".r
}
