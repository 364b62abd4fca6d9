package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths => JPaths, StandardOpenOption}

/** Wire-protocol transports for the document egress surface: a STOMP
  * 1.2 frame builder (the ActiveMQ protocol the reference speaks
  * through StompAMQ — cern_monit.py:36-62, rucio_datasets_stats
  * .py:702-743) and an OpenSearch `_bulk` NDJSON body builder
  * (osearch/osearch.py:177-217).
  *
  * Frames/bodies are built byte-exactly per the public protocol specs
  * and handed to a pluggable [[Transports.ByteSink]]; the network layer
  * is deliberately out of scope (no broker exists in CI — clusters
  * plug a socket-backed sink into the same surface). Everything is
  * Serializable: transports are constructed on the driver and run
  * inside `foreachPartition` on executors (DocSink.push).
  */
object Transports {

  /** Destination for built protocol bytes. */
  trait ByteSink extends Serializable {
    def write(bytes: Array[Byte]): Unit
    def close(): Unit = ()
  }

  /** Collects frames in memory — test/inspection sink. */
  final class BufferSink extends ByteSink {
    val chunks = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    override def write(bytes: Array[Byte]): Unit =
      chunks.synchronized { chunks += bytes }
    def bytes: Array[Byte] = chunks.synchronized { chunks.flatten.toArray }
  }

  /** Appends to one file per sink instance (executor-side safe: each
    * partition constructs its own path via the UUID suffix). */
  final class FileSink(dir: String) extends ByteSink {
    private lazy val path = {
      Files.createDirectories(JPaths.get(dir))
      JPaths.get(dir,
        s"frames-${java.util.UUID.randomUUID().toString.take(8)}.bin")
    }
    override def write(bytes: Array[Byte]): Unit =
      Files.write(path, bytes,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** STOMP 1.2 frame builder (https://stomp.github.io/ spec): UTF-8
    * command + `key:value` header lines + blank line + body + NUL.
    * Header names/values escape backslash, CR, LF and colon per the
    * spec's header-encoding table. */
  object Stomp {

    private def escape(s: String): String =
      s.replace("\\", "\\\\").replace("\r", "\\r")
        .replace("\n", "\\n").replace(":", "\\c")

    def frame(command: String, headers: Seq[(String, String)],
        body: Array[Byte] = Array.empty): Array[Byte] = {
      val head = (command +: headers.map { case (k, v) =>
        s"${escape(k)}:${escape(v)}"
      }).mkString("", "\n", "\n\n")
      head.getBytes(StandardCharsets.UTF_8) ++ body ++ Array[Byte](0)
    }

    /** CONNECT with credentials — the StompAMQ connect handshake. */
    def connect(host: String, login: String, passcode: String)
        : Array[Byte] =
      frame("CONNECT", Seq(
        "accept-version" -> "1.2", "host" -> host,
        "login" -> login, "passcode" -> passcode,
        "heart-beat" -> "0,0"))

    /** SEND of one JSON document: content-type + exact content-length
      * in BYTES (multi-byte UTF-8 counted correctly). */
    def send(destination: String, json: String): Array[Byte] = {
      val body = json.getBytes(StandardCharsets.UTF_8)
      frame("SEND", Seq(
        "destination" -> destination,
        "content-type" -> "application/json",
        "content-length" -> body.length.toString), body)
    }

    def disconnect(receiptId: String): Array[Byte] =
      frame("DISCONNECT", Seq("receipt" -> receiptId))
  }

  /** AMQ transport: CONNECT once, one SEND frame per document (the
    * StompAMQ.send shape — cern_monit.py:53-61 iterates docs), a
    * receipt-tagged DISCONNECT on close. */
  final class StompTransport(vhost: String, login: String,
      passcode: String, destination: String, sink: ByteSink)
      extends DocSink.Transport {
    private var connected = false
    override def send(docs: Seq[String]): Unit = {
      if (!connected) {
        sink.write(Stomp.connect(vhost, login, passcode))
        connected = true
      }
      docs.foreach(d => sink.write(Stomp.send(destination, d)))
    }
    override def close(): Unit = {
      if (connected) sink.write(Stomp.disconnect("graft-close"))
      sink.close()
    }
  }

  /** OpenSearch `_bulk` NDJSON body: an `{"index":{}}` action line
    * before every document, one `\n` after each line, trailing newline
    * required by the API (osearch/osearch.py:177-188 make_es_body). */
  object OpenSearchBulk {
    def body(docs: Seq[String]): String =
      docs.map(d => "{\"index\":{}}\n" + d + "\n").mkString

    /** Per-item failures out of a `_bulk` reply (the CERN MONIT
      * endpoints return `errors:true` with per-item `error` objects on
      * partial failure — osearch.py:93-101 counts them the same way):
      * 0-based item index → `type: reason`. `errors:false` short-
      * circuits without walking the items. Jackson rides along on the
      * Spark classpath. */
    def failedItems(response: String): Seq[(Int, String)] = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = m.readTree(response)
      if (root == null || !root.path("errors").asBoolean(false)) Nil
      else {
        val items = root.path("items")
        (0 until items.size()).flatMap { i =>
          // each item wraps its result under the action name (index/
          // create/update); take the first field's error node if any
          val it = items.get(i)
          val op = if (it.fieldNames().hasNext) it.get(it.fieldNames().next())
            else it
          val err = op.path("error")
          if (err.isMissingNode || err.isNull) None
          else Some(i -> (err.path("type").asText("unknown") + ": " +
            err.path("reason").asText("")))
        }
      }
    }

    /** One bulk round-trip with bounded retry of just the failed
      * items: `post` sends an NDJSON body and returns the `_bulk`
      * reply. Returns the items still failed after `retries`
      * re-submissions (empty = all landed). At-least-once like the
      * STOMP path: a retried item that actually landed before the
      * failure reply is deduped downstream on doc ids. */
    def sendWithRetry(docs: Seq[String], post: String => String,
        retries: Int = 1): Seq[(Int, String)] = {
      var pending = docs.zipWithIndex.map { case (d, i) => i -> d }
      var failures = Seq.empty[(Int, String)]
      var round = 0
      while (pending.nonEmpty && round <= retries) {
        val reply = post(body(pending.map(_._2)))
        val failed = failedItems(reply)
        failures = failed.map { case (pos, why) => pending(pos)._1 -> why }
        pending = failed.map { case (pos, _) => pending(pos) }
        round += 1
      }
      failures
    }
  }

  /** OpenSearch transport: each chunk becomes one bulk request —
    * `POST /<index>/_bulk` line + NDJSON body (the HTTP layer a real
    * client adds rides above this surface). */
  final class OpenSearchTransport(index: String, sink: ByteSink)
      extends DocSink.Transport {
    override def send(docs: Seq[String]): Unit = {
      val req = s"POST /$index/_bulk\ncontent-type: application/x-ndjson\n\n" +
        OpenSearchBulk.body(docs)
      sink.write(req.getBytes(StandardCharsets.UTF_8))
    }
    override def close(): Unit = sink.close()
  }

  /** OpenSearch index lifecycle (osearch/osearch.py:103-147): dated
    * index names rotated off an index template plus the
    * create-with-mapping request emitted when the index does not
    * exist yet ("happens in the first batch of the month, ideally"). */
  object OpenSearchIndex {

    /** `template` → `template[-YYYY[-MM[-DD]]]` by rotation mode
      * (get_or_create_index, osearch.py:116-137): "Y"/"M"/"D" add UTC
      * date parts of `epochSec`, anything else uses the bare template
      * as a single index. */
    def dated(template: String, epochSec: Long, mod: String): String = {
      val fmt = mod.toUpperCase match {
        case "Y" => "yyyy"
        case "M" => "yyyy-MM"
        case "D" => "yyyy-MM-dd"
        case _ => return template
      }
      val d = java.time.format.DateTimeFormatter.ofPattern(fmt)
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(epochSec))
      s"$template-$d"
    }

    /** `PUT /<idx>` carrying the mapping+settings JSON — the
      * indices.create call of make_mapping (osearch.py:103-115). */
    def createRequest(idx: String, mappingAndSettingsJson: String): String =
      s"PUT /$idx\ncontent-type: application/json\n\n" +
        mappingAndSettingsJson + "\n"

    /** `GET /<idx>` — the existence probe of get_or_create_index. */
    def getRequest(idx: String): String = s"GET /$idx\n"
  }

  /** OpenSearch transport with index rotation: documents go to the
    * dated index for `epochSec`, and the first send through a given
    * index name emits the create-with-mapping request if the `exists`
    * probe says the index is missing (the reference performs the probe
    * as a GET against the cluster; CI injects a predicate). One
    * create per transport instance per index — executor-parallel
    * pushes may race the create exactly as the reference's
    * `ignore=400` tolerates: the request is idempotent. */
  final class RotatingOpenSearchTransport(template: String, mod: String,
      mappingAndSettingsJson: String, epochSec: Long,
      exists: String => Boolean, sink: ByteSink)
      extends DocSink.Transport {
    @transient private var ensured: Set[String] = Set.empty
    override def send(docs: Seq[String]): Unit = {
      val idx = OpenSearchIndex.dated(template, epochSec, mod)
      if (ensured == null) ensured = Set.empty
      if (!ensured.contains(idx)) {
        if (!exists(idx))
          sink.write(OpenSearchIndex
            .createRequest(idx, mappingAndSettingsJson)
            .getBytes(StandardCharsets.UTF_8))
        ensured += idx
      }
      val req =
        s"POST /$idx/_bulk\ncontent-type: application/x-ndjson\n\n" +
          OpenSearchBulk.body(docs)
      sink.write(req.getBytes(StandardCharsets.UTF_8))
    }
    override def close(): Unit = sink.close()
  }

  /** Blocking single-frame reader for the client side of the STOMP
    * conversation: bytes up to the NUL frame terminator, decoded
    * UTF-8; EOL (heart-beat) bytes between frames are skipped. Returns
    * None on a cleanly closed stream. */
  object StompWire {
    def readFrame(in: java.io.InputStream): Option[String] = {
      val buf = new java.io.ByteArrayOutputStream()
      var b = in.read()
      while (b == '\n' || b == '\r') b = in.read() // inter-frame EOLs
      if (b < 0) return None
      while (b > 0) { // NUL terminates the frame; -1 = peer closed
        buf.write(b)
        b = in.read()
      }
      Some(new String(buf.toByteArray, StandardCharsets.UTF_8))
    }
  }

  /** Socket-backed STOMP client with the connection lifecycle the
    * byte-exact [[StompTransport]] leaves to the caller
    * (cern_monit.py:38-63 via StompAMQ: connect → CONNECTED handshake,
    * one SEND per document, DISCONNECT with receipt await on close,
    * reconnect-and-resend once on a broken connection). Constructed on
    * the driver, connects lazily on the executor — sockets are
    * @transient, so the transport serializes into foreachPartition
    * like every other [[DocSink.Transport]]. */
  final class StompSocketClient(host: String, port: Int, vhost: String,
      login: String, passcode: String, destination: String)
      extends DocSink.Transport {
    @transient private var socket: java.net.Socket = _
    @transient private var out: java.io.OutputStream = _
    @transient private var in: java.io.InputStream = _

    private def connect(): Unit = {
      socket = new java.net.Socket(host, port)
      out = socket.getOutputStream
      in = socket.getInputStream
      out.write(Stomp.connect(vhost, login, passcode))
      out.flush()
      val resp = StompWire.readFrame(in).getOrElse(
        sys.error("broker closed during CONNECT handshake"))
      if (!resp.startsWith("CONNECTED"))
        sys.error(s"STOMP handshake refused: ${resp.linesIterator.next()}")
    }

    private def reconnect(): Unit = {
      try if (socket != null) socket.close() catch { case _: Exception => }
      socket = null
      connect()
    }

    override def send(docs: Seq[String]): Unit = {
      if (socket == null) connect()
      docs.foreach { d =>
        val frame = Stomp.send(destination, d)
        try { out.write(frame); out.flush() }
        catch { case _: java.io.IOException =>
          // one reconnect-and-resend: at-least-once, like the
          // reference's StompAMQ reconnect (consumers dedup on doc ids)
          reconnect()
          out.write(frame); out.flush()
        }
      }
    }

    override def close(): Unit = if (socket != null) {
      try {
        out.write(Stomp.disconnect("graft-close"))
        out.flush()
        StompWire.readFrame(in) match {
          case Some(r) if r.startsWith("RECEIPT") => () // clean shutdown
          case Some(r) if r.startsWith("ERROR") =>
            // a broker ERROR queued since the last send surfaces here
            // (STOMP 1.2 §ERROR: the broker closes after sending it);
            // raise it with the broker's message so the job fails loud
            val msg = r.linesIterator
              .find(_.startsWith("message:")).map(_.drop(8))
              .getOrElse(r.linesIterator.drop(1).mkString(" ").take(120))
            sys.error(s"broker ERROR on shutdown: $msg")
          case other => sys.error(s"no RECEIPT on disconnect: $other")
        }
      } finally { socket.close(); socket = null }
    }
  }
}
