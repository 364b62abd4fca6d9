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
}
