package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DocSink, Transports}
import graft.core.Transports.{BufferSink, OpenSearchBulk, Stomp}

/** Byte-exact assertions on the wire-protocol builders (SURVEY.md
  * §2.2 AMQ/OpenSearch egress): STOMP 1.2 frame layout, header
  * escaping, UTF-8 content-length; OpenSearch `_bulk` NDJSON shape;
  * and the Transport lifecycle over a full executor-side push. */
class TransportsSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-transport-test")

  private def str(b: Array[Byte]) = new String(b, StandardCharsets.UTF_8)

  test("STOMP SEND frame: exact layout, NUL terminator, byte length") {
    val json = """{"k":"é"}""" // é is 2 UTF-8 bytes → content-length 10
    val f = Stomp.send("/topic/cms.graft", json)
    assert(f.last == 0.toByte)
    val text = str(f.dropRight(1))
    assert(text ==
      "SEND\n" +
      "destination:/topic/cms.graft\n" +
      "content-type:application/json\n" +
      "content-length:10\n" +
      "\n" + json)
    assert(json.getBytes(StandardCharsets.UTF_8).length == 10)
  }

  test("STOMP header escaping: colon, newline, backslash encoded") {
    val f = Stomp.frame("SEND", Seq("destination" -> "/q/a:b\nc\\d"))
    assert(str(f).contains("destination:/q/a\\cb\\nc\\\\d"))
  }

  test("STOMP CONNECT/DISCONNECT frames carry the handshake headers") {
    val c = str(Stomp.connect("cern-vhost", "user1", "pw").dropRight(1))
    assert(c.startsWith("CONNECT\naccept-version:1.2\nhost:cern-vhost\n"))
    assert(c.contains("login:user1\npasscode:pw\nheart-beat:0,0\n\n"))
    val d = str(Stomp.disconnect("r-7").dropRight(1))
    assert(d == "DISCONNECT\nreceipt:r-7\n\n")
  }

  test("OpenSearch _bulk body: action line per doc, trailing newline") {
    val body = OpenSearchBulk.body(Seq("""{"a":1}""", """{"b":2}"""))
    assert(body ==
      "{\"index\":{}}\n{\"a\":1}\n" +
      "{\"index\":{}}\n{\"b\":2}\n")
  }

  test("StompTransport lifecycle: CONNECT once, SEND per doc, " +
    "DISCONNECT on close") {
    val sink = new BufferSink
    val t = new Transports.StompTransport(
      "vh", "u", "p", "/topic/t", sink)
    t.send(Seq("""{"a":1}""", """{"b":2}"""))
    t.send(Seq("""{"c":3}"""))
    t.close()
    val frames = str(sink.bytes).split("\u0000").map(_.trim)
    assert(frames.count(_.startsWith("CONNECT")) == 1)
    assert(frames.count(_.startsWith("SEND")) == 3)
    assert(frames.last.startsWith("DISCONNECT"))
  }

  test("OpenSearch transport over executor-side push emits bulk " +
    "requests for every row") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-transport").toString
    val df = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "s")
    DocSink.push(df.repartition(2),
      new Transports.OpenSearchTransport("cms-idx",
        new Transports.FileSink(dir)), chunkSize = 2)
    val text = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(p => new String(java.nio.file.Files
        .readAllBytes(p.asInstanceOf[java.nio.file.Path]))).mkString
    assert(text.contains("POST /cms-idx/_bulk"))
    assert(text.linesIterator.count(_ == "{\"index\":{}}") == 3)
  }
}
