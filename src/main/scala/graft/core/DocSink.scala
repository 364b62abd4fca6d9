package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths => JPaths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pluggable document sinks — the AMQ/OpenSearch egress surface of the
  * reference (rucio_datasets_stats.py:702-743, osearch/osearch.py:189-217)
  * re-expressed Spark-first.
  *
  * The reference streams partitions to the DRIVER (`toLocalIterator`)
  * and pushes from there — a driver bottleneck at scale. Here the
  * transport runs inside `foreachPartition` on the EXECUTORS: each
  * partition opens one connection, sends its rows in `chunkSize`
  * batches, and closes — throughput scales with the cluster, the
  * driver never sees a document. A `toLocalIterator` equivalent
  * remains available for genuinely driver-side protocols.
  */
object DocSink {

  /** One batch send. Implementations must be Serializable (constructed
    * on the driver, invoked on executors). */
  trait Transport extends Serializable {
    /** Called once per chunk with JSON documents. */
    def send(docs: Seq[String]): Unit
    /** Called once per partition after its last chunk. */
    def close(): Unit = ()
  }

  /** Executor-side push: rows → JSON docs → transport, chunked.
    * This is an ACTION (runs the plan). */
  def push(df: DataFrame, transport: Transport, chunkSize: Int = 1000): Unit =
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      try it.grouped(chunkSize).foreach(chunk => transport.send(chunk))
      finally transport.close()
    }

  /** Test-mode push: send only the first `n` documents — the
    * reference's `--test` flag semantics (rucio_datasets_stats
    * .py:773-824 sends 10 docs, and only to a topic containing
    * "test"/"train"; the topic guard lives in job config, the sample
    * cap here). `limit` keeps the plan bounded: no full materialization
    * happens before the cap. */
  def pushSample(df: DataFrame, transport: Transport, n: Int = 10): Unit =
    push(df.limit(n), transport, chunkSize = n)

  /** Driver-side iteration for protocols that must run on the driver —
    * the reference's `toLocalIterator` shape, one partition in memory
    * at a time. */
  def pushFromDriver(df: DataFrame, transport: Transport,
      chunkSize: Int = 1000): Unit = {
    val it = df.toJSON.toLocalIterator()
    val buf = new scala.collection.mutable.ArrayBuffer[String](chunkSize)
    while (it.hasNext) {
      buf += it.next()
      if (buf.size >= chunkSize) { transport.send(buf.toSeq); buf.clear() }
    }
    if (buf.nonEmpty) transport.send(buf.toSeq)
    transport.close()
  }

  /** Local-file transport for CI / tests: appends docs as JSON lines to
    * a per-partition file under `dir` (executor-side safe). */
  final class LocalFileTransport(dir: String) extends Transport {
    override def send(docs: Seq[String]): Unit = {
      Files.createDirectories(JPaths.get(dir))
      val f = JPaths.get(dir,
        s"part-${java.util.UUID.randomUUID().toString.take(8)}.jsonl")
      Files.write(f, (docs.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Envelope the reference wraps every MONIT document in:
    * `{data: {...}, metadata: {timestamp, type, producer}}`
    * (schemas.py:712-770, cern_monit.py). */
  def envelope(df: DataFrame, producer: String, docType: String,
      timestampMs: Long): DataFrame =
    df.select(
      struct(df.columns.map(col): _*).as("data"),
      struct(
        lit(timestampMs).as("timestamp"),
        lit(docType).as("type"),
        lit(producer).as("producer")).as("metadata"))
}
