package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs as a
  * typed `mapPartitions` so a heavyweight codec can be opened once per
  * partition and amortized over the batch.
  *
  * The header parser is a real pure-JVM implementation for the three
  * container formats whose headers need no codec library — PNG, BMP,
  * WAV (magic bytes + dimension/frame fields straight from the spec'd
  * fixed offsets). Payloads that match no magic fall back to a
  * deterministic function of the byte length, which keeps the
  * text-backed fixture corpus oracle-verifiable (q53) while exercising
  * the exact partition/schema/batch plumbing a real media lake needs.
  * At 100 TB the payloads stay columnar-compressed in parquet, the
  * decode stage is a narrow map (no shuffle), and feature rows are a
  * tiny projection of the input bytes.
  */
object Multimodal {

  /** A media row: opaque payload + provenance metadata. */
  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte], source: String, n_chars: Long)

  /** Extracted features. `source` rides along from [[MediaRecord]] so
    * downstream aggregation never re-joins the input. */
  final case class MediaFeatures(
      doc_id: Long, source: String, n_bytes: Long, width: Int,
      height: Int, n_frames: Int, media_kind: String)

  /** Pack a text table into media-shaped rows: payload = UTF-8 bytes.
    * Stands in for reading `binary` columns of a real media lake. */
  def packAsMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      col("source"), col("n_chars")).as[MediaRecord]
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** JPEG dimensions: walk the marker chain from offset 2, skipping
    * each segment by its big-endian length, until a start-of-frame
    * marker (0xC0-0xCF minus the DHT/JPG/DAC exceptions C4/C8/CC);
    * height/width are big-endian shorts at SOF payload offset 3/5.
    * Bounded walk — malformed chains return None, never loop. */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    var guard = 0
    while (i + 3 < b.length && guard < 1024) {
      guard += 1
      if ((b(i) & 0xff) != 0xff) return None
      // per the spec, any number of 0xFF fill bytes may precede the
      // marker byte — consume them all before reading the marker
      var mi = i + 1
      while (mi < b.length && (b(mi) & 0xff) == 0xff) mi += 1
      if (mi >= b.length) return None
      val marker = b(mi) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (mi + 7 < b.length)
          return Some((beShort(b, mi + 6), beShort(b, mi + 4)))
        return None
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i = mi + 1
      else if (marker == 0xda || marker == 0xd9) return None
      else if (mi + 2 < b.length) i = mi + 1 + beShort(b, mi + 1)
      else return None
    }
    None
  }

  /** Parse a media container header: magic bytes + fixed-offset
    * dimension fields. Returns (kind, width, height, n_frames); None
    * when no known magic matches. Offsets per the public format specs:
    * PNG IHDR width/height at bytes 16/20 (big-endian), BMP
    * BITMAPINFOHEADER width/height at 18/22 (little-endian), GIF
    * logical-screen width/height at 6/8 (little-endian), JPEG via the
    * SOF marker walk, WAV channels/blockAlign at 22/32 with the
    * 44-byte canonical header. */
  def parseHeader(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff)
      return jpegDims(b).map { case (w, h) => ("image", w, h, 1) }
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Some(("image", leShort(b, 6), leShort(b, 8), 1))
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a)
      Some(("image", beInt(b, 16), beInt(b, 20), 1))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("image", leInt(b, 18), leInt(b, 22), 1))
    else if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') {
      val channels = leShort(b, 22)
      val blockAlign = leShort(b, 32)
      val frames =
        if (blockAlign > 0) (b.length - 44) / blockAlign else 0
      Some(("audio", channels, 1, frames))
    } else None
  }

  /** Deterministic fallback for unknown payloads: features derive only
    * from the byte length, so a SQL oracle reproduces them exactly. */
  private def fallbackFeatures(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      source = r.source,
      n_bytes = n,
      width = (n % 640L).toInt + 16,
      height = ((n * 7L) % 480L).toInt + 16,
      n_frames = (n % 24L).toInt + 1,
      media_kind = if (n % 2L == 0L) "image" else "audio")
  }

  /** Header-parse every payload in the partition; unknown containers
    * take the deterministic fallback. Partition-wise so a real decoder
    * (beyond headers) can amortize codec init across the batch. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // a heavyweight codec handle would be opened HERE, once
      it.map { r =>
        parseHeader(r.payload) match {
          case Some((kind, w, h, frames)) =>
            MediaFeatures(r.doc_id, r.source, r.payload.length.toLong,
              w, h, frames, kind)
          case None => fallbackFeatures(r)
        }
      }
    }
  }

  /** Deterministic evenly-spaced frame sampling: s = min(k, n_frames)
    * frames per media row, frame j at index ⌊j·n_frames/s⌋ — the
    * standard keyframe grid. The frame PAYLOAD is a stub fingerprint
    * (hash60 of "doc:idx") standing in for the codec's decoded frame
    * bytes — this container ships no image/audio codecs — while the
    * schema, explode shape, and integer grid are exactly what a real
    * sampler emits. Scan → narrow map → explode bounded by k; no
    * shuffle, so at 100 TB the sampler runs at input bandwidth. */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
      k: Int): DataFrame =
    decodeFeatures(packAsMedia(docs)).toDF()
      .select(col("doc_id"), col("n_frames"),
        least(lit(k), col("n_frames")).as("s"))
      .select(col("doc_id"), col("n_frames"), col("s"),
        explode(sequence(lit(0), col("s") - 1)).as("sample_j"))
      .select(col("doc_id"), col("n_frames"),
        col("sample_j").cast("int").as("sample_j"),
        expr("CAST((sample_j * n_frames) DIV s AS INT)").as("frame_idx"))
      .withColumn("frame_stub", TextOps.hash60(concat(
        col("doc_id").cast("string"), lit(":"),
        col("frame_idx").cast("string"))))

  /** Full pipeline: pack → decode → per-source feature aggregate.
    * `source` is carried through the decode, so this is scan → narrow
    * map → one hash aggregation — no join anywhere. */
  def featureStats(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(packAsMedia(docs)).toDF()
      .groupBy(col("source"), col("media_kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        // avg over INT sums exactly in Long first, then one IEEE
        // division — order-independent AND engine-exact unrounded
        avg(col("width")).as("avg_width"),
        max(col("n_frames")).as("max_frames"))
}
