package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs as a
  * typed `mapPartitions` so a real codec can be dropped in per
  * partition (open once, decode the whole batch).
  *
  * The decode step itself is a STUB — this container has no image/audio
  * libraries — but it is a deterministic function of the payload bytes,
  * so the surrounding Spark plumbing (schema, encoders, partition batch
  * shape) is fully testable and oracle-verifiable. At 100 TB the
  * payloads stay columnar-compressed in parquet, the decode stage is a
  * narrow map (no shuffle), and feature rows are a tiny projection of
  * the input bytes.
  */
object Multimodal {

  /** A media row: opaque payload + provenance metadata. */
  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte], source: String, n_chars: Long)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, media_kind: String)

  /** Pack a text table into media-shaped rows: payload = UTF-8 bytes.
    * Stands in for reading `binary` columns of a real media lake. */
  def packAsMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      col("source"), col("n_chars")).as[MediaRecord]
  }

  /** STUB DECODER — deterministic fake in place of a real codec
    * (`???`-equivalent; the real thing would parse payload headers).
    * Features derive only from payload length so a SQL oracle can
    * reproduce them. Partition-wise so a real implementation can
    * amortize codec init across the batch. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real codec handle would be opened HERE, once per partition
      it.map { r =>
        val n = r.payload.length.toLong
        MediaFeatures(
          doc_id = r.doc_id,
          n_bytes = n,
          width = (n % 640L).toInt + 16,
          height = ((n * 7L) % 480L).toInt + 16,
          n_frames = (n % 24L).toInt + 1,
          media_kind = if (n % 2L == 0L) "image" else "audio")
      }
    }
  }

  /** Full pipeline: pack → decode → per-source feature aggregate. */
  def featureStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val feats = decodeFeatures(packAsMedia(docs)).toDF()
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    feats.groupBy(col("source"), col("media_kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        // avg over INT sums exactly in Long first, then one IEEE
        // division — order-independent AND engine-exact unrounded
        avg(col("width")).as("avg_width"),
        max(col("n_frames")).as("max_frames"))
  }
}
