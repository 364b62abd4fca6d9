package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps
import Multimodal.MediaRecord

/** End-to-end multimodal corpus release — the composition of the
  * oracled decoded-content dedup primitives into ONE lake job
  * (`JobRunner` registry: `media_release`): a single CLI invocation
  * dedups a mixed image+audio media table on decoded CONTENT (not
  * bytes), persists the per-stage artifacts, and reports per-modality
  * survivorship. The multimodal analog of `corpus_release` (q189).
  *
  * Stages per modality (each stage's semantics is an oracled query):
  *  - images: decode ONCE ([[Multimodal.imageSignatures]] — both the
  *    exact pixel fingerprint and the perceptual dHash from a single
  *    codec pass) → exact pixel-identity dedup, min-id survivor per
  *    fingerprint (q265) → dHash Hamming-banded near-dup pairs over
  *    the exact SURVIVORS only (q263) → connected-component keep-list
  *    (q267);
  *  - audio: acoustic fingerprint ([[Multimodal.audioEnvelopeHash]])
  *    → exact envelope dedup (q266's rail) → Hamming near-dup pairs
  *    over survivors (q268) → keep-list;
  *  - video (opt-in via `videoFrameBytes`): RESIDUAL payloads —
  *    those neither the image nor the audio codec accepted — under
  *    fixed-size frame fingerprints ([[Multimodal.frameFingerprints]])
  *    → exact frame-SET dedup ([[Multimodal.frameSetReps]], q269's
  *    rail) → q270's capped-LSH containment pairs over the set reps
  *    → keep-list expanded through the reps to every clip (q271's
  *    shape). Residual clips shorter than one frame stay in the
  *    undecodable bucket.
  *
  * Running the Hamming route strictly AFTER exact dedup is the
  * structural exact-dedup-first guard ([[TextOps.exactDedupFirst]]'s
  * contract): byte- or content-identical floods collapse to one
  * representative before banding, so no bucket is dominated by a
  * single fingerprint.
  *
  * Scale shape: both fingerprint kernels are narrow maps over one
  * barriered media scan (the payload bytes are read once and never
  * shuffled — only 8-byte hashes and ids move); exact dedup is one
  * hash aggregation per modality; the pair stage is the capped-bucket
  * banding engine; components barrier per round. Undecodable payloads
  * are counted, never silently dropped.
  */
object MediaRelease {

  /** Run the release over a media table; persist artifacts under
    * `dest` (`image_signatures`, `image_pairs`, `keep_images`,
    * `audio_hashes`, `audio_pairs`, `keep_audio`, and with the video
    * stage enabled `video_pairs`, `keep_videos`; always `report`)
    * and return the per-modality report:
    * (media_kind, n_payloads, n_exact_survivors, n_kept). */
  def release(media: Dataset[MediaRecord], dest: String,
      maxHamming: Int = 4, window: Int = 4,
      keepBestResolution: Boolean = false,
      videoFrameBytes: Option[Int] = None,
      minContainment: Double = 0.75): DataFrame = {
    val m = media.barrier() // one scan feeds both modality kernels

    // ---- images: one decode → (pix_fp, dhash) ----
    val sigs = Multimodal.imageSignatures(m).toDF().barrier()
    sigs.write.mode("overwrite").parquet(s"$dest/image_signatures")
    val images = sigs.filter(col("pix_fp").isNotNull)
    // exact pixel-identity dedup: min-id survivor carries its dhash
    // through the struct-min (dhash is defined whenever pix_fp is)
    val imgSurvivors = images
      .groupBy(col("pix_fp"))
      .agg(min(struct(col("doc_id"), col("dhash"), col("width"),
        col("height"))).as("k"),
        count(lit(1)).as("n_copies"))
      .select(col("k.doc_id").as("doc_id"), col("k.dhash").as("dhash"),
        (col("k.width").cast("long") * col("k.height"))
          .as("resolution"),
        col("pix_fp"), col("n_copies"))
      .barrier() // feeds the pair stage AND the keep-list base
    val imgPairs = Multimodal.hammingNearDupPairs(
      imgSurvivors, "doc_id", "dhash", maxHamming).barrier()
    imgPairs.write.mode("overwrite").parquet(s"$dest/image_pairs")
    // near-cluster survivor rule: min-id by default; with
    // keepBestResolution, the LARGEST decoded pixel area survives
    // (ties to lowest id) — what a release actually wants when the
    // corpus holds the same image at several resolutions. Exact
    // groups are pixel-identical (same dimensions), so the rule only
    // matters across near-dup members.
    val keepImages =
      if (keepBestResolution)
        DedupClusters.keepListBy(
          imgSurvivors, "doc_id", "resolution", imgPairs,
          "doc_a", "doc_b", maxIters = 100)
      else DedupClusters.keepList(
        imgSurvivors, "doc_id", imgPairs, "doc_a", "doc_b",
        maxIters = 100)
    keepImages.write.mode("overwrite").parquet(s"$dest/keep_images")

    // ---- audio: acoustic fingerprint ----
    val hashes = Multimodal.audioEnvelopeHash(m, window).toDF()
      .barrier()
    hashes.write.mode("overwrite").parquet(s"$dest/audio_hashes")
    val audio = hashes.filter(col("env_hash").isNotNull)
    val audSurvivors = audio
      .groupBy(col("env_hash"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"))
      .barrier()
    val audPairs = Multimodal.hammingNearDupPairs(
      audSurvivors, "doc_id", "env_hash", maxHamming).barrier()
    audPairs.write.mode("overwrite").parquet(s"$dest/audio_pairs")
    val keepAudio = DedupClusters.keepList(
      audSurvivors, "doc_id", audPairs, "doc_a", "doc_b",
      maxIters = 100)
    keepAudio.write.mode("overwrite").parquet(s"$dest/keep_audio")

    // ---- video: residual payloads under frame fingerprints ----
    // (opt-in: only a caller who KNOWS the residual modality's frame
    // geometry can pick frameBytes; with it unset, behavior and the
    // report are exactly the two-modality release)
    val videoStage = videoFrameBytes.map { fb =>
      val spark = media.sparkSession
      import spark.implicits._
      val decodedIds = images.select(col("doc_id"))
        .unionByName(audio.select(col("doc_id")))
      val residual = m.toDF()
        .join(decodedIds, Seq("doc_id"), "left_anti")
        .as[MediaRecord]
      val d0 = Multimodal.frameFingerprints(residual, fb)
        .select(col("doc_id"), col("frame_fp")).distinct()
        .barrier() // reps + pair stage share one frame scan
      val repMap = Multimodal.frameSetReps(d0).barrier()
      val pairs = Multimodal
        .videoLshNearDupPairsFrom(d0, minContainment).barrier()
      pairs.write.mode("overwrite").parquet(s"$dest/video_pairs")
      val repClusters = DedupClusters.keepList(
          repMap.filter(col("doc_id") === col("rep"))
            .select(col("doc_id")),
          "doc_id", pairs, "doc_a", "doc_b", maxIters = 100)
        .select(col("doc_id").as("rep"), col("cluster"),
          col("is_kept"))
        .barrier() // expansion + report
      // q271's expansion: every clip inherits its set-rep's cluster;
      // only the kept rep itself is kept
      val keepVideos = repMap.join(repClusters, Seq("rep"))
        .select(col("doc_id"), col("cluster"),
          (col("doc_id") === col("rep") && col("is_kept"))
            .as("is_kept"))
        .barrier()
      keepVideos.write.mode("overwrite").parquet(s"$dest/keep_videos")
      (keepVideos, repClusters)
    }

    // ---- per-modality report (every frame here is one row) ----
    def kindReport(kind: String, decoded: DataFrame,
        keep: DataFrame): DataFrame =
      decoded.agg(count(lit(1)).as("n_payloads"))
        .crossJoin(keep.agg(
          count(lit(1)).as("n_exact_survivors"),
          coalesce(sum(when(col("is_kept"), 1L).otherwise(0L)),
            lit(0L)).as("n_kept")))
        .select(lit(kind).as("media_kind"), col("n_payloads"),
          col("n_exact_survivors"), col("n_kept"))
    val undecodableBase = sigs.filter(col("pix_fp").isNull)
      .join(audio.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // with the video stage on, clips it framed leave the bucket
    val undecodable = videoStage
      .map { case (keepVideos, _) => undecodableBase
        .join(keepVideos.select(col("doc_id")), Seq("doc_id"),
          "left_anti") }
      .getOrElse(undecodableBase)
      .agg(count(lit(1)).as("n_payloads"))
      .select(lit("undecodable").as("media_kind"), col("n_payloads"),
        lit(0L).as("n_exact_survivors"), lit(0L).as("n_kept"))
    val videoReport = videoStage.map { case (keepVideos, repClusters) =>
      keepVideos.agg(count(lit(1)).as("n_payloads"))
        .crossJoin(repClusters.agg(
          count(lit(1)).as("n_exact_survivors"),
          coalesce(sum(when(col("is_kept"), 1L).otherwise(0L)),
            lit(0L)).as("n_kept")))
        .select(lit("video").as("media_kind"), col("n_payloads"),
          col("n_exact_survivors"), col("n_kept"))
    }
    val report = videoReport.foldLeft(
        kindReport("image", images, keepImages)
          .unionByName(kindReport("audio", audio, keepAudio)))(
        _.unionByName(_))
      .unionByName(undecodable)
    report.write.mode("overwrite").parquet(s"$dest/report")
    report
  }
}
