package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps

/** End-to-end PAIRED-modality corpus release — the composition of the
  * q274/q275 cross-modal primitives into ONE lake job (`JobRunner`
  * registry: `paired_release`), completing job-level parity for
  * paired modalities the way `media_release` does for image/audio/
  * video. Input rows are (id, payload, text, source); a pair of rows
  * is a duplicate only when BOTH modalities agree:
  *
  *  - exact rail: identical media FINGERPRINT and identical text
  *    BYTES — groupBy (media_fp, md5(text)), min-id survivor. A
  *    re-encoded copy under the same text collapses here; the same
  *    media under a different text does NOT (the text carries
  *    information), which is exactly where a media-only rail would
  *    over-delete;
  *  - near rail over exact survivors ONLY (structural
  *    exact-dedup-first): text 3-shingle Jaccard ≥ `minJac` PROPOSES
  *    (the q41 df-capped index — captions/transcripts are
  *    near-unique, so its pair set is the small one) and the media
  *    perceptual hash at Hamming ≤ `maxHamming` VERIFIES (two hash
  *    lookups + one XOR per candidate; q274's composition);
  *  - keep-list over the verified pairs (components, min-id
  *    survivor), expanded over the exact groups.
  *
  * The modalities differ ONLY in the signature kernel they feed the
  * shared [[releaseRails]] kernel:
  *
  *  - captioned IMAGE ([[release]]): one decode pass
  *    ([[Multimodal.imageSignatures]] — exact pixel fingerprint +
  *    perceptual dHash from a single codec read);
  *  - transcribed AUDIO ([[releaseAudioTranscript]]): the acoustic
  *    envelope hash ([[Multimodal.audioEnvelopeHash]]) serves both
  *    rails — exact rail on envelope identity (q266's convention,
  *    the MediaRelease audio stage's exact rail) and near rail on
  *    envelope Hamming (q268).
  *
  * Undecodable payloads are counted, never silently dropped. The
  * text index is the only pair-producing stage and it is df-capped.
  */
object PairedRelease {

  /** The RAIL-PAIR kernel every paired-modality release runs: `base`
    * is the paired rows (doc_id, text, source, …), `sigs0` the
    * per-doc media signatures (doc_id, media_fp, near_hash) with a
    * NULL media_fp marking an undecodable payload. Executes exact
    * both-rails collapse → text-proposes / media-verifies near pairs
    * → keep-list; persists `signatures`, `pairs`, `keep`, `report`
    * under `dest` and returns the report (media_kind, n_payloads,
    * n_exact_survivors, n_kept) with kinds `mediaKind` and
    * `undecodable`.
    *
    * Scale shape: one barriered signature frame feeds the exact
    * groups and the hash verify; the text rail proposes from a
    * df-capped inverted index restricted to exact survivors; the
    * media rail verifies with two hash lookups + one XOR per
    * candidate — no media banding pass at all; components barrier
    * per round inside the keep-list. */
  def releaseRails(base: DataFrame, sigs0: DataFrame,
      mediaKind: String, dest: String, maxHamming: Int,
      minJac: Double, slotVerify: Option[Int] = None): DataFrame = {
    val sigs = sigs0
      .join(base.select(col("doc_id"),
        md5(col("text")).as("text_fp")), Seq("doc_id"))
      .barrier() // exact groups + hash verify read it
    sigs.write.mode("overwrite").parquet(s"$dest/signatures")
    val decoded = sigs.filter(col("media_fp").isNotNull)
    // exact rail: identical media fingerprint AND identical text bytes
    val survivors = decoded
      .groupBy(col("media_fp"), col("text_fp"))
      .agg(min(struct(col("doc_id"), col("near_hash"))).as("k"),
        count(lit(1)).as("n_copies"))
      .select(col("k.doc_id").as("doc_id"),
        col("k.near_hash").as("near_hash"),
        col("media_fp"), col("text_fp"), col("n_copies"))
      .barrier() // text rail, hash verify AND keep-list base
    // near rail: text proposes, the media hash verifies (q274's shape)
    val capPairs = TextOps.ngramJaccardPairs(
      base.join(survivors.select(col("doc_id")), Seq("doc_id"),
        "left_semi"),
      "doc_id", "text", minJac = minJac, maxDf = 1000)
    // the media verify: bit-Hamming for perceptual hashes
    // (dHash, envelope); ALIGNED-SLOT equality when the near hash
    // packs MinHash slots (`slotVerify` = min shared slots — the
    // video route), where bitwise distance is meaningless
    val hashes =
      survivors.select(col("doc_id"), col("near_hash").as("dhash"))
    val pairs = (slotVerify match {
      case Some(minSlots) => Multimodal
        .pairedSlotNearDupPairs(capPairs, hashes, minSlots)
      case None => Multimodal
        .pairedCaptionNearDupPairs(capPairs, hashes, maxHamming)
    }).barrier()
    pairs.write.mode("overwrite").parquet(s"$dest/pairs")
    val keep = DedupClusters.keepList(
      survivors, "doc_id", pairs, "doc_a", "doc_b", maxIters = 100)
      .barrier()
    keep.write.mode("overwrite").parquet(s"$dest/keep")
    val undecodable = sigs.filter(col("media_fp").isNull)
      .agg(count(lit(1)).as("n_payloads"))
      .select(lit("undecodable").as("media_kind"), col("n_payloads"),
        lit(0L).as("n_exact_survivors"), lit(0L).as("n_kept"))
    val report = decoded.agg(count(lit(1)).as("n_payloads"))
      .crossJoin(keep.agg(
        count(lit(1)).as("n_exact_survivors"),
        coalesce(sum(when(col("is_kept"), 1L).otherwise(0L)),
          lit(0L)).as("n_kept")))
      .select(lit(mediaKind).as("media_kind"),
        col("n_payloads"), col("n_exact_survivors"), col("n_kept"))
      .unionByName(undecodable)
    report.write.mode("overwrite").parquet(s"$dest/report")
    report
  }

  /** The (doc_id, payload, text, source) projection both releases
    * start from — barriered because the decode pass and the text
    * joins share the one scan. */
  private def baseFrame(docs: DataFrame, idCol: String,
      payloadCol: String, textCol: String,
      sourceCol: String): DataFrame =
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        col(payloadCol).as("payload"),
        col(textCol).as("text"),
        col(sourceCol).as("source"))
      .barrier()

  /** Captioned-IMAGE release: image signature kernel (exact pixel
    * fingerprint + perceptual dHash, one codec pass) into the shared
    * rail-pair kernel. */
  def release(docs: DataFrame, idCol: String, payloadCol: String,
      textCol: String, sourceCol: String, dest: String,
      maxHamming: Int = 4, minJac: Double = 0.2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = baseFrame(docs, idCol, payloadCol, textCol, sourceCol)
    val media = base.select(col("doc_id"), col("payload"),
        col("source"), lit(0L).as("n_chars"))
      .as[Multimodal.MediaRecord]
    val sigs = Multimodal.imageSignatures(media).toDF()
      .select(col("doc_id"), col("pix_fp").as("media_fp"),
        col("dhash").as("near_hash"))
    releaseRails(base, sigs, "captioned_image", dest, maxHamming,
      minJac)
  }

  /** Transcribed-AUDIO release: the acoustic envelope hash
    * ([[Multimodal.audioEnvelopeHash]], `window`-sample energy
    * windows) serves both rails — exact on envelope identity, near
    * on envelope Hamming — into the same rail-pair kernel. A
    * re-encoded/gain-shifted clip under the same transcript collapses
    * (envelope deltas survive gain); the same clip under a genuinely
    * different transcript survives. */
  def releaseAudioTranscript(docs: DataFrame, idCol: String,
      payloadCol: String, textCol: String, sourceCol: String,
      dest: String, maxHamming: Int = 4, minJac: Double = 0.2,
      window: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = baseFrame(docs, idCol, payloadCol, textCol, sourceCol)
    val media = base.select(col("doc_id"), col("payload"),
        col("source"), lit(0L).as("n_chars"))
      .as[Multimodal.MediaRecord]
    val sigs = Multimodal.audioEnvelopeHash(media, window).toDF()
      .select(col("doc_id"), col("env_hash").as("media_fp"),
        col("env_hash").as("near_hash"))
    releaseRails(base, sigs, "transcribed_audio", dest, maxHamming,
      minJac)
  }

  /** Transcribed-VIDEO release — the last cell of the modality ×
    * lifecycle grid: exact rail on the distinct-frame SET fingerprint
    * ([[Multimodal.frameSetFingerprints]] — a re-ordered or
    * frame-repeated re-encode under the same transcript collapses),
    * near rail on the 4 set-MinHash signatures PACKED into one
    * 64-bit near hash (16 low bits per signature, the
    * [[videoMinhashPack]] layout) with the ALIGNED-SLOT verify
    * ([[Multimodal.pairedSlotNearDupPairs]]): a text-proposed pair
    * survives when ≥ `minSharedSlots` MinHash slots agree — the
    * estimator semantic (a shared slot witnesses high frame-set
    * Jaccard; unrelated clips share one with prob ~4·2⁻¹⁶), where
    * bitwise Hamming over packed slots is noise. Same rail-pair
    * kernel; only the signature map and verify metric differ. */
  def releaseVideoTranscript(docs: DataFrame, idCol: String,
      payloadCol: String, textCol: String, sourceCol: String,
      dest: String, minSharedSlots: Int = 1, minJac: Double = 0.2,
      frameBytes: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = baseFrame(docs, idCol, payloadCol, textCol, sourceCol)
    val media = base.select(col("doc_id"), col("payload"),
        col("source"), lit(0L).as("n_chars"))
      .as[Multimodal.MediaRecord]
    releaseRails(base, videoSignatures(media, frameBytes),
      "transcribed_video", dest, maxHamming = 0, minJac,
      slotVerify = Some(minSharedSlots))
  }

  /** Per-clip video signature frame for the paired rails:
    * (doc_id, media_fp = frame-set fingerprint, near_hash = packed
    * set-MinHash). A payload with no complete frame yields NULL
    * media_fp — counted as undecodable by the kernel, never silently
    * dropped. Shared by the batch release and the streaming
    * video-transcript store (one signature definition, two
    * lifecycles). */
  private[graft] def videoSignatures(
      media: org.apache.spark.sql.Dataset[Multimodal.MediaRecord],
      frameBytes: Int): DataFrame = {
    val d0 = Multimodal.frameFingerprints(media, frameBytes)
      .select(col("doc_id"), col("frame_fp")).distinct()
    media.toDF().select(col("doc_id"))
      .join(Multimodal.frameSetProfile(d0), Seq("doc_id"), "left")
      .select(col("doc_id"), col("set_fp").as("media_fp"),
        videoMinhashPack.as("near_hash"))
  }

  /** The packed 64-bit near hash of the video route: the low 16 bits
    * of each of the 4 set-MinHash signatures, slot i at bits
    * [16i, 16i+16) — so the paired kernels' 4×16-bit banding
    * recovers exactly one MinHash slot per band, and the slot verify
    * compares aligned 16-bit quarters. */
  private[graft] def videoMinhashPack: org.apache.spark.sql.Column =
    (0 until 4)
      .map(i => shiftleft(pmod(col(s"sig_$i"), lit(65536L)), i * 16))
      .reduce(_.bitwiseOR(_))
}
