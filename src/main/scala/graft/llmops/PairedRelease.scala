package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps

/** End-to-end CAPTIONED-image corpus release — the paired-modality
  * composition of the q274/q275 cross-modal primitives into ONE lake
  * job (`JobRunner` registry: `paired_release`), completing
  * job-level parity for the paired modality the way `media_release`
  * does for image/audio/video. Input rows are (id, payload, caption
  * text, source); a pair of rows is a duplicate only when BOTH
  * modalities agree:
  *
  *  - exact rail: identical decoded PIXELS and identical caption
  *    BYTES — groupBy (pix_fp, md5(caption)), min-id survivor. A
  *    re-encoded copy under the same caption collapses here; the
  *    same image under a different caption does NOT (the caption
  *    carries information), which is exactly where the image-only
  *    q265 rail would over-delete;
  *  - near rail over exact survivors ONLY (structural
  *    exact-dedup-first): caption 3-shingle Jaccard ≥ `minJac`
  *    PROPOSES (the q41 df-capped index — captions are near-unique,
  *    so its pair set is the small one) and image dHash Hamming ≤
  *    `maxHamming` VERIFIES (two hash lookups + one XOR per
  *    candidate; q274's composition);
  *  - keep-list over the verified pairs (components, min-id
  *    survivor), expanded over the exact groups.
  *
  * Undecodable payloads are counted, never silently dropped. One
  * decode pass total ([[Multimodal.imageSignatures]]: pix_fp + dHash
  * from a single codec read); the caption index is the only
  * pair-producing stage and it is df-capped.
  */
object PairedRelease {

  /** Run the release; persist artifacts under `dest` (`signatures`,
    * `pairs`, `keep`, `report`) and return the report:
    * (media_kind, n_payloads, n_exact_survivors, n_kept) with kinds
    * `captioned_image` and `undecodable`. */
  def release(docs: DataFrame, idCol: String, payloadCol: String,
      textCol: String, sourceCol: String, dest: String,
      maxHamming: Int = 4, minJac: Double = 0.2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
        col(idCol).cast("long").as("doc_id"),
        col(payloadCol).as("payload"),
        col(textCol).as("text"),
        col(sourceCol).as("source"))
      .barrier() // decode pass + caption joins share one scan
    val media = base.select(col("doc_id"), col("payload"),
        col("source"), lit(0L).as("n_chars"))
      .as[Multimodal.MediaRecord]
    val sigs = Multimodal.imageSignatures(media).toDF()
      .join(base.select(col("doc_id"),
        md5(col("text")).as("cap_fp")), Seq("doc_id"))
      .barrier() // exact groups + hash verify read it
    sigs.write.mode("overwrite").parquet(s"$dest/signatures")
    val decoded = sigs.filter(col("pix_fp").isNotNull)
    // exact rail: identical pixels AND identical caption bytes
    val survivors = decoded
      .groupBy(col("pix_fp"), col("cap_fp"))
      .agg(min(struct(col("doc_id"), col("dhash"))).as("k"),
        count(lit(1)).as("n_copies"))
      .select(col("k.doc_id").as("doc_id"), col("k.dhash").as("dhash"),
        col("pix_fp"), col("cap_fp"), col("n_copies"))
      .barrier() // caption rail, hash verify AND keep-list base
    // near rail: captions propose, dHash verifies (q274's shape)
    val capPairs = TextOps.ngramJaccardPairs(
      base.join(survivors.select(col("doc_id")), Seq("doc_id"),
        "left_semi"),
      "doc_id", "text", minJac = minJac, maxDf = 1000)
    val pairs = Multimodal.pairedCaptionNearDupPairs(
      capPairs,
      survivors.select(col("doc_id"), col("dhash")),
      maxHamming).barrier()
    pairs.write.mode("overwrite").parquet(s"$dest/pairs")
    val keep = DedupClusters.keepList(
      survivors, "doc_id", pairs, "doc_a", "doc_b", maxIters = 100)
      .barrier()
    keep.write.mode("overwrite").parquet(s"$dest/keep")
    val undecodable = sigs.filter(col("pix_fp").isNull)
      .agg(count(lit(1)).as("n_payloads"))
      .select(lit("undecodable").as("media_kind"), col("n_payloads"),
        lit(0L).as("n_exact_survivors"), lit(0L).as("n_kept"))
    val report = decoded.agg(count(lit(1)).as("n_payloads"))
      .crossJoin(keep.agg(
        count(lit(1)).as("n_exact_survivors"),
        coalesce(sum(when(col("is_kept"), 1L).otherwise(0L)),
          lit(0L)).as("n_kept")))
      .select(lit("captioned_image").as("media_kind"),
        col("n_payloads"), col("n_exact_survivors"), col("n_kept"))
      .unionByName(undecodable)
    report.write.mode("overwrite").parquet(s"$dest/report")
    report
  }
}
