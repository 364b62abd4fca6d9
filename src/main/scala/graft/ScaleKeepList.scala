package graft

import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps
import graft.core.Sessions
import graft.llmops.{DedupClusters, Multimodal}

/** Keep-list scaling under near-dup FAMILY growth — the one stage of
  * the q271 chain whose depth could move with family size rather than
  * corpus size (component rounds are bounded by cluster diameter).
  * Runs the registered q271 chain with a configurable
  * `syntheticVideos(families = …)` fan: the default 96 reproduces the
  * standard decade; `families = 9` makes every near-dup family ~10×
  * larger at the same corpus size (gcd(9, starts=5) = 1 keeps the
  * fixture non-degenerate — see syntheticVideos' scaladoc).
  *
  * Usage: runMain graft.ScaleKeepList [families] [reps] [dirsCsv]
  */
object ScaleKeepList {
  def main(args: Array[String]): Unit = {
    val families = if (args.length > 0) args(0).toLong else 9L
    val reps = if (args.length > 1) args(1).toInt else 3
    val dirs =
      (if (args.length > 2) args(2)
       else "/root/testdata/sf0.01,/root/testdata/sf0.1," +
         "/root/repo/testdata-sf1").split(",").toSeq
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    def keepList(dir: String): Long = {
      val docs = graft.core.Tables.loadSpread(spark, dir, "documents")
      val d0 = Multimodal.frameFingerprints(
          Multimodal.syntheticVideos(docs, families = families),
          frameBytes = 16)
        .select(col("doc_id"), col("frame_fp")).distinct().barrier()
      val prof = Multimodal.frameSetProfile(d0).barrier()
      val repMap = prof.select(col("doc_id"), col("rep"))
      val pairs = Multimodal.videoLshNearDupPairsFrom(d0,
        minContainment = 0.75, profile = Some(prof)).barrier()
      val repClusters = DedupClusters.keepList(
          repMap.filter(col("doc_id") === col("rep"))
            .select(col("doc_id")),
          "doc_id", pairs, "doc_a", "doc_b", maxIters = 100)
        .select(col("doc_id").as("rep"), col("cluster"))
      val expanded = repMap.join(repClusters, Seq("rep"))
        .select(col("doc_id"), col("cluster"))
      docs.select(col("doc_id"))
        .join(expanded, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"),
          (col("cluster").isNull
            || col("cluster") === col("doc_id")).as("is_kept"))
        .count()
    }

    val times = dirs.map { dir =>
      keepList(dir) // warm (JIT + shuffle files)
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = keepList(dir)
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"[scalekeeplist] families=$families $dir: " +
        f"${best._1}%.2f s (${best._2} rows)")
      best._1
    }
    if (times.size >= 2) {
      val exp = math.log(times.last / times(times.size - 2)) /
        math.log(10.0)
      println(f"[scalekeeplist] families=$families last-decade " +
        f"exp=$exp%.2f")
    }
    spark.stop()
  }
}
