package graft

import graft.core.Sessions

/** Scaling-curve harness: min-of-reps warm timings for a query list
  * across all three driver corpora in ONE JVM — the evidence table in
  * SCALE.md §pair-joins. Leaked checkpoint blocks are dropped between
  * runs (same rationale as [[Bench]]) so cross-query JVM state doesn't
  * pollute the curve.
  * Usage: runMain graft.ScaleBench <q1,q2,...> [reps]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    // warmup sweep: JIT + codegen caches
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfs.head).count()
      catch { case _: Throwable => () }
      drop()
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val mins = sfs.map { sf =>
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sf).count()
          val dt = (System.nanoTime() - t0) / 1e9
          drop()
          dt
        }
        ts.min
      }
      val exp = math.log10(mins(2) / mins(1))
      println(f"[scalebench] $n: ${mins(0)}%.2f ${mins(1)}%.2f ${mins(2)}%.2f exp=$exp%.2f")
    }
    spark.stop()
  }
}
