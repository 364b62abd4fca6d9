package graft

import org.apache.spark.sql.functions.{col, hash, max}

import graft.core.Sessions

/** Scaling-curve harness: min-of-reps warm timings for a query list
  * across all three driver corpora in ONE JVM — the evidence table in
  * SCALE.md §pair-joins. Leaked checkpoint blocks are dropped between
  * runs (same rationale as [[Bench]]) so cross-query JVM state doesn't
  * pollute the curve.
  * Usage: runMain graft.ScaleBench <q1,q2,...> [reps] [dir1,dir2,...]
  * The optional dir list (default: the three driver corpora) lets the
  * curve extend one decade onto the generated sf1 corpus
  * (graft.MakeScaleCorpus); the printed exponent is always between
  * the LAST TWO dirs.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfs =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    // force FULL row evaluation: a bare count() lets ColumnPruning
    // delete pure-projection workloads (q183's repeat_gram kernel,
    // q185's text rebuild) and the "measurement" times a row-count
    // scan — hashing every output column keeps the whole plan live
    // while adding only a cheap fold per row
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(max(hash(df.columns.map(col): _*))).count(); ()
    }
    // warmup sweep: JIT + codegen caches
    names.foreach { n =>
      try force(SparkEntry.queries(n)(spark, sfs.head))
      catch { case _: Throwable => () }
      drop()
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val mins = sfs.map { sf =>
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          force(fn(spark, sf))
          val dt = (System.nanoTime() - t0) / 1e9
          drop()
          dt
        }
        ts.min
      }
      val exp = math.log10(mins.last / mins(mins.size - 2))
      val series = mins.map(m => f"$m%.2f").mkString(" ")
      println(f"[scalebench] $n: $series exp=$exp%.2f")
    }
    spark.stop()
  }
}
