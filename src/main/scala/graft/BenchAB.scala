package graft

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** Interleaved configuration A/B harness (r15). The box this suite is
  * measured on slows MONOTONICALLY across consecutive sbt runs (the
  * r14 ABAB series on a config-insensitive query timed 1.6→3.1→3.4→
  * 6.6 s), so cross-JVM comparisons of runtime-settable confs are
  * dominated by drift. This main alternates VARIANTS of dynamic SQL
  * confs rep-by-rep inside ONE warm JVM, so every variant sees the
  * same JIT state, heap shape and box load: per query, each variant
  * gets one warmup pass, then `reps` timed passes are taken in
  * variant-rotating order (v1,v2,…,v1,v2,…); the canonical figure is
  * the min per variant — identical to Bench's min-of-N-warm protocol.
  *
  * Usage:
  *   runMain graft.BenchAB <reps> <variants> <queries> [outFile]
  *     variants: name=key:value[;key:value...][|name2=...]
  *               ("" value list allowed; first variant is baseline)
  *     queries:  comma-separated registered names, or ALL
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32) — same contract as Bench.
  *
  * Only DYNAMIC confs can be A/B'd this way (join strategy, shuffle
  * partitions, file split sizing, AQE knobs — all spark.sql.*
  * session confs). Static/code differences still need the worktree
  * protocol from the verify skill.
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val variants: Seq[(String, Seq[(String, String)])] =
      args(1).split('|').toSeq.map { spec =>
        val Array(name, confs) = spec.split("=", 2)
        val kvs = confs.split(';').toSeq.filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          (k, v)
        }
        (name, kvs)
      }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions
      .builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-benchab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names: Seq[String] =
      if (args(2) == "ALL") SparkEntry.queries.keys.toSeq
      else args(2).split(',').toSeq
    val outFile = if (args.length > 3) args(3) else "benchab.json"

    def dropLeakedBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    def setVariant(kvs: Seq[(String, String)]): Unit =
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    // remember baseline values of every touched conf so each variant
    // only sees its own overrides (variants may touch disjoint keys)
    val allKeys = variants.flatMap(_._2.map(_._1)).distinct
    val baselineVals = allKeys.map(k => k -> spark.conf.get(k)).toMap
    def applyVariant(kvs: Seq[(String, String)]): Unit = {
      allKeys.foreach(k => spark.conf.set(k, baselineVals(k)))
      setVariant(kvs)
    }

    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        dropLeakedBlocks()
        dt
      }
      // per-variant warmup (JIT + codegen for BOTH plan shapes)
      variants.foreach { case (_, kvs) => applyVariant(kvs); once() }
      System.gc()
      val series: Seq[(String, Double)] = (1 to reps).flatMap { _ =>
        variants.map { case (vn, kvs) =>
          applyVariant(kvs)
          vn -> once()
        }
      }
      val mins = variants.map { case (vn, _) =>
        vn -> series.collect { case (`vn`, t) => t }.min
      }
      val line = mins.map { case (vn, t) => f""""$vn":$t%.3f""" }
        .mkString(s"""{"query":"$name",""", ",", "}")
      println(s"[benchab] $line")
      (name, mins)
    }
    // restore baseline before exiting (harmless, but keeps any
    // follow-on session state unsurprising under getOrCreate reuse)
    allKeys.foreach(k => spark.conf.set(k, baselineVals(k)))
    val totals = variants.map { case (vn, _) =>
      vn -> results.map(_._2.find(_._1 == vn).get._2).sum
    }
    val body = results.map { case (name, mins) =>
      mins.map { case (vn, t) => f""""$vn":$t%.4f""" }
        .mkString(s""""$name":{""", ",", "}")
    }.mkString("{\"queries\":{", ",", "},")
    val tot = totals.map { case (vn, t) => f""""$vn":$t%.3f""" }
      .mkString("\"totals\":{", ",", s"},\"sf\":\"$sfDir\",\"cpus\":$cpus,\"reps\":$reps}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (body + tot).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("[benchab] totals " + totals.map { case (v, t) => f"$v=$t%.2f" }
      .mkString(" "))
    spark.stop()
  }
}
