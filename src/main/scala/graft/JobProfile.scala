package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

import graft.core.Sessions

/** Job-census diagnostic: run one registered query in a warm JVM and
  * print every Spark JOB the action tree fires (call site, wall
  * time). The local bench floor of a composed query is dominated by
  * its fixed job count — eager barriers, convergence probes, scalar
  * counts — each costing ~0.1-0.3 s of scheduling regardless of data
  * size, so shaving a query's floor starts with knowing which jobs
  * fire and where from.
  * Usage: runMain graft.JobProfile <queryName> [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // diagnostic A/B: GRAFT_DISABLE_AQE=1 re-runs the query without
    // adaptive execution, isolating AQE's per-stage materialization
    // latency from the plan's own work (local floor analysis only —
    // the shipped sessions keep AQE on)
    if (sys.env.get("GRAFT_DISABLE_AQE").exists(_ == "1"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm pass (JIT + shuffle files)
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          js.stageInfos.map(si =>
            si.name.takeWhile(_ != '(').trim + ":" +
              si.details.linesIterator
                .find(l => l.contains("graft.") &&
                  !l.contains("JobProfile") && !l.contains("core.Check"))
                .map(_.trim.stripPrefix("graft.")
                  .replaceAll("^(llmops|queries|ops|streaming)\\.", "")
                  .takeWhile(_ != ')') + ")")
                .getOrElse("?"))
            .mkString(" ; "))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain the final JobEnd
    rows.sortBy(_._1).foreach { case (id, sec, site) =>
      println(f"[jobprofile] job $id%3d ${sec}%7.3f s  $site")
    }
    println(f"[jobprofile] $name: ${rows.size} jobs, " +
      f"sum ${rows.map(_._2).sum}%.3f s, wall $wall%.3f s ($n rows)")
    spark.stop()
  }
}
