package graft

import java.nio.file.{Files, Paths}

import graft.core.Sessions

/** Plan auditor: dumps the formatted physical plan of every registered
  * query (or one named query) so broadcast placement, PushedFilters
  * and WholeStageCodegen spans can be reviewed without running jobs.
  * Usage: runMain graft.Explain <outDir> [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val only = if (args.length > 1 && args(1).nonEmpty) Some(args(1)) else None
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local()
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_ == name) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        } catch {
          case e: Throwable =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
