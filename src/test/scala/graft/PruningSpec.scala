package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruning proof (SURVEY.md §4): a day-partitioned store read
  * with a day predicate must scan only the matching partition
  * directories — the access pattern every daily CMSSpark-style job
  * depends on at 100 TB. */
class PruningSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-prune-test")

  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : FileSourceScanExec = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).head
  }

  test("day filter prunes partitions at the scan") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-prune").toString + "/t"
    graft.core.IO.writePartitionedParquet(
      Seq((1, "20240101"), (2, "20240102"), (3, "20240103"))
        .toDF("v", "day"), store, "day")
    val read = spark.read.parquet(store).filter($"day" === 20240102)
    assert(read.collect().map(_.getInt(0)).toSeq == Seq(2))
    val scan = scanOf(read)
    assert(scan.metadata("PartitionFilters").contains("day"))
    // runtime metric: files actually read < files in the store
    val readFiles = scan.metrics("numFiles").value
    val storeFiles = scan.relation.location.inputFiles
      .count(_.endsWith(".parquet"))
    assert(readFiles >= 1 && readFiles < storeFiles,
      s"pruning expected: read $readFiles of $storeFiles files")
  }
}
