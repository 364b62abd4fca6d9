package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Checkpoints

/** The `graft.checkpoint.reliable` switch (SCALE.md fault-tolerance
  * note): every barrier site must produce the SAME frame whether the
  * barrier is an executor-local lazy localCheckpoint (default) or a
  * reliable checkpoint to the checkpoint dir (production 100 TB runs
  * on preemptible capacity).
  */
class CheckpointsSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-ckpt-test")

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-spec").toString
    spark.conf.set("graft.checkpoint.reliable", "true")
    spark.conf.set("graft.checkpoint.dir", dir)
    try body
    finally {
      spark.conf.set("graft.checkpoint.reliable", "false")
      spark.conf.unset("graft.checkpoint.dir")
    }
  }

  test("barrier honors the reliable switch and both modes materialize " +
    "identical data") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val local = Checkpoints.barrier(df)
    assert(!Checkpoints.reliable(df))
    val localRows = local.collect().map(_.toString).sorted.toSeq
    withReliable {
      assert(Checkpoints.reliable(df))
      val rel = Checkpoints.barrier(df)
      assert(rel.collect().map(_.toString).sorted.toSeq == localRows)
      // the reliable barrier actually wrote to the checkpoint dir
      val dir = spark.sparkContext.getCheckpointDir.get
        .stripPrefix("file:")
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir")
    }
  }

  test("barrier-using operators are mode-invariant end-to-end " +
    "(q41 ngram pairs, q164 pagerank at sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    Seq("q41_dedup_ngram_jaccard", "q164_pair_pagerank").foreach { q =>
      val fn = SparkEntry.queries(q)
      val base = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val rel = withReliable {
        fn(spark, sf).collect().map(_.toString).sorted.toSeq
      }
      assert(rel == base, s"$q differs between checkpoint modes")
    }
  }
}
