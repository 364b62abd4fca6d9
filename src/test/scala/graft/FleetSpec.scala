package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.IO
import graft.jobs.JobRunner

/** Fleet integration pass: EVERY job in `JobRunner.jobs` runs
  * end-to-end — fixture lake on disk → the runner's parquet reader →
  * the registered pipeline → a parquet sink — inside ONE shared
  * SparkSession. The per-job specs (JobsSpec/RunnerSpec) pin business
  * values on rich fixtures; this pass pins what they structurally
  * can't: that no job poisons the session for the jobs after it
  * (conf mutation, temp-view collisions, leaked persists) and that
  * every registry entry's input contract matches its on-disk schema.
  *
  * Fixtures are deterministic 3-row frames generated from
  * `JobRunner.inputSchemas` (string values are shaped by field name so
  * dataset-path and LFN parsing exercise real code), plus hand-rolled
  * frames for the non-schematized inputs. Business-empty outputs are
  * fine — the assertion is runs + writes + reads back, per job.
  *
  * Lake-maintenance jobs (`JobRunner.lakeJobs`) have bespoke option
  * contracts and are each covered end-to-end in RunnerSpec. */
class FleetSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-fleet-test")

  // ---- deterministic fixture generator over a StructType ----

  private def value(dt: DataType, fieldName: String, i: Int): Any = {
    val n = fieldName.toLowerCase
    dt match {
      case StringType =>
        if ((n.contains("dataset") || n == "d_dataset") && !n.endsWith("id"))
          s"/Prim$i/Proc-v$i/RAW"
        else if (n.contains("lfn") || n.contains("file_name") ||
          n.contains("src_url")) s"/store/p$i/f$i.root"
        else s"v$i"
      // lake convention: integral *date* columns carry yyyyMMdd
      // (phedex summary / merge pipeline) — a bare counter would trip
      // their ANSI to_date parses
      case LongType if n.contains("date")    => 20240101L + i
      case IntegerType if n.contains("date") => 20240101 + i
      case LongType    => (i + 1).toLong
      case IntegerType => i + 1
      case ShortType   => (i + 1).toShort
      case ByteType    => (i + 1).toByte
      case DoubleType  => (i + 1).toDouble
      case FloatType   => (i + 1).toFloat
      case BooleanType => i % 2 == 0
      case BinaryType  => Array.fill[Byte](2)((i + 1).toByte)
      case _: DecimalType => new java.math.BigDecimal(i + 1)
      case TimestampType =>
        new java.sql.Timestamp(1704067200000L + i * 1000L)
      case DateType => java.sql.Date.valueOf("2024-01-01")
      case st: StructType  => genRow(st, i)
      case ArrayType(et, _) => Seq(value(et, fieldName, i))
      case MapType(_, vt, _) => Map(s"k$i" -> value(vt, fieldName, i))
      case other =>
        throw new IllegalArgumentException(s"FleetSpec gen: $other")
    }
  }

  private def genRow(st: StructType, i: Int): Row =
    Row.fromSeq(st.fields.toSeq.map(f => value(f.dataType, f.name, i)))

  private def gen(st: StructType, n: Int = 3) =
    spark.createDataFrame(
      java.util.Arrays.asList((0 until n).map(genRow(st, _)): _*), st)

  // ---- non-schematized inputs (generic parquet reads in the runner) ----

  private def specials: Map[String, org.apache.spark.sql.DataFrame] = {
    import spark.implicits._
    Map(
      "access" -> Seq(("/store/p0/f0.root", "dn0", 10L),
        ("/store/p1/f1.root", "dn1", 20L))
        .toDF("file_lfn", "user_dn", "read_bytes"),
      "other" -> Seq(Tuple1("/PrimX/Proc-vX/RAW")).toDF("dataset"),
      "docs" -> Seq(
        (1L, "alpha beta gamma delta epsilon zeta", "s1", "en"),
        (2L, "alpha beta gamma delta epsilon zeta", "s1", "en"),
        (3L, "one two three four five six seven", "s2", "xx"))
        .toDF("doc_id", "text", "source", "lang"),
      "fts" -> Seq(
        ("j1", "gsiftp://host/path/f1", "FINISHED", 1000L, 5000L),
        ("j2", "gsiftp://host/path/f2", "FAILED", 1000L, 2000L))
        .toDF("job_id", "src_url", "t_final_transfer_state",
          "tr_timestamp_start", "tr_timestamp_complete"),
      "aso" -> Seq(("f1", "j1", "alice"))
        .toDF("filename", "job_id", "aso_user"),
      "jm_summary" -> Seq(("SiteA", "0", 10.0, 1L, 20.0))
        .toDF("SiteName", "JobExecExitCode", "tot_cpu", "ecode_count",
          "tot_wc"))
  }

  test("every registered --job runs end-to-end against the fixture " +
    "lake in one shared session") {
    val lakeDir = Files.createTempDirectory("graft-fleet").toString
    val required =
      JobRunner.jobs.values.flatMap(_._1).toSet.toSeq.sorted
    val sp = specials
    val lake: Map[String, String] = required.map { name =>
      val df = JobRunner.inputSchemas.get(name).map(gen(_)).getOrElse(
        sp.getOrElse(name, fail(
          s"input '$name' has neither a registered schema nor a " +
            "special fixture — add one to FleetSpec")))
      val path = s"$lakeDir/$name"
      df.write.parquet(path)
      name -> path
    }.toMap

    val failures = JobRunner.jobs.toSeq.sortBy(_._1).flatMap {
      case (job, (inputNames, pipeline)) =>
        try {
          val inputs = inputNames
            .map(n => n -> IO.parquet(spark, Seq(lake(n)))).toMap
          val out = s"$lakeDir/__out/$job"
          pipeline(spark, inputs).write.mode("overwrite").parquet(out)
          // the sink is readable and schema-complete
          assert(spark.read.parquet(out).columns.nonEmpty)
          None
        } catch {
          case e: Throwable => Some(s"$job: ${e.toString.take(300)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} job(s) failed:\n${failures.mkString("\n")}")
    assert(JobRunner.jobs.nonEmpty)
  }
}
