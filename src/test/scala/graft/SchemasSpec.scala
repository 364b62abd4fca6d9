package graft

import java.nio.file.{Files, Paths => JPaths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{IO, Schemas}

/** Fixture-read per schema family (SURVEY.md §1.3): every top-level
  * schema of the reference's `schemas.py` applies cleanly to a
  * one-row dump fixture and surfaces the declared types. The `_dm`
  * uppercase variants pin their two deliberate type widenings. */
class SchemasSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-schemas-test")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-schemas").toString

  /** One CSV value per declared type. */
  private def cell(t: DataType): String = t match {
    case IntegerType => "7"
    case LongType => "9000000000"
    case DoubleType => "1.5"
    case _ => "s"
  }

  /** Write a single-row CSV dump for `schema`, read it back through the
    * engine's CSV source, assert schema + values survive. */
  private def roundTrip(name: String, schema: StructType): Unit = {
    val dir = tmpDir()
    val line = schema.fields.map(f => cell(f.dataType)).mkString(",")
    Files.write(JPaths.get(dir, s"$name.csv"), (line + "\n").getBytes)
    val df = IO.csv(spark, schema, Seq(s"$dir/$name.csv"))
    assert(df.schema == schema, s"$name schema drift")
    val row = df.head()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val expect: Any = f.dataType match {
        case IntegerType => 7
        case LongType => 9000000000L
        case DoubleType => 1.5
        case _ => "s"
      }
      assert(row.get(i) == expect, s"$name.${f.name}")
    }
  }

  test("DBS dimension dumps read under their registry schemas") {
    Seq(
      "processing_eras" -> Schemas.dbsProcessingEras,
      "physics_groups" -> Schemas.dbsPhysicsGroups,
      "mod_configs" -> Schemas.dbsModConfigs,
      "out_configs" -> Schemas.dbsOutConfigs,
      "rel_versions" -> Schemas.dbsRelVersions
    ).foreach { case (n, s) => roundTrip(n, s) }
  }

  test("PhEDEx / JM / ASO / CMSSW dumps read under registry schemas") {
    Seq(
      "phedex" -> Schemas.phedex,
      "phedex_summary" -> Schemas.phedexSummary,
      "dbs_phedex" -> Schemas.dbsPhedex,
      "jm" -> Schemas.jobMonitoring,
      "aso" -> Schemas.aso,
      "cmssw" -> Schemas.cmssw
    ).foreach { case (n, s) => roundTrip(n, s) }
  }

  test("_dm variants: uppercase prefix-less names, widened counters") {
    assert(Schemas.dbsDatasetsDm.fieldNames.toSeq.take(3) ==
      Seq("DATASET_ID", "DATASET", "IS_DATASET_VALID"))
    assert(Schemas.dbsDatasetsDm.fields.map(_.dataType).toSeq ==
      Schemas.dbsDatasets.fields.map(_.dataType).toSeq)
    // schemas.py:216-245 / :292-333 widen exactly these two to Long
    assert(Schemas.dbsBlocksDm("FILE_COUNT").dataType == LongType)
    assert(Schemas.dbsBlocks("b_file_count").dataType == IntegerType)
    assert(Schemas.dbsFilesDm("BRANCH_HASH_ID").dataType == LongType)
    assert(Schemas.dbsFiles("f_branch_hash_id").dataType == IntegerType)
    roundTrip("datasets_dm", Schemas.dbsDatasetsDm)
    roundTrip("blocks_dm", Schemas.dbsBlocksDm)
    roundTrip("files_dm", Schemas.dbsFilesDm)
  }

  test("AAA envelope: pruned JSON read reaches data.* fields") {
    val dir = tmpDir()
    val rec = """{"data":{"activity":"r","app_info":"","client_domain":
      |"cern.ch","file_lfn":"/store/a.root","file_size":189272229,
      |"is_transfer":true,"read_bytes":0,"user_dn":"/DC=ch/CN=u"},
      |"metadata":{"timestamp":1491789740015}}"""
      .stripMargin.replaceAll("\n", "")
    Files.write(JPaths.get(dir, "aaa.json"), (rec + "\n").getBytes)
    val df = IO.json(spark, Schemas.aaaEnvelope, Seq(s"$dir/aaa.json"))
      .select(col("data.file_lfn"), col("data.is_transfer"),
        col("data.file_size"), col("metadata.timestamp"))
    val r = df.head()
    assert(r.getString(0) == "/store/a.root" && r.getBoolean(1)
      && r.getLong(2) == 189272229L && r.getLong(3) == 1491789740015L)
  }

  test("EOS raw shape: str_to_map extraction of the k=v&k=v payload") {
    val dir = tmpDir()
    val data = "\\\"log=9e74&path=/store/mc/f.root&td=nobody.693038" +
      "&rb=19186114&rb_max=524288&wb=0&rt=9130.44&wt=0.00&cts=1491789688" +
      "&csize=3850577700&sec.name=cmsprd&sec.info=/DC=ch/CN=alan" +
      "&sec.app=\\\""
    val rec = s"""{"data":"$data","metadata":{"timestamp":1491789689562}}"""
    Files.write(JPaths.get(dir, "eos.json"), (rec + "\n").getBytes)
    val df = IO.eosFromRaw(
      IO.json(spark, Schemas.eosEnvelope, Seq(s"$dir/eos.json")))
    val r = df.head()
    assert(r.getAs[String]("file_lfn") == "/store/mc/f.root")
    assert(r.getAs[String]("user") == "cmsprd")
    assert(r.getAs[String]("user_dn") == "/DC=ch/CN=alan")
    assert(r.getAs[String]("session") == "nobody.693038")
    assert(r.getAs[Long]("rb") == 19186114L)
    assert(r.getAs[Long]("csize") == 3850577700L)
    assert(r.getAs[String]("day") == "20170410")
  }

  test("EOS 2020+ struct shape: dotted fields select and rename") {
    val dir = tmpDir()
    val rec = """{"data":{"path":"/store/x.root","sec.name":"u1",
      |"sec.info":"/DC=ch/CN=u1","sec.app":"fuse","td":"d.1:2@h",
      |"rb":"5","wb":"0","rb_max":"10","rt":"1.5","wt":"0.0",
      |"cts":"1548009771","csize":"49834"},
      |"metadata":{"timestamp":1548009771000}}"""
      .stripMargin.replaceAll("\n", "")
    Files.write(JPaths.get(dir, "eos2.json"), (rec + "\n").getBytes)
    val df = IO.eosFromStruct(IO.jsonInferred(spark, Seq(s"$dir/eos2.json")))
    val r = df.head()
    assert(r.getAs[String]("file_lfn") == "/store/x.root")
    assert(r.getAs[String]("application") == "fuse")
    assert(r.getAs[String]("day") == "20190120")
  }

  test("AAA/EOS empty-relation fallbacks carry downstream columns") {
    val aaa = IO.emptyRelation(spark, Schemas.aaaEmpty)
    assert(aaa.count() == 0 &&
      aaa.columns.toSeq == Seq("src_experiment_site", "user_dn", "file_lfn"))
    val eos = IO.emptyRelation(spark, Schemas.eosEmpty)
    assert(eos.count() == 0 && eos.columns.contains("rb_max"))
  }
}
