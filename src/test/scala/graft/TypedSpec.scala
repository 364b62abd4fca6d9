package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Typed

/** Typed Dataset[T] views: projection+encoder binding over wide dump
  * rows, usable in compile-checked job logic. */
class TypedSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-typed-test")

  test("typed view projects, encodes, and survives typed transforms") {
    import spark.implicits._
    val wide = Seq(
      (10L, "/store/f1", 1L, 100L, 1e9, "noise-a", 42),
      (11L, "/store/f2", 1L, 250L, 2e9, "noise-b", 43))
      .toDF("f_file_id", "f_logical_file_name", "f_dataset_id",
        "f_event_count", "f_file_size", "extra1", "extra2")
    val files = Typed.dbsFiles(wide)
    // typed access compiles; extra columns were pruned away
    assert(files.columns.toSeq == Seq("f_file_id", "f_logical_file_name",
      "f_dataset_id", "f_event_count", "f_file_size"))
    val big = files.filter(_.f_event_count > 150).map(_.f_logical_file_name)
    assert(big.collect().toSeq == Seq("/store/f2"))
  }

  test("Option field maps NULL to None") {
    import spark.implicits._
    val df = Seq(("f1", 10L, "A", Some(99L)), ("f2", 20L, "A", None))
      .toDF("NAME", "BYTES", "STATE", "ACCESSED_AT")
    val reps = Typed.rucioReplicas(df).collect().sortBy(_.NAME)
    assert(reps(0).ACCESSED_AT.contains(99L))
    assert(reps(1).ACCESSED_AT.isEmpty)
  }
}
