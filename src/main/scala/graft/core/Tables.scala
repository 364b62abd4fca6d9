package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-provided test tables (TESTDATA.md).
  *
  * The reference's pattern is "load every source into a DataFrame and
  * register it as a temp view" (`dbs_tables` etc., spark_utils.py:259-364);
  * `registerAll` reproduces that so queries can be written either with the
  * fluent API or as SQL over named tables.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Sessions.ensureQueryConfs(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
