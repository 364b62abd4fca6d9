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

  /** Memoized per (session, path): repeated query construction reuses
    * the resolved relation instead of re-listing files and re-reading
    * parquet footers — the catalog role `registerTempTable` plays in
    * the reference. Plans, not data, are cached. */
  private val catalog =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Sessions.ensureQueryConfs(spark)
    catalog.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      normalize(name, spark.read.parquet(s"$dir/$name.parquet")))
  }

  /** Pin the generator-facing contract regardless of parquet vintage.
    *
    * `events.ts` is epoch NANOS as BIGINT downstream. Parquet
    * TIMESTAMP(NANOS) already arrives that way (Spark reads
    * nanos-precision timestamps as LongType); a TIMESTAMP(MICROS)
    * file instead surfaces as TIMESTAMP/TIMESTAMP_NTZ, so convert —
    * `unix_micros * 1000` is exact, and the UTC session timezone
    * (`Sessions.ensureQueryConfs`) makes the NTZ→instant cast the
    * identity. The DuckDB oracles read the same file through
    * `epoch_ns(ts)`, which agrees under both vintages.
    *
    * Two documented bounds on the MICROS fallback path (advisor,
    * round 6): (1) replacing `ts` with a derived expression defeats
    * parquet predicate pushdown and row-group min/max pruning for
    * filters on `ts`, so a micros-vintage corpus scans full row
    * groups — filter on the raw timestamp before conversion if that
    * path ever gets hot (the canonical driver corpus is
    * TIMESTAMP(NANOS), which takes the no-op branch); (2)
    * `unix_micros * 1000` wraps past 2262-04-11 (Long nanos range) —
    * the same ceiling any epoch-nanos representation has, including
    * the NANOS vintage itself. */
  private def normalize(name: String, df: DataFrame): DataFrame =
    if (name != "events") df
    else df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
          Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * 1000"))
      case _ => df
    }

  /** Load with guaranteed map-side parallelism: a small parquet file
    * arrives as one split, which serializes any compute-heavy
    * projection (hashing, per-element folds) onto one core. When the
    * scan has fewer splits than cores, spread it; on real multi-split
    * inputs (the 100 TB case) this is a no-op — no gratuitous shuffle. */
  private val spreadCatalog =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    spreadCatalog.getOrElseUpdate((spark, s"$dir/$name.parquet"), {
      val df = load(spark, dir, name)
      val parallelism = spark.sparkContext.defaultParallelism
      // estimate the scan's split count from plan statistics instead of
      // df.rdd.getNumPartitions — the RDD conversion would force plan
      // execution machinery at catalog-build time
      val maxSplitBytes = spark.sessionState.conf.filesMaxPartitionBytes
      val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val estSplits = // BigInt: plan stats can exceed Int range
        ((sizeBytes + maxSplitBytes - 1) / maxSplitBytes).max(BigInt(1))
      if (estSplits < parallelism) df.repartition(parallelism)
      else df
    })

  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
