package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact deduplication and anonymization operators (SURVEY.md §2.5, §2.11).
  *
  * Near-duplicate detection (MinHash/SimHash/Jaccard) lives in
  * `graft.llmops`; this file is the exact-key family the reference uses:
  * `drop_duplicates(["GlobalJobId"])` (condor_crab_unique_users.py:91) and
  * MD5 PII anonymization (hdfs_an.py:23-42).
  */
object Dedup {

  /** Dedup by key subset. Like the reference, the surviving row for
    * non-key columns is arbitrary — restrict downstream logic to the keys,
    * or aggregate deterministically instead. */
  def byKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Exact-duplicate fingerprint over a set of columns: md5 of the
    * null-safe concatenation. Scales as a single hash-aggregate; at 100 TB
    * this is the map-side-combinable groupBy that replaces any
    * sort-based dedup. */
  def fingerprint(cols: Seq[Column]): Column =
    md5(concat_ws("", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  /** Group sizes per exact fingerprint — the "how many exact dups" query. */
  def exactDupGroups(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(fingerprint(cols.map(col)).as("fp"))
      .agg(count(lit(1)).as("n_dups"))

  /** MD5-anonymize the given columns in place (hdfs_an.py:58-66). */
  def anonymize(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, md5(col(c).cast("string"))))

  /** Blocking-based candidate pairs: the classic record-linkage
    * pattern — docs sharing the cheap `blockCols` key pair up
    * (`id_a < id_b` total order, no self/mirror pairs), everything
    * else never meets. One self-equi-join on the block key: hash
    * join, no cartesian. The blocking key bounds the quadratic — at
    * corpus scale pick keys tight enough that block sizes stay
    * small (the caller owns that trade-off; a hot block is AQE
    * skew-join territory but still block² pairs). */
  def blockedPairs(df: DataFrame, idCol: String,
      blockCols: Seq[String], payloadCols: Seq[String]): DataFrame = {
    def side(p: String) = df.select(
      (blockCols.map(col) :+ col(idCol).as(s"${idCol}_$p")) ++
        payloadCols.map(c => col(c).as(s"${c}_$p")): _*)
    side("a").join(side("b"), blockCols)
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
  }

  /** Edit-distance verification of candidate pairs — the exact stage
    * after any blocking/LSH candidate generator: per pair, the
    * Levenshtein distance between the two texts (capped at `maxLen`
    * chars — the kernel is O(len²) per pair, so the cap bounds
    * verification cost regardless of document size) and the
    * normalized similarity `1 - lev / max(len)`. Integer edit
    * distance is engine-exact; the one division is IEEE-exact on
    * integer-valued doubles. Pure per-pair map: scales with the
    * candidate count the generator chose, never with the corpus. */
  def editDistanceVerify(pairs: DataFrame, textA: String, textB: String,
      maxLen: Int = 1000): DataFrame = {
    val (ta, tb) = (substring(col(textA), 1, maxLen),
      substring(col(textB), 1, maxLen))
    pairs
      .withColumn("lev", levenshtein(ta, tb))
      .withColumn("norm_sim",
        lit(1.0) - col("lev").cast("double") /
          greatest(length(ta), length(tb), lit(1)).cast("double"))
  }
}
