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
}
