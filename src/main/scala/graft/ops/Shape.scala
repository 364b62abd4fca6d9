package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-shaping helpers (SURVEY.md §2.3): struct expansion, bulk
  * renames, case normalization — the `unpack_struct` /
  * `withColumnsRenamed` / uppercase-all idioms of the reference
  * (spark_utils.py:393, 736-740; rucio_datasets_stats.py:219-222). */
object Shape {

  /** Expand every field of a struct column into top-level columns
    * (`unpack_struct`, spark_utils.py:736-740). */
  def unpackStruct(df: DataFrame, structCol: String,
      keep: Seq[String] = Seq.empty): DataFrame =
    df.select(keep.map(col) :+ col(s"$structCol.*"): _*)

  /** Bulk rename from a map (withColumnsRenamed over dict,
    * rucio_datasets_stats.py:219-222). */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** Uppercase every column name (spark_utils.py:393). */
  def upperColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toUpperCase): _*)

  /** Prefix every column name — the reference's table-provenance
    * convention (`d_`, `f_`, `b_` prefixes relied on in joins). */
  def prefixColumns(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(prefix + _): _*)

  /** Escaped dotted-name access (`data.\`sec.app\``,
    * spark_utils.py:611-624). */
  def dottedField(structCol: String, fieldWithDots: String): Column =
    col(s"$structCol.`$fieldWithDots`")
}
