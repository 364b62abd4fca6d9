package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed views over the fixed-schema tables — `Dataset[T]` where type
  * safety pays (SURVEY.md §1.3): compile-checked column access in job
  * logic, case-class encoders for `mapPartitions`-style stages, while
  * the relational ops stay on DataFrames for Catalyst.
  */
object Typed {

  final case class DbsDataset(
      d_dataset_id: Long, d_dataset: String, d_is_dataset_valid: Int)

  final case class DbsFile(
      f_file_id: Long, f_logical_file_name: String, f_dataset_id: Long,
      f_event_count: Long, f_file_size: Double)

  final case class DbsBlock(
      b_block_id: Long, b_block_name: String, b_dataset_id: Long,
      b_block_size: Double, b_file_count: Int)

  final case class RucioReplica(
      NAME: String, BYTES: Long, STATE: String,
      ACCESSED_AT: Option[Long])

  implicit val dbsDatasetEnc: Encoder[DbsDataset] = Encoders.product
  implicit val dbsFileEnc: Encoder[DbsFile] = Encoders.product
  implicit val dbsBlockEnc: Encoder[DbsBlock] = Encoders.product
  implicit val rucioReplicaEnc: Encoder[RucioReplica] = Encoders.product

  /** Project to the case class's columns and bind the encoder — wide
    * dump rows become compact typed records (Catalyst prunes the rest
    * at the scan). */
  def as[T](df: DataFrame)(implicit enc: Encoder[T]): Dataset[T] = {
    val cols = enc.schema.fieldNames.map(df.col)
    df.select(cols.toIndexedSeq: _*).as[T]
  }

  def dbsFiles(df: DataFrame): Dataset[DbsFile] = as[DbsFile](df)
  def dbsDatasets(df: DataFrame): Dataset[DbsDataset] = as[DbsDataset](df)
  def dbsBlocks(df: DataFrame): Dataset[DbsBlock] = as[DbsBlock](df)
  def rucioReplicas(df: DataFrame): Dataset[RucioReplica] =
    as[RucioReplica](df)
}
