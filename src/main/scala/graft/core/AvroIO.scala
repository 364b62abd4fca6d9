package graft.core

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer
import java.time.{Instant, LocalDate}
import java.time.temporal.ChronoUnit

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Connector-free Avro source/sink on the `org.apache.avro` core API
  * (which ships in every Spark distribution's jars, unlike the
  * `spark-avro` connector the reference adds via `--packages`,
  * run_spark wrapper / spark_utils.py:434-478).
  *
  * Role and scale posture:
  *   - The CONNECTOR path ([[IO.avro]]) is canonical on clusters:
  *     splittable reads (container files split at sync markers),
  *     vectorized decode, schema pushdown. Always prefer it when the
  *     jar is present.
  *   - This fallback exists so the avro surface WORKS (and is testable)
  *     when the connector is absent. Reads are SPLIT at avro container
  *     sync markers (the format's whole design point): the driver
  *     carves byte ranges, each task `DataFileReader.sync`s to the
  *     first block boundary after its range start and reads while not
  *     `pastSync(end)` — the standard Hadoop input-split contract, so
  *     a single-huge-file layout parallelizes like the connector's.
  *     Decode is streaming; memory per task is one record, not one
  *     split.
  *
  * Type mapping (both directions): null/boolean/int/long/float/double/
  * string/enum→string/bytes/fixed→binary, logical date,
  * timestamp-millis/micros, decimal(bytes|fixed), array, map(string
  * keys), record→struct, union[null,T]→nullable T. Multi-branch unions
  * are rejected with a clear error rather than silently coerced.
  */
object AvroIO {

  // ---------------------------------------------------------------- read

  /** Read avro container files into a DataFrame, SPLIT at container
    * sync markers. The writer schema of the FIRST file (driver-side
    * header peek) defines the frame schema; files with a
    * different-but-compatible writer schema are resolved per-record by
    * avro's own reader-schema resolution.
    *
    * Split protocol (the one avro's own Hadoop input format uses):
    * the driver carves each file into ~total/minPartitions byte
    * ranges; a task `sync(start)`s to the first block boundary AFTER
    * its range start and reads whole blocks while the last-passed
    * sync is still ≤ `end` (`pastSync`). A block belongs to exactly
    * the split whose range contains the sync marker that precedes it,
    * so contiguous splits partition the record stream — no record is
    * read twice or dropped. */
  def read(spark: SparkSession, paths: Seq[String],
      minPartitions: Int = 0): DataFrame = {
    require(paths.nonEmpty, "AvroIO.read of zero paths")
    val files = listAvroFiles(spark, paths)
    if (files.isEmpty)
      throw new java.io.FileNotFoundException(
        s"AvroIO.read: no avro files under ${paths.mkString(",")}")
    // header peek must skip zero-length placeholders (interrupted
    // writers) — the split carving below already tolerates them, and
    // listing order is filesystem-dependent, so files.head alone
    // would fail nondeterministically on such a directory
    val headerFile = files.find(_._2 > 0).map(_._1).getOrElse(
      throw new java.io.IOException(
        s"AvroIO.read: only zero-length avro files under " +
          paths.mkString(",")))
    val readerSchema = headerSchema(spark, headerFile)
    val sparkSchema = toSparkType(readerSchema).asInstanceOf[StructType]
    val schemaJson = readerSchema.toString
    val minP =
      if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val totalBytes = files.map(_._2).sum
    val splitBytes = math.max(1L, (totalBytes + minP - 1) / minP)
    // zero-length placeholders carry no container header — skip them
    val splits: Seq[(String, Long, Long)] = files.filter(_._2 > 0L)
      .flatMap { case (p, len) =>
        (0L until len by splitBytes).map(s =>
          (p.toString, s, math.min(s + splitBytes, len)))
      }
    // ship the hadoop conf as its entry list (same pattern as write:
    // SerializableConfiguration is private[spark])
    val confEntries: Array[(String, String)] =
      spark.sparkContext.hadoopConfiguration.asScala
        .map(e => e.getKey -> e.getValue).toArray
    val rows = spark.sparkContext
      .parallelize(splits, math.max(1, splits.size))
      .flatMap { case (pathStr, start, end) =>
        val rs = new ASchema.Parser().parse(schemaJson)
        val hconf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => hconf.set(k, v) }
        val path = new Path(pathStr)
        val in = new org.apache.avro.mapred.FsInput(path, hconf)
        val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
          in, new GenericDatumReader[GenericRecord](null, rs))
        reader.sync(start)
        // lazily consumed by the flatMap; close on exhaust
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) { reader.close() }
            h
          }
          def next(): Row =
            toRow(reader.next(), rs)
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Expand paths/globs/directories to data files with their sizes. */
  private def listAvroFiles(spark: SparkSession,
      paths: Seq[String]): Seq[(Path, Long)] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(hconf)
      val st = fs.globStatus(path)
      val expanded =
        if (st == null) Seq.empty
        else st.toSeq.flatMap(s =>
          if (s.isDirectory)
            fs.listStatus(s.getPath).toSeq.filter(_.isFile)
          else Seq(s))
      expanded
        .filter(s => s.getPath.getName.endsWith(".avro")
          || !s.getPath.getName.startsWith("_"))
        .map(s => s.getPath -> s.getLen)
    }
  }

  /** Driver-side header peek: first file's writer schema, via the same
    * Hadoop FileSystem the executors will read through. */
  private def headerSchema(spark: SparkSession, first: Path): ASchema = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = first.getFileSystem(hconf)
    val in = fs.open(first)
    try {
      val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try stream.getSchema finally stream.close()
    } finally in.close()
  }

  // ------------------------------------------------- avro -> spark types

  def toSparkType(s: ASchema): DataType = s.getType match {
    case ASchema.Type.NULL    => NullType
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case ASchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
        TimestampType
      case _ => LongType
    }
    case ASchema.Type.FLOAT  => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
    case ASchema.Type.BYTES | ASchema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case ASchema.Type.ARRAY =>
      ArrayType(toSparkType(s.getElementType))
    case ASchema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType))
    case ASchema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, toSparkType(f.schema),
          nullable = isNullable(f.schema))
      })
    case ASchema.Type.UNION =>
      toSparkType(nonNullBranch(s))
    case other =>
      throw new IllegalArgumentException(s"AvroIO: unsupported avro type $other")
  }

  private def isNullable(s: ASchema): Boolean =
    s.getType == ASchema.Type.NULL ||
      (s.getType == ASchema.Type.UNION &&
        s.getTypes.asScala.exists(_.getType == ASchema.Type.NULL))

  private def nonNullBranch(union: ASchema): ASchema = {
    val branches =
      union.getTypes.asScala.filterNot(_.getType == ASchema.Type.NULL)
    require(branches.size == 1,
      s"AvroIO: multi-branch union unsupported: $union " +
        "(only [null, T] unions map to a Spark type)")
    branches.head
  }

  // ------------------------------------------------ avro -> spark values

  private def toRow(rec: GenericRecord, s: ASchema): Row = {
    val resolved =
      if (s.getType == ASchema.Type.UNION) nonNullBranch(s) else s
    Row.fromSeq(resolved.getFields.asScala.toSeq.map(f =>
      fromAvro(rec.get(f.pos), f.schema)))
  }

  private def fromAvro(v: Any, s: ASchema): Any = {
    if (v == null) return null
    val rs = if (s.getType == ASchema.Type.UNION) nonNullBranch(s) else s
    rs.getType match {
      case ASchema.Type.STRING | ASchema.Type.ENUM => v.toString
      case ASchema.Type.INT =>
        if (rs.getLogicalType.isInstanceOf[LogicalTypes.Date])
          LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        else v
      case ASchema.Type.LONG => rs.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          Instant.ofEpochMilli(v.asInstanceOf[Long])
        case _: LogicalTypes.TimestampMicros =>
          Instant.EPOCH.plus(v.asInstanceOf[Long], ChronoUnit.MICROS)
        case _ => v
      }
      case ASchema.Type.BYTES => rs.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          val bb = v.asInstanceOf[ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          BigDecimal(new java.math.BigInteger(bytes)) / BigDecimal(10).pow(d.getScale)
        case _ =>
          val bb = v.asInstanceOf[ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          bytes
      }
      case ASchema.Type.FIXED => rs.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[GenericFixed].bytes())) / BigDecimal(10).pow(d.getScale)
        case _ => v.asInstanceOf[GenericFixed].bytes().clone()
      }
      case ASchema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(fromAvro(_, rs.getElementType))
      case ASchema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> fromAvro(mv, rs.getValueType)
        }.toMap
      case ASchema.Type.RECORD => toRow(v.asInstanceOf[GenericRecord], rs)
      case _ => v match { // boolean/float/double and Utf8 leftovers
        case u: Utf8 => u.toString
        case other   => other
      }
    }
  }

  // --------------------------------------------------------------- write

  /** Distributed avro container-file write: one `part-NNNNN.avro` per
    * partition, written executor-side through the Hadoop FileSystem
    * API, `_SUCCESS` stamped by the driver after the action completes.
    *
    * Commit posture (honest): files are named by PARTITION id and
    * created with overwrite=true, so a task RETRY rewrites its own file
    * rather than duplicating — but unlike the connector this is not a
    * full output-commit protocol (no task-attempt staging), so disable
    * speculative execution when using the fallback sink. The connector
    * sink remains canonical on clusters. */
  def write(df: DataFrame, out: String,
      compression: String = "snappy"): Unit = {
    val spark = df.sparkSession
    val avroSchemaJson = toAvroSchema(df.schema, "topLevelRecord").toString
    // SerializableConfiguration is private[spark]; ship the conf as its
    // entry list and rebuild per task (tiny: site overrides only).
    val confEntries: Array[(String, String)] =
      spark.sparkContext.hadoopConfiguration.asScala
        .map(e => e.getKey -> e.getValue).toArray
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath)) fs.delete(outPath, true)
    fs.mkdirs(outPath)
    val sparkSchema = df.schema
    df.rdd.foreachPartition { rows =>
      val as = new ASchema.Parser().parse(avroSchemaJson)
      val pid = TaskContext.getPartitionId()
      val p = new Path(out, f"part-$pid%05d.avro")
      val hconf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => hconf.set(k, v) }
      val pfs = p.getFileSystem(hconf)
      val os = pfs.create(p, true)
      val writer =
        new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](as))
      if (compression != "none")
        writer.setCodec(org.apache.avro.file.CodecFactory.fromString(compression))
      writer.create(as, os)
      try rows.foreach { r =>
        writer.append(
          toAvroRecord(r, as, sparkSchema))
      } finally { writer.close() }
    }
    fs.create(new Path(outPath, "_SUCCESS"), true).close()
  }

  // ------------------------------------------------- spark -> avro types

  def toAvroSchema(dt: DataType, recordName: String): ASchema = dt match {
    case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => ASchema.create(ASchema.Type.INT)
    case LongType    => ASchema.create(ASchema.Type.LONG)
    case FloatType   => ASchema.create(ASchema.Type.FLOAT)
    case DoubleType  => ASchema.create(ASchema.Type.DOUBLE)
    case StringType  => ASchema.create(ASchema.Type.STRING)
    case BinaryType  => ASchema.create(ASchema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros()
        .addToSchema(ASchema.create(ASchema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(ASchema.create(ASchema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      ASchema.createArray(nullableWrap(toAvroSchema(et,
        recordName + "_item"), containsNull))
    case MapType(StringType, vt, valueContainsNull) =>
      ASchema.createMap(nullableWrap(toAvroSchema(vt,
        recordName + "_value"), valueContainsNull))
    case st: StructType =>
      val fields = st.fields.toSeq.map { f =>
        new ASchema.Field(f.name,
          nullableWrap(toAvroSchema(f.dataType, recordName + "_" + f.name),
            f.nullable),
          null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
      }
      ASchema.createRecord(recordName, null, "graft.avro", false,
        fields.asJava)
    case other =>
      throw new IllegalArgumentException(
        s"AvroIO: unsupported Spark type for avro write: $other")
  }

  private def nullableWrap(s: ASchema, nullable: Boolean): ASchema =
    if (nullable)
      ASchema.createUnion(ASchema.create(ASchema.Type.NULL), s)
    else s

  // ------------------------------------------------ spark -> avro values

  private def toAvroRecord(r: Row, as: ASchema, st: StructType): GenericRecord = {
    val rec = new GenericData.Record(as)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val fieldSchema = as.getFields.get(i).schema
      rec.put(i,
        toAvroValue(if (r.isNullAt(i)) null else r.get(i),
          fieldSchema, f.dataType))
    }
    rec
  }

  private def toAvroValue(v: Any, s: ASchema, dt: DataType): Any = {
    if (v == null) return null
    val rs = if (s.getType == ASchema.Type.UNION) nonNullBranch(s) else s
    dt match {
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
      case d: DecimalType =>
        val bd = v match {
          case b: java.math.BigDecimal => BigDecimal(b)
          case b: BigDecimal           => b
        }
        ByteBuffer.wrap(
          bd.setScale(d.scale).underlying.unscaledValue.toByteArray)
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ArrayType(et, _) =>
        // Row's external array is a mutable.ArraySeq — match on the
        // collection.Seq supertype
        v.asInstanceOf[scala.collection.Seq[Any]].toSeq
          .map(toAvroValue(_, rs.getElementType, et)).asJava
      case MapType(_, vt, _) =>
        v.asInstanceOf[scala.collection.Map[String, Any]].map {
          case (k, mv) => k -> toAvroValue(mv, rs.getValueType, vt)
        }.toMap.asJava
      case inner: StructType =>
        toAvroRecord(v.asInstanceOf[Row], rs, inner)
      case _ => v
    }
  }
}
