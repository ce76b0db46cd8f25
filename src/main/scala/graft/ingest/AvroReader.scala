package graft.ingest

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.ByteArrayInputStream
import scala.jdk.CollectionConverters._

/** Apache Avro object-container ingest, built directly on the avro-core
  * jars this Spark distribution ships (there is no spark-avro connector on
  * the classpath, so `spark.read.format("avro")` is unavailable — this
  * reader fills that gap with zero new dependencies).
  *
  * Plan shape: the READER schema comes from ONE container header opened on
  * the driver (a bounded metadata read, like a parquet footer); executors
  * then decode every container in parallel over `binaryFile`, resolving
  * each file's own writer schema against the reader schema (Avro schema
  * resolution — files written with older compatible schemas still decode).
  * Parallelism is per FILE — the natural grain for the many-files corpora
  * this engine ingests; a single multi-GB container would need a
  * sync-marker-splitting reader (documented boundary, same posture as the
  * other `binaryFile` readers in [[Readers]]).
  *
  * Type mapping: null/boolean/int/long/float/double/string/enum →
  * their Spark scalars (enum as string), bytes/fixed → binary, and
  * records/arrays/maps/2-branch null unions recursively. Logical types
  * ride their base type (timestamps stay long micros — the engine's
  * event-time convention). Anything else (multi-branch unions) fails at
  * SCHEMA time on the driver, never mid-job.
  *
  * A malformed container yields zero records instead of failing the batch
  * (the repo-wide never-fail-the-batch ingest contract — see
  * [[Readers.parseXmlRecords]]).
  */
object AvroReader {

  /** All records of every `.avro` container under `path` (file or glob),
    * as one DataFrame with the schema of the first container found.
    */
  def avro(spark: SparkSession, path: String): DataFrame = {
    val readerJson = headerSchemaJson(spark, path)
    val struct = structOf(new Schema.Parser().parse(readerJson))
    val bin = spark.read.format("binaryFile").load(path).select(col("content"))
    val rows = bin.rdd.flatMap(r =>
      decodeContainer(r.getAs[Array[Byte]](0), readerJson))
    spark.createDataFrame(rows, struct)
  }

  /** Reader schema from the first matching container whose header PARSES —
    * a bounded driver-side read (the header is a few hundred bytes; only
    * the schema JSON is consumed, not the blocks). Unreadable files are
    * skipped here exactly as [[decodeContainer]] skips them on executors
    * (never-fail-the-batch); only a path with NO readable container errors.
    */
  private def headerSchemaJson(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).toSeq.flatten
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s))
      .filter(_.isFile).sortBy(_.getPath.toString)
    files.iterator.flatMap { f =>
      try {
        val in = fs.open(f.getPath)
        try {
          val stream = new DataFileStream[GenericRecord](
            in, new GenericDatumReader[GenericRecord]())
          try Some(stream.getSchema.toString) finally stream.close()
        } finally scala.util.Try(in.close())
      } catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption().getOrElse(
      sys.error(s"avro: no readable container matches $path"))
  }

  /** One container's records resolved to the reader schema; malformed
    * bytes → empty (never fail the batch). The schema travels as JSON and
    * is re-parsed per task — `Schema` serialization is avro-version
    * dependent, the JSON form is not.
    */
  private[ingest] def decodeContainer(bytes: Array[Byte],
                                      readerJson: String): Iterator[Row] =
    try {
      val reader = new Schema.Parser().parse(readerJson)
      val stream = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(bytes),
        new GenericDatumReader[GenericRecord](null, reader))
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try while (stream.hasNext) out += toRow(stream.next(), reader)
      finally stream.close()
      out.iterator
    } catch { case scala.util.control.NonFatal(_) => Iterator.empty }

  private def toRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.toSeq.map(f =>
      convert(rec.get(f.pos()))))

  /** Avro runtime value → Spark external row value (dispatch on the value:
    * after schema resolution the shapes are exactly the supported set). */
  private def convert(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case e: GenericData.EnumSymbol => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: GenericData.Fixed => f.bytes().clone()
    case r: GenericRecord => toRow(r, r.getSchema)
    case l: java.util.List[_] => l.asScala.toSeq.map(convert)
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => (String.valueOf(k), convert(x)) }.toMap
    case other => other // boolean / int / long / float / double
  }

  /** Avro schema → Spark type. Throws on the driver for shapes outside the
    * documented mapping (multi-branch unions) — never mid-job.
    */
  private[graft] def structOf(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"avro: top level must be a record, got ${s.getType}")
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = typeOf(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def typeOf(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.RECORD => (structOf(s), false)
    case Schema.Type.ARRAY =>
      val (et, en) = typeOf(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = typeOf(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.length == 1 && branches.length <= 2,
        s"avro: only 2-branch null unions are supported, got $s")
      (typeOf(nonNull.head)._1, true)
    case other => sys.error(s"avro: unsupported type $other in $s")
  }
}
