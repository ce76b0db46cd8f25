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
  * event-time convention). Anything else (multi-branch unions, recursive
  * records) fails at SCHEMA time on the driver, never mid-job.
  *
  * Never-fail-the-batch (the repo-wide ingest contract — see
  * [[Readers.parseXmlRecords]]): a container with an unreadable header
  * yields zero records, and corruption mid-file (a torn upload tail)
  * yields the valid prefix — Avro blocks are independent. Hidden
  * dot/underscore-prefixed files are excluded exactly as Spark's own file
  * index excludes them, so a stale `.tmp`-style container can neither
  * supply the schema nor pollute the read.
  */
object AvroReader {

  /** All records of every `.avro` container under `path` (file or glob),
    * as one DataFrame with the schema of the first readable container.
    *
    * The path is listed ONCE on the driver (hidden dot/underscore files
    * excluded — exactly Spark's own data-file convention, so a stale
    * `.tmp`-style container can neither supply the schema nor be read) and
    * the same concrete file list feeds both the schema probe and the
    * `binaryFile` scan: schema source and data set cannot diverge, and
    * object-store paths pay one listing round-trip, not two.
    */
  def avro(spark: SparkSession, path: String): DataFrame = {
    val files = listDataFiles(spark, path)
    val readerJson = headerSchemaJson(files, spark, path)
    val struct = structOf(new Schema.Parser().parse(readerJson))
    val bin = spark.read.format("binaryFile")
      .load(files.map(_.toString): _*).select(col("content"))
    val rows = bin.rdd.flatMap(r =>
      decodeContainer(r.getAs[Array[Byte]](0), readerJson))
    spark.createDataFrame(rows, struct)
  }

  /** Matching data files (glob or dir, one level), hidden files excluded
    * the way Spark's file index excludes them. */
  private def listDataFiles(spark: SparkSession,
                            path: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(q: org.apache.hadoop.fs.Path): Boolean = {
      val n = q.getName
      n.startsWith(".") || n.startsWith("_")
    }
    Option(fs.globStatus(p)).toSeq.flatten
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s))
      .filter(s => s.isFile && !hidden(s.getPath))
      .map(_.getPath).sortBy(_.toString)
  }

  /** Reader schema from the first listed container whose header PARSES —
    * a bounded driver-side read (the header is a few hundred bytes; only
    * the schema JSON is consumed, not the blocks). Unreadable files are
    * skipped here exactly as [[decodeContainer]] skips them on executors
    * (never-fail-the-batch); only a path with NO readable container errors.
    */
  private def headerSchemaJson(files: Seq[org.apache.hadoop.fs.Path],
                               spark: SparkSession, path: String): String = {
    files.iterator.flatMap { f =>
      try {
        val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = fs.open(f)
        try {
          val stream = new DataFileStream[GenericRecord](
            in, new GenericDatumReader[GenericRecord]())
          try Some(stream.getSchema.toString) finally stream.close()
        } finally scala.util.Try(in.close())
      } catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption().getOrElse(
      sys.error(s"avro: no readable container matches $path"))
  }

  /** One container's records resolved to the reader schema, as a LAZY
    * iterator — rows stream out as Spark consumes them instead of being
    * materialized next to the raw bytes `binaryFile` already holds (which
    * would double peak task memory on a large container). Never fails the
    * batch: an unreadable header → zero records, and corruption mid-file
    * (a torn upload tail) ends the iterator after the valid prefix — Avro
    * blocks are independent, so the prefix is sound. The schema travels as
    * JSON and is re-parsed per task — `Schema` serialization is
    * avro-version dependent, the JSON form is not.
    */
  private[graft] def decodeContainer(bytes: Array[Byte],
                                     readerJson: String): Iterator[Row] = {
    val opened =
      try {
        val reader = new Schema.Parser().parse(readerJson)
        Some((reader, new DataFileStream[GenericRecord](
          new ByteArrayInputStream(bytes),
          new GenericDatumReader[GenericRecord](null, reader))))
      } catch { case scala.util.control.NonFatal(_) => None }
    opened match {
      case None => Iterator.empty
      case Some((reader, stream)) =>
        new Iterator[Row] {
          private var done = false
          private var pending: Row = _
          private def close(): Unit = {
            done = true
            scala.util.Try(stream.close())
          }
          def hasNext: Boolean = {
            if (!done && pending == null) {
              try {
                if (stream.hasNext) pending = toRow(stream.next(), reader)
                else close()
              } catch { case scala.util.control.NonFatal(_) => close() }
            }
            pending != null
          }
          def next(): Row = {
            if (!hasNext) throw new NoSuchElementException("avro: exhausted")
            val r = pending; pending = null; r
          }
        }
    }
  }

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
    * documented mapping (multi-branch unions, RECURSIVE records — Avro
    * allows a record to reference itself, Spark's type system cannot
    * represent that and a naive walk would StackOverflow) — never mid-job.
    */
  private[graft] def structOf(s: Schema): StructType = structOf(s, Set.empty)

  private def structOf(s: Schema, seen: Set[String]): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"avro: top level must be a record, got ${s.getType}")
    require(!seen(s.getFullName),
      s"avro: recursive record ${s.getFullName} is not representable in Spark")
    val inner = seen + s.getFullName
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = typeOf(f.schema(), inner)
      StructField(f.name(), dt, nullable)
    })
  }

  private def typeOf(s: Schema, seen: Set[String]): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.RECORD => (structOf(s, seen), false)
    case Schema.Type.ARRAY =>
      val (et, en) = typeOf(s.getElementType, seen)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = typeOf(s.getValueType, seen)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.length == 1 && branches.length <= 2,
        s"avro: only 2-branch null unions are supported, got $s")
      (typeOf(nonNull.head, seen)._1, true)
    case other => sys.error(s"avro: unsupported type $other in $s")
  }
}
