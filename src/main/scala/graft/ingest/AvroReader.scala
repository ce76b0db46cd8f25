package graft.ingest

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileStream, SeekableInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Apache Avro object-container ingest, built directly on the avro-core
  * jars this Spark distribution ships (there is no spark-avro connector on
  * the classpath, so `spark.read.format("avro")` is unavailable — this
  * reader fills that gap with zero new dependencies).
  *
  * Plan shape: the READER schema comes from ONE container header opened on
  * the driver (a bounded metadata read, like a parquet footer); executors
  * then decode SYNC-MARKER-ALIGNED BYTE RANGES in parallel — the Avro
  * container format places its 16-byte sync marker at the end of the
  * header and after every block, so a task can seek to an arbitrary byte
  * offset, scan to the next marker, and decode blocks until it passes its
  * range end (the classic Hadoop `AvroRecordReader` split protocol). A
  * multi-GB container therefore fans out across tasks at
  * `spark.sql.files.maxPartitionBytes` grain, and many small files are
  * bin-packed into shared tasks (mirroring Spark's own `FilePartition`
  * packing) — both corpus shapes scale. Each file's own writer schema is
  * resolved against the reader schema (Avro schema resolution — files
  * written with older compatible schemas still decode).
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
  * yields the valid prefix — Avro blocks are independent. One exception
  * is LOUD: a file whose writer schema is IRRECONCILABLE with the reader
  * schema (`AvroTypeException`) is not corruption — it is whole-file data
  * loss that would otherwise be indistinguishable from an empty file — so
  * it emits a per-split skip warning (any split may first observe a
  * resolution failure, so each report is tagged file + byte range) and
  * records the file in the `avro.schema.mismatch.files` accumulator.
  * That accumulator is a SET ([[DistinctFilesAccumulator]]): a k-split
  * mismatched file is one entry, not k, and task retries / speculative
  * duplicates (accumulator updates inside transformations are not
  * exactly-once) cannot inflate the count — dedup happens at merge, so
  * `value.size` IS the distinct mismatched-file count. Hidden dot/underscore-
  * prefixed files are excluded exactly as Spark's own file index excludes
  * them, so a stale `.tmp`-style container can neither supply the schema
  * nor pollute the read.
  */
/** Set-semantics accumulator for mismatched-file names: `add` is
  * idempotent per name, so per-split reporting and at-least-once task
  * retries both collapse to one entry per file. (Spark's built-in
  * `CollectionAccumulator` is a LIST — it would count a k-split file k
  * times, and more under speculation.)
  */
final class DistinctFilesAccumulator
    extends org.apache.spark.util.AccumulatorV2[String, java.util.Set[String]] {
  private val set = java.util.Collections.synchronizedSet(
    new java.util.TreeSet[String]())
  def isZero: Boolean = set.isEmpty
  def copy(): DistinctFilesAccumulator = {
    val c = new DistinctFilesAccumulator
    c.set.addAll(set); c
  }
  def reset(): Unit = set.clear()
  def add(v: String): Unit = set.add(v)
  def merge(other: org.apache.spark.util.AccumulatorV2[
      String, java.util.Set[String]]): Unit = set.addAll(other.value)
  def value: java.util.Set[String] = set
}

object AvroReader {

  /** All records of every `.avro` container under `path` (file or glob),
    * as one DataFrame with the schema of the first readable container.
    *
    * The path is listed ONCE on the driver (hidden dot/underscore files
    * excluded — exactly Spark's own data-file convention) and the same
    * concrete file list feeds the schema probe, the split planner, and the
    * executor scan: schema source and data set cannot diverge, and
    * object-store paths pay one listing round-trip, not two.
    *
    * `maxSplitBytes` overrides the split grain (0 = the session's
    * `spark.sql.files.maxPartitionBytes`) — tests use a tiny grain to
    * force multi-task reads of one container.
    */
  def avro(spark: SparkSession, path: String,
           maxSplitBytes: Long = 0L): DataFrame = {
    val files = listDataFiles(spark, path)
    val readerJson = headerSchemaJson(files.map(_.getPath), spark, path)
    val struct = structOf(new Schema.Parser().parse(readerJson))
    val grain = if (maxSplitBytes > 0) maxSplitBytes
      else spark.sessionState.conf.filesMaxPartitionBytes
    // (file, start, length) ranges at split grain; a task decodes the
    // blocks whose preceding sync marker ends inside its range.
    val splits = files.flatMap { st =>
      val len = st.getLen
      (0L until math.max(len, 1L) by grain).map(s =>
        (st.getPath.toString, s, math.min(grain, len - s)))
    }
    // Bin-pack splits into tasks of ~grain total bytes (small files share a
    // task; a big container's splits each get their own) — Spark's own
    // FilePartition packing, re-expressed for this RDD-backed scan.
    val packed = {
      val bins = scala.collection.mutable.ArrayBuffer.empty[
        (scala.collection.mutable.ArrayBuffer[(String, Long, Long)], Long)]
      splits.sortBy(-_._3).foreach { sp =>
        bins.indexWhere(_._2 + sp._3 <= grain) match {
          case -1 => bins += ((scala.collection.mutable.ArrayBuffer(sp), sp._3))
          case i  => bins(i)._1 += sp; bins(i) = (bins(i)._1, bins(i)._2 + sp._3)
        }
      }
      bins.map(_._1.toSeq).toSeq
    }
    // Executors rebuild the Hadoop conf from the driver's entries (the
    // Configuration object itself is not serializable).
    val confProps = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toSeq
    val mismatches = new DistinctFilesAccumulator
    spark.sparkContext.register(mismatches, "avro.schema.mismatch.files")
    val rows =
      if (packed.isEmpty) spark.sparkContext.emptyRDD[Row]
      else spark.sparkContext.parallelize(packed, packed.size).flatMap { bin =>
        bin.iterator.flatMap { case (f, start, len) =>
          readSplit(f, start, len, readerJson, confProps, msg => {
            mismatches.add(f)
            System.err.println(s"[avro] SKIPPED $f: writer schema is " +
              s"irreconcilable with the reader schema ($msg)")
          })
        }
      }
    spark.createDataFrame(rows, struct)
  }

  /** Matching data files (glob or dir, one level), hidden files excluded
    * the way Spark's file index excludes them. */
  private def listDataFiles(spark: SparkSession,
                            path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(q: org.apache.hadoop.fs.Path): Boolean = {
      val n = q.getName
      n.startsWith(".") || n.startsWith("_")
    }
    Option(fs.globStatus(p)).toSeq.flatten
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s))
      .filter(s => s.isFile && !hidden(s.getPath))
      .sortBy(_.getPath.toString)
  }

  /** Reader schema from the first listed container whose header PARSES —
    * a bounded driver-side read (the header is a few hundred bytes; only
    * the schema JSON is consumed, not the blocks). Unreadable files are
    * skipped here exactly as the executor scan skips them
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

  /** Avro `SeekableInput` over a Hadoop stream. (hadoop-common ships an
    * `AvroFSInput`, but it implements the SHADED
    * `org.apache.hadoop.shaded...SeekableInput` — unusable with the
    * unshaded avro-core `DataFileReader` on this classpath.)
    */
  private final class FsSeekableInput(
      in: org.apache.hadoop.fs.FSDataInputStream, len: Long)
      extends SeekableInput {
    def length(): Long = len
    def read(b: Array[Byte], off: Int, n: Int): Int = in.read(b, off, n)
    def seek(p: Long): Unit = in.seek(p)
    def tell(): Long = in.getPos
    def close(): Unit = in.close()
  }

  /** Decode the blocks of `file` whose preceding sync marker ends in
    * `[start, start+length)`, resolved to the reader schema, as a LAZY
    * iterator — rows stream out as Spark consumes them. `sync(start)`
    * scans to the next 16-byte marker (for start 0 that is the one closing
    * the header, i.e. the first block), `pastSync(end)` hands everything
    * after the range to the next task — together the split set decodes
    * every block exactly once. Never fails the batch: an unreadable header
    * → zero records; corruption mid-range (a torn upload tail) ends the
    * iterator after the valid prefix — Avro blocks are independent, so the
    * prefix is sound. An `AvroTypeException` is neither: it means the
    * file's writer schema cannot resolve to the reader schema — silent
    * zero rows would be indistinguishable from an empty file, so it
    * reports through `onSchemaMismatch` from WHICHEVER split observes the
    * failure (a resolution error can first manifest mid-file, e.g. a
    * union branch only present in later blocks), each report tagged with
    * the split's byte range; the caller dedups file names
    * ([[DistinctFilesAccumulator]]). The schema travels as JSON and is
    * re-parsed per task —
    * `Schema` serialization is avro-version dependent, the JSON form is
    * not.
    */
  private[graft] def readSplit(file: String, start: Long, length: Long,
                               readerJson: String,
                               confProps: Seq[(String, String)],
                               onSchemaMismatch: String => Unit): Iterator[Row] = {
    val end = start + length
    // Report from ANY split, tagged with the byte range: a resolution
    // failure can first manifest mid-file (a union branch only present in
    // later blocks), and gating on the byte-0 range silently truncated
    // those. The caller's message already names the file, so the tag makes
    // each report file+split unique.
    def report(e: Throwable): Unit =
      onSchemaMismatch(s"split [$start, +$length): ${e.getMessage}")
    var input: FsSeekableInput = null
    val opened =
      try {
        val conf = new org.apache.hadoop.conf.Configuration()
        confProps.foreach { case (k, v) => conf.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(conf)
        val len = fs.getFileStatus(p).getLen
        val reader = new Schema.Parser().parse(readerJson)
        input = new FsSeekableInput(fs.open(p), len)
        val r = DataFileReader.openReader(
          input, new GenericDatumReader[GenericRecord](null, reader))
        r.sync(start)
        Some((reader, r))
      } catch {
        // openReader/sync threw AFTER fs.open succeeded: close the stream
        // here or the executor leaks a file handle per unreadable split
        case e: org.apache.avro.AvroTypeException =>
          report(e)
          if (input != null) scala.util.Try(input.close())
          None
        case scala.util.control.NonFatal(_) =>
          if (input != null) scala.util.Try(input.close())
          None
      }
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
                if (stream.hasNext && !stream.pastSync(end))
                  pending = toRow(stream.next(), reader)
                else close()
              } catch {
                case e: org.apache.avro.AvroTypeException =>
                  report(e); close()
                case scala.util.control.NonFatal(_) => close()
              }
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
