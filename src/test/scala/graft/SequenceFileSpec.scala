package graft

import graft.ingest.SequenceFiles
import org.apache.hadoop.io.{SequenceFile, Text}
import org.apache.hadoop.io.compress.DefaultCodec

/** SequenceFile ingest: record recovery across compression modes and the
  * Writable-reuse copy-out (Hadoop recycles the same Text instance per
  * record — a reader that keeps references instead of copying returns n
  * copies of the LAST record).
  */
class SequenceFileSpec extends SparkSpec {

  private def write(path: java.nio.file.Path,
                    mode: SequenceFile.CompressionType,
                    rows: Seq[(String, String)]): Unit = {
    val w = SequenceFile.createWriter(spark.sparkContext.hadoopConfiguration,
      SequenceFile.Writer.file(new org.apache.hadoop.fs.Path(path.toString)),
      SequenceFile.Writer.keyClass(classOf[Text]),
      SequenceFile.Writer.valueClass(classOf[Text]),
      SequenceFile.Writer.compression(mode, new DefaultCodec()))
    try rows.foreach { case (k, v) => w.append(new Text(k), new Text(v)) }
    finally w.close()
  }

  test("records round-trip uncompressed, record-compressed, and block-compressed") {
    val rows = (1 to 50).map(i => (s"k$i", s"value $i with ünïcode"))
    for (mode <- Seq(SequenceFile.CompressionType.NONE,
                     SequenceFile.CompressionType.RECORD,
                     SequenceFile.CompressionType.BLOCK)) {
      val dir = java.nio.file.Files.createTempDirectory("seq_")
      write(dir.resolve("t.seq"), mode, rows)
      val got = SequenceFiles.sequenceText(spark, s"$dir/t.seq")
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      assert(got.toSeq == rows.sortBy(_._1),
        s"mode $mode: Writable reuse or codec handling broke record recovery")
    }
  }

  test("a directory of files reads as one dataset") {
    val dir = java.nio.file.Files.createTempDirectory("seq_")
    write(dir.resolve("a.seq"), SequenceFile.CompressionType.BLOCK,
      Seq(("1", "a")))
    write(dir.resolve("b.seq"), SequenceFile.CompressionType.NONE,
      Seq(("2", "b")))
    val got = SequenceFiles.sequenceText(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq(("1", "a"), ("2", "b")))
  }
}
