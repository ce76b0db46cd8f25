package graft.ingest

import org.apache.hadoop.io.Text
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hadoop SequenceFile ingest (Text key / Text value) — the container
  * format of Hadoop-era data lakes, still holding petabytes of legacy
  * corpora. Rides `SparkContext.sequenceFile` (hadoop-client is always on
  * a Spark classpath — zero new dependencies).
  *
  * Scale shape: unlike the `binaryFile` document readers (whole file per
  * task), SequenceFiles are SPLITTABLE — sync markers every few KB let a
  * single multi-GB file fan out across tasks, the best parallel grain of
  * any container this engine reads. Record/block compression (zlib
  * DefaultCodec & co.) is handled by the Hadoop reader transparently.
  *
  * Failure posture: a corrupt SequenceFile fails the job (Hadoop's reader
  * has no salvage mode). That is deliberately STRICTER than the
  * never-fail-the-batch document readers: sequence files are
  * warehouse-internal artifacts, not wild-web bytes — corruption there is
  * an infrastructure fault to surface, not an input-quality fact to
  * tolerate.
  */
object SequenceFiles {

  /** All (key, value) records under `path` (file, dir, or glob) as
    * `(key string, value string)`. Hadoop reuses Writable instances per
    * record, so the values are copied out via `toString` before leaving
    * the iterator.
    */
  def sequenceText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDF("key", "value")
  }
}
