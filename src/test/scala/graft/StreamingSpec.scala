package graft

import graft.ops.Corpus
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("continuous ingest: landed files flow through the full pipeline into the corpus") {
    val landing = tmpDir("landing_")
    val corpus = tmpDir("corpus_")
    val checkpoint = tmpDir("ckpt_")
    Files.write(Paths.get(landing, "a.txt"),
      "alpha line\nbeta line\n".getBytes(StandardCharsets.UTF_8))
    val q = StreamingIngest.start(spark, landing, corpus, checkpoint)
    try {
      q.processAllAvailable()
      val round1 = Corpus.records(spark, corpus).count()
      assert(round1 == 2, s"expected 2 records after first file, got $round1")

      Files.write(Paths.get(landing, "b.txt"),
        "gamma line\n".getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()
      val all = Corpus.records(spark, corpus)
      assert(all.count() == 3)
      // ids must stay unique across micro-batches (corpus-seeded idBase)
      val ids = all.select("id").collect().map(_.getLong(0))
      assert(ids.distinct.length == 3)
      // schema stays v1 (same field set every batch)
      assert(Corpus.schemaHistory(spark, corpus).count() == 1)
    } finally q.stop()
  }

  test("retried micro-batch with a committed marker is skipped (idempotent replay)") {
    val corpus = tmpDir("corpus_")
    val batch = Seq("row one", "row two").toDF("content")
    assert(StreamingIngest.ingestBatchOnce(spark, batch, corpus, batchId = 7L))
    assert(Corpus.records(spark, corpus).count() == 2)
    // same batchId again — the foreachBatch retry case
    assert(!StreamingIngest.ingestBatchOnce(spark, batch, corpus, batchId = 7L))
    assert(Corpus.records(spark, corpus).count() == 2, "retry double-appended")
    // a new batchId ingests normally
    assert(StreamingIngest.ingestBatchOnce(spark, batch, corpus, batchId = 8L))
    assert(Corpus.records(spark, corpus).count() == 4)
  }

  test("windowedCounts: watermarked tumbling window aggregates by event_type") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val counts = StreamingIngest.windowedCounts(events, "ts", "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:01:00")
      val t1 = Timestamp.valueOf("2024-01-01 00:02:00")
      val t2 = Timestamp.valueOf("2024-01-01 00:15:00") // next window
      mem.addData((t0, "click", 1.0), (t1, "click", 2.0), (t2, "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("wc")
        .select(col("window.start").cast("string").as("ws"), col("event_type"), col("n"), col("total_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(out.contains(("2024-01-01 00:00:00", "click", 2L, 3.0)), s"got $out")
      assert(out.contains(("2024-01-01 00:10:00", "view", 1L, 5.0)), s"got $out")
    } finally q.stop()
  }
}
