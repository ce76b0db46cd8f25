package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage timing of the [[graft.ops.Curate.curateCorpus]]
  * composition (VERDICT r19 #5 — profile the post-fusion chain at sf100
  * before touching anything). Times, in one JVM after an untimed warm of
  * the full chain:
  *
  *   A  quality gate (fused graft_text_stats scan) → persist + count
  *   B  dedup chain (MinHash bands + CC + anti-join), NO checkpoint → count
  *   B' the same survivor frame + eager localCheckpoint — B' − B isolates
  *      the checkpoint WRITE the r19 notes attributed the degraded-window
  *      residual to
  *   C  bucketed running-sum budget cut over the checkpointed survivors
  *      → curationSummary count (the shape q_curate actually runs)
  *
  * Repeats the A/B'/C loop `reps` times (default 3) so the write-sensitive
  * B' term's spread is visible against the CPU terms' stability.
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Curate, Dedup, TextAnalysis}

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // untimed warm: the full public chain once (JIT + parquet footers)
    Curate.curationSummary(
      Curate.curateCorpus(docs, "doc_id", "text", "lang", 0.65, 0.9, 1500L),
      "lang").count()
    graft.Scratch.drain(); spark.catalog.clearCache()

    (1 to reps).foreach { i =>
      val gated = TextAnalysis.withQualityFeatures(docs, "text")
        .filter(col("quality_score") >= 0.65)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (gn, ta) = time(gated.count())
      // B: the dedup chain WITHOUT the checkpoint — construction (its CC
      // loop is eager) plus one count of the survivor frame.
      val (survivors, tb) = time {
        val s = Dedup.dropNearDuplicates(gated, "doc_id", "text", 0.9)
        s.count(); s
      }
      // B': eager localCheckpoint of the SAME frame — the isolated write.
      val (ck, tb2) = time(survivors.localCheckpoint())
      // C: budget window + summary over the checkpointed survivors.
      val (cn, tc) = time(
        Curate.curationSummary(
          Curate.bucketedRunningSum(ck, "lang", "doc_id",
              col("q_n_tokens").cast("long"), "__cum")
            .filter(col("__cum") <= 1500L).drop("__cum"),
          "lang").count())
      println(f"[curateprof] rep $i gated=$gn rows A_quality=$ta%.2f s " +
        f"B_dedup_nockpt=$tb%.2f s Bp_ckpt_write=$tb2%.2f s " +
        f"C_window=$tc%.2f s summary=$cn rows")
      gated.unpersist(blocking = false)
      graft.Scratch.drain(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
