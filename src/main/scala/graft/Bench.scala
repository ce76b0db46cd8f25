package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry at
  * `SPARK_GRAFT_SF_DIR` and prints ONE compact JSON line.
  *
  * Artifact hygiene (the r3 bench tail was truncated and unparseable):
  *   - queries run in sorted-name order — deterministic across rounds, so
  *     per-query diffs compare like with like (a Map's hash order reshuffled
  *     whenever a query was added, silently moving queries between cold and
  *     warm slots);
  *   - timings are rounded to ms so the full line stays within a 2 KB
  *     stdout tail capture;
  *   - the full-precision result is also written to `graft_bench_full.json`
  *     in the working directory as a machine-diffable backup.
  *
  * `SPARK_GRAFT_BENCH_REPEAT` (default 3) reruns each query N times; the
  * reported per-query number is the MEDIAN (at n=3 that discards the cold
  * plan/codegen-compile first run AND any one-off GC/contention spike — a
  * single-pass battery cannot tell a regression from noise, the r6 lesson).
  * Spread is measured over the WARM runs only (the first run always pays
  * plan + codegen compile, so including it would flag every query): with
  * n=3 it is |run3 − run2|. The stdout line stays within the ~2 KB tail
  * capture, so per-query spreads live in `graft_bench_full.json`; the line
  * itself carries `n_runs`, the worst warm spread, and the names of
  * queries whose warm spread exceeds max(25 % of median, 0.25 s) — the set
  * whose medians deserve skepticism.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // testdata events.ts is timestamp[ns] — Spark 4 parquet rejects NANOS
      // unless read as long (nanos since epoch); queries convert explicitly.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM/codegen/parquet-reader warmup (standard steady-state bench
    // methodology): the first query otherwise absorbs ~4s of one-time JIT and
    // session init. No query results are precomputed — caches are cleared.
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.catalog.clearCache()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val dts = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        // Operators that persist derived tables (LSH buckets, simhash
        // segments, in-flight batches) release them per-run; drop leftovers
        // so queries are timed independently.
        spark.catalog.clearCache()
        t
      }
      val sorted = dts.sorted
      val warm = if (dts.length > 1) dts.drop(1) else dts
      (name, sorted(sorted.length / 2), warm.max - warm.min) // (median, warm spread)
    }
    val total = results.map(_._2).sum
    val maxSpread = if (results.isEmpty) 0.0 else results.map(_._3).max
    val noisy = results.collect {
      case (k, med, sp) if sp > math.max(0.25 * med, 0.25) => "\"" + k + "\""
    }
    def line(fmt: Double => String, withSpread: Boolean): String = {
      val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val spread = if (withSpread)
        results.map { case (k, _, s) => "\"" + k + "\":" + fmt(s) }
          .mkString(""","spread":{""", ",", "}")
      else // ≤8 names so the line stays inside the ~2 KB tail capture
        s""","spread_max":${fmt(maxSpread)},"noisy":${noisy.take(8).mkString("[", ",", "]")}"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_runs":$repeat,""" +
        s""""queries":$qs$spread,"sf":"$sfDir"}"""
    }
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("graft_bench_full.json"),
        line(_.toString, withSpread = true).getBytes("UTF-8"))
    } catch { case _: Exception => () } // read-only cwd: stdout still has it
    println(line(v => f"$v%.3f", withSpread = false))
    spark.stop()
  }
}
