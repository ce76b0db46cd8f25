package graft.tools

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where q_embed_neardup_lsh's time goes — gate probe vs the
  * collapsed/per-doc pair chains (floor-suspect triage, r16).
  */
object ProbeEmbed {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    println(s"[probe] corpus rows=${emb.count()}")
    def t(label: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      spark.catalog.clearCache()
      println(f"[probe] $label%-24s run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("probe only") {
      val keyed = emb.select(col("id"), col("vec").as("__text"))
      Dedup.gateCacheClear()
      if (Dedup.duplicationMaterial(keyed, col("__text"))) 1L else 0L
    }
    t("pairs collapse=None") {
      Dedup.gateCacheClear()
      Similarity.embeddingNearDuplicates(emb, 0.45, 4, 64).count()
    }
    t("pairs Some(true)")(
      Similarity.embeddingNearDuplicates(emb, 0.45, 4, 64, Some(true)).count())
    t("pairs Some(false)")(
      Similarity.embeddingNearDuplicates(emb, 0.45, 4, 64, Some(false)).count())
    spark.stop()
  }
}
