package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-phase timing of the quantized k-means path — isolates
  * driver/planning/codegen overhead from actual job time.
  */
object ProbeKmeans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = emb.select(col("id"),
        Similarity.quantizeInt(col("vec").cast("array<double>")).as("iv"))
      var cents = t("seed collect") {
        q.orderBy("id").limit(4).collect()
          .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]](1).toSeq)).toSeq
      }
      for (it <- 1 to 2) {
        val means = t(s"iter $it agg+collect") {
          Similarity.assignQuantized(q, cents)
            .select(col("cluster"), posexplode(col("iv")).as(Seq("pos", "comp")))
            .groupBy("cluster", "pos")
            .agg(floor(sum(col("comp")).cast("double") / count(lit(1)))
              .cast("long").as("m"))
            .groupBy("cluster")
            .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
              s => s.getField("m")).as("civ"))
            .collect()
            .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]](1).toSeq))
            .toMap
        }
        cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      }
      val asg = Similarity.assignQuantized(q, cents)
      val centDf = cents.map { case (cid, civ) => (cid, civ.sum) }.toDF("cluster", "c_sum")
      t("final groupBy+join+count") {
        asg.groupBy("cluster").agg(count(lit(1)).as("n"))
          .join(centDf, "cluster")
          .select(col("cluster"), col("n"), col("c_sum"))
          .orderBy("cluster").count()
      }
    }
    spark.stop()
  }
}
