package graft.tools

import graft.ops.{Bloom, Dedup}
import graft.ops.TextAnalysis.fingerprintMd5
import graft.streaming.StreamingDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r9 dev probe: why does StreamingDedup.admitBatch drop the novel doc? */
object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docA = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
      "omega one two three four five six"
    val nearA = docA.replaceAll("six$", "seven")
    val docB = "the quick brown fox jumps over the lazy dog tonight"
    val docC = "completely different content about weather patterns " +
      "storms clouds rainfall humidity pressure systems fronts and forecasting"
    val dir = java.nio.file.Files.createTempDirectory("probeidx_").toString
    val b1 = Seq((1L, docA), (2L, docA), (3L, docB)).toDF("id", "text")
    val a1 = StreamingDedup.admitBatch(spark, b1, "id", "text", dir, 0.5)
    println("ADMIT1: " + a1.select("id").as[Long].collect().sorted.mkString(","))

    val b2 = Seq((11L, docA), (12L, nearA), (13L, docC)).toDF("id", "text")
    // replay the stages manually
    val withFp = b2.withColumn("__fp", fingerprintMd5(col("text")))
    val exactB = Dedup.dedupKeepFirst(withFp, "id", Seq("__fp"))
    println("exactB: " + exactB.select("id").as[Long].collect().sorted.mkString(","))
    val fps = spark.read.parquet(s"$dir/fp")
    println("index fps: " + fps.collect().mkString("; "))
    val exactC = Bloom.antiJoinPrefiltered(exactB, "__fp", fps, "fp")
    println("exactC: " + exactC.select("id").as[Long].collect().sorted.mkString(","))
    val nearB = Dedup.dropNearDuplicates(exactC.drop("__fp"), "id", "text", 0.5)
    println("nearB: " + nearB.select("id").as[Long].collect().sorted.mkString(","))
    val bBuckets = Dedup.lshBuckets(nearB, "id", "text", 16, 4, 5)
    val idxBuckets = spark.read.parquet(s"$dir/buckets")
    val cand = idxBuckets
      .join(broadcast(bBuckets.withColumnRenamed("id", "bid")), Seq("band", "bkey"))
      .select(col("bid"), col("id").as("cid")).distinct()
    println("cand: " + cand.collect().mkString("; "))
    val bSig = nearB.select(col("id").as("bid"),
      Dedup.minhashSignature(col("text"), 16, 5).as("bsig"))
    val idxSig = spark.read.parquet(s"$dir/sig")
    val agree = cand.join(broadcast(bSig), "bid")
      .join(idxSig.withColumnRenamed("id", "cid").withColumnRenamed("sig", "csig"), "cid")
      .withColumn("agree",
        size(filter(zip_with(col("bsig"), col("csig"), _ === _), x => x))
          .cast("double") / 16)
    println("agree: " + agree.select("bid", "cid", "agree").collect().mkString("; "))
    // now the real call, against a SECOND fresh index fed the same batch1
    val dir2 = java.nio.file.Files.createTempDirectory("probeidx2_").toString
    val a1b = StreamingDedup.admitBatch(spark, b1, "id", "text", dir2, 0.5)
    println("ADMIT1b: " + a1b.select("id").as[Long].collect().sorted.mkString(","))
    val a2b = StreamingDedup.admitBatch(spark, b2, "id", "text", dir2, 0.5)
    println("ADMIT2b: " + a2b.select("id").as[Long].collect().sorted.mkString(","))
    println("idx1 fps:  " + spark.read.parquet(s"$dir/fp").collect().sortBy(_.getLong(0)).mkString("; "))
    println("idx2 fps:  " + spark.read.parquet(s"$dir2/fp").collect().sortBy(_.getLong(0)).mkString("; "))
    println("idx1 sig:  " + spark.read.parquet(s"$dir/sig").collect().sortBy(_.getLong(0)).mkString("; "))
    println("idx2 sig:  " + spark.read.parquet(s"$dir2/sig").collect().sortBy(_.getLong(0)).mkString("; "))
    println("idx1 bkt:  " + spark.read.parquet(s"$dir/buckets").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.mkString("; "))
    println("idx2 bkt:  " + spark.read.parquet(s"$dir2/buckets").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.mkString("; "))
    spark.stop()
  }
}
