package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-set assembly — the composite the individual curation
  * operators exist FOR (extension mandate; the reference stops at ingest):
  *
  *   quality gate → near-dup removal → per-language token budget.
  *
  * Every stage is the already-proven distributed shape: the quality gate is
  * map-only ([[TextAnalysis.withQualityFeatures]]); near-dup removal is
  * MinHash banding + connected components + a broadcast-able anti-join
  * ([[Dedup.dropNearDuplicates]]); the budget cap is one shuffle per
  * language partition with a streaming running-sum window over md5(id)
  * order (deterministic across engines, no full sort). Nothing is
  * driver-bound and nothing is quadratic — the chain holds at corpus scale
  * because each piece already does.
  */
object Curate {

  /** The curated document set: rows of `df` that (1) score at least
    * `minQuality`, (2) survive near-dup clustering as their cluster's
    * canonical (min-id) member, and (3) fit the per-`langCol` running token
    * budget in md5(id) order (cumulative count INCLUDING the candidate must
    * stay ≤ `tokenBudget`). Adds `q_n_tokens`/`quality_score` (and the
    * other q_* features) to the surviving rows.
    */
  def curateCorpus(df: DataFrame, idCol: String, textCol: String,
                   langCol: String, minQuality: Double,
                   dupThreshold: Double, tokenBudget: Long): DataFrame = {
    // The gated working set feeds several consumers (the dedup chain's
    // bucket scan and verify joins, the anti-join, the budget window);
    // without persisting it, every consumer re-runs the regex-heavy quality
    // features over the full corpus. MEMORY_AND_DISK spills at scale — the
    // classic materialize-the-filtered-working-set pattern.
    val gated = TextAnalysis.withQualityFeatures(df, textCol)
      .filter(col("quality_score") >= minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The dedup chain is already eager (the component loop runs jobs), so an
    // eager localCheckpoint of its survivor set costs one extra anti-join
    // job — and lets us RELEASE the gated cache before returning instead of
    // leaking it for the session's lifetime (repeated curations would pile
    // cached blocks up). The returned frame is backed by the checkpoint;
    // its blocks are freed by the ContextCleaner once the frame is
    // unreachable.
    val deduped = Dedup.dropNearDuplicates(gated, idCol, textCol, dupThreshold)
      .localCheckpoint()
    gated.unpersist(blocking = false)
    val w = Window.partitionBy(col(langCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    deduped
      .withColumn("__cum", sum(col("q_n_tokens").cast("long")).over(w))
      .filter(col("__cum") <= tokenBudget)
      .drop("__cum")
  }

  /** Per-language summary of a curated set: document and token counts. */
  def curationSummary(curated: DataFrame, langCol: String): DataFrame =
    curated.groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("q_n_tokens").cast("long")).as("n_tokens"))

  /** Training-sequence packing accounting (concat-and-chunk, the standard
    * LLM-pretraining layout): within each `partitionCol` stratum, documents
    * are laid out in deterministic md5(id) order and the token stream is cut
    * every `seqLen` tokens; a document belongs to the sequence its FIRST
    * token lands in. Returns one row per sequence: doc count, token count,
    * and first/last doc id — the shard manifest a packing job would emit.
    *
    * Shape: one shuffle on the stratum key, a streaming running-sum window
    * (no full sort — rank within partitions), one hash aggregate. The
    * stratum key bounds window parallelism exactly like `sampleStratified`;
    * at 100 TB the stratum is (language × shard), never a global window.
    * All arithmetic is exact integers — the DuckDB oracle replays it.
    */
  /** Deterministic train/val/test corpus split: the id's md5-fraction is
    * compared against cumulative thresholds, so every row gets exactly ONE
    * label, the same label on every run/engine/cluster, and resizing a
    * fraction moves only boundary documents (nested like [[TextAnalysis
    * .sampleMixture]]'s samples). Map-only codegen'd expression — the
    * eval-leakage-proof split every training pipeline needs (membership is
    * a pure function of the id, so a doc can never drift between train
    * and test across reruns or incremental additions).
    */
  def splitCorpus(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "need positive fractions")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val frac = conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("double") / lit((1L << 28).toDouble)
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    val label = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), cum), rest) =>
      when(frac < cum, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    partitionCol: String, seqLen: Long): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val nt = TextAnalysis.tokenCount(col(textCol)).cast("long")
    df.select(col(partitionCol), col(idCol), nt.as("nt"))
      .withColumn("__start", sum(col("nt")).over(w) - col("nt")) // exclusive cumsum
      .withColumn("seq_no", floor(col("__start") / lit(seqLen)).cast("long"))
      .groupBy(col(partitionCol).as("stratum"), col("seq_no"))
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
  }
}
