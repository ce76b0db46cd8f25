package graft.streaming

import graft.ops.{Bloom, Dedup}
import graft.ops.TextAnalysis.fingerprintMd5
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous-crawl deduplication at ingest (SURVEY §7.5 extension): each
  * micro-batch drops exact AND MinHash-banded near-duplicates against the
  * standing corpus BEFORE anything is appended — the online face of
  * [[graft.ops.Dedup.dedupKeepFirst]] + [[graft.ops.Dedup.dropNearDuplicates]],
  * the one LLM-pipeline shape (crawl streams in, only novel documents
  * accumulate) the engine previously had only in batch form.
  *
  * Standing state is a parquet dedup INDEX, not the corpus text:
  *   - `indexDir/fp`:      (id, fp)            — md5 content fingerprints
  *   - `indexDir/buckets`: (id, band, bkey)    — LSH band keys
  *   - `indexDir/sig`:     (id, sig)           — full MinHash signatures
  * so the per-document state is a few hundred bytes however large the
  * documents are. Admission per micro-batch:
  *
  *   1. exact dedup WITHIN the batch (min-id per fingerprint);
  *   2. exact dedup vs the index via [[Bloom.antiJoinPrefiltered]] — a
  *      Bloom-negative fingerprint is DEFINITELY new and skips the
  *      anti-join entirely, so a mostly-novel batch shuffles almost
  *      nothing against the corpus-scale fingerprint set;
  *   3. near-dup dedup WITHIN the batch (exact-Jaccard-verified, the batch
  *      operator itself);
  *   4. near-dup vs the index: the batch's band keys equi-join the standing
  *      bucket table — the BATCH side broadcasts (micro-batches are small),
  *      so the corpus-scale index is never shuffled — and candidates are
  *      verified by MinHash signature agreement (fraction of equal
  *      components, the unbiased Jaccard estimator) at `threshold`;
  *   5. survivors' index rows append; survivors return to the caller.
  *
  * Near-dup-vs-corpus verification is the signature ESTIMATE, not exact
  * shingle Jaccard — the index stores no text, which is what keeps the
  * standing state corpus-size-independent (production crawl dedup makes the
  * same trade; with H=16 components the estimator's σ is ~0.12 at J=0.5, so
  * size H to the false-drop rate you want, or re-verify candidates against
  * the corpus store downstream). Admission is GREEDY-online: on a transitive
  * chain A~B~C (A admitted, B dropped vs A, C similar only to B), batch CC
  * keeps {A} while the stream admits {A, C} — B was never indexed. That is
  * the standard online semantics; the convergence spec pins both the
  * agreeing cases and this one deliberate divergence.
  *
  * At 100 TB the per-batch cost is one scan of the bucket/fp index (probed
  * map-side against the broadcast batch); keep the index pruned-scannable by
  * laying it out on bkey ([[graft.ops.Layout]] Z-order / bucketing) as it
  * grows.
  */
object StreamingDedup {

  /** Admit a micro-batch (`idCol` long, `textCol` string) against the
    * standing index at `indexDir`, appending survivors' index entries.
    * Returns the admitted rows (original batch columns). Batch-only API —
    * call from `foreachBatch` (see [[start]]) or directly in tests.
    *
    * `batchId = Some(n)` makes the index writes IDEMPOTENT under
    * foreachBatch replay (Structured Streaming is at-least-once): each
    * table writes its batch's rows into a `bid=n` partition subdir with
    * mode=overwrite, and index READS exclude `bid = n` — so a replayed
    * batch never anti-joins against its own half-written fingerprints
    * (which would silently drop the whole batch from the corpus), and a
    * crash between the three table writes is healed by the replay's
    * overwrite. Pass None only for one-shot batch use (plain appends, no
    * replay safety); don't mix the two modes on one `indexDir` — partition
    * discovery needs the layout to be uniform.
    */
  def admitBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                 textCol: String, indexDir: String, threshold: Double,
                 numHashes: Int = 16, bands: Int = 4,
                 shingleSize: Int = 5, batchId: Option[Long] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val fpDir = s"$indexDir/fp"
    val bucketDir = s"$indexDir/buckets"
    val sigDir = s"$indexDir/sig"
    def readIf(dir: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // "No committed rows" is decided by LOOKING, not by catching: a dir
      // holding only an uncommitted write attempt (_temporary, _SUCCESS, no
      // data files) reads as absent, but any actual read failure (corrupt
      // footer, transient FS error, permissions) PROPAGATES and fails the
      // micro-batch — streaming retries it. Swallowing those here would make
      // the standing index look absent and silently admit duplicates.
      def hasData(d: org.apache.hadoop.fs.Path): Boolean =
        fs.listStatus(d).exists { st =>
          val n = st.getPath.getName
          !(n.startsWith("_") || n.startsWith(".")) &&
            (st.isFile || hasData(st.getPath))
        }
      if (!fs.exists(p) || !hasData(p)) None
      else Some {
        val df = spark.read.parquet(dir)
        if (df.columns.contains("bid"))
          batchId.fold(df.drop("bid"))(b => df.filter(col("bid") =!= b).drop("bid"))
        else df
      }
    }
    def writeIdx(df: DataFrame, dir: String): Unit = batchId match {
      case Some(b) => df.write.mode("overwrite").parquet(s"$dir/bid=$b")
      case None    => df.write.mode("append").parquet(dir)
    }

    // 1. exact within batch
    val withFp = batch.withColumn("__fp", fingerprintMd5(col(textCol)))
    val exactB = Dedup.dedupKeepFirst(withFp, idCol, Seq("__fp"))
    // 2. exact vs index (Bloom prefilter: definitely-new rows skip the join)
    val exactC = readIf(fpDir) match {
      case Some(fps) => Bloom.antiJoinPrefiltered(exactB, "__fp", fps, "fp")
      case None      => exactB
    }
    // 3. near-dup within batch (exact-verified batch semantics)
    val nearB = Dedup.dropNearDuplicates(exactC.drop("__fp"), idCol, textCol,
      threshold, numHashes, bands, shingleSize)
      .withColumn("__fp", fingerprintMd5(col(textCol)))
    // 4. near-dup vs index: broadcast the batch buckets; estimate Jaccard
    //    from stored signatures
    val survivors = (readIf(bucketDir), readIf(sigDir)) match {
      case (Some(idxBuckets), Some(idxSig)) =>
        val bBuckets = Dedup.lshBuckets(nearB, idCol, textCol,
          numHashes, bands, shingleSize)
        val cand = idxBuckets
          .join(broadcast(bBuckets.withColumnRenamed("id", "bid")),
            Seq("band", "bkey"))
          .select(col("bid"), col("id").as("cid")).distinct()
        val bSig = nearB.select(col(idCol).as("bid"),
          Dedup.minhashSignature(col(textCol), numHashes, shingleSize).as("bsig"))
        val dropIds = cand
          .join(broadcast(bSig), "bid")
          .join(idxSig.withColumnRenamed("id", "cid")
            .withColumnRenamed("sig", "csig"), "cid")
          .withColumn("agree",
            size(filter(zip_with(col("bsig"), col("csig"), _ === _),
              x => x)).cast("double") / numHashes)
          .filter(col("agree") >= threshold)
          .select(col("bid").as(idCol)).distinct()
        nearB.join(dropIds, Seq(idCol), "left_anti")
      case (Some(idxBuckets), None) =>
        // bucket rows whose signatures are missing cannot be verified —
        // that's an inconsistent index (a crash between the two appends in
        // non-batch-keyed mode, or external damage), not a fresh one. An
        // all-bid=current bucket table filtered down to nothing is the one
        // benign shape (first batch's replay after a mid-write crash).
        if (idxBuckets.isEmpty) nearB
        else throw new IllegalStateException(
          s"dedup index at $indexDir is inconsistent: bucket table has rows " +
            s"but the signature table is missing — rebuild the index or " +
            s"restore $indexDir/sig")
      case (None, Some(idxSig)) =>
        // the mirror image: signatures without a bucket table cannot arise
        // from the fp→buckets→sig write order, but external damage produces
        // it just as easily — same inconsistency, same refusal to silently
        // skip near-dup dedup.
        if (idxSig.isEmpty) nearB
        else throw new IllegalStateException(
          s"dedup index at $indexDir is inconsistent: signature table has " +
            s"rows but the bucket table is missing — rebuild the index or " +
            s"restore $indexDir/buckets")
      case (None, None) => nearB
    }

    // 5. append survivors' index entries, return survivors.
    //    MATERIALIZE FIRST (eager localCheckpoint severs the lineage from
    //    the index paths): the survivors' plan READS fp/buckets/sig, and
    //    each append below refreshes caches/file-indexes on those paths —
    //    a lazy plan would re-resolve AFTER the appends, anti-join the
    //    batch against its own freshly-written fingerprints, and return
    //    empty. The checkpointed RDD is immune to the self-read cycle.
    val s = survivors.localCheckpoint(true)
    writeIdx(s.select(col(idCol).as("id"), col("__fp").as("fp")), fpDir)
    writeIdx(Dedup.lshBuckets(s, idCol, textCol, numHashes, bands, shingleSize),
      bucketDir)
    writeIdx(s.select(col(idCol).as("id"),
      Dedup.minhashSignature(col(textCol), numHashes, shingleSize).as("sig")),
      sigDir)
    s.drop("__fp")
  }

  /** Continuous deduped ingest: text files landing in `landingDir` flow
    * through [[admitBatch]] (vs the index at `indexDir`) and only the
    * admitted documents enter the corpus via the idempotent
    * [[StreamingIngest.ingestBatchOnce]] marker discipline. Batch ids seed
    * document ids so arrival order is the dedup precedence, exactly like
    * the batch operators' min-id rule.
    */
  def start(spark: SparkSession, landingDir: String, corpusDir: String,
            indexDir: String, checkpointDir: String, threshold: Double,
            numHashes: Int = 16, bands: Int = 4,
            shingleSize: Int = 5): StreamingQuery = {
    val lines = spark.readStream.format("text").load(landingDir)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("content"))
    lines.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("2 seconds"))
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // arrival-ordered ids, unique across micro-batches: batch id in the
        // high bits. Mono ids are partition<<33 + row, so a batch read with
        // >=128 input partitions would overflow 2^40 into the NEXT batch's
        // id space — coalesce below that first (micro-batches are small;
        // 64 partitions keeps mono ids < 65<<33, far under 2^40, and
        // leaves 2^23 batch ids before the sign bit)
        val withId = b.coalesce(64).withColumn("__id",
          lit(batchId << 40) + monotonically_increasing_id())
        val admitted = admitBatch(spark, withId, "__id", "content",
          indexDir, threshold, numHashes, bands, shingleSize,
          batchId = Some(batchId))
        StreamingIngest.ingestBatchOnce(spark, admitted.drop("__id"),
          corpusDir, batchId)
        ()
      }
      .start()
  }
}
