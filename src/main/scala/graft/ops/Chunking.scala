package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for retrieval / context-window packing (extension
  * mandate, SURVEY §2.3): split each document into overlapping fixed-size
  * token windows — the standard RAG / pretraining preprocessing step the
  * reference's ingest stops short of.
  *
  * Shape: one map-only stage (tokenize → start-offset sequence → explode →
  * slice/join), no shuffle at all until the caller aggregates. Output size
  * is `ceil(n_tokens / stride)` rows per document — linear in corpus size
  * for any fixed window/stride, so the operator holds at 100 TB by
  * construction. All arithmetic is integer and the tokenizer is the shared
  * whitespace rule ([[TextAnalysis.tokens]] modulo lower-casing, which
  * chunking must NOT apply — chunks must round-trip verbatim text).
  */
object Chunking {

  /** Overlapping token-window chunks of `textCol`.
    *
    * Tokens are `split(trim(text), "\\s+")`; a document with no tokens
    * yields no chunks. Chunk `i` covers tokens `[i*stride, i*stride+window)`
    * (clipped at the end), for every start offset `< n_tokens` — trailing
    * chunks shorter than `window` are emitted, so every token lands in at
    * least one chunk and token `t` appears in exactly
    * `|{i : i*stride ≤ t < i*stride+window}|` chunks.
    *
    * @return (`idCol`, `chunk_id`, `n_tokens`, `chunk_text`) — `chunk_id`
    *         is the 0-based window index, `n_tokens` the clipped window
    *         length, both `long`.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0, s"chunkDocuments: window must be > 0, got $window")
    require(stride > 0, s"chunkDocuments: stride must be > 0, got $stride")
    val toks = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("long").as("chunk_id"),
        least(lit(window), col("__n") - col("__s")).cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__s") + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}
