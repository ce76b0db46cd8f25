package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_text_stats(text)` → `struct<n_tokens, sum_tok_len, n_stop,
  * n_chars, n_punct, n_digit>`: every integer count the quality-feature
  * stage ([[graft.ops.TextAnalysis.withQualityFeatures]]) needs, in ONE
  * fused pass over the document instead of four independent kernels
  * (`split` + `aggregate` for token stats, two `regexp_count` scans, a
  * `filter`/`array_contains` pass for stopwords). At 100 TB the quality
  * gate is the curate chain's map-only floor — the ×1000 probe showed the
  * regex scans, not any shuffle, as curate's linear term — so fusing the
  * scans attacks the per-row constant directly. The ratios themselves stay
  * Spark-side column arithmetic so the oracle-checked values are the SAME
  * IEEE operations as the unfused expressions.
  *
  * Exactness contract (pinned by the TextAnalysisSpec parity test): the
  * counts reproduce the unfused expressions bit for bit —
  *
  *   - tokens are `split(trim(lower(text)), "\\s+")`: lowercasing via
  *     `UTF8String.toLowerCase` (the `lower()` kernel itself), trim of
  *     ASCII 0x20 only, and Java `Pattern.split(…, -1)` semantics — the
  *     empty string yields ONE empty token, a leading separator run yields
  *     a leading empty token, a trailing run a trailing one (`\s` without
  *     UNICODE_CHARACTER_CLASS is exactly {0x09,0x0A,0x0B,0x0C,0x0D,0x20},
  *     all single-byte, so byte-level scanning is safe in UTF-8);
  *   - `sum_tok_len` sums `length(token)` in CODE POINTS (non-continuation
  *     bytes), matching Spark's `length`;
  *   - `n_stop` counts tokens equal to one of the ten built-in English
  *     stopwords ([[graft.ops.TextAnalysis.stopwords]]) — duplicates count,
  *     it feeds a ratio over tokens;
  *   - `n_punct`/`n_digit` count `[\p{Punct}]`/`[0-9]` matches over the
  *     ORIGINAL (un-lowered) text: Java's `\p{Punct}` is the ASCII set
  *     0x21–0x7E minus alphanumerics, one match per character;
  *   - `n_chars` is `length(text)` in code points.
  *
  * NULL input null-propagates (the unfused expressions all do).
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_text_stats expects a string")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    TextStats.stats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.stats($c)")

  override def prettyName: String = "graft_text_stats"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  /** Java regex `\s` without UNICODE_CHARACTER_CLASS — ASCII only. */
  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Token bytes (already lowercased) == one of the ten EN stopwords.
    * All stopwords are ASCII, so a byte comparison is exact: any token
    * containing a multi-byte sequence has a byte ≥ 0x80 and cannot match.
    */
  private def isStop(a: Array[Byte], s: Int, len: Int): Boolean =
    (len: @annotation.switch) match {
      case 1 => a(s) == 'a'
      case 2 =>
        val c0 = a(s); val c1 = a(s + 1)
        (c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
          (c0 == 'i' && (c1 == 'n' || c1 == 's' || c1 == 't'))
      case 3 =>
        val c0 = a(s); val c1 = a(s + 1); val c2 = a(s + 2)
        (c0 == 't' && c1 == 'h' && c2 == 'e') ||
          (c0 == 'a' && c1 == 'n' && c2 == 'd') ||
          (c0 == 'f' && c1 == 'o' && c2 == 'r')
      case 4 =>
        a(s) == 't' && a(s + 1) == 'h' && a(s + 2) == 'a' && a(s + 3) == 't'
      case _ => false
    }

  /** Invoked from generated code — must stay public and static-shaped. */
  def stats(input: UTF8String): InternalRow = {
    // pass 1 — ORIGINAL text: code points, ASCII punct, ASCII digits
    val ob = input.getBytes
    var nChars = 0; var nPunct = 0; var nDigit = 0
    var i = 0
    while (i < ob.length) {
      val b = ob(i)
      if ((b & 0xc0) != 0x80) nChars += 1
      if (b >= 0x21 && b <= 0x7e) {
        if (b >= '0' && b <= '9') nDigit += 1
        else if (!((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')))
          nPunct += 1
      }
      i += 1
    }
    // pass 2 — lower+trim, Pattern.split("\\s+", -1) token accounting
    val tb = input.toLowerCase.trim().getBytes
    var nTokens = 0; var sumLen = 0L; var nStop = 0
    val n = tb.length
    if (n == 0) {
      nTokens = 1 // Pattern.split("", -1) == [""]
    } else {
      var p = 0
      while (p < n) {
        // token = [tokStart, p) — empty only when a separator sits at 0
        val tokStart = p
        while (p < n && !isSep(tb(p))) p += 1
        nTokens += 1
        var q = tokStart; var len = 0
        while (q < p) { if ((tb(q) & 0xc0) != 0x80) len += 1; q += 1 }
        sumLen += len
        val byteLen = p - tokStart
        if (byteLen >= 1 && byteLen <= 4 && isStop(tb, tokStart, byteLen))
          nStop += 1
        if (p < n) { // separator run; a trailing run yields a trailing ""
          while (p < n && isSep(tb(p))) p += 1
          if (p == n) nTokens += 1
        }
      }
    }
    InternalRow(nTokens, sumLen, nStop, nChars, nPunct, nDigit)
  }
}
