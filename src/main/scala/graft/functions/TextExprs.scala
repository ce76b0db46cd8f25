package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization: `graft_nfc(str)` → the canonical-composition
  * form of `str` (combining sequences composed: `e`+U+0301 → `é`,
  * `A`+U+030A → `Å`).
  *
  * The canonical first step of any text-normalization pipeline — two
  * byte-different spellings of the same text must fingerprint/dedup/join
  * identically. Spark ships no Unicode-normalize builtin; this wraps the
  * JDK's `java.text.Normalizer` (Unicode-conformant, same canonical
  * composition tables as DuckDB's utf8proc-based `nfc_normalize`, which the
  * oracle replays against). Codegen is a single static call — the
  * expression stays inside whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_nfc expects a string")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.normalize(
      input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NfcNormalize.normalize($c.toString()))")

  override def prettyName: String = "graft_nfc"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Skips the (common) already-normalized fast path via `isNormalized`. */
  def normalize(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
