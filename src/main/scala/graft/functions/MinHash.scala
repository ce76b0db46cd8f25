package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared minhash kernel: token array → H-element signature in one pass.
  *
  * Every stage is CROSS-ENGINE REPLAYABLE — LSH recall is probabilistic (a
  * true near-dup pair can miss every band), so the correctness oracle must
  * reproduce the exact candidate set, misses included, not assume perfect
  * recall against ground truth. Hence each hash is expressible in plain
  * SQL (`q_dedup_minhash`'s DuckDB oracle replays the whole chain):
  *
  *  - token hash: first 7 hex chars of md5(token utf-8), as an int, + 1
  *    (SQL: `('0x' || substr(md5(t), 1, 7))::BIGINT + 1`);
  *  - shingle hash: polynomial fold h = (h*31 + th) mod P over `k`
  *    consecutive token hashes, seed 7, P = 2^31-1 (order-sensitive, like
  *    the string shingle it replaces; all intermediates < 2^36, no 64-bit
  *    wraparound — DuckDB BIGINT arithmetic errors on overflow);
  *  - permutation j: universal hash (a_j * (h + 1)) mod P with
  *    deterministic odd 30-bit a_j (products < 2^61); signature j = min
  *    over shingles.
  *
  * Documents shorter than `k` tokens contribute their single
  * whole-document shingle, so no input maps to an empty set. Duplicate
  * shingles need no dedup — min() is multiset-insensitive.
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

  /** First 28 bits of md5(token), + 1 — what the SQL replay
    * `('0x' || substr(md5(t), 1, 7))::BIGINT + 1` computes.
    */
  private def tokenHash(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)) + 1L
  }

  def signature(tokens: ArrayData, k: Int, a: Array[Long]): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) 1L else tokenHash(md, t.getBytes)
      i += 1
    }
    val mins = Array.fill(a.length)(Long.MaxValue)
    val nShingles = if (n <= k) 1 else n - k + 1
    val width = math.min(k, n)
    var s = 0
    while (s < nShingles) {
      var h = 7L
      var w = 0
      while (w < width) { h = (h * 31L + th(s + w)) % P; w += 1 }
      var j = 0
      while (j < a.length) {
        val v = (a(j) * (h + 1L)) % P
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
