package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native Bloom-filter membership probe:
  * `graft_bloom(words, p1, …, pk)` → true iff every bit position `pi` is
  * set in the packed little-endian `words` bit array.
  *
  * `words` must be foldable — it is the control-plane bit array built by
  * [[graft.ops.Bloom.build]], evaluated once and embedded as ONE plan
  * reference object. The composed `element_at`/`shiftright` formulation
  * re-inlined the full words literal once per probe hash (k copies of an
  * 8 KiB+ array in the plan — the plan-growth disease `graft_lsh_bucket`
  * and `graft_argmin_sq` were built to cure); this kernel is O(1) plan and
  * codegen size in both m and k. The position expressions stay ordinary
  * codegen'd children (`pmod(xxhash64(seed, key), m)`), so the whole probe
  * remains inside WholeStageCodegen.
  *
  * Out-of-range positions (word index ≥ words.length) probe as "bit not
  * set" — defensive false, never an exception, so a mis-sized caller fails
  * toward keeping rows (the exact join downstream still removes them).
  */
case class BloomContains(children: Seq[Expression]) extends Expression {
  private def wordsChild = children.head
  private def posChildren = children.tail

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.length >= 2 &&
      (wordsChild.dataType match {
        case ArrayType(LongType, _) => true; case _ => false
      }) && wordsChild.foldable &&
      posChildren.forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bloom expects (foldable array<bigint>, bigint...)")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = posChildren.exists(_.nullable)

  // the packed bit array, evaluated once per plan
  @transient private lazy val words: Array[Long] =
    wordsChild.eval(null).asInstanceOf[ArrayData].toLongArray()

  private def bitSet(p: Long): Boolean = {
    val w = (p >>> 6).toInt
    // w can go negative via int truncation for p ≥ 2^37 — both bounds
    // matter for the documented never-throw contract
    w >= 0 && w < words.length && ((words(w) >>> (p & 63).toInt) & 1L) == 1L
  }

  override def eval(input: InternalRow): Any = {
    var i = 0
    while (i < posChildren.length) {
      val p = posChildren(i).eval(input)
      if (p == null) return null
      if (!bitSet(p.asInstanceOf[Long])) return false
      i += 1
    }
    true
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    val gens = posChildren.map(_.genCode(ctx))
    val wIdx = ctx.freshName("wIdx")
    val checks = gens.map { g =>
      s"""if (!${ev.isNull} && ${ev.value}) {
         |  ${g.code}
         |  if (${g.isNull}) { ${ev.isNull} = true; }
         |  else {
         |    int $wIdx = (int) (${g.value} >>> 6);
         |    if ($wIdx < 0 || $wIdx >= $wRef.length ||
         |        ((($wRef[$wIdx]) >>> (${g.value} & 63L)) & 1L) != 1L) {
         |      ${ev.value} = false;
         |    }
         |  }
         |}""".stripMargin
    }.mkString("\n")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
           |boolean ${ev.isNull} = false;
           |boolean ${ev.value} = true;
           |$checks
         """.stripMargin)
  }

  override def prettyName: String = "graft_bloom"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
