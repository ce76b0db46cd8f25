package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The vector-math hot path (ANN scoring is O(pairs × dim)) needs a tight
  * primitive loop: the `zip_with` + `aggregate` higher-order-function
  * equivalent evaluates one lambda call per element outside whole-stage
  * codegen, which measured ~40× slower on the brute-force pair scan. This
  * expression codegens to a plain `for` loop over the unsafe array data (and
  * its interpreted fallback is the same loop), keeping the whole scoring
  * stage inside WholeStageCodegen.
  *
  * Summation is sequential left-to-right — bit-identical to the DuckDB
  * oracle's `list_sum(list_transform(list_zip(a, b), ...))` fold, which the
  * correctness harness relies on.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh names: several graft_dot calls can share one codegen scope
      // (cosine = dot(a,b) / sqrt(dot(a,a) * dot(b,b)))
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotSum")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override def prettyName: String = "graft_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst dot product over two array<long> columns — the integer
  * sibling of [[DotProduct]] for quantized (int8-style) embedding scoring.
  *
  * The `zip_with` + `aggregate` HOF equivalent interprets one lambda call per
  * element; on the quantized brute-force scan that measured ~3× the wall time
  * of the codegen'd double kernel on the same join shape. This is the same
  * tight primitive loop over unsafe array data, kept inside
  * WholeStageCodegen. Exact integer arithmetic — no FP summation-order
  * caveat, so results are bit-identical across engines by construction.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_doti expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("dotiN")
      val s = ctx.freshName("dotiSum")
      val i = ctx.freshName("dotiI")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override def prettyName: String = "graft_doti"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native int8-style vector quantization: `graft_quant(vec, levels)` →
  * per-vector scale of array<double> to integer [-levels, levels] via
  * floor(x·levels/max|x| + 0.5); an all-zero (or empty) vector maps to
  * zeros.
  *
  * Replaces the Column-HOF formulation `transform(vec, v ->
  * floor(v·levels/array_max(transform(vec, abs)) + 0.5))`, whose `mx`
  * subexpression is INLINED into the element lambda — the interpreted HOF
  * re-scans the array per element, O(dim²) lambda evals per row (~0.6 s per
  * materialization of 2000×64 at sf0.1, paid once per job in iterative
  * quantized k-means). This kernel is one pass: max-scan, then scale,
  * inside WholeStageCodegen.
  *
  * Arithmetic parity with the HOF (the DuckDB oracle replays it):
  * `floor(v * levels / mx + 0.5)` evaluated left-to-right in double, then
  * cast to long. Null element slots read as 0 (the `graft_dot`/`graft_doti`
  * convention; the HOF propagated a null element — graft vectors are
  * non-null by construction).
  */
case class QuantizeVector(child: Expression, levels: Int)
    extends Expression {
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quant expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getDouble(i))
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Long](n)
    if (mx != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(vec.getDouble(i) * levels / mx + 0.5).toLong
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val n = ctx.freshName("qN")
    val mx = ctx.freshName("qMx")
    val a = ctx.freshName("qAbs")
    val i = ctx.freshName("qI")
    val arr = ctx.freshName("qArr")
    val body =
      s"""int $n = ${childGen.value}.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = Math.abs(${childGen.value}.getDouble($i));
         |  if ($a > $mx) $mx = $a;
         |}
         |long[] $arr = new long[$n];
         |if ($mx != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $arr[$i] = (long) Math.floor(
         |      ${childGen.value}.getDouble($i) * $levels / $mx + 0.5);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($arr);""".stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    if (nullable) {
      ev.copy(code =
        code"""
             |${childGen.code}
             |boolean ${ev.isNull} = ${childGen.isNull};
             |ArrayData ${ev.value} = null;
             |if (!${ev.isNull}) {
             |  $body
             |}
           """.stripMargin)
    } else {
      ev.copy(code =
        code"""
             |${childGen.code}
             |ArrayData ${ev.value} = null;
             |$body
           """.stripMargin, isNull = FalseLiteral)
    }
  }

  override def prettyName: String = "graft_quant"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Native nearest-centroid argmin by integer squared Euclidean distance:
  * `graft_argmin_sq(iv, matrix, cids)` → the `cids` entry whose row of
  * `matrix` has the smallest Σ(iv[i]−civ[i])² (ties → the earliest entry;
  * callers pass cids ascending, giving the "smallest centroid id" rule).
  *
  * The integer sibling of [[ArgmaxCosine]], and the assignment step of the
  * engine-exact quantized k-means ([[graft.ops.Similarity.kmeansQuantized]]).
  * The previous formulation was a crossJoin against the k-row centroid
  * table + an interpreted `zip_with`+`aggregate` distance per candidate + a
  * per-id `row_number` window — a corpus×k shuffle and a full sort, paid
  * once per Lloyd's iteration. This kernel embeds the collected k×dim
  * centroid control plane as plan reference objects and picks the winner in
  * one map-side loop: zero Exchange, plan/codegen size O(1) in k.
  *
  * Arithmetic is exact integer (sums ≪ 2⁶³), so the choice is bit-identical
  * in any engine — the DuckDB oracle replays the whole training run.
  * Distance truncates to min(len(iv), len(civ)) and reads null slots as 0,
  * matching the `graft_dot`/`graft_doti` convention.
  */
case class ArgminSqDist(children: Seq[Expression]) extends Expression {
  private def vecChild = children(0)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.length == 3 &&
      (vecChild.dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
      (children(1).dataType match {
        case ArrayType(ArrayType(LongType, _), _) => true; case _ => false
      }) &&
      (children(2).dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
      children.drop(1).forall(_.foldable)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_argmin_sq expects (array<bigint>, " +
        "foldable array<array<bigint>>, foldable array<bigint>)")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = vecChild.nullable

  // the collected centroid control plane, evaluated once per plan
  @transient private lazy val matrix: Array[Array[Long]] = {
    val ad = children(1).eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toLongArray())
  }
  @transient private lazy val cids: Array[Long] =
    children(2).eval(null).asInstanceOf[ArrayData].toLongArray()

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vecChild.eval(input)
    if (v == null) return null
    val vec = v.asInstanceOf[ArrayData]
    var bestDist = 0L
    var bestCid = 0L
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      val n = math.min(vec.numElements(), cv.length)
      var s = 0L
      var i = 0
      while (i < n) { val d = vec.getLong(i) - cv(i); s += d * d; i += 1 }
      if (c == 0 || s < bestDist) { bestDist = s; bestCid = cids(c) }
      c += 1
    }
    bestCid
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vecChild.genCode(ctx)
    val mRef = ctx.addReferenceObj("argminMatrix", matrix, "long[][]")
    val cRef = ctx.addReferenceObj("argminCids", cids, "long[]")
    val bestDist = ctx.freshName("bestDist")
    val bestCid = ctx.freshName("bestCid")
    val cIdx = ctx.freshName("cIdx")
    val cv = ctx.freshName("cv")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    val loop =
      s"""long $bestDist = 0L;
         |long $bestCid = 0L;
         |for (int $cIdx = 0; $cIdx < $mRef.length; $cIdx++) {
         |  long[] $cv = $mRef[$cIdx];
         |  int $n = Math.min(${vecGen.value}.numElements(), $cv.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = ${vecGen.value}.getLong($i) - $cv[$i];
         |    $s += $d * $d;
         |  }
         |  if ($cIdx == 0 || $s < $bestDist) {
         |    $bestDist = $s; $bestCid = $cRef[$cIdx];
         |  }
         |}""".stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    if (nullable) {
      ev.copy(code =
        code"""
             |${vecGen.code}
             |boolean ${ev.isNull} = ${vecGen.isNull};
             |long ${ev.value} = 0L;
             |if (!${ev.isNull}) {
             |  $loop
             |  ${ev.value} = $bestCid;
             |}
           """.stripMargin)
    } else {
      ev.copy(code =
        code"""
             |${vecGen.code}
             |$loop
             |long ${ev.value} = $bestCid;
           """.stripMargin, isNull = FalseLiteral)
    }
  }

  override def prettyName: String = "graft_argmin_sq"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Native sign-bit LSH bucketing: `graft_lsh_bucket(vec, planes)` → the
  * '0'/'1' bucket string of `vec` under the fixed hyperplane matrix `planes`
  * (one char per plane, '1' iff the plane dot product is >= 0).
  *
  * `planes` must be foldable — it is the deterministic planes×dim hyperplane
  * control plane ([[graft.ops.Similarity.planeWeights]]), evaluated once and
  * embedded as a plan reference object, so plan size and codegen size stay
  * O(1) in planes×dim. The previous formulation concatenated one
  * `when(graft_dot(vec, array(lit…)) >= 0, …)` per plane, inlining
  * planes×dim double literals into the plan — at realistic planes=32,
  * dim=512 that is 16k literals and a codegen-split risk, the same
  * plan-growth disease `graft_argmax_cos` cured for IVF assignment.
  *
  * Arithmetic parity (the DuckDB oracle replays it): per plane, the dot is
  * the `graft_dot` left-to-right fold truncated to the shorter operand, and
  * the sign test is `>= 0` — bit-identical to the `when` chain it replaces.
  */
case class LshBucket(children: Seq[Expression]) extends Expression {
  private def vecChild = children(0)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.length == 2 &&
      (vecChild.dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) &&
      (children(1).dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false
      }) &&
      children(1).foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_lsh_bucket expects (array<double>, foldable array<array<double>>)")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = vecChild.nullable

  // the hyperplane control plane, evaluated once per plan
  @transient private lazy val planes: Array[Array[Double]] = {
    val ad = children(1).eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vecChild.eval(input)
    if (v == null) return null
    val vec = v.asInstanceOf[ArrayData]
    val buf = new Array[Byte](planes.length)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(vec.numElements(), pl.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getDouble(i) * pl(i); i += 1 }
      buf(p) = if (s >= 0.0) '1'.toByte else '0'.toByte
      p += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(buf)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vecChild.genCode(ctx)
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val buf = ctx.freshName("lshBuf")
    val pIdx = ctx.freshName("pIdx")
    val pl = ctx.freshName("pl")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val loop =
      s"""byte[] $buf = new byte[$pRef.length];
         |for (int $pIdx = 0; $pIdx < $pRef.length; $pIdx++) {
         |  double[] $pl = $pRef[$pIdx];
         |  int $n = Math.min(${vecGen.value}.numElements(), $pl.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${vecGen.value}.getDouble($i) * $pl[$i];
         |  }
         |  $buf[$pIdx] = ($s >= 0.0) ? (byte) '1' : (byte) '0';
         |}""".stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    if (nullable) {
      ev.copy(code =
        code"""
             |${vecGen.code}
             |boolean ${ev.isNull} = ${vecGen.isNull};
             |UTF8String ${ev.value} = null;
             |if (!${ev.isNull}) {
             |  $loop
             |  ${ev.value} = UTF8String.fromBytes($buf);
             |}
           """.stripMargin)
    } else {
      ev.copy(code =
        code"""
             |${vecGen.code}
             |$loop
             |UTF8String ${ev.value} = UTF8String.fromBytes($buf);
           """.stripMargin, isNull = FalseLiteral)
    }
  }

  override def prettyName: String = "graft_lsh_bucket"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Native nearest-centroid argmax by cosine: `graft_argmax_cos(vec, nrm,
  * matrix, cnorms, cids)` → the `cids` entry whose row of `matrix` has the
  * highest cosine similarity to `vec` (ties → the earliest entry; callers
  * pass cids ascending, giving the reference's "smallest centroid id" rule).
  *
  * `matrix`/`cnorms`/`cids` must be foldable (they are the collected k×dim
  * centroid control plane, inlined as ONE literal each): the expression
  * evaluates them once and embeds them as plan reference objects, so plan
  * size and codegen size stay O(1) in k — unlike the previous
  * `greatest`-over-k-structs formulation, whose generated source grew with
  * k×dim literals and paid ~1.4 s of Janino compile per fresh centroid set
  * (and risked codegen-split fallback at k in the hundreds).
  *
  * Arithmetic parity (the DuckDB oracle replays it): dot is the same
  * left-to-right fold as `graft_dot` truncated to min length; cosine is
  * `denom == 0 → 0.0, else dot/denom` with `denom = nrm * cnorms[c]`;
  * candidate comparison uses Spark's double ordering (`Double.compare`, NaN
  * greatest) exactly like the struct `greatest` it replaces.
  */
case class ArgmaxCosine(children: Seq[Expression]) extends Expression {
  private def vecChild = children(0)
  private def nrmChild = children(1)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.length == 5 &&
      (vecChild.dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) &&
      nrmChild.dataType == DoubleType &&
      (children(2).dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false
      }) &&
      (children(3).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) &&
      (children(4).dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
      children.drop(2).forall(_.foldable)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_argmax_cos expects (array<double>, double, " +
        "foldable array<array<double>>, foldable array<double>, foldable array<bigint>)")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = vecChild.nullable || nrmChild.nullable

  // the collected centroid control plane, evaluated once per plan
  @transient private lazy val matrix: Array[Array[Double]] = {
    val ad = children(2).eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val cnorms: Array[Double] =
    children(3).eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val cids: Array[Long] =
    children(4).eval(null).asInstanceOf[ArrayData].toLongArray()

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vecChild.eval(input)
    val nr = nrmChild.eval(input)
    if (v == null || nr == null) return null
    val vec = v.asInstanceOf[ArrayData]
    val nrm = nr.asInstanceOf[Double]
    var bestSim = 0.0
    var bestCid = 0L
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      val n = math.min(vec.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getDouble(i) * cv(i); i += 1 }
      val denom = nrm * cnorms(c)
      val sim = if (denom == 0.0) 0.0 else s / denom
      if (c == 0 || java.lang.Double.compare(sim, bestSim) > 0) {
        bestSim = sim; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vecChild.genCode(ctx)
    val nrmGen = nrmChild.genCode(ctx)
    val mRef = ctx.addReferenceObj("argmaxMatrix", matrix, "double[][]")
    val nRef = ctx.addReferenceObj("argmaxNorms", cnorms, "double[]")
    val cRef = ctx.addReferenceObj("argmaxCids", cids, "long[]")
    val bestSim = ctx.freshName("bestSim")
    val bestCid = ctx.freshName("bestCid")
    val cIdx = ctx.freshName("cIdx")
    val cv = ctx.freshName("cv")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val denom = ctx.freshName("denom")
    val sim = ctx.freshName("sim")
    // the argmax loop, writing its winner into $bestCid
    val loop =
      s"""double $bestSim = 0.0;
         |long $bestCid = 0L;
         |for (int $cIdx = 0; $cIdx < $mRef.length; $cIdx++) {
         |  double[] $cv = $mRef[$cIdx];
         |  int $n = Math.min(${vecGen.value}.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${vecGen.value}.getDouble($i) * $cv[$i];
         |  }
         |  double $denom = ${nrmGen.value} * $nRef[$cIdx];
         |  double $sim = ($denom == 0.0) ? 0.0 : $s / $denom;
         |  if ($cIdx == 0 || Double.compare($sim, $bestSim) > 0) {
         |    $bestSim = $sim; $bestCid = $cRef[$cIdx];
         |  }
         |}""".stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    if (nullable) {
      ev.copy(code =
        code"""
             |${vecGen.code}
             |${nrmGen.code}
             |boolean ${ev.isNull} = ${vecGen.isNull} || ${nrmGen.isNull};
             |long ${ev.value} = 0L;
             |if (!${ev.isNull}) {
             |  $loop
             |  ${ev.value} = $bestCid;
             |}
           """.stripMargin)
    } else {
      ev.copy(code =
        code"""
             |${vecGen.code}
             |${nrmGen.code}
             |$loop
             |long ${ev.value} = $bestCid;
           """.stripMargin, isNull = FalseLiteral)
    }
  }

  override def prettyName: String = "graft_argmax_cos"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Shared kernel for [[VecBytes]] — interpreted eval and codegen call the
  * same loop (the MinHashSignature pattern).
  */
object VecBytesImpl {
  /** Canonical byte image of an array<double>, 9 bytes per element
    * (null flag + IEEE-754 bits big-endian). Equality of images matches
    * Spark's GROUP BY / join-key equality on the array: `-0.0` folds to
    * `0.0` and every NaN to the canonical NaN, mirroring Catalyst's
    * NormalizeFloatingNumbers; a null element is flagged, never conflated
    * with NaN. Fixed 9-byte stride means arrays of different lengths can
    * never produce the same image.
    */
  def bytes(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](9 * n)
    var i = 0
    while (i < n) {
      val o = 9 * i
      if (arr.isNullAt(i)) out(o) = 1
      else {
        val d = arr.getDouble(i)
        // doubleToLongBits (not RawBits) canonicalizes NaN; == folds -0.0
        val b = java.lang.Double.doubleToLongBits(if (d == 0.0d) 0.0d else d)
        var j = 0
        while (j < 8) { out(o + 1 + j) = (b >>> (56 - 8 * j)).toByte; j += 1 }
      }
      i += 1
    }
    out
  }
}

/** `graft_vec_bytes(vec)` — canonical binary image of an array<double>,
  * built for CONTENT-ADDRESSING embedding vectors: `sha2(graft_vec_bytes(v),
  * 256)` is a fixed-width stand-in for vector equality, so corpus-sized
  * membership joins can ship a 64-char key instead of a multi-KB vector
  * (the text-dedup content-addressing argument, applied to embeddings).
  * 8n+n bytes and one primitive loop per row — no JSON rendering, no
  * per-element lambda dispatch, inside whole-stage codegen.
  */
case class VecBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_bytes expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def nullSafeEval(vec: Any): Any =
    VecBytesImpl.bytes(vec.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = VecBytesImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.bytes($c);")
  }

  override def prettyName: String = "graft_vec_bytes"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
