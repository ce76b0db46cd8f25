package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_json_types(json)` → `array<struct<field:string, t:string>>`: per
  * top-level key of a JSON object record, the JSON type name of its value
  * (`string`/`integer`/`number`/`boolean`/`null`/`object`/`array`) — the
  * per-record kernel of typed schema inference (reference `app.py:253-261`
  * keeps only strings; the typed mode is SURVEY §1.2's v1 behavior).
  *
  * Replaces a Scala UDF: same shared-Jackson parse, but as a native
  * expression there is no Catalyst↔Scala converter on the (Map) output and
  * no ScalaUDF wrapper per row — the scan stays inside whole-stage codegen
  * with one static call. Malformed / non-object / null-parse records yield
  * an empty array (the UDF's documented behavior); a NULL input column
  * null-propagates, which the consuming explode drops identically.
  */
case class JsonFieldTypes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_json_types expects a string")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("field", StringType, nullable = false),
      StructField("t", StringType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    JsonFieldTypes.types(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonFieldTypes.types($c)")

  override def prettyName: String = "graft_json_types"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonFieldTypes {
  // one mapper per JVM: thread-safe for reads, expensive to construct
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private val empty = new GenericArrayData(Array.empty[Any])

  /** Invoked from generated code — must stay public and static-shaped. */
  def types(json: UTF8String): ArrayData = {
    try {
      val node = mapper.readTree(json.toString)
      if (node == null || !node.isObject) empty
      else {
        val it = node.fields()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
        while (it.hasNext) {
          val e = it.next()
          val v = e.getValue
          val t =
            if (v.isTextual) "string"
            else if (v.isNull) "null"
            else if (v.isIntegralNumber) "integer"
            else if (v.isNumber) "number"
            else if (v.isBoolean) "boolean"
            else if (v.isObject) "object"
            else if (v.isArray) "array"
            else "string"
          buf += InternalRow(
            UTF8String.fromString(e.getKey), UTF8String.fromString(t))
        }
        new GenericArrayData(buf.toArray)
      }
    } catch { case _: Exception => empty }
  }
}
