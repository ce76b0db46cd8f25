package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Direct Catalyst-value → CPython-json.dumps rendering: one pass from the
  * columnar value to the parity blob, replacing the
  * to_json → (string splice) → parse → re-render chain on the store hot
  * path. Same output contract as [[PyJson.dumps]] (verified equivalent by
  * PipelineSpec): ", "/": " separators, ensure_ascii, Python float repr.
  *
  * Type conventions follow Spark's `to_json` where the reference has no
  * opinion (binary → base64 string, date → ISO day, timestamp → ISO micros
  * UTC), so blobs are stable regardless of which render path produced them.
  */
object PyJsonRenderImpl extends Serializable {

  def render(value: Any, dt: DataType): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    renderValue(value, dt, sb)
    UTF8String.fromString(sb.toString)
  }

  private def renderValue(v: Any, dt: DataType, sb: java.lang.StringBuilder): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case StringType => renderString(v.asInstanceOf[UTF8String].toString, sb)
      case LongType => sb.append(v.asInstanceOf[Long])
      case IntegerType => sb.append(v.asInstanceOf[Int])
      case ShortType => sb.append(v.asInstanceOf[Short].toInt)
      case ByteType => sb.append(v.asInstanceOf[Byte].toInt)
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case DoubleType => sb.append(PyJson.floatReprOf(v.asInstanceOf[Double]))
      case FloatType =>
        // render at single precision (Float.toString digits), like to_json
        sb.append(pyFromJavaRepr(java.lang.Float.toString(v.asInstanceOf[Float])))
      case _: DecimalType => sb.append(v.toString)
      case BinaryType =>
        renderString(java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]), sb)
      case DateType =>
        renderString(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString, sb)
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        renderString(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
          .withZone(java.time.ZoneOffset.UTC).format(inst), sb)
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        sb.append('{')
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(", ")
          renderString(st(i).name, sb)
          sb.append(": ")
          if (row.isNullAt(i)) sb.append("null")
          else renderValue(row.get(i, st(i).dataType), st(i).dataType, sb)
          i += 1
        }
        sb.append('}')
      case at: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(", ")
          if (arr.isNullAt(i)) sb.append("null")
          else renderValue(arr.get(i, at.elementType), at.elementType, sb)
          i += 1
        }
        sb.append(']')
      case mt: MapType =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        sb.append('{')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(", ")
          // json object keys are strings; render non-string keys via toString
          mt.keyType match {
            case StringType => renderString(keys.getUTF8String(i).toString, sb)
            case kt => renderString(String.valueOf(keys.get(i, kt)), sb)
          }
          sb.append(": ")
          if (vals.isNullAt(i)) sb.append("null")
          else renderValue(vals.get(i, mt.valueType), mt.valueType, sb)
          i += 1
        }
        sb.append('}')
      case other =>
        renderString(String.valueOf(v), sb)
    }
  }

  /** Python-format a Java shortest-digits rendering ("1.5", "1.0E20"). */
  private def pyFromJavaRepr(java: String): String = {
    val d = java.toDouble
    if (d.isNaN || d.isInfinite) return PyJson.floatReprOf(d)
    // reuse PyJson's fixed/exponent cut-over on the float's own digits
    PyJson.reprFromDigits(java)
  }

  private def renderString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\t' => sb.append("\\t")
        case '\r' => sb.append("\\r")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 || c > 0x7e =>
          sb.append(String.format("\\u%04x", Integer.valueOf(c.toInt)))
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}

/** `graft_pyjson(value)` — json.dumps-parity rendering of any renderable
  * column (struct, array, map, scalar) in a single codegen'd pass.
  */
case class PyJsonRender(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    PyJsonRenderImpl.render(v, child.dataType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = PyJsonRenderImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val dtRef = ctx.addReferenceObj("pyjsonDt", child.dataType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.render($c, $dtRef);")
  }

  override def prettyName: String = "graft_pyjson"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
