package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** CPython-`json.dumps`-parity JSON rendering (reference `app.py:139,364`:
  * the stored `data` blob is `json.dumps(record)` with default options).
  *
  * Defaults reproduced (verified against recorded CPython output, see
  * PyJsonSpec):
  *   - separators `", "` / `": "`;
  *   - `ensure_ascii=True`: every non-ASCII code unit as `\uXXXX`
  *     (non-BMP as surrogate pairs — Jackson strings are UTF-16 already);
  *   - control-char short escapes `\n \t \r \b \f`, other <0x20 as `\u00XX`;
  *   - Python `repr` float form: shortest round-trip digits, fixed notation
  *     for 1e-4 <= |v| < 1e16, else `e±NN` (two-digit minimum, lowercase,
  *     explicit sign) — vs Java's `E` cut-over at 1e7/1e-3;
  *   - `-0.0`, `0.0` keep their sign; ints render without a decimal point;
  *   - dict insertion order preserved (Jackson keeps field order).
  *
  * One re-render pass over the already-canonical engine JSON — map-only,
  * applied at store time for byte-parity with the reference's blobs.
  */
object PyJson extends Serializable {

  private val mapper = new ObjectMapper()

  /** Re-render engine JSON as CPython json.dumps would. Invalid input is
    * returned unchanged (the store path never feeds invalid JSON; this is a
    * belt for direct library use).
    */
  def dumps(json: String): String = {
    if (json == null) return null
    try {
      val sb = new StringBuilder(json.length + 16)
      render(mapper.readTree(json), sb)
      sb.toString
    } catch { case _: Exception => json }
  }

  /** Per-thread double→repr cache: real corpora repeat values heavily
    * (quantities, rates, flags) and the shortest-digit search costs a few µs;
    * a small direct-mapped cache makes the common case a lookup. Keyed by
    * raw bits so -0.0/0.0 stay distinct.
    */
  private val floatCache = new ThreadLocal[java.util.HashMap[Long, String]] {
    override def initialValue() = new java.util.HashMap[Long, String](1 << 12)
  }

  /** Cached Python repr of a double (for the direct renderer). */
  private[functions] def floatReprOf(v: Double): String = pyFloatCached(v)

  /** Python-format an ALREADY-shortest Java digit rendering like "1.5",
    * "-1.0E20" (e.g. Float.toString output, whose digits are shortest at
    * single precision) — same fixed/exponent cut-over as repr, no re-search.
    */
  private[functions] def reprFromDigits(javaRepr: String): String = {
    val neg = javaRepr.startsWith("-")
    val s = if (neg) javaRepr.substring(1) else javaRepr
    val (mant, e) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val digitsRaw = mant.substring(0, dot) + mant.substring(dot + 1)
    val trimmedLeading = digitsRaw.dropWhile(_ == '0')
    val leadZeros = digitsRaw.length - trimmedLeading.length
    val digits0 = trimmedLeading.reverse.dropWhile(_ == '0').reverse
    val digits = if (digits0.isEmpty) "0" else digits0
    val exp10 = if (digits0.isEmpty) 1 else dot - leadZeros + e
    formatPy(neg, digits, exp10, zero = digits0.isEmpty)
  }

  private def pyFloatCached(v: Double): String = {
    val cache = floatCache.get()
    if (cache.size > (1 << 16)) cache.clear()
    val bits = java.lang.Double.doubleToRawLongBits(v)
    var s = cache.get(bits)
    if (s == null) { s = pyFloatRepr(v); cache.put(bits, s) }
    s
  }

  private def render(n: JsonNode, sb: StringBuilder): Unit = {
    if (n == null || n.isNull) { sb.append("null"); return }
    if (n.isBoolean) { sb.append(if (n.asBoolean()) "true" else "false"); return }
    if (n.isIntegralNumber) { sb.append(n.asText()); return }
    if (n.isNumber) { sb.append(pyFloatCached(n.doubleValue())); return }
    if (n.isTextual) { renderString(n.textValue(), sb); return }
    if (n.isArray) {
      sb.append('[')
      val it = n.elements().asScala
      var first = true
      it.foreach { e => if (!first) sb.append(", "); first = false; render(e, sb) }
      sb.append(']')
      return
    }
    if (n.isObject) {
      sb.append('{')
      val it = n.fields().asScala
      var first = true
      it.foreach { e =>
        if (!first) sb.append(", ")
        first = false
        renderString(e.getKey, sb)
        sb.append(": ")
        render(e.getValue, sb)
      }
      sb.append('}')
      return
    }
    sb.append(n.asText())
  }

  private def renderString(s: String, sb: StringBuilder): Unit = {
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
        case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Python `repr(float)`: shortest round-trip digits; fixed notation for
    * 1e-4 <= |v| < 1e16, exponent `e±NN` otherwise. Derived from Java's
    * shortest digits (JDK 19+ Double.toString is shortest-round-trip; on 17
    * it is shortest for practically all values our engines emit — the
    * PyJsonSpec ground-truth suite pins the observable cases).
    */
  private[functions] def pyFloatRepr(v: Double): String = {
    if (v.isNaN) return "NaN"           // json.dumps default allow_nan=True
    if (v.isPosInfinity) return "Infinity"
    if (v.isNegInfinity) return "-Infinity"
    val neg = (java.lang.Double.doubleToRawLongBits(v) < 0)
    val a = math.abs(v)
    if (a == 0.0) return formatPy(neg, "0", 1, zero = true)
    val (digits, exp10) = shortestDigits(a) // digits "d1d2..", value = 0.d1d2.. * 10^exp10
    formatPy(neg, digits, exp10, zero = false)
  }

  /** repr formatting from (sign, significant digits, decimal exponent) with
    * value = 0.digits × 10^exp10: fixed iff 1e-4 <= |v| < 1e16 (exp10 in
    * [-3, 16]), else `e±NN` with two-digit minimum and no '.0' on
    * single-digit mantissas.
    */
  private def formatPy(neg: Boolean, digits: String, exp10: Int, zero: Boolean): String = {
    val sign = if (neg) "-" else ""
    if (zero) return sign + "0.0"
    if (exp10 >= -3 && exp10 <= 16) {
      if (exp10 >= digits.length)
        sign + digits + "0" * (exp10 - digits.length) + ".0"
      else if (exp10 > 0)
        sign + digits.substring(0, exp10) + "." + digits.substring(exp10)
      else
        sign + "0." + "0" * (-exp10) + digits
    } else {
      val e = exp10 - 1 // scientific: d1.d2.. * 10^(exp10-1)
      // Python: repr(1e16) == '1e+16' — a single-digit mantissa has no '.0'
      val mant = if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (e < 0) "-" else "+"
      val ea = math.abs(e)
      sign + mant + "e" + es + (if (ea < 10) "0" + ea else ea.toString)
    }
  }

  /** (significant digits, decimal exponent) with value = 0.digits × 10^exp:
    * the SHORTEST correctly-rounded digit string that round-trips to the
    * double — Python repr's contract. Java 17's Double.toString is not
    * shortest (e.g. it prints 18 digits where 16 round-trip), so search
    * precision 1..17 over the exact binary value.
    */
  private def shortestDigits(a: Double): (String, Int) = {
    if (a == 0.0) return ("0", 1)
    val exact = new java.math.BigDecimal(a) // exact binary expansion
    var p = 1
    while (p <= 17) {
      val r = exact.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
        .stripTrailingZeros
      if (r.doubleValue() == a) {
        val digits = r.unscaledValue.abs.toString
        return (digits, digits.length - r.scale)
      }
      p += 1
    }
    val r = exact.round(new java.math.MathContext(17, java.math.RoundingMode.HALF_EVEN))
      .stripTrailingZeros
    val digits = r.unscaledValue.abs.toString
    (digits, digits.length - r.scale)
  }
}
