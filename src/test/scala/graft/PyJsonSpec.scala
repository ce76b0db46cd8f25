package graft

import graft.functions.PyJson
import org.scalatest.funsuite.AnyFunSuite

/** PyJson.dumps vs recorded CPython `json.dumps` output (ground truth
  * captured by running CPython 3.11 on these exact values).
  */
class PyJsonSpec extends AnyFunSuite {

  private val floatCases = Seq(
    "0.1" -> "0.1",
    "1.0" -> "1.0",
    "1.5" -> "1.5",
    "1.0E7" -> "10000000.0",
    "1.2345678E10" -> "12345678000.0",
    "1.0E16" -> "1e+16",
    "1.0E-4" -> "0.0001",
    "1.0E-5" -> "1e-05",
    "-2.5E-7" -> "-2.5e-07",
    "3.14159" -> "3.14159",
    "1.0E100" -> "1e+100",
    "1.23456789123E8" -> "123456789.123",
    "0.0" -> "0.0",
    "-0.0" -> "-0.0"
  )

  test("float repr matches CPython for fixed/exponent cut-overs") {
    floatCases.foreach { case (in, expect) =>
      assert(PyJson.dumps(in) == expect, s"input $in")
    }
  }

  test("ints, booleans, null") {
    assert(PyJson.dumps("7") == "7")
    assert(PyJson.dumps("-42") == "-42")
    assert(PyJson.dumps("true") == "true")
    assert(PyJson.dumps("false") == "false")
    assert(PyJson.dumps("null") == "null")
  }

  test("ensure_ascii string escaping") {
    assert(PyJson.dumps("\"plain\"") == "\"plain\"")
    assert(PyJson.dumps(""""quote\"back\\slash"""") == """"quote\"back\\slash"""")
    assert(PyJson.dumps("\"tab\\tnew\\nline\"") == "\"tab\\tnew\\nline\"")
    // café ünïcode 你好
    assert(PyJson.dumps("\"caf\u00e9 \u00fcn\u00efcode \u4f60\u597d\"") ==
      "\"caf\\u00e9 \\u00fcn\\u00efcode \\u4f60\\u597d\"")
    // control chars arrive JSON-escaped (Spark's to_json escapes them)
    assert(PyJson.dumps("\"\\u0001ctl\"") == "\"\\u0001ctl\"")
  }

  test("float repr matches CPython on 3000 random bit-pattern doubles") {
    val in = getClass.getResourceAsStream("/pyjson_floats.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    var checked = 0
    lines.foreach { line =>
      val Array(hex, expect) = line.split("\t")
      val bits = java.lang.Long.reverseBytes(java.lang.Long.parseUnsignedLong(hex, 16))
      val v = java.lang.Double.longBitsToDouble(bits)
      // feed through the engine-side rendering (Double.toString) as the
      // store path does; skip values Java renders lossily (none expected)
      if (java.lang.Double.parseDouble(java.lang.Double.toString(v)) == v) {
        assert(PyJson.dumps(java.lang.Double.toString(v)) == expect, s"double $v (0x$hex)")
        checked += 1
      }
    }
    assert(checked > 2900)
  }

  test("golden replay: re-rendering the reference's own stored blobs is byte-identical") {
    // 50 record blobs + 2 schema rows lifted from the reference's shipped
    // etl_data.db (each produced by CPython json.dumps): parse -> re-render
    // must be the identity, proving format parity on real corpus data.
    val in = getClass.getResourceAsStream("/reference_blobs.jsonl")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size >= 50)
    lines.zipWithIndex.foreach { case (blob, i) =>
      assert(PyJson.dumps(blob) == blob, s"blob $i diverged")
    }
  }

  test("dict/list separators and order match json.dumps defaults") {
    assert(PyJson.dumps("""{"a":1,"b":[1.5,null,"x"],"c":{"d":true}}""") ==
      """{"a": 1, "b": [1.5, null, "x"], "c": {"d": true}}""")
  }
}
