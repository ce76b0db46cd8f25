package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's floors-file parser: the floor guard is only as
  * good as its ability to READ the floors, and a silent parse miss disables
  * the guard (the r11 contamination shape would then be kept unflagged).
  */
class BenchSpec extends AnyFunSuite {

  test("parseFloors reads the compact json.dump(separators) form") {
    val m = Bench.parseFloors("""{"q_a":[0.5,0.7],"q_b":[1.25e-1,2.0]}""")
    assert(m === Map("q_a" -> (0.5, 0.7), "q_b" -> (0.125, 2.0)))
  }

  test("parseFloors reads a pretty-printed / hand-edited file") {
    val m = Bench.parseFloors(
      """|{
         |  "q_join_semi": [ 0.197 , 0.25 ],
         |  "q_join_anti":[0.2,
         |    0.31]
         |}""".stripMargin)
    assert(m === Map("q_join_semi" -> (0.197, 0.25), "q_join_anti" -> (0.2, 0.31)))
  }

  test("parseFloors yields empty on junk (caller warns that the guard is off)") {
    assert(Bench.parseFloors("not json at all").isEmpty)
    assert(Bench.parseFloors("").isEmpty)
  }

  test("parseFloors on the repo's checked-in floors file is non-empty") {
    val p = java.nio.file.Paths.get("BENCH_FLOORS.json")
    assume(java.nio.file.Files.exists(p))
    val m = Bench.parseFloors(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    assert(m.nonEmpty)
    assert(m.values.forall { case (f, t) => f > 0 && t >= f * 0.5 })
  }
}
