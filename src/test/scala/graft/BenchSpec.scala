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

  // --- isNoisy / keepBest: the r12 ADVICE Infinity-keep defect ---

  test("isNoisy treats non-finite triples as noisy (never keepable as clean)") {
    assert(Bench.isNoisy(Double.PositiveInfinity, Double.PositiveInfinity))
    assert(Bench.isNoisy(Double.NaN, 0.0))
    assert(Bench.isNoisy(0.5, Double.PositiveInfinity))
    assert(!Bench.isNoisy(0.5, 0.05)) // a genuinely clean row stays clean
    assert(Bench.isNoisy(0.5, 0.3))   // spread rule unchanged
  }

  test("a throwing retry (Inf,Inf) is never the kept row") {
    // Battery recorded a noisy-but-finite triple; BOTH retries throw and
    // return (Inf, Inf). Pre-fix, isNoisy(Inf,Inf)=false ended the retry
    // loop with clean=[(Inf,Inf)] and minBy kept Infinity — invalid JSON
    // downstream. The kept row must be the original finite triple.
    var calls = 0
    val inf = (Double.PositiveInfinity, Double.PositiveInfinity)
    val kept = Bench.keepBest((2.0, 1.5), () => { calls += 1; inf })
    assert(calls === 2) // Inf triples stay noisy, so both retries run
    assert(kept === ((2.0, 1.5)))
    assert(kept._1.isFinite && kept._2.isFinite)
  }

  test("keepBest prefers the lowest-median clean triple over noisy ones") {
    val reruns = Iterator((5.0, 4.0), (0.6, 0.05))
    val kept = Bench.keepBest((2.0, 1.5), () => reruns.next())
    assert(kept === ((0.6, 0.05)))
  }

  test("keepBest stops retrying once a clean triple lands") {
    var calls = 0
    val kept = Bench.keepBest((2.0, 1.5), () => { calls += 1; (1.0, 0.1) })
    assert(calls === 1 && kept === ((1.0, 0.1)))
  }

  // --- resolveFloorsPath: the r12 ADVICE silent-sf1-disarm defect ---

  test("resolveFloorsPath auto-resolves the per-sf floors files") {
    assert(Bench.resolveFloorsPath(None, "/root/testdata/sf0.1")
      === Right("BENCH_FLOORS.json"))
    assert(Bench.resolveFloorsPath(None, "/tmp/sf1")
      === Right("BENCH_FLOORS_SF1.json"))
    assert(Bench.resolveFloorsPath(None, "/tmp/sf3")
      === Right("BENCH_FLOORS_SF3.json"))
    assert(Bench.resolveFloorsPath(None, "/tmp/sf10")
      === Right("BENCH_FLOORS_SF10.json"))
  }

  test("resolveFloorsPath: env override wins; unmapped scale is Left (warn)") {
    assert(Bench.resolveFloorsPath(Some("custom.json"), "/tmp/sf1")
      === Right("custom.json"))
    assert(Bench.resolveFloorsPath(None, "/tmp/sf30") === Left("sf30"))
  }

  test("keep gate refuses stale/unstamped floors (tools/test_keep_gate.py)") {
    // The python side of the floors contract (fingerprint verify + fail
    // closed) has its own self-test; running it here keeps the refusal
    // proof under `sbt test` instead of relying on someone remembering it.
    val script = java.nio.file.Paths.get("tools/test_keep_gate.py")
    assume(java.nio.file.Files.exists(script)) // repo-root working dir
    val rc = new ProcessBuilder("python3", script.toString)
      .inheritIO().start().waitFor()
    assert(rc == 0, "keep-gate self-test reported failures")
  }
}
