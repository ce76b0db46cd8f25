package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the deferred scratch-dir registry: deletion happens at
  * drain (the harness's untimed region), recursively, idempotently, and
  * never throws on missing or double-deferred dirs.
  */
class ScratchSpec extends AnyFunSuite {

  test("defer + drain deletes the tree recursively; dir survives until drain") {
    val dir = Files.createTempDirectory("scratch_spec_")
    val sub = Files.createDirectories(dir.resolve("a/b"))
    Files.writeString(sub.resolve("f.txt"), "x")
    Scratch.defer(dir.toString)
    assert(Files.exists(dir), "defer must not delete eagerly")
    Scratch.drain()
    assert(!Files.exists(dir), "drain must delete the whole tree")
  }

  test("drain is idempotent and tolerates missing / double-deferred dirs") {
    Scratch.drain() // empty queue: no-op
    val dir = Files.createTempDirectory("scratch_spec_")
    Scratch.defer(dir.toString)
    Scratch.defer(dir.toString)                    // double defer
    Scratch.defer(dir.resolve("never_made").toString) // missing path
    Scratch.drain()
    assert(!Files.exists(dir))
    Scratch.drain() // drained queue: no-op
    assert(!Files.exists(Paths.get(dir.toString)))
  }
}
