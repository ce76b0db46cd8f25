package graft

import java.nio.file.{Files, Path, Paths}

/** Deferred deletion of per-query scratch directories (temp corpora).
  *
  * The bench times `fn(spark, sfDir).count()`; anything a query closure does
  * inline — including deleting the multi-GB corpus it just wrote — lands in
  * the timed region. At sf10 `q_ingest_pipeline_bulk`'s corpus delete was
  * measurable against the write itself, and it is pure harness hygiene, not
  * engine work. Queries now `defer` their scratch dirs; the harness (Bench
  * between timed runs, Verify between queries) `drain`s them outside any
  * timer, and a JVM shutdown hook backstops contexts that never drain
  * (ScalaTest) so repeated runs don't leak disk.
  *
  * Draining is safe only after the query's result has been fully consumed
  * (count / parquet write) — both harness call sites sit after the action.
  */
object Scratch {
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[String]
  @volatile private var hooked = false

  /** Fresh scratch dir for WRITE-throughput-sensitive work (the write
    * canary). Honors `SPARK_GRAFT_SCRATCH` (else java.io.tmpdir) and warns
    * when the target filesystem is tmpfs: there `FileChannel.force(true)`
    * syncs to RAM, so a write canary silently measures memory bandwidth and
    * never senses disk sag — its calibration (~1.7-1.9 s clean at 32 cpus)
    * holds only for disk-backed scratch. The warning makes that visible on
    * hosts where /tmp is tmpfs instead of letting the gate read garbage.
    */
  def writeScratchDir(prefix: String): Path = {
    val root = sys.env.get("SPARK_GRAFT_SCRATCH").map(Paths.get(_))
    root.foreach(Files.createDirectories(_))
    val dir = root match {
      case Some(r) => Files.createTempDirectory(r, prefix)
      case None    => Files.createTempDirectory(prefix)
    }
    val fsType = scala.util.Try(Files.getFileStore(dir).`type`()).getOrElse("?")
    if (fsType == "tmpfs" || fsType == "ramfs")
      System.err.println(s"[scratch] WARNING: write scratch $dir is on " +
        s"$fsType — force(true) syncs to RAM, write-canary readings measure " +
        "memory bandwidth, not disk; set SPARK_GRAFT_SCRATCH to a " +
        "disk-backed path")
    dir
  }

  /** Register a scratch dir for deletion at the next [[drain]]. */
  def defer(dir: String): Unit = {
    pending.add(dir)
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => drain()))
        hooked = true
      }
    }
  }

  /** Delete every deferred dir. Untimed-region call sites only. */
  def drain(): Unit = {
    var d = pending.poll()
    while (d != null) { deleteTree(d); d = pending.poll() }
  }

  private def deleteTree(dir: String): Unit = scala.util.Try {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach((p: Path) => Files.deleteIfExists(p))
      finally walk.close() // the stream holds directory fds
    }
  }
}
