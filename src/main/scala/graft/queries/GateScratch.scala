package graft.queries

import java.nio.file.{Files, Path}

/** Scratch-directory factory for gates that need a throwaway warehouse
  * (index builds, merge/IVM/OCC gates, codec round-trips).
  *
  * Every directory handed out here is registered for recursive deletion
  * in ONE JVM shutdown hook — repeated bench/verify runs previously
  * accumulated unbounded `/tmp` warehouses (each holding a full copy of
  * its gate's tables), because `Files.createTempDirectory` alone cleans
  * nothing. Deletion at JVM exit (not at gate end) is deliberate: a
  * gate returns a LAZY DataFrame over its scratch tables, and the bench
  * harness may re-run it from the cached plan after the gate function
  * returned.
  */
object GateScratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val it = created.iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }, "graft-gate-scratch-cleanup"))

  /** A fresh temp directory that dies with the JVM. */
  def dir(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Exception => () } // best effort: exit must not fail
}
