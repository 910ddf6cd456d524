package graft

/** Per-process scratch space for queries that round-trip through the
  * filesystem (csv/orc/concat-json exports). One root per JVM keeps
  * concurrent sessions isolated (a fixed shared path let one session's
  * overwrite race another's read-back); overwrite-mode writes keep it
  * bounded within the process, and a shutdown hook removes the root so
  * repeated runs don't accumulate in /tmp.
  */
object ScratchDir {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft-scratch-${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p)))
    p
  }

  /** A stable per-process path for the named scratch area. */
  def path(name: String): String = root.resolve(name).toString

  private def delete(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach(delete) }
      finally s.close()
    }
    try java.nio.file.Files.deleteIfExists(p)
    catch { case _: java.io.IOException => () } // best effort
  }
}
