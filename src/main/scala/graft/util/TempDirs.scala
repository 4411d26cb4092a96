package graft.util

import java.nio.file.{Files, Path}

/** Process-scoped scratch directories for queries that stage through
  * the local filesystem (n18's index table, the t-family's stage/log
  * dirs, s3's jsonl fixture). `Files.createTempDirectory` alone leaks:
  * every bench/verify run left a full encoded-index copy plus parquet
  * staging in tmpdir (ADVICE round 10). Each scratch dir is registered
  * here and recursively deleted by ONE JVM shutdown hook — the same
  * bounded-footprint discipline as the fingerprint-keyed sidecar
  * files, which are small and deliberately persistent and therefore
  * NOT routed through this.
  */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread("graft-tempdir-cleanup") {
      override def run(): Unit = {
        registered.forEach { p =>
          try deleteRecursively(p)
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    })

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** A fresh temp directory deleted (recursively) at JVM exit. */
  def scratch(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
