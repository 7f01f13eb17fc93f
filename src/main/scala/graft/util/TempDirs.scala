package graft.util

import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Tracked temp working directories for the gate's streaming twins (input
  * staging + checkpoints). Two leak paths this closes (round-9 ADVICE):
  * repeated bench iterations inside ONE JVM accumulate full corpus copies
  * in /tmp (fixed by [[deleteNow]] once the stream has terminated and the
  * result no longer reads the staged files), and dirs from queries whose
  * results DO stay file-backed until the caller materializes them are
  * reaped by a JVM shutdown hook instead of never. */
object TempDirs {
  private val tracked = mutable.LinkedHashSet.empty[Path]
  @volatile private var hooked = false

  /** Create a tracked temp dir; guaranteed deleted at JVM exit. */
  def create(tag: String): Path = synchronized {
    if (!hooked) {
      hooked = true
      Runtime.getRuntime.addShutdownHook(new Thread(() => sweep()))
    }
    val p = Files.createTempDirectory(Scratch.base, tag)
    tracked += p
    p
  }

  /** Eagerly delete a tracked dir — call once nothing lazy can still read
    * it (stream terminated, result plan reads only memory/original
    * tables). Safe to call twice. */
  def deleteNow(p: Path): Unit = synchronized {
    tracked -= p
    rm(p)
  }

  private def sweep(): Unit = synchronized {
    tracked.foreach(rm)
    tracked.clear()
  }

  private def rm(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      }
    } catch { case _: Throwable => () }
}
