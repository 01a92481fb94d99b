package graft

import java.nio.file.{Files, Path}

/** JVM-local snapshot directories for the scenario-driven driver
  * entries (the `*_inc` maintained surfaces and the kv store
  * scenarios): each entry keeps ONE live temp dir between invocations
  * (Bench REPS>1 and Verify re-run entries in the same JVM), sweeping
  * the previous run's dir on entry. This helper is that
  * sweep-and-recreate in one place — 18 inline copies of the
  * walk-and-delete block predate it — plus a shutdown hook so the
  * FINAL dir of each entry no longer outlives the JVM. */
object ScenarioDirs {

  private val live = scala.collection.mutable.Set.empty[Path]

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      live.toSeq.foreach(d => try delete(d) catch { case _: Throwable => () })))
  }

  /** Depth-first recursive delete (children before parents). */
  def delete(dir: Path): Unit = {
    val walk = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    } finally walk.close()
  }

  /** Sweep `prev` (if any) and hand out a fresh temp dir under `tag`. */
  def fresh(tag: String, prev: Option[Path]): Path = synchronized {
    prev.foreach { d => delete(d); live -= d }
    val p = Files.createTempDirectory(tag)
    live += p
    p
  }
}
