package graft

import java.io.IOException
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Hadoop-FileSystem coordination shared by the incremental sinks
  * (RollupSink, TopKSink, GraphSink, RankSink, CusumSink,
  * ActiveUsersSink), the kv streaming sink, and the kv DSv2 connector's
  * manifest IO.
  *
  * All snapshot/manifest coordination resolves the warehouse path's OWN
  * FileSystem — HDFS, S3A, or local — exactly like the parquet data the
  * sinks write next to it; `java.nio` (the pre-r7 implementation) would
  * silently see an empty directory on any non-local scheme, so every
  * "incrementally maintained" claim only held on a single machine.
  * Pattern follows KVDeltaStore/KVStoreManager, which already speak
  * hadoop.fs.
  *
  * Single-writer discipline (one streaming query owns a sink directory —
  * Structured Streaming's own guarantee) is assumed, as before: the
  * atomic piece is `_SUCCESS`-gated snapshot visibility plus
  * FileContext's overwrite-rename for small marker files (atomic on
  * HDFS and posix; best-effort copy-replace on stores without rename).
  */
object GraftFs {

  def fs(dir: String, conf: Configuration): FileSystem =
    new Path(dir).getFileSystem(conf)

  /** Child path under `dir`, scheme-preserving (Paths.get mangles
    * `scheme://` prefixes). */
  def child(dir: String, name: String): String = new Path(dir, name).toString

  def exists(conf: Configuration, p: String): Boolean = {
    val path = new Path(p)
    path.getFileSystem(conf).exists(path)
  }

  /** Is `dirPath` a `_SUCCESS`-complete snapshot directory? */
  def complete(conf: Configuration, dirPath: String): Boolean =
    exists(conf, child(dirPath, "_SUCCESS"))

  /** Complete (`_SUCCESS`-marked) versioned children `prefix<id>` of
    * `dir` with id <= upTo, version-ascending, as (id, absolute path). */
  def versioned(conf: Configuration, dir: String, prefix: String,
                upTo: Long): Seq[(Long, String)] = {
    val d = new Path(dir)
    val f = d.getFileSystem(conf)
    if (!f.exists(d)) return Nil
    f.listStatus(d).iterator
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .flatMap(p => p.getName.stripPrefix(prefix).toLongOption.map(v => (v, p)))
      .filter { case (v, p) => v <= upTo && f.exists(new Path(p, "_SUCCESS")) }
      .toSeq.sortBy(_._1)
      .map { case (v, p) => (v, p.toString) }
  }

  /** Latest complete snapshot `prefix<id>` with id strictly below
    * `beforeId` (callers pass their own batchId to fold onto lineage,
    * Long.MaxValue to read). */
  def latest(conf: Configuration, dir: String, prefix: String,
             beforeId: Long): Option[String] =
    versioned(conf, dir, prefix, beforeId - 1).lastOption.map(_._2)

  /** Read a small text file. If `p` is absent but the non-atomic
    * replace's `.<name>.old` backup survives (a crash landed between
    * moving the old file aside and swinging the new one in —
    * [[writeTextAtomic]]'s fallback window), the backup's CONTENT is
    * served, so kv-manifest recovery is automatic instead of manual.
    * Deliberately read-only: renaming the backup back from the READ
    * path would race a concurrent fallback-scheme writer mid-replace
    * (its rename(tmp, path) would find the destination re-occupied and
    * its own bak already consumed — a previously-succeeding write
    * would fail). The next writeTextAtomic replaces the file and drops
    * the backup anyway. */
  def readText(conf: Configuration, p: String): Option[String] = {
    val path = new Path(p)
    val f = path.getFileSystem(conf)
    val target =
      if (f.exists(path)) Some(path)
      else {
        val bak = new Path(path.getParent, s".${path.getName}.old")
        if (f.exists(bak)) {
          System.err.println(
            s"GraftFs: $path missing but backup $bak exists " +
              "(crash mid-replace); serving the backup's content")
          Some(bak)
        } else None
      }
    target.map { t =>
      val in = f.open(t)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    }
  }

  /** Write a small text file and move it into place with FileContext's
    * overwrite-rename — atomic on HDFS/posix, so a concurrent reader
    * sees either the old or the new content, never a torn file. */
  def writeTextAtomic(conf: Configuration, p: String, content: String): Unit = {
    val path = new Path(p)
    val f = path.getFileSystem(conf)
    val parent = path.getParent
    f.mkdirs(parent)
    val tmp = new Path(parent, s".${path.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    try {
      val fc = FileContext.getFileContext(path.toUri, conf)
      fc.rename(tmp, path, Options.Rename.OVERWRITE)
    } catch { case e: IOException =>
      // schemes without a FileContext binding or an atomic rename
      // (object stores, custom FS impls): non-atomic replace, but keep
      // the previous content recoverable — move it ASIDE (never delete
      // first), swing the new file in, then drop the backup. A crash in
      // the window leaves `.<name>.old` on disk instead of nothing,
      // which for the kv manifest means every committed segment stays
      // reachable by restoring the backup.
      System.err.println(
        s"GraftFs: atomic rename unavailable for $path " +
          s"(${e.getMessage}); using backup-then-rename replace")
      val bak = new Path(parent, s".${path.getName}.old")
      f.delete(bak, false)
      val hadOld = f.exists(path)
      if (hadOld && !f.rename(path, bak))
        throw new IOException(s"moving $path aside to $bak failed", e)
      if (!f.rename(tmp, path)) {
        if (hadOld && !f.rename(bak, path)) // restore; best effort
          System.err.println(s"GraftFs: restore of $bak to $path failed " +
            "after replace failure; readText serves the backup")
        throw new IOException(s"replacing $path via $tmp failed", e)
      }
      if (hadOld) f.delete(bak, false)
    }
  }

  def delete(conf: Configuration, p: String): Unit = {
    val path = new Path(p)
    path.getFileSystem(conf).delete(path, true): Unit
  }

  def mkdirs(conf: Configuration, p: String): Unit = {
    val path = new Path(p)
    path.getFileSystem(conf).mkdirs(path): Unit
  }
}
