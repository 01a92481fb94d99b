package graft.sources.kvconnector

import java.util

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder => VSortOrder, Expression => VExpression}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.util.SerializableConfiguration

import graft.GraftFs

/** The WRITE half of the graft-kv connector:
  * `df.write.format("graft-kv").mode("append"|"overwrite").save(dir)`.
  *
  * The write DECLARES its layout needs through DSv2's
  * `RequiresDistributionAndOrdering` — range-distributed by `k`, sorted
  * (k, c) within partitions — so SPARK plans the exchange+sort that makes
  * every task emit one key-range, (k,c)-sorted segment: exactly the
  * MergeTree-part layout KVSegmentStore.write produces imperatively, but
  * negotiated through the connector contract (any engine-side smarts —
  * AQE partition sizing, reuse of an existing ordering — apply for free).
  * Each task writes its parquet segment and reports (file, key-lo,
  * key-hi, rows) in its commit message; the driver's commit() assembles
  * the manifest FROM the messages — no second scan of the data, and a
  * failed/speculative task's file never reaches the manifest (readers go
  * through the manifest, so uncommitted files are invisible; abort()
  * additionally deletes them). Overwrite = SupportsTruncate: the commit
  * sweeps previously-manifested segments after the new manifest lands.
  */
class KVWriteBuilder(path: String, info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {
  require(info.schema().fieldNames.sameElements(Array("k", "c", "v")),
    s"graft-kv write requires (k, c, v) binary columns, got ${info.schema().sql}")
  // .option("segments", n): exact segment count; default 0 lets Spark
  // (incl. AQE coalescing) size the range shuffle
  private val segments = info.options().getInt("segments", 0)
  // .option("layout", "zorder"): the MergeTree multi-column ORDER BY
  // analogue (ref QueryHelper.java:57 ORDER BY (k,c)) laid out along the
  // Morton curve of (k, c) instead of lexicographically — see KVZOrder
  private val layout = Option(info.options().get("layout")).getOrElse("linear")
  require(layout == "linear" || layout == "zorder",
    s"graft-kv layout must be linear|zorder, got $layout")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write =
    new KVWrite(path, doTruncate, segments, layout, info.queryId())
}

class KVWrite(path: String, truncate: Boolean, segments: Int, layout: String,
              queryId: String)
  extends Write with RequiresDistributionAndOrdering {

  private def asc(col: String): VSortOrder = new VSortOrder {
    override def expression(): VExpression = Expressions.column(col)
    override def direction(): SortDirection = SortDirection.ASCENDING
    override def nullOrdering(): NullOrdering = NullOrdering.NULLS_FIRST
    override def describe(): String = s"$col ASC"
  }

  // linear: range-distributed by k — every task emits one key-range
  // segment. zorder: the DSv2 contract cannot spell a Morton expression
  // over two binary columns (no function catalog on a path-based
  // table), so the write ACCEPTS the caller's DISTRIBUTION (KVZOrder
  // .write pre-partitions by z) — segment bounds recorded at write time
  // make pruning correct for ANY arrangement; layout only changes how
  // TIGHT the rectangles are. The intra-segment ORDERING is (k, c) for
  // BOTH layouts (r10 verdict #6): which rows share a segment is the
  // curve's business, the order inside is the reader's — (k, c)-sorted
  // runs let every layout serve the TopN read-in-order push, so the
  // layout that prunes best no longer pays a full sort for ordered
  // reads (the ClickHouse optimize_read_in_order analog on MergeTree
  // parts, whose rows are likewise ORDER BY-sorted per part regardless
  // of the partition expression).
  override def requiredDistribution(): Distribution =
    if (layout == "zorder") Distributions.unspecified()
    else Distributions.ordered(Array(asc("k")))
  override def requiredOrdering(): Array[VSortOrder] = Array(asc("k"), asc("c"))
  override def requiredNumPartitions(): Int =
    if (layout == "zorder") 0 else segments

  override def toBatch: BatchWrite = new KVBatchWrite(path, truncate, layout, queryId)
}

case class KVCommit(file: String, loHex: String, hiHex: String, rows: Long,
                    cLoHex: String = "", cHiHex: String = "")
  extends WriterCommitMessage

class KVBatchWrite(path: String, truncate: Boolean, layout: String,
                   queryId: String)
  extends BatchWrite {

  // captured on the DRIVER at write-plan time: the session's Hadoop conf
  // carries the warehouse scheme's credentials/impl (s3a, hdfs) and ships
  // to executors inside the writer factory
  private val confW = new SerializableConfiguration(KVSegmentStore.activeConf)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    KVWriterFactory(path, queryId, confW)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = confW.value
    GraftFs.mkdirs(conf, path)
    val manifest = GraftFs.child(path, KVSegmentStore.ManifestFile)
    // previous manifest lines: under append they are KEPT (append adds
    // segments, it must never orphan committed ones); under truncate they
    // name the segments to sweep once the new manifest is live
    val previous: Seq[String] = GraftFs.readText(conf, manifest)
      .map(_.split('\n').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    val fresh = messages.collect { case m: KVCommit if m.rows > 0 => m }
    val freshLines =
      fresh.map(m => s"${m.file}\t${m.loHex}\t${m.hiHex}\t${m.rows}\t${m.cLoHex}\t${m.cHiHex}")
    val lines = (if (truncate) freshLines.toSeq else previous ++ freshLines).sorted
    // layout marker BEFORE the manifest. Since r11 both layouts write
    // (k, c)-sorted segments and declare it via the marker's own
    // `order=kc` attribute (readSortedKC), so every reader behavior is
    // CORRECT under either marker state of THIS writer — and a store
    // persisted by the pre-r11 zorder writer (marker without the
    // attribute, Morton-ordered rows inside) declines the TopN push
    // instead of serving wrong prefixes. The write order is kept so
    // the marker can never describe segments that aren't live yet, and
    // the linear-truncate delete stays AFTER the manifest, mirrored.
    val layoutFile = GraftFs.child(path, KVSegmentStore.LayoutFile)
    if (layout == "zorder")
      // `order=kc` declares the intra-segment (k, c) sort this writer
      // guarantees; a marker WITHOUT it (a store persisted by the
      // pre-r11 writer, whose segments followed the Morton curve
      // inside) makes the read side decline the TopN push
      GraftFs.writeTextAtomic(conf, layoutFile, "zorder\norder=kc")
    else if (GraftFs.readText(conf, layoutFile)
        .exists(_.linesIterator.nextOption().exists(_.trim == "bucket")))
      // a LINEAR commit into a hash-bucketed store breaks the bucket
      // invariant (an appended file has no __b= directory, and its rows
      // follow no bucket function): DEMOTE the marker before the
      // manifest changes, so no reader ever plans bucket partitions
      // over a non-bucket segment — the store degrades to linear
      // pruning, which every segment satisfies, and stays (k, c)-sorted
      // inside (no marker = linear = order-kc), so the TopN push
      // survives. SPJ reporting is lost by design: the layout no
      // longer holds. (Unlike the zorder marker — which only claims
      // pruning tightness and is safe to reconcile after the manifest —
      // the bucket marker is load-bearing for partition planning, so
      // it must fall FIRST in both append and truncate.)
      GraftFs.delete(conf, layoutFile)
    // atomic replacement: stage the full manifest next to the live one,
    // then overwrite-rename it into place — a crash mid-write leaves the
    // old manifest intact and a concurrent reader sees either the old or
    // the new list, never a prefix (same discipline as KVDeltaStore.compact)
    GraftFs.writeTextAtomic(conf, manifest, lines.mkString("\n"))
    // SINGLE-WRITER assumption (matches the reference's lease semantics,
    // ClickhouseStoreManager's store-level locking): two concurrent
    // TRUNCATING writers racing here can interleave so a linear writer's
    // marker delete lands after a zorder writer's marker write, leaving a
    // live Morton manifest without its marker. Concurrent writers already
    // corrupt each other's truncate sweep below (each deletes the other's
    // fresh segments), so the marker adds no NEW hazard — but the ordering
    // guarantee documented above holds for one committing writer at a time.
    if (layout != "zorder" && truncate)
      GraftFs.delete(conf, layoutFile)
    if (truncate) {
      // old segments left the manifest atomically with the rename above;
      // sweeping their files (and bloom sidecars) afterwards is
      // invisible to manifest readers
      val freshNames = fresh.map(_.file).toSet
      previous.map(_.split('\t')(0)).filterNot(freshNames.contains)
        .foreach { f =>
          val full = GraftFs.child(path, f)
          GraftFs.delete(conf, full)
          // the sidecar sits BESIDE its file (readBloom's derivation):
          // a bucketed manifest name is "__b=N/<file>", whose sidecar
          // is path/__b=N/_graft_bloom/<file> — deriving from the
          // manifest name put it under path/_graft_bloom/__b=N/<file>,
          // a path that never existed, orphaning every bucketed
          // sidecar on truncate (r12 second review)
          val base = full.split('/').last
          val dir = full.stripSuffix("/" + base)
          GraftFs.delete(conf,
            GraftFs.child(GraftFs.child(dir, KVSegmentStore.BloomDir), base))
        }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: KVCommit =>
        GraftFs.delete(confW.value, GraftFs.child(path, m.file))
        // a committed TASK already wrote its bloom sidecar; a job-level
        // abort must sweep it too or failed writes leak sidecars
        GraftFs.delete(confW.value,
          GraftFs.child(GraftFs.child(path, KVSegmentStore.BloomDir), m.file))
      case _ => ()
    }
}

case class KVWriterFactory(path: String, queryId: String,
                           confW: SerializableConfiguration)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KVSegmentWriter(path, partitionId, taskId, queryId, confW)
}

/** One task = one (k,c)-sorted key-range parquet segment, bounds tracked
  * inline during the write (no re-read). */
class KVSegmentWriter(path: String, partitionId: Int, taskId: Long,
                      queryId: String, confW: SerializableConfiguration)
  extends DataWriter[InternalRow] {

  // (partitionId, taskId) is unique only within one Spark application;
  // the per-write queryId keeps appends from a LATER application from
  // colliding with (and clobbering) a committed segment
  private val fileName = f"part-$partitionId%05d-$taskId-$queryId.parquet"
  private val schema = MessageTypeParser.parseMessageType(
    "message graft_kv { required binary k; required binary c; required binary v; }")
  private val factory = new SimpleGroupFactory(schema)
  private val writer = {
    GraftFs.mkdirs(confW.value, path)
    ExampleParquetWriter.builder(new Path(path, fileName))
      .withConf(confW.value).withType(schema).build()
  }
  private var lo: Array[Byte] = _
  private var hi: Array[Byte] = _
  private var cLo: Array[Byte] = _
  private var cHi: Array[Byte] = _
  private var rows = 0L
  // the segment's KEY Bloom skip index, built inline during the write
  // (no re-read — the imperative KVSegmentStore.write path pays one
  // read-back aggregate instead)
  private val bloomBits =
    new Array[Long](graft.operators.KeyBloom.DefaultBits / 64)

  override def write(row: InternalRow): Unit = {
    val k = row.getBinary(0)
    val c = row.getBinary(1)
    if (lo == null || util.Arrays.compareUnsigned(k, lo) < 0) lo = k.clone()
    if (hi == null || util.Arrays.compareUnsigned(k, hi) > 0) hi = k.clone()
    if (cLo == null || util.Arrays.compareUnsigned(c, cLo) < 0) cLo = c.clone()
    if (cHi == null || util.Arrays.compareUnsigned(c, cHi) > 0) cHi = c.clone()
    graft.operators.KeyBloom.add(bloomBits,
      graft.operators.KeyBloom.DefaultHashes, k)
    val g = factory.newGroup()
    g.append("k", Binary.fromConstantByteArray(k))
    g.append("c", Binary.fromConstantByteArray(c))
    g.append("v", Binary.fromConstantByteArray(row.getBinary(2)))
    writer.write(g)
    rows += 1
  }

  private def bloomPath: String =
    GraftFs.child(GraftFs.child(path, KVSegmentStore.BloomDir), fileName)

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (rows == 0) { // empty partition: no segment, nothing to manifest
      GraftFs.delete(confW.value, GraftFs.child(path, fileName))
      KVCommit(fileName, "", "", 0L)
    } else {
      // sidecar lands with the task; readers only consult it for
      // segments the manifest names, so an aborted task's sidecar is
      // invisible (and swept by abort())
      GraftFs.writeTextAtomic(confW.value, bloomPath,
        KVSegmentStore.hex(graft.operators.KeyBloom.serialize(bloomBits,
          graft.operators.KeyBloom.DefaultHashes)))
      KVCommit(fileName, KVSegmentStore.hex(lo), KVSegmentStore.hex(hi), rows,
        KVSegmentStore.hex(cLo), KVSegmentStore.hex(cHi))
    }
  }

  override def abort(): Unit = {
    writer.close()
    GraftFs.delete(confW.value, GraftFs.child(path, fileName))
    GraftFs.delete(confW.value, bloomPath)
  }

  override def close(): Unit = ()
}
