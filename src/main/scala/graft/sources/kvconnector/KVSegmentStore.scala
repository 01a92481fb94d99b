package graft.sources.kvconnector

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

import graft.GraftFs

/** Segment layout for the graft-kv connector: the KV `(k, c, v)` table
  * persisted as key-range parquet segments plus a manifest of per-segment
  * key bounds — the Spark analogue of a MergeTree part directory, where
  * each part knows its primary-key range and a point/slice read opens
  * only the parts whose range can match.
  *
  * The manifest is driver-sized metadata (one line per segment, like a
  * parts list), NOT data: reads of it never scale with rows. Segment
  * bounds are computed from the written files themselves — whatever the
  * range partitioner sampled, the manifest states what each file actually
  * holds, so pruning is correct by construction.
  */
object KVSegmentStore {
  val ManifestFile = "_graft_manifest.txt"
  val BloomDir = "_graft_bloom"
  val LayoutFile = "_graft_layout"

  /** Per-segment bounds. `cLo`/`cHi` (qualifier zone map, the MergeTree
    * minmax-index analog for the SPI's column-slice predicates) are null
    * on manifests written before the field existed — null prunes
    * nothing, so old stores stay readable. */
  final case class Segment(file: String, lo: Array[Byte], hi: Array[Byte], rows: Long,
                           cLo: Array[Byte] = null, cHi: Array[Byte] = null)

  def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Range-partition `store` into `numSegments` parquet segments sorted by
    * (k, c) within each, and write the key-bounds manifest plus one
    * `_graft_bloom/<segment>` KEY Bloom sidecar per segment (the
    * bloom_filter skip index — see graft.operators.KeyBloom): bounds,
    * counts, zone maps AND blooms all come from ONE read-back aggregate
    * pass over the written files. Sidecars are segment-sized metadata
    * (16 KB each), never manifest lines — a million-segment parts list
    * stays a parts list. */
  def write(store: DataFrame, path: String, numSegments: Int): Unit = {
    store.repartitionByRange(numSegments, F.col("k"))
      .sortWithinPartitions("k", "c")
      .write.mode("overwrite").parquet(path)
    val bounds = store.sparkSession.read.parquet(path)
      .groupBy(F.input_file_name().as("f"))
      .agg(F.min("k").as("lo"), F.max("k").as("hi"), F.count(F.lit(1)).as("n"),
        F.min("c").as("clo"), F.max("c").as("chi"),
        graft.operators.KeyBloom.agg(F.col("k")).as("bloom"))
      .collect()
    val conf = store.sparkSession.sparkContext.hadoopConfiguration
    val lines = bounds.map { r =>
      val name = r.getString(0).split('/').last
      GraftFs.writeTextAtomic(conf,
        GraftFs.child(GraftFs.child(path, BloomDir), name),
        hex(r.getAs[Array[Byte]](6)))
      s"$name\t${hex(r.getAs[Array[Byte]](1))}\t${hex(r.getAs[Array[Byte]](2))}\t${r.getLong(3)}" +
        s"\t${hex(r.getAs[Array[Byte]](4))}\t${hex(r.getAs[Array[Byte]](5))}"
    }.sorted
    GraftFs.writeTextAtomic(conf,
      GraftFs.child(path, ManifestFile), lines.mkString("\n"))
  }

  /** The segment's key Bloom, if its sidecar exists (absent on stores
    * written before the index — absent prunes nothing). */
  def readBloom(segFile: String): Option[(Array[Long], Int)] = {
    val name = segFile.split('/').last
    val dir = segFile.stripSuffix("/" + name)
    GraftFs.readText(activeConf,
        GraftFs.child(GraftFs.child(dir, BloomDir), name))
      .map(t => graft.operators.KeyBloom.deserialize(unhex(t.trim)))
  }

  /** Driver-side manifest reads resolve the warehouse path's FileSystem
    * through the active session's Hadoop conf (scan planning always runs
    * with one); bare Configuration() covers non-Spark callers. */
  private[kvconnector] def activeConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** The store's declared layout: "zorder" when the marker exists,
    * "linear" otherwise (legacy stores have no marker — linear was the
    * only layout before it existed). Only the FIRST marker line is the
    * layout name; later lines carry layout attributes (see
    * [[readSortedKC]]). */
  def readLayout(path: String): String =
    GraftFs.readText(activeConf, GraftFs.child(path, LayoutFile))
      // an empty-but-present marker degrades to linear, like no marker
      // (r11 advice #2: linesIterator on "" is empty — next() would throw)
      .flatMap(_.linesIterator.nextOption()).map(_.trim)
      .filter(_.nonEmpty).getOrElse("linear")

  /** Whether rows inside every segment are (k, c)-sorted — the TopN
    * read-in-order prerequisite. Linear stores always are (the original
    * write contract); zorder stores only since the marker carries
    * `order=kc` (earlier zorder writers sorted segments along the
    * Morton curve, so a store persisted across that version boundary
    * must DECLINE the push rather than serve wrong prefixes). */
  def readSortedKC(path: String): Boolean =
    GraftFs.readText(activeConf, GraftFs.child(path, LayoutFile)) match {
      case None => true // no marker = linear = (k, c)-sorted
      case Some(txt) => txt.linesIterator.map(_.trim).contains("order=kc")
    }

  def readManifest(path: String): Seq[Segment] = {
    val raw = GraftFs.readText(activeConf, GraftFs.child(path, ManifestFile))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"$path/$ManifestFile"))
    raw.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(f, lo, hi, n) => // pre-zone-map manifest line
          Segment(s"$path/$f", unhex(lo), unhex(hi), n.toLong)
        case Array(f, lo, hi, n, clo, chi) =>
          Segment(s"$path/$f", unhex(lo), unhex(hi), n.toLong, unhex(clo), unhex(chi))
        case other => throw new IllegalStateException(
          s"malformed manifest line (${other.length} fields): $line")
      }
    }
  }
}
