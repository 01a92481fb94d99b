package graft.sources.kvconnector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Z-ORDER layout for the graft-kv store — the MergeTree multi-column
  * ORDER BY analogue (ref `QueryHelper.java:57` `ORDER BY (k, c)`) laid
  * out along the Morton curve instead of lexicographically, wiring
  * [[graft.sources.ZOrder]] into the DSv2 write path (r9 verdict #5).
  *
  * The linear layout makes key-range pruning perfect and qualifier
  * pruning useless (every key-range segment spans the full qualifier
  * range); the z layout gives every segment a RECTANGLE of (k, c) space,
  * so the manifest's existing per-segment (key-bounds × qualifier-zone-
  * map) pruning — already applied by [[KVDataSource.mayMatch]] — bites on
  * BOTH dimensions. A (key-range × qualifier-range) probe then schedules
  * ~area-fraction of segments instead of ~key-fraction: at a
  * million-segment store that is the difference between touching every
  * key-stripe of a narrow time window and touching its rectangles only.
  *
  * Coordinates: the curve needs per-dimension CELL ids, not raw binary
  * values, so callers pass the numeric projections of k and c (the same
  * values they encoded) and each is width-bucketed into 2^bits cells
  * between its own min/max — one extra aggregate pass, driver-sized
  * state, the Delta/Iceberg OPTIMIZE ZORDER shape. Writes go through
  * `format("graft-kv").option("layout", "zorder")`: the writer accepts
  * the pre-arranged partitioning (the DSv2 contract cannot spell a
  * Morton expression over binary columns on a path-based table), tasks
  * record exact (k, c) bounds + Bloom sidecars as always, and the commit
  * drops a `_graft_layout` marker recording which layout placed the
  * rows. Ordered reads need no concession (r10 verdict #6): the curve
  * decides segment MEMBERSHIP only, rows inside every segment are
  * (k, c)-sorted by the write contract, so the TopN read-in-order push
  * serves from per-segment prefixes on this layout too — pruning of the
  * z-rectangles and ordered reads compose.
  */
object KVZOrder {

  /** Write `df` (columns k, c, v + whatever `ka`/`ca` reference) as a
    * z-ordered graft-kv store: bucket the two numeric curve coordinates,
    * Morton-interleave, range-partition into `segments` curve runs, and
    * write through the DSv2 path. */
  def write(df: DataFrame, ka: Column, ca: Column, path: String,
            segments: Int, bits: Int = 16): Unit = {
    val row = df.agg(
      F.min(ka).cast("double").as("kl"), F.max(ka).cast("double").as("kh"),
      F.min(ca).cast("double").as("cl"), F.max(ca).cast("double").as("ch"))
      .collect()(0)
    // empty input (or all-null coordinates) leaves the min/max row null —
    // degrade to lo=hi=0 so the write produces a valid empty z-store the
    // same way a linear write of empty input does (r10 advice)
    def bound(i: Int): Double = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
    val b = Array(bound(0), bound(1), bound(2), bound(3))
    def bucket(c: Column, lo: Double, hi: Double): Column =
      if (!(hi > lo)) F.lit(0L) // degenerate/empty dimension: one cell
      else F.least(F.lit((1L << bits) - 1L),
        F.floor((c.cast("double") - F.lit(lo)) / F.lit(hi - lo)
          * F.lit((1L << bits).toDouble)).cast("long"))
    val z = graft.sources.ZOrder.zValue(
      bucket(ka, b(0), b(1)), bucket(ca, b(2), b(3)), bits)
    // distribution = curve runs (ours); intra-segment order = (k, c),
    // imposed by the write contract's requiredOrdering — NOT the curve:
    // segment membership carries the rectangle pruning, the sort inside
    // carries the TopN read-in-order push (r10 verdict #6)
    df.withColumn("__z", z)
      .repartitionByRange(segments, F.col("__z"))
      .select("k", "c", "v")
      .write.format("graft-kv")
      .option("layout", "zorder").option("segments", segments)
      .mode("overwrite").save(path)
  }

  /** PLAN-TIME probe: how many segments a (key-range × qualifier-range)
    * predicate schedules — exactly the DSv2 scan's manifest pruning
    * (range + zone map; no bloom: range probes never consult sidecars).
    * The gate that proves the layout pays (kv_zorder) compares this
    * count across layouts of the same rows. */
  def scheduledSegments(path: String, kLo: Array[Byte], kHi: Array[Byte],
                        cLo: Array[Byte], cHi: Array[Byte]): Int =
    scheduledSegmentsOf(KVSegmentStore.readManifest(path), kLo, kHi, cLo, cHi)

  /** [[scheduledSegments]] over an ALREADY-READ manifest — kv_zorder
    * probes a layout and gates on its committed total in one entry, so
    * sharing one manifest read per store keeps the whole gate at two
    * metadata reads (r12 verdict #5). The pruning predicate is exactly
    * the DSv2 scan's range/zone-map rule (range probes never consult
    * bloom sidecars). */
  def scheduledSegmentsOf(segs: Seq[KVSegmentStore.Segment],
                          kLo: Array[Byte], kHi: Array[Byte],
                          cLo: Array[Byte], cHi: Array[Byte]): Int = {
    import org.apache.spark.sql.sources._
    val fs: Array[Filter] = Array(
      GreaterThanOrEqual("k", kLo), LessThanOrEqual("k", kHi),
      GreaterThanOrEqual("c", cLo), LessThan("c", cHi))
    segs.count(seg => fs.forall(KVDataSource.mayMatch(seg, _)))
  }
}
