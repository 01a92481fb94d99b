package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Z-ORDER (Morton-curve) layout writer — the Delta/Iceberg
  * `OPTIMIZE ZORDER BY (a, b)` analogue, completing graft's layout
  * toolkit next to `KVStore.writeBucketed` (1-D co-location) and the
  * graft-kv range segments (1-D pruning):
  *
  * A 1-D sort makes ONE column's parquet min/max statistics selective
  * and leaves the other column scattered across every file; interleaving
  * the bits of both columns into one sort key gives every file a small
  * RECTANGLE of the (a, b) space, so row-group/file statistics prune for
  * predicates on EITHER column (≈√F of F files per 1-D slice instead of
  * all F). At 100 TB this is the difference between a dashboard query
  * touching 3% of files and touching all of them.
  *
  * The z-value is a pure codegen'd expression (bit extracts + shifts, no
  * UDF); values are clamped into `bits` unsigned bits per column
  * (callers pre-scale — the curve needs only ORDER, not exact values).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative longs
    * (a in the even positions, b in the odd). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mx = F.lit((1L << bits) - 1)
    val za = F.least(F.greatest(a.cast("long"), F.lit(0L)), mx)
    val zb = F.least(F.greatest(b.cast("long"), F.lit(0L)), mx)
    (0 until bits).flatMap { j =>
      Seq(F.shiftleft(F.shiftright(za, j).bitwiseAND(F.lit(1L)), 2 * j),
        F.shiftleft(F.shiftright(zb, j).bitwiseAND(F.lit(1L)), 2 * j + 1))
    }.reduce(_ + _)
  }

  /** Write `df` as `numFiles` parquet files laid out along the Morton
    * curve of (colA, colB): range-partition by z so each file owns a
    * contiguous curve segment (= a small rectangle of the key space),
    * sort within so row groups subdivide it further. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(F.col(colA), F.col(colB), bits))
      .repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
