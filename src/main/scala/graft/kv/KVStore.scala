package graft.kv

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Spark-native key-column-value store — the reference's
  * `KeyColumnValueStore` SPI (ClickhouseKeyColumnValueStore.java:57) as
  * declarative DataFrame transforms over a `(k, c, v)` BinaryType table.
  *
  * Ordering: JanusGraph orders bytes unsigned 0x00..0xFF; the reference
  * sign-shifts every byte to survive ClickHouse's signed Int8 arrays
  * (ClickhouseKeyColumnValueStore.java:363). Spark's BinaryType comparison
  * is already unsigned lexicographic, so no shift is needed here and all
  * range predicates below are plain column comparisons — which Catalyst
  * pushes into the parquet scan (min/max row-group pruning on k).
  *
  * Scale: every op is a narrow scan + per-key window or join keyed on `k`;
  * a persisted store would be written bucketed by `k` so multi-key slices
  * and mutations co-locate without a shuffle. Nothing iterates on the
  * driver (the reference's RowIterator at
  * ClickhouseKeyColumnValueStore.java:241 is a driver-side pull loop; at
  * 100 TB a slice result stays a DataFrame).
  */
object KVStore {

  /** getSlice(key ∈ keys, columnStart, columnEnd, limit) — ref
    * QueryHelper.java:61 (`SELECT c,v FROM t WHERE k=? AND c>=? AND c<?
    * ORDER BY c LIMIT ?`), vectorized over an arbitrary set of keys
    * (multi-key form, ref ClickhouseKeyColumnValueStore.java:108).
    * `keys` is a single-column `k` DataFrame. The caller decides the join
    * strategy (wrap keys in `F.broadcast(...)` when the set is known
    * small); a hardcoded hint here would force corpus-sized key sets
    * through the driver.
    */
  def slice(store: DataFrame, keys: DataFrame, columnStart: Column, columnEnd: Column,
            limit: Int): DataFrame = {
    val ranged = store
      .filter(F.col("c") >= columnStart && F.col("c") < columnEnd)
      .join(keys, "k")
    val w = Window.partitionBy("k").orderBy(F.col("c").asc)
    ranged
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= limit)
      .drop("rn")
  }

  /** getKeys(keyStart, keyEnd) — ref QueryHelper.java:65
    * (`SELECT DISTINCT k FROM t WHERE k>=? AND k<? ORDER BY k`). */
  def keyScan(store: DataFrame, keyStart: Column, keyEnd: Column): DataFrame =
    store.filter(F.col("k") >= keyStart && F.col("k") < keyEnd).select("k").distinct()

  /** getKeys(KeyRangeQuery) with the entries materialized — the shape a
    * JanusGraph OLAP scan actually consumes: the reference's getKeys
    * returns a KeyIterator whose per-key `getEntries()` applies the
    * column slice (ref ClickhouseKeyColumnValueStore.java:175; RowIterator
    * `:294` — one ordered (k,c) walk re-segmented per key, column range
    * [c1,c2) with a per-key limit). Here both ranges land in ONE scan —
    * k and c predicates push to parquet together — and the per-key limit
    * is a bounded window over each key partition; no driver-side key
    * iteration at any scale. */
  def keySlices(store: DataFrame, keyStart: Column, keyEnd: Column,
                columnStart: Column, columnEnd: Column, limit: Int): DataFrame = {
    val ranged = store.filter(
      F.col("k") >= keyStart && F.col("k") < keyEnd &&
        F.col("c") >= columnStart && F.col("c") < columnEnd)
    val w = Window.partitionBy("k").orderBy(F.col("c").asc)
    ranged
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= limit)
      .drop("rn")
  }

  /** mutate(additions, deletions) — ref
    * ClickhouseKeyColumnValueStore.java:133: deletions apply strictly
    * before additions, and every addition first deletes its own (k,c)
    * (upsert). additions: (k,c,v); deletions: (k,c).
    */
  def mutate(store: DataFrame, additions: DataFrame, deletions: DataFrame): DataFrame = {
    val tombstones = deletions.select("k", "c")
      .unionByName(additions.select("k", "c"))
      .distinct()
    store
      .join(tombstones, Seq("k", "c"), "left_anti")
      .unionByName(additions.select("k", "c", "v"))
  }

  /** Persist a store bucketed by `k` (hash buckets, sorted by (k, c)
    * within each bucket — the Spark analogue of the reference's
    * MergeTree ORDER BY (k, c) layout). Readers of two stores bucketed
    * the same way join/mutate on `k` with NO shuffle on either side,
    * which is what keeps multi-key slices and batch mutations viable at
    * 100 TB. Bucketed tables must go through the catalog (bucket
    * metadata lives there, not in parquet), hence saveAsTable. */
  def writeBucketed(store: DataFrame, table: String, numBuckets: Int): Unit =
    store.write
      .bucketBy(numBuckets, "k")
      .sortBy("k", "c")
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  // ---- order-preserving codecs (no UDF — hex/unhex are codegen'd) -------

  /** non-negative long → 8-byte big-endian binary (order-preserving). */
  def encLong(c: Column): Column = F.unhex(F.lpad(F.hex(c), 16, "0"))

  /** driver-side twin of encLong: non-negative long → 8-byte big-endian
    * key bytes, for literal key/qualifier bounds handed to the connector
    * (static In-sets, scheduledSegments probes, pushed slice bounds). */
  def beLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  /** inverse of encLong on a binary slice [pos, pos+8) (1-based pos). */
  def decLong(c: Column, pos: Int): Column =
    F.conv(F.hex(F.substring(c, pos, 8)), 16, 10).cast("long")
}
