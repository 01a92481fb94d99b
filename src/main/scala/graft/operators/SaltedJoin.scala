package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deterministic key-salting for skewed equi-joins.
  *
  * AQE's skew-join handles most runtime skew by splitting oversized
  * partitions, but it only fires on sort-merge joins and only at shuffle
  * boundaries it can observe. When one join key dominates (a null-ish
  * sentinel, a celebrity vertex, an empty-document hash), explicit
  * salting is the structural fix: the big side's rows fan out over
  * `buckets` sub-keys, the small-but-unbroadcastable side is replicated
  * `buckets` times, and the join runs on (key, salt) — the hot key's rows
  * now spread over `buckets` reducers instead of one.
  *
  * The salt is derived from a caller-chosen column (xxhash64 — stable
  * across runs/partitionings), never rand(): a nondeterministic salt
  * breaks retried-task idempotence at scale (a re-executed task would
  * re-salt differently and double- or zero-count rows under shuffle
  * replay), and it would make results irreproducible run to run.
  */
object SaltedJoin {

  /** Inner equi-join of `big` (skewed) with `medium` on `keys`, salted
    * into `buckets` sub-keys. `saltBy` is a column of `big` (any column;
    * a unique id gives the most even spread). Result rows are identical
    * to `big.join(medium, keys)` — only the physical distribution
    * changes. */
  def inner(big: DataFrame, medium: DataFrame, keys: Seq[String],
            saltBy: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = big.withColumn("__salt", F.pmod(F.xxhash64(saltBy), F.lit(buckets)))
    val replicated = medium.withColumn("__salt",
      F.explode(F.array((0 until buckets).map(i => F.lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
