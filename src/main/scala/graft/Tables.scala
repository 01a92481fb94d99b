package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Column

/** Loaders + numeric helpers shared by all graft query modules.
  *
  * All money/quantity aggregates are computed in exact decimal arithmetic
  * (operands cast to DECIMAL before the arithmetic) so results are
  * bit-identical across engines and partition orders — double summation is
  * order-dependent and would flake the correctness gate and any 100 TB
  * re-run. Final columns are cast to fixed DECIMAL(18,s) so the output
  * schema is stable too.
  */
object Tables {
  /** Per-session memo of the loader PLANS (never data): every
    * `spark.read.parquet` call builds a fresh file index and runs a
    * footer/schema job, and the scenario entries call the loaders many
    * times per query (PropertyGraph alone reads 7 tables) — measured ~20
    * small "parquet at Tables.scala" setup jobs inside one bench entry.
    * The testdata dirs are immutable for a JVM's lifetime, so the
    * DataFrame (a logical plan over a pinned file list) is reusable: the
    * catalog/file-index caching a real deployment gets from its
    * metastore (guide §6, file-listing caches). Every execution still
    * scans the parquet — nothing but metadata is reused. Keyed weakly by
    * session so test suites' stopped sessions do not pin plans. */
  private val planMemo =
    new java.util.WeakHashMap[SparkSession, java.lang.ref.SoftReference[
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The cached DataFrames strongly reference their session, so a plain
    // WeakHashMap value would pin its own key forever (multi-session test
    // suites would leak every stopped session). The SoftReference breaks
    // that cycle under memory pressure: map collected → session weakly
    // reachable → entry cleared; the memo is rebuilt on demand.
    val per = planMemo.synchronized {
      val live = Option(planMemo.get(spark)).flatMap(r => Option(r.get()))
      live.getOrElse {
        val m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        planMemo.put(spark, new java.lang.ref.SoftReference(m))
        m
      }
    }
    val key = (dir, name)
    val hit = per.get(key)
    if (hit != null) hit
    else {
      // build OUTSIDE the lock: spark.read.parquet runs a schema-inference
      // job, and holding the global memo lock across it serialized the
      // concurrent Par.jobs thunks on first load. A racing duplicate
      // build is harmless — putIfAbsent keeps exactly one plan.
      val df =
        if (name == "events") events(spark, dir)
        else spark.read.parquet(s"$dir/$name.parquet")
      val prev = per.putIfAbsent(key, df)
      if (prev != null) prev else df
    }
  }

  /** events.parquet has carried ts as TIMESTAMP(NANOS) (readable only as
    * long nanos), as plain TIMESTAMP_NTZ(µs), and as TIMESTAMP(µs) across
    * testdata generations — normalize all three to TimestampType µs
    * (matches DuckDB's epoch_us() flooring of TIMESTAMP_NS). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", F.col("ts").cast("timestamp"))
    }
  }

  /** exact 2-dp decimal view of a double column (inputs are 2-dp money). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final-output cast helpers: snap to an exact DECIMAL(18,s), then emit
    * DOUBLE. Internal arithmetic stays exact decimal (deterministic at any
    * partition count); the terminal decimal→double conversion is
    * correctly-rounded in both Spark (BigDecimal.doubleValue) and DuckDB
    * (scaled-int / 10^s), so both engines emit the same float64 bits.
    * Emitting DECIMAL itself fails the driver's compare: pandas reads Spark
    * parquet decimals as Decimal('493670.20') (trailing zero kept) while
    * DuckDB's df() yields float64 '493670.2'. */
  def out2(c: Column): Column = c.cast(DecimalType(18, 2)).cast("double")
  def out4(c: Column): Column = c.cast(DecimalType(18, 4)).cast("double")

  /** exact revenue term: extendedprice * (1 - discount), all decimal. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (F.lit(java.math.BigDecimal.ONE).cast(DecimalType(18, 2)) - dec2(discount))
}
