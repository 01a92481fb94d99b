package graft.operators

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {

  test("salted inner join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of the fact rows hit one key — the classic hot-key shape
    val big = spark.range(0, 20000)
      .select(F.col("id"),
        F.when(F.col("id") % 10 =!= 0, 1L).otherwise(F.col("id") % 100).as("k"))
    val medium = spark.range(0, 100)
      .select(F.col("id").as("k"), F.concat(F.lit("dim"), F.col("id")).as("name"))
    val plain = big.join(medium, Seq("k"))
      .select("k", "id", "name").collect().map(_.toSeq).toSet
    val salted = SaltedJoin.inner(big, medium, Seq("k"), F.col("id"), buckets = 8)
      .select("k", "id", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("the hot key's rows spread across salt buckets") {
    import spark.implicits._
    val big = spark.range(0, 10000).select(F.col("id"), F.lit(7L).as("k"))
    val spread = big
      .withColumn("__salt", F.pmod(F.xxhash64(F.col("id")), F.lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(spread.length == 8) // every bucket hit
    // roughly even: no bucket holds more than 2x the fair share
    assert(spread.max <= 2 * (10000 / 8), s"skewed spread: ${spread.toSeq}")
  }
}
