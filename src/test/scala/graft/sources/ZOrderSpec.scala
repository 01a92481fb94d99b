package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Z-order layout: data fidelity, the Morton math, and the LOCALITY
  * payoff — under a z-layout BOTH single-column slices touch a fraction
  * of the files, where a 1-D sorted layout serves one column and
  * scatters the other across every file. */
class ZOrderSpec extends SparkSpec {

  private def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(path).filter(pred)
      .select(F.input_file_name()).distinct().count()

  test("zValue interleaves bits (known values) and orders rectangles") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("a", "b")
      .select(F.col("a"), F.col("b"), ZOrder.zValue(F.col("a"), F.col("b"), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L)  // a in even bit positions
    assert(rows((0L, 1L)) == 2L)  // b in odd positions
    assert(rows((1L, 1L)) == 3L)
    assert(rows((2L, 2L)) == 12L) // 0b1100
    assert(rows((3L, 5L)) == 39L) // a=0b11→bits0,2; b=0b101→bits1,5: 1+4+2+32
  }

  test("writeZOrdered preserves the data exactly") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val ev = graft.Tables(spark, SF, "events")
      .select(F.col("event_id"), F.col("user_id"),
        F.expr("unix_micros(ts) div 86400000000").as("day"))
    ZOrder.writeZOrdered(ev, dir, "user_id", "day", numFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    assert(back.collect().map(_.toSeq).toSet == ev.collect().map(_.toSeq).toSet)
    assert(!back.columns.contains("__z"), "the sort key must not persist")
  }

  test("both 1-D slices touch a fraction of z-ordered files; a 1-D sort scatters") {
    val zDir = Files.createTempDirectory("graft_z2").toString
    val tDir = Files.createTempDirectory("graft_t2").toString
    val ev = graft.Tables(spark, SF, "events")
      .select(F.col("event_id"), F.col("user_id"),
        F.expr("unix_micros(ts) div 86400000000 - 19700").as("day"))
    val files = 16
    ZOrder.writeZOrdered(ev, zDir, "user_id", "day", numFiles = files)
    // the 1-D strawman: range-layout by day only
    ev.repartitionByRange(files, F.col("day")).sortWithinPartitions("day")
      .write.mode("overwrite").parquet(tDir)
    val userSlice = F.col("user_id") >= 10 && F.col("user_id") < 14
    val daySlice = F.col("day") >= 40 && F.col("day") < 45
    val zUser = filesTouched(zDir, userSlice)
    val zDay = filesTouched(zDir, daySlice)
    val tUser = filesTouched(tDir, userSlice)
    val tDay = filesTouched(tDir, daySlice)
    info(s"files with matches of $files: z user=$zUser day=$zDay | day-sorted user=$tUser day=$tDay")
    // day-sorted serves the day slice but scatters the user slice over
    // every file; the z-layout bounds BOTH slices to a strict subset
    assert(tUser == files.toLong, "1-D layout should scatter the other column")
    assert(zUser < files, s"z layout must localize user slices ($zUser)")
    assert(zDay < files, s"z layout must localize day slices ($zDay)")
    assert(zUser + zDay < tUser + tDay,
      s"z ($zUser+$zDay) should beat the 1-D layout ($tUser+$tDay) overall")
  }
}
