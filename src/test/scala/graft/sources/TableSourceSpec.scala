package graft.sources

import graft.SparkSpec

class TableSourceSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("documents round-trip losslessly through csv and json") {
    val docs = graft.Tables(spark, SF, "documents")
    val expect = rowsOf(docs)
    val schema = docs.schema
    for (fmt <- Seq(TableSource.Csv, TableSource.Json)) {
      val dir = java.nio.file.Files.createTempDirectory(s"src_${fmt.name}").toString + "/t"
      TableSource.write(docs, dir, fmt)
      val back = TableSource.read(spark, dir, fmt, schema)
      assert(back.schema == schema, fmt.name)
      assert(rowsOf(back) == expect, fmt.name)
    }
  }

  test("a partition-key filter prunes directories at plan time") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pp").toString
    spark.range(0, 300)
      .select(F.col("id"), (F.col("id") % 3).cast("string").as("part"))
      .write.partitionBy("part").parquet(s"$dir/t")
    val q = spark.read.parquet(s"$dir/t").filter(F.col("part") === "1")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("(part = 1)") || plan.contains("part#"), plan)
    assert(q.count() == 100)
    // and the pruned read misses nothing relative to a full-scan filter
    assert(q.select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 300L).filter(_ % 3 == 1).toSet)
  }
}
