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
}
