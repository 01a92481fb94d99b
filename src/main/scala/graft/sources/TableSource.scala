package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable tabular sources/sinks for the graft tables.
  *
  * The reference speaks only JDBC-to-ClickHouse; on Spark a table is
  * format-agnostic. Parquet is the primary format (columnar, predicate
  * pushdown, column pruning); CSV/JSON exist for interchange. Reads
  * always take an explicit schema (schema inference scans the data twice
  * and guesses types — never acceptable at 100 TB).
  */
object TableSource {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Csv extends Format { val name = "csv" }
  case object Json extends Format { val name = "json" }
  case object Orc extends Format { val name = "orc" }

  def read(spark: SparkSession, path: String, fmt: Format, schema: StructType): DataFrame = {
    val r = spark.read.schema(schema)
    fmt match {
      case Parquet => r.parquet(path)
      case Csv => r.option("header", "true").csv(path)
      case Json => r.json(path)
      case Orc => r.orc(path)
    }
  }

  def write(df: DataFrame, path: String, fmt: Format): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (fmt match {
      case Parquet => w.parquet(path)
      case Csv => w.option("header", "true").csv(path)
      case Json => w.json(path)
      case Orc => w.orc(path)
    }): Unit
  }
}
