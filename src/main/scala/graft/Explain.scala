package graft
import org.apache.spark.sql.SparkSession
/** Plan inspection: `runMain graft.Explain <sfDir> <q1,q2,...>` prints each
  * query's formatted physical plan (the loop used to iterate plans toward
  * the shape we want: pushed filters, pruned schemas, broadcasts where a
  * side is dimension-sized, no redundant exchanges). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => names.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
