package graft.kv

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Store-manager lifecycle over named KCV stores — the reference's
  * `KeyColumnValueStoreManager` (ClickhouseStoreManager.java:49) as a thin
  * catalog of parquet-backed `(k, c, v)` tables.
  *
  * Feature parity with the reference's StandardStoreFeatures
  * (ClickhouseStoreManager.java:59): orderedScan + keyOrdered (Spark
  * BinaryType sorts unsigned — see KVStore), batchMutation (mutateMany
  * below), persists; NOT transactional (the reference's
  * ClickhouseTransaction is a no-op holder too) and no local key
  * partition (getLocalKeyPartition throws in the reference;
  * locality here is the bucketed layout instead, KVStore.writeBucketed).
  *
  * Mutations rewrite the store snapshot — at scale you'd land mutation
  * batches as delta files and compact, but the read semantics
  * (delete-before-add, KVStore.mutate) are identical.
  */
final class KVStoreManager(spark: SparkSession, warehouseDir: String) {
  import org.apache.hadoop.fs.{FileSystem, Path}

  private val schema = StructType(Seq(
    StructField("k", BinaryType), StructField("c", BinaryType),
    StructField("v", BinaryType)))

  private def path(name: String) = new Path(warehouseDir, name)

  // metadata ops go through the same Hadoop FileSystem as the parquet
  // I/O, so hdfs:///s3a:// warehouses behave exactly like local ones
  private def fs: FileSystem =
    new Path(warehouseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** openDatabase: returns the named store (empty if never written). */
  def openDatabase(name: String): DataFrame =
    if (exists(name)) spark.read.schema(schema).parquet(path(name).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def exists(name: String): Boolean = fs.exists(path(name))

  /** mutateMany: batch mutation across stores, each store's deletions
    * strictly before its additions (ref ClickhouseStoreManager.java:89).
    */
  def mutateMany(mutations: Map[String, (DataFrame, DataFrame)]): Unit =
    mutations.foreach { case (name, (additions, deletions)) =>
      val mutated = KVStore.mutate(openDatabase(name), additions, deletions)
      // write via temp path: the new snapshot reads the old files
      val tmp = new Path(warehouseDir, name + "__tmp")
      mutated.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val dst = path(name)
      if (fs.exists(dst)) fs.delete(dst, true)
      require(fs.rename(tmp, dst), s"rename failed for $name")
    }

  /** clearStorage: drop every store under the warehouse. */
  def clearStorage(): Unit = {
    val root = new Path(warehouseDir)
    if (fs.exists(root))
      fs.listStatus(root).foreach(st => fs.delete(st.getPath, true))
  }
}
