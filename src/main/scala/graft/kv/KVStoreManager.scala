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

  private val schema = StructType(Seq(
    StructField("k", BinaryType), StructField("c", BinaryType),
    StructField("v", BinaryType)))

  private def path(name: String) = s"$warehouseDir/$name"

  /** openDatabase: returns the named store (empty if never written). */
  def openDatabase(name: String): DataFrame =
    if (exists(name)) spark.read.schema(schema).parquet(path(name))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def exists(name: String): Boolean =
    new java.io.File(path(name)).exists()

  /** mutateMany: batch mutation across stores, each store's deletions
    * strictly before its additions (ref ClickhouseStoreManager.java:89).
    */
  def mutateMany(mutations: Map[String, (DataFrame, DataFrame)]): Unit =
    mutations.foreach { case (name, (additions, deletions)) =>
      val mutated = KVStore.mutate(openDatabase(name), additions, deletions)
      // write via temp path: the new snapshot reads the old files
      val tmp = path(name) + "__tmp"
      mutated.write.mode(SaveMode.Overwrite).parquet(tmp)
      val dst = new java.io.File(path(name))
      deleteRecursively(dst)
      require(new java.io.File(tmp).renameTo(dst), s"rename failed for $name")
    }

  /** clearStorage: drop every store under the warehouse. */
  def clearStorage(): Unit = {
    val dir = new java.io.File(warehouseDir)
    Option(dir.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
