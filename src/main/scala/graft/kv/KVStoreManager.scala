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
  * below), persists; no local key partition (getLocalKeyPartition throws
  * in the reference; locality here is the bucketed layout instead,
  * KVStore.writeBucketed).
  *
  * `transactional = true` is the analogue of the reference's
  * STORAGE_TRANSACTIONAL mode (ClickhouseKeyColumnValueStore.java:222
  * acquires the store lock before mutating): mutateMany then holds a
  * warehouse-level lease — a lock file carrying owner + epoch, created
  * through the same Hadoop FileSystem as the data so hdfs:///s3a://
  * warehouses serialize identically — for the whole read-snapshot →
  * write-snapshot → swap sequence. Two racing writers serialize instead
  * of interleaving snapshot swaps (last-writer-wins lost updates, the
  * dirty-write hazard the reference's README warns about for
  * multi-instance use). A crashed holder's lease is taken over once it
  * outlives `leaseTimeoutMs`.
  *
  * Mutations rewrite the store snapshot — at scale you'd land mutation
  * batches as delta files and compact, but the read semantics
  * (delete-before-add, KVStore.mutate) are identical.
  */
final class KVStoreManager(spark: SparkSession, warehouseDir: String,
                           transactional: Boolean = false,
                           leaseTimeoutMs: Long = 60000L,
                           acquireTimeoutMs: Long = 120000L) {
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

  // ---- named SEGMENT stores (the connector-backed store-per-family form)

  /** Persist a named store in the graft-kv segment layout — the form
    * whose reads go through the pruning connector. This is how the
    * PER-FAMILY store split composes (JanusGraph opens edgestore /
    * graphindex as SEPARATE named stores, ClickhouseStoreManager.java:79
    * — one openDatabase per family): each family lands under its own
    * name, and `familyRanged = true` picks the qualifier-major segment
    * layout (KVSegmentStore.writeFamilyRanged) so intra-store family/
    * property slices drop segments too. */
  def writeSegmentStore(name: String, store: DataFrame, numSegments: Int,
                        familyRanged: Boolean = false): Unit =
    if (familyRanged)
      graft.sources.kvconnector.KVSegmentStore.writeFamilyRanged(
        store, path(name).toString, numSegments)
    else
      graft.sources.kvconnector.KVSegmentStore.write(
        store, path(name).toString, numSegments)

  /** openDatabase through the connector: the named store read with
    * manifest/zone-map/bloom segment pruning live. */
  def openSegmentStore(name: String): DataFrame =
    spark.read.format("graft-kv").load(path(name).toString)

  // ---- warehouse lease (transactional mode) ------------------------------

  private val lockFile = new Path(warehouseDir, "__graft_lease")
  private val owner = java.util.UUID.randomUUID().toString

  /** Create-then-verify lease acquisition. Plain create(overwrite=false)
    * is atomic on HDFS but only check-then-act on some FileSystems, so
    * after writing the lease is read BACK: whoever's owner survives holds
    * it, the loser retries — a CAS approximation that needs nothing
    * beyond the FileSystem API. */
  private def acquireLease(): Unit = {
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var held = false
    while (!held) {
      val wrote =
        try {
          val out = fs.create(lockFile, false)
          out.writeUTF(owner)
          out.writeLong(System.currentTimeMillis())
          out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (wrote) held = try readLeaseOwner().contains(owner)
                        catch { case _: java.io.IOException => false }
      if (!held) {
        // stale lease (crashed holder): take over once it exceeds the
        // timeout — owner+epoch in the file make the takeover auditable
        try {
          val st = fs.getFileStatus(lockFile)
          if (System.currentTimeMillis() - st.getModificationTime > leaseTimeoutMs)
            fs.delete(lockFile, false)
        } catch { case _: java.io.IOException => () }
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"could not acquire warehouse lease $lockFile within ${acquireTimeoutMs}ms " +
              s"(holder: ${try readLeaseOwner() catch { case _: Throwable => None }})")
        Thread.sleep(50)
      }
    }
  }

  private def readLeaseOwner(): Option[String] =
    if (!fs.exists(lockFile)) None
    else {
      val in = fs.open(lockFile)
      try Some(in.readUTF()) finally in.close()
    }

  private def releaseLease(): Unit =
    try if (readLeaseOwner().contains(owner)) fs.delete(lockFile, false)
    catch { case _: java.io.IOException => () }

  /** mutateMany: batch mutation across stores, each store's deletions
    * strictly before its additions (ref ClickhouseStoreManager.java:89).
    * In transactional mode the whole batch runs under the warehouse
    * lease: the snapshot read happens at write time (KVStore.mutate is
    * lazy), so holding the lease across read→write→swap makes racing
    * writers serialize rather than both reading the same base snapshot
    * and dropping one another's cells.
    */
  def mutateMany(mutations: Map[String, (DataFrame, DataFrame)]): Unit = {
    if (transactional) acquireLease()
    try mutations.foreach { case (name, (additions, deletions)) =>
      val mutated = KVStore.mutate(openDatabase(name), additions, deletions)
      // write via temp path: the new snapshot reads the old files
      val tmp = new Path(warehouseDir, name + "__tmp_" + owner.take(8))
      mutated.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val dst = path(name)
      if (fs.exists(dst)) fs.delete(dst, true)
      require(fs.rename(tmp, dst), s"rename failed for $name")
    } finally if (transactional) releaseLease()
  }

  /** clearStorage: drop every store under the warehouse. */
  def clearStorage(): Unit = {
    val root = new Path(warehouseDir)
    if (fs.exists(root))
      fs.listStatus(root).foreach(st => fs.delete(st.getPath, true))
  }
}
