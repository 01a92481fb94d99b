package graft.sources.kvconnector

import java.nio.file.Files
import java.util

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, In}

import graft.SparkSpec
import graft.kv.KVStore

/** The three kv pruning layers COMPOSED on one scan (r9 verdict #7: the
  * layers are spec-tested independently — KVBloomSpec, KVDataSourceSpec —
  * but pruning bugs hide in their conjunction): a single (IN-keys ∧
  * qualifier-range) probe where key-range pruning, the qualifier zone
  * map, and the Bloom skip index must EACH eliminate a segment the other
  * two keep — asserted by decomposing the kept set per layer — and the
  * final scan still returns exactly the right rows. */
class KVPruneComposeSpec extends SparkSpec {

  private def beLong(v: Long): Array[Byte] = KVStore.beLong(v)

  // EVEN keys 0..198, 10 cells each with qualifier = k*10+j — qualifiers
  // correlate with keys, so every key-range segment also owns a tight
  // qualifier range (the zone map has something to say)
  private def store = {
    import spark.implicits._
    // NB: Column./ is DOUBLE division — `div` keeps the keys integral-even
    spark.range(0, 2000)
      .select(
        KVStore.encLong(F.expr("(id div 10) * 2")).as("k"),
        KVStore.encLong(F.expr("(id div 10) * 20 + id % 10")).as("c"),
        F.concat(F.lit("v"), F.col("id").cast("string")).cast("binary").as("v"))
  }

  private def ucmp(a: Array[Byte], b: Array[Byte]): Int =
    util.Arrays.compareUnsigned(a, b)

  /** An ODD (absent) key strictly inside a non-degenerate segment whose
    * qualifier zone map SURVIVES `cLo` — the segment only the Bloom can
    * kill. Derived from the manifest, not hardcoded (range-partition
    * boundaries move with the sampler — the KVBloomSpec lesson), AND
    * pre-checked against the segment's actual Bloom so a false positive
    * on one candidate just moves to the next instead of flaking. */
  private def bloomOnlyVictim(segs: Seq[KVSegmentStore.Segment],
                              cLo: Array[Byte], present: Long): Option[Long] =
    segs.iterator
      .filter(g => ucmp(g.lo, g.hi) < 0 && g.cHi != null && ucmp(g.cHi, cLo) >= 0)
      // not the present key's own segment (that one is legitimately kept)
      .filter(g => !(ucmp(g.lo, beLong(present)) <= 0 &&
        ucmp(beLong(present), g.hi) <= 0))
      .flatMap { g =>
        val lo = java.nio.ByteBuffer.wrap(g.lo).getLong
        val hi = java.nio.ByteBuffer.wrap(g.hi).getLong
        val bloom = KVSegmentStore.readBloom(g.file)
        ((lo + 1) until hi).iterator.filter(_ % 2 == 1).find(k =>
          bloom.exists { case (bits, h) =>
            !graft.operators.KeyBloom.mightContain(bits, h, beLong(k))
          })
      }
      .nextOption()

  test("range, zone map and bloom each prune a segment the others keep") {
    val dir = Files.createTempDirectory("graft_kvcompose").toString
    KVSegmentStore.write(store, dir, 16)
    val segs = KVSegmentStore.readManifest(dir)

    val kPresent = 150L               // held; its cells are 1500..1509
    val cLo = beLong(1400L)           // qualifier floor: kills low segments
    val kZoneVictim = 50L             // held, but its cells are 500..509
    val kBloom = bloomOnlyVictim(segs, cLo, kPresent) match {
      case Some(k) => k
      case None => fail("no bloom-only victim key in this layout")
    }

    val keyFilter: Filter = In("k", Array(beLong(kPresent), beLong(kZoneVictim), beLong(kBloom)))
    val cFilter: Filter = GreaterThanOrEqual("c", cLo)

    def files(s: Seq[KVSegmentStore.Segment]) = s.map(_.file).toSet
    // layer 1 — key-range only
    val rangeKept = segs.filter(KVDataSource.mayMatch(_, keyFilter))
    // layer 2 — + qualifier zone map
    val zoneKept = rangeKept.filter(KVDataSource.mayMatch(_, cFilter))
    // layer 3 — + bloom (what the scan actually schedules)
    val fullKept = new KVScan(dir, KVDataSource.Schema,
      Array(keyFilter, cFilter)).kept

    def show(g: KVSegmentStore.Segment): String = {
      def dl(b: Array[Byte]) = java.nio.ByteBuffer.wrap(b).getLong
      s"${g.file.split('/').last}[k ${dl(g.lo)}..${dl(g.hi)} c ${dl(g.cLo)}..${dl(g.cHi)}]"
    }
    info(s"kBloom=$kBloom")
    info("range: " + rangeKept.map(show).mkString(" "))
    info("zone:  " + zoneKept.map(show).mkString(" "))
    info("full:  " + fullKept.map(show).mkString(" "))

    // each layer strictly shrinks the schedule
    assert(files(zoneKept).subsetOf(files(rangeKept)))
    assert(files(fullKept).subsetOf(files(zoneKept)))
    assert(zoneKept.size < rangeKept.size,
      s"zone map pruned nothing: ${rangeKept.size} -> ${zoneKept.size}")
    assert(fullKept.size < zoneKept.size,
      s"bloom pruned nothing: ${zoneKept.size} -> ${fullKept.size}")
    info(s"kept: range=${rangeKept.size} +zone=${zoneKept.size} +bloom=${fullKept.size} of ${segs.size}")

    // and the composed scan still returns exactly the present key's
    // matching cells (residual filters re-apply — pruning is invisible)
    val rows = spark.read.format("graft-kv").load(dir)
      .filter(F.col("k").isin(Seq(kPresent, kZoneVictim, kBloom).map(x => beLong(x): Any): _*)
        && F.col("c") >= F.lit(cLo))
      .collect().map(r => (java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](0)).getLong,
        java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1)).getLong)).toSet
    assert(rows == (0 until 10).map(j => (kPresent, kPresent * 10 + j)).toSet)
  }
}
