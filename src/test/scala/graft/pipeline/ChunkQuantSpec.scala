package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** d_chunk must reproduce the closed-form chunk layout exactly, and
  * s_vec_quantize's errors must match a plain-Scala int8 quantizer
  * bit-for-bit (same fold order) and respect the quantization-step
  * bound. */
class ChunkQuantSpec extends SparkSpec {

  test("d_chunk matches a plain-Scala chunker exactly") {
    val W = 480L; val S = 400L
    val lens = graft.Tables(spark, SF, "documents")
      .select(F.col("n_chars").cast("long")).collect().map(_.getLong(0)).filter(_ > 0)
    val exp = lens.flatMap { len =>
      val n = if (len <= W) 1L else (len - W + S - 1) / S + 1
      (0L until n).map { i =>
        val st = i * S
        val en = math.min(st + W, len)
        val ov = if (i == 0) 0L else math.min((i - 1) * S + W, len) - st
        (i, en - st, ov)
      }
    }.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max)
    }.toMap
    val got = PackQueries.dChunk(spark, SF).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val e = exp(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) == e,
        s"chunk ${r.getLong(0)}")
    }
    // every doc's chunks tile it: sum of chunk lens - overlaps == total chars
    val sumLen = got.map(_.getLong(2)).sum
    val sumOv = got.map(_.getLong(3)).sum
    assert(sumLen - sumOv == lens.sum, "chunks must tile the corpus exactly")
  }

  test("s_vec_quantize matches a plain-Scala int8 quantizer and its step bound") {
    val vecs = graft.Tables(spark, SF, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val e9s = vecs.map { case (label, v) =>
      val amax = v.foldLeft(0.0)((a, x) => math.max(a, math.abs(x.toDouble)))
      val err = v.foldLeft(0.0)((a, x) =>
        a + math.abs(x.toDouble - math.floor(x.toDouble / amax * 127.0) * amax / 127.0))
      (label, math.floor(err * 1e9).toLong, amax)
    }
    val exp = e9s.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum, g.map(_._2).max, g.map(_._2).sum / g.length)
    }.toMap
    val got = AnnQueries.sVecQuantize(spark, SF).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val e = exp(r.getInt(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e, s"label ${r.getInt(0)}")
    }
    // L1 error of floor-quantization is < dims × one step (amax/127)
    e9s.foreach { case (_, e9, amax) =>
      assert(e9 >= 0 && e9 < math.ceil(64.0 * amax / 127.0 * 1e9).toLong + 1)
    }
  }
}
