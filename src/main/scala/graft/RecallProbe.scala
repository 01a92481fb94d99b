package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{AnnQueries => A, DedupQueries => D}

/** Diagnostic: print the live recall_ppm of every approximate similarity
  * path against its in-plan exact baseline at a given SF dir — the
  * numbers the driver-gated floors in AnnQueries are set under.
  *
  *   sbt "runMain graft.RecallProbe /root/testdata/sf0.01"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("s_ann_lsh", () => A.recallOf(A.sAnnLsh(spark, dir),
        A.sAnnTopk(spark, dir), Seq("q_id", "n_id"))),
      ("s_ann_ivf", () => A.recallOf(A.sAnnIvf(spark, dir),
        A.sAnnTopk(spark, dir), Seq("q_id", "n_id"))),
      ("s_ann_pq", () => A.recallOf(A.sAnnPq(spark, dir),
        A.sAnnTopk(spark, dir), Seq("q_id", "n_id"))),
      // the gates' actual floor sources since r10: md5-least-256 sampled
      // baselines (O(sample·corpus) — what the gates run at any SF)
      ("s_knn_graph_lsh", () => A.knnLshSampledRecall(spark, dir)),
      ("d_embed_dup_lsh", () => D.embedDupLshSampledRecall(spark, dir)),
      ("d_semdedup_drops", () => D.semDedupSampledRecall(spark, dir)))
    probes.foreach { case (name, f) =>
      val r = f().collect()(0)
      println(f"[recall] $name%-18s n_exact=${r.getLong(0)}%-6d " +
        f"n_hit=${r.getLong(1)}%-6d recall_ppm=${r.getLong(2)}")
    }
    // per-query ANN hit counts (floor sources for the r10 per-query
    // entry gates: *PerQueryMinHits)
    Seq(("lsh", A.sAnnLsh _), ("ivf", A.sAnnIvf _), ("pq", A.sAnnPq _))
      .foreach { case (nm, f) =>
        val hits = A.recallPerQuery(f(spark, dir), A.sAnnTopk(spark, dir))
          .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
        println(s"[recall] ann_perq:$nm " +
          hits.map { case (q, h) => s"q$q=$h" }.mkString(" ") +
          s" min=${hits.map(_._2).min}")
      }
    // per-source training accuracy (floor source for d_quality_model_gate)
    graft.pipeline.QualityModel.dQualityAudit(spark, dir).collect()
      .foreach { r =>
        println(f"[recall] quality_acc:${r.getString(0)}%-14s " +
          f"n=${r.getLong(1)}%-6d acc_pct=${100L * r.getLong(3) / r.getLong(1)}")
      }
    spark.stop()
  }
}
