package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.{SparkSpec, Tables}

class HygieneSpec extends SparkSpec {

  test("pii scrub redacts every injected doc and leaves no email/phone behind") {
    val perSource = Tables(spark, SF, "documents")
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.when(F.col("doc_id") % 3 =!= 0, 1L).otherwise(0L)).as("inj"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = HygieneQueries.tPiiScrub(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, inj) = perSource(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == inj, s"${r.getString(0)}: every injected doc must be redacted")
      assert(r.getLong(3) > 0L, "redaction must remove characters")
      val witness = r.getString(4)
      assert(!witness.matches(""".*[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}.*"""), "email survived scrub")
      assert(!witness.matches(""".*\d{3}-\d{4}.*"""), "phone survived scrub")
    }
  }

  test("decontamination flags exactly the train docs sharing an 8-gram with the eval set") {
    def shingles(text: String): Set[String] = {
      val w = text.split(" ")
      if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val docs = Tables(spark, SF, "documents").select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bench = docs.filter(_._1 % 97 == 0).flatMap(d => shingles(d._2)).toSet
    val expected = docs.filter(_._1 % 97 != 0).groupBy(_._3).map { case (src, ds) =>
      src -> (ds.length.toLong, ds.count(d => shingles(d._2).exists(bench)).toLong)
    }
    val got = HygieneQueries.dDecontam(spark, SF).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (nTrain, nContam) = expected(r.getString(0))
      assert(r.getLong(1) == nTrain, s"${r.getString(0)}: train count")
      assert(r.getLong(2) == nContam, s"${r.getString(0)}: contaminated count")
    }
  }
}
