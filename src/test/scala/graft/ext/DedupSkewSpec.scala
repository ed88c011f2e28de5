package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Skew guards for the bucketed candidate generators: a mass-duplicated
  * corpus must produce a BOUNDED candidate set (the cap), and on the
  * driver corpora the cap must be invisible (identical results with and
  * without it).
  */
class DedupSkewSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("band candidates: 1000 identical docs stay bounded by the bucket cap") {
    import spark.implicits._
    val docs = (1L to 1000L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val pairs = Dedup.bandCandidates(Dedup.shingled(docs)).count()
    val cap = Dedup.bucketCap.toLong
    // identical docs share every band signature: exactly C(cap, 2)
    // pairs survive, never the quadratic C(1000, 2) = 499500
    assert(pairs == cap * (cap - 1) / 2, s"got $pairs pairs")
  }

  test("band candidate cap is invisible on the driver corpus") {
    val sh = Dedup.shingled(graft.engine.Tables(spark, sf, "documents"))
    val capped = Dedup.bandCandidates(sh)
    val uncapped = Dedup.bandCandidates(sh, Int.MaxValue)
    assert(capped.count() == uncapped.count())
    assert(capped.exceptAll(uncapped).isEmpty && uncapped.exceptAll(capped).isEmpty)
  }

  test("componentsOf: fixpoint min-label propagation finds exact components") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3 → several rounds), pair 10-11, triangle-ish 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id1", "id2")
    val got = Dedup.componentsOf(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("capBuckets keeps exactly the cap lowest ids per bucket") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((s"b${rnd.nextInt(5)}", rnd.nextInt(10000).toLong))
      .distinct
    val df = rows.toDF("bucket", "doc_id")
    val got = Dedup.capBuckets(df, Seq("bucket"), "doc_id", 16)
      .as[(String, Long)].collect().toSet
    // the shared cap idiom's contract: deterministic membership — the
    // `cap` LOWEST ids of each bucket, nothing else
    val want = rows.groupBy(_._1).toSeq.flatMap { case (b, rs) =>
      rs.map(_._2).sorted.take(16).map(x => (b, x))
    }.toSet
    assert(got == want)
  }

  test("LSH sign buckets on the driver corpus are under the corpus-side cap") {
    val v = graft.engine.Tables(spark, sf, "embeddings")
      .withColumn("e", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val bits = Similarity.planes.map { p =>
      val lit = p.map(d => s"${d}D").mkString("array(", ", ", ")")
      when(graft.functions.VecOps.vec_dot(col("e"), expr(lit)) > 0, "1").otherwise("0")
    }
    val maxBucket = v.withColumn("bucket", concat(bits: _*))
      .groupBy("bucket").count().agg(max("count")).first().getLong(0)
    assert(maxBucket <= Similarity.lshBucketCap)
  }
}
