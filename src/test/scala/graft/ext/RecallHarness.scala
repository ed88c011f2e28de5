package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.VecOps.{sorted_intersect_count, vec_dot, vec_norm2}

/** Recall/precision measurement for the two approximate candidate
  * generators, against exact ground truth:
  *
  *   - MinHash-LSH near-dup: a labeled corpus of seed documents plus
  *     mutants with controlled mutation counts; ground truth is exact
  *     all-pairs shingle Jaccard ≥ 0.8 (computed, not assumed — so
  *     mutant-mutant near-dups count too).
  *   - Hyperplane-LSH ANN: ground truth is brute-force cosine top-k on
  *     the driver embeddings corpus.
  *
  * `main` prints the parameter-sweep tables recorded in RECALL.md;
  * RecallSpec asserts the shipped configurations' floors so a silent
  * parameter regression fails the build.
  */
object RecallHarness {

  // ── labeled near-dup corpus ──

  /** 60 seeds × (1 + 7 mutants at fixed mutation counts). 100-token
    * docs over a 500-word vocab: m token replacements kill ≤ 3m of 98
    * shingles, so jac(m) ≈ (98-3m)/(98+3m) — m ∈ 1..4 straddles the
    * 0.8 truth threshold from above, 6/10/15 from below. */
  def labeledCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val vocab = Array.tabulate(500)(i => s"w$i")
    val mutCounts = Seq(1, 2, 3, 4, 6, 10, 15)
    val rows = (0 until 60).flatMap { s =>
      val seed = Array.fill(100)(vocab(rnd.nextInt(vocab.length)))
      val seedId = s.toLong * 100
      (seedId, seed.mkString(" ")) +: mutCounts.zipWithIndex.map { case (m, k) =>
        val mut = seed.clone()
        (0 until m).foreach { _ =>
          mut(rnd.nextInt(mut.length)) = vocab(rnd.nextInt(vocab.length))
        }
        (seedId + k + 1, mut.mkString(" "))
      }
    }
    rows.toDF("doc_id", "text")
  }

  /** Exact all-pairs Jaccard ≥ threshold over the (small, labeled)
    * corpus — the ground truth the approximate generators chase. */
  def truthPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val g = sh.select(col("doc_id"), col("hs"))
    val a = g.as("a"); val b = g.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", sorted_intersect_count(col("a.hs"), col("b.hs")))
      .withColumn("jac",
        col("inter").cast("double") /
          (expr("size(a.hs)") + expr("size(b.hs)") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
  }

  final case class PR(recall: Double, precision: Double, nCand: Long, nTruth: Long)

  def prOf(cand: DataFrame, truth: DataFrame): PR = {
    val c = cand.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = truth.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = (c & t).size.toDouble
    PR(if (t.isEmpty) 1.0 else hit / t.size,
      if (c.isEmpty) 1.0 else hit / c.size, c.size.toLong, t.size.toLong)
  }

  /** Sweep MinHash-LSH (bands × rowsPerBand) configs on the labeled corpus. */
  def minhashSweep(spark: SparkSession): Seq[(String, PR)] = {
    val sh = Dedup.shingled(labeledCorpus(spark)).cache()
    val truth = truthPairs(sh, 0.8).cache()
    truth.count() // materialize before the sweep reuses sh
    val configs = Seq( // (label, perms, bands, rowsPerBand)
      ("8 hashes, 4 bands x 2 (shipped)", Dedup.perms, 4, 2),
      ("8 hashes, 8 bands x 1", Dedup.minhashPerms(8), 8, 1),
      ("16 hashes, 8 bands x 2", Dedup.minhashPerms(16), 8, 2),
      ("16 hashes, 4 bands x 4", Dedup.minhashPerms(16), 4, 4),
      ("12 hashes, 4 bands x 3", Dedup.minhashPerms(12), 4, 3),
      ("32 hashes, 16 bands x 2", Dedup.minhashPerms(32), 16, 2))
    val out = configs.map { case (label, ps, b, r) =>
      label -> prOf(Dedup.bandCandidatesParam(sh, ps, b, r), truth)
    }
    sh.unpersist(); truth.unpersist()
    out
  }

  // ── hyperplane ANN recall@k ──

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Similarity.emb(spark, dir)

  /** Clustered synthetic embeddings — the REALISTIC structure the
    * driver corpus lacks (RECALL.md documents its near-uniformity as
    * the LSH worst case): `nClusters` planted unit centroids (seeded
    * gaussian, pairwise cosine ≈ ±1/√dim ≈ 0.12) with `perCluster`
    * points each at centroid + σ·gaussian. σ = 0.05 on 64 dims gives
    * intra-cluster pair cosine ≈ 1/(1+σ²·dim) ≈ 0.86 vs inter ≈ 0 —
    * the separation profile of real near-neighbor embeddings.
    * vec_id INTERLEAVES clusters (vec_id mod nClusters = cluster), so
    * any query prefix spans all clusters and the IVF first-K seeds
    * land one per cluster. */
  def clusteredEmb(spark: SparkSession, nClusters: Int = 16,
      perCluster: Int = 125, dim: Int = 64,
      noise: Double = 0.05): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(13)
    def gauss(n: Int) = Array.fill(n)(rnd.nextGaussian())
    def unit(a: Array[Double]) = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    val cents = Array.fill(nClusters)(unit(gauss(dim)))
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = cents(i % nClusters)
      (i.toLong, c.zip(gauss(dim)).map { case (x, g) => x + noise * g })
    }
    rows.toDF("vec_id", "e")
      .withColumn("nrm", sqrt(vec_norm2(col("e"))))
  }

  /** (query_id, neighbor_id) top-k sets per query via an LSH bucket of
    * `nPlanes` sign bits; nPlanes = 0 → exact brute force. */
  def annTopK(spark: SparkSession, dir: String, nPlanes: Int, k: Int,
      nQueries: Int): DataFrame =
    annTopKV(emb(spark, dir), nPlanes, k, nQueries)

  def annTopKV(corpus: DataFrame, nPlanes: Int, k: Int,
      nQueries: Int): DataFrame = {
    val base = corpus.select("vec_id", "e", "nrm")
    val v =
      if (nPlanes == 0) base.withColumn("bucket", lit("all"))
      else base.withColumn("bucket",
        Similarity.bucketColFor(Similarity.planesFor(nPlanes), col("e")))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val cand = v.join(q, Seq("bucket")).filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        vec_dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** Multi-table LSH: L independent tables of r planes each; candidates
    * are the union over tables (distinct pairs), then exact re-rank.
    * Plane i of table t is global plane t*r+i from the same sequence. */
  def annTopKMulti(spark: SparkSession, dir: String, tables: Int, planesPerTable: Int,
      k: Int, nQueries: Int): (DataFrame, Double) =
    annTopKMultiV(emb(spark, dir), tables, planesPerTable, k, nQueries)

  def annTopKMultiV(corpus: DataFrame, tables: Int, planesPerTable: Int,
      k: Int, nQueries: Int): (DataFrame, Double) = {
    val all = Similarity.planesFor(tables * planesPerTable)
    val base = corpus.select("vec_id", "e", "nrm")
    val sigs = (0 until tables).map { t =>
      val ps = all.slice(t * planesPerTable, (t + 1) * planesPerTable)
      concat(lit(s"t$t|"), Similarity.bucketColFor(ps, col("e")))
    }
    val v = base.select(col("vec_id"), col("e"), col("nrm"),
      explode(array(sigs: _*)).as("bucket"))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val cand = v.join(q, Seq("bucket")).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qe"), col("qn"),
        col("e"), col("nrm"))
      .distinct() // a pair found by several tables re-ranks once
    val nCand = cand.count().toDouble / nQueries
    val scored = cand.withColumn("cos",
      vec_dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    (scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id")), nCand)
  }

  final case class MultiPoint(tables: Int, planesPerTable: Int,
      recallAtK: Double, candPerQuery: Double)

  def annSweepMulti(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 64,
      configs: Seq[(Int, Int)] = Seq((2, 4), (4, 4), (8, 4), (4, 6), (8, 6), (4, 8), (8, 8), (16, 4))): Seq[MultiPoint] =
    annSweepMultiV(emb(spark, dir), k, nQueries, configs)

  def annSweepMultiV(corpus: DataFrame, k: Int = 5, nQueries: Int = 64,
      configs: Seq[(Int, Int)] = Seq((2, 4), (4, 4), (8, 4), (4, 6), (8, 6), (4, 8), (8, 8), (16, 4))): Seq[MultiPoint] = {
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(annTopKV(corpus, 0, k, nQueries))
    configs.map { case (l, r) =>
      val (df, nc) = annTopKMultiV(corpus, l, r, k, nQueries)
      MultiPoint(l, r, (pairs(df) & truth).size.toDouble / truth.size, nc)
    }
  }

  /** IVF recall@5 on an arbitrary corpus: full Lloyd fit + the
    * production probe (nprobe 2 of 16, queries vec_id 100–107 — the
    * q_ann_ivf contract) vs brute-force truth. */
  def ivfRecall(corpus: DataFrame): Double = {
    val v = corpus.select("vec_id", "e", "nrm")
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(
      annTopKV(v, 0, 5, 108).filter(col("query_id") >= 100)
        .select("query_id", "neighbor_id"))
    val (cent, cells) = Similarity.kmeansFit(v)
    val got = pairs(Similarity.ivfProbe(v, cent, cells)
      .select("query_id", "neighbor_id"))
    (got & truth).size.toDouble / truth.size
  }

  /** MRL recall@k on an arbitrary corpus: stage 1 ranks by cosine on
    * the `prefixDims`-dim prefix, keeps `stage1` candidates, exact
    * re-rank — the q_ann_mrl shape. */
  def mrlRecall(corpus: DataFrame, prefixDims: Int = 16,
      stage1: Int = 50, k: Int = 10, nQueries: Int = 8): Double = {
    val v = corpus.select("vec_id", "e", "nrm")
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(annTopKV(v, 0, k, nQueries)
      .select("query_id", "neighbor_id"))
    val pref = v
      .withColumn("ep", expr(s"slice(e, 1, $prefixDims)"))
      .withColumn("np", sqrt(vec_norm2(col("ep"))))
    val q = pref.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("ep").as("qep"),
        col("np").as("qnp"), col("e").as("qe"), col("nrm").as("qn"))
    val cand = pref.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosp", vec_dot(col("qep"), col("ep")) / (col("qnp") * col("np")))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("cosp").desc, col("vec_id"))
    val rr = cand.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= stage1)
      .withColumn("cos", vec_dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    val got = pairs(rr.withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") <= k).select("query_id", "vec_id"))
    (got & truth).size.toDouble / truth.size
  }

  /** Embedding near-dup candidate recall: exact all-pairs cosine ≥ t
    * ground truth vs the capped multi-table sign-bucket candidates
    * (q_dedup_embed's generator). Collision probability rises steeply
    * with cosine — the sweep shows recall per threshold band. */
  def embedDedupSweep(spark: SparkSession, dir: String,
      thresholds: Seq[Double] = Seq(0.3, 0.4, 0.5)): Seq[(Double, PR)] = {
    val v = emb(spark, dir).select("vec_id", "e", "nrm").cache()
    val a = v.as("a"); val b = v.as("b")
    val allPairs = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        vec_dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"), col("cos"))
      .cache()
    allPairs.count()
    val cand = Similarity.lshCandidatePairs(v).cache()
    val out = thresholds.map { t =>
      t -> prOf(cand, allPairs.filter(col("cos") >= t).select("id1", "id2"))
    }
    v.unpersist(); allPairs.unpersist(); cand.unpersist()
    out
  }

  final case class AnnPoint(nPlanes: Int, recallAtK: Double, avgCand: Double)

  def annSweep(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 64, planeCounts: Seq[Int] = Seq(4, 6, 8, 10, 12, 16)): Seq[AnnPoint] =
    annSweepV(emb(spark, dir), k, nQueries, planeCounts)

  def annSweepV(corpus: DataFrame, k: Int = 5, nQueries: Int = 64,
      planeCounts: Seq[Int] = Seq(4, 6, 8, 10, 12, 16)): Seq[AnnPoint] = {
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(annTopKV(corpus, 0, k, nQueries))
    val nVec = corpus.count()
    planeCounts.map { p =>
      val got = pairs(annTopKV(corpus, p, k, nQueries))
      val recall = (got & truth).size.toDouble / truth.size
      // expected candidates scanned per query ≈ corpus / 2^planes
      AnnPoint(p, recall, nVec.toDouble / math.pow(2, p))
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSuite.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    println("== MinHash-LSH near-dup recall (truth: exact Jaccard >= 0.8) ==")
    minhashSweep(spark).foreach { case (label, pr) =>
      println(f"${label}%-34s recall=${pr.recall}%.4f precision=${pr.precision}%.4f " +
        f"candidates=${pr.nCand}%5d truth=${pr.nTruth}%5d")
    }
    println(s"\n== Hyperplane-LSH ANN recall@5, single bucket ($dir, 64 queries) ==")
    annSweep(spark, dir).foreach { p =>
      println(f"planes=${p.nPlanes}%2d recall@5=${p.recallAtK}%.4f " +
        f"expectedCandPerQuery=${p.avgCand}%.1f")
    }
    println(s"\n== Hyperplane-LSH ANN recall@5, multi-table ($dir, 64 queries) ==")
    annSweepMulti(spark, dir).foreach { p =>
      println(f"tables=${p.tables}%2d x planes=${p.planesPerTable}%d " +
        f"recall@5=${p.recallAtK}%.4f candPerQuery=${p.candPerQuery}%.1f")
    }
    println(s"\n== Embed near-dup candidate recall (8x6 sign buckets, $dir) ==")
    embedDedupSweep(spark, dir).foreach { case (t, pr) =>
      println(f"cos>=$t%.1f recall=${pr.recall}%.4f precision=${pr.precision}%.4f " +
        f"candidates=${pr.nCand}%6d truth=${pr.nTruth}%5d")
    }

    println("\n== CLUSTERED fixture (16 planted centroids x 125, sigma 0.05) ==")
    val cv = clusteredEmb(spark).cache()
    cv.count()
    println("single-bucket LSH:")
    annSweepV(cv, planeCounts = Seq(4, 6, 8)).foreach { p =>
      println(f"  planes=${p.nPlanes}%2d recall@5=${p.recallAtK}%.4f")
    }
    println("multi-table LSH:")
    annSweepMultiV(cv, configs = Seq((4, 6), (8, 6), (8, 8))).foreach { p =>
      println(f"  tables=${p.tables}%2d x planes=${p.planesPerTable}%d " +
        f"recall@5=${p.recallAtK}%.4f candPerQuery=${p.candPerQuery}%.1f")
    }
    println(f"IVF (trained k-means, nprobe 2/16): recall@5=${ivfRecall(cv)}%.4f")
    println(f"MRL (16/64-dim prefix, re-rank 50): recall@10=${mrlRecall(cv)}%.4f")
    cv.unpersist()
  }
}
