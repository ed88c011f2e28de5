package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite
import graft.engine.MapleJuice
import graft.functions.VecOps
import graft.plans.TopK

/** ScalaCheck properties for the custom operators: each is checked
  * against its naive/composable twin on random inputs. */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: saltedJoin ≡ plain inner join for any salt") {
    val gen = for {
      probe <- Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(0, 99)))
      build <- Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 8L), Gen.alphaStr.map(_.take(4))))
      salt <- Gen.chooseNum(1, 7)
    } yield (probe, build.distinctBy(_._1), salt)
    check(Prop.forAll(gen) { case (probe, build, salt) =>
      val p = probe.toDF("k", "v")
      val b = build.toDF("k2", "w")
      val salted = MapleJuice.saltedJoin(p, b, col("k"), col("k2"), salt)
        .collect().map(_.toString).sorted.toSeq
      val plain = p.join(b, col("k") === col("k2"))
        .collect().map(_.toString).sorted.toSeq
      salted == plain
    })
  }

  test("property: TopK.perKey ≡ sortBy.take(k) per key") {
    val gen = for {
      rows <- Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(-100, 100)))
      k <- Gen.chooseNum(1, 5)
    } yield (rows, k)
    check(Prop.forAll(gen) { case (rows, k) =>
      val df = rows.toDF("key", "v")
      val got = TopK.perKey(df, k, Seq(col("key")), Seq(col("v") -> true, col("key") -> true))
        .as[(Int, Int)].collect().toSeq.groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted).toMap
      // naive twin: per key, k smallest values (ties resolved by value
      // order — identical multiset either way)
      val want = rows.groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.take(k)).toMap
      got == want
    }, n = 6)
  }

  test("property: SortedIntersectCount ≡ set intersection size") {
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 30L)).map(_.distinct.sorted)
    check(Prop.forAll(Gen.zip(arrGen, arrGen)) { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(VecOps.sorted_intersect_count(col("a"), col("b")))
        .as[Long].head()
      got == a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("property: VecDot ≡ left fold of products (bit-exact)") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 16.0))
    check(Prop.forAll(Gen.zip(vecGen, vecGen)) { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(VecOps.vec_dot(col("a"), col("b"))).as[Double].head()
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      got == want // exact, not approx
    })
  }

  test("property: MediaDecoder never throws, always yields 3 features") {
    // random bytes, plus random bytes behind each magic prefix so every
    // decoder's parse path gets hostile input — the contract is total
    val magics = Seq(
      Array[Byte](), // pure random
      "RIFF1234WAVE".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII"),
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
      "GIF89a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"))
    val gen = for {
      prefix <- Gen.oneOf(magics)
      body <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield prefix ++ body.toArray
    check(Prop.forAll(gen) { payload =>
      val m = graft.ext.MediaDecoder.decode(payload)
      m.feature.length == 3 && m.format != null
    }, n = 40)
  }

  test("property: componentsOf ≡ union-find on random pair graphs") {
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 20L)))
      .map(_.filter { case (a, b) => a != b }.map { case (a, b) =>
        (math.min(a, b), math.max(a, b))
      })
      .suchThat(_.nonEmpty)
    check(Prop.forAll(gen) { pairs =>
      // local union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(n => n -> find(n)).toMap
      // both hop profiles must reach the same union-find fixpoint
      val hops = if (pairs.size % 2 == 0) 1 else 2
      val got = graft.ext.Dedup.componentsOf(
          pairs.distinct.toDF("id1", "id2"), hopsPerRound = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }, n = 6)
  }

  test("property: componentsOf non-convergence throws loudly and releases caches") {
    // a chain far longer than the pointer-jumping reach (≤ 2^(r+2)
    // after r rounds) cannot reach its fixpoint: the contract is a
    // LOUD failure (no silently-partial labeling) with every loop
    // cache released before the throw — the session is shared.
    val sc = spark.sparkContext
    val gen = Gen.zip(Gen.chooseNum(40L, 60L), Gen.chooseNum(1, 2))
    check(Prop.forAll(gen) { case (len, rounds) =>
      val chain = (0L until len).map(i => (i, i + 1)).toDF("id1", "id2")
      val before = sc.getPersistentRDDs.keySet
      val e = intercept[IllegalArgumentException] {
        graft.ext.Dedup.componentsOf(chain, maxRounds = rounds)
      }
      val leaked = sc.getPersistentRDDs.keySet -- before
      e.getMessage.contains("did not converge") && leaked.isEmpty
    }, n = 4)
  }
}
