package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

class MapleJuiceSpec extends SparkSuite {
  import spark.implicits._

  test("maple is flatMap: 0..n outputs per input") {
    val ds = spark.createDataset(Seq("a,1", "bad", "b,2"))
    val out = MapleJuice.maple(ds) { l =>
      l.split(",") match {
        case Array(k, v) => Some((k, v))
        case _           => None
      }
    }.collect().toSet
    assert(out == Set(("a", "1"), ("b", "2")))
  }

  test("juice groups all values of a key (reference juice contract)") {
    val ds = spark.createDataset(Seq(("k1", 1), ("k2", 5), ("k1", 3)))
    val out = MapleJuice.juice(ds)(_._1) { (k, it) =>
      Iterator((k, it.map(_._2).sum))
    }.collect().toMap
    assert(out == Map("k1" -> 4, "k2" -> 5))
  }

  test("maple∘juice ≡ groupBy.sum on arbitrary KV sets (ScalaCheck)") {
    val kvGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(-50, 50)))
    val prop = Prop.forAll(kvGen) { kvs =>
      val ds = spark.createDataset(kvs)
      val viaEngine = MapleJuice.juice(ds)(_._1) { (k, it) =>
        Iterator((k, it.map(_._2.toLong).sum))
      }.collect().toMap
      val viaSql = ds.toDF("k", "v").groupBy("k").agg(sum("v").as("s"))
        .as[(String, Long)].collect().toMap
      viaEngine == viaSql
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("hash and range shuffle produce identical aggregates (D4/D5)") {
    val df = spark.range(1000).select(
      (col("id") % 13).as("k"), col("id").as("v"))
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(sum("v").as("s")).orderBy("k").collect().toSeq
    val hash = agg(MapleJuice.shuffle(df, ShuffleOption.Hash, 7, col("k")))
    val range = agg(MapleJuice.shuffle(df, ShuffleOption.Range, 7, col("k")))
    val none = agg(df)
    assert(hash == none && range == none)
  }

  test("chain composes stages lazily (D7)") {
    val df = spark.range(100).select((col("id") % 10).as("k"))
    val out = MapleJuice.chain(df,
      d => d.groupBy("k").agg(count(lit(1)).as("c")),
      d => d.groupBy("c").agg(count(lit(1)).as("n")))
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 10) // 10 keys × count 10
  }

  test("saltedJoin rejects outer join types, allows inner/left") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((1, "y")).toDF("k2", "w")
    intercept[IllegalArgumentException] {
      MapleJuice.saltedJoin(a, b, col("k"), col("k2"), 4, "full_outer")
    }
    assert(MapleJuice.saltedJoin(a, b, col("k"), col("k2"), 4, "left_outer").count() == 1)
  }

  test("saltedJoin survives inputs that already carry the helper column names") {
    val a = Seq((1, 99)).toDF("k", "__salt_p")
    val b = Seq((1, 98)).toDF("k2", "__salt_b")
    val out = MapleJuice.saltedJoin(a, b, col("k"), col("k2"), 4).collect()
    assert(out.length == 1)
    // user columns pass through untouched; only the fresh helpers drop
    assert(out(0).schema.fieldNames.toSet == Set("k", "__salt_p", "k2", "__salt_b"))
    assert(out(0).getAs[Int]("__salt_p") == 99 && out(0).getAs[Int]("__salt_b") == 98)
  }

  test("saltedJoinHot equals the plain join, salting only diagnosed hot keys") {
    // key 1 is hot (100 probe rows); 2..20 appear once; 99 matches nothing
    val probe = (Seq.fill(100)((1, "h")) ++ (2 to 20).map(k => (k, s"v$k")) :+ (99, "x"))
      .toDF("k", "v")
    val build = (1 to 25).map(k => (k, k * 10)).toDF("k2", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    for (jt <- Seq("inner", "left")) {
      val plain = canon(probe.join(build, col("k") === col("k2"), jt))
      val auto = canon(MapleJuice.saltedJoinHot(
        probe, build, col("k"), col("k2"), salt = 4, hotThreshold = 50, joinType = jt))
      assert(auto == plain, s"joinType=$jt")
    }
    // threshold nothing exceeds → pure plain path, still identical
    val none = canon(MapleJuice.saltedJoinHot(
      probe, build, col("k"), col("k2"), salt = 4, hotThreshold = 1000))
    assert(none == canon(probe.join(build, col("k") === col("k2"))))
  }

  test("pipeMaple streams lines through an external executable (D1 fidelity)") {
    val ds = spark.createDataset(Seq("x", "y", "z"))
    val out = MapleJuice.pipeMaple(ds, Seq("cat")).collect().toSet
    assert(out == Set("x", "y", "z"))
  }
}
