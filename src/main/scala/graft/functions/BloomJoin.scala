package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter runtime prefilter for selective joins — the manual
  * form of the engine's runtime-filter pattern (Spark keeps
  * `bloom_filter_agg` / `might_contain` unregistered; this wires the
  * same Catalyst expressions through the DataFrame API).
  *
  * Scale shape, at 100 TB: the filter side (a selective dim) collapses
  * to ONE binary scalar of `numBits / 8` bytes built by a single
  * aggregate, rides to every fact-side task as a scalar-subquery
  * result, and drops non-matching fact rows BEFORE the join shuffle —
  * the exchange then carries only `matching + ε·fp` rows instead of
  * the whole fact table. False positives are removed by the exact
  * join that follows, so composed results are exact; the bloom only
  * buys shuffle reduction. Reference analog: a combiner-side filter
  * (partitioner-level pruning is the closest MapleJuice shape —
  * `MapleJuice.java` hash partition, SURVEY §2.2 D4).
  */
object BloomJoin {

  /** `fact` rows whose `factKey` MIGHT be in `dim`'s `dimKey` set,
    * per a bloom filter of `numBits` bits sized for `estItems`
    * distinct keys. Exact-superset contract: never drops a matching
    * row; follow with the exact join for exact results. */
  def prefilter(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      estItems: Long, numBits: Long): DataFrame = {
    require(estItems > 0 && numBits > 0, "bloom sizing must be positive")
    val bloom = dim.select(GraftBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftBridge.expression(dimKey))),
        Literal(estItems), Literal(numBits)).toAggregateExpression()).as("bf"))
    val mightContain = BloomFilterMightContain(
      ScalarSubquery(GraftBridge.logicalPlan(bloom)),
      new XxHash64(Seq(GraftBridge.expression(factKey))))
    fact.filter(GraftBridge.column(mightContain))
  }
}
