package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

/** Column-API entry points for Spark's native bloom-filter expressions
  * (the same machinery the optimizer's runtime row-level filtering
  * injects): `BloomFilterAggregate` builds the sketch distributedly with
  * map-side partial aggregation, `BloomFilterMightContain` probes it
  * inside whole-stage codegen. No UDF, no per-row object allocation.
  *
  * Both sides hash with xxhash64 first — the aggregate's input contract
  * (LongType) and exactly what the planner's injected filters do — so a
  * sketch built by [[bloomAgg]] and a probe by [[mightContain]] always
  * agree on the hashing scheme.
  */
object BloomFunctions {

  /** Aggregate column: serialized bloom filter over the xxhash64 of `c`,
    * sized for `expectedItems` distinct values at roughly the given
    * bits-per-item (8 bits/item ≈ 2% false positives, 10 ≈ 1%). */
  def bloomAgg(c: Column, expectedItems: Long, bitsPerItem: Int = 10): Column = {
    require(expectedItems > 0 && bitsPerItem > 0,
      s"need expectedItems > 0 and bitsPerItem > 0; got $expectedItems/$bitsPerItem")
    GraftSqlBridge.column(new BloomFilterAggregate(
      GraftSqlBridge.expression(xxhash64(c)),
      Literal(expectedItems),
      Literal(expectedItems * bitsPerItem)).toAggregateExpression())
  }

  /** True when `c` MIGHT be in the sketch (false positives at the
    * configured rate, never false negatives); `bloom` must be a constant
    * (typically `lit(serializedFilter)`). */
  def mightContain(bloom: Column, c: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(bloom),
      GraftSqlBridge.expression(xxhash64(c))))
}
