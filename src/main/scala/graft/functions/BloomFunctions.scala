package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's OWN bloom-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind Catalyst's runtime-filter join optimization, kept internal in
  * the stock function registry). Exposed here as SQL functions so the
  * engine can build EXPLICIT bloom pre-filters (Joins.j7): a semi-join
  * where the build side's key set is sketched into a few MB of bits,
  * the probe side is pruned BEFORE its shuffle, and the exact join
  * afterwards removes the false positives — the classic 100 TB pattern
  * for joining a fact table against a selective dimension when the
  * dim's key set is too large to broadcast as a hash relation but fits
  * as a bloom sketch.
  *
  * `might_contain` requires its bloom argument to be foldable or a
  * scalar subquery (Catalyst type check), so j7 phrases the probe via
  * `spark.sql` with a scalar subquery.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    Registration.ensure(spark, "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0)).toAggregateExpression())
    Registration.ensure(spark, "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)))
  }
}
