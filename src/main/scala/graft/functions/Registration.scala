package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Once-per-session temp-function registration, memoized WITHOUT
  * retaining the session: the memo IS the session's own function
  * registry ("does `name` already resolve?"), so nothing here ever
  * pins a `SparkSession` — a strong-keyed map would grow unboundedly
  * in long-lived serving processes, where foreachBatch clones a
  * session per streaming query and Thrift creates one per connection
  * (the r10 ADVICE finding against the old TrieMap memo).
  *
  * Why memoize at all: the serving path registers on every request,
  * and an unconditional `createOrReplaceTempFunction` logs a
  * replaced-function WARN and takes the registry's write path at
  * request rate. The double-checked process lock closes the remaining
  * race (two concurrent FIRST calls on one session, where the second
  * create would "replace" the first and still WARN); after the first
  * registration the fast path is one registry lookup, lock-free here.
  */
private[graft] object Registration {
  def ensure(spark: SparkSession, name: String,
             builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!reg.functionExists(id)) synchronized {
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
