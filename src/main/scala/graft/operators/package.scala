package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the operator catalog.
  *
  * Oracle-exactness: the driver hash-compares our parquet output against
  * DuckDB running `SparkEntry.oracleSql` on the same files. Floating-point
  * aggregation is association-order-dependent, and Spark's partition/merge
  * order differs from DuckDB's scan order — so every double aggregate in an
  * oracle-checked query goes through fixed-point decimal (exact, associative,
  * commutative) and is cast back to double at the end. Both engines then
  * produce bit-identical IEEE doubles. The same decimal cast appears in the
  * oracle SQL.
  *
  * This costs nothing at scale: decimal sum is still a single partial+final
  * hash aggregate (map-side combine), no extra shuffle.
  */
package object operators {

  /** Exact sum of a double column — `cast(sum(cast(c as decimal(18,6))) as double)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact sum with empty-group → 0 parity (the reference's `|| 0`,
    * /root/reference/index.js:341,566,1210). */
  def dsum0(c: Column): Column = coalesce(dsum(c), lit(0.0))

  /** Exact average: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Oracle-SQL fragments matching the helpers above. */
  def sqlDsum(e: String): String = s"cast(sum(cast($e as decimal(18,6))) as double)"
  def sqlDsum0(e: String): String = s"coalesce(${sqlDsum(e)}, 0.0)"
  def sqlDavg(e: String): String = s"(${sqlDsum(e)} / count($e))"

  /** Cross-engine-stable 9-decimal round for LARGE-magnitude doubles.
    * `round(x, 9)` diverges between engines when |x|·10⁹ nears 2^53:
    * DuckDB rounds via `nearbyint(x * 1e9) / 1e9` while Spark rounds
    * the exact BigDecimal expansion of x — near a half boundary the
    * multiply's extra IEEE rounding can flip the last digit (observed
    * on e11 at sf0.1: |x|≈3e4 at scale 6). Writing the multiply
    * EXPLICITLY on both sides makes both engines round the identical
    * scaled double — bit-equal always. Use for rounded columns whose
    * magnitude can exceed ~1e3; plain `round(_, 9)` is fine for O(1)
    * ratios (danger ≈ ulp(|x|·10⁹)/2 per value). */
  def round9stable(c: Column): Column = round(c * 1e9, 0) / 1e9

  /** Oracle-SQL fragment matching `round9stable`. */
  def sqlRound9(e: String): String = s"round(($e) * 1e9, 0) / 1e9"

  /** Null-tolerant count-if (reference conditional counts,
    * /root/reference/index.js:335-337,557-559). */
  def countIf(cond: Column): Column = count(when(cond, lit(1)))

  /** Presentation sort for SMALL result sets (filtered pairs, top-k):
    * shuffle the few surviving rows to one partition and sort there.
    * Equivalent output to `orderBy(cols)`, but avoids RangePartitioning,
    * whose boundary-sampling pass re-executes the child subtree up to
    * the previous shuffle — for kernels whose final stage is map-side
    * (e.g. the blocked all-pairs cosine) that doubles the whole query.
    * Use ONLY where the result is known-small; large results keep
    * `orderBy` (distributed range sort). */
  def presentSorted(df: org.apache.spark.sql.DataFrame, cols: Column*): org.apache.spark.sql.DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Idempotent cache re-assertion for memoized build-once frames: an
    * external `spark.catalog.clearCache()` (the bench does this between
    * reps) unregisters the plan, after which a memoized iterative frame
    * silently recomputes its subtree at EVERY reference. Re-persisting
    * on access restores build-once semantics; the storageLevel guard
    * keeps the already-cached path warning-free. */
  def ensureCached(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist() else df
}
