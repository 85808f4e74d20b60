package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared across operators.
  *
  * The driver verifies results by hashing values against a DuckDB run of
  * equivalent SQL, so floating-point aggregation must be order-independent:
  * sums of doubles are routed through an exact DECIMAL(18,4) accumulator
  * and only then cast back to double. Ratio metrics divide two exact sums
  * (one deterministic double op) instead of averaging doubles.
  */
package object functions {

  /** Order-independent sum of a double measure: exact fixed-point
    * accumulate, double out. Matches `CAST(SUM(CAST(x AS
    * DECIMAL(18,4))) AS DOUBLE)` — computed on [[SumScaled]]'s two-long
    * 128-bit accumulator instead of Spark's decimal(28,4) buffer, which
    * pays per-row BigDecimal allocations (~80% of q1_agg at sf10).
    */
  def dsum(c: Column): Column = SumScaled.sum_scaled(c.cast("double"), 4)

  /** Non-positive denominator → 0.0. The reference guards every derived
    * metric with `den > 0` (transformer.go calculateDerivedMetrics:
    * `if metric.Clicks > 0 { ... }` etc.), not `!= 0` — a negative cost
    * must yield 0, matching here exactly.
    */
  def divSafe(num: Column, den: Column): Column =
    when(den > 0.0, num / den).otherwise(lit(0.0))

  /** Order-independent mean: exact sum / count as one double division. */
  def dmean(c: Column): Column = divSafe(dsum(c), count(c).cast("double"))

  /** Timestamp → 'yyyy-MM-dd' string; dates cross the oracle boundary as
    * strings so engine-internal date encodings never disagree. The
    * [[DateStr]] kernel replaces `date_format(c, "yyyy-MM-dd")`
    * bit-identically (ExprSpec) minus its per-row formatter walk.
    */
  def dstr(c: Column): Column = DateStr.date_str(c)

  /** Presentation ordering for results whose cardinality is bounded by
    * a key DOMAIN (status flags, channels, calendar buckets) rather
    * than the data volume: one round-robin exchange to a single
    * partition + an in-partition sort. Same rows and total order as
    * `orderBy`, but skips the range-partitioner sampling pass — a
    * whole extra job on every interactive query (measured 0.33 →
    * 0.15 s per query at sf0.1), while the aggregation below it stays
    * fully parallel. NOT for row-level outputs (extracts, per-doc
    * tables): those keep `orderBy`'s parallel range sort, which is the
    * only shape that scales with output volume.
    */
  def presentSorted(df: org.apache.spark.sql.DataFrame,
                    keys: Column*): org.apache.spark.sql.DataFrame =
    df.repartition(1).sortWithinPartitions(keys: _*)
}
