package graft.functions

import org.apache.spark.sql.{Column, GraftAgg, GraftColumn}

/** Bounded top-k-by-key aggregation — the scale-safe alternative to a
  * `row_number().over(partitionBy(key).orderBy(score))` rank filter
  * when the per-key candidate stream is huge.
  *
  * The rank-window form compiles to a per-partition SORT of the ENTIRE
  * candidate stream before WindowGroupLimit can drop rows: fine when
  * candidates-per-key are bounded (q7's per-nation orders, keywords'
  * per-doc vocabulary), catastrophic when the stream is
  * n·probes·cellsize — the kNN self-join's candidate volume reaches
  * ~5·10^9 rows at 200k vectors and the sort spilled >60 GB of disk
  * before dying (measured, r11). `collect_top_k` instead aggregates
  * with a k-element bounded heap per key (Spark's own `CollectTopK`,
  * the engine primitive behind pandas-API nlargest): partial states
  * merge map-side, each map task forwards at most k elements per key
  * it saw, nothing is ever globally sorted, and shuffle volume is
  * bounded by (keys-per-map-partition)·k regardless of candidate
  * count.
  *
  * This is the GENERIC-ordering variant — any orderable struct, at a
  * per-row cost of an InternalRow copy + boxed-queue insert under an
  * interpreted ordering. For the ubiquitous (double score, long id)
  * shape, [[TopKPairs]] is the primitive-specialized twin with zero
  * per-row allocation — the kNN self-join rides it (BASELINE.md's
  * sim_knn_join section carries the measured sf10 history and the
  * heap-vs-probe-cap attribution).
  *
  * Returns the k LARGEST values under `ord`'s ordering per group as an
  * array sorted DESCENDING — element 0 is the best, i.e. array
  * position IS rank−1 (semantics pinned by TopKBySpec, measured not
  * assumed). For best-by-score with an ascending id tiebreak, pass
  * `struct(score, -id)` — largest means (max score, then min id).
  */
object TopKBy {
  def collect_top_k(ord: Column, k: Int): Column = {
    require(k >= 1, s"k must be positive, got $k")
    GraftColumn.column(
      GraftAgg.collectTopK(GraftColumn.expression(ord), k, reverse = false))
  }
}
