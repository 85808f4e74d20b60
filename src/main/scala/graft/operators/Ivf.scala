package graft.operators

import graft.functions.{IvfCells, VecSumF32}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path of SURVEY §2.4, complementing [[Similarity.annLsh]] the way
  * FAISS pairs IVF-Flat with LSH: a coarse k-means quantizer partitions
  * the corpus into `nlist` cells, each vector lives in EXACTLY ONE
  * cell, and a query scores only the vectors in its `nprobe` nearest
  * cells.
  *
  * Why a second ANN family: the LSH data side must explode `tables`
  * ways (a vector occupies one bucket in each of L tables), so its
  * candidate join shuffles tables·n rows no matter how selective the
  * probes are. IVF's data side is a plain single-assignment column —
  * the index pass is one shuffle-free map over the corpus, the
  * candidate join shuffles only the probed cells, and candidate volume
  * is nprobe·(n/nlist) per query by construction. The trade is a
  * training step (k-means needs the data; hyperplanes don't) and
  * data-dependent recall (cells follow corpus density; LSH's guarantees
  * are distribution-free).
  *
  * Scale design (§5):
  *  - training runs DISTRIBUTED on a deterministic hash sample capped
  *    at ~[[TrainPerCell]]·nlist rows (FAISS's own guidance trains the
  *    quantizer on a bounded sample); each Lloyd iteration is one
  *    map-side-partial aggregation of the sample — the only driver
  *    state is the nlist×dim centroid matrix itself, exactly what
  *    MLlib's KMeans collects per iteration.
  *  - centroid sums accumulate FIXED-POINT ([[VecSumF32]]): long
  *    arithmetic is associative, so centroids — and therefore cell
  *    assignments and ANN results — are bit-deterministic regardless
  *    of partition count or merge order.
  *  - assignment + probing are one codegen'd kernel ([[IvfCells]])
  *    carrying the normalized centroid matrix as a reference object:
  *    argmax-dot over unit centroids equals argmax-cosine, no
  *    per-row norm, no join against a centroid table.
  *  - the registered query honestly pays BUILD + SERVE each invocation
  *    (train, assign, probe, re-rank — like the store round trip); a
  *    production deployment amortizes training and assignment into the
  *    index store and pays only the probe join per batch.
  *
  * Determinism: no RNG anywhere — the training sample and the
  * initial centroids are selected by xxhash64 order (vec_id tiebreak),
  * Lloyd updates are fixed-point, tie-breaks in [[IvfCells]] prefer
  * the lower cell id. Two runs produce identical output rows.
  */
object Ivf {

  /** FAISS-style nlist ≈ √n, clamped to [16, 4096] (below 16 cells
    * probing is indistinguishable from a scan; above 4096 the
    * quantizer pass nlist·dim FMAs/row starts to rival the scan it
    * prunes at these corpus sizes).
    */
  def autoNlist(n: Long): Int =
    math.max(16, math.min(4096, math.round(math.sqrt(n.toDouble)).toInt))

  /** Training-sample budget per cell. 64·nlist points is within
    * FAISS's recommended 39–256 training points per centroid.
    */
  private val TrainPerCell = 64L

  /** L2-normalize one centroid in place; a zero vector (empty cell
    * sum) is left untouched by the caller instead.
    */
  private def normalized(v: Array[Double]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 0.0
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }

  /** Train the coarse quantizer: deterministic hash sample, xxhash64
    * init, `iters` distributed Lloyd iterations. Returns the flattened
    * row-major nlist×dim centroid matrix, each row L2-normalized.
    */
  private[operators] def train(base: DataFrame, n: Long, nlist: Int, dim: Int,
                               iters: Int): Array[Float] = {
    val every = math.max(1L, n / (TrainPerCell * nlist))
    val sample = graft.Caches.scoped(
      base.filter(pmod(xxhash64(col("vec_id")), lit(every)) === 0)
        .select(col("vec_id"), col("embedding")))

    // Init: the nlist sample vectors first in xxhash64(vec_id+1) order
    // (a hash DIFFERENT from the sampling hash, so init isn't biased
    // toward the sample-filter boundary; vec_id tiebreak for full
    // determinism under hash collisions).
    val initRows = sample
      .orderBy(xxhash64(col("vec_id") + 1), col("vec_id"))
      .limit(nlist).select(col("embedding")).collect()
    val cents = new Array[Float](nlist * dim)
    var c = 0
    while (c < initRows.length) {
      val v = initRows(c).getSeq[Float](0)
      val d = new Array[Double](dim)
      var i = 0
      while (i < math.min(dim, v.length)) { d(i) = v(i).toDouble; i += 1 }
      System.arraycopy(normalized(d), 0, cents, c * dim, dim)
      c += 1
    }
    // Fewer sample rows than nlist: remaining centroids stay zero and
    // attract nothing; probing still works over the populated cells.

    var iter = 0
    while (iter < iters) {
      val snapshot = java.util.Arrays.copyOf(cents, cents.length)
      val stats = sample
        .groupBy(element_at(
          IvfCells.ivf_cells(col("embedding"), snapshot, dim, 1), 1).as("cell"))
        .agg(VecSumF32.vec_sum_f32(col("embedding")).as("s"),
          count(lit(1)).as("cnt"))
        .collect() // ≤ nlist rows of (int, 64 doubles, long) — the centroid matrix itself
      stats.foreach { r =>
        val cell = r.getInt(0)
        val s = r.getSeq[Double](1).toArray
        System.arraycopy(normalized(s), 0, cents, cell * dim, dim)
        // mean = s/cnt, but normalization is scale-invariant: the
        // count never needs touching.
      }
      // Cells no sample vector chose keep their previous centroid.
      iter += 1
    }
    cents
  }

  /** `sim_ann_ivf`: IVF top-k for the registered vec_id < 8 query set.
    * Build (train + assign) + serve (probe join, fast-double prune,
    * decimal-exact re-rank) in one invocation. Output contract matches
    * [[Similarity.annLsh]]: one row per (query, rank) plus a
    * null-candidate row for queries whose probed cells were all empty.
    *
    * `nprobe` defaults to nlist/16 (≈6% of cells — candidates ≈ n/16
    * per query at the √n default nlist), floor 8 (below 8 probes the
    * probe set is too coarse to track cell-boundary neighbors at any
    * n; the floor only binds under nlist = 128, i.e. tiny corpora). nprobe = nlist
    * degenerates to the exact scan: every vector becomes a candidate,
    * so the result EQUALS the brute-force top-k (SimilaritySpec pins
    * this identity; the FAISS nprobe→flat degeneration).
    */
  def annIvf(spark: SparkSession, dir: String, k: Int = 10,
             nlistOverride: Option[Int] = None, nprobeOverride: Option[Int] = None,
             margin: Int = 16, iters: Int = 4): DataFrame = {
    val n = Tables.parquetRowCount(spark, dir, "embeddings")
    val nlist = nlistOverride.getOrElse(autoNlist(n))
    val nprobe = math.min(nlist, nprobeOverride.getOrElse(math.max(8, nlist / 16)))
    val base = graft.Caches.scoped(Similarity.fastNormBase(spark, dir))
    val dim = base.select(size(col("embedding"))).head.getInt(0)
    val cents = train(base, n, nlist, dim, iters)

    val cells = base.select(col("vec_id"), col("embedding"), col("nf"),
      element_at(IvfCells.ivf_cells(col("embedding"), cents, dim, 1), 1).as("cell"))
    val q = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nf").as("qnf"),
        explode(IvfCells.ivf_cells(col("embedding"), cents, dim, nprobe)).as("cell"))
    // One cell per data vector and distinct probed cells per query →
    // (query_id, vec_id) pairs are already unique: no dropDuplicates
    // (the LSH path needs one because L tables overlap).
    val winners = broadcast(q).join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.fastCosine(col("qe"), col("qnf"), col("embedding"), col("nf")))
      .withColumn("rank_f", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine_fast").desc, col("vec_id"))))
      .filter(col("rank_f") <= k + margin)
      .select(col("query_id"), col("vec_id"))

    base.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"))
      .join(Similarity.exactTopK(base, winners, k), Seq("query_id"), "left")
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
