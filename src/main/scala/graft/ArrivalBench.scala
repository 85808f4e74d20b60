package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Wall-clock harness for the streaming ARRIVAL loops (not part of the
  * driver contract): feeds a scale dir's documents (or embeddings) as
  * N content-addressed arrival batches through the corresponding
  * `EventStream.*ArrivalBatch` store loop and prints one JSON line
  * with the PER-BATCH wall times. The number under test is not the
  * total — it is the SHAPE: each loop's scaladoc claims O(batch) cost
  * per arrival (standing state is probed through narrow hash/band-key
  * joins, never re-aggregated), so the per-batch curve must stay FLAT
  * while the standing store grows from empty to (N−1)/N of the corpus.
  * A curve that grows with batch index falsifies the claim; BASELINE's
  * arrival section records the measured curves.
  *
  * StreamBench deliberately excludes foreachBatch store loops (its
  * noop-sink rows/s would misstate a disk-commit-dominated operator —
  * the signedExport precedent); this harness measures them the way
  * they actually cost: batch in, store grown, wall second out.
  *
  * Knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_ARRIVAL_BATCHES (default 10), SPARK_GRAFT_ARRIVAL_MODE
  * (exact | neardup | clusters | vectors | vecdedup | spans | pack |
  * corpus, default exact),
  * SPARK_GRAFT_CPUS (default 32).
  */
object ArrivalBench {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_ARRIVAL_BATCHES", "10").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_ARRIVAL_MODE", "exact")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.driver(cpus, dir)
    spark.sparkContext.setLogLevel("WARN")
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_arrival_bench_$mode").toString

    def docBatch(i: Int) = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(pmod(xxhash64(col("doc_id")), lit(nBatches)) === i)
    def corpusBatch(i: Int) = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .filter(pmod(xxhash64(col("doc_id")), lit(nBatches)) === i)
    def vecBatch(i: Int) = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .filter(pmod(xxhash64(col("vec_id")), lit(nBatches)) === i)
    val nlist = operators.Ivf.autoNlist(
      Tables.parquetRowCount(spark, dir, "embeddings"))

    val times = (0 until nBatches).map { i =>
      val t0 = System.nanoTime()
      mode match {
        case "exact" =>
          streaming.EventStream.dedupArrivalBatch(docBatch(i), store, i.toLong)
        case "neardup" =>
          streaming.EventStream.nearDupArrivalBatch(docBatch(i), store,
            i.toLong, 0.9, 64, 16)
        case "clusters" =>
          streaming.EventStream.clusterArrivalBatch(docBatch(i), store,
            i.toLong, 0.9, 64, 16)
        case "spans" =>
          streaming.EventStream.spanArrivalBatch(docBatch(i), store,
            i.toLong, 16)
        case "pack" =>
          streaming.EventStream.packArrivalBatch(docBatch(i), store,
            i.toLong, 50000L)
        case "corpus" =>
          streaming.EventStream.corpusArrivalBatch(corpusBatch(i), store,
            i.toLong, 0.5, 0.8, 16)
        case "vectors" =>
          operators.Ivf.vectorArrivalBatch(vecBatch(i), store, i.toLong, nlist)
        case "vecdedup" =>
          streaming.EventStream.vectorDedupArrivalBatch(vecBatch(i), store,
            i.toLong, nlist, 0.95, 4, 4)
        case other => sys.error(s"unknown SPARK_GRAFT_ARRIVAL_MODE '$other'")
      }
      math.round((System.nanoTime() - t0) / 1e6) / 1000.0
    }
    val accepted = mode match {
      case "vectors" | "vecdedup" =>
        spark.read.parquet(s"$store/cells").count()
      case "clusters" =>
        streaming.EventStream.arrivalClusterLabels(spark, store).count()
      case "spans" =>
        streaming.EventStream.arrivalSpanList(spark, store).count()
      case "pack" =>
        streaming.EventStream.arrivalPacked(spark, store).count()
      case "corpus" =>
        spark.read.parquet(s"$store/clean").select("doc_id").distinct().count()
      case _ =>
        streaming.EventStream.arrivalAccepted(spark, store).count()
    }
    val total = times.sum
    println(s"""{"metric":"arrival_$mode","unit":"sec","batches":[${
      times.mkString(",")}],"total":$total,"accepted":$accepted,"sf":"$dir","n_batches":$nBatches}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
    spark.stop()
  }
}
