package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.6).
  *
  * Media decode libraries are not in this container, so the "decode"
  * is a deterministic fake over the bytes — but the Spark-side shape is
  * real: media travels as an opaque `binary` column with typed metadata
  * extracted by column expressions, and feature extraction runs as
  * batched per-partition iterator processing (the same plumbing a
  * Pandas-UDF / mapInPandas image pipeline uses: schema in, schema out,
  * partition = batch, no driver involvement).
  *
  * The `documents.text` bytes stand in for the media payload (the
  * testdata ships no real binary column); at 100 TB the same plan reads
  * parquet `binary` columns directly.
  */
object Multimodal {

  /** The stand-in media table: (doc_id, blob). */
  private def blobs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))

  /** `mm_meta`: typed metadata over an opaque binary column — size,
    * magic byte (format sniffing), content hash (dedup / integrity),
    * and chunk count (the unit a distributed decoder would fan out).
    * Pure column expressions, no shuffle.
    *
    * n_chunks counts [[chunks]]' character-window chunks (64 chars;
    * = 64 bytes on this ASCII corpus) so the two operators always
    * agree; n_bytes stays a true byte count.
    */
  def meta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("text").cast("binary").as("blob"))
      .select(col("doc_id"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        lower(hex(substring(col("blob"), 1, 1))).as("magic_hex"),
        md5(col("blob")).as("content_md5"),
        expr("(length(text) + 63) div 64").as("n_chunks"))
      .orderBy(col("doc_id"))

  /** `mm_chunks`: explode each payload into fixed-size chunks with
    * per-chunk hashes — the unit of work a distributed decoder fans out
    * (and the dedup/integrity granularity for large media). One scan,
    * fan-out bounded by payload size / chunk size.
    */
  def chunks(spark: SparkSession, dir: String, chunkSize: Int = 64): DataFrame =
    Tables.documents(spark, dir)
      // empty payloads chunk to zero rows — without the guard,
      // sequence(0, -1) yields the DESCENDING array [0, -1] and two
      // phantom chunks
      .select(col("doc_id"), posexplode(expr(
        s"CASE WHEN length(text) > 0 THEN " +
          s"transform(sequence(0, (length(text) + ${chunkSize - 1}) div $chunkSize - 1), " +
          s"i -> substring(text, i*$chunkSize + 1, $chunkSize)) " +
          s"ELSE array() END"))
        .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        octet_length(col("chunk")).cast("long").as("chunk_bytes"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** `mm_features`: batched "decode→featurize" over binary payloads.
    * The fake decoder emits an 8-bin byte histogram + mean byte — the
    * real one would decode pixels/samples here with the exact same
    * iterator shape. mapPartitions keeps the work executor-local and
    * batch-amortized (one decoder init per partition, not per row).
    *
    * The histogram is flattened to scalar `hist_0..hist_7` columns
    * (not an `array<double>`): downstream sorts/hashes — including the
    * driver's pandas-based gate — need hashable scalars, and 8 doubles
    * are codegen/pushdown-friendlier than one array anyway. Each bin is
    * count(byte >> 5 == b)/n and mean_byte is an exact integer sum over
    * one double division, so the DuckDB oracle reproduces both
    * bit-for-bit on the ASCII corpus.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = blobs(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // Per-partition "decoder" init happens here (stubbed: none).
        batch.map { case (id, bytes) =>
          val hist = new Array[Double](8)
          var sum = 0L
          var i = 0
          while (i < bytes.length) {
            val u = bytes(i) & 0xff
            hist(u >> 5) += 1.0
            sum += u
            i += 1
          }
          val n = math.max(bytes.length, 1).toDouble
          (id, hist.map(_ / n).toSeq, sum.toDouble / n, bytes.length)
        }
      }
      .toDF("doc_id", "byte_hist", "mean_byte", "n_bytes")
    raw
      .select(Seq(col("doc_id")) ++
        (0 to 7).map(b => col("byte_hist")(b).as(s"hist_$b")) ++
        Seq(col("mean_byte"), col("n_bytes").cast("long").as("n_bytes")): _*)
      .orderBy(col("doc_id"))
  }
}
