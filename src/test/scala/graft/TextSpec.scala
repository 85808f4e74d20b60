package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val dir = "/root/testdata/sf0.001"

  /** Independent naive reimplementation of the winnowing fingerprint:
    * hash every window from scratch (O(n·w)) instead of rolling — same
    * math, different algorithm, so a rolling-update bug can't hide.
    */
  private def naiveFingerprint(text: String, w: Int): Long = {
    val bytes = text.getBytes("UTF-8")
    if (bytes.isEmpty) return 0L
    val win = math.min(w, bytes.length)
    (0 to bytes.length - win).map { start =>
      var h = 0L
      var i = start
      while (i < start + win) { h = h * graft.functions.RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
      h
    }.min
  }

  test("rolling fingerprint matches the naive O(n*w) reimplementation") {
    val rows = TextAnalysis.fingerprint(spark, dir).limit(100)
      .join(graft.sources.Tables.documents(spark, dir), "doc_id")
      .select("doc_id", "fingerprint", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == naiveFingerprint(r.getString(2), 16),
        s"doc ${r.getLong(0)} fingerprint diverges")
    }
  }

  test("fingerprint is invariant under shared-prefix perturbation semantics") {
    import spark.implicits._
    // Two texts sharing a long run contain shared windows; the min can
    // come from the shared run, while disjoint texts almost never collide.
    val df = Seq(
      ("AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAtail one", 1),
      ("AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAtail two", 2)).toDF("text", "id")
    val fps = df.select(graft.functions.RollingHash.rolling_fingerprint(col("text"), 16)).collect()
    assert(fps(0).getLong(0) == fps(1).getLong(0),
      "near-identical texts should share their minimum window hash")
  }

  test("token counts are consistent") {
    val rows = TextAnalysis.tokens(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) >= r.getLong(1), "BPE-ish tokens can't be fewer than words here")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("quality score stays in [0,1] and ratios are proper fractions") {
    val rows = TextAnalysis.quality(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) // stopword_ratio
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // alpha_ratio
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // quality_score
    }
  }

  test("langid prediction is deterministic priority argmax") {
    val rows = TextAnalysis.langid(spark, dir).collect()
    rows.foreach { r =>
      val scores = Seq("en" -> r.getLong(1), "es" -> r.getLong(2),
        "de" -> r.getLong(3), "fr" -> r.getLong(4))
      val best = scores.map(_._2).max
      val expected = if (best == 0) "und" else scores.find(_._2 == best).get._1
      assert(r.getString(5) == expected)
    }
  }

  /** Independent BPE reference: apply merges IN RANK ORDER, each merge
    * exhaustively left-to-right across the word, one merge at a time —
    * a different formulation from the kernel's lowest-rank-adjacent-
    * pair-first loop (the two are equivalent because a merge only
    * creates pairs containing its new symbol, whose own merges were
    * necessarily learned later — this test is what PINS that argument).
    */
  private def refWordSyms(w: String, merges: Array[String]): List[String] = {
    val bytes = new String(w.getBytes("UTF-8"), "ISO-8859-1")
    var syms = bytes.map(_.toString).toList
    merges.foreach { m =>
      val Array(l, r) = m.split(" ", 2)
      var out = List.empty[String]
      var rest = syms
      while (rest.nonEmpty) {
        rest match {
          case a :: b :: tl if a == l && b == r => out = (a + b) :: out; rest = tl
          case a :: tl => out = a :: out; rest = tl
          case Nil =>
        }
      }
      syms = out.reverse
    }
    syms
  }

  private def refBpeCount(text: String, merges: Array[String]): Long =
    text.split("\\s+").filter(_.nonEmpty)
      .map(refWordSyms(_, merges).size.toLong).sum

  /** Independent vocabulary: base bytes own ids 0-255; merge i's fused
    * string owns 256+i unless an earlier merge already produced the
    * same string (first-wins — the HF convention the kernel states).
    */
  private[graft] def refBpeEncode(text: String, merges: Array[String]): Array[Int] = {
    val vocab = scala.collection.mutable.HashMap.empty[String, Int]
    merges.zipWithIndex.foreach { case (m, i) =>
      val Array(l, r) = m.split(" ", 2)
      if (!vocab.contains(l + r)) vocab(l + r) = 256 + i
    }
    text.split("\\s+").filter(_.nonEmpty).flatMap { w =>
      refWordSyms(w, merges).map { s =>
        if (s.length == 1) s.charAt(0).toInt else vocab(s)
      }
    }
  }

  test("bpe: kernel equals the apply-in-rank-order reference on the corpus") {
    val merges = graft.operators.Bpe.mergesFor(spark, dir)
    assert(merges.nonEmpty, "trainer found no merges on the corpus")
    val rows = graft.operators.Bpe.tokensBpe(spark, dir)
      .join(graft.sources.Tables.documents(spark, dir).select("doc_id", "text"), "doc_id")
      .collect()
    graft.Caches.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getAs[Long]("n_tokens_bpe")
      val want = refBpeCount(r.getAs[String]("text"), merges)
      assert(got == want, s"doc ${r.getAs[Long]("doc_id")}: kernel $got != ref $want")
      // merges only ever reduce the byte-level token count
      assert(got <= r.getAs[String]("text").getBytes("UTF-8")
        .count(b => !Character.isWhitespace(b.toChar)) + 1L)
    }
  }

  test("bpe: trainer is deterministic and learns the obvious merge first") {
    // "ab" dominates: first merge must be (a b); retraining identical.
    val hist = Seq(("abab", 10L), ("abc", 5L), ("xy", 1L))
    val m1 = graft.operators.Bpe.train(hist, 8)
    val m2 = graft.operators.Bpe.train(hist, 8)
    assert(m1.toSeq == m2.toSeq, "retraining diverged")
    assert(m1.head == "a b", s"first merge was ${m1.head}")
    // corpus-level: two trainings produce the identical table
    val c1 = graft.operators.Bpe.train(
      Seq(("hello", 3L), ("help", 2L), ("yell", 2L)), 16)
    val c2 = graft.operators.Bpe.train(
      Seq(("hello", 3L), ("help", 2L), ("yell", 2L)), 16)
    assert(c1.toSeq == c2.toSeq)
  }

  test("bpe: count decomposes over whitespace and respects word boundaries") {
    import spark.implicits._
    val merges = graft.operators.Bpe.train(Seq(("aa", 5L), ("bb", 5L)), 4)
    def cnt(s: String): Long = Seq(s).toDF("text")
      .select(graft.functions.BpeCount.bpe_count(col("text"), merges).as("c"))
      .head().getLong(0)
    assert(cnt("aa bb") == cnt("aa") + cnt("bb"))
    assert(cnt("  aa   bb  ") == cnt("aa bb"), "extra whitespace must not count")
    assert(cnt("") == 0L)
    // merges never cross a word boundary: "a a" stays two tokens even
    // though (a a) would fuse inside one word
    assert(cnt("a a") == 2L)
  }

  test("bpe: encode equals the rank-order reference and size(encode) == count, corpus-wide") {
    // r18 (r17 verdict item 1): the token-ID sequences themselves.
    // Two gates in one pass over the real corpus: (a) the kernel's ids
    // equal an independent reference that builds its own vocabulary
    // and applies merges in rank order; (b) size(bpe_encode) is
    // bit-identical to bpe_count for every document (shared splitWord
    // kernel — this pins that the shared-kernel claim holds through
    // codegen, not just in the scaladoc).
    val merges = graft.operators.Bpe.mergesFor(spark, dir)
    val rows = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        graft.functions.BpeCount.bpe_encode(col("text"), merges).as("ids"),
        graft.functions.BpeCount.bpe_count(col("text"), merges).as("cnt"))
      .collect()
    assert(rows.nonEmpty)
    val eos = graft.functions.BpeCount.eosId(merges.length)
    rows.foreach { r =>
      val ids = r.getSeq[Int](2).toArray
      assert(ids.length.toLong == r.getLong(3),
        s"doc ${r.getLong(0)}: size(encode) ${ids.length} != count ${r.getLong(3)}")
      val want = refBpeEncode(r.getString(1), merges)
      assert(ids.sameElements(want),
        s"doc ${r.getLong(0)}: kernel ids diverged from the rank-order reference")
      assert(ids.forall(i => i >= 0 && i < eos),
        "encode emitted an id outside the merge-table vocabulary")
    }
  }

  test("bpe: decode inverts encode — per-word, spaced round-trip, spaced length law") {
    // r18: the eval/debug inverse. Three gates over the real corpus in
    // one pass: (a) decode(encode(w)) == w for every distinct word
    // (the word-only stream's declared semantics — words concatenate,
    // so the per-word identity is the right granularity); (b) the
    // SPACED stream round-trips every whole document byte-exactly
    // modulo whitespace-run normalization; (c) the spaced length law
    // size == bpe_count + max(words - 1, 0).
    val merges = graft.operators.Bpe.mergesFor(spark, dir)
    val words = graft.sources.Tables.documents(spark, dir)
      .select(explode(graft.functions.BpeCount.bpe_words(col("text"))).as("w"))
      .distinct()
      .select(col("w"),
        graft.functions.BpeCount.bpe_decode(
          graft.functions.BpeCount.bpe_encode(col("w"), merges), merges).as("rt"))
      .collect()
    assert(words.nonEmpty)
    words.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"word '${r.getString(0)}' decoded to '${r.getString(1)}'")
    }
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        graft.functions.BpeCount.bpe_decode(
          graft.functions.BpeCount.bpe_encode(col("text"), merges, spaced = true),
          merges).as("rt"),
        size(graft.functions.BpeCount.bpe_encode(col("text"), merges, spaced = true))
          .as("n_spaced"),
        graft.functions.BpeCount.bpe_count(col("text"), merges).as("cnt"),
        size(graft.functions.BpeCount.bpe_words(col("text"))).as("n_words"))
      .collect()
    docs.foreach { r =>
      val want = r.getString(1).trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(r.getString(2) == want,
        s"doc ${r.getLong(0)}: spaced round-trip diverged")
      val lawWant = r.getLong(4) + math.max(r.getInt(5) - 1, 0)
      assert(r.getInt(3).toLong == lawWant,
        s"doc ${r.getLong(0)}: spaced length ${r.getInt(3)} != count+words-1 $lawWant")
    }
  }

  test("corpus_pack_shards_bpe equals a sequential fold over the bpe counts") {
    val got = graft.operators.Bpe.packShardsBpe(spark, dir, budgetTokens = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.Caches.release()
    val counts = graft.operators.Bpe.tokensBpe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_tokens_bpe")))
      .sortBy(_._1)
    graft.Caches.release()
    var cum = 0L
    val want = counts.map { case (id, n) =>
      val shard = cum / 500L
      cum += n
      (id, n, shard)
    }
    assert(got.sortBy(_._1).toSeq == want.toSeq,
      "bpe pack diverged from the sequential prefix fold")
  }
}
