package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE token counting (SURVEY §2.5, r16 — r15 verdict item
  * 5): subword token counts under a FIXED merge table, so shard
  * budgets and mix rates can be priced in the unit a training run
  * actually consumes instead of whitespace words. This is the classic
  * public byte-pair-encoding scheme (Sennrich et al. 2016; the GPT-2
  * byte-level variant): a word's initial symbols are its UTF-8 bytes,
  * and learned merges combine adjacent symbol pairs in rank order.
  *
  * Conventions (deterministic, engine-defined):
  *   - words are maximal runs of non-whitespace codepoints
  *     (`Character.isWhitespace`); whitespace itself contributes no
  *     tokens — so the count decomposes per word, which is what makes
  *     the one-pass kernel and the word memo correct;
  *   - merges never cross word boundaries;
  *   - encoding applies the lowest-rank mergeable adjacent pair first
  *     (ties impossible: ranks are unique). TextSpec pins this against
  *     an independent apply-in-rank-order reference implementation —
  *     the two formulations are provably equivalent because a merge
  *     only creates pairs containing its new symbol, whose own merges
  *     were necessarily learned later.
  *
  * The merge table rides the expression as a reference object
  * (`Array[String]`, each entry "left right" in ISO-8859-1 so
  * arbitrary byte sequences round-trip; the 0x20 separator is safe
  * because words never contain the space byte). It is COMPILED ONCE
  * per table CONTENT into a rank map, keyed by a SHA-256 fingerprint
  * the expression computes on the driver and ships alongside the
  * table (r16 advice: an identity key misses across tasks — codegen
  * deserializes a fresh array reference per task, so every task used
  * to insert a new Compiled with a cold word memo and the size bound
  * repeatedly wiped memos under concurrent use). Per-word counts
  * memoize in a bounded map: corpus text repeats words heavily, so
  * the amortized per-token cost is a hash probe, not a merge loop.
  */
object BpeCount {

  private final class Compiled(merges: Array[String]) {
    val rank = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case (m, i) =>
      // key = "left right" verbatim; pairs probe with the same format
      rank.put(m, Integer.valueOf(i))
    }
    // word -> count memo lives WITH its table (a word's count depends
    // on the merges, so a cross-table shared memo would poison counts)
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Integer](1 << 12)
    // symbol string -> TOKEN ID, the engine's deterministic vocabulary:
    // ids 0-255 are the 256 base bytes (implicit — single-char symbols
    // resolve to their byte value without a map entry), id 256+i is
    // the symbol merge i creates. Two merges CAN fuse to the same
    // string ((a,bc) and (ab,c) both yield "abc"); the vocabulary is
    // keyed by symbol STRING, so the first (lowest-rank) merge owns
    // the id — the HF-BPE convention, and what keeps encode(count)
    // decomposable: equal symbols are equal tokens.
    val symId = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case (mg, i) =>
        val fused = mg.substring(0, mg.indexOf(' ')) + mg.substring(mg.indexOf(' ') + 1)
        m.putIfAbsent(fused, Integer.valueOf(256 + i))
      }
      m
    }
    // word -> token ids memo (the encode twin of `memo`)
    val encMemo = new java.util.concurrent.ConcurrentHashMap[String, Array[Int]](1 << 12)
    // id -> symbol string, the decode table: EVERY merged id maps to
    // its fused string (when two merges fuse to the same string, both
    // ids decode to it; encode only ever EMITS the first — symId)
    val symById: Array[String] = merges.map { mg =>
      mg.substring(0, mg.indexOf(' ')) + mg.substring(mg.indexOf(' ') + 1)
    }
  }

  private val compiledCache =
    new java.util.concurrent.ConcurrentHashMap[String, Compiled]()

  /** Collision-proof content key of a merge table: SHA-256 over the
    * '\n'-joined entries (entries never contain '\n' — they are
    * "left right" byte-symbol pairs). Computed once per expression on
    * the driver, shipped as a reference object.
    */
  private[graft] def fingerprint(merges: Array[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    merges.foreach { m =>
      md.update(m.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      md.update('\n'.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private val MemoCap = 1 << 16

  /** One word's final SYMBOL sequence (ISO-8859-1 string of its UTF-8
    * bytes in, merged symbols out) — the single merge loop both the
    * count and the encode consume, so `bpe_count ≡ size(bpe_encode)`
    * holds by construction, not by parallel implementations.
    */
  private def splitWord(w: String, c: Compiled): java.util.ArrayList[String] = {
    // initial symbols: one per byte
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { syms.add(w.substring(i, i + 1)); i += 1 }
    var changed = true
    while (changed && syms.size > 1) {
      // lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = c.rank.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestAt = j
        }
        j += 1
      }
      if (bestAt < 0) changed = false
      else {
        syms.set(bestAt, syms.get(bestAt) + syms.get(bestAt + 1))
        syms.remove(bestAt + 1)
      }
    }
    syms
  }

  /** Token count of one word (ISO-8859-1 string of its UTF-8 bytes). */
  private def countWord(w: String, c: Compiled): Int = splitWord(w, c).size

  /** Token IDS of one word under the [[Compiled.symId]] vocabulary. */
  private def encodeWord(w: String, c: Compiled): Array[Int] = {
    val syms = splitWord(w, c)
    val out = new Array[Int](syms.size)
    var i = 0
    while (i < syms.size) {
      val s = syms.get(i)
      out(i) =
        if (s.length == 1) s.charAt(0).toInt // base byte, ids 0-255
        else c.symId.get(s).intValue() // merged symbols always have an id
      i += 1
    }
    out
  }

  /** Whitespace-split + per-word BPE count over the whole document.
    * `fp` is the table's content fingerprint ([[fingerprint]]) — the
    * cache key, so every task of every stage sharing one table shares
    * one Compiled (and its warm word memo).
    */
  def compute(s: UTF8String, merges: Array[String], fp: String): Long = {
    if (compiledCache.size > 64) compiledCache.clear() // distinct-table bound
    val c = compiledCache.computeIfAbsent(fp, _ => new Compiled(merges))
    val memo = c.memo
    val text = s.toString
    var total = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        val word = text.substring(start, i)
        val cached: Integer = memo.get(word)
        if (cached != null) total += cached.longValue()
        else {
          // byte-level: operate on the word's UTF-8 bytes as an
          // ISO-8859-1 string (1 char = 1 byte, lossless round trip)
          val bytes = new String(word.getBytes(
            java.nio.charset.StandardCharsets.UTF_8),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val cnt = countWord(bytes, c)
          if (memo.size < MemoCap) memo.put(word, Integer.valueOf(cnt))
          total += cnt.toLong
        }
      }
    }
    total
  }

  /** BPE ENCODE of the whole document (r18, r17 verdict item 1): the
    * token-ID sequence a training run actually consumes, under the
    * same fixed merge table and the same per-word decomposition as
    * [[compute]] — whitespace contributes no ids, words encode
    * independently, and `size(bpe_encode(t)) == bpe_count(t)` is an
    * identity by shared [[splitWord]] kernel (TextSpec additionally
    * gates it over the corpus). IDs: 0-255 the base bytes, 256+i the
    * symbol merge i creates ([[Compiled.symId]]); the document
    * boundary / pad ids live ABOVE the table ([[eosId]], [[padId]]) —
    * they are sequence-packing framing, never produced by encode.
    */
  def encode(s: UTF8String, merges: Array[String],
             fp: String): org.apache.spark.sql.catalyst.util.ArrayData =
    encode(s, merges, fp, spaced = false)

  /** `spaced = true` (r18): one space id (the 0x20 base byte — words
    * never contain whitespace, so it is unambiguous) between
    * consecutive words, making [[decode]] a byte-exact inverse modulo
    * whitespace-run normalization — the round-trippable stream an
    * eval/debug path wants. The count identity applies to the default
    * word-only form; the spaced length is `bpe_count + max(0, words-1)`
    * (TextSpec pins both).
    */
  def encode(s: UTF8String, merges: Array[String], fp: String,
             spaced: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (compiledCache.size > 64) compiledCache.clear() // distinct-table bound
    val c = compiledCache.computeIfAbsent(fp, _ => new Compiled(merges))
    val memo = c.encMemo
    val text = s.toString
    var buf = new Array[Int](math.max(16, text.length / 3))
    var len = 0
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        if (spaced && len > 0) {
          if (len + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf, buf.length * 2)
          buf(len) = 32
          len += 1
        }
        val word = text.substring(start, i)
        var ids = memo.get(word)
        if (ids == null) {
          val bytes = new String(word.getBytes(
            java.nio.charset.StandardCharsets.UTF_8),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          ids = encodeWord(bytes, c)
          if (memo.size < MemoCap) memo.put(word, ids)
        }
        if (len + ids.length > buf.length)
          buf = java.util.Arrays.copyOf(buf,
            math.max(buf.length * 2, len + ids.length))
        System.arraycopy(ids, 0, buf, len, ids.length)
        len += ids.length
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(buf, len))
  }

  /** Document-boundary token id for a table of `n` merges (the first
    * id encode can never emit); pad id sits one above it. */
  def eosId(numMerges: Int): Int = 256 + numMerges
  def padId(numMerges: Int): Int = 257 + numMerges

  /** The kernel's word segmentation, exposed as an array so the BPE
    * TRAINER samples words under the SAME rule the kernel applies
    * (r16 advice: training on Java-regex `\s+` — ASCII whitespace —
    * while the kernel splits on `Character.isWhitespace` drifted
    * merge quality on text with Unicode whitespace). One loop, shared
    * by contract: both sides call `Character.isWhitespace` on chars.
    */
  def words(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val text = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start)
        out += UTF8String.fromString(text.substring(start, i))
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  def bpe_count(text: Column, merges: Array[String]): Column =
    GraftColumn.column(BpeCountExpr(GraftColumn.expression(text), merges))

  def bpe_words(text: Column): Column =
    GraftColumn.column(BpeWordsExpr(GraftColumn.expression(text)))

  /** Inverse of [[encode]]: ids back to text. Base-byte ids (< 256)
    * decode to their byte, merged ids to their fused symbol's bytes
    * ([[Compiled.symById]]), the document-boundary id ([[eosId]]) to a
    * newline (readable doc separation in debug output), the pad id to
    * nothing; any id above pad throws — corrupt input surfaces, never
    * truncates silently. Byte-exact inverse of the SPACED encode
    * modulo whitespace-run normalization; the word-only default
    * decodes to the words concatenated (its declared pricing
    * semantics — word boundaries are not in that id stream).
    */
  def decode(ids: org.apache.spark.sql.catalyst.util.ArrayData,
             merges: Array[String], fp: String): UTF8String = {
    if (compiledCache.size > 64) compiledCache.clear() // distinct-table bound
    val c = compiledCache.computeIfAbsent(fp, _ => new Compiled(merges))
    val eos = eosId(merges.length)
    val pad = padId(merges.length)
    val sb = new java.lang.StringBuilder(ids.numElements() * 2)
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 256) sb.append(id.toChar)
      else if (id < eos) sb.append(c.symById(id - 256))
      else if (id == eos) sb.append('\n')
      else if (id != pad)
        throw new IllegalArgumentException(
          s"bpe_decode: id $id above the table's pad id $pad")
      i += 1
    }
    UTF8String.fromBytes(sb.toString
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  def bpe_encode(text: Column, merges: Array[String],
                 spaced: Boolean = false): Column =
    GraftColumn.column(BpeEncodeExpr(GraftColumn.expression(text), merges, spaced))

  def bpe_decode(ids: Column, merges: Array[String]): Column =
    GraftColumn.column(BpeDecodeExpr(GraftColumn.expression(ids), merges))
}

/** Subword token count of a text column under a fixed merge table. */
case class BpeCountExpr(child: Expression, merges: Array[String])
    extends UnaryExpression {

  // computed once on the driver, shipped with the plan; keys the
  // executor-side Compiled cache by CONTENT (r16 advice)
  private val fp: String = BpeCount.fingerprint(merges)

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    BpeCount.compute(s.asInstanceOf[UTF8String], merges, fp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    val f = ctx.addReferenceObj("bpeFp", fp, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.compute($c, $m, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // content-based equality so plan canonicalization survives the array
  override def equals(other: Any): Boolean = other match {
    case o: BpeCountExpr =>
      o.child == child && java.util.Arrays.equals(
        o.merges.asInstanceOf[Array[AnyRef]], merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])))
}

/** Token-ID sequence of a text column under a fixed merge table —
  * `array<int>`, per-word ids concatenated in document order; the
  * tensor-feed twin of [[BpeCountExpr]] (shared merge kernel, shared
  * content-fingerprint cache key, `size(bpe_encode) == bpe_count` by
  * construction).
  */
case class BpeEncodeExpr(child: Expression, merges: Array[String],
                         spaced: Boolean = false)
    extends UnaryExpression {

  private val fp: String = BpeCount.fingerprint(merges)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    BpeCount.encode(s.asInstanceOf[UTF8String], merges, fp, spaced)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    val f = ctx.addReferenceObj("bpeFp", fp, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeCount.encode($c, $m, $f, $spaced)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // content-based equality so plan canonicalization survives the array
  override def equals(other: Any): Boolean = other match {
    case o: BpeEncodeExpr =>
      o.child == child && o.spaced == spaced && java.util.Arrays.equals(
        o.merges.asInstanceOf[Array[AnyRef]], merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Boolean.valueOf(spaced),
      Integer.valueOf(java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])))
}

/** Text back from a token-ID array under the same fixed merge table —
  * the debug/eval inverse ([[BpeCount.decode]]): byte-exact for the
  * spaced encode modulo whitespace-run normalization, concatenated
  * words for the word-only pricing stream, newline at document
  * boundaries, error above the pad id.
  */
case class BpeDecodeExpr(child: Expression, merges: Array[String])
    extends UnaryExpression {

  private val fp: String = BpeCount.fingerprint(merges)

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.simpleString}")
  }

  override def nullSafeEval(ids: Any): Any =
    BpeCount.decode(
      ids.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], merges, fp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    val f = ctx.addReferenceObj("bpeFp", fp, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.decode($c, $m, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // content-based equality so plan canonicalization survives the array
  override def equals(other: Any): Boolean = other match {
    case o: BpeDecodeExpr =>
      o.child == child && java.util.Arrays.equals(
        o.merges.asInstanceOf[Array[AnyRef]], merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, "decode",
      Integer.valueOf(java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])))
}

/** The BPE kernel's word segmentation (`Character.isWhitespace`
  * boundaries) as an array<string> column — the trainer's histogram
  * source, guaranteeing train-time and apply-time words agree.
  */
case class BpeWordsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_words"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    BpeCount.words(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.words($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
