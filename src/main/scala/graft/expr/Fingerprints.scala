package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native doc-local fingerprint expressions over a string column.
 *
 * These are the engine-local (xxhash64-family) scale paths; their
 * md5-portable twins in [[graft.ops.Dedup]] / [[graft.ops.TextAnalysis]]
 * carry the DuckDB-oracle signal for the same algorithms. The
 * composed-builtin shapes both lose: explode + groupBy pays a
 * generate, a hash aggregate, and an exchange for what is row-local
 * arithmetic; higher-order `transform`/`aggregate` lambdas are
 * interpreted (CodegenFallback) with per-element boxing. Each
 * expression here is ONE static call into a primitive loop per row —
 * a narrow map stage with zero exchange at any scale, no
 * per-shingle allocation.
 *
 * Shingles are windows over the LOWERCASED UTF-8 byte sequence
 * (multibyte characters widen a window vs the char-based `substr`
 * builtins — irrelevant to fingerprint quality and documented here;
 * the portable twins keep exact char semantics for the oracles).
 * Texts shorter than `k` contribute their whole text as the single
 * shingle, matching `charShingles`' `greatest(1, len-k+1)` contract.
 */
object Fingerprints {
  private final val Seed = 42L // match builtin xxhash64's default seed

  private def shingleHashes(s: UTF8String, k: Int): Array[Long] = {
    val b = s.toLowerCase.getBytes
    val n = math.max(1, b.length - k + 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = XXH64.hashUnsafeBytes(
        b, Platform.BYTE_ARRAY_OFFSET + i, math.min(k, b.length - i), Seed)
      i += 1
    }
    out
  }

  private def sortedDistinct(hs: java.util.HashSet[java.lang.Long]): ArrayData = {
    val arr = new Array[Long](hs.size)
    val it = hs.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** MinHash signature: slot j = min over shingles of
    * XXH64.hashLong(shingleHash, j). Distinct-ness of shingles is
    * irrelevant under min, so no dedup pass is needed. */
  def minhashSig(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val hs = shingleHashes(s, k)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < numHashes) {
        val m = XXH64.hashLong(h, j)
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Cyclic-borrow offset for OPH densification (see ophSig). */
  final val OphBorrowOffset: Long = 1L << 40

  /** One-permutation-hashing MinHash signature (Li, Owen, Zhang 2012;
    * densification per Shrivastava & Li 2014): each shingle hashed
    * ONCE — bin = h mod bins, candidate value = h div bins (sign bit
    * masked first, matching the portable twin's non-negative 60-bit
    * md5 prefix) — then empty bins borrow from the next non-empty bin
    * at cyclic distance t with offset t·OphBorrowOffset. One hash +
    * one min-update per shingle, independent of signature length;
    * the k-hash signature (minhashSig) pays numHashes mixes each. */
  def ophSig(s: UTF8String, k: Int, bins: Int): ArrayData = {
    val hs = shingleHashes(s, k)
    val mins = Array.fill(bins)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i) & Long.MaxValue
      val b = (h % bins).toInt
      val v = h / bins
      if (v < mins(b)) mins(b) = v
      i += 1
    }
    // densify: shingleHashes never returns an empty array, so at least
    // one bin is filled and the borrow scan terminates. A real value
    // can't collide with the MaxValue sentinel (bins >= 2 => v <= Max/2).
    val out = new Array[Long](bins)
    var j = 0
    while (j < bins) {
      var t = 0
      while (mins((j + t) % bins) == Long.MaxValue) t += 1
      out(j) = mins((j + t) % bins) + t * OphBorrowOffset
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Mod-sampling rolling fingerprint: the sorted distinct shingle
    * hashes ≡ 0 (mod `modulus`). Empty when nothing samples. */
  def rollingFp(s: UTF8String, k: Int, modulus: Int): ArrayData = {
    val hs = shingleHashes(s, k)
    val keep = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < hs.length) {
      if (java.lang.Math.floorMod(hs(i), modulus.toLong) == 0L) keep.add(hs(i))
      i += 1
    }
    sortedDistinct(keep)
  }

  /**
   * Distinct word n-gram hashes, replicating the builtin construction
   * `array_distinct(transform(..., i => xxhash64(array_join(slice(
   * split(lower(trim(text)), "\\s+"), i+1, n), " "))))` token-for-token:
   * lowercase, strip leading/trailing SPACES only (SQL `trim`), split
   * on ASCII-whitespace runs keeping leading/trailing empty tokens
   * (Java split with limit -1), join each n-token window with a single
   * space, hash. Hash values are engine-local (XXH64 of the gram
   * bytes); consumers only need gram-set identity, which this
   * preserves: equal grams hash equal, distinct grams distinct modulo
   * the 64-bit birthday bound.
   */
  def wordGramHashes(s: UTF8String, n: Int): ArrayData = {
    val bytesAll = s.toLowerCase.getBytes
    // SQL trim: strip 0x20 only
    var lo = 0
    var hi = bytesAll.length
    while (lo < hi && bytesAll(lo) == 0x20) lo += 1
    while (hi > lo && bytesAll(hi - 1) == 0x20) hi -= 1
    @inline def isWs(b: Byte): Boolean =
      b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d
    // token byte ranges, Java split(limit=-1) semantics
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWs(bytesAll(i))) {
        starts.add(tokStart); ends.add(i)
        while (i < hi && isWs(bytesAll(i))) i += 1
        tokStart = i
      } else i += 1
    }
    starts.add(tokStart); ends.add(hi) // final token (possibly empty)
    val t = starts.size()
    val numGrams = math.max(1, t - n + 1)
    val keep = new java.util.LinkedHashSet[java.lang.Long]()
    val buf = new Array[Byte](hi - lo + n) // gram bytes + separators
    var g = 0
    while (g < numGrams) {
      var len = 0
      var j = g
      val last = math.min(g + n, t)
      while (j < last) {
        if (j > g) { buf(len) = 0x20; len += 1 }
        val ts = starts.get(j)
        val te = ends.get(j)
        System.arraycopy(bytesAll, ts, buf, len, te - ts)
        len += te - ts
        j += 1
      }
      keep.add(XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed))
      g += 1
    }
    val arr = new Array[Long](keep.size)
    val it = keep.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }

  /**
   * ALL word n-grams in document order (non-distinct — frequency
   * consumers need multiplicity), as strings: the [[wordGramHashes]]
   * tokenizer (same SQL-trim + Java-split byte loop, parity
   * spec-pinned) but emitting the gram text instead of its hash, and
   * EMPTY when the doc has fewer than n tokens (a vocabulary over
   * short docs has no n-grams — unlike the dedup hashes, which keep
   * one short gram so every doc retains an identity).
   *
   * Exists because the Column construction —
   * transform(sequence(1, m), i -> array_join(slice(toks, i, n), " "))
   * — evaluates three nested interpreted lambdas per row (HOFs are
   * CodegenFallback): ~8 µs per gram, the whole cost of the n-gram
   * vocabulary query. This loop re-slices the SAME token byte ranges
   * at ~100 ns per gram.
   */
  def wordGrams(s: UTF8String, n: Int, step: Int = 1): ArrayData = {
    val bytesAll = s.toLowerCase.getBytes
    var lo = 0
    var hi = bytesAll.length
    while (lo < hi && bytesAll(lo) == 0x20) lo += 1
    while (hi > lo && bytesAll(hi - 1) == 0x20) hi -= 1
    @inline def isWs(b: Byte): Boolean =
      b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWs(bytesAll(i))) {
        starts.add(tokStart); ends.add(i)
        while (i < hi && isWs(bytesAll(i))) i += 1
        tokStart = i
      } else i += 1
    }
    starts.add(tokStart); ends.add(hi)
    val t = starts.size()
    // step 1 = sliding n-grams, full windows only (vocabulary
    // semantics: empty when t < n); step > 1 = chunking, the PARTIAL
    // tail kept (span semantics: ceil(t/step) chunks, never zero —
    // every doc retains an identity)
    val numGrams = if (step == 1) t - n + 1 else (t + step - 1) / step
    if (numGrams < 1) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](numGrams)
    val buf = new Array[Byte](hi - lo + n)
    var g = 0
    while (g < numGrams) {
      var len = 0
      val from = g * step
      val until = math.min(from + n, t)
      var j = from
      while (j < until) {
        if (j > from) { buf(len) = 0x20; len += 1 }
        val ts = starts.get(j)
        val te = ends.get(j)
        System.arraycopy(bytesAll, ts, buf, len, te - ts)
        len += te - ts
        j += 1
      }
      out(g) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, len))
      g += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Per-position rolling fingerprints of every `l`-token window —
   * the long-window engine for ExactSubstr: O(T) per doc regardless
   * of window length, where the [[wordGrams]] path materializes and
   * hashes O(T·L) bytes of window strings. Tokenization is the exact
   * [[wordGrams]] byte loop (SQL trim + Java split(limit=-1)); each
   * token hashes ONCE with XXH64, and windows combine by a Rabin–Karp
   * wraparound polynomial over those hashes (odd base, mod 2⁶⁴):
   *
   *   fp(i) = Σ_{j<L} h(tok_{i+j}) · B^{L−1−j}
   *   fp(i+1) = (fp(i) − h(tok_i)·B^{L−1}) · B + h(tok_{i+L})
   *
   * Equal windows always agree. Distinct windows collide only at the
   * 64-bit birthday bound for natural corpora — the same risk class
   * consumers already accept for xxhash64 window keys — but the
   * polynomial is LINEAR, so adversarially constructed token
   * sequences can force collisions; use the wordGrams path when the
   * input is attacker-controlled. Empty when the doc has fewer than
   * `l` tokens (full windows only — the wordGrams step=1 contract).
   */
  def tokenWindowFp(s: UTF8String, l: Int): ArrayData = {
    // the registered SQL function is directly callable with any l —
    // l < 1 would make n = t - l + 1 exceed the hash array and throw
    if (l < 1) return new GenericArrayData(new Array[Long](0))
    val bytesAll = s.toLowerCase.getBytes
    var lo = 0
    var hi = bytesAll.length
    while (lo < hi && bytesAll(lo) == 0x20) lo += 1
    while (hi > lo && bytesAll(hi - 1) == 0x20) hi -= 1
    @inline def isWs(b: Byte): Boolean =
      b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWs(bytesAll(i))) {
        starts.add(tokStart); ends.add(i)
        while (i < hi && isWs(bytesAll(i))) i += 1
        tokStart = i
      } else i += 1
    }
    starts.add(tokStart); ends.add(hi)
    val t = starts.size()
    val n = t - l + 1
    if (n < 1) return new GenericArrayData(new Array[Long](0))
    val h = new Array[Long](t)
    var j = 0
    while (j < t) {
      h(j) = XXH64.hashUnsafeBytes(bytesAll,
        Platform.BYTE_ARRAY_OFFSET + starts.get(j),
        ends.get(j) - starts.get(j), Seed)
      j += 1
    }
    val B = -7046029254386353131L // 0x9E3779B97F4A7C15, odd
    var bl = 1L // B^(l-1) mod 2^64
    var e = 1
    while (e < l) { bl *= B; e += 1 }
    val out = new Array[Long](n)
    var fp = 0L
    i = 0
    while (i < l) { fp = fp * B + h(i); i += 1 }
    out(0) = fp
    i = 1
    while (i < n) {
      fp = (fp - h(i - 1) * bl) * B + h(i + l - 1)
      out(i) = fp
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing (Schleimer et al., SIGMOD 2003): sorted distinct minima
    * of each w-window of consecutive positional shingle hashes. Empty
    * when the doc has fewer than `w` shingles (no full window). */
  def winnowFp(s: UTF8String, k: Int, w: Int): ArrayData = {
    val hs = shingleHashes(s, k)
    val keep = new java.util.HashSet[java.lang.Long]()
    var i = w - 1
    while (i < hs.length) {
      var m = hs(i)
      var j = i - w + 1
      while (j < i) { if (hs(j) < m) m = hs(j); j += 1 }
      keep.add(m)
      i += 1
    }
    sortedDistinct(keep)
  }
}

sealed abstract class FingerprintExpression extends UnaryExpression {
  // input must already be a string column (AbstractDataType needed for
  // ExpectsInputTypes is private[sql]); callers pass text directly
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** `minhash_sig_x64(text, k, numHashes)` — array<long> signature. */
case class MinhashSigX64(child: Expression, k: Int, numHashes: Int)
    extends FingerprintExpression {
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.minhashSig(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Fingerprints.minhashSig($c, $k, $numHashes);")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigX64 =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig_x64"
}

/** `oph_sig_x64(text, k, bins)` — one-permutation-hashing signature. */
case class OphSigX64(child: Expression, k: Int, bins: Int)
    extends FingerprintExpression {
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.ophSig(input.asInstanceOf[UTF8String], k, bins)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Fingerprints.ophSig($c, $k, $bins);")
  override protected def withNewChildInternal(newChild: Expression): OphSigX64 =
    copy(child = newChild)
  override def prettyName: String = "oph_sig_x64"
}

/** `rolling_fp_x64(text, k, modulus)` — sorted distinct sampled hashes. */
case class RollingFpX64(child: Expression, k: Int, modulus: Int)
    extends FingerprintExpression {
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.rollingFp(input.asInstanceOf[UTF8String], k, modulus)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Fingerprints.rollingFp($c, $k, $modulus);")
  override protected def withNewChildInternal(newChild: Expression): RollingFpX64 =
    copy(child = newChild)
  override def prettyName: String = "rolling_fp_x64"
}

/** `token_window_fp_x64(text, l)` — per-position rolling L-token
  * window fingerprints (ordered, non-distinct: position i of the
  * array is the window starting at token i). */
case class TokenWindowFpX64(child: Expression, l: Int)
    extends FingerprintExpression {
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.tokenWindowFp(input.asInstanceOf[UTF8String], l)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Fingerprints.tokenWindowFp($c, $l);")
  override protected def withNewChildInternal(newChild: Expression): TokenWindowFpX64 =
    copy(child = newChild)
  override def prettyName: String = "token_window_fp_x64"
}

/** `word_gram_hashes(text, n)` — distinct word n-gram hashes. */
case class WordGramHashes(child: Expression, n: Int)
    extends FingerprintExpression {
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.wordGramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Fingerprints.wordGramHashes($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
  override def prettyName: String = "word_gram_hashes"
}

/** `word_grams(text, n[, step])` — word n-grams in order, as strings
  * (array<string>, not a FingerprintExpression — different type).
  * step 1 (default) = sliding windows; step > 1 = chunks. */
case class WordGrams(child: Expression, n: Int, step: Int = 1)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.wordGrams(input.asInstanceOf[UTF8String], n, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Fingerprints.wordGrams($c, $n, $step);")
  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
  override def prettyName: String = "word_grams"
}

/** `winnow_fp_x64(text, k, w)` — sorted distinct window minima. */
case class WinnowFpX64(child: Expression, k: Int, w: Int)
    extends FingerprintExpression {
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.winnowFp(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Fingerprints.winnowFp($c, $k, $w);")
  override protected def withNewChildInternal(newChild: Expression): WinnowFpX64 =
    copy(child = newChild)
  override def prettyName: String = "winnow_fp_x64"
}
