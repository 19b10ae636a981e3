package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native BPE encoding — the corpus-scale application path for merge
 * tables learned by [[graft.ops.Tokenizer.bpeTrain]]. Training is a
 * bounded driver loop over the capped vocabulary (the scale-honest
 * split, see Tokenizer's scaladoc); APPLICATION is the per-row hot
 * path — at 100 TB every word of every document goes through the
 * encoder — so it must not be a per-merge rescan.
 *
 * [[graft.ops.Tokenizer.applyMerges]] (the contract implementation)
 * is O(numMerges · wordLen) per word: each learned merge rescans the
 * symbol array whether present or not — fine at 40 merges, 25× the
 * work at the production 1k+. This encoder runs the standard min-rank
 * loop instead (the GPT-2 encoder shape): repeatedly find the
 * LOWEST-rank adjacent symbol pair present and fuse all its
 * occurrences left-to-right, stopping when no learned pair remains —
 * O(passes · wordLen) with passes bounded by the merges that actually
 * fire on this word, independent of table size.
 *
 * The two are EQUIVALENT (spec-pinned in BpeEncodeSpec against
 * applyMerges on trained tables): fusing pair k (rank order) can only
 * create adjacencies involving the new symbol l+r, and every learned
 * pair containing l+r was necessarily learned AFTER merge k created
 * that symbol — so no lower-rank pair can ever re-form, and
 * processing present pairs in ascending rank performs exactly the
 * sequential per-merge passes.
 *
 * The rank table rides into generated code via `addReferenceObj` —
 * one static-shaped call per row, no lambda boxing, no closure
 * re-deserialization per batch.
 */
class BpeTable(merges: Seq[(String, String)],
               byteLevel: Boolean = false) extends Serializable {
  // key = left + " " + right — a space can never appear inside a
  // learned symbol (symbols come from whitespace-tokenized words, and
  // byte-level symbols are hex), so the joined key is unambiguous
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, i)
    }
    m
  }

  private val hexChars = "0123456789ABCDEF".toCharArray

  /** Byte-level seed symbols straight off the UTF8String's bytes —
    * the [[graft.ops.Tokenizer.bbpeSymbols]] alphabet without a
    * String round trip. */
  private def byteSyms(w: UTF8String): Array[String] = {
    val bytes = w.getBytes
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i) = new String(Array(hexChars(b >> 4), hexChars(b & 0xF)))
      i += 1
    }
    out
  }

  def encode(w: UTF8String): ArrayData = {
    // char level: split("") keeps surrogate pairs whole — byte-for-
    // byte the symbol alphabet applyMerges starts from; byte level:
    // the word's UTF-8 bytes as hex pairs (bbpeSymbols' alphabet)
    val syms0 =
      if (byteLevel) byteSyms(w)
      else w.toString.split("").filter(_.nonEmpty)
    if (syms0.length <= 1)
      return new GenericArrayData(syms0.map(UTF8String.fromString(_): Any))
    var syms = syms0
    var continue = true
    while (continue && syms.length > 1) {
      // lowest-rank adjacent pair present
      var best = Integer.MAX_VALUE
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Integer.MAX_VALUE) continue = false
      else {
        // fuse ALL occurrences of the best pair, left-to-right
        // non-overlapping — the exact per-merge pass of applyMerges
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && {
            val r = ranks.get(syms(i) + " " + syms(i + 1))
            r != null && r.intValue == best
          }) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    new GenericArrayData(syms.map(UTF8String.fromString(_): Any))
  }
}

/** `bpe_encode(word)` with a bound merge table — array<string> tokens
  * (hex byte tokens when `byteLevel`, the GPT-2 family's alphabet). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     byteLevel: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table = new BpeTable(merges, byteLevel)
  override protected def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", new BpeTable(merges, byteLevel),
      classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = if (byteLevel) "bbpe_encode" else "bpe_encode"
}
