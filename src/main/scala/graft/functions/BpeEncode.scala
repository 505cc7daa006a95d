package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Precompiled BPE merge table — the analysis-time-constant structure
  * [[BpeEncode]] carries (the [[BloomMightContain]] pattern: the table
  * is evaluated once at resolution and referenced from generated code,
  * never serialized into the plan as K nested expressions). `lr(k)` is
  * the precomputed concatenation `l(k) + r(k)`, used both as the merged
  * symbol and as the contains-fast-path probe (symbols are contiguous
  * substrings of the word, so adjacent `l, r` implies `lr` occurs in
  * the word text — a word not containing `lr` can skip pass `k`
  * without scanning symbols).
  */
final class BpeMergeTable private (val l: Array[String],
    val r: Array[String], val lr: Array[String]) extends Serializable {
  def size: Int = l.length

  // Content-based equality (over the ranked (l, r) pairs — `lr` is
  // derived): [[BpeEncode]] is a case class, so with the default
  // reference equality two bpe_encode calls built from IDENTICAL merge
  // tables never compared semantically equal — defeating common-
  // subexpression elimination and exchange/plan reuse for repeated
  // encodes with the same tokenizer. Equality MAY ignore `lr` only
  // because the constructor is private and the companion apply derives
  // lr = l + r — a hand-built table with a divergent lr could otherwise
  // compare equal to a semantically different one and be conflated by
  // CSE.
  override def equals(other: Any): Boolean = other match {
    case t: BpeMergeTable =>
      java.util.Arrays.equals(l.asInstanceOf[Array[AnyRef]],
        t.l.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(r.asInstanceOf[Array[AnyRef]],
          t.r.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(l.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.hashCode(r.asInstanceOf[Array[AnyRef]])
}

object BpeMergeTable {
  /** The ONLY constructor path — derives `lr`, preserving the
    * invariant the content-based equals relies on. */
  def apply(merges: Seq[(String, String)]): BpeMergeTable = {
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l != null && r != null && l.nonEmpty && r.nonEmpty,
        s"bpe merge ${i + 1} has a null/empty side: ($l, $r)")
    }
    new BpeMergeTable(merges.map(_._1).toArray, merges.map(_._2).toArray,
      merges.map(m => m._1 + m._2).toArray)
  }
}

/** `bpe_encode(word, merges)` — byte-pair-encoding of ONE word: split
  * the word into codepoint symbols (the grain `split(w, "")` produces —
  * an empty word is ONE empty symbol, the corpus family's empty-token
  * grain), then apply each merge in rank order as ONE left-to-right
  * greedy pass (adjacent symbol pair `(l, r)` → symbol `l+r`; a symbol
  * formed by the pass immediately becomes the left operand for the next
  * position, so `a a a a` under merge `(a, a)` is `aa aa`, and `a a a`
  * is `aa a` — the classic Sennrich 2016 merge semantics, restated by
  * the DuckDB oracle as a `list_reduce` chain and by
  * [[graft.text.Bpe.mergePassCol]] as the higher-order-function twin;
  * BpeSpec pins all three bit-equal).
  *
  * Merges are STRUCTURAL (they define the function), so they ride as an
  * analysis-time-constant [[BpeMergeTable]] — the generated code makes
  * one static call per row and the K-pass loop stays in compiled Scala
  * instead of a K-deep expression tree (encoding with a learned
  * 1000-merge table is the same single expression node). Per-word cost:
  * the `word.contains(lr)` fast path skips every pass whose pair cannot
  * occur (symbols are contiguous substrings of the word), so the
  * typical word pays O(len) per APPLICABLE merge only.
  */
object BpeEncode {

  /** Static helper the generated code calls (the
    * [[DeleteNeighborhood.variants]] pattern).
    */
  def encode(word: UTF8String, t: BpeMergeTable): ArrayData = {
    val w = word.toString
    var syms = splitCodepoints(w)
    var k = 0
    while (k < t.size) {
      if (syms.length >= 2 && w.contains(t.lr(k)))
        syms = mergePass(syms, t.l(k), t.r(k), t.lr(k))
      k += 1
    }
    val out = new Array[AnyRef](syms.length)
    var j = 0
    while (j < syms.length) {
      out(j) = UTF8String.fromString(syms(j)); j += 1
    }
    new GenericArrayData(out)
  }

  /** Codepoint split matching `split(w, "")`: "" → [""], surrogate
    * pairs stay whole (one codepoint, one symbol). `private[graft]`:
    * [[graft.text.Bpe]]'s driver-local learn loop reuses it so the
    * fast path's symbol grain is the compiled encode's by construction.
    */
  private[graft] def splitCodepoints(w: String): Array[String] = {
    if (w.isEmpty) return Array("")
    val n = w.codePointCount(0, w.length)
    val out = new Array[String](n)
    var i = 0
    var j = 0
    while (i < w.length) {
      val c = w.codePointAt(i)
      val len = Character.charCount(c)
      out(j) = w.substring(i, i + len)
      i += len
      j += 1
    }
    out
  }

  /** One left-to-right greedy pass of merge (l, r) → lr. Returns the
    * INPUT array (reference-equal) when no adjacency matched — callers
    * use the `eq` check as a free "did anything change" probe.
    * `private[graft]`: [[graft.text.Bpe]]'s driver-local learn loop
    * reuses it so learn-side rewrites and the compiled encode share one
    * pass definition.
    */
  private[graft] def mergePass(syms: Array[String], l: String, r: String,
      lr: String): Array[String] = {
    val out = new Array[String](syms.length)
    var n = 0
    var i = 0
    while (i < syms.length) {
      if (n > 0 && out(n - 1) == l && syms(i) == r) {
        out(n - 1) = lr
      } else {
        out(n) = syms(i)
        n += 1
      }
      i += 1
    }
    if (n == syms.length) syms
    else java.util.Arrays.copyOf(out, n)
  }
}

case class BpeEncode(child: Expression, merges: BpeMergeTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects a string word, got " +
          child.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(s: Any): Any =
    BpeEncode.encode(s.asInstanceOf[UTF8String], merges)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.encode($c, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)
}
