package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `delete_neighborhood(str, k, maxLen)` — the DISTINCT strings
  * reachable from `str` by deleting AT MOST `k` codepoints (the string
  * itself included). This is the exact candidate signature behind
  * [[graft.similarity.EditJoin]]: by the deletion-neighborhood
  * pigeonhole (the SymSpell construction), `lev(a, b) <= k` implies
  * the two neighborhoods intersect — take an optimal edit script and
  * delete each substituted codepoint from both sides, each inserted
  * one from `b`, each deleted one from `a`; at most `k` deletions per
  * side land both on the same string — so an equi-join on neighborhood
  * members loses NO true pair, and the join's false positives are
  * removed by an exact thresholded `levenshtein` verify.
  *
  * CODEPOINT alphabet, deliberately: Spark's `levenshtein` counts
  * codepoint edits (not bytes like DuckDB's, not UTF-16 units like
  * naive Java), and the soundness argument only holds when the
  * neighborhood and the verify distance agree on what one "edit" is —
  * deleting half a surrogate pair would both corrupt the variant
  * string and break the guarantee.
  *
  * Neighborhood size is Θ(len^k): ~C(len, k) + C(len, k−1) + …
  * distinct variants per row. This is an operator for SHORT fields —
  * names, titles, codes — which is why `k` is capped at 2 and rows
  * longer than `maxLen` codepoints FAIL LOUDLY (no silent row drop:
  * silently skipping long rows would silently lose their pairs; a
  * corpus with long fields should pass a deliberate higher `maxLen`
  * and accept the cost, or not use edit-distance joining at all).
  * At the defaults (k ≤ 2, maxLen 128) the worst row emits 8 257
  * variants; a 20-char name at k = 2 emits ~211.
  */
object DeleteNeighborhood {
  val MaxK = 2

  /** Static helper the generated code calls — one virtual call per
    * row, the combinatorics stay in Scala (same pattern as
    * [[ShardedBloomCache]]).
    */
  def variants(s: UTF8String, k: Int, maxLen: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n > maxLen)
      throw new IllegalArgumentException(
        s"delete_neighborhood: field has $n codepoints > maxLen $maxLen" +
          " — this operator is for short fields; raise maxLen " +
          "deliberately if the O(len^k) variant cost is acceptable")
    val out = new java.util.LinkedHashSet[String]()
    out.add(str)
    var frontier: Array[String] = Array(str)
    var level = 0
    while (level < k) {
      val next = new java.util.LinkedHashSet[String]()
      frontier.foreach { v =>
        val cps = v.codePoints().toArray
        var i = 0
        while (i < cps.length) {
          val d = new Array[Int](cps.length - 1)
          System.arraycopy(cps, 0, d, 0, i)
          System.arraycopy(cps, i + 1, d, i, cps.length - i - 1)
          next.add(new String(d, 0, d.length))
          i += 1
        }
      }
      out.addAll(next)
      frontier = next.toArray(new Array[String](next.size()))
      level += 1
    }
    val arr = new Array[AnyRef](out.size())
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }
}

case class DeleteNeighborhood(child: Expression, k: Int, maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"delete_neighborhood expects a string, got " +
          child.dataType.simpleString)
    else if (k < 0 || k > DeleteNeighborhood.MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"delete_neighborhood k must be in [0, ${DeleteNeighborhood.MaxK}]" +
          s" (variant count is O(len^k)), got $k")
    else if (maxLen <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"delete_neighborhood maxLen must be positive, got $maxLen")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "delete_neighborhood"

  override def nullSafeEval(s: Any): Any =
    DeleteNeighborhood.variants(s.asInstanceOf[UTF8String], k, maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.DeleteNeighborhood
         |  .variants($c, $k, $maxLen);""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): DeleteNeighborhood = copy(child = newChild)
}
