package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd affine-gap string comparator — replaces the LAST two Scala
  * UDFs that lived in main (`Comparators.affineGapUdf/affineGapSimUdf`):
  * a ScalaUDF fences whole-stage codegen, so the q50 scorer's feature
  * projection — the hottest per-pair loop of the pipeline — was split
  * around every String field's comparator. This expression calls the
  * same static DP ([[graft.similarity.AffineGap]], Gotoh's algorithm
  * with the pinned affinegap-package weights) from INSIDE the generated
  * code, the established static-helper pattern
  * ([[DeleteNeighborhood]]/[[ShardedBloomCache]]): the projection fuses
  * into one codegen stage and the only per-row cost beyond the DP
  * itself is the UTF8String→String materialization the DP's
  * `charAt`-indexed inner loop needs (the UDF paid the same conversion,
  * plus its encoder round-trip).
  *
  * Values are BIT-IDENTICAL to the UDF form by construction — both call
  * the same `AffineGap.normalized`/`similarity` on the same JVM String
  * pair (FunctionsSpec pins UDF vs expression vs driver Scala
  * three-ways). Null semantics are the standard null-in-null-out of a
  * [[BinaryExpression]]; the one divergence from the old UDFs — which
  * returned NaN (distance) / 0.0 (similarity) on null input because the
  * closure itself null-checked — is unreachable from
  * [[graft.similarity.Comparators.fieldDistance]], whose `when` guard
  * short-circuits null operands to 0.0 before the comparator runs, and
  * null-in-null-out is what every other registered graft function does.
  *
  * `sim = false`: length-normalized distance in ~[0.5, 6], lower =
  * more similar (identical strings = 0.5). `sim = true`:
  * `exp(-(d - 0.5))` in (0, 1], 1 = identical.
  */
case class AffineGapDistance(left: Expression, right: Expression,
    sim: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def prettyName: String =
    if (sim) "affine_gap_sim" else "affine_gap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    if (sim) graft.similarity.AffineGap.similarity(s1, s2)
    else graft.similarity.AffineGap.normalized(s1, s2)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (sim) "similarity" else "normalized"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.similarity.AffineGap.$fn($a.toString(), $b.toString())")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AffineGapDistance =
    copy(left = newLeft, right = newRight)
}
