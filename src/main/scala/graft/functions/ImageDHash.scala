package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `image_dhash(payload)` — 60-bit integer-space perceptual difference
  * hash of an image payload (see
  * [[graft.multimodal.Multimodal.dHash60]] for the pixel contract):
  * decode (24-bit BMP via the pure-JVM parser, JPEG/PNG via the stock
  * JDK ImageIO), integer luma per pixel, integer box-downsample onto
  * the fixed 11×6 grid, one bit per horizontally-adjacent cell pair
  * via overflow-checked cross-multiplication — NO floating point
  * anywhere, so the hash is bit-stable across engines and the DuckDB
  * oracle can restate it arithmetically (q75).
  *
  * Returns NULL for payloads none of the decoders accept (null input
  * included) — undecodable is data, not an error; a genuinely
  * oversized image (cells past the cross-multiplication Long bound,
  * ~400 Mpx) fails LOUDLY instead of hashing wrong.
  */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_dhash expects binary, got ${child.dataType.simpleString}")

  override def prettyName: String = "image_dhash"

  override def nullSafeEval(b: Any): Any =
    graft.multimodal.Multimodal.dHash60(b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("dhBoxed")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed =
            graft.multimodal.Multimodal.dHash60(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ImageDHash = copy(child = newChild)
}
