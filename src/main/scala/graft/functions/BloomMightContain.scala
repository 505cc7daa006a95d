package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom membership test over an `xxhash64` column — the tier
  * above the Scala UDF it replaced in [[graft.text.CorpusOps.dedupAgainst]]
  * (same upgrade [[CosineSimilarity]] made for the ANN verify path): the
  * UDF boxed every hash into a `java.lang.Long` and broke the enclosing
  * whole-stage-codegen span at the hottest site the operator has — the
  * map-side prefilter every incoming row passes through — while this
  * expression is one virtual call inside the generated loop.
  *
  * The SERIALIZED filter rides the expression as a plain constructor
  * field, NOT as a child `Literal`: a binary literal prints as full hex
  * in every plan string (a 1% fpp filter over 200k items would put
  * ~470 KB of hex into `explain` and every PlanSpec failure message),
  * and the field form ships identically — the expression is part of the
  * per-stage task binary, which Spark broadcasts once per stage, the
  * same wire cost as the Broadcast variable the UDF closed over.
  * The task binary deserializes per TASK, so a naive lazy val here
  * would re-run `BloomFilter.readFrom` (and allocate a fresh bit
  * array) once per task, not per executor; instead the transient lazy
  * [[bloomFilter]] resolves through [[ShardedBloomCache.getByContent]]
  * — an executor-wide, byte-budgeted cache keyed by a full-content
  * fingerprint — so each DISTINCT filter deserializes once per
  * executor JVM and every concurrent task shares the one bit array.
  * The per-task cost is one FNV-1a pass over the serialized bytes (a
  * fraction of `readFrom`, and no allocation). The generated code
  * calls back into this object rather than re-reading the bytes per
  * row.
  *
  * Registered as `bloom_might_contain(bloomBytes, hash)` — the builder
  * accepts any FOLDABLE binary first argument and evaluates it at
  * analysis time, so the SQL form `bloom_might_contain(X'...', h)`
  * works and the analyzed plan never carries the literal.
  * NULL hash → NULL (the operator's callers route null text around the
  * filter explicitly).
  */
case class BloomMightContain(filterBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  @transient lazy val bloomFilter: BloomFilter =
    ShardedBloomCache.getByContent(filterBytes)

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a bigint hash, got " +
          child.dataType.simpleString)

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloomFilter.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference THIS expression (bytes included) — the lazy val
    // resolves the shared per-executor filter through the content
    // cache, and nothing is shipped twice.
    val ref = ctx.addReferenceObj("bloomMightContainExpr", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = $ref.bloomFilter().mightContainLong($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
