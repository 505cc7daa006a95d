package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Executor-local cache of deserialized per-bucket Bloom filters for
  * [[ShardedBloomMightContain]]: the probe join delivers each row its
  * bucket's SERIALIZED filter, and deserializing per row would be
  * catastrophic — the cache pins one deserialized filter per
  * (query, bucket) key. Bounded LRU (1024 entries): after the equi-join
  * both sides are hash-partitioned by bucket id, so one task only ever
  * touches its own partition's buckets (≈ nBuckets / shufflePartitions
  * keys — far under the cap); with a BROADCAST probe join a task can
  * see every bucket, and the LRU then bounds memory at the cost of
  * re-deserialization past 1024 hot buckets.
  */
object ShardedBloomCache {
  private val Cap = 1024
  private val m =
    new java.util.LinkedHashMap[(String, Long), BloomFilter](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), BloomFilter]): Boolean =
        size() > Cap
    }

  def get(callId: String, bucket: Long, bytes: Array[Byte]): BloomFilter = {
    val k = (callId, bucket)
    val hit = m.synchronized(m.get(k))
    if (hit != null) hit
    else {
      // Deserialize OUTSIDE the lock (a lost race costs one duplicate
      // deserialization, not task serialization on a shared monitor).
      val bf = BloomFilter.readFrom(bytes)
      m.synchronized {
        val again = m.get(k)
        if (again != null) again else { m.put(k, bf); bf }
      }
    }
  }
}

/** Bloom membership test against a PER-ROW serialized filter column —
  * the probe half of [[graft.text.CorpusOps.dedupAgainstPartitioned]]'s
  * sharded design, where each incoming row meets exactly its history
  * bucket's filter through an equi-join instead of one driver-merged
  * filter. Codegen'd like [[BloomMightContain]]; the deserialized
  * filters live in [[ShardedBloomCache]] keyed by `(callId, bucket)` —
  * `callId` is minted per expression CONSTRUCTION (one per analyzed
  * plan), so re-executions of one plan share cache entries while two
  * different dedup calls never collide.
  *
  * Null-safe on every child: a null hash has no membership, and a null
  * filter means the row's bucket holds NO history at all (the left
  * outer probe join found no bucket row) — callers coalesce the null
  * to `false`, i.e. "definitely new".
  */
case class ShardedBloomMightContain(
    first: Expression, second: Expression, third: Expression,
    callId: String = java.util.UUID.randomUUID().toString)
    extends TernaryExpression {

  private def bucket = first
  private def filterBytes = second
  private def hash = third

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (bucket.dataType == LongType && filterBytes.dataType == BinaryType &&
        hash.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "sharded_bloom_might_contain expects (bigint bucket, binary " +
          s"filter, bigint hash), got (${bucket.dataType.simpleString}, " +
          s"${filterBytes.dataType.simpleString}, " +
          s"${hash.dataType.simpleString})")

  override def prettyName: String = "sharded_bloom_might_contain"

  override def nullSafeEval(b: Any, bytes: Any, h: Any): Any =
    ShardedBloomCache
      .get(callId, b.asInstanceOf[Long], bytes.asInstanceOf[Array[Byte]])
      .mightContainLong(h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idRef = ctx.addReferenceObj("shardedBloomCallId", callId,
      "java.lang.String")
    nullSafeCodeGen(ctx, ev, (b, bytes, h) =>
      s"""${ev.value} = graft.functions.ShardedBloomCache
         |  .get($idRef, $b, $bytes).mightContainLong($h);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ShardedBloomMightContain =
    copy(first = newFirst, second = newSecond, third = newThird)
}
