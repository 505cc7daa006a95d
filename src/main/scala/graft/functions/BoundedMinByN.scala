package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Bounded deterministic per-group top-N: collects the payloads of the
  * `limit` smallest `(key, payload)` pairs (lexicographic — the payload
  * tie-break makes the result a pure function of the data even under
  * key collisions), returned sorted ascending.
  *
  * This is the skew-proof alternative to the `row_number() OVER
  * (PARTITION BY g ORDER BY k) <= N` window idiom: a window must
  * shuffle EVERY row of a group into one task before it can rank, so
  * one hot group (a crawl dump where a single domain is 10% of the
  * corpus) serializes the whole quota pass and can OOM the task. As a
  * [[TypedImperativeAggregate]] this runs with map-side partial
  * aggregation: each map task keeps at most `limit` pairs per group in
  * a bounded binary max-heap, so the shuffle carries ≤ `limit` rows per
  * group PER MAP PARTITION no matter how skewed the group is, and
  * memory is O(limit) per group everywhere. Partial/final merge is just
  * re-inserting the (already bounded) pairs, so the result is identical
  * to the window form — gated against it in FunctionsSpec.
  *
  * Null handling matches `min_by`-family SQL aggregates: rows with a
  * null key or payload are skipped; an empty group yields an empty
  * array (never null).
  */
case class BoundedMinByN(
    key: Expression, payload: Expression, limit: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinByN.Heap] {

  // Evaluated once at planning; checkInputDataTypes guarantees foldable.
  private lazy val n: Int = limit.eval() match {
    case i: Int => i
    case other  => other.asInstanceOf[Number].intValue()
  }

  override def children: Seq[Expression] = Seq(key, payload, limit)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (key.dataType != LongType || payload.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_min_by_n expects (bigint, bigint, int), got " +
          s"(${key.dataType.simpleString}, " +
          s"${payload.dataType.simpleString})")
    else if (limit.dataType != IntegerType || !limit.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bounded_min_by_n limit must be an int literal")
    else if (limit.eval() == null ||
        limit.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(
        "bounded_min_by_n limit must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_min_by_n"

  override def createAggregationBuffer(): BoundedMinByN.Heap =
    new BoundedMinByN.Heap(n)

  override def update(
      buf: BoundedMinByN.Heap, input: InternalRow): BoundedMinByN.Heap = {
    val k = key.eval(input)
    val p = payload.eval(input)
    if (k != null && p != null)
      buf.insert(k.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: BoundedMinByN.Heap,
      other: BoundedMinByN.Heap): BoundedMinByN.Heap = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.keys(i), other.payloads(i)); i += 1
    }
    buf
  }

  override def eval(buf: BoundedMinByN.Heap): Any =
    new GenericArrayData(buf.sortedPayloads)

  override def serialize(buf: BoundedMinByN.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.keys(i)); bb.putLong(buf.payloads(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinByN.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt()
    val h = new BoundedMinByN.Heap(n)
    var i = 0
    while (i < sz) { h.insert(bb.getLong(), bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedMinByN =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMinByN =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedMinByN =
    copy(key = newChildren(0), payload = newChildren(1),
      limit = newChildren(2))
}

object BoundedMinByN {

  /** Bounded binary MAX-heap over `(key, payload)` pairs in two parallel
    * primitive arrays (no per-element boxing): the root is the largest
    * retained pair, so a full heap admits a new pair iff it beats the
    * root, in O(log cap). Lazily sized — tiny groups never allocate the
    * full capacity.
    */
  final class Heap(cap: Int) {
    var keys: Array[Long] = new Array[Long](math.min(cap, 16))
    var payloads: Array[Long] = new Array[Long](math.min(cap, 16))
    var size: Int = 0

    private def less(k1: Long, p1: Long, k2: Long, p2: Long): Boolean =
      k1 < k2 || (k1 == k2 && p1 < p2)

    def insert(k: Long, p: Long): Unit = {
      if (size < cap) {
        if (size == keys.length) {
          val grow = math.min(cap, keys.length * 2)
          keys = java.util.Arrays.copyOf(keys, grow)
          payloads = java.util.Arrays.copyOf(payloads, grow)
        }
        keys(size) = k; payloads(size) = p; size += 1
        siftUp(size - 1)
      } else if (less(k, p, keys(0), payloads(0))) {
        keys(0) = k; payloads(0) = p
        siftDown(0)
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val parent = (i - 1) >> 1
        if (less(keys(parent), payloads(parent), keys(i), payloads(i))) {
          swap(i, parent); i = parent
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var big = i
        if (l < size && less(keys(big), payloads(big), keys(l), payloads(l)))
          big = l
        if (r < size && less(keys(big), payloads(big), keys(r), payloads(r)))
          big = r
        if (big == i) return
        swap(i, big); i = big
      }
    }

    /** Payloads of the retained pairs, ordered by ascending (key,
      * payload) — the deterministic output order.
      */
    def sortedPayloads: Array[Long] = {
      val idx = Array.range(0, size).sortWith { (a, b) =>
        less(keys(a), payloads(a), keys(b), payloads(b))
      }
      idx.map(payloads)
    }
  }
}
