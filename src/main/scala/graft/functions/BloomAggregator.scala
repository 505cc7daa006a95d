package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Typed aggregator building one serialized Bloom filter per group over
  * a bigint hash column — the build half of
  * [[graft.text.CorpusOps.dedupAgainstPartitioned]]: partial filters
  * are built map-side per (task, group), merged through the standard
  * partial/final aggregation (BloomFilter bit-or via `mergeInPlace`),
  * and the DRIVER never holds more than the rows it collects — the
  * whole point of the sharded design vs the driver-merged
  * `stat.bloomFilter`. Each group's filter is sized for
  * `expectedItemsPerGroup`; the shuffle carries one partial filter per
  * (map task, live group), which is the honest distributed cost of a
  * distributed build.
  */
class BloomAggregator(expectedItemsPerGroup: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {
  require(expectedItemsPerGroup > 0, s"expectedItems $expectedItemsPerGroup")
  require(fpp > 0.0 && fpp < 1.0, s"fpp $fpp not in (0,1)")

  override def zero: BloomFilter =
    BloomFilter.create(expectedItemsPerGroup, fpp)

  override def reduce(b: BloomFilter, h: Long): BloomFilter = {
    b.putLong(h); b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
