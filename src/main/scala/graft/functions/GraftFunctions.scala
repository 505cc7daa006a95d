package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registers graft's native Catalyst expressions as SQL functions via the
  * public `SparkSessionExtensions` mechanism. Every graft entry point
  * builds its session with `spark.sql.extensions=graft.functions
  * .GraftExtensions` (see [[GraftExtensions.CONF]]), so `cosine_sim` is
  * resolvable both from `spark.sql("...")` and from the Column API via
  * [[GraftFunctions.cosineSim]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {
  /** Value for the `spark.sql.extensions` session config. */
  val CONF: String = classOf[GraftExtensions].getName

  private val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"bloom_might_contain expects 2 arguments, got ${exprs.length}")
        // The serialized filter must be analysis-time constant: it is
        // evaluated HERE and carried as a plain field, so the analyzed
        // plan never contains the (huge) binary literal.
        val bloomArg = exprs.head
        require(bloomArg.foldable &&
            bloomArg.dataType == org.apache.spark.sql.types.BinaryType,
          "bloom_might_contain's first argument must be a foldable " +
            s"binary (the serialized filter), got $bloomArg")
        val bytes = bloomArg.eval().asInstanceOf[Array[Byte]]
        require(bytes != null,
          "bloom_might_contain's serialized filter is null")
        BloomMightContain(bytes, exprs(1))
      }),
    (FunctionIdentifier("sharded_bloom_might_contain"),
      new ExpressionInfo(classOf[ShardedBloomMightContain].getName,
        "sharded_bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3 || exprs.length == 4,
          "sharded_bloom_might_contain expects (bucket, filter, hash" +
            s"[, strictNulls]), got ${exprs.length} arguments")
        // 3-arg SQL form defaults to STRICT per-row null semantics
        // (exact, pays a per-row binary extraction); the operator's
        // probe path passes strictNulls = false for the
        // extract-on-miss fast mode, whose contract is per-bucket
        // constant filters (see ShardedBloomMightContain).
        val strict = exprs.length == 3 || {
          val e = exprs(3)
          require(e.foldable &&
              e.dataType == org.apache.spark.sql.types.BooleanType,
            "sharded_bloom_might_contain's 4th argument (strictNulls) " +
              s"must be a foldable boolean, got $e")
          e.eval().asInstanceOf[Boolean]
        }
        ShardedBloomMightContain(exprs(0), exprs(1), exprs(2),
          strictNulls = strict)
      }),
    (FunctionIdentifier("delete_neighborhood"),
      new ExpressionInfo(classOf[DeleteNeighborhood].getName,
        "delete_neighborhood"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "delete_neighborhood expects 3 arguments (str, k, maxLen), " +
            s"got ${exprs.length}")
        // k and maxLen are STRUCTURAL (they bound the variant
        // combinatorics), so they must be analysis-time constants —
        // evaluated here and carried as plain fields, like
        // bloom_might_contain's filter bytes.
        def constInt(e: Expression, name: String): Int = {
          require(e.foldable &&
              e.dataType == org.apache.spark.sql.types.IntegerType,
            s"delete_neighborhood's $name must be a foldable int, got $e")
          e.eval().asInstanceOf[Int]
        }
        DeleteNeighborhood(exprs.head, constInt(exprs(1), "k"),
          constInt(exprs(2), "maxLen"))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"nfc_normalize expects 1 argument, got ${exprs.length}")
        NfcNormalize(exprs.head)
      }),
    (FunctionIdentifier("affine_gap"),
      new ExpressionInfo(classOf[AffineGapDistance].getName, "affine_gap"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"affine_gap expects 2 arguments, got ${exprs.length}")
        AffineGapDistance(exprs.head, exprs(1), sim = false)
      }),
    (FunctionIdentifier("affine_gap_sim"),
      new ExpressionInfo(classOf[AffineGapDistance].getName,
        "affine_gap_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"affine_gap_sim expects 2 arguments, got ${exprs.length}")
        AffineGapDistance(exprs.head, exprs(1), sim = true)
      }),
    (FunctionIdentifier("image_dhash"),
      new ExpressionInfo(classOf[ImageDHash].getName, "image_dhash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"image_dhash expects 1 argument, got ${exprs.length}")
        ImageDHash(exprs.head)
      }),
    (FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"bpe_encode expects (word, merges), got ${exprs.length}")
        // The merge table is STRUCTURAL (it defines the function), so
        // it must be an analysis-time constant: evaluated HERE into a
        // precompiled BpeMergeTable and carried as a plain field — the
        // analyzed plan never contains the K-pair literal (the
        // bloom_might_contain pattern).
        val m = exprs(1)
        require(m.foldable && m.dataType ==
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType, false), false),
          "bpe_encode's second argument must be a foldable " +
            s"array<array<string>> of (l, r) merge pairs, got $m")
        val arr = m.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(arr != null, "bpe_encode's merge table is null")
        val pairs = (0 until arr.numElements()).map { i =>
          val p = arr.getArray(i)
          require(p != null && p.numElements() == 2,
            s"bpe_encode merge ${i + 1} is not an (l, r) pair")
          (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
        }
        BpeEncode(exprs.head, BpeMergeTable(pairs))
      }),
    (FunctionIdentifier("bounded_min_by_n"),
      new ExpressionInfo(classOf[BoundedMinByN].getName,
        "bounded_min_by_n"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"bounded_min_by_n expects 3 arguments, got ${exprs.length}")
        // The analyzer wraps a bare AggregateFunction returned from a
        // registry builder in AggregateExpression(_, Complete, _).
        BoundedMinByN(exprs(0), exprs(1), exprs(2))
      }))

  def inject(ext: SparkSessionExtensions): Unit =
    descriptions.foreach(ext.injectFunction)
}

/** Column-API entry points for the injected functions. */
object GraftFunctions {

  /** Codegen'd cosine similarity over two `array<float>` columns (see
    * [[CosineSimilarity]] for the arithmetic contract). Resolves through
    * the session's function registry, so the session must carry
    * [[GraftExtensions]] — all graft-built sessions do.
    */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Skew-proof bounded per-group top-N (see [[BoundedMinByN]]): the
    * payloads of the `n` smallest `(key, payload)` pairs, ascending.
    * An aggregate — use inside `groupBy(...).agg(...)`.
    */
  def boundedMinByN(key: Column, payload: Column, n: Int): Column =
    call_function("bounded_min_by_n", key, payload,
      org.apache.spark.sql.functions.lit(n))

  /** Codegen'd Bloom membership test of a bigint hash column against a
    * serialized `org.apache.spark.util.sketch.BloomFilter` (see
    * [[BloomMightContain]]). The bytes literal exists only in the
    * unresolved plan; the analyzed expression carries them as a field.
    */
  def bloomMightContain(filterBytes: Array[Byte], hash: Column): Column =
    call_function("bloom_might_contain",
      org.apache.spark.sql.functions.lit(filterBytes), hash)

  /** Membership test against a PER-ROW serialized filter column (see
    * [[ShardedBloomMightContain]]); null filter (no bucket row from the
    * probe join) or null hash yields null — coalesce at the call site.
    * This entry point is the OPERATOR's: it opts into the
    * extract-on-miss fast mode (`strictNulls = false`), whose contract
    * is per-bucket constant filters — exactly what a probe join
    * produces. Arbitrary heterogeneous inputs should use the 3-arg SQL
    * form, which is strict.
    */
  def shardedBloomMightContain(bucket: Column, filter: Column,
      hash: Column): Column =
    call_function("sharded_bloom_might_contain", bucket, filter, hash,
      org.apache.spark.sql.functions.lit(false))

  /** Codegen'd Unicode NFC normalization (see [[NfcNormalize]]):
    * canonical composition so visually-identical composed/decomposed
    * strings hash, join, and dedup identically downstream. Null in →
    * null out; ASCII and already-normalized rows return the input
    * untouched.
    */
  def nfcNormalize(s: Column): Column = call_function("nfc_normalize", s)

  /** Codegen'd normalized affine-gap distance over two string columns
    * (see [[AffineGapDistance]]): ~[0.5, 6], lower = more similar,
    * identical = 0.5. Null in → null out.
    */
  def affineGap(a: Column, b: Column): Column =
    call_function("affine_gap", a, b)

  /** Codegen'd affine-gap similarity in (0, 1], 1 = identical (see
    * [[AffineGapDistance]]). Null in → null out.
    */
  def affineGapSim(a: Column, b: Column): Column =
    call_function("affine_gap_sim", a, b)

  /** Codegen'd per-word BPE encoding (see [[BpeEncode]]): codepoint
    * symbols, each merge applied in rank order as one left-to-right
    * greedy pass. The merge table compiles into the expression at
    * analysis time (one static call per row, no K-deep expression
    * tree). Null word → null; empty word → [""] (the family's
    * empty-token grain).
    */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column = {
    // An empty table would make the literal's element type unresolvable
    // (and a zero-merge encode is just split(w, "") — say so).
    require(merges.nonEmpty,
      "bpe_encode with no merges is split(word, '') — use that directly")
    call_function("bpe_encode", word,
      org.apache.spark.sql.functions.array(merges.map { case (l, r) =>
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(l),
          org.apache.spark.sql.functions.lit(r))
      }: _*))
  }

  /** Distinct strings reachable by deleting at most `k` codepoints —
    * the exact candidate signature for edit-distance joining (see
    * [[DeleteNeighborhood]] for the pigeonhole guarantee and the
    * loud length guard).
    */
  def deleteNeighborhood(str: Column, k: Int, maxLen: Int): Column =
    call_function("delete_neighborhood", str,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(maxLen))
}
