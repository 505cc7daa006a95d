package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-scale deduplication operators for training-data pipelines
  * (harness extension beyond the reference's person-dedup surface; the
  * reference's exact pre-merge at pgdedupe/run.py:91-99 is the pattern all
  * of these generalize).
  *
  * The corpus-wide steps are pure column expressions + equi-joins (scale
  * by shuffle); the per-document signature computations (shingles,
  * MinHash, SimHash) are fused primitive-loop UDFs — each op's scaladoc
  * records why that beats the expression form it replaced.
  *
  * Persist lifecycle: the candidate-generation operators below
  * (`minHashCandidates`, `jaccardVerify`, `simHashCandidates`) each cache
  * an expensive internal frontier that their plan reads more than once.
  * That frontier is materialized, consumed, and UNPERSISTED before the
  * function returns — no internal block outlives the call. What the
  * caller receives is the (small) result frame, persisted MEMORY_AND_DISK
  * so downstream actions don't recompute the whole pipeline; call
  * `.unpersist()` on it when done (one handle releases everything).
  */
object TextDedup {

  private val Disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** The ONE tokenizer shared by every fused UDF in this file —
    * bit-identical to the codegen'd `TextAnalysis.tokens` (trim on
    * `^\s+|\s+$`, split on `\s+`). A single definition, because the
    * batch/streaming/oracle parity of the whole signature family hangs
    * on these regexes: three hand-synchronized copies were one edit
    * away from silent LSH drift. Patterns are compiled once per JVM
    * (object fields), not once per row as `String.replaceAll`/`split`
    * would.
    */
  private val TrimRe = java.util.regex.Pattern.compile("^\\s+|\\s+$")
  private val WsRe = java.util.regex.Pattern.compile("\\s+")
  private def tokenize(t: String): Array[String] = {
    val trimmed = TrimRe.matcher(t).replaceAll("")
    if (trimmed.isEmpty) Array.empty else WsRe.split(trimmed)
  }

  /** Distinct space-joined k-grams in first-occurrence order — the one
    * shingle builder behind both [[shingles]] and [[minHashSignature]]
    * (order only matters to the former; the min-fold is
    * order-independent).
    */
  private def distinctShingles(toks: Array[String], k: Int)
      : java.util.LinkedHashSet[String] = {
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }

  /** Per-thread MD5 instance: MessageDigest is neither thread-safe nor
    * serializable, and `getInstance` per ROW is a provider lookup in
    * the hottest loops this file has. ThreadLocal on the object gives
    * each executor task thread one reusable instance (digest() resets
    * it) with no serialization crossing.
    */
  private val Md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Materialize `result` (persisted) while `frontiers` are still cached,
    * then release the frontiers. The returned frame is the ONLY block
    * left pinned, and it is the caller's handle.
    */
  private def sealResult(result: DataFrame, frontiers: DataFrame*): DataFrame = {
    val out = result.persist(Disk)
    out.count() // materialize now, while the frontiers are cached
    frontiers.foreach(_.unpersist(false))
    out
  }

  /** Exact dedup by content hash (md5 over the text column): keeps the
    * minimum doc_id per identical text. One hash-aggregation shuffle;
    * at 100 TB hash first so the shuffle carries 32-byte digests, not
    * document bodies.
    */
  def exactByHash(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // Null IDS are dropped (module policy — domainCap, the candidate
    // streams, and CC do the same): min/collect_list would skip them
    // while count counted them, yielding groups whose dup_count
    // disagrees with member_ids, or an all-null group with a NULL
    // canonical_id as a downstream merge key.
    val src = docs.where(col(idCol).isNotNull)
      .select(md5(col(textCol)).as("content_hash"), col(idCol))
    // null text is NOT "identical text": md5(null) is null and groupBy
    // treats null as an ordinary key, so every null-text document
    // collapsed into ONE bogus duplicate cluster — at scale, dedup
    // would then drop all but one of millions of empty documents. Null
    // texts pass through as singletons instead.
    val hashed = src.where(col("content_hash").isNotNull)
      .groupBy("content_hash")
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("dup_count"),
        sort_array(collect_list(idCol)).as("member_ids"))
    val nulls = src.where(col("content_hash").isNull)
      .select(col("content_hash"), col(idCol).as("canonical_id"),
        lit(1L).as("dup_count"), array(col(idCol)).as("member_ids"))
    hashed.unionByName(nulls)
  }

  /** k-shingles, fused into one primitive-loop UDF. The pure-expression
    * form — transform(sequence(...)) over tokens(text) — re-evaluates
    * the NESTED tokenization subtree once per lambda element when the
    * interpreted HOF runs (HOFs are CodegenFallback, and the subtree is
    * inlined into the lambda, not bound): one re-tokenization per
    * shingle, measured 8.8 s to shingle 5,000 sf0.1 docs vs ~0.3 s
    * fused. A projection boundary doesn't help — CollapseProject
    * re-inlines it. Output is bit-identical to the old expression: same
    * trim/split regexes as TextAnalysis.tokens ([[tokenize]]),
    * space-joined k-grams, first-occurrence dedup (array_distinct),
    * null text → null, fewer than k tokens → empty.
    */
  def shingles(text: Column, k: Int): Column = {
    val f = udf { (t: String) =>
      if (t == null) null
      else {
        val toks = tokenize(t)
        if (toks.length < k) Array.empty[String]
        else {
          val seen = distinctShingles(toks, k)
          val out = new Array[String](seen.size)
          seen.toArray(out)
          out
        }
      }
    }
    f(text)
  }

  /** MinHash modulus and affine mixing constants: ONE md5 per shingle
    * yields a 60-bit base hash `u`; the k "permutations" are
    * h_i(u) = (a_i·u + b_i) mod M with M = 2³¹−1 (so a·u+b stays inside
    * a signed 64-bit long) and a_i/b_i derived from md5 of a fixed seed
    * string — deterministic across engines and runs, no RNG state.
    * Replaces the earlier min-over-md5(shingle ++ "#i") family, which
    * paid k md5 evaluations per exploded shingle row (the md5 dominates;
    * measured 2.8× slower at sf0.1 with k = 12).
    */
  val MinHashMod: Long = 2147483647L

  def mixA(i: Int): Long = hashConst(s"minhash-a-$i", MinHashMod - 1) + 1
  def mixB(i: Int): Long = hashConst(s"minhash-b-$i", MinHashMod)

  private def hashConst(seed: String, mod: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(seed.getBytes("UTF-8"))
      .take(7).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % mod
  }

  /** First 60 bits of md5(s): numerically identical to the SQL
    * `conv(substring(md5(s), 1, 15), 16, 10)` — 15 hex chars are the
    * first 7.5 digest bytes, i.e. the big-endian first-8-byte word
    * shifted right 4.
    */
  private def md5Hash60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val b = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** MinHash signatures via the affine family above. Returns
    * (idCol, sig: array<long> of k mins); docs with no shingles (null
    * text or fewer than k tokens) are absent, as they were when the
    * exploded form dropped their empty shingle arrays.
    *
    * Shape: ONE primitive-loop UDF per row — tokenize, shingle, md5
    * each distinct shingle once, fold the k affine mins in place. The
    * signature is a pure per-document function, so the previous
    * explode + groupBy(id).agg(min...) paid a row-blowup plus an
    * aggregation shuffle for what a per-row loop computes with neither
    * (the same transformation that took shingling 8.8 s → 0.3 s); the
    * earlier all-expression `array_min(transform(...))` form was worse
    * still — interpreted HOFs re-evaluate the shingle subtree per hash,
    * measured 50× slower at sf0.1. Values are bit-identical to both:
    * same trim/split, same 60-bit md5 prefix, same (a·u+b) mod M fold.
    */
  def minHashSignature(docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int, numHashes: Int): DataFrame = {
    val as = (0 until numHashes).map(mixA).toArray
    val bs = (0 until numHashes).map(mixB).toArray
    val f = udf { (t: String) =>
      if (t == null) null
      else {
        val toks = tokenize(t)
        if (toks.length < shingleK) null
        else {
          val md = Md5Local.get()
          val mins = Array.fill(numHashes)(Long.MaxValue)
          val it = distinctShingles(toks, shingleK).iterator()
          while (it.hasNext) {
            val u = md5Hash60(md, it.next()) % MinHashMod
            var h = 0
            while (h < numHashes) {
              val v = (u * as(h) + bs(h)) % MinHashMod
              if (v < mins(h)) mins(h) = v
              h += 1
            }
          }
          mins
        }
      }
    }
    // Null-drop via the cheap INPUT-side precondition (null text / fewer
    // than k tokens), not `isNotNull` on the UDF output: Catalyst pushes
    // an output-side filter below the projection by substituting the
    // alias, evaluating the UDF twice per row (seen in the optimized
    // plan: `Filter isnotnull(UDF(text))` under `Project [UDF(text)]`).
    // Null IDS are dropped too (module policy — exactByHash, domainCap,
    // the candidate streams, and CC all do the same): they can emit no
    // candidate pair anyway (NULL < NULL is NULL), and any exploded/
    // groupBy restatement of this op — the oracle phrasing — would
    // merge every null-id doc's shingles into ONE bogus signature,
    // since groupBy treats null as an ordinary key.
    docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull &&
        size(graft.text.TextAnalysis.tokens(col(textCol))) >= shingleK)
      .select(col(idCol), f(col(textCol)).as("sig"))
  }

  /** MinHash-LSH candidate pairs: band the signature (bands × rowsPerBand
    * = numHashes), bucket-join on (band, band-hash), emit distinct ordered
    * id pairs. The classic shingle→minhash→band→bucket-join pipeline; the
    * band join is the only shuffle that matters and it is an equi-join on
    * a high-cardinality key, so it scales linearly with data.
    */
  /** `(idCol, band, bucket)` rows for a signature frame: each band's
    * slice of the signature md5'd into a bucket key. Shared by the batch
    * candidate join below and the streaming candidate op
    * (`IncrementalDedup.minhashCandidateStream`) — one definition, so
    * the two paths bucket identically by construction.
    */
  def bandBuckets(sigs: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    // Ordered so bands = 0 hits the intended message, not a bare
    // ArithmeticException from the division below it.
    require(bands >= 1, s"bands $bands")
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    sigs.select(col(idCol),
      posexplode(array((0 until bands).map { b =>
        md5(concat_ws("|",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
            .cast("array<string>")))
      }: _*)).as(Seq("band", "bucket")))
  }

  def minHashCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", shingleK: Int = 3, numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    // Widened at the SOURCE (batch op only — a stream has no scan-
    // partitioning problem): the shingle+md5 signature UDF is the
    // expensive per-row pass, and a narrow fixture scan would run it
    // single-task; no-op at scale.
    val sigs = minHashSignature(graft.ops.Parallelism.widen(docs),
      textCol, idCol, shingleK, numHashes)
    // Persisted: the self-join consumes this frontier twice, and Spark
    // does not share common subplans across join inputs — without the
    // persist the whole shingle→md5→signature pipeline runs twice.
    // Released by sealResult before return. Widened BEFORE the persist
    // (see graft.ops.Parallelism): on a narrow fixture scan the bucket
    // self-join otherwise runs its probe + distinct partial aggregation
    // as ONE task; at scale widen is a no-op and the join's own
    // exchanges (with AQE skew split) are untouched.
    val banded = graft.ops.Parallelism.widen(
        bandBuckets(sigs, idCol, numHashes, bands))
      .persist(Disk)
    val l = banded.select(col("band"), col("bucket"), col(idCol).as("a_id"))
    val r = banded.select(col("band"), col("bucket"), col(idCol).as("b_id"))
    sealResult(
      l.join(r, Seq("band", "bucket"))
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
        .distinct(),
      banded)
  }

  /** n-gram Jaccard similarity for candidate pairs, computed by re-joining
    * shingle sets (expressed as joins + aggregations so the oracle can run
    * the identical SQL; |A∩B| via a shingle-level equi-join, |A∪B| =
    * |A|+|B|−|A∩B|).
    */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      shingleK: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    // Only docs REFERENCED by a candidate pair matter: the semi-join
    // bounds the shingling (and the cache below) by the candidate set,
    // not the corpus — verifying a few thousand LSH pairs over a
    // billion-doc corpus must not re-shingle the corpus.
    val refIds = candidates.select(col("a_id").as(idCol))
      .unionByName(candidates.select(col("b_id").as(idCol)))
      .distinct()
    // Persisted: read three times (sizes once, token join twice).
    // Released by sealResult before return.
    val sh = docs.join(refIds, Seq(idCol), "left_semi")
      .select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
      .persist(Disk)
    val sizes = sh.select(col(idCol), size(col("sh")).as("n"))
    val toks = sh.select(col(idCol), explode(col("sh")).as("s"))
    val interCount = candidates
      .join(toks.select(col(idCol).as("a_id"), col("s")), "a_id")
      .join(toks.select(col(idCol).as("b_id"), col("s")), Seq("b_id", "s"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    sealResult(
      candidates
        .join(interCount, Seq("a_id", "b_id"), "left_outer")
        .na.fill(0L, Seq("inter"))
        .join(sizes.select(col(idCol).as("a_id"), col("n").as("na")), "a_id")
        .join(sizes.select(col(idCol).as("b_id"), col("n").as("nb")), "b_id")
        // Guarded division: two shingle-less docs (short texts CAN
        // reach here — identical two-token docs share a SimHash) give
        // union = 0, and under ANSI (the Spark 4 default) a bare 0/0
        // is a job-aborting DIVIDE_BY_ZERO, not a quiet NaN. Empty
        // sets carry no similarity evidence: jaccard 0.
        .withColumn("jaccard",
          when(col("na") + col("nb") - col("inter") > 0,
            col("inter") / (col("na") + col("nb") - col("inter")))
          .otherwise(lit(0.0)))
        .where(col("jaccard") >= minJaccard)
        .select("a_id", "b_id", "jaccard"),
      sh)
  }

  /** 60-bit SimHash over whitespace tokens: per distinct token take the
    * first 15 hex chars of md5 as a 60-bit integer (15, not 16, so the
    * value fits a signed long without sign games); the fingerprint's
    * bit j is the sign of Σ_tokens (bit_j ? +1 : −1).
    *
    * Fused into ONE primitive-loop UDF per row: the fingerprint is a
    * pure per-document function, so the previous shape — explode
    * distinct tokens, md5 each, 21 packed-lane aggregate sums per doc —
    * paid a token row-blowup plus a partial-agg shuffle for what a
    * per-row loop computes with neither (same transformation as the
    * shingle fusion, 8.8 s → 0.3 s). Values are bit-identical: same
    * trim/split tokenization as TextAnalysis.tokens, same 60-bit md5
    * prefix, bit j set iff 2·ones_j > n over n distinct tokens. Docs
    * with null/empty text are absent, as the exploded form dropped them.
    */
  def simHash(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val f = udf { (t: String) =>
      if (t == null) null.asInstanceOf[java.lang.Long]
      else {
        val toks = tokenize(t)
        if (toks.isEmpty) null.asInstanceOf[java.lang.Long]
        else {
          val md = Md5Local.get()
          val seen = new java.util.HashSet[String]
          val ones = new Array[Int](60)
          var n = 0
          var i = 0
          while (i < toks.length) {
            if (seen.add(toks(i))) {
              n += 1
              val h = md5Hash60(md, toks(i))
              var j = 0
              while (j < 60) {
                ones(j) += ((h >>> j) & 1L).toInt
                j += 1
              }
            }
            i += 1
          }
          var fp = 0L
          var j = 0
          while (j < 60) {
            if (2 * ones(j) > n) fp |= 1L << j
            j += 1
          }
          java.lang.Long.valueOf(fp)
        }
      }
    }
    // Input-side precondition instead of isNotNull on the UDF output —
    // same alias-substitution double-eval as minHashSignature (see note
    // there). Null/whitespace-only text is exactly the empty-token case;
    // null ids drop for the same reasons as minHashSignature (module
    // policy + the exploded bit-vote restatement would merge them).
    docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull &&
        size(graft.text.TextAnalysis.tokens(col(textCol))) >= 1)
      .select(col(idCol), f(col(textCol)).as("simhash"))
  }

  /** SimHash near-dup candidates within Hamming distance `maxHamming`.
    * Bucketing is the standard pigeonhole trick: split the 60-bit
    * fingerprint into `maxHamming + 1` chunks — any pair within
    * `maxHamming` differing bits must agree exactly on at least one
    * chunk, so candidate generation is a chunk-value equi-join with
    * guaranteed recall. More chunks (higher maxHamming) means narrower
    * chunk keys and so more candidate collisions — the usual
    * recall/cost trade, made explicit instead of silently capped.
    */
  /** The 60-bit fingerprint's pigeonhole chunk keys as an ARRAY column
    * — the ONE definition of the banding arithmetic, shared by the
    * batch chunk join below and the streaming
    * [[graft.streaming.IncrementalDedup.fingerprintCandidateStream]]
    * (posexplode on either side yields (chunk, ckey) rows). Bounds are
    * `c·60/chunks` with `chunks = maxHamming + 1`: any two
    * fingerprints within `maxHamming` differing bits agree exactly on
    * at least one chunk. That guarantee needs at least one chunk to
    * be WIDER than zero differing bits per pigeonhole slot, i.e.
    * `maxHamming < 60` — at 60+ every chunk is one bit and a pair
    * differing everywhere shares nothing, so the bound is enforced
    * loudly (a 60-bit hash can't band a ≥ 60 radius; that query is
    * "all pairs", not a band join).
    */
  private[graft] def hammingChunkKeys(fp: Column,
      maxHamming: Int): Column = {
    require(maxHamming >= 0 && maxHamming < 60,
      s"maxHamming $maxHamming not in [0, 60): the pigeonhole " +
        "guarantee needs chunks wider than the per-chunk difference " +
        "budget; hamming >= 60 over 60 bits means ALL pairs")
    val bits = 60
    val chunks = maxHamming + 1
    val bounds = (0 to chunks).map(c => c * bits / chunks)
    array((0 until chunks).map { c =>
      val lo = bounds(c)
      val mask = (1L << (bounds(c + 1) - lo)) - 1L
      shiftright(fp, lo).bitwiseAND(mask)
    }: _*)
  }

  def simHashCandidates(fingerprints: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    // maxHamming bounds checked BEFORE the persist below (a negative
    // value would silently read as "no dups"; >= 60 would silently DROP
    // qualifying pairs). hammingChunkKeys re-checks as the shared
    // guard, but ITS require used to fire after fingerprints.persist
    // had already registered a CacheManager entry that sealResult then
    // never released — a cache leak on the error path.
    require(maxHamming >= 0 && maxHamming < 60,
      s"maxHamming $maxHamming not in [0, 60)")
    // Persisted: the chunk self-join consumes this twice — otherwise the
    // fingerprint scan runs twice. Released by sealResult before return —
    // but ONLY if this call created the cache: Dataset.persist returns
    // the same object, so unpersisting a frame the CALLER had already
    // cached would silently drop their cache block and recompute the
    // full simHash pipeline on their next action.
    val callerCached = fingerprints.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val fp = if (callerCached) fingerprints else fingerprints.persist(Disk)
    // The full fingerprint RIDES THROUGH the chunk join (8 fixed bytes
    // per side) instead of being re-attached by two extra join shuffles
    // afterwards — the opposite call from the embedding LSH path, whose
    // wide vectors must NOT travel through the bucket join. ha/hb are
    // functions of the ids, so distinct over (a_id, b_id, ha, hb) has
    // the cardinality of (a_id, b_id). Widened (graft.ops.Parallelism):
    // on a narrow fixture scan the chunk self-join otherwise runs its
    // probe + distinct partial aggregation as ONE task; at scale widen
    // is a no-op and the join's own exchanges (with AQE skew split —
    // the documented hot-chunk story) are untouched.
    val banded = graft.ops.Parallelism.widen(
      fp.select(col(idCol), col("simhash"),
        posexplode(hammingChunkKeys(col("simhash"), maxHamming))
          .as(Seq("chunk", "ckey"))))
    val l = banded.select(col("chunk"), col("ckey"),
      col(idCol).as("a_id"), col("simhash").as("ha"))
    val r = banded.select(col("chunk"), col("ckey"),
      col(idCol).as("b_id"), col("simhash").as("hb"))
    sealResult(
      l.join(r, Seq("chunk", "ckey"))
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id", "ha", "hb").distinct()
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .where(col("hamming") <= maxHamming)
        .select("a_id", "b_id", "hamming"),
      (if (callerCached) Seq.empty else Seq(fp)): _*)
  }

  /** Canonicalize a near-dup pair set into a per-document keep
    * decision: connected components over `pairs` (a_id, b_id — from ANY
    * candidate generator: MinHash bands, SimHash chunks, embedding LSH
    * verify), then every document in `all` gets
    * `canonical_id` = its component minimum (its own id when unpaired,
    * via the left-outer + coalesce) and
    * `is_canonical` = whether it IS that minimum — the row a dedup
    * pass keeps.
    */
  def keepCanonical(pairs: DataFrame, all: DataFrame,
      idCol: String): DataFrame = {
    val comps = graft.cluster.ConnectedComponents.auto(pairs, "a_id", "b_id",
      label = "neardup-canonical")
    all.join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .withColumn("canonical_id",
        coalesce(col("component"), col(idCol)))
      .drop("component")
      .withColumn("is_canonical", col("canonical_id") === col(idCol))
  }
}
