package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.CorpusOps

/** LLM corpus-curation operators (harness extensions past the reference
  * surface — see [[graft.text.CorpusOps]]) with full DuckDB oracles.
  *
  * The demos use 5-gram keys where the published recipes use 8–13:
  * the synthetic corpus draws from a ~40-word vocabulary, so 5-grams
  * collide often enough to exercise the nonzero-overlap paths while
  * 8-grams would make every answer trivially zero. The operators take
  * `n` as a parameter; nothing in the plan shape changes with it.
  */
object CorpusQueries {

  /** Shared oracle fragment: word n-grams of `documents.text` as
    * space-joined strings (DuckDB range() is exclusive-stop and list
    * slices are inclusive 1-based, so stop = len-n+2, slice i..i+n-1;
    * short docs yield an empty range, hence zero unnested rows —
    * mirroring the Spark side's empty-array guard).
    */
  /** One left-to-right greedy BPE merge pass in DuckDB, over a `syms`
    * VARCHAR[] column, with the pair taken from 1-row CTE `b` (columns
    * l, r): the accumulator is the symbols joined by chr(31) (a
    * separator no fixture token contains); merging is detecting that
    * the accumulator's LAST symbol is exactly `l` (ends_with on the
    * separator-prefixed l — anchored, so a longer symbol merely ending
    * in l cannot match) and appending `x` WITHOUT a separator. A
    * collapsed symbol immediately becomes the left operand at the next
    * position — the same greedy semantics as
    * [[graft.functions.BpeEncode]] and [[graft.text.Bpe.mergePassCol]]
    * (BpeSpec pins all three bit-equal; the q73/q74 oracle rows prove
    * it cross-engine).
    */
  private def bpeMergePassSql(b: String): String =
    s"""CASE WHEN len(syms) < 2 THEN syms
      ELSE string_split(list_reduce(syms, (acc, x) ->
        CASE WHEN x = $b.r AND (acc = $b.l
              OR ends_with(acc, chr(31) || $b.l))
             THEN acc || x ELSE acc || chr(31) || x END), chr(31))
      END"""

  /** The UNROLLED BPE learn in DuckDB — `k` argmax+rewrite stages over
    * the distinct-word table, each stage's best pair a 1-row CTE `bi`
    * with the engine's (count DESC, l ASC, r ASC) tie-break. Ends with
    * CTEs `b1..bk` (the learned merges) and `wk` (the rewritten word
    * table) available to the caller.
    */
  private def bpeLearnCtes(k: Int): String = {
    val stages = (1 to k).map { i =>
      s"""p$i AS (SELECT unnest(syms[1:len(syms)-1]) AS l,
          unnest(syms[2:len(syms)]) AS r, n
        FROM w${i - 1} WHERE len(syms) >= 2),
      b$i AS (SELECT l, r, sum(n) AS total FROM p$i GROUP BY l, r
        ORDER BY total DESC, l, r LIMIT 1),
      w$i AS (SELECT ${bpeMergePassSql(s"b$i")} AS syms, n
        FROM w${i - 1}, b$i)"""
    }
    s"""w0 AS (SELECT syms, n FROM (
          SELECT string_split(w, '') AS syms, n FROM (
            SELECT w, count(*) AS n FROM (
              SELECT unnest(string_split(text, ' ')) AS w FROM documents
              WHERE text IS NOT NULL) GROUP BY w))
        WHERE len(syms) >= 2),
      ${stages.mkString(",\n      ")}"""
  }

  private def gramsCte(n: Int): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents),
        g AS (SELECT doc_id,
            unnest(list_transform(range(1, len(t) - ${n - 2}), i ->
              array_to_string(t[i:i+${n - 1}], ' '))) AS gram
          FROM toks)"""

  val defs: Seq[QueryDef] = Seq(

    // Benchmark decontamination: training docs sharing any 5-gram with
    // the held-out eval slice (doc_id % 97 == 0) are contaminated.
    QueryDef(
      "q53_decontaminate",
      (s, dir) => CorpusOps.decontaminate(
        Tables.load(s, dir, "documents"), col("doc_id") % 97 === 0,
        "doc_id", "text", n = 5),
      Some(s"""WITH ${gramsCte(5)},
          eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
          m AS (SELECT g.doc_id, count(DISTINCT g.gram) AS n_matched
            FROM g JOIN eg USING (gram)
            WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id)
        SELECT d.doc_id, coalesce(m.n_matched, 0) AS n_matched,
          coalesce(m.n_matched, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
        WHERE d.doc_id % 97 <> 0""")),

    // Gopher-style repetition filter signal: duplicate 3-gram fraction
    // within each document.
    QueryDef(
      "q54_repetition_score",
      (s, dir) => CorpusOps.repetitionScore(
        Tables.load(s, dir, "documents"), "doc_id", "text", n = 3),
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents),
          gg AS (SELECT doc_id,
              list_transform(range(1, len(t) - 1), i ->
                array_to_string(t[i:i+2], ' ')) AS g
            FROM toks)
        SELECT doc_id,
          CAST(len(g) AS BIGINT) AS n_grams,
          CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
          CASE WHEN len(g) > 0 THEN
            CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
          ELSE 0.0 END AS rep_ratio
        FROM gg""")),

    // PII hygiene over the event log: salted pseudonymous user key,
    // numeric-run scrub of the JSON payload, audit count.
    QueryDef(
      "q55_pii_scrub",
      (s, dir) => CorpusOps.piiScrub(
        Tables.load(s, dir, "events"), "event_id", "user_id", "props",
        salt = "graft-pii-v1"),
      Some("""SELECT event_id,
          md5('graft-pii-v1:' || CAST(user_id AS VARCHAR))
            AS user_pseudo,
          regexp_replace(coalesce(props, ''), '[0-9]+', '#', 'g')
            AS payload_scrubbed,
          CAST(len(regexp_extract_all(coalesce(props, ''), '[0-9]+'))
            AS BIGINT) AS n_masked
        FROM events""")),

    // C4-style duplicate-span detection: 5-grams appearing in >= 2
    // distinct docs are corpus boilerplate; per-doc span counts and
    // the doc-grain retention decision.
    QueryDef(
      "q56_dup_spans",
      (s, dir) => CorpusOps.duplicateSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", n = 5,
        minDocs = 2),
      Some(s"""WITH ${gramsCte(5)},
          dup AS (SELECT gram FROM g GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 2),
          per AS (SELECT g.doc_id, count(*) AS n_dup_spans
            FROM g JOIN dup USING (gram) GROUP BY g.doc_id)
        SELECT t.doc_id,
          CAST(greatest(len(t.t) - 4, 0) AS BIGINT) AS n_spans,
          coalesce(p.n_dup_spans, 0) AS n_dup_spans,
          coalesce(p.n_dup_spans, 0) * 2 <= greatest(len(t.t) - 4, 0)
            AS keep
        FROM toks t LEFT JOIN per p ON p.doc_id = t.doc_id""")),

    // Deterministic train/val/test split: salted-MD5 bucket, 80/10/10.
    QueryDef(
      "q57_split_assign",
      (s, dir) => CorpusOps.splitAssign(
        Tables.load(s, dir, "documents"), "doc_id", "graft-split-v1"),
      Some("""WITH h AS (SELECT doc_id,
            CAST(('0x' || substring(
              md5('graft-split-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS bucket
          FROM documents)
        SELECT doc_id, bucket,
          CASE WHEN bucket < 80 THEN 'train'
               WHEN bucket < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM h""")),

    // Token-budget shard packing in doc_id order: shard id is the
    // exclusive prefix sum of token counts / 2000. The Spark side runs
    // the scale-safe two-pass partition-offset sum; the oracle states
    // the same arithmetic as a window cumsum.
    QueryDef(
      "q58_shard_pack",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        CorpusOps.packShards(docs, "doc_id",
          size(split(col("text"), " ")), budget = 2000L)
      },
      Some("""WITH w AS (SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS weight
          FROM documents),
        c AS (SELECT doc_id, weight,
            coalesce(sum(weight) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum
          FROM w)
        SELECT doc_id, weight,
          CAST(floor(cum / 2000) AS BIGINT) AS shard_id
        FROM c""")),

    // Deterministic per-language sampling: integer threshold compare
    // against a 32-bit salted hash — rates en 50%, de 100%, zh 25%,
    // default 75%. Thresholds are floor(rate * 2^32) literals on BOTH
    // sides, so the oracle can never disagree on a boundary.
    QueryDef(
      "q59_stratified_sample",
      (s, dir) => CorpusOps.stratifiedSample(
        Tables.load(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 1.0, "zh" -> 0.25),
        defaultRate = 0.75, salt = "graft-sample-v1"),
      Some("""SELECT doc_id, lang,
          CAST(('0x' || substring(
            md5('graft-sample-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT)
          < (CASE lang WHEN 'en' THEN 2147483648
                       WHEN 'de' THEN 4294967296
                       WHEN 'zh' THEN 1073741824
                       ELSE 3221225472 END) AS sampled
        FROM documents""")),

    // Per-domain quota: at most 10 docs per source, smallest salted
    // hash wins, doc-id tie-break. The oracle phrases it as the window
    // row_number idiom; the Spark side runs the skew-proof bounded-heap
    // aggregate — same answer, shuffle bounded at cap rows per domain
    // per map partition.
    QueryDef(
      "q60_domain_cap",
      (s, dir) => CorpusOps.domainCap(
        Tables.load(s, dir, "documents"), "doc_id", "source", cap = 10,
        salt = "graft-cap-v1"),
      Some("""WITH h AS (SELECT doc_id, source,
            CAST(('0x' || substring(
              md5('graft-cap-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS k
          FROM documents),
        r AS (SELECT doc_id, source,
            row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
              AS rn
          FROM h)
        SELECT source, doc_id FROM r WHERE rn <= 10""")),

    // Epoch mixture weighting: en 2.5x, zh 1.25x, fr 0.5x, default 1x.
    // One output row per COPY; fractional parts resolve by the same
    // integer-threshold hash compare as q59 (independent salt).
    QueryDef(
      "q61_mixture_expand",
      (s, dir) => CorpusOps.mixtureExpand(
        Tables.load(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 2.5, "zh" -> 1.25, "fr" -> 0.5),
        defaultWeight = 1.0, salt = "graft-mix-v1"),
      Some("""WITH c AS (SELECT doc_id, lang,
            (CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 0
                       WHEN 'zh' THEN 1 ELSE 1 END)
            + (CASE WHEN CAST(('0x' || substring(
                  md5('graft-mix-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT)
                < (CASE lang WHEN 'en' THEN 2147483648
                             WHEN 'fr' THEN 2147483648
                             WHEN 'zh' THEN 1073741824
                             ELSE 0 END)
               THEN 1 ELSE 0 END) AS n
          FROM documents)
        SELECT doc_id, lang,
          CAST(unnest(range(1, n + 1)) AS INTEGER) AS copy
        FROM c""")),

    // Incremental dedup of a re-crawl batch against the already-
    // ingested corpus: historical = docs with id digit 0-5, incoming =
    // digit 4-9, so digits 4-5 model the re-fetched pages (identical
    // text under the same id — 1/3 of the batch) and must be dropped.
    // The Spark side runs the Bloom-prefiltered anti-join; the oracle
    // states the bare anti-join semantics the prefilter must preserve.
    QueryDef(
      "q62_incremental_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        CorpusOps.dedupAgainst(
          docs.where(col("doc_id") % 10 >= 4),
          docs.where(col("doc_id") % 10 < 6),
          "text", expectedItems = 200000L, fpp = 0.01)
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some("""SELECT i.doc_id, i.lang, i.source
        FROM documents i
        WHERE i.doc_id % 10 >= 4
          AND NOT EXISTS (SELECT 1 FROM documents h
            WHERE h.doc_id % 10 < 6 AND h.text = i.text)""")),

    // Sharded (beyond-driver-Bloom) incremental dedup: SAME semantics
    // as q62 — the oracle is the identical bare NOT-EXISTS anti-join —
    // but the filter is built per history bucket (one filter per
    // bucket, no partial merge — CorpusOps.bloomShards) and probed
    // through the bucket equi-join, so the ORACLE proves the whole
    // sharded build/probe/confirm path, not just the suite. A
    // different split (mod 7 vs mod 10) keeps the two rows from
    // sharing literal results.
    QueryDef(
      "q64_incremental_dedup_sharded",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        CorpusOps.dedupAgainstPartitioned(
          docs.where(col("doc_id") % 7 >= 3),
          docs.where(col("doc_id") % 7 < 4),
          "text", nBuckets = 16, expectedItemsPerBucket = 16384L,
          fpp = 0.01)
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some("""SELECT i.doc_id, i.lang, i.source
        FROM documents i
        WHERE i.doc_id % 7 >= 3
          AND NOT EXISTS (SELECT 1 FROM documents h
            WHERE h.doc_id % 7 < 4 AND h.text = i.text)""")),

    // Context-window packing: 8-token chunks with stride 5 (3-token
    // overlap). DuckDB's `//` is integer division and its list slice
    // is 1-based inclusive-both-ends, mirroring Spark's 1-based slice
    // of `window` elements; both engines split '' to one empty token.
    QueryDef(
      "q63_chunk_tokens",
      (s, dir) => CorpusOps.chunkTokens(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        window = 8, stride = 5),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE text IS NOT NULL),
          c AS (SELECT doc_id, len(t) AS n, t,
              unnest(range(0, (len(t) - 1) // 5 + 1)) AS i
            FROM toks)
        SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
          array_to_string(t[i*5+1 : i*5+8], ' ') AS chunk_text,
          CAST(least(8, n - i*5) AS BIGINT) AS n_tokens
        FROM c""")),

    // Line-level cross-doc dedup (RefinedWeb-style boilerplate
    // removal): every "line" occurring in more than 3/4 of the
    // documents is removed from every document, order and multiplicity
    // of survivors preserved. The fixture corpus has no newlines, so
    // the query exercises the TOKEN grain (delimiter " ") — the
    // operator is grain-agnostic; the threshold is computed from the
    // corpus size on BOTH sides (integer 3n/4), so the row stays
    // meaningful at every SF. The oracle restates the whole
    // detect/remove/reassemble pipeline relationally
    // (string_agg ORDER BY ordinality); the Spark side never shuffles
    // the text at all (pure-column rewrite against a per-doc key set).
    QueryDef(
      "q66_boilerplate_lines",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val n = docs.where(col("doc_id").isNotNull &&
          col("text").isNotNull).count()
        CorpusOps.dropBoilerplateLines(docs, "doc_id", "text",
            maxDocs = 3L * n / 4L, delimiter = " ")
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
      },
      Some("""WITH nn AS (SELECT doc_id, text FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          thr AS (SELECT 3 * count(*) // 4 AS t FROM nn),
          parts AS (SELECT doc_id, string_split(text, ' ') AS p FROM nn),
          l AS (SELECT doc_id, unnest(p) AS line,
                unnest(range(1, len(p) + 1)) AS i FROM parts),
          boiler AS (SELECT line FROM l GROUP BY line
            HAVING count(DISTINCT doc_id) > (SELECT t FROM thr)),
          kept AS (SELECT doc_id, i, line FROM l
            WHERE line NOT IN (SELECT line FROM boiler)),
          agg AS (SELECT doc_id, string_agg(line, ' ' ORDER BY i) AS t2
            FROM kept GROUP BY doc_id)
        SELECT d.doc_id, d.lang, d.source,
          CASE WHEN d.text IS NULL OR d.doc_id IS NULL THEN d.text
               ELSE coalesce(a.t2, '') END AS text
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""))
  , // q67: Unicode NFC + control-strip normalization — the pre-hash
    // cleanup pass. The fixture corpus is pure ASCII, so this row
    // proves the end-to-end plumbing and the no-op fast path
    // (output == input bytes); the unicode semantics a parquet
    // fixture can't carry are pinned by FunctionsSpec (three-way vs
    // java.text.Normalizer, idempotence on randomized combining
    // marks) and the hostile-corpus unit cases. DuckDB's
    // nfc_normalize is the independent oracle twin of the custom
    // expression.
    QueryDef(
      "q67_normalize_text",
      (s, dir) => CorpusOps.normalizeText(
          Tables.load(s, dir, "documents"), "text")
        .select(col("doc_id"), col("lang"), col("source"), col("text")),
      Some("""SELECT doc_id, lang, source,
          regexp_replace(nfc_normalize(text),
            '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS text
        FROM documents"""))

  , // q68: GPT-style sequence packing — documents laid on one global
    // token tape in doc_id order, cut into exact 64-token training
    // sequences with per-sequence doc-boundary metadata; straddling
    // docs split at the token. The oracle restates the tape with a
    // window prefix sum (the DuckDB side can afford a global window;
    // the Spark side uses the distributed two-pass offset machinery)
    // and the same piece arithmetic. Arrays are csv-serialized at the
    // QueryDef level (the driver's comparator hashes scalars).
    QueryDef(
      "q68_pack_sequences",
      (s, dir) => CorpusOps.packSequences(
          Tables.load(s, dir, "documents"), "doc_id", "text", 64)
        .select(col("seq_id"), col("text"),
          array_join(col("doc_ids").cast("array<string>"), ",")
            .as("doc_ids"),
          array_join(col("doc_starts").cast("array<string>"), ",")
            .as("doc_starts"),
          col("n_tokens")),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
              len(string_split(text, ' ')) AS w
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          c AS (SELECT doc_id, toks, w,
              CAST(coalesce(sum(w) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS cum
            FROM d),
          p AS (SELECT doc_id, toks, w, cum,
              unnest(range(cum // 64, (cum + w - 1) // 64 + 1)) AS seq_id
            FROM c),
          s AS (SELECT seq_id, doc_id,
              greatest(cum, seq_id * 64) - seq_id * 64 AS pos,
              toks[greatest(cum, seq_id * 64) - cum + 1 :
                   least((seq_id + 1) * 64, cum + w) - cum] AS piece
            FROM p)
        SELECT seq_id,
          string_agg(array_to_string(piece, ' '), ' ' ORDER BY pos)
            AS text,
          string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos)
            AS doc_ids,
          string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos)
            AS doc_starts,
          CAST(sum(len(piece)) AS BIGINT) AS n_tokens
        FROM s GROUP BY seq_id"""))

  , // q69: vocabulary build + token-id encoding — top-16 tokens by
    // corpus count (ties broken token-ASC; the fixture HAS equal
    // counts, so the tie-break is load-bearing on both sides), ids
    // 0..15, everything else → unk id 16. The 16-entry vocab leaves
    // ~45% of fixture occurrences out-of-vocabulary at every SF (the
    // synthetic corpus draws ~31 distinct tokens), so the OOV path
    // and n_unk are genuinely exercised. The oracle rebuilds the
    // vocab with a row_number window over the same (count DESC,
    // token ASC) order and re-encodes positionally; token_ids are
    // csv-serialized at the QueryDef level (the driver's comparator
    // hashes scalars). Vocab counting is id-BLIND (text-only filter)
    // while encoding drops null-id docs — the oracle restates both
    // filters separately, so a fixture regeneration that adds a
    // null-id doc with text cannot silently diverge the two sides.
    QueryDef(
      "q69_encode_tokens",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vocab = CorpusOps.buildVocab(docs, "text", 16)
        CorpusOps.encodeTokens(docs, vocab, "doc_id", "text",
            unkId = 16)
          .select(col("doc_id"),
            array_join(col("token_ids").cast("array<string>"), ",")
              .as("token_ids"),
            col("n_tokens"), col("n_unk"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          tok AS (SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE text IS NOT NULL),
          cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
          vocab AS (SELECT token,
              CAST(row_number() OVER (ORDER BY n DESC, token) - 1
                AS INTEGER) AS token_id
            FROM cnt ORDER BY n DESC, token LIMIT 16),
          e AS (SELECT doc_id, t, unnest(range(0, len(t))) AS i
            FROM d),
          j AS (SELECT e.doc_id, e.i,
              coalesce(v.token_id, 16) AS tid
            FROM e LEFT JOIN vocab v ON e.t[e.i + 1] = v.token)
        SELECT doc_id,
          string_agg(CAST(tid AS VARCHAR), ',' ORDER BY i)
            AS token_ids,
          CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN tid = 16 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_unk
        FROM j GROUP BY doc_id"""))

  , // q70: top-3 characteristic terms per doc — linear-idf keyword
    // extraction (score = tf/df: one correctly-rounded IEEE division
    // of exact integers, so the DOUBLE hashes identically across
    // engines, where ln(N/df) would be libm-dependent). The oracle
    // ranks with a window row_number over the same (score DESC, term
    // ASC) order; the Spark side needs no window at all — a doc's
    // distinct-term group is bounded by the doc itself, so
    // sort_array(collect_list) + slice cuts the top-k per doc.
    QueryDef(
      "q70_top_terms",
      (s, dir) => CorpusOps.topTerms(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 3),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          tok AS (SELECT doc_id, unnest(t) AS term FROM d),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
            GROUP BY doc_id, term),
          df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
            GROUP BY term),
          s AS (SELECT tf.doc_id, tf.term, tf.tf,
              CAST(tf.tf AS DOUBLE) / df.df AS score
            FROM tf JOIN df USING (term)),
          r AS (SELECT doc_id, term, tf, score,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, term) AS rank
            FROM s)
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
          CAST(rank AS INTEGER) AS rank
        FROM r WHERE rank <= 3"""))

  , // q71: deterministic epoch shuffle — dense 1-based training-order
    // positions by rank in (salted md5 hash, id) order. The oracle is
    // a window row_number over the same order (the DuckDB side can
    // afford one global window; the Spark side range-repartitions on
    // the uniform hash and zipWithIndex-numbers — no single-task
    // window, the q06/denseIds machinery). Same md5 arithmetic as the
    // q57/q59/q60 sampling family, so the permutation replays in any
    // engine.
    QueryDef(
      "q71_epoch_shuffle",
      (s, dir) => CorpusOps.epochShuffle(
          Tables.load(s, dir, "documents"), "doc_id", "graft-epoch-v1")
        .select(col("doc_id"), col("shuffle_pos")),
      Some("""WITH h AS (SELECT doc_id,
            CAST(('0x' || substring(
              md5('graft-epoch-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hk
          FROM documents WHERE doc_id IS NOT NULL)
        SELECT doc_id,
          CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT)
            AS shuffle_pos
        FROM h"""))

  , // q72: corpus-self-trained bigram-LM quality score (the CCNet/
    // KenLM-style LM filter) — mean MLE bigram probability per doc.
    // Every per-bigram probability is one correctly-rounded division
    // and multiply, quantized to 1e-9 (round half-up — identical for
    // positives in both engines) and summed EXACTLY in integer space,
    // then one exact-integer division — so the DOUBLE score hashes
    // identically (a ln per bigram would be libm-dependent; the
    // log-perplexity variant is a one-expression swap where oracle
    // hashability isn't needed). Docs with < 2 tokens score NULL with
    // n_bigrams 0.
    QueryDef(
      "q72_bigram_lm",
      (s, dir) => CorpusOps.bigramLmScore(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
                  FROM d)),
          c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
          c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1),
          p AS (SELECT bg.doc_id,
              CAST(round(CAST(c2.n2 AS DOUBLE) / c1.n1 * 1000000000, 0)
                AS BIGINT) AS q
            FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
          s AS (SELECT doc_id, count(*) AS nb, sum(q) AS sq FROM p
            GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
          CAST(s.sq AS DOUBLE) / (s.nb * 1000000000) AS lm_score
        FROM d LEFT JOIN s ON d.doc_id = s.doc_id"""))

  , // q73: BPE merge learning (Sennrich 2016) — 8 merges from the
    // corpus's distinct-word table, deterministic (count DESC, pair
    // ASC argmax). The oracle UNROLLS the whole iterative learn — 8
    // argmax+rewrite stages over the same word table — so the LEARN
    // loop itself is oracle-proven, not just suite-trusted (the
    // fixture's rank-7/8 tie at equal counts and the chained p+ar
    // merge are load-bearing on both sides). minPairCount = 2 never
    // fires at any SF (every fixture pair count is in the hundreds),
    // matching the oracle's fixed 8 stages.
    QueryDef(
      "q73_bpe_learn",
      (s, dir) => graft.text.Bpe.mergesToDf(s,
        graft.text.Bpe.learnBpe(Tables.load(s, dir, "documents"),
          "text", numMerges = 8, minPairCount = 2L,
          noteLabel = "q73")),
      Some(s"""WITH ${bpeLearnCtes(8)}
        SELECT * FROM (${(1 to 8).map(i =>
          s"""SELECT $i AS merge_rank, l AS lhs, r AS rhs,
            CAST(total AS BIGINT) AS pair_count FROM b$i""")
          .mkString(" UNION ALL ")})
        ORDER BY merge_rank"""))

  , // q74: BPE encoding of the corpus with the q73-learned table —
    // per-word codepoint symbols, each merge one left-to-right greedy
    // pass, pieces flattened in word order. Pure per-row compute on
    // the Spark side (the merge table compiles into ONE codegen'd
    // bpe_encode call; zero shuffle — plan-gated in BpeSpec); the
    // oracle re-learns the merges (b1..b8) and re-encodes every word
    // through the same list_reduce merge-pass chain, so learn+encode
    // are proven END-TO-END cross-engine.
    QueryDef(
      "q74_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = graft.text.Bpe.learnBpe(docs, "text",
          numMerges = 8, minPairCount = 2L, noteLabel = "q74")
          .map(m => (m.l, m.r))
        graft.text.Bpe.encodeBpe(docs, merges, "doc_id", "text")
          .select(col("doc_id"),
            array_join(col("pieces"), " ").as("pieces"),
            col("n_pieces"))
      },
      Some(s"""WITH ${bpeLearnCtes(8)},
        d AS (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents
          WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        wd AS (SELECT doc_id, unnest(ws) AS w,
            unnest(range(1, len(ws) + 1)) AS wi FROM d),
        e0 AS (SELECT doc_id, wi, string_split(w, '') AS syms FROM wd),
        ${(1 to 8).map(i =>
          s"""e$i AS (SELECT doc_id, wi, ${bpeMergePassSql(s"b$i")}
            AS syms FROM e${i - 1}, b$i)""").mkString(",\n        ")},
        f AS (SELECT doc_id, wi, unnest(syms) AS sym,
            unnest(range(1, len(syms) + 1)) AS si FROM e8)
        SELECT doc_id, string_agg(sym, ' ' ORDER BY wi, si) AS pieces,
          CAST(count(*) AS BIGINT) AS n_pieces
        FROM f GROUP BY doc_id"""))

  , // q76: the full trainer-prep chain — text -> BPE pieces -> int
    // token ids — as a pure COMPOSITION of oracle-proven operators:
    // learnBpe (q73) + encodeBpe (q74) produce per-doc piece text
    // (pieces are substrings of whitespace-split words, so they never
    // contain spaces and re-enter the token family at the piece
    // grain), then buildVocab/encodeTokens (q69) assign ids. The
    // piece VOCABULARY is built from the doc_id % 3 != 0 slice only
    // and encoding covers ALL docs, so the held-out third produces
    // genuine OOV (n_unk > 0) — the fixed-vocab-meets-new-data shape
    // a real trainer hits. The oracle restates the whole chain:
    // unrolled learn, per-word encode, slice-filtered piece counts,
    // windowed vocab ids, positional re-encode.
    QueryDef(
      "q76_bpe_ids",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = graft.text.Bpe.learnBpe(docs, "text",
          numMerges = 8, minPairCount = 2L, noteLabel = "q76")
          .map(m => (m.l, m.r))
        val ptext = graft.text.Bpe
          .encodeBpe(docs, merges, "doc_id", "text")
          .select(col("doc_id"), array_join(col("pieces"), " ").as("pt"))
        val vocab = CorpusOps.buildVocab(
          ptext.where(col("doc_id") % 3 =!= 0), "pt", 24)
        CorpusOps.encodeTokens(ptext, vocab, "doc_id", "pt", unkId = 24)
          .select(col("doc_id"),
            array_join(col("token_ids").cast("array<string>"), ",")
              .as("token_ids"),
            col("n_tokens"), col("n_unk"))
      },
      Some(s"""WITH ${bpeLearnCtes(8)},
        d AS (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents
          WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        wd AS (SELECT doc_id, unnest(ws) AS w,
            unnest(range(1, len(ws) + 1)) AS wi FROM d),
        e0 AS (SELECT doc_id, wi, string_split(w, '') AS syms FROM wd),
        ${(1 to 8).map(i =>
          s"""e$i AS (SELECT doc_id, wi, ${bpeMergePassSql(s"b$i")}
            AS syms FROM e${i - 1}, b$i)""").mkString(",\n        ")},
        f AS (SELECT doc_id, wi, unnest(syms) AS sym,
            unnest(range(1, len(syms) + 1)) AS si FROM e8),
        cnt AS (SELECT sym AS token, count(*) AS n FROM f
          WHERE doc_id % 3 <> 0 GROUP BY sym),
        vocab AS (SELECT token,
            CAST(row_number() OVER (ORDER BY n DESC, token) - 1
              AS INTEGER) AS token_id
          FROM cnt ORDER BY n DESC, token LIMIT 24),
        j AS (SELECT f.doc_id, f.wi, f.si,
            coalesce(v.token_id, 24) AS tid,
            v.token_id IS NULL AS miss
          FROM f LEFT JOIN vocab v ON f.sym = v.token)
        SELECT doc_id,
          string_agg(CAST(tid AS VARCHAR), ',' ORDER BY wi, si)
            AS token_ids,
          CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT)
            AS n_unk
        FROM j GROUP BY doc_id"""))
  )
}
