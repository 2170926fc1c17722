package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines beyond
  * dedup (the natural next tier after `Dedup`/`TextAnalysis`):
  *
  *  - benchmark decontamination: drop training documents that share
  *    word n-grams with an eval/benchmark set (test-set leakage);
  *  - corpus-frequency boilerplate removal (C4-style): strip text
  *    segments that recur across more than `maxDocs` documents;
  *  - deterministic domain-mixture sampling: downsample sources to a
  *    target ratio with an integer-exact hash predicate.
  *
  * All three are shaped for the 100 TB path: per-row map-side feature
  * extraction, shuffles keyed only on fixed-width hashes or ids, and
  * the SMALL derived frame (benchmark shingle set, hot-chunk set,
  * per-source rate table) broadcast back over the corpus — the corpus
  * itself never moves for a lookup.
  */
object Curation {

  // ===== benchmark decontamination =========================================

  /** Per-document contamination counts: for each corpus document, the
    * number of distinct word `n`-grams it shares with ANY benchmark
    * document. The standard eval-set decontamination primitive: a
    * training doc that reproduces a benchmark n-gram (n≈5-13 words)
    * likely leaks eval data and must be dropped before training.
    * Returns (idCol, n_contaminated) for contaminated docs only.
    *
    * Scale: benchmark suites are tiny (MBs) against a training corpus
    * (TBs), so the distinct benchmark shingle-hash set is broadcast and
    * the corpus side is a single map-side shingle pass probing it — the
    * only corpus shuffle is the per-doc count aggregate over the (rare)
    * hits. Shingles are built with the codegen'd `word_shingles`
    * kernel (per-row, already distinct), NOT `shingleRows`, whose
    * lead()-window form would shuffle the whole corpus by id just to
    * assemble n-grams; hashes, never strings, cross the wire. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                    hash: Dedup.HashScheme = Dedup.FastHash,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    def hashedShingles(df: DataFrame) = df
      .select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.word_shingles(
          col(textCol), n)).as("sh"))
      .select(col("id"), hash.one(col("sh")).as("hsh"))
    val bench = hashedShingles(benchmark).select(col("hsh")).distinct()
    hashedShingles(corpus)
      .join(broadcast(bench), Seq("hsh"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Decontaminated corpus: every document sharing at least `minHits`
    * distinct n-grams with the benchmark is dropped (left_anti on the
    * contaminated-id set, which is small, so AQE broadcasts it). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                    minHits: Int = 1,
                    hash: Dedup.HashScheme = Dedup.FastHash,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val dirty = contamination(corpus, benchmark, n, hash, idCol, textCol)
      .filter(col("n_contaminated") >= minHits)
      .select(col(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** Bloom-filter words for the benchmark's distinct shingle-hash set:
    * (word, bits) rows packing an `mBits`-bit filter 63 bits per row,
    * with `k` positions per element drawn from the seeded hash family
    * `(hash.seeded(h, i) mod mBits)`. The whole filter is mBits/8 bytes
    * (8 KiB at the 2¹⁶ default) regardless of benchmark size — the
    * representation to reach for when the eval suite's raw shingle set
    * outgrows what `contamination` can broadcast as strings: bits
    * broadcast at a fixed size where strings grow with the suite. */
  def bloomFilterWords(benchmark: DataFrame, n: Int = 5,
                       mBits: Int = 1 << 16, k: Int = 4,
                       hash: Dedup.HashScheme = Dedup.FastHash,
                       textCol: String = "text"): DataFrame = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      "mBits must be a power of two >= 64")
    require(k >= 1, "k must be positive")
    val keys = benchmark
      .select(explode(graft.functions.TextFunctions.word_shingles(
        col(textCol), n)).as("sh"))
      .select(hash.one(col("sh")).as("h")).distinct()
    val positions = keys.select(
      explode(array((0 until k).map(i =>
        pmod(hash.seeded(col("h"), i), lit(mBits.toLong))): _*)).as("pos"))
    // 63 bits per word, not 64: DuckDB's << is overflow-checked, so a
    // mask in the sign bit would make the oracle replica unexpressible
    positions
      .select(expr("pos div 63").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(pmod(pos, 63) as int))")
          .as("mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Bloom-probed contamination: like `contamination`, but the corpus
    * probes the fixed-size bloom filter of the benchmark shingle set
    * instead of joining its raw hashes — (idCol, n_flagged) for
    * documents with at least one maybe-contaminated shingle. One-sided
    * error: never misses a truly shared shingle (no false negatives), may
    * flag extras at the filter's false-positive rate (~(fill)^k) — the
    * cheap first pass whose survivors a second exact pass (or human)
    * confirms.
    *
    * Scale: the probe is `k` broadcast hash joins against the tiny
    * (word, bits) frame plus a map-side all-bits-set conjunction, so
    * non-matching corpus rows die before any exchange; the only corpus
    * shuffle is the per-doc count over the (rare) flagged shingles.
    * The filter build costs one aggregate over the (small) benchmark —
    * localCheckpoint'd so the k probe joins reuse one execution. */
  def bloomContamination(corpus: DataFrame, benchmark: DataFrame,
                         n: Int = 5, mBits: Int = 1 << 16, k: Int = 4,
                         hash: Dedup.HashScheme = Dedup.FastHash,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    // NOTE: localCheckpoint is EAGER — building this plan (even without
    // executing the query, e.g. a plan-quality sweep) runs the filter-
    // build job. Accepted repo pattern (q18's signatures do the same);
    // the storage level matches every other checkpointed operator.
    val words = bloomFilterWords(benchmark, n, mBits, k, hash, textCol)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val probes = corpus
      .select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.word_shingles(
          col(textCol), n)).as("sh"))
      .select(col("id"), hash.one(col("sh")).as("h"))
    val joined = (0 until k).foldLeft(probes) { (df, i) =>
      df.withColumn(s"pos_$i",
          pmod(hash.seeded(col("h"), i), lit(mBits.toLong)))
        .withColumn(s"word_$i", expr(s"pos_$i div 63"))
        .withColumn(s"mask_$i",
          expr(s"shiftleft(cast(1 as bigint), cast(pmod(pos_$i, 63) as int))"))
        .join(broadcast(words
          .withColumnRenamed("word", s"word_$i")
          .withColumnRenamed("bits", s"bits_$i")), Seq(s"word_$i"), "left")
    }
    val allSet = (0 until k)
      .map(i => col(s"bits_$i").isNotNull &&
        col(s"bits_$i").bitwiseAND(col(s"mask_$i")) === col(s"mask_$i"))
      .reduce(_ && _)
    joined.filter(allSet)
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_flagged"))
  }

  // ===== corpus-frequency boilerplate removal ==============================

  /** Ordered non-overlapping `width`-token chunks of each document:
    * (id, cidx, chunk). The segmentation unit for boilerplate removal —
    * a real web corpus segments on lines (C4 proper); the fixture
    * corpus has no line structure, so fixed-width token windows stand
    * in, and the downstream frequency/strip machinery is identical
    * either way. Pure map-side (higher-order array build + one
    * posexplode); zero-token documents yield no chunks. */
  def chunkRows(docs: DataFrame, width: Int = 8,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(width > 0, "width must be positive")
    val t = TextAnalysis.tokens(col(textCol))
    val nChunks = floor((size(t) - 1) / lit(width)).cast("int") // = ceil(n/w)-1
    docs.select(col(idCol).as("id"),
      posexplode(
        when(size(t) > 0,
          transform(sequence(lit(0), nChunks),
            i => array_join(slice(t, i * width + 1, lit(width)), " ")))
          .otherwise(array().cast("array<string>")))
        .as(Seq("cidx", "chunk")))
  }

  /** C4-style boilerplate strip: rebuild each document without the
    * chunks that occur in more than `maxDocs` DISTINCT documents
    * (navigation headers, license footers, cookie banners — segments
    * whose corpus frequency marks them as template, not content).
    * Returns (idCol, clean_text, n_dropped); a document whose every
    * chunk is boilerplate survives with empty text, zero-token
    * documents are omitted (they have nothing to strip or keep).
    *
    * Scale: chunk frequency aggregates on the 8-byte chunk hash with a
    * map-side distinct partial; the hot set (boilerplate is rare by
    * definition) broadcasts back, so the corpus-side pass is map-only;
    * the single corpus shuffle is the per-doc reassembly keyed on id.
    * Reassembly order is carried by `cidx` inside the aggregated
    * structs (array_sort), never by assumed row order. */
  def stripBoilerplate(docs: DataFrame, width: Int = 8, maxDocs: Int = 2,
                       hash: Dedup.HashScheme = Dedup.FastHash,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val chunks = chunkRows(docs, width, idCol, textCol)
      .withColumn("hch", hash.one(col("chunk")))
    val hot = chunks.select(col("id"), col("hch")).distinct()
      .groupBy(col("hch")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("hch"), lit(1).as("_hot"))
    chunks.join(broadcast(hot), Seq("hch"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_hot").isNull, struct(col("cidx"), col("chunk"))))),
            e => e.getField("chunk")),
          " ").as("clean_text"),
        count(when(col("_hot").isNotNull, lit(1))).as("n_dropped"))
  }

  /** Corpus-level line dedup (C4/RefinedWeb-style): every repeated text
    * segment keeps exactly its FIRST occurrence — ordered by (doc id,
    * position) — and is stripped everywhere else, then documents are
    * rebuilt in segment order. Returns (idCol, clean_text, n_dropped);
    * a document whose every segment occurred earlier elsewhere survives
    * with empty text, zero-token documents are omitted. Segments are
    * `chunkRows` fixed-width token windows (see there: a real web
    * corpus splits on newlines; the fixture has none, and the dedup
    * machinery is identical either way).
    *
    * Unlike document-level `Dedup.exactDups` this fires on PARTIAL
    * overlap — two documents sharing one boilerplate paragraph keep one
    * copy between them — which is why C4 runs it in addition to
    * document dedup.
    *
    * Scale: two shuffles, both on bounded keys — first-occurrence
    * election partitions by (8-byte segment hash, chunk): the hash
    * alone would be SEMANTIC here (a collision would silently delete a
    * non-duplicate chunk's text and diverge from the raw-string
    * oracle), so the raw chunk rides along as a tie-breaker key and a
    * collision only degrades to an extra window partition — the rows
    * already carry the chunk for reassembly, so the wider key ships no
    * extra bytes. The window state per key is one min; hot segments
    * skew a key but carry only their own occurrences. Reassembly
    * partitions by doc id with order restored from `cidx` inside the
    * aggregated structs, never assumed from row order. */
  def dedupLines(docs: DataFrame, width: Int = 8,
                 hash: Dedup.HashScheme = Dedup.FastHash,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = chunkRows(docs, width, idCol, textCol)
      .withColumn("hch", hash.one(col("chunk")))
    val first = min(struct(col("id"), col("cidx")))
      .over(Window.partitionBy(col("hch"), col("chunk")))
    chunks
      .withColumn("is_first",
        col("id") === first.getField("id") &&
          col("cidx") === first.getField("cidx"))
      .groupBy(col("id").as(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_first"), struct(col("cidx"), col("chunk"))))),
            e => e.getField("chunk")),
          " ").as("clean_text"),
        count(when(!col("is_first"), lit(1))).as("n_dropped"))
  }

  /** Multi-width substring dedup (RefinedWeb-style middle ground): run
    * the `dedupLines` first-occurrence election at several chunk widths,
    * COARSE TO FINE — a repeated 128-token block is stripped as a few
    * wide chunks by the first pass (where single-width 8-token dedup
    * would need 16 independent elections and would miss any remainder
    * shorter than 8), then progressively narrower passes catch the
    * shorter repeats that survive re-segmentation. True variable-length
    * substring dedup needs a suffix-automaton sweep that does not
    * distribute; width-laddered passes keep every step inside the
    * bounded-key election machinery. Returns (idCol, clean_text,
    * n_dropped) with n_dropped summed across passes (chunks of mixed
    * widths). A document emptied by an early pass survives later passes
    * with empty text (restored by the per-pass left join, since
    * `dedupLines` omits zero-token inputs).
    *
    * Scale: per pass, the two bounded-key shuffles of `dedupLines`
    * (election on (hash, chunk), reassembly on id) — widths.length
    * passes total; each pass shrinks the corpus it hands the next.
    * Each pass's input is localCheckpoint'd (eager — plan construction
    * executes the earlier passes, the accepted q18/q61 pattern):
    * the fold consumes it TWICE (the dedupLines input and the
    * doc-restoring join-back), so without the barrier the plan would
    * nest 2^passes copies of every earlier pass's election pipeline. */
  def dedupLinesMultiWidth(docs: DataFrame,
                           widths: Seq[Int] = Seq(128, 32, 8),
                           hash: Dedup.HashScheme = Dedup.FastHash,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(widths.nonEmpty, "need at least one chunk width")
    val init = docs.select(col(idCol), col(textCol).as("_txt"))
      .withColumn("n_dropped", lit(0L))
    widths.foldLeft(init) { (cur0, w) =>
      val cur = cur0.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      val passed = dedupLines(
          cur.select(col(idCol), col("_txt").as(textCol)), w, hash,
          idCol, textCol)
        .select(col(idCol), col("clean_text"), col("n_dropped").as("_nd"))
      cur.select(col(idCol), col("n_dropped"))
        .join(passed, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("clean_text"), lit("")).as("_txt"),
          (col("n_dropped") + coalesce(col("_nd"), lit(0L))).as("n_dropped"))
    }.select(col(idCol), col("_txt").as("clean_text"), col("n_dropped"))
  }

  /** The full curation recipe as one declarative plan: quality + optional
    * language filter → exact text dedup (md5-keyed first-occurrence
    * window) → benchmark decontamination → deterministic domain-mixture
    * sampling. One definition shared by the registered query (q64) and
    * the scale probe so the two cannot drift. Returns (idCol, srcCol)
    * of the surviving mixture.
    *
    * Scale: the scoring/filters fuse into one codegen stage over one
    * corpus scan; the shuffles are the 16-byte-keyed dedup window, the
    * contamination count, and the per-source counts. */
  def pipeline(corpus: DataFrame, bench: DataFrame,
               weights: Map[String, Int],
               mixHash: Dedup.HashScheme = Dedup.FastHash,
               lang: Option[String] = Some("en"),
               minTokens: Int = 20, maxPunct: Double = 0.05,
               idCol: String = "doc_id", textCol: String = "text",
               srcCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.withLangId(
        TextAnalysis.withQuality(corpus, textCol), textCol)
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunct)
    val filtered = lang.fold(scored)(l => scored.filter(col("pred_lang") === l))
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    val deduped = filtered.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // decontamination's hash is transport-only (any injective hash
    // yields the same survivor set) — FastHash; the MIX hash is
    // semantic (it selects the kept rows), so only it is exposed
    val clean = decontaminate(deduped, bench, n = 5,
      idCol = idCol, textCol = textCol)
    mixSample(clean, weights, mixHash, idCol, srcCol)
  }

  // ===== deterministic domain-mixture sampling =============================

  /** Downsample a multi-source corpus to a target mixture ratio with a
    * DETERMINISTIC, integer-exact hash predicate — the "data mixing"
    * step of a training pipeline (e.g. weight curated sources 3:2:1
    * over crawl). `weights` gives the target ratio per source value;
    * sources absent from the map are dropped.
    *
    * Semantics: with n_s docs observed in source s and ratio weight
    * w_s, the feasible scale is K = min_s floor(n_s / w_s); a document
    * is kept iff  hash(id) mod 10⁶  ·  n_s  <  w_s · K · 10⁶, i.e.
    * with probability w_s·K/n_s — yielding ≈ K·w_s docs per source,
    * the largest subsample at exactly the target ratio. Every quantity
    * is BIGINT arithmetic (no float thresholds), so any engine with the
    * same hash reproduces the exact row set, and re-runs are stable
    * (retry-safe sampling). Products stay < 10⁶·n_s, no overflow.
    *
    * Scale: per-source counts and the scale constant are two tiny
    * aggregates broadcast back; the corpus-side decision is one
    * map-side hash-compare — no corpus shuffle at all. */
  def mixSample(docs: DataFrame, weights: Map[String, Int],
                hash: Dedup.HashScheme = Dedup.FastHash,
                idCol: String = "doc_id",
                srcCol: String = "source"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = weights.toSeq.toDF(srcCol, "w")
    // K via a single-partition window over the per-source frame (one
    // row per source — bounded), so the corpus count aggregate runs
    // once; a separate agg + crossJoin would scan the corpus twice
    val rates = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .join(broadcast(w), Seq(srcCol))
      .withColumn("k",
        min(expr("n div w")).over(Window.partitionBy(lit(1))))
    docs.join(broadcast(rates), Seq(srcCol))
      .filter(
        pmod(hash.one(concat(lit("mix:"), col(idCol).cast("string"))),
          lit(1000000L)) * col("n") < col("w") * col("k") * lit(1000000L))
      .select(col(idCol), col(srcCol))
  }

  /** Temperature-scaled stratum sampling (the mT5/XLM-R α-sampling
    * scheme, Xue et al. 2021 / Conneau et al. 2020 — public method):
    * rebalance a multilingual corpus by keeping stratum l with
    * probability p_l = (n_min / n_l)^(1−α) — α = 1 keeps the natural
    * distribution, α → 0 flattens it; the smallest stratum always
    * keeps everything. Rates are quantized ONCE to BIGINT micro-units
    * and membership is the deterministic md5 coin ("temp:"+id mod 10⁶
    * < rate), so the sample — not just its size — is reproducible
    * cross-engine. For α = 0.5 the exponent runs through IEEE sqrt
    * (correctly rounded everywhere) rather than pow (1-ulp
    * implementation-defined).
    *
    * Returns the per-stratum audit frame (stratum, n_docs, micro_rate,
    * n_kept) — the sampled rows themselves are the same filter applied
    * to the corpus. Scale shape: stratum cardinality is tiny (languages,
    * sources), so counts broadcast back and the membership test is
    * map-side; one corpus shuffle for the stratum counts, one for the
    * kept roll-up. */
  def temperatureSample(docs: DataFrame, alpha: Double = 0.5,
                        keyCol: String = "lang",
                        idCol: String = "doc_id"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha in [0,1]")
    val counts = docs.groupBy(col(keyCol)).agg(count(lit(1)).as("n_docs"))
    val nmin = counts.agg(min(col("n_docs")).as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_docs").cast("double")
    val p = if (1.0 - alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(keyCol), col("n_docs"),
        round(p * 1e6).cast("long").as("micro_rate"))
    // null-SAFE stratum join (<=>): a null key forms a real stratum in
    // the counts, so it must also match here — an equi-join would
    // silently drop every null-key doc while the audit frame still
    // listed the stratum (and let it set n_min)
    val kept = docs.join(broadcast(rates.withColumnRenamed(keyCol, "_k")),
        col(keyCol) <=> col("_k"))
      .filter(pmod(TextAnalysis.md5Hash60(
          concat(lit("temp:"), col(idCol).cast("string"))),
        lit(1000000L)) < col("micro_rate"))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_kept"))
      .withColumnRenamed(keyCol, "_k2")
    rates.join(kept, col(keyCol) <=> col("_k2"), "left").drop("_k2")
      .select(col(keyCol), col("n_docs"), col("micro_rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  // ===== PII / secret scrubbing ===========================================

  /** Patterns deliberately restricted to the regex subset where Java
    * (Spark) and RE2-style (DuckDB) engines agree: character classes,
    * bounded/unbounded greedy repetition, word boundaries — no
    * lookaround, no backrefs. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val KeyPattern = "\\bsk_live_[0-9a-f]{16}\\b"

  /** PII / secret scrub: redact emails, phone numbers, and secret keys
    * from a text column, appending per-document match counts and the
    * redacted `clean_text` (placeholders `<EMAIL>`/`<PHONE>`/`<KEY>`).
    * The standard pre-training compliance pass (emails/phones are the
    * canonical PII classes; `sk_live_…` stands in for leaked API-key
    * shapes).
    *
    * Scale: entirely map-side — regexp_count/regexp_replace are codegen
    * string expressions, no shuffle, no UDF; at 100 TB this fuses into
    * whatever scan feeds it. Counts are taken INDEPENDENTLY per pattern
    * on the ORIGINAL text, while redaction applies email → key → phone
    * in sequence — so a phone or key embedded in an email's local part
    * (`555-123-4567@corp.com`: the email class admits digits and
    * dashes) is counted in BOTH n_phones and n_emails but disappears
    * inside the single `<EMAIL>` placeholder. Counts are per-pattern
    * detection tallies, not placeholder tallies; every PII match is
    * still removed from clean_text, which is the invariant that
    * matters. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)).cast("long"))
      .withColumn("n_keys", regexp_count(t, lit(KeyPattern)).cast("long"))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            KeyPattern, "<KEY>"),
          PhonePattern, "<PHONE>"))
  }

  /** Three-way decontamination AGREEMENT cube — the completeness
    * critic over the decontamination stack: every (exact 5-gram,
    * bloom, semantic) flag combination with its document count. The
    * cube makes the methods' relationships measurable instead of
    * assumed: the (1,0,*) cells must be EXACTLY zero (a bloom filter
    * has no false negatives — every exact hit probes the filter with
    * the same shingle), the (0,1,*) mass is the bloom's measured
    * false-positive overhead, and the semantic-only mass
    * (0,0,1) is what n-gram methods structurally cannot see
    * (paraphrase) — the cell that justifies running the embedding
    * pass at all.
    *
    * `semFlags` must carry (idCol, f_semantic) — typically
    * [[graft.ext.Similarity.semanticContamination]]'s `contaminated`
    * column keyed back to doc ids.
    *
    * Emits one row per occupied cell: (f_exact, f_bloom, f_semantic,
    * n_docs, share_micro), ordered.
    *
    * Scale: the three flag frames are the methods' own (benchmark
    * hash set / filter words broadcast; banded candidate generation on
    * the semantic side); the cube itself is three id-keyed left joins
    * and an ≤8-group aggregate. */
  def decontamAgreementCube(corpus: DataFrame, bench: DataFrame,
                            semFlags: DataFrame, n: Int = 5,
                            mBits: Int = 1 << 16, k: Int = 4,
                            hash: Dedup.HashScheme = Dedup.FastHash,
                            idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = contamination(corpus, bench, n, hash, idCol)
      .select(col(idCol), lit(1L).as("f_exact"))
    val bl = bloomContamination(corpus, bench, n, mBits, k, hash, idCol)
      .select(col(idCol), lit(1L).as("f_bloom"))
    corpus.select(col(idCol))
      .join(ex, Seq(idCol), "left")
      .join(bl, Seq(idCol), "left")
      .join(semFlags, Seq(idCol), "left")
      .select(coalesce(col("f_exact"), lit(0L)).as("f_exact"),
        coalesce(col("f_bloom"), lit(0L)).as("f_bloom"),
        coalesce(col("f_semantic"), lit(0L)).as("f_semantic"))
      .groupBy(col("f_exact"), col("f_bloom"), col("f_semantic"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("_tot",
        sum(col("n_docs")).over(Window.partitionBy(lit(1))))
      .select(col("f_exact"), col("f_bloom"), col("f_semantic"),
        col("n_docs"),
        expr("n_docs * 1000000 div greatest(_tot, 1)").as("share_micro"))
      .orderBy(col("f_exact"), col("f_bloom"), col("f_semantic"))
  }

  /** Benchmark-side leakage audit — [[contamination]] turned around:
    * for each BENCHMARK document, how many corpus documents share its
    * n-grams and how many of its distinct n-grams are leaked. The
    * corpus-side view decides which training docs to drop; THIS view
    * is for the eval owner — a benchmark item whose text is spread
    * across the corpus is compromised no matter how much training
    * data is dropped, and retiring that ITEM is usually cheaper than
    * chasing every copy. Zero-leak benchmark docs are kept as zero
    * rows (the healthy baseline the compromised ones stand out from).
    *
    * Emits one row per benchmark doc: (bench_id, n_leaking_docs,
    * n_leaked_grams, n_hits), ordered.
    *
    * Hash exposure: the JOIN is hash-keyed (the documented q49
    * convention — a corpus/benchmark gram collision adds a spurious
    * hit), but `n_leaked_grams` counts distinct RAW benchmark grams,
    * not distinct hashes — the raw gram travels on the tiny broadcast
    * side for free, so two distinct leaked grams colliding to one
    * hash cannot under-count the leak.
    *
    * Scale: the benchmark shingle set is tiny and broadcast (the
    * [[contamination]] posture); the corpus pays one map-side shingle
    * pass and shuffles only the (rare) hits for the distinct
    * aggregates. */
  def benchLeakage(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                   hash: Dedup.HashScheme = Dedup.FastHash,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    def shingled(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        explode(graft.functions.TextFunctions.word_shingles(
          col(textCol), n)).as("sh"))
    // corpus side stays skinny (id, hash) for the shuffle; the raw gram
    // rides only the broadcast benchmark side, for the exact distinct
    val hits = shingled(corpus, "cid")
      .select(col("cid"), hash.one(col("sh")).as("hsh")).distinct()
      .join(broadcast(shingled(benchmark, "bench_id")
        .select(col("bench_id"), col("sh"), hash.one(col("sh")).as("hsh"))
        .distinct()), Seq("hsh"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("cid")).as("n_leaking_docs"),
        countDistinct(col("sh")).as("n_leaked_grams"),
        count(lit(1)).as("n_hits"))
    benchmark.select(col(idCol).as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_leaking_docs"), lit(0L)).as("n_leaking_docs"),
        coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy(col("bench_id"))
  }

  /** Contamination ESCAPE through dedup election — the interaction
    * gate between the dedup and decontamination stages. Production
    * pipelines decontaminate the elected REPRESENTATIVES only (the
    * full corpus was just deduped away); a benchmark n-gram carried by
    * a non-representative duplicate whose elected representative does
    * NOT itself match any benchmark n-gram (near-dup, not exact-dup:
    * the paraphrased copy drops the matching 5-gram) slips past that
    * pass entirely — the cluster's content trains anyway. This audit
    * runs the election and the contamination flags together and counts,
    * per representative source, the clusters where contamination is
    * present but the representative is clean (`n_escaped`) — every
    * such cluster is a doc the rep-only decontam pass will miss.
    *
    * Emits one row per source of the elected representative:
    * (source, n_components, n_contam_clusters, n_rep_flagged,
    * n_escaped, n_escaped_docs) — `n_escaped_docs` is the flagged
    * member count inside escaped clusters (how much leaked text the
    * miss represents).
    *
    * Scale shape: the contamination frame is the broadcast-probe pass
    * of [[contamination]]; the election is one component-keyed window
    * ([[graft.ext.Dedup.electRepresentatives]]); the cube is one
    * component-keyed aggregate then a per-source roll-up — nothing
    * corpus-quadratic, flags travel as a skinny id frame. */
  def contamEscapeStats(docs: DataFrame, comps: DataFrame,
                        contaminatedIds: DataFrame, prefCol: Column,
                        idCol: String = "doc_id",
                        srcCol: String = "source"): DataFrame = {
    val flagged = Dedup.electRepresentatives(docs, comps, prefCol, idCol)
      .join(contaminatedIds.select(col(idCol), lit(1L).as("_flag")),
        Seq(idCol), "left")
      .withColumn("_flag", coalesce(col("_flag"), lit(0L)))
    flagged
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("_flag")).as("n_flagged"),
        max(when(col("is_kept") === 1L, col("_flag"))).as("rep_flagged"),
        max(when(col("is_kept") === 1L, col(srcCol))).as("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_components"),
        sum((col("n_flagged") > 0L).cast("long")).as("n_contam_clusters"),
        sum(col("rep_flagged")).as("n_rep_flagged"),
        sum((col("n_flagged") > 0L && col("rep_flagged") === 0L)
          .cast("long")).as("n_escaped"),
        sum(when(col("n_flagged") > 0L && col("rep_flagged") === 0L,
          col("n_flagged")).otherwise(lit(0L))).as("n_escaped_docs"))
      .orderBy(col("source"))
  }

  /** Scrub-effectiveness gate — the audit that runs AFTER [[scrubPii]]
    * and must read zero: re-scan the scrubbed text with the SAME
    * patterns and aggregate residual hits per source next to the
    * before-counts. A non-zero residual means the scrubber's replace
    * order or patterns drifted from its detectors (the classic failure:
    * a new detector pattern added without its replace step) — this is
    * the per-source compliance row a release gate checks, not a test
    * assertion buried in CI.
    *
    * Emits one row per source: (source, n_docs, emails_before,
    * phones_before, keys_before, residual_after).
    *
    * Scale: map-side codegen regexes (detect + replace + re-detect in
    * one projection), one hash aggregate. */
  def scrubResidualAudit(docs: DataFrame, textCol: String = "text",
                         srcCol: String = "source"): DataFrame = {
    val scrubbed = scrubPii(docs, textCol)
    val ct = col("clean_text")
    val resid = (regexp_count(ct, lit(EmailPattern)) +
      regexp_count(ct, lit(PhonePattern)) +
      regexp_count(ct, lit(KeyPattern))).cast("long")
    scrubbed.withColumn("_resid", resid)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("emails_before"),
        sum(col("n_phones")).as("phones_before"),
        sum(col("n_keys")).as("keys_before"),
        sum(col("_resid")).as("residual_after"))
      .orderBy(col(srcCol))
  }

  // ===== URL / domain analysis ============================================

  /** First-URL host extraction + registrable-domain roll-up columns —
    * the parsing half of C4-style domain filtering (blocklists and
    * per-domain quotas are applied to the registrable domain, not the
    * full host). Adds `url_host` (empty string when the text has no
    * URL) and `domain` (null when no URL).
    *
    * LIMITATION: by default "registrable domain = last two host
    * labels", which misclassifies hosts under multi-part public
    * suffixes (example.co.uk → "co.uk"), merging unrelated sites into
    * one domain — blocklists and per-domain quotas silently stop
    * discriminating for those TLDs. On a real web corpus pass the
    * relevant entries of the public suffix list via
    * `multiPartSuffixes` (e.g. Seq("co.uk", "com.au")): a host whose
    * last two labels match an entry keeps THREE labels
    * (example.co.uk). The default Nil preserves the two-label rule the
    * synthetic fixture and the q68 oracle encode.
    * Map-side only: one codegen regexp per row plus a split. */
  def withDomain(docs: DataFrame, textCol: String = "text",
                 multiPartSuffixes: Seq[String] = Nil): DataFrame = {
    val host = regexp_extract(col(textCol),
      "https?://([A-Za-z0-9.-]+)", 1)
    val parts = split(col("url_host"), "\\.")
    // single-label hosts (http://localhost/...) have no registrable
    // domain: guard the -2 index BEFORE element_at — under ANSI mode an
    // out-of-range element_at throws rather than returning null — and
    // yield null, matching the oracle's p[-2] → NULL propagation
    val lastTwo = concat(element_at(parts, -2), lit("."),
      element_at(parts, -1))
    // CaseWhen evaluates a branch value only when its predicate holds,
    // so element_at(parts, -3) is reached only with ≥3 labels (ANSI-safe)
    val registrable =
      if (multiPartSuffixes.isEmpty) lastTwo
      // PSL entries are lowercase by convention but the host regex admits
      // uppercase — fold case on the compared side only, so EXAMPLE.CO.UK
      // keeps three labels while the emitted domain preserves input case
      else when(size(parts) >= 3 &&
          lower(lastTwo).isin(multiPartSuffixes.map(_.toLowerCase): _*),
        concat(element_at(parts, -3), lit("."), lastTwo))
        .otherwise(lastTwo)
    docs.withColumn("url_host", host)
      .withColumn("domain",
        when(col("url_host") === "" || size(parts) < 2,
          lit(null).cast("string"))
          .otherwise(registrable))
  }

  /** Per-domain corpus stats with a blocklist flag: (domain, n_docs,
    * n_hosts, is_blocked) for every registrable domain in the corpus —
    * the aggregation behind both blocklist filtering and per-domain
    * contribution caps (a domain supplying an outsized share of a web
    * corpus is boilerplate or SEO spam). Docs without a URL are
    * excluded. One hash aggregate on the domain key (distinct-host
    * partials are bounded by hosts-per-domain); the blocklist is a
    * literal IN — at a real blocklist's size, swap in a broadcast
    * join. */
  def domainStats(docs: DataFrame, blocklist: Seq[String],
                  textCol: String = "text",
                  multiPartSuffixes: Seq[String] = Nil): DataFrame =
    withDomain(docs, textCol, multiPartSuffixes)
      .filter(col("url_host") =!= "")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_host")).as("n_hosts"))
      .withColumn("is_blocked",
        (if (blocklist.isEmpty) lit(false)
         else col("domain").isin(blocklist: _*)).cast("long"))

  /** Per-domain contribution quota: keep at most `k` docs per
    * registrable domain, selected by a deterministic hash rank
    * (md5-prefix of "quota:"||id, ties to the smaller id) so the kept
    * sample is reproducible and independent of row order — the C4-style
    * cap that stops one template-heavy site from dominating a web
    * corpus. Docs without a URL are exempt (kept).
    *
    * Scale shape: the ranking window partitions on the domain key — the
    * same exchange `domainStats` needs — but ONLY the linked subset
    * enters it: URL-less docs (commonly most of a mixed corpus) are
    * split off map-side and unioned back, so they never funnel through
    * a single null-domain window partition. */
  def domainQuota(docs: DataFrame, k: Int, idCol: String = "doc_id",
                  textCol: String = "text",
                  multiPartSuffixes: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0)
    val withD = withDomain(docs, textCol, multiPartSuffixes)
    val linked = withD.filter(col("domain").isNotNull)
    val unlinked = withD.filter(col("domain").isNull)
    val rk = TextAnalysis.md5Hash60(
      concat(lit("quota:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("domain")).orderBy(rk, col(idCol))
    linked.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
      .unionByName(unlinked)
  }

  /** Deterministic synthetic-URL injection — the FIXTURE side of the
    * domain analysis (the corpus tables carry no URLs): docs with
    * id % 3 = 0 get ` from http://{www|cdn}.site{id%50}.{tld}/page{id}`
    * appended, every part derived from the id with engine-portable
    * functions so the DuckDB oracle replants identical URLs. */
  def injectSyntheticUrls(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val sub = when(pmod(id, lit(2)) === 0, "www").otherwise("cdn")
    val tld = element_at(
      array(lit("com"), lit("org"), lit("net"), lit("io")),
      (pmod(id, lit(4)) + 1).cast("int"))
    val url = concat(lit(" from http://"), sub, lit(".site"),
      pmod(id, lit(50)).cast("string"), lit("."), tld,
      lit("/page"), id.cast("string"))
    docs.withColumn(textCol, concat(col(textCol),
      when(pmod(id, lit(3)) === 0, url).otherwise(lit(""))))
  }

  /** Deterministic synthetic-PII injection — the FIXTURE side of the
    * scrub test/oracle: the corpus tables carry no real PII, so a
    * non-vacuous scrub check needs planted positives. Every value is
    * derived from the doc id with engine-portable string functions
    * (concat/lpad/md5), so the DuckDB oracle replants bit-identical
    * PII and the scrub's work is verifiable end-to-end. Docs get an
    * email when id % 7 = 0, a phone when id % 11 = 0, a key when
    * id % 13 = 0 (overlapping ids get several). Map-side only. */
  def injectSyntheticPii(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val ids = id.cast("string")
    val email = concat(lit(" contact user"), ids, lit("@example.com"))
    val phone = concat(lit(" call 555-"),
      lpad(pmod(id, lit(1000)).cast("string"), 3, "0"), lit("-"),
      lpad(pmod(id, lit(10000)).cast("string"), 4, "0"))
    val key = concat(lit(" key sk_live_"), substring(md5(ids), 1, 16))
    docs.withColumn(textCol, concat(col(textCol),
      when(pmod(id, lit(7)) === 0, email).otherwise(lit("")),
      when(pmod(id, lit(11)) === 0, phone).otherwise(lit("")),
      when(pmod(id, lit(13)) === 0, key).otherwise(lit(""))))
  }

  /** Deterministic training-shard assignment + per-shard manifest.
    * Docs land in `nShards` output shards by a seeded content-free
    * hash of the id (`md5Hash60(seed:id) mod nShards`), and each shard
    * gets a stable intra-shard order key from a second seeded hash —
    * the standard "global shuffle then shard" step before tokenized
    * training data is written, made reproducible across runs and
    * engines (seeded md5, not partition-order-dependent rand()).
    *
    * Scale shape: assignment and order keys are map-side codegen; the
    * manifest is one hash aggregate with map-side partials (one row
    * per shard). The real write path is
    * `df.repartition(nShards, shard).sortWithinPartitions(order_hash)`
    * → partitioned sink — one shuffle total, no global sort; min/max
    * order hashes in the manifest witness the per-shard order domain.
    * All outputs are integers — bit-identical cross-engine. */
  def trainShards(docs: DataFrame, nShards: Int, seed: Long = 42L,
                  idCol: String = "doc_id"): DataFrame = {
    val ids = col(idCol).cast("string")
    val shard = pmod(graft.ext.TextAnalysis.md5Hash60(
      concat(lit(s"$seed:"), ids)), lit(nShards.toLong))
    val orderHash = graft.ext.TextAnalysis.md5Hash60(
      concat(lit(s"o$seed:"), ids))
    docs.select(shard.as("shard"), orderHash.as("oh"),
        length(col("text")).cast("long").as("nc"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        min(col("oh")).as("first_hash"),
        max(col("oh")).as("last_hash"))
  }

  /** Dedup-aware training-shard manifest — [[trainShards]] composed
    * with the representative election
    * ([[graft.ext.Dedup.electRepresentatives]]): shards are split on
    * the SAME seeded id hash, but each shard's manifest carries both
    * the naive mass and the post-election mass. The r14 q256 lesson
    * applied to the shard splitter (which previously split
    * pre-election): a shard whose dup share is far from the corpus
    * mean trains on silently repeated data, and the only way to see
    * that before training is this per-shard naive-vs-deduped delta.
    *
    * Emits one row per shard: (shard, n_docs, n_kept, n_chars,
    * kept_chars, dup_char_share_micro) — all exact integers.
    *
    * Scale shape: the election window partitions on the component key
    * (bounded by cluster multiplicity, never corpus size); shard
    * assignment is map-side codegen; ONE hash aggregate with map-side
    * partials ends the plan. The expensive input (components) is the
    * shared candidate-pair stage every dedup consumer reads. */
  def dedupAwareTrainShards(docs: DataFrame, comps: DataFrame,
                            nShards: Int, seed: Long = 42L,
                            idCol: String = "doc_id"): DataFrame = {
    val elected = graft.ext.Dedup
      .electRepresentatives(docs, comps, col("n_chars"), idCol)
    val ids = col(idCol).cast("string")
    val shard = pmod(graft.ext.TextAnalysis.md5Hash60(
      concat(lit(s"$seed:"), ids)), lit(nShards.toLong))
    elected
      .select(shard.as("shard"),
        col("n_chars").cast("long").as("nc"), col("is_kept"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_kept")).as("n_kept"),
        sum(col("nc")).as("n_chars"),
        sum(col("nc") * col("is_kept")).as("kept_chars"))
      .select(col("shard"), col("n_docs"), col("n_kept"),
        col("n_chars"), col("kept_chars"),
        expr("""(n_chars - kept_chars) * 1000000
               |div greatest(n_chars, 1)""".stripMargin)
          .as("dup_char_share_micro"))
      .orderBy(col("shard"))
  }

  /** Training-order curriculum audit — the gate that catches ORDERING
    * bugs in the shard writer: the seeded shuffle ([[trainShards]]'s
    * order hash) is supposed to make every contiguous segment of a
    * shard a uniform sample of the corpus, so per-segment mean quality
    * must be flat. A trend (e.g. the writer accidentally sorted by
    * source, or an upstream ORDER BY leaked into the shard write)
    * shows up as a displaced segment mean — and trains a de-facto
    * curriculum nobody designed.
    *
    * Segments are VALUE buckets of the 60-bit order hash (top 4 bits
    * → 16 buckets): the order key IS the hash, so contiguous hash
    * ranges are exactly contiguous training-order segments, and the
    * bucket id is a map-side integer shift — deliberately NOT
    * `ntile() OVER (PARTITION BY shard)`, whose cardinality-`nShards`
    * partition key funnels the corpus through `nShards` tasks (the
    * q102 lesson at 100 TB).
    *
    * Emits one row per (shard, order_bucket): (shard, order_bucket,
    * n_docs, mean_quality_q4) — quality in exact 1e4 units (the
    * [[graft.ext.TextAnalysis.trunc4]] grid both engines share).
    *
    * Scale: map-side hashing + quality kernel, one hash aggregate
    * (nShards × 16 groups), integer emit. */
  def shardOrderQualityAudit(docs: DataFrame, nShards: Int,
                             seed: Long = 42L,
                             idCol: String = "doc_id"): DataFrame = {
    val withQ = graft.ext.TextAnalysis.withQuality(docs)
    val ids = col(idCol).cast("string")
    val shard = pmod(graft.ext.TextAnalysis.md5Hash60(
      concat(lit(s"$seed:"), ids)), lit(nShards.toLong))
    val orderHash = graft.ext.TextAnalysis.md5Hash60(
      concat(lit(s"o$seed:"), ids))
    // 60-bit hash >> 56 = 16 order buckets; exact integer bit shift
    // (Column./ would be DOUBLE division — inexact past 2^53), no window
    val bucket = shiftright(orderHash, 56).cast("long")
    withQ
      .select(shard.as("shard"), bucket.as("order_bucket"),
        round(col("quality") * 10000).cast("long").as("q4"))
      .groupBy(col("shard"), col("order_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(q4) div count(1)").as("mean_quality_q4"))
      .orderBy(col("shard"), col("order_bucket"))
  }

  /** Corpus snapshot delta: per-document added / removed / changed /
    * unchanged status between the current corpus and a previous
    * snapshot, by id + content hash — the incremental-curation
    * primitive (recrawl diffing, delta tokenization: only `added` and
    * `changed` docs re-enter the pipeline; `removed` ids feed
    * tombstones).
    *
    * Scale shape: one full-outer sort-merge join on the id — both
    * sides shuffle exactly once on their natural key, content compare
    * is a map-side md5 equality after the join, no row ever carries
    * both texts further than the status projection. At 100 TB this is
    * the plan you'd want (id join, not content join); bucketing both
    * snapshots on the id column removes even that shuffle. */
  def snapshotDiff(cur: DataFrame, prev: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val c = cur.select(col(idCol).as("id"), md5(col(textCol)).as("ch"))
    val p = prev.select(col(idCol).as("id"), md5(col(textCol)).as("ph"))
    c.join(p, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("ph").isNull, lit("added"))
          .when(col("ch").isNull, lit("removed"))
          .when(col("ch") === col("ph"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Deterministic weighted sampling without replacement, k per
    * stratum — Efraimidis–Spirakis A-Res with a SEEDED uniform: each
    * doc draws u = (md5Hash60(seed:id)+1)/2⁶⁰ ∈ (0,1] and is ranked by
    * ln(u)/w (the monotone log of the u^(1/w) priority key; larger is
    * better), so inclusion probability is proportional to the weight,
    * yet the sample is bit-reproducible across runs, partitionings, and
    * engines — unlike rand(), whose draw depends on task layout. The
    * key is quantized to BIGINT micros with the id as tie-break, so the
    * rank itself is integer-deterministic.
    *
    * Scale shape: the per-stratum top-k is SALTED two-phase — a local
    * top-k per (stratum, salt) first, then the true top-k over the
    * ≤ salt·k-row contraction — so a low-cardinality stratum column
    * (the common case: languages, domains) never funnels the corpus
    * through |strata| window tasks. Top-k distributes over any salting
    * (every local winner set keeps k), so the result equals the direct
    * per-stratum rank and the oracle replays the UNSALTED form. */
  def weightedSample(docs: DataFrame, k: Int, seed: Long = 42L,
                     strataCol: String = "lang",
                     weight: Column = length(col("text")).cast("double"),
                     salt: Int = 8,
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.ext.TextAnalysis.md5Hash60(
      concat(lit(s"$seed:"), col(idCol).cast("string")))
    val keyed = docs.select(col(strataCol).as("stratum"), col(idCol),
        round(log((h + lit(1L)).cast("double") / lit(1.152921504606846976e18))
          / greatest(weight, lit(1.0)) * 1e6, 0).cast("long").as("key_micro"),
        pmod(col(idCol), lit(salt.toLong)).as("_salt"))
    val local = Window.partitionBy(col("stratum"), col("_salt"))
      .orderBy(col("key_micro").desc, col(idCol))
    val global = Window.partitionBy(col("stratum"))
      .orderBy(col("key_micro").desc, col(idCol))
    keyed
      .withColumn("_lrk", row_number().over(local))
      .filter(col("_lrk") <= k)
      .withColumn("rk", row_number().over(global))
      .filter(col("rk") <= k)
      .select(col("stratum").as(strataCol), col("rk").cast("long").as("rk"),
        col(idCol), col("key_micro"))
  }

  /** Synthetic "previous snapshot" fixture for the diff oracle: drops
    * every 7th doc (→ added in the current), rewrites every 5th
    * surviving text (→ changed), and plants ids ≥ 10⁶ that the current
    * corpus lacks (→ removed). Engine-portable arithmetic only. */
  def syntheticPrevSnapshot(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val kept = docs.filter(pmod(id, lit(7)) =!= 0)
      .withColumn(textCol,
        when(pmod(id, lit(5)) === 0, concat(col(textCol), lit(" [v0]")))
          .otherwise(col(textCol)))
    val removed = docs.filter(pmod(id, lit(11)) === 0)
      .withColumn(idCol, id + lit(1000000L))
    kept.unionByName(removed)
  }

  /** Right-to-erasure sweep audit: given a deletion key list, report
    * what an erasure pass would remove — (n_rows_before, n_rows_deleted,
    * n_rows_after, n_keys_requested, n_keys_present, pct_deleted). The
    * compliance half of the privacy tier (kAnonymity measures
    * re-identification risk; this measures deletion reach before the
    * destructive pass runs).
    *
    * Scale: one conditional aggregate over the fact table with the key
    * list broadcast as a semi-join membership probe — the fact table is
    * scanned once and never shuffled on row count; only the (small,
    * regulatory-request-sized) key list moves. */
  def erasureAudit(df: DataFrame, deleteKeys: DataFrame,
                   keyCol: String = "user_id"): DataFrame = {
    val keys = deleteKeys.select(col(keyCol).as("k")).distinct()
    val marked = df.select(col(keyCol).as("k"))
      .join(broadcast(keys.withColumn("hit", lit(1))), Seq("k"), "left")
    val nKeys = keys.agg(count(lit(1)).as("n_keys_requested"))
    marked.agg(
        count(lit(1)).as("n_rows_before"),
        sum(when(col("hit") === 1, 1L).otherwise(0L)).as("n_rows_deleted"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_rows_after"),
        countDistinct(when(col("hit") === 1, col("k")))
          .as("n_keys_present"))
      .crossJoin(broadcast(nKeys))
      .select(col("n_rows_before"), col("n_rows_deleted"),
        col("n_rows_after"), col("n_keys_requested"), col("n_keys_present"),
        round(col("n_rows_deleted").cast("double") * 100
          / col("n_rows_before"), 4).as("pct_deleted"))
  }

  /** k-anonymity audit over a quasi-identifier combination — the
    * re-identification screen run before releasing or training on
    * event-level data (complements the PII scrub, which removes direct
    * identifiers; this measures how identifying the REMAINING columns
    * are in combination). A row is "at risk" when its full
    * quasi-identifier combination occurs fewer than `k` times.
    *
    * One row out: (n_rows, n_combos, n_violating_combos,
    * n_rows_at_risk, pct_at_risk, min_combo_size).
    *
    * Scale: one combo-count aggregate (map-side partial) contracts the
    * table to its quasi-identifier cardinality; the audit aggregate
    * runs over that contraction. Nothing here is row-count-sized after
    * the first shuffle. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Int = 5): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    val combos = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    combos.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_combos"),
        sum(when(col("cnt") < k, 1L).otherwise(0L)).as("n_violating_combos"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(0L))
          .as("n_rows_at_risk"),
        min(col("cnt")).as("min_combo_size"))
      .select(col("n_rows"), col("n_combos"), col("n_violating_combos"),
        col("n_rows_at_risk"),
        round(col("n_rows_at_risk").cast("double") * 100 / col("n_rows"), 4)
          .as("pct_at_risk"),
        col("min_combo_size"))
  }

  /** l-diversity audit over a quasi-identifier combination — the
    * companion of [[kAnonymity]] for the attack k-anonymity misses:
    * a combo can occur k times yet leak the sensitive attribute
    * exactly, if all k rows SHARE it (homogeneity attack). A combo is
    * l-diverse when its rows carry ≥ l distinct sensitive values;
    * entropy l-diversity additionally requires the sensitive
    * DISTRIBUTION within the combo to be spread (H ≥ ln l — a combo
    * with 99 of value A and 1 of B is 2-distinct but barely diverse).
    *
    * Output is the distinct-l histogram plus the entropy gate: one row
    * per observed l value — (l_distinct, n_combos, n_rows,
    * n_entropy_violations) where a combo violates at `l` when its
    * within-combo sensitive entropy (nano-quantized per term, the q107
    * convention) falls below ln(targetL)·1e9 − targetL. The −targetL
    * slack absorbs per-term quantization: a perfectly UNIFORM
    * targetL-value combo has H = ln(targetL) exactly, but its ≤targetL
    * rounded terms can sum up to targetL nanos short — without the
    * slack the boundary case the gate exists to admit would be flagged
    * (real entropy gaps are ~10⁸ nanos, so the slack changes no other
    * verdict).
    *
    * Scale: one (quasi-combo, sensitive) count aggregate contracts the
    * table map-side; per-combo rollup and the l histogram run on
    * successive contractions. Nothing after the first shuffle is
    * row-count-sized. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, targetL: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiCols.nonEmpty, "lDiversity needs quasi-identifier columns")
    val cells = df.groupBy(
        (quasiCols.map(col) :+ col(sensitiveCol).as("_s")): _*)
      .agg(count(lit(1)).as("cnt"))
    val comboTot = Window.partitionBy(quasiCols.map(col): _*)
    val perCombo = cells
      .withColumn("_tot", sum(col("cnt")).over(comboTot))
      .withColumn("_h_nano",
        round(col("cnt").cast("double") / col("_tot") *
          -log(col("cnt").cast("double") / col("_tot")) * 1e9)
          .cast("long"))
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("l_distinct"), max(col("_tot")).as("n_rows"),
        sum(col("_h_nano")).as("h_nano"))
    perCombo
      .groupBy(col("l_distinct"))
      .agg(count(lit(1)).as("n_combos"), sum(col("n_rows")).as("n_rows"),
        sum(when(col("h_nano") <
            lit(math.round(math.log(targetL.toDouble) * 1e9) - targetL), 1L)
          .otherwise(0L)).as("n_entropy_violations"))
      .orderBy(col("l_distinct"))
  }

  /** Sequential quality-filter funnel (the C4/Gopher-rules report): an
    * ORDERED list of per-document predicates applied as a cascade —
    * each rule only sees the survivors of the previous one — with the
    * per-rule evaluated/rejected/surviving counts a curation run
    * reports ("URL filter killed 8%, then length killed 31% of what
    * remained, …"). The report is what makes a filter set tunable:
    * without per-rule attrition, a 60% total kill rate is a mystery.
    *
    * Scale: the cascade is ONE corpus pass — each doc's
    * first-failing-rule index is a single nested conditional, so rule
    * ordering costs nothing extra — contracted to ≤ rules+1 counts
    * map-side; the funnel arithmetic (cumulative attrition) runs on
    * the rules-sized frame (gate-legal window). Output one row per
    * rule: (rule_idx, rule_name, n_evaluated, n_rejected,
    * n_surviving). */
  def filterFunnel(docs: DataFrame,
                   rules: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rules.nonEmpty, "filterFunnel needs at least one rule")
    val firstFail = rules.zipWithIndex.foldRight(lit(-1): Column) {
      case (((_, pred), i), acc) => when(!pred, lit(i)).otherwise(acc)
    }
    val counts = docs.select(firstFail.as("_ff"))
      .groupBy(col("_ff")).agg(count(lit(1)).as("_n"))
    val session = docs.sparkSession
    import session.implicits._
    val ruleFrame = rules.zipWithIndex
      .map { case ((name, _), i) => (i.toLong, name) }
      .toDF("rule_idx", "rule_name")
    val w = Window.orderBy(col("rule_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // corpus total includes the full-survivor bucket (_ff = −1) the
    // rule join deliberately drops — a separate 1-row broadcast
    val total = counts.agg(coalesce(sum(col("_n")), lit(0L)).as("_tot"))
    broadcast(ruleFrame)
      .join(counts, col("rule_idx") === col("_ff"), "left")
      .crossJoin(broadcast(total))
      .withColumn("n_rejected", coalesce(col("_n"), lit(0L)))
      .withColumn("n_evaluated",
        col("_tot") - coalesce(sum(col("n_rejected")).over(w), lit(0L)))
      .select(col("rule_idx"), col("rule_name"), col("n_evaluated"),
        col("n_rejected"),
        (col("n_evaluated") - col("n_rejected")).as("n_surviving"))
      .orderBy(col("rule_idx"))
  }

  /** Deterministic round-robin training order across sources — the
    * data-ORDERING step after mixing decides data proportions
    * ([[mixSample]]/[[temperatureSample]] decide WHAT; this decides the
    * sequence): interleaving sources 1-by-1 prevents the long
    * same-source runs that concentration-of-gradient makes training
    * sensitive to, and doing it deterministically makes the epoch
    * order reproducible and resumable at any position. Row r of the
    * output is source s's rank-k document where sources rotate each
    * round; when a source exhausts, the remaining sources close ranks.
    *
    * The global position is a CLOSED FORM over the per-source count
    * vector — pos(s, k) = Σ_s' min(k−1, cnt_s') + |{s' < s : cnt_s' ≥ k}|
    * (full rounds before round k, plus this round's earlier sources
    * still alive) — NOT a global row_number window: the counts frame is
    * source-cardinality and broadcasts, so no task ever sees a
    * corpus-wide ordered partition. Verified identical to the
    * row_number-over-(rank, source) formulation in the spec.
    *
    * Output: (doc_id, source, src_rank, global_pos), global_pos dense
    * in [0, n). */
  def interleaveOrder(docs: DataFrame, sourceCol: String = "source",
                      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = docs.select(col(idCol), col(sourceCol).as("_src"))
      .withColumn("src_rank", row_number().over(
        Window.partitionBy(col("_src")).orderBy(col(idCol))).cast("long"))
    val counts = ranked.groupBy(col("_src").as("_s2"))
      .agg(count(lit(1)).as("_cnt"))
    // pos = Σ_s' min(k−1, cnt_s') + #{s' < s alive at round k}: the
    // per-row aggregate folds over the broadcast count vector
    ranked.crossJoin(broadcast(counts
        .agg(collect_list(struct(col("_s2"), col("_cnt"))).as("_cv"))))
      .select(col(idCol), col("_src").as(sourceCol), col("src_rank"),
        (aggregate(col("_cv"),
          lit(0L),
          (acc, x) => acc + least(col("src_rank") - 1, x.getField("_cnt")) +
            when(x.getField("_s2") < col("_src") &&
              x.getField("_cnt") >= col("src_rank"), 1L).otherwise(0L)))
          .as("global_pos"))
      .orderBy(col("global_pos"))
  }

  /** Proportional stratified allocation of a sample budget across
    * groups by the LARGEST-REMAINDER (Hamilton) method — the sampling
    * design step before drawing a k-document training mix across
    * languages/domains: each group gets floor(k·n_g/N) seats, and the
    * k − Σ floors leftover seats go to the largest remainders
    * (k·n_g mod N), ties broken by group key so the allocation is a
    * pure function of the counts. Unlike independent per-group
    * Bernoulli sampling, the allocations sum to EXACTLY k, and no
    * group with n_g > 0 can be over-allocated past its ceiling.
    * Feed the result to per-group top-`alloc` draws (the q111 A-Res
    * pattern) for the actual sample.
    *
    * Determinism: pure integer arithmetic (k·n products, floor
    * divisions, mod remainders) over exact counts. k·n_g must fit
    * int64 (n_g ≤ 9·10¹⁵ at k = 1000; ANSI mode fails loudly past it).
    *
    * Scale: the corpus contracts to one row per group map-side; the
    * remainder ranking is a single-partition window OVER THAT
    * CONTRACTION (gate-legal — group-key cardinality, never rows).
    * Output per group: (group, n, alloc). */
  def stratifiedAllocation(df: DataFrame, groupCol: String,
                           k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy()
    val byRem = Window.orderBy(col("rem").desc, col(groupCol))
    counts
      .withColumn("_tot", sum(col("n")).over(tot))
      .withColumn("base", expr(s"($k * n) div _tot"))
      .withColumn("rem", expr(s"($k * n) % _tot"))
      .withColumn("_spare",
        lit(k.toLong) - sum(col("base")).over(tot))
      .withColumn("rk", row_number().over(byRem))
      .select(col(groupCol), col("n"),
        (col("base") + when(col("rk") <= col("_spare"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy(col(groupCol))
  }

  /** Cohen's kappa between two document gates — the inter-filter
    * agreement measure a curation pipeline reads before swapping a
    * cheap filter in for an expensive one (raw percent agreement
    * overstates: two gates that both pass ~everything agree by chance;
    * kappa subtracts the chance floor). κ = (p_o − p_e)/(1 − p_e) over
    * the 2×2 confusion of the gates.
    *
    * Determinism: all four cells are exact counts; p_o/p_e/κ are
    * integer-micro floor arithmetic. p_e's cross products run in
    * decimal(38,0) internally (n² overflows int64 past ~3·10⁹ docs —
    * 100 TB is more) and emit BIGINT micros. κ's numerator can be
    * negative (worse-than-chance gates), where Spark's `div` truncates
    * toward zero but DuckDB's `//` floors — the sign-aware
    * negate-positive-division form (the spearman convention) keeps the
    * two engines bit-identical.
    *
    * Emits one row: (n, n_both_pass, n_only_a, n_only_b, n_both_fail,
    * po_micro, pe_micro, kappa_micro).
    *
    * Scale: ONE aggregate pass over the corpus (both gates evaluate
    * in the same codegen stage); the confusion row is 1×8. */
  def gateAgreementStats(docs: DataFrame, gateA: Column,
                         gateB: Column): DataFrame = {
    val a = gateA.cast("long")
    val b = gateB.cast("long")
    docs.agg(
        count(lit(1)).as("n"),
        sum(a * b).as("n_both_pass"),
        sum(a * (lit(1L) - b)).as("n_only_a"),
        sum((lit(1L) - a) * b).as("n_only_b"),
        sum((lit(1L) - a) * (lit(1L) - b)).as("n_both_fail"))
      .withColumn("po_micro",
        expr("(n_both_pass + n_both_fail) * 1000000 div greatest(n, 1)"))
      .withColumn("pe_micro", expr(
        """CAST((CAST(n_both_pass + n_only_a AS DECIMAL(38,0))
          |        * (n_both_pass + n_only_b)
          |      + CAST(n_both_fail + n_only_b AS DECIMAL(38,0))
          |        * (n_both_fail + n_only_a)) * 1000000
          |     div (CAST(greatest(n, 1) AS DECIMAL(38,0)) * greatest(n, 1))
          |     AS BIGINT)""".stripMargin))
      .withColumn("kappa_micro", expr(
        """CASE WHEN po_micro >= pe_micro
          |THEN (po_micro - pe_micro) * 1000000
          |     div greatest(1000000 - pe_micro, 1)
          |ELSE -((pe_micro - po_micro) * 1000000
          |     div greatest(1000000 - pe_micro, 1))
          |END""".stripMargin))
      .select(col("n"), col("n_both_pass"), col("n_only_a"),
        col("n_only_b"), col("n_both_fail"), col("po_micro"),
        col("pe_micro"), col("kappa_micro"))
  }

  /** Dedup-aware token-budget epoch plan — [[epochPlan]] computed
    * twice, on the raw corpus and on the corpus minus `removed` (the
    * dedup verdict), joined per source. The table quantifies the
    * planning error dedup-blind budgeting makes (Muennighoff et al.
    * NeurIPS'23: repeating data has sharply diminishing returns —
    * duplicated tokens inflate a source's apparent size, so the naive
    * plan under-repeats its UNIQUE content): `dup_token_micro` is the
    * duplicated-token share, and the two `epochs_milli` columns are
    * the naive vs dedup-aware decisions side by side.
    *
    * Emits per source: (source, n_tokens, unique_tokens,
    * dup_token_micro, epochs_milli_naive, epochs_milli_unique). A
    * source entirely removed by dedup keeps its row with
    * unique_tokens = 0 and epochs_milli_unique = 0.
    *
    * Scale: two [[epochPlan]] passes (each one grouped contraction of
    * the corpus) plus an anti-join against the removed-id set — all
    * keyed, nothing quadratic. */
  def dedupAwareEpochPlan(docs: DataFrame, removed: DataFrame,
                          budgetTokens: Long,
                          maxEpochsMilli: Long = 4000L,
                          sourceCol: String = "source",
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val naive = epochPlan(docs, budgetTokens, maxEpochsMilli,
        sourceCol, textCol)
      .select(col(sourceCol), col("n_tokens"),
        col("epochs_milli").as("epochs_milli_naive"))
    val kept = docs.join(removed.select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
    val unique = epochPlan(kept, budgetTokens, maxEpochsMilli,
        sourceCol, textCol)
      .select(col(sourceCol), col("n_tokens").as("unique_tokens"),
        col("epochs_milli").as("epochs_milli_unique"))
    naive.join(unique, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_tokens"),
        coalesce(col("unique_tokens"), lit(0L)).as("unique_tokens"),
        expr("""(n_tokens - coalesce(unique_tokens, 0)) * 1000000
               |div greatest(n_tokens, 1)""".stripMargin)
          .as("dup_token_micro"),
        col("epochs_milli_naive"),
        coalesce(col("epochs_milli_unique"), lit(0L))
          .as("epochs_milli_unique"))
      .orderBy(col(sourceCol))
  }

  /** Token-budget epoch planner — the "how many epochs of each source
    * do I run to hit my token budget" table every pre-training data
    * recipe publishes (LLaMA/GPT-3 style: smaller curated sources are
    * repeated, the web crawl runs < 1 epoch). Per source:
    * sqrt-of-token-count weights (temperature α = 0.5, the standard
    * multilingual/multi-source smoothing — root damping keeps the
    * long tail from vanishing without letting the crawl dominate),
    * target_tokens = budget·w/Σw, epochs capped at `maxEpochsMilli`
    * (repeating a small source too often measurably hurts — the cap
    * is the deployment's dedup-vs-diversity dial), and the achieved
    * token count after the cap.
    *
    * Determinism: weights are INTEGER sqrt (floor of the correctly-
    * rounded IEEE sqrt of a bigint — identical in every engine; no
    * double pow, no order-dependent double sums); every derived
    * column is integer multiply + floor division in that order.
    *
    * Scale: one groupBy(source) contraction of the corpus (map-side
    * partial sums), then arithmetic over the ~|sources| frame with a
    * 1-row broadcast total. Emits (source, n_docs, n_tokens,
    * weight_micro, target_tokens, epochs_milli, achieved_tokens,
    * capped) ordered by source. */
  def epochPlan(docs: DataFrame, budgetTokens: Long,
                maxEpochsMilli: Long = 4000L,
                sourceCol: String = "source",
                textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochsMilli > 0, "maxEpochsMilli must be positive")
    val toks = docs.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long"))
        .as("n_tokens"))
    val wts = toks.withColumn("w",
      floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val tot = wts.agg(sum(col("w")).as("_wsum"))
    wts.crossJoin(broadcast(tot))
      // greatest(_wsum, 1): a corpus where EVERY source has zero
      // tokens gives wsum = 0 — without the guard Spark's non-ANSI
      // division would emit NULL while an ANSI engine errors; with it
      // every weight/target reads 0, the honest plan for no tokens
      .withColumn("weight_micro",
        expr("w * 1000000 div greatest(_wsum, 1)"))
      .withColumn("target_tokens",
        expr(s"$budgetTokens * w div greatest(_wsum, 1)"))
      // a source with zero tokens has w = 0 ⇒ target 0; guard the
      // division anyway so a degenerate stratum can't fail the plan
      .withColumn("epochs_milli",
        least(lit(maxEpochsMilli),
          expr("target_tokens * 1000 div greatest(n_tokens, 1)")))
      .withColumn("achieved_tokens",
        expr("epochs_milli * n_tokens div 1000"))
      .withColumn("capped",
        (col("epochs_milli") === maxEpochsMilli).cast("long"))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("weight_micro"), col("target_tokens"), col("epochs_milli"),
        col("achieved_tokens"), col("capped"))
      .orderBy(col(sourceCol))
  }

  /** Repeat-exposure bands under an [[epochPlan]] — the
    * data-constrained-scaling gate: empirically, token views past
    * roughly the 4th epoch contribute sharply diminished value
    * (repeating data substitutes for fresh data only up to a few
    * epochs), so a plan whose budget pushes sources deep into repeat
    * territory is spending compute on views the model barely learns
    * from. For each source this splits the plan's total token views
    * into FRESH (the first epoch — new tokens), REPEAT (epochs 2..
    * `staleAfterMilli`/1000 — useful repetition) and STALE (views past
    * the stale threshold — the diminishing-returns region), all in the
    * plan's own milli-epoch integer arithmetic so the bands reconcile
    * exactly with `achieved_tokens`.
    *
    * Emits one row per source: (source, n_tokens, epochs_milli,
    * total_views, fresh_views, repeat_views, stale_views,
    * stale_micro) — `stale_micro` the stale share of all views; a
    * nonzero column-wide stale share is the signal to widen the corpus
    * or cut the budget rather than train more epochs.
    *
    * Scale: pure integer arithmetic over the per-source plan frame
    * (source-cardinality rows) — the corpus is touched only by the
    * plan's own single token-count aggregate. */
  def repeatExposure(docs: DataFrame, budgetTokens: Long,
                     maxEpochsMilli: Long = 8000L,
                     staleAfterMilli: Long = 4000L,
                     sourceCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    require(staleAfterMilli >= 1000L,
      "staleAfterMilli below one epoch would class fresh views as stale")
    epochPlan(docs, budgetTokens, maxEpochsMilli, sourceCol, textCol)
      .withColumn("total_views", col("achieved_tokens"))
      .withColumn("fresh_views",
        expr("n_tokens * least(epochs_milli, 1000) div 1000"))
      .withColumn("stale_views",
        expr(s"n_tokens * greatest(epochs_milli - $staleAfterMilli, 0)" +
          " div 1000"))
      .select(col(sourceCol), col("n_tokens"), col("epochs_milli"),
        col("total_views"), col("fresh_views"),
        (col("total_views") - col("fresh_views")
          - col("stale_views")).as("repeat_views"),
        col("stale_views"),
        expr("stale_views * 1000000 div greatest(total_views, 1)")
          .as("stale_micro"))
      .orderBy(col(sourceCol))
  }

  /** Preference-pair mining for reward-model / DPO data prep: within
    * each (source, token-length band) block, the top-`m` documents by
    * the composite quality score are paired against the bottom-`m`,
    * keeping pairs whose quality gap clears `minGapMicro`. The length
    * band is the CONTROL — pairing long-vs-short mostly teaches the
    * ranker "longer is better" (quality correlates with length by
    * construction); blocking on length forces the pairs to differ on
    * the signal, not the confound. Rankings are integer micro-quality
    * with id tie-breaks (the frozen-rank convention), so the mined
    * pair set is replayable.
    *
    * Emits (source, band, chosen_id, rejected_id, q_hi_micro,
    * q_lo_micro, gap_micro), totally ordered.
    *
    * Scale: per-row map-side scoring ([[graft.ext.TextAnalysis
    * .withQuality]] is codegen'd), two block-keyed ranking windows
    * (block cardinality = sources × bands, each window partition a
    * block, never global), one (source, band) equi-join whose sides
    * are ≤ m rows per block — pair volume is m² per block by
    * construction, never corpus². */
  def preferencePairs(docs: DataFrame, m: Int = 3, bandTokens: Long = 50L,
                      minGapMicro: Long = 100000L,
                      idCol: String = "doc_id",
                      srcCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m > 0 && bandTokens > 0 && minGapMicro >= 0,
      "m and bandTokens must be positive, minGapMicro non-negative")
    val scored = TextAnalysis.withQuality(docs, textCol)
      .select(col(idCol), col(srcCol).as("source"),
        expr(s"n_tokens div $bandTokens").as("band"),
        expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_micro"))
    val hiW = Window.partitionBy(col("source"), col("band"))
      .orderBy(col("q_micro").desc, col(idCol))
    val loW = Window.partitionBy(col("source"), col("band"))
      .orderBy(col("q_micro").asc, col(idCol))
    val hi = scored.withColumn("_rk", row_number().over(hiW))
      .filter(col("_rk") <= m)
      .select(col("source"), col("band"), col(idCol).as("chosen_id"),
        col("q_micro").as("q_hi_micro"))
    val lo = scored.withColumn("_rk", row_number().over(loW))
      .filter(col("_rk") <= m)
      .select(col("source"), col("band"), col(idCol).as("rejected_id"),
        col("q_micro").as("q_lo_micro"))
    hi.join(lo, Seq("source", "band"))
      .filter(col("q_hi_micro") - col("q_lo_micro") >= minGapMicro)
      .select(col("source"), col("band"), col("chosen_id"),
        col("rejected_id"), col("q_hi_micro"), col("q_lo_micro"),
        (col("q_hi_micro") - col("q_lo_micro")).as("gap_micro"))
      .orderBy(col("source"), col("band"), col("chosen_id"),
        col("rejected_id"))
  }

  /** Filter-ordering advisor over a gate set: each gate's INDEPENDENT
    * pass rate measured in one corpus aggregate, emitted in advised
    * execution order (ascending pass rate — with comparable per-row
    * gate costs, running the most selective filter first minimizes
    * rows reaching every later gate; [[filterFunnel]] measures the
    * SEQUENTIAL funnel for one fixed order, this decides WHICH order).
    * Rows come out in advised order; `pass_micro` is the integer micro
    * pass share.
    *
    * Emits (gate, n_docs, n_pass, pass_micro), ordered by
    * (pass_micro, gate).
    *
    * Scale: ONE corpus aggregate with |gates| conditional sums, then
    * literal-frame arithmetic on the 1-row result — the corpus is
    * scanned exactly once regardless of gate count. */
  def gateOrderAdvisor(scored: DataFrame,
                       gates: Seq[(String, Column)]): DataFrame = {
    require(gates.nonEmpty, "at least one gate required")
    require(gates.map(_._1).distinct.size == gates.size,
      "duplicate gate names make the advice ambiguous")
    val aggs = count(lit(1)).as("n_docs") +:
      gates.map { case (n, c) => sum(c.cast("long")).as(s"_p_$n") }
    scored.agg(aggs.head, aggs.tail: _*)
      .select(col("n_docs"), explode(array(gates.map { case (n, _) =>
        struct(lit(n).as("gate"), col(s"_p_$n").as("n_pass"))
      }: _*)).as("g"))
      .select(col("g.gate").as("gate"), col("n_docs"),
        col("g.n_pass").as("n_pass"))
      .withColumn("pass_micro",
        expr("n_pass * 1000000 div greatest(n_docs, 1)"))
      .orderBy(col("pass_micro"), col("gate"))
  }

  /** Pack-boundary contamination — the interaction gate between
    * sequence packing and decontamination: a packed training sequence
    * mixes several documents into one attention window, so ONE
    * contaminated member leaks benchmark text into the loss context of
    * every clean packmate (unless the trainer masks cross-document
    * attention — this audit prices what that mask is worth). Per
    * shard: packs, poisoned packs (≥1 flagged member), and the CLEAN
    * tokens sitting inside poisoned packs — the collateral a
    * doc-level decontam pass leaves behind when filtering runs after
    * packing instead of before.
    *
    * Emits (shard, n_packs, n_poisoned, n_tokens, collateral_tokens,
    * collateral_micro), ordered.
    *
    * Scale: [[contamination]]'s broadcast probe + [[graft.ext
    * .TextAnalysis.packSequences]]' shard-parallel packing, one
    * id-equi flag join, two keyed aggregates. */
  def packContaminationStats(corpus: DataFrame, benchmark: DataFrame,
                             budget: Int = 128, shards: Int = 8,
                             n: Int = 5,
                             hash: Dedup.HashScheme = Dedup.FastHash,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    val flags = contamination(corpus, benchmark, n, hash, idCol, textCol)
      .select(col(idCol), lit(1L).as("_flag"))
    TextAnalysis.packSequences(corpus, budget, shards, idCol, textCol)
      .select(col(idCol), col("shard"), col("pack_id"), col("n_tokens"))
      .join(flags, Seq(idCol), "left")
      .withColumn("_flag", coalesce(col("_flag"), lit(0L)))
      .groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("_tok"),
        sum(col("_flag")).as("_nf"),
        sum(when(col("_flag") === 0L, col("n_tokens")).otherwise(0L))
          .as("_clean"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_packs"),
        sum((col("_nf") > 0L).cast("long")).as("n_poisoned"),
        sum(col("_tok")).as("n_tokens"),
        sum(when(col("_nf") > 0L, col("_clean")).otherwise(0L))
          .as("collateral_tokens"))
      .select(col("shard"), col("n_packs"), col("n_poisoned"),
        col("n_tokens"), col("collateral_tokens"),
        expr("collateral_tokens * 1000000 div greatest(n_tokens, 1)")
          .as("collateral_micro"))
      .orderBy(col("shard"))
  }

  /** Reshard-stability audit — the measured case for rendezvous
    * hashing before a shard-count change: under plain mod-hashing,
    * growing `from` → `to` shards remaps almost every key
    * (≈ 1 − 1/lcm share moves — a full data reshuffle); under
    * highest-random-weight (HRW/rendezvous) hashing only ≈ (to−from)/to
    * of keys move — the theoretical minimum. Both schemes are measured
    * on the actual corpus ids in one pass and emitted side by side;
    * the delta is the data-movement bill the scheme choice saves at
    * the next capacity change.
    *
    * HRW shard = argmax over shard ids of a seeded per-(key, shard)
    * hash; ties (vanishingly rare 60-bit collisions) resolve to the
    * larger shard id — part of the contract, the oracle replays it.
    *
    * Emits (scheme ∈ {hrw, mod}, n_docs, n_moved, moved_micro).
    *
    * Scale: pure map-side hashing (from+to seeded hashes per row,
    * fused in one projection) into ONE aggregate — no shuffle, no
    * join; the audit costs one corpus scan. */
  def reshardStability(docs: DataFrame, from: Int, to: Int,
                       idCol: String = "doc_id"): DataFrame = {
    require(from >= 1 && to >= 1 && from != to,
      "from/to must be positive and differ")
    val id = col(idCol).cast("string")
    val h = TextAnalysis.md5Hash60(concat(lit("42:"), id))
    def hrw(n: Int): Column =
      array_max(array((0 until n).map(i =>
        struct(TextAnalysis.md5Hash60(concat(lit(s"hrw$i:"), id)).as("h"),
          lit(i.toLong).as("n"))): _*)).getField("n")
    docs
      .select(
        (pmod(h, lit(from.toLong)) =!= pmod(h, lit(to.toLong)))
          .cast("long").as("_mv_mod"),
        (hrw(from) =!= hrw(to)).cast("long").as("_mv_hrw"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_mv_mod")).as("_m_mod"),
        sum(col("_mv_hrw")).as("_m_hrw"))
      .select(explode(array(
        struct(lit("hrw").as("scheme"), col("n_docs"),
          col("_m_hrw").as("n_moved")),
        struct(lit("mod").as("scheme"), col("n_docs"),
          col("_m_mod").as("n_moved")))).as("s"))
      .select(col("s.scheme").as("scheme"), col("s.n_docs").as("n_docs"),
        col("s.n_moved").as("n_moved"))
      .withColumn("moved_micro",
        expr("n_moved * 1000000 div greatest(n_docs, 1)"))
      .orderBy(col("scheme"))
  }

  /** Stage-lineage fingerprints over a sequential gate funnel — the
    * reproducibility receipt a pipeline publishes with its output: for
    * the input and after each cumulative gate, the surviving row count
    * AND an order-free content fingerprint (bit_xor of a seeded md5
    * hash per id). Two runs — different cluster, different partition
    * count, different day — must produce byte-identical receipts; the
    * first stage whose fingerprint diverges localizes a drift to the
    * exact gate that caused it, without diffing row-level dumps.
    *
    * Emits (stage_idx, stage, n_rows, fp) — stage 0 is the raw input,
    * stage i the survivors of gates 1..i; an empty stage fingerprints
    * as 0.
    *
    * Scale: ONE corpus aggregate (a conditional count + bit_xor pair
    * per stage, all fused in one pass), then literal-frame explode of
    * the 1-row result — no sort, no collect, the xor is order-free by
    * construction. */
  def stageLineage(docs: DataFrame, gates: Seq[(String, Column)],
                   idCol: String = "doc_id"): DataFrame = {
    require(gates.nonEmpty, "at least one gate required")
    val h = TextAnalysis.md5Hash60(
      concat(lit("fp:"), col(idCol).cast("string")))
    val stages = ("input", lit(true)) +:
      gates.scanLeft(("input", lit(true))) { case ((_, acc), (n, c)) =>
        (n, acc && c)
      }.tail
    val proj = stages.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(c.cast("long").as(s"_c_$i"), when(c, h).as(s"_h_$i"))
    }
    val aggs = stages.indices.flatMap { i =>
      Seq(sum(col(s"_c_$i")).as(s"_n_$i"),
        coalesce(expr(s"bit_xor(_h_$i)"), lit(0L)).as(s"_f_$i"))
    }
    docs
      .select(proj: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stages.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(i.toLong).as("stage_idx"), lit(n).as("stage"),
          col(s"_n_$i").as("n_rows"), col(s"_f_$i").as("fp"))
      }: _*)).as("s"))
      .select(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"),
        col("s.n_rows").as("n_rows"), col("s.fp").as("fp"))
      .orderBy(col("stage_idx"))
  }

  /** In-batch false-negative sweep for contrastive embedding training:
    * when batches are drawn by hash, every same-batch pair is treated
    * as a negative — but a pair of near-duplicates (same dup
    * component) is a FALSE negative that pushes identical content
    * apart and poisons the loss. For each candidate batch size this
    * measures the expected false-negative pair rate under the
    * deterministic hash batching, so the trainer can pick the largest
    * batch whose poison rate is tolerable — or learn that the corpus
    * must be deduped before contrastive training at any batch size.
    *
    * Emits one row per batch size: (batch_size, n_batches, n_pairs,
    * n_false_neg, fn_rate_micro).
    *
    * Scale: ONE corpus pass for every size at once — the size list is
    * exploded into the projection (|sizes|× row inflation, map-side),
    * then one (size, batch, component) aggregate cascades into
    * (size, batch) then per-size totals — counting, never pair
    * materialization; the id-keyed component join is the only
    * corpus-width shuffle. The corpus count the batch arithmetic
    * needs is a 1-row aggregate broadcast onto the pass (the plan
    * stays lazy — building the frame runs nothing). */
  def falseNegativeSweep(docs: DataFrame, comps: DataFrame,
                         batchSizes: Seq[Int],
                         idCol: String = "doc_id"): DataFrame = {
    require(batchSizes.nonEmpty && batchSizes.forall(_ >= 2),
      "batch sizes below 2 have no in-batch pairs")
    val nDf = docs.agg(count(lit(1)).as("_n"))
    val lab = docs.select(col(idCol))
      .join(comps.select(col(idCol).as("_cid"), col("component")),
        col(idCol) === col("_cid"), "left")
      .drop("_cid")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    val sizeLits = array(batchSizes.map(b => lit(b.toLong)): _*)
    // seed string "fn<b>:<id>" matches the per-size literal it replaced
    val sized = lab.crossJoin(broadcast(nDf))
      .select(col(idCol), col("component"),
        explode(sizeLits).as("batch_size"), col("_n"))
      .withColumn("n_batches",
        greatest(lit(1L), expr("(_n + batch_size - 1) div batch_size")))
      .withColumn("batch",
        pmod(TextAnalysis.md5Hash60(
          concat(lit("fn"), col("batch_size").cast("string"), lit(":"),
            col(idCol).cast("string"))), col("n_batches")))
    val perBatch = sized
      .groupBy(col("batch_size"), col("batch"), col("component"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("batch_size"), col("batch"))
      .agg(sum(expr("c * (c - 1) div 2")).as("fn_b"),
        sum(col("c")).as("tot_b"))
      .groupBy(col("batch_size"))
      .agg(sum(expr("tot_b * (tot_b - 1) div 2")).as("n_pairs"),
        sum(col("fn_b")).as("n_false_neg"))
    // right frame of sizes so empty input still emits one row per size
    // (n_batches = 1, zero pairs) — the pre-fuse contract
    docs.sparkSession.range(1)
      .select(explode(sizeLits).as("batch_size"))
      .crossJoin(broadcast(nDf))
      .withColumn("n_batches",
        greatest(lit(1L), expr("(_n + batch_size - 1) div batch_size")))
      .join(perBatch, Seq("batch_size"), "left")
      .select(col("batch_size"), col("n_batches"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_false_neg"), lit(0L)).as("n_false_neg"),
        expr("coalesce(n_false_neg, 0) * 1000000 " +
          "div greatest(coalesce(n_pairs, 0), 1)").as("fn_rate_micro"))
      .orderBy(col("batch_size"))
  }
}
