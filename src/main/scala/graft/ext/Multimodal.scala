package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — extension tier (SURVEY.md §7 step 5).
  *
  * Images/audio/video are carried as opaque `binary` payload columns with
  * a typed metadata struct alongside. The Spark-side machinery (schema,
  * partitioning, per-partition batched processing, frame sampling) is
  * real and tested; the codec itself is a deterministic stand-in —
  * the execution container has no image/audio libraries, so `decodeStub`
  * marks exactly where a real decoder (e.g. via JNI/javacv) would slot
  * in, and derives features from raw bytes instead.
  */
object Multimodal {

  /** Typed row for the per-partition feature extraction path. */
  final case class Asset(doc_id: Long, payload: Array[Byte])
  final case class AssetFeatures(doc_id: Long, n_bytes: Long,
                                 byte_mean: Double, features: Array[Float])

  /** Build an asset table from the documents fixture: the UTF-8 text
    * bytes stand in for an encoded media payload; width/height/channels
    * are deterministic functions of doc_id (multiplicative-hash mod a
    * prime) so metadata handling is oracle-checkable. */
  def assets(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (lit(64) + (col(idCol) * 2654435761L) % 193).cast("int").as("width"),
        (lit(64) + (col(idCol) * 40503L) % 151).cast("int").as("height"),
        (lit(1) + col(idCol) % 3).cast("int").as("channels"),
        lit("fake/raw").as("format")).as("meta"))

  /** Metadata projection (flat, oracle-checkable): payload size + the
    * typed struct fields. */
  def metaTable(docs: DataFrame): DataFrame =
    assets(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.channels").as("channels"))
      .orderBy(col("doc_id"))

  /** STUB — real media decode goes here. Deterministic stand-in: a
    * 16-bin byte histogram (normalized) plus the byte mean. Signature
    * and batch shape (Iterator per partition → Iterator of features)
    * are exactly what a real codec integration needs: per-partition
    * setup happens once per task, rows stream through without
    * collecting. */
  def decodeStub(payload: Array[Byte]): (Double, Array[Float]) = {
    // ??? real codec (JPEG/PNG/audio frames) would decode here; the
    // container ships no media libs, so derive features from raw bytes.
    if (payload.isEmpty) (0.0, Array.fill(16)(0.0f))
    else {
      val hist = new Array[Float](16)
      var sum = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        hist(b >> 4) += 1.0f
        sum += b
        i += 1
      }
      var j = 0
      while (j < 16) { hist(j) /= payload.length.toFloat; j += 1 }
      (sum.toDouble / payload.length, hist)
    }
  }

  /** Feature extraction over the asset table: repartition by doc_id so
    * downstream joins on doc_id are co-partitioned, then run the codec
    * stub per partition (mapPartitions — the per-partition iterator is
    * where a real decoder would amortize its setup). */
  def extractFeatures(assetDf: DataFrame, partitions: Int = 0): Dataset[AssetFeatures] = {
    implicit val inEnc = Encoders.product[Asset]
    implicit val outEnc = Encoders.product[AssetFeatures]
    val typed = (if (partitions > 0)
      assetDf.repartition(partitions, col("doc_id")) else assetDf)
      .select(col("doc_id"), col("payload")).as[Asset]
    typed.mapPartitions { it =>
      // per-partition: real codecs would initialize native state here
      it.map { a =>
        val (mean, feats) = decodeStub(a.payload)
        AssetFeatures(a.doc_id, a.payload.length.toLong, mean, feats)
      }
    }
  }

  /** Frame sampling: slice the payload into `n` evenly-spaced fixed-size
    * "frames" (stand-in for video frame extraction), as pure column
    * expressions — binary substring is codegen'd, no UDF. */
  def sampleFrames(assetDf: DataFrame, n: Int = 4, frameLen: Int = 32): DataFrame =
    assetDf.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(n - 1)),
          i => col("payload").substr(
            (i * greatest((length(col("payload")) - lit(frameLen)) / n, lit(1)) + 1)
              .cast("int"), lit(frameLen)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")

  // ===== perceptual near-dup dedup over asset payloads =====================

  /** One "pixel" of the perceptual grid: the i-th of `cells` evenly
    * spaced payload slices, content-hashed and bucketed to [0, 256).
    * Pure integer/substring ops (the md5Hash60 convention), so the
    * whole grid replays bit-for-bit in any engine. */
  private def gridPixel(t: Column, i: Int, cells: Int): Column = {
    val len = length(t).cast("long")
    // i*len < 61 * ~1e5 « 2^53, so the double division is exact pre-floor
    val start = floor((lit(i.toLong) * len).cast("double") / cells)
      .cast("int") + 1
    val clen = greatest(floor(len.cast("double") / cells).cast("int"),
      lit(1))
    pmod(graft.ext.TextAnalysis.md5Hash60(
      concat(lit("px:"), t.substr(start, clen))), lit(256L))
  }

  /** The (bits+1)-cell pixel grid of a payload: decode the payload to
    * its character stream and sample evenly spaced slices, each
    * slice's "intensity" = bucketed content hash — the deterministic
    * stand-in for a thumbnail's pixel row (the real decoder slots in
    * at [[decodeStub]]). */
  def pixelGrid(payload: Column, bits: Int = 60): Column = {
    require(bits >= 1 && bits <= 60, "bits must be in [1, 60]")
    val t = payload.cast("string")
    array((0 to bits).map(gridPixel(t, _, bits + 1)): _*)
  }

  /** Adds `phash` (BIGINT) — a dHash-style 60-bit perceptual hash:
    * bit i = 1 iff pixel(i) > pixel(i+1) over the [[pixelGrid]].
    * Identical payloads hash identically; localized same-length
    * corruptions (the re-encode / bit-rot / patched-watermark class)
    * flip only the bits whose cells cover the edit, so near-identical
    * assets land within a small Hamming distance. Length-CHANGING
    * edits shift every cell boundary and are out of scope — exactly
    * the alignment limit of a raw (translation-sensitive) image
    * dHash. 60 bits, not 64, to stay inside the md5Hash60/BIGINT-safe
    * convention shared with [[graft.ext.Dedup.withSimhash]]. The grid
    * is materialized once in a first projection so each pixel is
    * computed once even though neighbouring dHash bits share it. */
  def withPerceptualHash(assetDf: DataFrame, bits: Int = 60,
                         payloadCol: String = "payload"): DataFrame = {
    val withPx = assetDf.withColumn("_px",
      pixelGrid(col(payloadCol), bits))
    val h = (0 until bits).map { i =>
      when(element_at(col("_px"), i + 1) > element_at(col("_px"), i + 2),
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    withPx.withColumn("phash", h).drop("_px")
  }

  /** Derived "re-encoded" asset variants — the in-query fixture for
    * the perceptual-dedup family (the q51-style derivation trick: the
    * testdata ships no byte-level near-identical payloads, so the
    * store is modelled as corpus + re-encode-class copies, both sides
    * replayable): every doc with `id % mod == 0` and ≥ 200 chars gets
    * a copy at `id + offset` whose payload carries a localized
    * SAME-LENGTH corruption (5 chars overwritten at position 101 —
    * the re-encode artifact / bit-rot / patched-watermark class the
    * dHash is designed to see through). */
  def withReencodedVariants(docs: DataFrame, mod: Int = 7,
                            offset: Long = 1000000L): DataFrame = {
    val vars = docs
      .filter(col("doc_id") % mod === 0 && length(col("text")) >= 200)
      .select((col("doc_id") + offset).as("doc_id"),
        concat(substring(col("text"), 1, 100), lit("ZZZZZ"),
          substring(col("text"), 106, 1000000)).as("text"))
    docs.select(col("doc_id"), col("text")).unionByName(vars)
  }

  /** Embeddings for the [[withReencodedVariants]] store: a variant
    * normally inherits its source's embedding (the vector cache was
    * computed on the original — re-encoding does not re-embed), but
    * every `id % mixMod == 0` variant gets the embedding of id+1
    * instead — the planted payload↔vector id MIX-UP the cross-modal
    * gate exists to catch (a mixed-up id whose neighbour embedding is
    * missing simply has no vector, like any unembedded asset). */
  def variantEmbeddings(docs: DataFrame, emb: DataFrame, mod: Int = 7,
                        mixMod: Int = 21, offset: Long = 1000000L,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val varSrc = docs
      .filter(col("doc_id") % mod === 0 && length(col("text")) >= 200)
      .select(col("doc_id"),
        when(col("doc_id") % mixMod === 0, col("doc_id") + 1)
          .otherwise(col("doc_id")).as("_src"))
    val mixed = varSrc
      .join(emb.select(col(idCol).as("_src"), col(vecCol)), Seq("_src"))
      .select((col("doc_id") + offset).as(idCol), col(vecCol))
    emb.select(col(idCol), col(vecCol)).unionByName(mixed)
  }

  /** Banded perceptual-hash candidates WITH Hamming distances — the
    * [[graft.ext.Dedup]] simhashCandidates shape on the asset axis:
    * the 60-bit phash splits into 4 15-bit chunks; by pigeonhole any
    * pair within distance 3 agrees on ≥ 1 chunk, so candidates come
    * from equi-joins on (chunk index, chunk value) and only candidates
    * pay the bit_count verification — never corpus². */
  /** The materialized (id, phash) signature frame the whole phash
    * family probes — exposed so a session (or a production pipeline,
    * where signatures are a stage output every consumer reads) can
    * compute it once and feed [[phashPairsFromSigs]] /
    * [[phashHammingHistogramFromSigs]] / [[crossModalConsistency]]
    * without re-running the 61-cell grid per consumer. Checkpointed:
    * the chunk self-join references it on both sides (the
    * simhashCandidates rationale). */
  def phashSigs(assetDf: DataFrame): DataFrame =
    withPerceptualHash(assetDf)
      .select(col("doc_id").as("id"), col("phash"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  private def bandedCandidates(sigs: DataFrame,
                               maxBucketSize: Int): DataFrame = {
    val chunks = array((0 until 4).map { k =>
      struct(lit(k).as("k"),
        shiftright(col("phash"), 15 * k).bitwiseAND(lit(32767L)).as("chunk"))
    }: _*)
    val chunked0 = sigs
      .select(col("id"), col("phash"), explode(chunks).as("c"))
      .select(col("id"), col("phash"), col("c.k").as("k"),
        col("c.chunk").as("chunk"))
    // degenerate-bucket guard: m byte-identical assets in one chunk
    // bucket yield m²/2 candidates — run exact dedup first on
    // duplicate-heavy stores and cap the fan-out
    val chunked = if (maxBucketSize == Int.MaxValue) chunked0 else {
      val sizes = chunked0.groupBy(col("k"), col("chunk"))
        .agg(count(lit(1)).as("_bsz"))
        .filter(col("_bsz") <= maxBucketSize)
      chunked0.join(sizes.select(col("k"), col("chunk"))
        .hint("shuffle_hash"), Seq("k", "chunk"))
    }
    // merge PINNED on the self-join (the unbounded-pair broadcast
    // failure shape — see Dedup.jaccardPairs)
    chunked.as("a").join(chunked.as("b").hint("merge"), Seq("k", "chunk"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Perceptual near-dup asset pairs with Hamming ≤ `maxDist` (< 4 —
    * the 4-chunk pigeonhole bound). Byte-identical payloads always
    * surface (distance 0); near-identical ones surface when their
    * edits stay inside a few grid cells. */
  def phashPairs(assetDf: DataFrame, maxDist: Int = 3,
                 maxBucketSize: Int = Int.MaxValue): DataFrame =
    phashPairsFromSigs(phashSigs(assetDf), maxDist, maxBucketSize)

  /** [[phashPairs]] over a precomputed [[phashSigs]] frame — the
    * shared-stage entry point: one grid pass feeds every consumer. */
  def phashPairsFromSigs(sigs: DataFrame, maxDist: Int = 3,
                         maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(maxDist < 4, "chunk banding assumes maxDist <= 3")
    bandedCandidates(sigs, maxBucketSize)
      .filter(col("hamming") <= maxDist)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Hamming histogram over the banded phash candidates — the
    * threshold dial for [[phashPairs]]' `maxDist` (the simhash
    * histogram's asset twin): a dup spike at low distances separated
    * from the background hump marks the safe cut. Emits
    * (hamming, n_pairs), ordered. */
  def phashHammingHistogram(assetDf: DataFrame,
                            maxBucketSize: Int = Int.MaxValue): DataFrame =
    phashHammingHistogramFromSigs(phashSigs(assetDf), maxBucketSize)

  /** [[phashHammingHistogram]] over a precomputed [[phashSigs]]
    * frame. */
  def phashHammingHistogramFromSigs(sigs: DataFrame,
                                    maxBucketSize: Int = Int.MaxValue)
      : DataFrame =
    bandedCandidates(sigs, maxBucketSize)
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))

  /** Shared candidate frame of the frame-vote family: n evenly spaced
    * fixed-width frames per payload (character-level slices of the
    * decoded stream — [[sampleFrames]]' replayable cousin), each frame
    * reduced to an exact content fingerprint, then per candidate pair
    * the count of agreeing frame positions. The (fno, fp) equi-join
    * keys candidates — never corpus². */
  private[graft] def frameVoteCandidates(assetDf: DataFrame, n: Int,
                                  frameLen: Int,
                                  maxBucketSize: Int): DataFrame = {
    val t = col("payload").cast("string")
    val len = length(t).cast("long")
    val frames = array((0 until n).map { i =>
      // start_i = i*(L-frameLen)//(n-1) + 1 — both ends anchored; the
      // double division is exact-enough pre-floor (the gridPixel bound)
      val start = floor((lit(i.toLong) * greatest(len - frameLen, lit(0L)))
        .cast("double") / (n - 1)).cast("int") + 1
      struct(lit(i).as("fno"),
        graft.ext.TextAnalysis.md5Hash60(
          concat(lit("fr:"), t.substr(start, lit(frameLen)))).as("fp"))
    }: _*)
    val fpr0 = assetDf
      .select(col("doc_id").as("id"), explode(frames).as("f"))
      .select(col("id"), col("f.fno").as("fno"), col("f.fp").as("fp"))
    // degenerate-bucket guard: m byte-identical assets share every
    // frame bucket (m²/2 candidates) — exact-dedup first, or cap
    val fpr = if (maxBucketSize == Int.MaxValue) fpr0 else {
      val sizes = fpr0.groupBy(col("fno"), col("fp"))
        .agg(count(lit(1)).as("_bsz"))
        .filter(col("_bsz") <= maxBucketSize)
      fpr0.join(sizes.select(col("fno"), col("fp")).hint("shuffle_hash"),
        Seq("fno", "fp"))
    }
    fpr.as("a").join(fpr.as("b").hint("merge"), Seq("fno", "fp"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("n_frames_matched"))
  }

  /** Frame-vote near-dup pairs — the video-dedup skeleton: two assets
    * are near-dups when ≥ `minVotes` of their `n` sampled frames
    * match exactly. Complementary to [[phashPairs]]: a localized
    * corruption kills the 1-2 frames covering it and the vote still
    * carries, while a global light edit (every frame touched) kills
    * the vote but stays inside phash's hamming band — the two gates
    * together cover both corruption classes. Emits (doc_a, doc_b,
    * n_frames_matched), ordered. */
  def frameVotePairs(assetDf: DataFrame, n: Int = 8, frameLen: Int = 32,
                     minVotes: Int = 6,
                     maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(n >= 2 && minVotes >= 1 && minVotes <= n,
      "need 2+ frames and 1 <= minVotes <= n")
    frameVoteCandidates(assetDf, n, frameLen, maxBucketSize)
      .filter(col("n_frames_matched") >= minVotes)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Vote histogram over the frame-match candidates — the minVotes
    * threshold dial (the q306 twin on the frame axis): a spike at
    * high vote counts separated from the 1-2-vote background (shared
    * boilerplate frames) marks the safe cut. Emits
    * (n_frames_matched, n_pairs), ordered. */
  def frameVoteHistogram(assetDf: DataFrame, n: Int = 8,
                         frameLen: Int = 32,
                         maxBucketSize: Int = Int.MaxValue): DataFrame =
    frameVoteCandidates(assetDf, n, frameLen, maxBucketSize)
      .groupBy(col("n_frames_matched"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_frames_matched"))

  /** Canary-recall gate over the asset-dedup stack: plant one variant
    * family per corruption WIDTH (same-length Z-overwrite at position
    * 101, the [[withReencodedVariants]] derivation generalized), then
    * measure which detector catches which family — the measured
    * coverage map of the two gates: a narrow edit (between frame
    * anchors, 1-2 grid cells) is caught by BOTH; a medium edit
    * (several grid cells, one frame) escapes phash's hamming band but
    * keeps ≥ minVotes frames; a wide edit (many cells, several
    * frames) escapes both — the residual the n-gram/minhash TEXT path
    * must own. Production reads this as the planted-probe monitor a
    * store runs continuously: a recall drop on a family that used to
    * be caught means the gate configuration (bits, bands, votes)
    * silently rotted.
    *
    * Emits one row per family: (edit_width, n_planted, n_phash_hits,
    * n_vote_hits), ordered.
    *
    * Scale: ONE shared store feeds both candidate machines (banded
    * equi-joins, never corpus²); the planted pairs join them as
    * skinny keyed left joins; one ≤|widths|-group aggregate. */
  def canaryRecallStats(docs: DataFrame, widths: Seq[Int] = Seq(5, 25, 125),
                        mod: Int = 7, minLen: Int = 400): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ >= 1) &&
      widths.max + 101 <= minLen, "families must fit eligible payloads")
    val eligible = docs
      .filter(col("doc_id") % mod === 0 && length(col("text")) >= minLen)
      .select(col("doc_id"), col("text"))
    val fams = widths.zipWithIndex.map { case (w, fi) =>
      val off = (fi + 1) * 1000000L
      eligible.select((col("doc_id") + off).as("doc_id"),
        concat(substring(col("text"), 1, 100), lit("Z" * w),
          substring(col("text"), 101 + w, 1000000)).as("text"))
    }
    val store = docs.select(col("doc_id"), col("text"))
      .unionByName(fams.reduce(_ unionByName _))
    val assetDf = assets(store)
    // the two detectors are independent passes over the same planted
    // store (phash: 61-cell grid + banding; frame vote: 8 fingerprints
    // + voting self-join) — build and pin them CONCURRENTLY (Par §2.6)
    // so the probe costs ~max(detector) instead of sum; both pair
    // frames are bounded candidate sets, and the coverage-map tail
    // below only left-joins them
    val (ph, fv) = graft.Par.sections(
      phashPairs(assetDf).localCheckpoint(true),
      frameVotePairs(assetDf).localCheckpoint(true))
    val planted = widths.zipWithIndex.map { case (w, fi) =>
      val off = (fi + 1) * 1000000L
      eligible.select(col("doc_id").as("doc_a"),
        (col("doc_id") + off).as("doc_b"),
        lit(w.toLong).as("edit_width"))
    }.reduce(_ unionByName _)
    planted
      .join(ph.select(col("doc_a"), col("doc_b"), lit(1L).as("_ph")),
        Seq("doc_a", "doc_b"), "left")
      .join(fv.select(col("doc_a"), col("doc_b"), lit(1L).as("_fv")),
        Seq("doc_a", "doc_b"), "left")
      .groupBy(col("edit_width"))
      .agg(count(lit(1)).as("n_planted"),
        sum(coalesce(col("_ph"), lit(0L))).as("n_phash_hits"),
        sum(coalesce(col("_fv"), lit(0L))).as("n_vote_hits"))
      .orderBy(col("edit_width"))
  }

  /** Clip/subsequence detection — the asset-corruption class BOTH
    * aligned gates structurally miss (a clip changes length, so the
    * phash grid and the frame anchors all shift): a sampled char-gram
    * sketch (every k-char window, kept when its hash ≡ 0 mod
    * `sampleMod` — deterministic ~1/sampleMod sampling, the
    * replayable cousin of winnowing), then pairwise containment
    * n_shared / min(|sketch|). A pure substring clip's k-grams are
    * all present in its source, so its kept grams are EXACTLY kept in
    * the source too — containment 1e6 by construction, boundary-free.
    *
    * Emits (doc_a, doc_b, n_contained, n_shared, contain_micro) for
    * pairs clearing `minContainMicro`, ordered.
    *
    * Scale shape: the sketch is ~L/sampleMod rows per doc; hot grams
    * (shared boilerplate) are capped at `maxPostings` docs before the
    * self-join (the coShinglePairs guard), counts re-derived from the
    * PRUNED sketch so the containment denominator matches the join's
    * candidate universe. The k-gram enumeration is the codegen
    * [[graft.functions.CharShingles]] kernel (map-side, fused into
    * the scan — no interpreted HOF on the corpus hot path). */
  def clipContainmentPairs(assetDf: DataFrame, k: Int = 16,
                           sampleMod: Int = 8,
                           minContainMicro: Long = 800000L,
                           maxPostings: Int = 1000): DataFrame = {
    require(k >= 2 && sampleMod >= 1 &&
      minContainMicro >= 0 && minContainMicro <= 1000000L)
    val t = col("payload").cast("string")
    val kept = assetDf.select(col("doc_id").as("id"),
        explode(graft.functions.TextFunctions.char_shingles(t, k)).as("g"))
      .select(col("id"), graft.ext.TextAnalysis.md5Hash60(
        concat(lit("cg:"), col("g"))).as("h"))
      .filter(pmod(col("h"), lit(sampleMod.toLong)) === 0)
    // hot-gram prune: one explicit hash(h) exchange serves the whole
    // chain — it satisfies the (id, h) dedup's clustering (same-h rows
    // are colocated) and the per-h dfreq aggregate's, so enumerate →
    // dedup → dfreq → prune re-enumerates nothing (the r16 groupBy +
    // self-join shape ran the corpus-dominant k-gram + md5 pass twice).
    // The dfreq itself is a map-side-combinable groupBy count over the
    // DEDUPED frame, and the prune is a broadcast anti-join against the
    // (tiny, boilerplate-only) hot-gram list — NOT a count window: a
    // window sorter would buffer every row of a boilerplate-hot gram
    // (df >> maxPostings) in one task before filtering it, the exact
    // skew blow-up maxPostings exists to prevent (r16 ADVICE, guide
    // §2.5: a window over a non-contraction is a skew hazard).
    val deduped = kept
      .repartition(col("h"))
      .dropDuplicates("id", "h")
    val hotGrams = deduped.groupBy(col("h"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxPostings)
      .select(col("h"))
    val pruned = deduped
      .join(broadcast(hotGrams), Seq("h"), "left_anti")
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val counts = pruned.groupBy(col("id")).agg(count(lit(1)).as("n_kept"))
    pruned.as("a").join(pruned.as("b").hint("merge"), Seq("h"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(counts.select(col("id").as("doc_a"),
        col("n_kept").as("_na")), Seq("doc_a"))
      .join(counts.select(col("id").as("doc_b"),
        col("n_kept").as("_nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        least(col("_na"), col("_nb")).as("n_contained"),
        col("n_shared"),
        expr("n_shared * 1000000 div greatest(least(_na, _nb), 1)")
          .as("contain_micro"))
      .filter(col("contain_micro") >= minContainMicro)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-modal consistency gate: perceptual near-dup asset pairs
    * joined to BOTH members' embeddings — near-identical payloads
    * whose embeddings disagree flag an encoder problem (stale
    * embedding cache, nondeterministic encoder, or a payload↔vector
    * id mix-up), the one failure class neither the asset store nor
    * the vector index can see alone. Per Hamming distance: candidate
    * pairs, pairs whose pinned cosine falls below `agreeThreshold`
    * (the alarms), and the worst cosine (floor-scaled micro).
    *
    * Cosines are [[graft.ext.Similarity.pinnedCosine]] on integer
    * micro vectors — bit-replayable in any engine (q287 convention).
    *
    * Scale: the pair frame is the banded candidate set (bounded);
    * embeddings join it twice by id — two keyed equi-joins, no
    * corpus² anywhere. Emits (hamming, n_pairs, n_disagree,
    * min_cos_micro), ordered. */
  def crossModalConsistency(assetDf: DataFrame, emb: DataFrame,
                            maxDist: Int = 3,
                            agreeThreshold: Double = 0.9,
                            maxBucketSize: Int = Int.MaxValue,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame =
    crossModalConsistencyFromSigs(phashSigs(assetDf), emb, maxDist,
      agreeThreshold, maxBucketSize, idCol, vecCol)

  /** [[crossModalConsistency]] over a precomputed [[phashSigs]]
    * frame. */
  def crossModalConsistencyFromSigs(sigs: DataFrame, emb: DataFrame,
                            maxDist: Int = 3,
                            agreeThreshold: Double = 0.9,
                            maxBucketSize: Int = Int.MaxValue,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    import graft.ext.Similarity.{microVec, dotLong, pinnedCosine}
    val pairs = phashPairsFromSigs(sigs, maxDist, maxBucketSize)
    val v = emb.select(col(idCol).as("_vid"),
        microVec(col(vecCol)).as("_pv"))
      .withColumn("_na", dotLong(col("_pv"), col("_pv")))
    val scored = pairs
      .join(v.select(col("_vid").as("doc_a"), col("_pv").as("_va"),
        col("_na").as("_naa")), Seq("doc_a"))
      .join(v.select(col("_vid").as("doc_b"), col("_pv").as("_vb"),
        col("_na").as("_nab")), Seq("doc_b"))
      .withColumn("_ps", pinnedCosine(dotLong(col("_va"), col("_vb")),
        col("_naa"), col("_nab")))
    scored.groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_ps") < agreeThreshold, 1L).otherwise(0L))
          .as("n_disagree"),
        floor(min(col("_ps")) * 1e6).cast("long").as("min_cos_micro"))
      .orderBy(col("hamming"))
  }
}
