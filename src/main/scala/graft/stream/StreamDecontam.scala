package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup}

/** STREAMING benchmark decontamination — the ingest-time twin of the
  * batch `Curation.bloomContamination` (q61): every arriving document
  * is probed against a bloom filter of the benchmark shingle set and
  * either dropped or flagged BEFORE it reaches the curated store, so
  * eval leakage never lands on disk at all.
  *
  * The batch operator probes via explode + broadcast-join + per-doc
  * aggregate — fine for a bounded frame, but an AGGREGATE on a stream
  * forces update/complete output modes and state. Here the whole probe
  * collapses to a STATELESS per-row expression: the filter's ~1k
  * 63-bit words (mBits/63 longs — a few KB for 2^16 bits) are
  * collected once on the driver and embedded as a LITERAL array in the
  * plan, and the per-row kernel is `exists(word_shingles(text, n),
  * sh -> all k probe bits set)`. Stateless means: works identically on
  * batch and streaming frames, append mode, no watermark, no state
  * store, and the stream never shuffles for the probe.
  *
  * One-sided error is inherited from the filter: a truly shared
  * shingle is NEVER missed (bit_or over all benchmark positions), so
  * dropping flagged docs is safe-side; false positives (~fill^k) cost
  * only extra drops, priced by q279's agreement cube.
  *
  * 100 TB posture: the benchmark side is tiny and static (the filter
  * builds once per release of the eval suite); the corpus side is one
  * codegen'd map pass per document — the decontam stage adds zero
  * shuffles to ingest.
  */
object StreamDecontam {

  /** Collect a `Curation.bloomFilterWords` frame into the dense
    * little-array form the stateless kernel embeds: index = word
    * position (pos div 63), value = 63-bit mask word. Bounded by
    * construction: mBits/63 + 1 longs regardless of benchmark size. */
  def bloomBits(benchmark: DataFrame, n: Int = 5, mBits: Int = 1 << 16,
                k: Int = 4, hash: Dedup.HashScheme = Dedup.FastHash,
                textCol: String = "text"): Array[Long] = {
    val dense = new Array[Long](mBits / 63 + 1)
    Curation.bloomFilterWords(benchmark, n, mBits, k, hash, textCol)
      .collect()
      .foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
    dense
  }

  /** The stateless per-row probe column: true when ANY shingle of
    * `textCol` has all `k` bloom positions set in `bits`. */
  def bloomHit(bits: Array[Long], n: Int = 5, mBits: Int = 1 << 16,
               k: Int = 4, hash: Dedup.HashScheme = Dedup.FastHash,
               textCol: String = "text"): Column = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      "mBits must be a power of two >= 64")
    require(k >= 1, "k must be positive")
    // build/probe parameter mismatch fails loudly: a probe with a larger
    // mBits than the bits array was built with would element_at past the
    // array end, read null, and silently DROP flags — violating the
    // documented no-false-negative guarantee
    require(bits.length == mBits / 63 + 1,
      s"bits array has ${bits.length} words but mBits=$mBits needs " +
        s"${mBits / 63 + 1} — probe parameters must match the " +
        "bloomBits build")
    val bitsLit = lit(bits)
    // the variable-shift 1L << (pos % 63) as a 63-entry literal lookup
    // (the Column shiftleft only takes a literal shift count)
    val masksLit = lit((0 until 63).map(1L << _).toArray)
    def allSet(sh: Column): Column = (0 until k).map { i =>
      val pos = pmod(hash.seeded(hash.one(sh), i), lit(mBits.toLong))
      // pos < mBits <= 2^30, so the double division is exact pre-floor
      val word = element_at(bitsLit, floor(pos / 63).cast("int") + 1)
      val mask = element_at(masksLit, pmod(pos, lit(63L)).cast("int") + 1)
      word.bitwiseAND(mask) === mask
    }.reduce(_ && _)
    exists(graft.functions.TextFunctions.word_shingles(col(textCol), n),
      allSet)
  }

  /** Flag every document of a (batch OR streaming) frame:
    * adds `is_contaminated` (BIGINT 0/1). */
  def withBloomFlag(docs: DataFrame, bits: Array[Long], n: Int = 5,
                    mBits: Int = 1 << 16, k: Int = 4,
                    hash: Dedup.HashScheme = Dedup.FastHash,
                    textCol: String = "text"): DataFrame =
    docs.withColumn("is_contaminated",
      bloomHit(bits, n, mBits, k, hash, textCol).cast("long"))

  /** Admit only unflagged documents — the ingest-time drop filter. */
  def admit(docs: DataFrame, bits: Array[Long], n: Int = 5,
            mBits: Int = 1 << 16, k: Int = 4,
            hash: Dedup.HashScheme = Dedup.FastHash,
            textCol: String = "text"): DataFrame =
    withBloomFlag(docs, bits, n, mBits, k, hash, textCol)
      .filter(col("is_contaminated") === 0L)
      .drop("is_contaminated")
}
