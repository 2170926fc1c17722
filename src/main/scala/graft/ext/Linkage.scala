package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage / entity-resolution operators: fuzzy matching of
  * dirty string keys (names, titles, addresses) — the join no exact
  * key can express. Reference behavior: the retail pipeline trusts
  * its keys (Data_Pipeline_Example/batch_sales_pipeline.py joins on
  * exact ids); a 100 TB training-data pipeline linking entities
  * across sources cannot, so this is a first-class curation tier.
  */
object Linkage {

  /** Blocked fuzzy self-match over a string-key DOMAIN: distinct
    * values of `nameCol`, token-blocked candidate pairs, exact
    * Levenshtein verification at ≤ `maxDist`. Output (name_a, name_b,
    * dist) with name_a < name_b — the match dictionary an id-level
    * linkage then applies with a broadcast join.
    *
    * Scale shape: everything runs on the DISTINCT-name contraction,
    * not the rows — 100 TB of orders with 10M distinct merchant names
    * does the quadratic-risk work on 10M strings, never on row pairs.
    * Blocking is shared-token: an edit within `maxDist` of a
    * multi-token name almost always leaves ≥1 token intact, so true
    * pairs co-occur under some token key. Tokens with document
    * frequency > `maxDf` are dropped as blocking keys (a stopword
    * token would fan out df² pairs); pairs sharing ONLY ultra-common
    * tokens are missed by design — precision stays exact (every
    * emitted pair is Levenshtein-verified), recall is the blocking
    * trade documented here, the q175 rare-shingle argument.
    *
    * Determinism: Levenshtein is the classic DP metric, identical
    * integers in every engine; candidate generation replays from the
    * same df-capped token table; byte-order string comparison pairs
    * and orders the output. */
  def fuzzyNameMatches(df: DataFrame, maxDist: Int = 2,
                       nameCol: String = "name",
                       maxDf: Long = 1000): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(maxDist >= 0 && maxDf > 0, "maxDist >= 0, maxDf > 0")
    // the name domain: two consumers (token table feeds both join
    // sides) — materialize the contraction once
    val names = df.select(col(nameCol).cast("string").as("nm"))
      .filter(col("nm").isNotNull)
      .distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val tok0 = names
      .select(col("nm"), explode(split(col("nm"), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val dfq = tok0.groupBy(col("t")).agg(count(lit(1)).as("_df"))
    val tok = tok0.join(dfq.hint("shuffle_hash"), Seq("t"))
      .filter(col("_df") <= maxDf)
      .select(col("t"), col("nm"))
    val cand = tok.as("a").join(tok.as("b"),
        col("a.t") === col("b.t") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"))
      .distinct()
    cand.withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Apply a [[fuzzyNameMatches]]-style match dictionary to rows:
    * canonicalize each row's `nameCol` to the lexicographically
    * smallest name REACHABLE in its match cluster
    * ([[Dedup.components]] fixpoint over the pair graph — indirect
    * chains "smal ring"–"small ring"–"small rings" collapse to one
    * canonical form even when the endpoints exceed `maxDist` of each
    * other). Unmatched names canonicalize to themselves. Output: the
    * input plus `canonical_name`.
    *
    * Scale: the component closure runs entirely on the matched NAME
    * domain (pair-frame sized, never rows); rows pay one equi-join
    * lookup against that dictionary — AQE broadcasts it when small,
    * which is the common case for a match dictionary. */
  def canonicalizeNames(df: DataFrame, matches: DataFrame,
                        nameCol: String = "name"): DataFrame = {
    val comp = Dedup.components(
      matches.select(col("name_a").as("doc_a"), col("name_b").as("doc_b")))
      .select(col("doc_id").as("_nm"), col("component").as("_cn"))
    df.join(comp, col(nameCol) === col("_nm"), "left")
      .withColumn("canonical_name", coalesce(col("_cn"), col(nameCol)))
      .drop("_nm", "_cn")
  }
}
