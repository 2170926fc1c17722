package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.functions.{MisraGries, SketchAggregates}
import graft.ops.Aggregations

/** tf-idf / LM scoring / Misra-Gries heavy hitters / outlier detection. */
class TextScoringSpec extends SparkSpec {
  import spark.implicits._

  // --- Misra-Gries aggregator ---------------------------------------------

  test("MG summary is exact when capacity covers the key domain") {
    val mg = new MisraGries(8)
    val m = "a a b a c b a".split(" ").foldLeft(mg.zero)(mg.reduce)
    assert(m === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("MG retains heavy keys past eviction and undercounts by <= N/capacity") {
    val mg = new MisraGries(3)
    // 30 x "hot" interleaved with 20 distinct one-off keys: N=50, cap=3
    val stream = (0 until 20).flatMap(i => Seq("hot", s"cold$i")) ++
      Seq.fill(10)("hot")
    val m = stream.foldLeft(mg.zero)(mg.reduce)
    assert(m.contains("hot"), "frequency 30 > N/cap must survive")
    assert(m("hot") <= 30 && m("hot") >= 30 - 50 / 3)
  }

  test("MG merge keeps pointwise sums under capacity, caps above it") {
    val mg = new MisraGries(2)
    val merged = mg.merge(Map("a" -> 10L, "b" -> 3L), Map("a" -> 5L, "c" -> 4L))
    // sums: a=15 b=3 c=4; cut = 3rd largest (3) subtracted, zeros dropped
    assert(merged === Map("a" -> 12L, "c" -> 1L))
    assert(mg.merge(Map("a" -> 1L), Map("b" -> 1L)) ===
      Map("a" -> 1L, "b" -> 1L))
  }

  test("mg_summary udaf over a partitioned stream matches exact counts") {
    val words = Seq.fill(40)("x") ++ (0 until 10).map(i => s"w$i")
    val df = words.toDF("w").repartition(4)
    val summary = df.agg(SketchAggregates.mg_summary(64)(col("w")))
      .as[Map[String, Long]].head()
    assert(summary("x") === 40L)
    assert(summary.size === 11)
  }

  test("capped_collect gathers sorted values and nulls out hot groups") {
    val rows = ((1 to 5).map(i => ("cold", i.toLong)) ++
      (1 to 9).map(i => ("hot", i.toLong))).toSeq
    val df = rows.toDF("k", "v").repartition(4) // partial-merge path
    val got = df.groupBy(col("k"))
      .agg(SketchAggregates.capped_collect(8)(col("v")).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got("cold") === Some(Seq(1L, 2L, 3L, 4L, 5L))) // sorted
    assert(got("hot") === None) // 9 > cap 8 → NULL
    // boundary: exactly cap values survive
    val atCap = (1 to 8).map(i => ("k", i.toLong)).toDF("k", "v")
      .repartition(3)
      .groupBy(col("k"))
      .agg(SketchAggregates.capped_collect(8)(col("v")).as("ids"))
      .collect().head.getSeq[Long](1)
    assert(atCap === (1L to 8L))
  }

  // --- token_set_hits kernel ----------------------------------------------

  test("token_set_hits matches the interpreted HOF formulation on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val stops = TextAnalysis.StopEn
    val diff = docs.select(
        graft.functions.TextFunctions
          .token_set_hits(lower(col("text")), stops).as("kernel"),
        size(filter(TextAnalysis.tokens(lower(col("text"))),
          t => array_contains(typedLit(stops), t))).as("hof"))
      .filter(col("kernel") =!= col("hof"))
    assert(diff.isEmpty)
    // edges: empty string, whitespace runs, no hits, repeated hits
    val rows = Seq("", "   ", "zzz yyy", "the the THE the", "\tthe\nof ")
      .toDF("t")
      .select(graft.functions.TextFunctions
        .token_set_hits(col("t"), stops).as("h"))
      .collect().map(_.getInt(0)).toSeq
    assert(rows === Seq(0, 0, 0, 3, 2))
  }

  // --- heavyGrams two-pass exact top-k ------------------------------------

  test("heavyGrams matches the exact relational top-k on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextAnalysis.heavyGrams(docs, n = 2, k = 3, capacity = 2048)
      .orderBy(col("source"), col("rk"))
    // exact reference: full groupBy over all bigrams
    val grams = docs.select(col("source"),
      explode(graft.functions.TextFunctions.word_grams(col("text"), 2))
        .as("gram"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n").desc, col("gram"))
    val want = grams.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk"), col("gram"), col("n"))
      .orderBy(col("source"), col("rk"))
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  // --- tf-idf --------------------------------------------------------------

  test("tfIdfTopK ranks the distinctive token first") {
    val docs = Seq(
      (1L, "shared shared rare"),
      (2L, "shared shared shared"),
      (3L, "shared other other")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopK(docs, k = 2)
      .orderBy(col("doc_id"), col("rk"))
      .collect()
    // "rare" appears in 1/3 docs -> idf ln(3); "shared" in 3/3 -> idf 0
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.head.getString(2) === "rare")
    assert(doc1.head.getDouble(3) === math.round(math.log(3.0) * 1e6) / 1e6)
    // every tfidf for "shared" is exactly 0
    assert(out.filter(_.getString(2) == "shared").forall(_.getDouble(3) == 0.0))
    // k bound respected, ranks contiguous from 1
    assert(out.groupBy(_.getLong(0)).forall { case (_, rs) =>
      rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length)
    })
  }

  // --- unigram LM scoring ---------------------------------------------------

  test("lmScore: rare-token documents carry more bits per token") {
    val docs = Seq(
      (1L, "common common common common common common common rare"),
      (2L, "common common common common common common common common"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs).orderBy(col("doc_id")).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(8L, 8L))
    val Seq(withRare, allCommon) = out.map(_.getLong(2)).toSeq
    assert(withRare > allCommon)
    // all-common doc: -log2(15/16) per token
    val expect = (math.round(-math.log(15.0 / 16.0) / math.log(2.0) * 1e6))
    assert(allCommon === expect)
  }

  // --- feature-hashed linear inference --------------------------------------

  test("hashedLinearScore: integer margins, sign labels, hash determinism") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, ""), (4L, "ALPHA Beta GAMMA"))
      .toDF("doc_id", "text")
    val out = TextAnalysis
      .hashedLinearScore(docs, hashFn = TextAnalysis.md5Hash60)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // identical text → identical margin; case-folding makes 4 match too
    assert(out(1L) === out(2L) && out(1L) === out(4L))
    // margin equals the directly-computed md5 milli-weight sum
    val expect = Seq("alpha", "beta", "gamma")
      .map(t => graft.ext.Dedup.md5Long(t) % 1001 - 500).sum
    assert(out(1L)._2 === expect)
    assert(out(1L)._3 === (if (expect > 0) 1L else 0L))
    // empty doc: zero tokens, zero margin, label 0
    assert(out(3L) === ((0L, 0L, 0L)))
    // the fast default hash is deterministic across invocations and
    // survives the Long.MinValue edge (logical shift, not abs)
    val fast = TextAnalysis.hashedLinearScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val fast2 = TextAnalysis.hashedLinearScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(fast.toSeq === fast2.toSeq)
    assert(fast(0)._2 === fast(1)._2) // identical text, identical margin
  }

  // --- BPE merge training ---------------------------------------------------

  test("bpeMerges learns the dominant pair first and respects ties") {
    // "aa" appears in every word of a skewed distribution: 'a a' must be
    // merge 1; after merging, 'aa'+'b' dominates ('aab' ×6)
    val docs = Seq(
      (1L, "aab aab aab"), (2L, "aab aab aab"),
      (3L, "cd cd"), (4L, "aa"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, iters = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got(0) === ((1L, "a", "a", "aa", 7L)))  // 6×aab + 1×aa
    assert(got(1) === ((2L, "aa", "b", "aab", 6L)))
    // deterministic lexicographic tie-break: equal-count pairs pick the
    // smaller (l, r)
    val tied = Seq((1L, "xy"), (2L, "ab")).toDF("doc_id", "text")
    val first = TextAnalysis.bpeMerges(tied, iters = 1).collect().head
    assert((first.getString(1), first.getString(2)) === (("a", "b")))
  }

  test("chunkWindows strides with overlap and fingerprints content") {
    // 10 tokens, ctx 4, overlap 2 → stride 2: starts 0,2,4,6,8 with
    // the tail chunk partial (len 2); empty doc emits nothing
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, " "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, ctxLen = 4, overlap = 2)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.map(c => (c._2, c._3, c._4)) ===
      Seq((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 4L), (3L, 6L, 4L),
        (4L, 8L, 2L)))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._5 === m("t0 t1 t2 t3"))
    assert(got(4)._5 === m("t8 t9"))
  }

  test("vocabGrowth: prefix cutoffs count docs, tokens, first-seen vocab") {
    // ids 0..10; 50% cutoff = id 5. Prefix 0..5 holds docs {0,5}:
    // 4 tokens, vocab {a,b,c}; full corpus adds doc 10's {d}
    val docs = Seq((0L, "a b a"), (5L, "c"), (10L, "c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, pcts = Seq(50, 100))
      .orderBy("pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === Seq(
      (50L, 5L, 2L, 4L, 3L),
      (100L, 10L, 3L, 6L, 4L)))
  }

  test("char_entropy: uniform chars hit exact log2, repeats score zero") {
    // "abcd": 4 distinct, p=1/4 → exactly 2 bits → 2_000_000 micro;
    // "aaaa": entropy 0; "ab" surrogate-free 1 bit; empty → zeros
    val docs = Seq((1L, "abcd"), (2L, "aaaa"), (3L, "ab"), (4L, ""))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.functions.TextFunctions.char_entropy(col("text")).as("ce"))
      .select(col("doc_id"), col("ce.n_chars"), col("ce.n_distinct"),
        col("ce.micro_entropy"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Seq(
      (1L, 4L, 4L, 2000000L),
      (2L, 4L, 1L, 0L),
      (3L, 2L, 2L, 1000000L),
      (4L, 0L, 0L, 0L)))
  }

  test("pmiBigrams ranks the exclusive collocation above the promiscuous one") {
    // "strong coffee" always co-occur (5×, never apart); "big" pairs
    // with two different right-hand words so each pair's PMI is lower;
    // pairs under minCount vanish
    val docs = Seq(
      (1L, "strong coffee big dog big cat strong coffee"),
      (2L, "strong coffee big dog big cat strong coffee"),
      (3L, "strong coffee big dog big cat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.head._1 === "strong" && got.head._2 === "coffee")
    assert(got.map(p => (p._1, p._2)).toSet
      .subsetOf(Set(("strong", "coffee"), ("big", "dog"), ("big", "cat"),
        ("coffee", "big"), ("dog", "big"), ("cat", "strong"))))
  }

  test("packingStats: integer buckets, padding to context, efficiency") {
    // 10 tokens → bucket 0, pad 118; 40 tokens → bucket 2, pad 88;
    // 200 tokens → bucket 7 (capped), pad 2·128−200=56; empty doc →
    // bucket 0, pad 0
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")),
      (2L, Seq.fill(40)("w").mkString(" ")),
      (3L, Seq.fill(200)("w").mkString(" ")),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packingStats(docs).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got(0) === ((0L, 2L, 10L, 118L, 10L * 1000000L / 128L)))
    assert(got(1) === ((2L, 1L, 40L, 88L, 40L * 1000000L / 128L)))
    assert(got(2) === ((7L, 1L, 200L, 56L, 200L * 1000000L / 256L)))
  }

  test("dsirWeights: target-seen text outranks target-unseen text") {
    // target (en) is all "x y" bigrams; de docs split between the same
    // text and a disjoint one. Weights are log-ratios: with a tiny
    // target corpus and 256 smoothing buckets the absolute values all
    // go negative, so (as in real DSIR resampling) only the RELATIVE
    // order is contractual — target-seen text must outrank
    // target-unseen text, identical text ties, sub-2-token docs get 0.
    val docs = Seq(
      (1L, "x y x y", "en"), (2L, "x y x y", "de"),
      (3L, "a b a b", "de"), (4L, "solo", "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.dsirWeights(docs, col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 4)
    assert(got(0)._2 === 3L)                    // 3 bigrams
    assert(got(0)._3 === got(1)._3)             // same text, same weight
    assert(got(0)._3 > got(2)._3)               // target-seen ≻ unseen
    assert(got(3) === ((4L, 0L, 0L)))           // single token ⇒ no bigram
  }

  test("bpeEncode applies learned merges without crossing token bounds") {
    // merges learned on this corpus: 'a a'→aa then 'aa b'→aab. Doc 1:
    // "aab aab" = 2 tokens × 3 chars → both collapse to 1 symbol = 2
    // bpe tokens. Doc 2: "ba ab" must NOT merge the 'a|a' across the
    // token boundary: 'b a' + 'a b' stay 4 symbols ('a a' never
    // adjacent within a token).
    val docs = Seq(
      (1L, "aab aab aab"), (2L, "aab aab aab"),
      (3L, "cd cd"), (4L, "aa"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, iters = 2)
    val enc = TextAnalysis.bpeEncode(
      Seq((1L, "aab aab"), (2L, "ba ab"), (3L, "")).toDF("doc_id", "text"),
      merges, iters = 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc(0) === ((1L, 2L, 2L)))   // 6 chars → 2 'aab' symbols
    assert(enc(1) === ((2L, 2L, 4L)))   // boundary blocks the 'a a' merge
    assert(enc(2) === ((3L, 0L, 0L)))   // empty text
    // asking for MORE iterations than the trained merge list holds must
    // pass documents through the missing rounds unchanged — not
    // annihilate the frame against an empty broadcast side
    val enc5 = TextAnalysis.bpeEncode(
      Seq((1L, "aab aab")).toDF("doc_id", "text"), merges, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc5 === Array((1L, 2L, 2L)))
  }

  // --- outliers -------------------------------------------------------------

  test("outliers flags far points per group and skips constant groups") {
    val rows = (1 to 20).map(i => ("a", i.toDouble % 2 + 10.0)) :+
      (("a", 1000.0)) :++ (1 to 10).map(_ => ("c", 5.0))
    val df = rows.toDF("grp", "v")
    val out = Aggregations.outliers(df, "grp", "v", z = 3.0).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("v") === 1000.0)
    // constant group: sigma = 0, |v - mu| = 0, never flagged
    assert(!out.exists(_.getAs[String]("grp") == "c"))
  }

  // --- normalize_text -------------------------------------------------------

  test("normalize_text folds case, accents, ligatures, fullwidth per the map") {
    import graft.functions.TextFunctions.normalize_text
    val cases = Seq(
      "Crème BRÛLÉE à Paris" -> "creme brulee a paris",
      "Straße GRÖSSER" -> "strasse grosser",
      "ＦＵＬＬＷＩＤＴＨ　Ｔｅｘｔ　１２３！" -> "fullwidth text 123!",
      "ﬁnancial ﬂows" -> "financial flows",
      "ŁÓDŹ żółć" -> "lodz zolc",
      "Ærøskøbing œuvre" -> "aeroskobing oeuvre",
      "Þingvellir norðan" -> "thingvellir nordan",
      "emoji 🙂 and 汉字 pass through" -> "emoji 🙂 and 汉字 pass through",
      "" -> "")
    val got = cases.map(_._1).toDF("raw")
      .select(normalize_text(col("raw"))).as[String].collect()
    assert(got.toSeq === cases.map(_._2))
    // null propagates
    val n = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "raw")
      .select(normalize_text(col("raw"))).collect()
    assert(n.head.isNullAt(0))
    // idempotent: normalizing normalized text is the identity
    val twice = cases.map(_._2).toDF("raw")
      .select(normalize_text(normalize_text(col("raw")))).as[String].collect()
    assert(twice.toSeq === cases.map(_._2))
  }

  // --- token drift (Jensen-Shannon divergence) ----------------------------

  test("tokenDrift: identical snapshots diverge 0, disjoint snapshots ln 2") {
    val same = Seq(
      (0L, "en", "alpha beta gamma"), (1L, "en", "alpha beta gamma"),
      (2L, "xx", "aa bb"), (3L, "xx", "cc dd"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.tokenDrift(same, pmod(col("doc_id"), lit(2)))
      .collect().map(r => r.getString(0) -> r).toMap
    // en: snapshot 0 and 1 are the same 3 tokens → JSD exactly 0
    assert(got("en").getAs[Long]("jsd_micro") === 0L)
    assert(got("en").getAs[Long]("n_tokens_0") === 3L)
    // xx: no shared tokens → JSD = ln 2 (693147 micro)
    assert(got("xx").getAs[Long]("jsd_micro") === 693147L)
  }

  test("tokenDrift: a skewed shared vocabulary lands strictly inside (0, ln 2)") {
    val df = Seq(
      (0L, "en", "a a a a b"), (1L, "en", "a b b b b"))
      .toDF("doc_id", "lang", "text")
    val jsd = TextAnalysis.tokenDrift(df, pmod(col("doc_id"), lit(2)))
      .collect().head.getAs[Long]("jsd_micro")
    assert(jsd > 0L && jsd < 693147L)
  }

  test("vocabOverlap: pairwise type-set Jaccard across groups") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (1L, "en", "red Blue"), (2L, "en", "blue green"),
      (3L, "fr", "blue rouge"))
      .toDF("doc_id", "lang", "text")
    // en types {red, blue, green}, fr {blue, rouge} (case-folded);
    // shared {blue} → jaccard 1/4 = 250000 micro
    val got = TextAnalysis.vocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(("en", "fr", 3L, 2L, 1L, 250000L)))
  }

  test("packingEfficiencySweep: exact padding per context point") {
    import spark.implicits._
    // docs of 3 and 5 tokens: ctx 4 -> pads 1 + 3; ctx 8 -> pads 5 + 3
    val docs = Seq((1L, "a b c"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packingEfficiencySweep(docs, Seq(4L, 8L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (4L, 2L, 8L, 4L, 8L * 1000000L / 12L),
      (8L, 2L, 8L, 8L, 500000L)))
  }

  test("truncationLossSweep: exact lost tokens per context point") {
    import spark.implicits._
    // docs of 3 and 5 tokens: ctx 4 loses 0 + 1; ctx 8 loses nothing
    val docs = Seq((1L, "a b c"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.truncationLossSweep(docs, Seq(4L, 8L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (4L, 2L, 1L, 8L, 1L, 1000000L / 8L),
      (8L, 2L, 0L, 8L, 0L, 0L)))
  }

  test("rm3TopK: expansion pulls in docs the seed query cannot see") {
    import spark.implicits._
    // seed term 'alpha' hits docs 1-3; those feedback docs all carry
    // 'omega', which also appears in doc 9 — a doc with NO seed term.
    // RM3 must surface doc 9; the plain seed query cannot.
    val docs = Seq(
      (1L, "alpha omega river stone"),
      (2L, "alpha omega cloud"),
      (3L, "alpha omega field"),
      (9L, "omega omega omega harvest"),
      (10L, "quiet unrelated words here"))
      .toDF("doc_id", "text")
    val seedOnly = TextAnalysis.bm25TopK(docs, Seq("alpha"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(!seedOnly.contains(9L))
    val rm3 = TextAnalysis.rm3TopK(docs, Seq("alpha"), fbDocs = 3,
      fbTerms = 1, k = 10).collect()
    assert(rm3.map(_.getLong(0)).contains(9L),
      "expanded query must reach the omega-only doc")
    // ranks are dense from 1 and ordered by score
    assert(rm3.map(_.getLong(3)).toSeq === (1L to rm3.length).toSeq)
  }

  test("qualityThresholdSweep: counts nest and totals are exact") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ts = Seq(100000L, 200000L, 300000L)
    val got = TextAnalysis.qualityThresholdSweep(docs, ts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq === ts)
    // survivor and token counts are non-increasing (filters nest)
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    assert(got.map(_._4).toSeq === got.map(_._4).sortBy(-_).toSeq)
    // each point matches a direct filtered count
    val q = TextAnalysis.withQuality(docs)
      .select(org.apache.spark.sql.functions
        .expr("CAST(round(quality * 1000000) AS BIGINT)").as("qm"))
      .collect().map(_.getLong(0))
    ts.zip(got).foreach { case (t, row) =>
      assert(row._2 === q.count(_ >= t).toLong, s"threshold $t")
    }
  }

  // --- BPE vocabulary utilization -------------------------------------------

  test("bpeVocabUsage: symbol counts exclude separators; shares are exact " +
      "micros of the full total") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, iters = 1)
    val enc = TextAnalysis.bpeEncodeSymbols(docs, merges, iters = 1)
    val got = TextAnalysis.bpeVocabUsage(enc, topK = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // iter-1 merge is (a,b) -> 'ab': stream is [ab, SEP, ab, SEP, b]
    assert(got.toSeq === Seq((1, "ab", 2L, 666666L), (2, "b", 1L, 333333L)))
  }

  // --- keyword-lexicon topic tagging ----------------------------------------

  test("topicTag: argmax with lexicon-order ties; zero hits tag as none") {
    val lex = Seq(
      "exec" -> Seq("scan", "filter", "join"),
      "schema" -> Seq("table", "row"),
      "size" -> Seq("fast", "big"))
    val docs = Seq(
      (1L, "scan filter join please"), // exec 3
      (2L, "table scan"),              // 1-1 tie -> exec (earlier topic)
      (3L, "fast fast big"),           // size 3 (multiplicity counted)
      (4L, "xyzzy blargh"))            // no hits -> none
      .toDF("doc_id", "text")
    val got = TextAnalysis.topicTag(docs, lex)
      .select("doc_id", "topic", "n_hits").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("exec", 3L)))
    assert(got(2L) === (("exec", 1L)))
    assert(got(3L) === (("size", 3L)))
    assert(got(4L) === (("none", 0L)))
  }
}
