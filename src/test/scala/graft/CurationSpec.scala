package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ===== decontamination ====================================================

  private lazy val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"), // contains bench 5-grams
    (2L, "totally unrelated words about columnar shuffle planning here"),
    (3L, "alpha beta gamma delta epsilon completely different tail words"))
    .toDF("doc_id", "text")
  private lazy val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"))
    .toDF("doc_id", "text")

  test("contamination counts distinct shared n-grams per corpus doc") {
    val got = Curation.contamination(corpus, bench, n = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench has two 5-grams: a..e and b..zeta; doc1 contains both,
    // doc3 only the first, doc2 none
    assert(got === Map(1L -> 2L, 3L -> 1L))
  }

  test("decontaminate drops leaking docs and keeps the rest intact") {
    val kept = Curation.decontaminate(corpus, bench, n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
    // at minHits 2 the single-shingle overlap of doc3 survives
    val lenient = Curation.decontaminate(corpus, bench, n = 5, minHits = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(lenient === Set(2L, 3L))
  }

  // ===== benchmark-side leakage =============================================

  test("benchLeakage: per-bench-doc leak counts; clean items emit zeros") {
    val bench2 = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "nothing here overlaps the training corpus at all"))
      .toDF("doc_id", "text")
    val got = Curation.benchLeakage(corpus, bench2, n = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // bench 100 has two 5-grams: doc1 carries both, doc3 the first
    assert(got(100L) === ((2L, 2L, 3L)))
    assert(got(101L) === ((0L, 0L, 0L)))
  }

  // ===== multi-width substring dedup ========================================

  test("dedupLinesMultiWidth: coarse pass strips blocks, fine pass the rest") {
    val docs = Seq(
      (1L, "a b c d e f g h"),   // first occurrence of everything
      (2L, "a b c d x y"),       // wide chunk dup + unique tail
      (3L, "a b c d e f g h"),   // full duplicate of doc 1
      (4L, "x y w z"))           // narrow dup of doc 2's tail (after pass 1)
      .toDF("doc_id", "text")
    val got = Curation.dedupLinesMultiWidth(docs, widths = Seq(4, 2))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // pass 1 (w=4): doc2 loses "a b c d", doc3 loses both chunks (empty)
    // pass 2 (w=2): doc4 loses "x y" to doc2's earlier occurrence
    assert(got(1L) === (("a b c d e f g h", 0L)))
    assert(got(2L) === (("x y", 1L)))
    assert(got(3L) === (("", 2L)))   // emptied doc survives later passes
    assert(got(4L) === (("w z", 1L)))
  }

  // ===== URL / domain analysis ==============================================

  test("withDomain extracts the first host and its registrable domain") {
    val docs = Seq(
      (1L, "see https://www.example.com/x and http://other.io/y"),
      (2L, "plain text, no links"),
      (3L, "deep http://a.b.c.site.org/path link"),
      (4L, "dotless http://localhost/admin host"))
      .toDF("doc_id", "text")
    val got = Curation.withDomain(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[String]("url_host"), r.getAs[String]("domain")))).toMap
    assert(got(1L) === (("www.example.com", "example.com"))) // first URL wins
    assert(got(2L) === (("", null)))
    assert(got(3L) === (("a.b.c.site.org", "site.org"))) // last two labels
    // single-label host: no registrable domain — must yield null, not
    // an ANSI element_at out-of-range error
    assert(got(4L) === (("localhost", null)))
  }

  test("withDomain keeps three labels under a multi-part public suffix") {
    val docs = Seq(
      (1L, "uk http://www.example.co.uk/x"),
      (2L, "bare http://example.co.uk/y"),   // 3 labels, suffix match
      (3L, "edge http://co.uk/z"),           // the suffix ITSELF as host
      (4L, "au  http://shop.example.com.au/w"),
      (5L, "us  http://www.example.com/v"))  // unaffected by the list
      .toDF("doc_id", "text")
    val suffixes = Seq("co.uk", "com.au")
    val got = Curation.withDomain(docs, multiPartSuffixes = suffixes)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[String]("domain")).toMap
    assert(got(1L) === "example.co.uk")
    assert(got(2L) === "example.co.uk")
    assert(got(3L) === "co.uk")        // only 2 labels: no third to keep
    assert(got(4L) === "example.com.au")
    assert(got(5L) === "example.com")
    // default (no list) keeps the documented two-label rule
    val deflt = Curation.withDomain(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("domain")).toMap
    assert(deflt(1L) === "co.uk")
  }

  test("domainStats aggregates hosts per domain and flags the blocklist") {
    val docs = Seq(
      (1L, "x http://www.foo.com/a"),
      (2L, "y http://cdn.foo.com/b"),
      (3L, "z http://www.foo.com/c"),
      (4L, "w http://bad.evil.net/d"),
      (5L, "no url"))
      .toDF("doc_id", "text")
    val got = Curation.domainStats(docs, Seq("evil.net")).collect()
      .map(r => r.getAs[String]("domain") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_hosts"),
          r.getAs[Long]("is_blocked")))).toMap
    assert(got === Map(
      "foo.com" -> ((3L, 2L, 0L)),
      "evil.net" -> ((1L, 1L, 1L))))
  }

  test("domainQuota caps linked docs per domain, exempts URL-less docs") {
    val docs = Seq(
      (1L, "a http://www.foo.com/1"),
      (2L, "b http://cdn.foo.com/2"),
      (3L, "c http://www.foo.com/3"),
      (4L, "d http://bar.net/4"),
      (5L, "no url at all"))
      .toDF("doc_id", "text")
    val kept = Curation.domainQuota(docs, k = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exactly one foo.com survivor (hash-rank elected), bar.net's only
    // doc and the URL-less doc always survive
    assert(kept.intersect(Set(1L, 2L, 3L)).size === 1)
    assert(kept.contains(4L) && kept.contains(5L))
    // deterministic: the same election every run
    val again = Curation.domainQuota(docs, k = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept)
    // k covering the domain size keeps everything
    assert(Curation.domainQuota(docs, k = 3).count() === 5)
  }

  // ===== PII / secret scrub =================================================

  test("scrubPii counts and redacts emails, phones, and keys") {
    val dirty = Seq(
      (1L, "mail me at a.user+x@foo-bar.example.org or b@c.io thanks"),
      (2L, "call 555-123-4567 and key sk_live_0123456789abcdef done"),
      (3L, "clean text, number 12-34 is not a phone, a@b not an email"))
      .toDF("doc_id", "text")
    val got = Curation.scrubPii(dirty).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_keys")), r.getAs[String]("clean_text"))).toMap
    assert(got(1L)._1 === ((2L, 0L, 0L)))
    assert(got(1L)._2 === "mail me at <EMAIL> or <EMAIL> thanks")
    assert(got(2L)._1 === ((0L, 1L, 1L)))
    assert(got(2L)._2 === "call <PHONE> and key <KEY> done")
    assert(got(3L)._1 === ((0L, 0L, 0L)))
    assert(got(3L)._2 === "clean text, number 12-34 is not a phone, a@b not an email")
  }

  test("scrubPii overlap: a phone inside an email is counted twice, redacted once") {
    // counts are per-pattern detections on the original text; the phone
    // disappears inside the single <EMAIL> placeholder — documented
    // semantics, and the whole match is still gone from clean_text
    val d = Seq((1L, "reach 555-123-4567@corp.com today")).toDF("doc_id", "text")
    val r = Curation.scrubPii(d).collect().head
    assert(r.getAs[Long]("n_emails") === 1L)
    assert(r.getAs[Long]("n_phones") === 1L)
    assert(r.getAs[String]("clean_text") === "reach <EMAIL> today")
  }

  test("injectSyntheticPii plants scrubbable positives on the modulo grid") {
    val docs = (1L to 100L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val scrubbed = Curation.scrubPii(Curation.injectSyntheticPii(docs))
    val sums = scrubbed.agg(sum("n_emails"), sum("n_phones"), sum("n_keys"))
      .collect().head
    // 1..100: 14 multiples of 7, 9 of 11, 7 of 13
    assert(sums.getLong(0) === 14L)
    assert(sums.getLong(1) === 9L)
    assert(sums.getLong(2) === 7L)
    // every planted value is redacted — no synthetic PII survives
    val leaked = scrubbed.filter(col("clean_text").rlike(
      "@example\\.com|555-\\d{3}-\\d{4}|sk_live_")).count()
    assert(leaked === 0L)
  }

  // ===== boilerplate strip ==================================================

  // width-2 chunks; "cookie banner" opens every doc (boilerplate at
  // maxDocs=2), the tails are unique content
  private lazy val bp = Seq(
    (1L, "cookie banner alpha beta"),
    (2L, "cookie banner gamma delta"),
    (3L, "cookie banner epsilon zeta"),
    (4L, "cookie banner"), // all-boilerplate doc
    (5L, "standalone unique content words"))
    .toDF("doc_id", "text")

  test("stripBoilerplate removes corpus-frequent chunks, preserves order") {
    val got = Curation.stripBoilerplate(bp, width = 2, maxDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Seq(
      (1L, "alpha beta", 1L),
      (2L, "gamma delta", 1L),
      (3L, "epsilon zeta", 1L),
      (4L, "", 1L), // survives, empty
      (5L, "standalone unique content words", 0L)))
  }

  test("chunkRows emits ordered non-overlapping windows incl. ragged tail") {
    val got = Curation.chunkRows(
        Seq((7L, "a b c d e")).toDF("doc_id", "text"), width = 2)
      .orderBy("cidx").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got === Seq((0, "a b"), (1, "c d"), (2, "e")))
  }

  // ===== domain-mixture sampling ============================================

  test("mixSample hits the target ratio envelope, deterministically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val w = (0 until 20).map(i =>
      s"src$i" -> (if (i < 5) 3 else if (i < 10) 2 else 1)).toMap
    val sampled = Curation.mixSample(docs, w, hash = Dedup.OracleHash)
    val bySrc = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.01: 25 docs per source -> K = min(25/3, 25/2, 25/1) = 8;
    // expected ~24/16/8 kept per source band (binomial around the rate)
    val n = 25L
    w.foreach { case (s, wi) =>
      val kept = bySrc.getOrElse(s, 0L)
      assert(kept <= n, s"$s over-sampled")
      // rate = 8*w/25; allow a wide binomial envelope but reject
      // degenerate all-or-nothing behaviour for fractional rates
      if (wi < 3) assert(kept < n, s"$s not downsampled (rate ${8.0 * wi / 25})")
      assert(kept > 0, s"$s emptied")
    }
    // weighted sources keep more than tail sources on aggregate
    val heavy = (0 until 5).map(i => bySrc.getOrElse(s"src$i", 0L)).sum
    val tail = (10 until 20).map(i => bySrc.getOrElse(s"src$i", 0L)).sum / 2
    assert(heavy > tail, "3-weighted band should out-keep the 1-weighted band")
    // deterministic: a second run yields the identical row set
    val again = Curation.mixSample(docs, w, hash = Dedup.OracleHash)
      .select("doc_id").as[Long].collect().toSet
    assert(again === sampled.select("doc_id").as[Long].collect().toSet)
  }

  // ===== repetition metrics =================================================

  test("repetitionStats counts duplicate and top bigrams per doc") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (1L, "spam spam spam spam"),      // grams: 3x "spam spam"
      (2L, "all words fully distinct"), // 3 grams, 3 distinct
      (3L, "a b a b a b"),              // 5 grams: 3x "a b", 2x "b a"
      (4L, "solo"))                     // too short: zero grams
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    assert(got(1L) === ((3L, 1L, 3L, 0.6666, 1.0)))
    assert(got(2L) === ((3L, 3L, 1L, 0.0, 0.3333)))
    assert(got(3L) === ((5L, 2L, 3L, 0.6, 0.6)))
    assert(got(4L) === ((0L, 0L, 0L, 0.0, 0.0)))
  }

  test("mixSample drops sources absent from the weight map") {
    val docs = Seq((1L, "a", "keep"), (2L, "b", "drop"))
      .toDF("doc_id", "text", "source")
    val got = Curation.mixSample(docs, Map("keep" -> 1))
      .select("source").as[String].collect().toSet
    assert(!got.contains("drop"))
  }

  // ===== line dedup =========================================================

  test("dedupLines keeps only the first occurrence of a repeated segment") {
    // width-2 segments: "cookie banner" recurs in docs 1-3, and doc 3
    // additionally repeats doc 1's "alpha beta" tail
    val docs = Seq(
      (1L, "cookie banner alpha beta"),
      (2L, "cookie banner gamma delta"),
      (3L, "cookie banner alpha beta"),   // fully seen before
      (4L, "fresh words only here"))
      .toDF("doc_id", "text")
    val got = Curation.dedupLines(docs, width = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Seq(
      (1L, "cookie banner alpha beta", 0L), // first occurrence of both
      (2L, "gamma delta", 1L),
      (3L, "", 2L),                         // survives, empty
      (4L, "fresh words only here", 0L)))
  }

  test("dedupLines differs from document dedup: partial overlap fires") {
    val docs = Seq(
      (1L, "shared header unique one"),
      (2L, "shared header unique two"))
      .toDF("doc_id", "text")
    // exact doc dedup keeps both (texts differ) — line dedup strips
    // the shared header from the second
    assert(Dedup.exactDups(docs).filter(col("n_copies") > 1).count() === 0)
    val got = Curation.dedupLines(docs, width = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "shared header unique one")
    assert(got(2L) === "unique two")
  }

  // ===== bloom decontamination ==============================================

  test("bloom filter words pack k positions per distinct benchmark shingle") {
    val words = Curation.bloomFilterWords(bench, n = 5, mBits = 1 << 10, k = 3)
      .collect()
    // bench has 2 distinct 5-grams -> at most 6 set bits across words
    val setBits = words.map(r => java.lang.Long.bitCount(r.getLong(1))).sum
    assert(setBits >= 3 && setBits <= 6)
    // words pack 63 bits each, so the last valid index is (mBits-1)/63
    assert(words.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= ((1 << 10) - 1) / 63))
  }

  test("bloomContamination has no false negatives vs exact contamination") {
    val exact = Curation.contamination(corpus, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Curation.bloomContamination(corpus, bench, n = 5,
        mBits = 1 << 16, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every exactly-contaminated doc is flagged with at least as many hits
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n,
        s"doc $id: exact=$n bloom=${bloom.get(id)}")
    }
    // at this fill rate (~10 set bits / 2^16) false positives are
    // essentially impossible: the clean doc must stay clean
    assert(!bloom.contains(2L))
  }

  test("bloomContamination with an empty benchmark flags nothing") {
    val empty = corpus.filter(col("doc_id") < 0)
    assert(Curation.bloomContamination(corpus, empty).count() === 0)
  }

  test("temperatureSample: smallest stratum keeps all, α=1 keeps everything") {
    val docs = ((1L to 8L).map(i => (i, "en")) :+ (9L -> "de") :+
      (10L -> "de")).toDF("doc_id", "lang")
    val got = Curation.temperatureSample(docs, alpha = 0.5)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // de: n_min stratum ⇒ rate 10⁶, every doc kept
    assert(got(0) === (("de", 2L, 1000000L, 2L)))
    // en: rate = sqrt(2/8)·10⁶ = 500000, kept count is the
    // deterministic md5 coin — bounded and reproducible
    assert(got(1)._3 === 500000L && got(1)._4 <= 8L)
    val again = Curation.temperatureSample(docs, alpha = 0.5)
      .orderBy("lang").collect().map(_.toSeq)
    assert(got.map(_.productIterator.toSeq).toSeq === again.toSeq)
    // α = 1 is the natural distribution: every stratum keeps all docs
    val nat = Curation.temperatureSample(docs, alpha = 1.0)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(nat.forall { case (n, rate, kept) =>
      rate === 1000000L && kept === n })
    // a NULL key is a real stratum: it must sample (null-safe join),
    // not audit n_kept=0 while silently dropping its docs
    val withNull = docs.union(Seq((11L, null.asInstanceOf[String]))
      .toDF("doc_id", "lang"))
    val nullRow = Curation.temperatureSample(withNull, alpha = 1.0)
      .filter(col("lang").isNull).collect()
    assert(nullRow.length === 1 && nullRow.head.getLong(3) === 1L)
  }

  test("dedupLines omits zero-token docs and keeps sub-width tails") {
    val docs = Seq(
      (1L, "   "),             // zero tokens -> omitted
      (2L, "tail"),            // single sub-width chunk survives
      (3L, "tail"))            // duplicate of doc 2's only chunk
      .toDF("doc_id", "text")
    val got = Curation.dedupLines(docs, width = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Seq((2L, "tail", 0L), (3L, "", 1L)))
  }

  test("kAnonymity: combos under k are at risk, a safe table audits clean") {
    // combo (a,1): 5 rows — safe at k=5; (a,2): 2 rows; (b,1): 1 row
    val df = (Seq.fill(5)(("a", 1)) ++ Seq.fill(2)(("a", 2)) ++ Seq(("b", 1)))
      .toDF("x", "y")
    val r = Curation.kAnonymity(df, Seq("x", "y"), k = 5).collect().head
    assert(r.getAs[Long]("n_rows") === 8L)
    assert(r.getAs[Long]("n_combos") === 3L)
    assert(r.getAs[Long]("n_violating_combos") === 2L)
    assert(r.getAs[Long]("n_rows_at_risk") === 3L)
    assert(r.getAs[Double]("pct_at_risk") === 37.5)
    assert(r.getAs[Long]("min_combo_size") === 1L)

    val safe = Seq.fill(10)(("a", 1)).toDF("x", "y")
    val s = Curation.kAnonymity(safe, Seq("x", "y"), k = 5).collect().head
    assert(s.getAs[Long]("n_rows_at_risk") === 0L)
    assert(s.getAs[Double]("pct_at_risk") === 0.0)
  }

  test("erasureAudit: counts reach of a deletion list, absent keys visible") {
    val facts = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("user_id")
    // request deletion of users 1 and 99 (99 has no rows)
    val keys = Seq(1L, 99L).toDF("user_id")
    val r = Curation.erasureAudit(facts, keys).collect().head
    assert(r.getAs[Long]("n_rows_before") === 6L)
    assert(r.getAs[Long]("n_rows_deleted") === 2L)
    assert(r.getAs[Long]("n_rows_after") === 4L)
    assert(r.getAs[Long]("n_keys_requested") === 2L)
    assert(r.getAs[Long]("n_keys_present") === 1L) // 99 never occurs
    assert(r.getAs[Double]("pct_deleted") ===
      BigDecimal(2.0 * 100 / 6).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stratifiedAllocation: Hamilton floors + largest remainders, sums to k") {
    val docs = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("doc_id", "lang")
    // k=7 over 5/3/2 of 10: quotas 3.5/2.1/1.4 → floors 3/2/1, the one
    // spare seat goes to the largest remainder (a)
    val got = Curation.stratifiedAllocation(docs, "lang", k = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 5L, 4L), ("b", 3L, 2L), ("c", 2L, 1L)))
    assert(got.map(_._3).sum === 7L)
    // remainder tie: equal groups, one seat → group-key order decides
    val tie = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "lang")
    val t = Curation.stratifiedAllocation(tie, "lang", k = 1).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(t.toSeq === Seq(("a", 1L), ("b", 0L)))
  }

  test("filterFunnel: sequential attrition — each rule sees prior survivors") {
    val docs = Seq((0, 0), (1, 0), (1, 1), (2, 0)).toDF("x", "y")
    val got = Curation.filterFunnel(docs, Seq(
        "x_pos" -> (col("x") >= 1), "y_pos" -> (col("y") >= 1)))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, "x_pos", 4L, 1L, 3L),   // (0,0) fails here
      (1L, "y_pos", 3L, 2L, 1L)))  // (1,0) and (2,0) fail here
    // everything-fails-rule-0 still reports later rules with 0 evaluated
    val none = Seq((0, 0), (0, 1)).toDF("x", "y")
    val z = Curation.filterFunnel(none, Seq(
        "x_pos" -> (col("x") >= 1), "y_pos" -> (col("y") >= 1)))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(z.toSeq === Seq((2L, 2L), (0L, 0L)))
  }

  test("interleaveOrder: closed-form position equals round-robin order") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "c")).toDF("doc_id", "source")
    val got = Curation.interleaveOrder(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // rounds: (a1 b4 c6) (a2 b5) (a3) — c exhausts, others close ranks
    assert(got.toSeq === Seq(
      (1L, "a", 1L, 0L), (4L, "b", 1L, 1L), (6L, "c", 1L, 2L),
      (2L, "a", 2L, 3L), (5L, "b", 2L, 4L), (3L, "a", 3L, 5L)))
    // positions are dense in [0, n) — the row_number equivalence
    assert(got.map(_._4).sorted.toSeq === (0L until 6L))
  }

  test("lDiversity: l histogram, homogeneous and skewed combos flagged") {
    // combo q=1: sensitive {s,s,s} → l=1, H=0 (violation)
    // combo q=2: sensitive {a,b,c} uniform → l=3, H=ln3 — the exact
    //   boundary the quantization slack must ADMIT
    // combo q=3: {a×8, b, c} → l=3 but H≈0.76 < ln3 (violation)
    val rows =
      Seq.fill(3)((1L, "s")) ++
      Seq((2L, "a"), (2L, "b"), (2L, "c")) ++
      (Seq.fill(8)((3L, "a")) ++ Seq((3L, "b"), (3L, "c")))
    val df = rows.toDF("q", "s")
    val got = Curation.lDiversity(df, Seq("q"), "s", targetL = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 1L, 3L, 1L),    // the homogeneous combo
      (3L, 2L, 13L, 1L)))  // uniform-3 passes, skewed-3 violates
  }

  test("epochPlan: sqrt weights, budget split, cap semantics") {
    import spark.implicits._
    // big: 10 docs x 16 tokens = 160; small: 1 doc x 4 tokens
    val text16 = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = ((1 to 10).map(i => (i.toLong, text16, "big")) :+
      (99L, "a b c d", "small")).toDF("doc_id", "text", "source")
    // w_big = isqrt(160) = 12, w_small = isqrt(4) = 2, wsum = 14
    val got = Curation.epochPlan(docs, budgetTokens = 1000L,
        maxEpochsMilli = 4000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val big = got("big"); val small = got("small")
    assert(big.getLong(2) === 160L && small.getLong(2) === 4L)
    assert(big.getLong(3) === 12L * 1000000L / 14L)   // weight_micro
    assert(small.getLong(3) === 2L * 1000000L / 14L)
    assert(big.getLong(4) === 1000L * 12L / 14L)      // target_tokens
    // big: 857 target / 160 tokens = 5357 milli-epochs -> capped 4000
    assert(big.getLong(5) === 4000L && big.getLong(7) === 1L)
    assert(big.getLong(6) === 4000L * 160L / 1000L)   // achieved
    // small: 142 target / 4 tokens = 35500 milli -> capped too
    assert(small.getLong(5) === 4000L && small.getLong(7) === 1L)
    // a generous cap leaves both uncapped with achieved <= target
    val loose = Curation.epochPlan(docs, budgetTokens = 100L,
        maxEpochsMilli = 100000L)
      .collect().map(r => r.getString(0) -> r).toMap
    loose.values.foreach { r =>
      assert(r.getLong(7) === 0L)
      assert(r.getLong(6) <= r.getLong(4),
        "achieved can never exceed target when uncapped")
    }
  }

  // ===== gate-agreement kappa ==============================================

  test("gateAgreementStats: perfect agreement, independence, and sign") {
    import org.apache.spark.sql.Row
    // 6 docs: gates agree on 5, disagree on 1
    val docs = Seq(
      (1L, 10L, 10L), (2L, 20L, 20L), (3L, 5L, 5L),
      (4L, 25L, 25L), (5L, 30L, 2L), (6L, 1L, 1L))
      .toDF("id", "x", "y")
    val r = Curation.gateAgreementStats(docs,
      col("x") >= 10L, col("y") >= 10L).collect()(0)
    // confusion: both pass {1,2,4}, only_a {5}, both fail {3,6}
    assert(r.getLong(0) === 6L && r.getLong(1) === 3L &&
      r.getLong(2) === 1L && r.getLong(3) === 0L && r.getLong(4) === 2L)
    // po = 5/6; pe = (4*3 + 2*3)/36 = 1/2; kappa = (po-pe)/(1-pe) = 2/3
    assert(r.getLong(5) === 833333L)
    assert(r.getLong(6) === 500000L)
    assert(r.getLong(7) === 666666L)

    // identical gates: kappa = 1e6 exactly (po = 1, pe < 1)
    val same = Curation.gateAgreementStats(docs,
      col("x") >= 10L, col("x") >= 10L).collect()(0)
    assert(same.getLong(7) === 1000000L)

    // complementary gates (always disagree): po = 0, kappa < 0 — and
    // the sign-aware division truncates toward zero like DuckDB
    val opp = Curation.gateAgreementStats(docs,
      col("x") >= 10L, col("x") < 10L).collect()(0)
    assert(opp.getLong(5) === 0L)
    assert(opp.getLong(7) < 0L)
  }

  // ===== dedup-aware epoch plan ============================================

  test("dedupAwareEpochPlan: dup share and per-source plan shift") {
    val docs = Seq(
      (1L, "web", "a b c d e f g h"),       // 8 tokens
      (2L, "web", "a b c d e f g h"),       // dup of 1 (removed)
      (3L, "books", "p q r s"),             // 4 tokens
      (4L, "books", "p q r s t u v w x y")) // 10 tokens
      .toDF("doc_id", "source", "text")
    val removed = Seq(2L).toDF("doc_id")
    val got = Curation.dedupAwareEpochPlan(docs, removed,
        budgetTokens = 100L, maxEpochsMilli = 100000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val web = got("web"); val books = got("books")
    assert(web.getLong(1) === 16L && web.getLong(2) === 8L)
    assert(web.getLong(3) === 500000L)       // half the tokens were dups
    assert(books.getLong(1) === 14L && books.getLong(2) === 14L)
    assert(books.getLong(3) === 0L)
    // naive plan: weights floor(sqrt(16))=4, floor(sqrt(14))=3, wsum 7
    //   web target 100*4/7=57 -> 57*1000/16 = 3562 milli-epochs
    assert(web.getLong(4) === 3562L)
    // unique plan: weights floor(sqrt(8))=2, floor(sqrt(14))=3, wsum 5
    //   web target 100*2/5=40 -> 40*1000/8 = 5000 milli-epochs
    assert(web.getLong(5) === 5000L)
    // a source with every doc removed keeps its row at zero
    val all = Curation.dedupAwareEpochPlan(docs,
        Seq(1L, 2L).toDF("doc_id"),
        budgetTokens = 100L, maxEpochsMilli = 100000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(all("web").getLong(2) === 0L && all("web").getLong(5) === 0L)
    assert(all("web").getLong(3) === 1000000L)
  }

  // ===== dedup-aware training shards =======================================

  test("dedupAwareTrainShards: per-shard naive vs elected mass") {
    val docs = Seq(
      (1L, "web", 50L), (2L, "web", 90L), (3L, "books", 90L), // cluster
      (4L, "web", 10L),                                       // singleton
      (10L, "web", 30L), (11L, "web", 30L))                   // tie cluster
      .toDF("doc_id", "source", "n_chars")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "component")
    val got = Curation.dedupAwareTrainShards(docs, comps, nShards = 4)
      .collect()
    // shard totals recover the corpus and the election exactly
    assert(got.map(_.getLong(1)).sum === 6L)       // n_docs
    assert(got.map(_.getLong(2)).sum === 3L)       // n_kept = 3 components
    assert(got.map(_.getLong(3)).sum === 300L)     // n_chars
    assert(got.map(_.getLong(4)).sum === 90L + 10L + 30L) // kept_chars
    got.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "kept > docs in a shard")
      assert(r.getLong(4) <= r.getLong(3), "kept chars > chars")
      val (nc, kc, share) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(share === (nc - kc) * 1000000L / math.max(nc, 1L))
    }
  }

  // ===== training-order curriculum audit ===================================

  test("shardOrderQualityAudit: buckets partition each shard; means exact") {
    val docs = (0L until 200L).map(i =>
      (i, s"src${i % 3}", "the of and to a quick brown fox " * 4))
      .toDF("doc_id", "source", "text")
    val got = Curation.shardOrderQualityAudit(docs, nShards = 4)
      .collect()
    // every doc lands in exactly one (shard, bucket) cell
    assert(got.map(_.getLong(2)).sum === 200L)
    assert(got.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 4))
    assert(got.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    // identical texts → identical per-doc q4 → every cell mean equals
    // it exactly (the integer-mean convention: sum div count)
    val means = got.map(_.getLong(3)).distinct
    assert(means.length === 1, s"flat corpus must have flat means: $means")
  }

  // ===== PII scrub-effectiveness gate ======================================

  test("scrubResidualAudit: residual is zero and before-counts match " +
      "the injection schedule") {
    val docs = (1L to 100L).map(i => (i, s"src${i % 2}", "plain text"))
      .toDF("doc_id", "source", "text")
    val got = Curation.scrubResidualAudit(
        Curation.injectSyntheticPii(docs))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got.keySet === Set("src0", "src1"))
    val all = got.values
    assert(all.map(_._1).sum === 100L)
    // ids 7,14,...,98 carry an email (14 of them); 11..99 a phone (9);
    // 13..91 a key (7)
    assert(all.map(_._2).sum === 14L)
    assert(all.map(_._3).sum === 9L)
    assert(all.map(_._4).sum === 7L)
    // the gate: nothing survives the scrub
    assert(all.map(_._5).sum === 0L,
      "scrubbed text still matches a PII pattern")
  }

  // ===== 3-way decontamination agreement cube ==============================

  test("decontamAgreementCube: cells partition the corpus; bloom has " +
      "no false negatives") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon shared with the benchmark"),
      (2L, "totally different words with no overlap at all here"),
      (3L, "more unrelated text that the filter should never flag"))
      .toDF("doc_id", "text")
    val sem = Seq((2L, 1L)).toDF("doc_id", "f_semantic") // paraphrase
    val got = Curation.decontamAgreementCube(corpus, bench, sem,
        n = 5, hash = graft.ext.Dedup.OracleHash)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // doc 1: exact hit (and therefore bloom); doc 2: semantic-only;
    // doc 3: clean
    assert(got((1L, 1L, 0L))._1 === 1L)
    assert(got((0L, 0L, 1L))._1 === 1L)
    assert(got((0L, 0L, 0L))._1 === 1L)
    // cells partition the corpus; shares sum to ~1e6
    assert(got.values.map(_._1).sum === 3L)
    // the theorem: no exact-but-not-bloom cell can exist
    assert(!got.keySet.exists(k => k._1 === 1L && k._2 === 0L),
      "bloom produced a false negative")
  }

  // ===== contamination escape through dedup election ========================

  test("contamEscapeStats: flagged non-rep member escapes, flagged rep " +
      "is caught, election tie-breaks by id") {
    val docs = Seq(
      (1L, 10L, "sA"), (2L, 5L, "sA"),  // comp 1: rep=1, member 2 flagged
      (3L, 8L, "sB"), (4L, 9L, "sB"),   // comp 3: rep=4 flagged
      (5L, 7L, "sA"),                   // clean singleton
      (6L, 7L, "sB"), (7L, 7L, "sB"))   // comp 6: pref tie -> rep=6 (id ASC)
      .toDF("doc_id", "n_chars", "source")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L),
      (6L, 6L), (7L, 6L)).toDF("doc_id", "component")
    val flags = Seq(2L, 4L, 7L).toDF("doc_id")
    val got = Curation.contamEscapeStats(docs, comps, flags,
        col("n_chars")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // sA: comp1 (escape: member 2 flagged, rep 1 clean) + singleton 5
    assert(got("sA") === ((2L, 1L, 0L, 1L, 1L)))
    // sB: comp3 rep flagged (caught), comp6 member 7 escapes past rep 6
    assert(got("sB") === ((2L, 2L, 1L, 1L, 1L)))
  }

  // ===== repeat-exposure bands ==============================================

  test("repeatExposure: bands reconcile with the plan; stale fires only " +
      "past the threshold") {
    val docs = Seq(
      ("sX", ("a " * 10).trim),    // tiny source -> capped at 8 epochs
      ("sY", ("b " * 1000).trim))  // big source -> budget-bound epochs
      .toDF("source", "text")
    val got = Curation.repeatExposure(docs, budgetTokens = 5000L,
        maxEpochsMilli = 8000L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // sX: w=3, wsum=34 -> target 441 -> epochs cap 8000; views 80 =
    // 10 fresh + 30 repeat (epochs 1..4) + 40 stale (epochs 4..8)
    assert(got("sX") === ((10L, 8000L, 80L, 10L, 30L, 40L, 500000L)))
    // sY: budget-bound between the stale threshold and the cap
    val (ny, ey, ty, fy, ry, sy, _) = got("sY")
    assert(ny === 1000L && ey > 4000L && ey < 8000L && sy > 0L)
    got.values.foreach { case (_, _, t, f, r, s0, _) =>
      assert(f + r + s0 === t, "bands must partition total views") }
    assert(fy + ry + sy === ty)
  }

  // ===== preference-pair mining =============================================

  test("preferencePairs: top-vs-bottom within the length-band block, " +
      "gap floor enforced") {
    // all three docs land in the same (source, band) block: 100 tokens
    val hiQ = (1L, "s", ("the of and to a in is it you that " * 10).trim)
    val loQ = (2L, "s", ("zzz. " * 100).trim)  // punct-saturated -> q 0
    val midQ = (3L, "s", ("zzz " * 100).trim)  // no stops -> q 0.25
    val docs = Seq(hiQ, loQ, midQ).toDF("doc_id", "source", "text")
    val got = Curation.preferencePairs(docs, m = 2, bandTokens = 50L,
        minGapMicro = 100000L).collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(6)).toMap
    // hi {1 (1.0), 3 (0.25)} x lo {2 (0.0), 3 (0.25)} minus the
    // sub-gap 3-3 pair
    assert(got === Map((1L, 2L) -> 1000000L, (1L, 3L) -> 750000L,
      (3L, 2L) -> 250000L))
  }

  // ===== filter-ordering advisor ============================================

  test("gateOrderAdvisor: one aggregate, rows in ascending-pass order") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("x")
    val got = Curation.gateOrderAdvisor(df, Seq(
      "ge_2" -> (col("x") >= 2),
      "even" -> (col("x") % 2 === 0),
      "lt_10" -> (col("x") < 10))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("even", 4L, 2L, 500000L),   // most selective first
      ("ge_2", 4L, 3L, 750000L),
      ("lt_10", 4L, 4L, 1000000L)))
  }

  // ===== election-policy uplift =============================================

  test("electionQualityUplift: keep-best vs min-id means on a value the " +
      "election never saw") {
    val docs = Seq(
      (1L, "s", 10L, 100L), (2L, "s", 20L, 900L), // comp 1: best=2, min=1
      (3L, "s", 5L, 400L))                        // singleton
      .toDF("doc_id", "source", "n_chars", "v")
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "component")
    val row = graft.ext.Dedup.electionQualityUplift(docs, comps,
      col("n_chars"), col("v")).collect().head
    assert((row.getString(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) === (("s", 2L, 650L, 250L, 400L)))
  }

  // ===== reshard stability ==================================================

  test("reshardStability: HRW moves ~(to-from)/to of keys, mod-hash moves " +
      "most; both partitioning-invariant") {
    val docs = spark.range(0, 500).toDF("doc_id")
    val got = Curation.reshardStability(docs, from = 8, to = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (hrwMoved, hrwMicro) = got("hrw")
    val (modMoved, modMicro) = got("mod")
    // HRW near the 20% theoretical minimum, mod-hash near 1 - 1/lcm
    assert(hrwMicro > 100000L && hrwMicro < 350000L, s"hrw=$hrwMicro")
    assert(modMicro > 600000L, s"mod=$modMicro")
    assert(hrwMoved < modMoved)
    val re = Curation.reshardStability(docs.repartition(7), 8, 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(re("hrw") === hrwMoved && re("mod") === modMoved)
  }

  // ===== stage-lineage fingerprints =========================================

  test("stageLineage: monotone funnel; fingerprints are partitioning-" +
      "invariant and localize to the filtered set") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val gates = Seq("ge_2" -> (col("doc_id") >= 2),
      "even" -> (col("doc_id") % 2 === 0))
    val got = Curation.stageLineage(df, gates).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._3).toSeq === Seq(4L, 3L, 2L))
    assert(got.map(_._2).toSeq === Seq("input", "ge_2", "even"))
    // the receipt property: a different partitioning yields the SAME fps
    val re = Curation.stageLineage(df.repartition(7), gates).collect()
      .map(r => r.getLong(3))
    assert(re.toSeq === got.map(_._4).toSeq)
    // the last stage's fp equals the input fp of the pre-filtered frame
    val direct = Curation.stageLineage(
      df.filter(col("doc_id") >= 2 && col("doc_id") % 2 === 0),
      Seq("all" -> lit(true))).collect().head.getLong(3)
    assert(direct === got.last._4)
  }

  // ===== in-batch contrastive false negatives ===============================

  test("falseNegativeSweep: single-batch row is exact; split batches " +
      "conserve invariants") {
    val docs = (1L to 8L).map(i => Tuple1(i)).toDF("doc_id")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "component")
    val got = Curation.falseNegativeSweep(docs, comps, Seq(2, 8))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // B=8 -> one batch of 8: 28 pairs, the two dup pairs are in-batch
    assert(got(8L) === ((1L, 28L, 2L, 2L * 1000000L / 28L)))
    // B=2 -> 4 hash batches: pair totals bounded by the batch split
    val (nb2, pairs2, fn2, rate2) = got(2L)
    assert(nb2 === 4L && pairs2 >= 4L && pairs2 <= 28L && fn2 <= 2L)
    assert(rate2 === fn2 * 1000000L / math.max(pairs2, 1L))
  }

  test("falseNegativeSweep: lazy to build (zero jobs), one corpus pass " +
      "regardless of |sizes|, empty input keeps the row-per-size shape") {
    val docs = (1L to 8L).map(i => Tuple1(i)).toDF("doc_id")
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "component")
    // laziness: constructing the frame must run NOTHING (the pre-fuse
    // version ran an eager docs.count() at plan-construction time)
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val frame = Curation.falseNegativeSweep(docs, comps, Seq(2, 4, 8))
      Thread.sleep(300) // let any async job-start events drain
      assert(jobs === 0, "building the sweep frame must not launch jobs")
      frame.collect()
    } finally spark.sparkContext.removeSparkListener(listener)
    // plan shape: the number of scans of the docs relation is constant
    // in |sizes| (pre-fuse: 2 corpus aggregates PER size)
    def docLeaves(sizes: Seq[Int]): Int =
      Curation.falseNegativeSweep(docs, comps, sizes)
        .queryExecution.analyzed.collectLeaves().size
    assert(docLeaves(Seq(2, 4)) === docLeaves(Seq(2, 4, 8, 16, 32, 64)))
    // empty input: one row per size, n_batches = 1, zero pairs
    val empty = docs.filter(col("doc_id") < 0L)
    val rows = Curation.falseNegativeSweep(empty, comps, Seq(2, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq((2L, 1L, 0L, 0L, 0L), (8L, 1L, 0L, 0L, 0L)))
  }
}
