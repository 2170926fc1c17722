package graft

/** The function-registration path: dot_product must resolve from SQL
  * text after GraftExtensions.register (the runtime form of the
  * SparkSessionExtensions injection — withExtensions only binds at
  * session construction, which the shared test session predates). */
class ExtensionsSpec extends SparkSpec {

  test("dot_product is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(v === 11.0)
  }

  test("word_shingles is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT word_shingles('a b c d', 3) AS s")
      .collect().head.getSeq[String](0)
    assert(v === Seq("a b c", "b c d"))
  }

  test("gram_stats is callable from SQL and counts totals/distinct/top") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT gram_stats('a b a b a b', 2) AS s")
      .selectExpr("s.n_grams", "s.n_distinct", "s.top_count")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5L, 2L, 3L)))
  }

  test("char_shingles is callable from SQL; kernel dedups, short and " +
      "empty strings yield the whole string") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT char_shingles('abab', 3) AS s")
      .collect().head.getSeq[String](0)
    assert(v === Seq("aba", "bab"))
    import graft.functions.TextFunctions.char_shingles
    import spark.implicits._
    val got = Seq("aaaa", "ab", "").toDF("t")
      .select(char_shingles(org.apache.spark.sql.functions.col("t"), 3))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("aaa"))        // dedup: one distinct window
    assert(got(1) === Seq("ab"))         // shorter than k -> whole string
    assert(got(2) === Seq(""))           // empty -> one empty gram
    // parity with the relational substring enumeration the oracle uses
    val doc = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(20).select(org.apache.spark.sql.functions.col("text"))
    val kernel = doc.select(org.apache.spark.sql.functions.explode(
        char_shingles(org.apache.spark.sql.functions.col("text"), 16)))
      .distinct().count()
    val hof = doc.selectExpr(
        "explode(transform(sequence(1, greatest(length(text) - 15, 1))," +
          " i -> substring(text, i, 16)))")
      .distinct().count()
    assert(kernel === hof)
  }

  test("word_shingles kernel: dedup order, ragged input, whitespace runs") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions.word_shingles
    import spark.implicits._
    val got = Seq(
      "a b a b a b",        // dedup keeps first occurrence order
      "  spaced \t out  ",  // mixed whitespace, leading/trailing
      "solo",               // fewer tokens than n
      "")                   // empty
      .toDF("t").select(word_shingles(col("t"), 2)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b", "b a"))
    assert(got(1) === Seq("spaced out"))
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq.empty)
  }

  test("word_shingles matches the interpreted HOF formulation on real docs") {
    import org.apache.spark.sql.functions.col
    import graft.ext.{Dedup, TextAnalysis}
    import graft.functions.TextFunctions.word_shingles
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val mismatches = docs.select(
        word_shingles(col("text"), 3).as("k"),
        Dedup.shingles(TextAnalysis.tokens(col("text")), 3).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(mismatches === 0)
  }
}
