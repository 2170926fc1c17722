package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A deliberately broken query must surface in the round artifacts —
  * errors.json AND a `_verify_error` marker parquet — never vanish
  * (round-5 lesson: 26 silent skips read as an 87-green report). */
class VerifySpec extends SparkSpec {

  test("failed query lands in errors.json and a marker parquet; good query unaffected") {
    val outDir = Files.createTempDirectory("graft-verify-spec").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "good_query" -> ((s, _) => { import s.implicits._; Seq(1, 2).toDF("x") }),
      "broken_query" -> ((s, _) => s.read.parquet("/nonexistent/boom.parquet")))
    val failures = Verify.run(spark, "/unused", outDir, queries,
      Map("good_query" -> "SELECT 1 AS x"))

    assert(failures.keySet === Set("broken_query"))

    val errJson = Files.readString(Paths.get(s"$outDir/errors.json"))
    assert(errJson.contains("broken_query"))

    // marker parquet: driver's compare sees a loud mismatch, not absence
    val marker = spark.read.parquet(s"$outDir/broken_query")
    assert(marker.columns.toSeq === Seq("_verify_error"))
    assert(marker.count() === 1)

    val good = spark.read.parquet(s"$outDir/good_query")
    assert(good.select("x").collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))

    val oracle = Files.readString(Paths.get(s"$outDir/oracle_sql.json"))
    assert(oracle.contains("good_query"))
  }

  test("clean run writes an empty errors.json object") {
    val outDir = Files.createTempDirectory("graft-verify-spec").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok" -> ((s, _) => { import s.implicits._; Seq(1).toDF("x") }))
    val failures = Verify.run(spark, "/unused", outDir, queries, Map.empty)
    assert(failures.isEmpty)
    assert(Files.readString(Paths.get(s"$outDir/errors.json")) === "{}")
  }

  test("forensics mode writes canon text + manifest hashes beside the dumps") {
    val outDir = Files.createTempDirectory("graft-verify-spec").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok" -> ((s, _) => { import s.implicits._
        Seq((2L, 0.25, "b"), (1L, 0.1234567, null))
          .toDF("z_key", "val", "a_name") }))
    Verify.run(spark, "/unused", outDir, queries, Map.empty,
      forensics = true)
    val canon = Files.readString(Paths.get(s"$outDir/ok_canon.txt"))
    // columns sorted by NAME (a_name, val, z_key), floats at 6 dp,
    // null → None, rows sorted — the check_oracle.py canon contract
    assert(canon === "None0.1234571\nb0.2500002")
    val manifest = Files.readString(Paths.get(s"$outDir/manifest.json"))
    assert(manifest.contains("\"ok\""))
    // the hash is of the canon text exactly (diffable attribution)
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    assert(manifest.contains(d))
  }

  test("canonRows pins format details the manifest depends on") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.5), true, java.sql.Date.valueOf("2026-01-02")))
      .toDF("arr", "flag", "d")
    assert(Verify.canonRows(df) ===
      Seq("[1.000000, 2.500000]2026-01-02True"))
  }

  test("Bench warmup degrades per-table on a bogus sfDir instead of throwing") {
    // every loader fails against a nonexistent dir — the run must
    // survive and report all five failures (BENCH_r05 was lost to one
    // loader throwing OUTSIDE any try/catch)
    val failed = Bench.warmTables(spark, "/nonexistent/sfdir")
    assert(failed.toSet ===
      Set("events", "documents", "embeddings", "lineitem", "orders"))
    // and against real testdata nothing fails
    assert(Bench.warmTables(spark, "/root/testdata/sf0.001") === Nil)
    spark.catalog.clearCache() // don't leak the warm cache into other suites
  }
}
