package graft

import graft.ext.Profiling
import graft.io.Sinks

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile emits one stats row per column from a single pass") {
    val df = Seq((1.0, 10L), (2.0, 20L), (4.0, 20L))
      .toDF("a", "b")
      .unionByName(Seq((Option.empty[Double], Option(30L)))
        .toDF("a", "b"))
    val got = Profiling.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) === 4L)      // n
    assert(a.getLong(2) === 1L)      // n_null
    assert(a.getLong(3) === 3L)      // n_distinct (nulls excluded)
    assert(a.getDouble(4) === 1.0 && a.getDouble(5) === 4.0)
    assert(a.getDouble(6) === 2.3333) // trunc4 of 7/3
    assert(got("b").getLong(3) === 3L)
  }

  test("fileUri leaves scheme-qualified paths alone and prefixes bare paths") {
    assert(Sinks.fileUri("hdfs://nn:8020/x") === "hdfs://nn:8020/x")
    assert(Sinks.fileUri("file:///x") === "file:///x")
    assert(Sinks.fileUri("/tmp/x") === "file:///tmp/x")
  }
}
