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
}
