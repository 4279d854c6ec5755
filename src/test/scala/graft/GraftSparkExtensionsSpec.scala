package graft

import graft.SparkSpec

class GraftSparkExtensionsSpec extends SparkSpec {

  test("float_vec_cosine is callable from SQL after registration") {
    GraftSparkExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_vec_cosine(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("extensions class injects on a fresh session builder") {
    // the class itself must be instantiable by spark.sql.extensions
    val ext = new GraftSparkExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // must not throw
    assert(GraftSparkExtensions.functions.nonEmpty)
  }
}
