package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSuite {

  test("custom expressions are SQL-callable via SparkSessionExtensions") {
    // spin a sibling session (same context) with the extensions applied
    val base = spark // force shared context init
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val dot = s2.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(dot == 11.0)
      val n = s2.sql(
        "SELECT sorted_intersect_count(array(1L, 3L, 7L), array(3L, 5L, 7L)) AS n")
        .collect()(0).getLong(0)
      assert(n == 2L)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
