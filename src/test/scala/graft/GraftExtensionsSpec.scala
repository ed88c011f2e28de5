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

      // int arrays implicitly cast to double (not silently misread)
      val dotInt = s2.sql("SELECT vec_dot(array(1, 2), array(3, 4)) AS d")
        .collect()(0).getDouble(0)
      assert(dotInt == 11.0)

      // optimizer rule: size(array_intersect) rewrites to the merge walk
      // (non-foldable inputs — literals would be constant-folded away)
      val df = s2.range(5)
        .selectExpr("id", "sequence(0L, id) AS a", "sequence(id, 6L) AS b")
        .selectExpr("id", "size(array_intersect(a, b)) AS n")
      assert(df.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("sortedintersectcount"),
        df.queryExecution.optimizedPlan.toString)
      // a = [0..id], b = [id..6] → exactly one common element (id)
      assert(df.collect().forall(r => r.getInt(1) == 1))

      // wrong arity → clean analysis error naming the function, never a
      // silent extra-arg drop or IndexOutOfBoundsException
      for (bad <- Seq(
          "SELECT vec_dot(array(1.0D))",
          "SELECT vec_dot(array(1.0D), array(2.0D), array(3.0D))",
          "SELECT sorted_intersect_count(array(1L))")) {
        val e = intercept[org.apache.spark.sql.AnalysisException](s2.sql(bad).collect())
        assert(e.getMessage.toLowerCase.contains("parameter"), e.getMessage)
      }
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
