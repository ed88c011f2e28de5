package graft

import org.apache.spark.sql.SparkSession

/** Manual surface drive: `sbt "Test/runMain graft.SqlDemo"` — the SQL
  * front door: session built with GraftExtensions, tables registered,
  * custom functions called from plain SQL. */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    new graft.engine.Grapefruit(spark, "/tmp/graft-sqldemo")
      .registerTables("/root/testdata/sf0.001")

    println("== custom expressions from SQL ==")
    spark.sql("SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS dot, " +
      "vec_dot(array(1,2), array(3,4)) AS dot_int_cast, " +
      "sorted_intersect_count(array(1L,3L,7L), array(3L,5L,7L)) AS inter").show()

    println("== engine tables from SQL ==")
    spark.sql("""SELECT l_returnflag, count(*) AS n,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
                 FROM lineitem GROUP BY 1 ORDER BY 1""").show()

    println("== optimizer rule: size(array_intersect) -> merge walk ==")
    val rw = spark.range(3)
      .selectExpr("id", "sequence(0L, id) AS a", "sequence(id, 4L) AS b")
      .selectExpr("id", "size(array_intersect(a, b)) AS n")
    println("optimized plan contains sortedintersectcount: " +
      rw.queryExecution.optimizedPlan.toString.toLowerCase.contains("sortedintersectcount"))
    rw.show()

    println("== custom function over a real embedding column ==")
    spark.sql("""SELECT vec_id,
                 vec_dot(transform(embedding, x -> CAST(x AS DOUBLE)),
                         transform(embedding, x -> CAST(x AS DOUBLE))) AS norm2
                 FROM embeddings ORDER BY vec_id LIMIT 3""").show()
    spark.stop()
  }
}
