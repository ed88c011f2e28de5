package graft

import graft.engine.Grapefruit

/** The whole engine is reachable from plain spark.sql once the tables
  * are registered — an analytics engine needs a SQL front door. */
class SqlSurfaceSpec extends SparkSuite {

  test("registerTables exposes every driver table to spark.sql") {
    val gf = new Grapefruit(spark,
      java.nio.file.Files.createTempDirectory("graft-sql").toString)
    gf.registerTables("/root/testdata/sf0.001")
    val rows = spark.sql("""
      SELECT r_name, count(*) AS n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
  }
}
