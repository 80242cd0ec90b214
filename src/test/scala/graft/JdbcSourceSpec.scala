package graft

import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** Drives [[graft.sources.Jdbc]] against a REAL embedded database —
  * Derby ships with Spark's jars, so the passthrough is exercised over
  * an actual JDBC wire, not a mock: contents, remote-SQL pushdown, and
  * the range-partitioned parallel-ingest shape.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // one-time seed: an "operational system" table of 100 rows. The
  // in-memory DB lives for the JVM, so tolerate a re-created table.
  private lazy val seeded: Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    withConn { c =>
      val st = c.createStatement()
      try st.execute(
        "CREATE TABLE ops_customer (c_id INT PRIMARY KEY, c_name VARCHAR(32), c_balance DOUBLE)")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => // exists
        st.execute("DELETE FROM ops_customer")
      }
      val ps = c.prepareStatement("INSERT INTO ops_customer VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"name_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    }
  }

  test("read pulls a remote table with full contents") {
    seeded
    val df = Jdbc.read(spark, url, "ops_customer")
    assert(df.count() === 100)
    val r = df.filter(col("C_ID") === 7).head()
    assert(r.getAs[String]("C_NAME") === "name_7")
    assert(r.getAs[Double]("C_BALANCE") === 10.5)
  }

  test("filters push down into the remote scan") {
    seeded
    val df = Jdbc.read(spark, url, "ops_customer").filter(col("C_ID") < 10)
    assert(df.count() === 9)
    val scan = df.queryExecution.executedPlan.toString
    // the JDBC scan node advertises the filter it shipped to the DB
    assert(scan.contains("PushedFilters") && scan.contains("C_ID"),
      s"filter not pushed into JDBC scan:\n$scan")
  }

  test("readPartitioned stripes the table across numPartitions tasks") {
    seeded
    val df = Jdbc.readPartitioned(spark, url, "ops_customer",
      partitionCol = "C_ID", lower = 1L, upper = 100L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    // stripes cover the whole table, no row lost or duplicated
    assert(df.count() === 100)
    assert(df.select(countDistinct(col("C_ID"))).head().getLong(0) === 100)
  }

  test("write batches rows back to the operational system") {
    seeded
    import spark.implicits._
    val out = Seq((1001, "alice", 9.75), (1002, "bob", 3.25))
      .toDF("c_id", "c_name", "c_balance")
      .repartition(1) // result-sized → one connection
    Jdbc.write(out, url, "ops_export",
      mode = org.apache.spark.sql.SaveMode.Overwrite, batchSize = 500)
    val back = Jdbc.read(spark, url, "ops_export")
    assert(back.count() === 2)
    assert(back.filter(col("c_id") === 1001).head().getAs[String]("c_name") === "alice")
    // append mode accumulates instead of replacing
    Jdbc.write(out.filter(col("c_id") === 1001), url, "ops_export")
    assert(Jdbc.read(spark, url, "ops_export").count() === 3)
  }

  test("readQuery ships SQL to the remote engine and reads only its result") {
    seeded
    val df = Jdbc.readQuery(spark, url,
      "SELECT c_name, c_balance FROM ops_customer WHERE c_id <= 3")
    assert(df.count() === 3)
    assert(df.columns.map(_.toUpperCase).toSeq === Seq("C_NAME", "C_BALANCE"))
  }
}
