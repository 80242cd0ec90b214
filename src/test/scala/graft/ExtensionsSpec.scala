package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.RollingHash

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers rolling_hash without error") {
    // Full install needs a fresh SparkSession (extensions apply at
    // build time); here we verify the injection wiring itself.
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("rolling_hash evaluates identically through SQL and the Column API") {
    val sess = spark.newSession()
    sess.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    val viaSql = sess.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    assert(viaSql === RollingHash.hashBytes("abc".getBytes("UTF-8")))
    import sess.implicits._
    val viaColumn = Seq("abc").toDF("t")
      .select(RollingHash($"t")).head().getLong(0)
    assert(viaColumn === viaSql)
  }
}
