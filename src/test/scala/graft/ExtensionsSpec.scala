package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.RollingHash

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers rolling_hash without error") {
    // Full install needs a fresh SparkSession (extensions apply at
    // build time); here we verify the injection wiring itself.
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("dot_product evaluates identically through SQL and the Column API") {
    val sess = spark.newSession()
    sess.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => functions.DotProduct(exprs(0), exprs(1)), "built-in")
    val viaSql = sess.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(viaSql === 32.0)
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val viaColumn = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(functions.DotProduct(col("a"), col("b"))).head().getDouble(0)
    assert(viaColumn === viaSql)
  }

  test("char_entropy evaluates identically through SQL and the Column API") {
    val sess = spark.newSession()
    sess.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy", exprs => functions.CharEntropy(exprs.head), "built-in")
    val viaSql = sess.sql("SELECT char_entropy('aab').n_chars AS n").head().getLong(0)
    assert(viaSql === 3L)
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val viaColumn = Seq("aab").toDF("t")
      .select(functions.CharEntropy(col("t")).getField("n_chars")).head().getLong(0)
    assert(viaColumn === viaSql)
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
