package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.privacy.PrivacyEngine
import graft.warehouse.Merge

/** Property-based checks (SURVEY.md §5): algebraic laws that must hold
  * for arbitrary inputs, not just the hand-picked fixtures.
  */
object GraftProps extends Properties("graft") {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val batchGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(1, 10), Gen.alphaStr.map(_.take(5))))

  property("upsert is idempotent and keys stay unique") =
    Prop.forAll(batchGen, batchGen) { (t, i) =>
      val target = t.toDF("id", "v").dropDuplicates("id")
      val incoming = i.toDF("id", "v").dropDuplicates("id")
      val once = Merge.upsert(target, incoming, Seq("id"))
      val twice = Merge.upsert(once, incoming, Seq("id"))
      // set compare via collect: exceptAll trips a Spark internal error
      // on empty LocalRelation inputs (not an engine path)
      val a = once.collect().map(_.toSeq).toSet
      val b = twice.collect().map(_.toSeq).toSet
      a == b && once.select("id").distinct().count() == a.size
    }

  property("suppression leaves no group below k") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(1, 6)), Gen.choose(2, 5)) { (qis, k) =>
      val df = qis.map(q => (s"g$q", 1)).toDF("qi", "x")
      val out = PrivacyEngine.suppress(df, Seq("qi"), k)
      out.isEmpty ||
        out.groupBy("qi").count().agg(min("count")).head().getLong(0) >= k
    }

  property("laplace noise is clamped at zero for any epsilon") =
    Prop.forAll(Gen.choose(0.01, 2.0), Gen.choose(0L, 10000L)) { (eps, seed) =>
      val mn = spark.range(500)
        .select(Transforms.laplaceNoised(lit(100.0), eps, seed).as("v"))
        .agg(min("v")).head().getDouble(0)
      mn >= 0.0
    }

  property("keyed laplace noise is invariant to partitioning") =
    Prop.forAll(Gen.choose(1, 8), Gen.choose(0L, 1000L)) { (parts, salt) =>
      def noised(p: Int) = spark.range(50).repartition(p)
        .select(col("id"), Transforms.laplaceNoisedKeyed(lit(42.0), col("id"), 0.1, salt).as("n"))
      noised(1).join(noised(parts).withColumnRenamed("n", "m"), "id")
        .filter(col("n") =!= col("m")).count() == 0
    }
}
