package graft

/** Every registered query runs end-to-end on sf0.001 and the driver
  * contract holds (names aligned, oracles keyed by query names).
  */
class RegistrySmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle keys are a subset") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} executes on sf0.001 with a nonempty schema") {
      val df = q.fn(spark, sf)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
