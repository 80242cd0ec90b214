package graft

import org.apache.spark.sql.functions._

/** Round-10 operator specs: the dbt generic-test constraint suite
  * (violating fixtures in every vocabulary slot), IVF index upsert,
  * PageRank convergence observability, and the bounded cache ledger.
  */
class RoundTenOpsSpec extends SparkSpec {
  import graft.warehouse.Quality
  import graft.warehouse.Quality.{Relationship, TableChecks}

  test("Quality.checks: each generic test counts its violations on a broken fixture") {
    import spark.implicits._
    // child: one dup composite key (rows 1&2), a null k2 row (exempt
    // from unique, caught by not_null), one bad status, two orphan FKs
    // (one null FK — exempt)
    val child = Seq(
      (1L, Option(10L), "O", Option(100L)),
      (1L, Option(10L), "O", Option(100L)),
      (2L, Option.empty[Long], "F", Option(999L)),
      (3L, Option(30L), "X", Option(888L)),
      (4L, Option(40L), "F", Option.empty[Long]),
    ).toDF("k1", "k2", "status", "fk")
    val parent = Seq(100L).toDF("pk")
    val out = Quality.checks(Seq(
      TableChecks("child", child,
        unique = Seq(Seq("k1", "k2")),
        notNull = Seq("k2"),
        acceptedValues = Seq("status" -> Seq("O", "F")),
        relationships = Seq(Relationship("fk", parent, "parent", "pk"))),
    )).collect().map(r => (r.getString(1), r.getString(2)) ->
      (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("unique", "k1,k2")) === ((1L, false)),
      "one surplus row beyond the first; the null-key row is exempt")
    assert(out(("not_null", "k2")) === ((1L, false)))
    assert(out(("accepted_values", "status")) === ((1L, false)))
    assert(out(("relationships", "fk->parent.pk")) === ((2L, false)),
      "two non-null orphans; the null FK is exempt")
  }

  test("Quality.checks: a clean table passes every constraint") {
    import spark.implicits._
    val t = Seq((1L, "a", "O"), (2L, "b", "F")).toDF("id", "name", "st")
    val p = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.checks(Seq(
      TableChecks("t", t,
        unique = Seq(Seq("id")),
        notNull = Seq("name"),
        acceptedValues = Seq("st" -> Seq("O", "F")),
        relationships = Seq(Relationship("id", p, "p", "pk"))),
    )).collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getLong(3) == 0L && r.getBoolean(4)),
      s"expected all pass, got ${out.mkString("; ")}")
  }
}
