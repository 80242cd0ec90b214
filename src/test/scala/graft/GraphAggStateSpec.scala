package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.warehouse.AggState

/** PageRank (operators.PageRank) and mergeable aggregate state
  * (warehouse.AggState): hand-checked values, conservation/monoid
  * invariants, and partitioning-independence — the properties the
  * q125/q126 oracles can't see (they pin one dataset; these pin the
  * algebra).
  */
class GraphAggStateSpec extends SparkSpec {
  import spark.implicits._

  // --- PageRank -----------------------------------------------------------

  test("pagerank: symmetric 2-cycle is uniform at every iteration") {
    // two nodes, one undirected edge: each node forwards its whole
    // rank, so r stays exactly (1-d)/2 + d/2 = 1/2
    val edges = PageRank.undirected(Seq((1L, 2L)).toDF("src", "dst"))
    val r = PageRank.run(edges, iters = 3).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set(1L, 2L))
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
  }

  test("pagerank: star center outranks leaves; total mass conserved") {
    // undirected star 0-{1,2,3,4}: hub collects 4 full leaf ranks,
    // leaves split the hub's — the canonical centrality sanity check
    val edges = PageRank.undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst"))
    val r = PageRank.run(edges, iters = 10).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(1L) * 2, s"hub ${r(0L)} should dominate leaf ${r(1L)}")
    assert((1L to 4L).forall(i => math.abs(r(i) - r(1L)) < 1e-12), "leaves symmetric")
    // no dangling mass on a symmetrized graph: Σr = 1 exactly (up to
    // the decimal(28,18) contribution quantum)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass ${r.values.sum}")
  }

  test("pagerank: one hand-computed iteration on a path graph") {
    // path 1-2-3 undirected, d=0.85, N=3, r0=1/3 each; deg(2)=2, deg(1)=deg(3)=1.
    // r1(1) = 0.15/3 + 0.85*(r0(2)/2)         = 0.05 + 0.85/6
    // r1(2) = 0.15/3 + 0.85*(r0(1) + r0(3))   = 0.05 + 0.85*2/3
    val edges = PageRank.undirected(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val r = PageRank.run(edges, iters = 1).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - (0.05 + 0.85 * (1.0 / 3) / 2)) < 1e-12)
    assert(math.abs(r(2L) - (0.05 + 0.85 * (2.0 / 3))) < 1e-12)
    assert(r(1L) === r(3L))
  }

  test("pagerank: ranks are partitioning-independent (decimal-summed contributions)") {
    val es = (1L to 40L).map(i => (i, i % 7 + 100L))
    def ranks(parts: Int) = {
      val e = PageRank.undirected(es.toDF("src", "dst").repartition(parts))
      PageRank.run(e, iters = 4).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    }
    assert(ranks(1) === ranks(13)) // exact ==, not approx: the determinism contract
  }

  // --- Triangles ----------------------------------------------------------

  test("triangles: oriented forward count matches brute force on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 8 + trial * 2
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      val adj = edges.toSet
      val brute = (for {
        a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if adj((a, b)) && adj((b, c)) && adj((a, c))
      } yield Seq(a, b, c)).flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = graft.operators.Triangles.perNode(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute, s"trial $trial: $got vs $brute")
    }
  }

  test("triangles: a complete K5 gives every node C(4,2)=6 triangles") {
    val edges = for { a <- 0L until 5L; b <- (a + 1) until 5L } yield (a, b)
    val got = graft.operators.Triangles.perNode(edges.toSeq.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until 5L).map(_ -> 6L).toMap)
  }

  // --- AggState -----------------------------------------------------------

  private def raw = Seq(
    ("a", 1.25), ("a", 2.50), ("a", -3.00), ("b", 10.00), ("b", 0.01), ("c", 7.77),
  ).toDF("k", "v")

  test("aggstate: merge(build(old), build(delta)) == build(all) bit for bit") {
    val old = raw.filter(col("v") > 0)
    val delta = raw.filter(col("v") <= 0)
    val merged = AggState.merge(
      AggState.build(old, Seq("k"), "v"), AggState.build(delta, Seq("k"), "v"), Seq("k"))
    val direct = AggState.build(raw, Seq("k"), "v")
    val m = AggState.withAvg(merged).orderBy("k").collect().toSeq
    val d = AggState.withAvg(direct).orderBy("k").collect().toSeq
    assert(m === d)
  }

  test("aggstate: disjoint groups pass through and merge is associative") {
    val a = AggState.build(Seq(("x", 1.0)).toDF("k", "v"), Seq("k"), "v")
    val b = AggState.build(Seq(("y", 2.0), ("y", 4.0)).toDF("k", "v"), Seq("k"), "v")
    val c = AggState.build(Seq(("x", 3.0)).toDF("k", "v"), Seq("k"), "v")
    val left = AggState.merge(AggState.merge(a, b, Seq("k")), c, Seq("k"))
    val right = AggState.merge(a, AggState.merge(b, c, Seq("k")), Seq("k"))
    assert(left.orderBy("k").collect().toSeq === right.orderBy("k").collect().toSeq)
    val x = left.filter(col("k") === "x").collect().head
    assert(x.getLong(1) === 2L && x.getDecimal(2).doubleValue === 4.0)
  }

  test("aggstate: merge refuses mismatched state schemas") {
    val good = AggState.build(raw, Seq("k"), "v")
    intercept[IllegalArgumentException] {
      AggState.merge(good, good.drop("vmax"), Seq("k"))
    }
  }

  // --- HistState ----------------------------------------------------------

  import graft.warehouse.HistState

  private def vals = (0 until 200).map(i => ("g" + (i % 2), (i * 7 % 100).toDouble))
    .toDF("k", "v")

  test("histstate: merge(build(old), build(delta)) == build(all) bit for bit") {
    val old = vals.filter(col("v") < 30)
    val delta = vals.filter(col("v") >= 30)
    val merged = HistState.merge(
      HistState.build(old, Seq("k"), "v", 0, 100, 20),
      HistState.build(delta, Seq("k"), "v", 0, 100, 20), Seq("k"))
    val direct = HistState.build(vals, Seq("k"), "v", 0, 100, 20)
    assert(merged.orderBy("k", "bin").collect().toSeq
      === direct.orderBy("k", "bin").collect().toSeq)
  }

  test("histstate: quantile estimate is within one bin width of the exact percentile") {
    val st = HistState.build(vals, Seq("k"), "v", 0, 100, 20)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val est = HistState.quantile(st, Seq("k"), 0, 100, 20, p)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exact = vals.groupBy("k").agg(expr(s"percentile(v, $p)").as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (k, e) =>
        assert(math.abs(est(k) - e) <= 5.0 + 1e-9, s"p=$p k=$k est=${est(k)} exact=$e")
      }
    }
  }

  test("histstate: out-of-range values clamp into edge bins, totals preserved") {
    val df = Seq(("g", -50.0), ("g", 25.0), ("g", 999.0)).toDF("k", "v")
    val st = HistState.build(df, Seq("k"), "v", 0, 100, 10)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(st === Map(0 -> 1L, 2 -> 1L, 9 -> 1L))
  }

  test("histstate: merge refuses mismatched state schemas") {
    val good = HistState.build(vals, Seq("k"), "v", 0, 100, 20)
    intercept[IllegalArgumentException] {
      HistState.merge(good, good.drop("cnt"), Seq("k"))
    }
  }

  // --- HLL distinct state (q136) ------------------------------------------

  test("hll state: union of per-day sketches equals the direct sketch, near exact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val unioned = ev.groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val u = unioned.orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val d = direct.orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(u.toSeq === d.toSeq) // register-wise max == direct build, exactly
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    u.foreach { case (k, est) =>
      assert(math.abs(est.toDouble - exact(k)) / exact(k) < 0.05,
        s"$k: est=$est exact=${exact(k)}")
    }
  }
}
