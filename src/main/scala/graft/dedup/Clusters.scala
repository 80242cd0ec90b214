package graft.dedup

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster formation: connected components over the near-dup
  * pair graph — the canonical final step of dedup at scale (pairs say
  * who matches whom; the component says which rows are one document,
  * so curation can keep exactly one representative per component even
  * when A~B and B~C but A and C never paired directly).
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Every vertex starts labeled with itself; each round every vertex
  * takes the minimum of its own label, its neighbors' labels, and its
  * label's label (the pointer jump — chains shorten geometrically, the
  * same shortcutting idea as large-star/small-star, Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"); fixpoint = every
  * vertex carries its component's minimum id. Each round is two keyed
  * joins + one aggregate — all shuffle-bounded, nothing driver-side
  * except the scalar changed-count that decides convergence. Rounds:
  * O(log diameter); near-dup components are dense near-cliques, so
  * 2–3 rounds in practice, and maxIter=20 covers diameters far beyond
  * any real pair graph.
  */
object Clusters {

  /** (idCol, cluster_id) for every vertex; cluster_id = min id in the
    * vertex's connected component (vertices absent from `edges` are
    * their own singleton cluster).
    *
    * Lineage is cut EVERY round with an eager `localCheckpoint`: the
    * round's plan references the previous round ~4× (two joins over
    * derived views), so without truncation the logical plan grows
    * ~4^rounds and a deep chain-shaped component OOMs the driver while
    * Spark merely stringifies the plan. After the cut each round's
    * plan is a constant-size `LogicalRDD` leaf, so round cost is flat
    * at any diameter. The convergence count rides the checkpoint's own
    * materialization job as an observed metric — one job per round,
    * not a materialize + a recount.
    *
    * Fault tolerance: `localCheckpoint` stores each round's blocks on
    * executors with NO lineage fallback — losing any executor's blocks
    * mid-loop (decommission, OOM kill, dynamic deallocation) fails the
    * job permanently. Fine on a stable cluster or under
    * `spark.storage.decommission.enabled` block migration; for long
    * warehouse runs with routine executor churn, pass `checkpointDir`
    * (a durable FS path) to switch every round to a RELIABLE
    * checkpoint: blocks live in the shared filesystem and survive any
    * executor's death, at the cost of one extra lineage pass per round
    * (RDD reliable checkpoint recomputes once to write files) plus FS
    * I/O. Checkpoint files are cleaned by Spark's ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`,
    * otherwise they remain under `checkpointDir` for manual cleanup.
    */
  def connectedComponents(vertices: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = vertices.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // one round's lineage cut: constant-size LogicalRDD leaf either way
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    // symmetric edge list; self-loops add nothing to propagation. One
    // explode pass, NOT a union of the plan with its own reverse — the
    // union form materializes the (possibly expensive) edge-producing
    // subtree twice
    val sym = edges.select(explode(array(
        struct(col(srcCol).as("src"), col(dstCol).as("dst")),
        struct(col(dstCol).as("src"), col(srcCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // `labels` is always checkpoint-backed: a projection over a
    // LogicalRDD leaf, never the previous round's join tree
    var labels = cut(vertices.select(col(idCol).as("id"), col(idCol).as("label")))
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          col("label").as("prev"))
      // pointer-jump: additionally follow the label one hop
      // (label := label(label); labels are min-monotone so the hop
      // only ever decreases) — chains shorten geometrically, so a
      // path of length n converges in O(log n) rounds instead of n,
      // keeping maxIter=20 exact for any realistic component shape
      val jump = stepped.select(col("id").as("label"), col("label").as("jumped"))
      // per-round name is a deterministic function of the iteration
      // index (CacheManager dedupe is moot here: each round's plan is
      // a unique checkpoint leaf, never shared across queries).
      // NB: registering an Observation initializes the session's lazy
      // ObservationManager, which is non-transient and non-serializable
      // in Spark 4.1 — code that java-serializes the SparkSession in a
      // task closure (e.g. an MLlib model still carrying its training
      // summary) breaks afterwards. Our ML pipeline serves with
      // summary-free copies for exactly this reason (MlPipeline).
      val obs = Observation(s"graft_cc_changed_$it")
      val round = cut(stepped.join(jump, Seq("label"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("jumped"), col("label"))).as("label"),
          col("prev"))
        .observe(obs, count(when(col("label") =!= col("prev"), lit(1))).as("changed")))
      // the checkpoint action already ran the plan; `get` just waits
      // for its listener to deliver the accumulated metric
      val changed = obs.get("changed").asInstanceOf[Long]
      // previous round's checkpoint blocks: nothing references them
      // once `round` is materialized — drop eagerly rather than
      // waiting for the ContextCleaner, so peak storage is two rounds
      // of (id,label) rows regardless of diameter
      releaseCheckpoint(labels)
      labels = round.select("id", "label")
      converged = changed == 0
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: not converged after $maxIter rounds — labels may span partial components")
    sym.unpersist(blocking = false)
    // the final round's blocks stay (the caller's action reads them
    // directly — no lineage to replay); tracked so Dedup.clearCaches
    // releases them between corpora. A checkpointed RDD cannot
    // recompute, so clearCaches must only run once the labels are
    // consumed — which is its documented between-corpora contract.
    labels.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => Dedup.trackRdd(lr.rdd)
      case _ => ()
    }
    labels.select(col("id").as(idCol), col("label").as("cluster_id"))
  }

  /** Drop the checkpoint blocks backing `df` (a localCheckpoint'ed
    * round). Safe only when nothing will read the round again.
    */
  /** Drop a localCheckpoint's executor blocks once nothing references
    * it (also used by q280's greedy cover loop — any iterative
    * checkpoint-per-round loop wants this).
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Exact-duplicate edges (member → min-id representative of its text
    * group), keyed on fixed-width (xxhash64, length) like
    * [[Dedup.exactRepresentatives]] — a window over the hash groups,
    * no self-join on document bodies. Composes with near-dup pairs so
    * components span exact copies AND their near-duplicates.
    */
  def exactEdges(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol)), length(col(textCol)))
    df.select(col(idCol).as("src"), min(col(idCol)).over(w).as("dst"))
      .filter(col("src") =!= col("dst"))
  }
}
