package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed connected components over an edge list — the clustering step
  * of near-duplicate deduplication: pairwise similarity edges (from LSH /
  * Jaccard / simhash candidates) → one cluster id per document, so a
  * pipeline can keep one representative per cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the min of its own label
  * and its neighbors' labels. Labels only ever decrease, so the global
  * label sum is a strictly-decreasing convergence witness — equality
  * between rounds proves a fixpoint without any change-detection join.
  * The sum is accumulated as DECIMAL(38,0) so the witness cannot overflow
  * at any node-id magnitude.
  *
  * Rounds needed = graph diameter. Near-dup graphs are dense small
  * clusters (diameter 2-3), so this converges in a handful of rounds; for
  * high-diameter graphs the alternating large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce and Beyond") drops
  * the bound to O(log² n) — same join shape, different propagation rule —
  * and would slot in behind this signature.
  *
  * Per round: one hash join on src + one hash aggregation on id — both
  * shuffle on the node key, no driver-side graph state. The driver loop
  * only compares two scalars per round.
  */
object ConnectedComponents {

  /** edges (src, dst), undirected, any multiplicity → (id, cluster) with
    * cluster = min node id in the component.
    *
    * Nodes = edge endpoints ∪ `nodes` (an optional one-column `id` frame).
    * Pass the full document set here when clustering for dedup: a document
    * with no similarity edge still needs a (singleton) cluster id, or a
    * pipeline keyed on this output would drop every unique document.
    * Isolated nodes never change label, so they are unioned in AFTER the
    * propagation loop (cluster = own id) rather than carried through every
    * round's join+agg — one left-anti join instead of O(iterations) extra
    * shuffle volume.
    *
    * Each round ends in `localCheckpoint(eager)`: an iterative DataFrame
    * that merely persists still NESTS the previous round's logical plan,
    * so analysis cost doubles per round and a 10-round chain takes minutes
    * to even plan. Checkpointing truncates the lineage to the materialized
    * partitions — constant plan size per round. (On a cluster, reliable
    * `checkpoint` to the checkpoint dir gives the same truncation with
    * fault tolerance; localCheckpoint is the single-node/test variant.)
    */
  def run(edges: DataFrame, maxIter: Int = 25,
      nodes: Option[DataFrame] = None): DataFrame = {
    // Null endpoints are dropped (as in runStar): a null-id label starts
    // as cluster=null (contributing 0 to the sum witness) and only LATER
    // acquires a real min label, so the label sum could hold steady while
    // labels still change — a false convergence fire. Nulls can't be
    // graph vertices; filter them before anything else. The NON-null
    // partner of a dropped edge still comes back as a singleton (runStar
    // parity) via the endpoint set folded into the isolated-node union.
    val endpoints = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .filter(col("id").isNotNull).distinct()
    val allNodes = Some(nodes match {
      case None => endpoints
      case Some(n) => endpoints.unionByName(n.select(col("id"))).distinct()
    })
    val sym = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    def nullSafe(d: java.math.BigDecimal): java.math.BigDecimal =
      if (d == null) java.math.BigDecimal.ZERO else d // empty graph: SUM is null
    var lastSum = nullSafe(
      labels.agg(sum(col("cluster").cast(DecimalType(38, 0)))).head().getDecimal(0))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster"))
      // the convergence witness rides the round's own materialization
      // (observe + eager localCheckpoint) — no separate aggregation job
      // re-scanning the labels each round
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
      val next = labels.unionByName(prop)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
        .observe(obs, sum(col("cluster").cast(DecimalType(38, 0))).as("label_sum"))
        .localCheckpoint(true)
      val s = nullSafe(obs.get("label_sum").asInstanceOf[java.math.BigDecimal])
      converged = s.compareTo(lastSum) == 0
      lastSum = s
      labels = next
      iter += 1
    }
    // Partially-propagated labels are WRONG answers (a component reported
    // as several clusters) — fail loudly rather than return them.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds " +
        "(graph diameter exceeds maxIter — raise it or switch to the " +
        "large-star/small-star variant)")
    withIsolated(labels, allNodes)
  }

  private def withIsolated(labels: DataFrame, nodes: Option[DataFrame]): DataFrame =
    nodes match {
      case None => labels
      case Some(n) =>
        val isolated = n.select(col("id")).distinct()
          .join(labels, Seq("id"), "left_anti")
          .withColumn("cluster", col("id"))
        labels.unionByName(isolated)
    }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
    * the O(log² n)-round scale path [[run]]'s Scaladoc points at. Use it
    * when component diameter can be large (chains of near-identical
    * revisions, long link paths): min-label propagation needs DIAMETER
    * rounds, this needs ~log² n regardless of shape.
    *
    * One round = large-star (hook every node's strictly-larger neighbors
    * to its minimum) then small-star (hook every node's smaller neighbors
    * and itself to their minimum); both are a groupBy-min + join on the
    * node key, the same shuffle shape as a [[run]] round. Edges only move
    * toward component minima; at the fixpoint the edge set IS the answer:
    * every non-min node carries exactly one edge to its component min.
    *
    * Convergence detection: a (count, Σa, Σb) decimal witness per round;
    * on witness equality an exact `exceptAll` check confirms the fixpoint
    * (witness collisions are astronomically unlikely but equality of the
    * edge SET is what the theorem needs — the exact check runs once, at
    * the end, not every round).
    */
  def runStar(edges: DataFrame, maxIter: Int = 40,
      nodes: Option[DataFrame] = None): DataFrame = {
    // Endpoint set BEFORE the self-loop filter: a node whose only edge is
    // (v, v) must still come back as a singleton cluster, exactly as in
    // [[run]] (whose symmetric edge list keeps self-loops harmlessly).
    // Folded into the isolated-node union at the end.
    val endpoints = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .filter(col("id").isNotNull).distinct()
    val allNodes = nodes match {
      case None => endpoints
      case Some(n) => endpoints.unionByName(n.select(col("id"))).distinct()
    }
    var e = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct().localCheckpoint(true)

    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.select(col("a").as("u"), col("b").as("v"))
        .unionAll(cur.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u")).agg(least(min(col("v")), first(col("u"))).as("mn"))
      sym.join(mins, Seq("u"))
        .filter(col("v") > col("u")) // strictly larger neighbors re-hook
        .select(col("mn").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }

    def smallStar(cur: DataFrame): DataFrame = {
      // canonical (a < b): group by the larger endpoint, neighbors all smaller
      val mins = cur.groupBy(col("b")).agg(min(col("a")).as("mn"))
      cur.join(mins, Seq("b"))
        .select(col("mn").as("a"), col("a").as("b")) // smaller neighbors → min
        .unionAll(mins.select(col("mn").as("a"), col("b"))) // the node itself → min
        .filter(col("a") =!= col("b")).distinct()
    }

    def obsWitness(obs: org.apache.spark.sql.Observation): (Long, java.math.BigDecimal) = {
      val n = obs.get("n") match { case null => 0L; case x => x.asInstanceOf[Long] }
      val s = obs.get("s") match {
        case null => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal => d
      }
      (n, s)
    }
    def witness(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(col("a").cast(DecimalType(38, 0)) * lit(3) +
          col("b").cast(DecimalType(38, 0)))).head()
      (r.getLong(0), if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }

    var lastW = witness(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // the witness rides the round's own materialization (observe +
      // eager localCheckpoint) — the [[run]] pattern, no separate
      // aggregation job per round
      val obs = org.apache.spark.sql.Observation(s"ccstar_round_$iter")
      val next = smallStar(largeStar(e))
        .observe(obs,
          count(lit(1)).as("n"),
          sum(col("a").cast(DecimalType(38, 0)) * lit(3) +
            col("b").cast(DecimalType(38, 0))).as("s"))
        .localCheckpoint(true)
      val w = obsWitness(obs)
      if (w._1 == lastW._1 && w._2.compareTo(lastW._2) == 0 &&
          next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty)
        converged = true
      lastW = w
      e = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"star connected components did not converge in $maxIter rounds")
    val labels = e.select(col("b").as("id"), col("a").as("cluster"))
      .unionByName(e.select(col("a").as("id"), col("a").as("cluster")))
      .distinct()
    withIsolated(labels, Some(allNodes))
  }
}
