package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in integer-exact fixed-point arithmetic.
  *
  * Reference behavior target: link-analysis ranking over a document graph
  * (the classic importance signal a training-data pipeline uses to weight
  * crawl sources). Floating-point PageRank is order-dependent (a parallel
  * sum of doubles changes with partitioning), so ranks here are scaled
  * longs: `scale` = 1.0 of total mass, every damping step is an integer
  * floor division. Two engines that follow the same formula agree bit for
  * bit — which is what lets a DuckDB recursive/unrolled oracle hash-match
  * a distributed Spark run, and at 100 TB lets two cluster runs with
  * different partitioning agree exactly.
  *
  * Per-iteration shape (the Pregel pattern expressed relationally):
  *   contrib = edges ⋈_src ranks → groupBy(dst) sum   (one shuffle by dst)
  *   ranks'  = verts ⟕ contrib + base                 (vertex-cardinality)
  * The edge list (with out-degrees pre-joined) is materialized ONCE via
  * localCheckpoint and reused every round; each round's rank frame is
  * checkpointed too — iterative DataFrames that merely persist nest the
  * previous plan and analysis cost doubles per round (see
  * ConnectedComponents). On a cluster, reliable `checkpoint` gives the
  * same truncation with fault tolerance.
  *
  * Dangling mass: nodes whose generated out-links all collapse to
  * self-loops contribute nothing (their mass evaporates) — deterministic
  * in both engines, so the oracle stays exact; total mass is NOT
  * conserved, matching the plain "sum of floors" formulation.
  */
object PageRank {

  /** @param edges deduplicated directed edges `(src, dst)`, no self-loops
    * @param verts vertex frame with a single `id` column
    * @param nVerts vertex count (drives the base-rank constant)
    * @param iters  fixed iteration count (no convergence test — the
    *               integer formula is what the oracle unrolls)
    * @param scale  fixed-point scale: rank 1.0 == `scale`. Must be > 0:
    *               ranks stay non-negative by construction (base > 0,
    *               contributions are floors of non-negative products),
    *               which is load-bearing for oracle agreement — Spark's
    *               `div` truncates toward zero while DuckDB's `//` floors,
    *               and the two only coincide on non-negative operands. A
    *               signed-weight variant would need floor-division
    *               semantics on both sides before reusing this oracle.
    */
  def run(edges: DataFrame, verts: DataFrame, nVerts: Long, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(nVerts > 0, "PageRank needs a non-empty vertex set")
    require(scale > 0, "scale must be positive (non-negative ranks are " +
      "what make Spark div and DuckDB // agree)")
    runWithBase(edges, verts, lit(true), nVerts, iters, scale)
  }

  /** Personalized PageRank: teleport mass lands only on the vertices
    * where `isTeleport` holds (uniformly over `nTeleport` of them) instead
    * of uniformly everywhere — the "importance relative to a seed set"
    * signal (seed = trusted sources → TrustRank-style source weighting).
    * Same integer fixed-point formula; `run` is the special case where the
    * teleport set is all of `verts`.
    */
  def runPersonalized(edges: DataFrame, verts: DataFrame,
      isTeleport: org.apache.spark.sql.Column, nTeleport: Long, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(nTeleport > 0, "personalized PageRank needs a non-empty teleport set")
    require(scale > 0, "scale must be positive (non-negative ranks are " +
      "what make Spark div and DuckDB // agree)")
    runWithBase(edges, verts, isTeleport, nTeleport, iters, scale)
  }

  private def runWithBase(edges: DataFrame, verts: DataFrame,
      isTeleport: org.apache.spark.sql.Column, nTeleport: Long, iters: Int,
      scale: Long): DataFrame = {
    val base = (15L * scale) / (100L * nTeleport)
    val init = scale / nTeleport
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // one materialization, reused by every iteration's src-join
    val edgesDeg = edges.join(outdeg, "src").localCheckpoint(true)
    // resolve the teleport predicate ONCE against the full vertex frame:
    // inside the loop `verts` is projected down to `id`, so a predicate
    // referencing any other vertex column would fail analysis there —
    // the materialized boolean makes every verts column legal in
    // isTeleport, as the scaladoc promises
    val vertsTp = verts
      .select(col("id"), isTeleport.cast("boolean").as("_tp"))
      .localCheckpoint(true)
    var ranks = vertsTp
      .select(col("id"), when(col("_tp"), init).otherwise(0L).as("r"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val contrib = edgesDeg.join(ranks, edgesDeg("src") === ranks("id"))
        .select(col("dst").as("id"),
          expr("(r * 85) div (deg * 100)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      ranks = vertsTp
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (when(col("_tp"), base).otherwise(0L) +
            coalesce(col("contrib"), lit(0L))).as("r"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }
}
