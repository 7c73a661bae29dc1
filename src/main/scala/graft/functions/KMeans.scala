package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Lloyd's k-means over embedding vectors — the coarse
  * quantizer trainer for IVF (SimilarityIvf uses a fixed subset as
  * centroids; this is the drop-in upgrade). Built entirely from DataFrame
  * algebra:
  *
  *   assign:  broadcast(centroids) join + argmin distance (one narrow pass)
  *   update:  explode (dim, value) pairs → hash-agg avg per (cell, dim)
  *            → re-assemble centroid vectors
  *
  * Every iteration is two shuffles (argmin window + update agg), both on
  * small keys; the corpus-sized side never re-partitions. Deterministic:
  * init = first k vectors by id, ties in argmin broken by centroid id —
  * same result on any cluster layout.
  */
object KMeans {

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** vectors: (id: Long, vec: Array[Double]). Returns (cid, centroid). */
  def fit(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = vectors.orderBy(col("id")).limit(k)
      .select(col("id").as("cid0"), col("vec").as("cvec"))
      .withColumn("cid", row_number().over(Window.orderBy(col("cid0"))) - 1)
      .select(col("cid"), col("cvec"))

    for (_ <- 0 until iters) {
      val assigned = assign(vectors, centroids)
      val updated = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
        .select(col("cell").as("cid"),
          transform(col("pairs"), p => p.getField("m")).as("next"))
      // a centroid that captured no rows KEEPS its previous position
      // (standard empty-cluster handling) — dropping it would silently
      // shrink k for every caller that sized an index by it
      centroids = centroids
        .join(updated, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("next"), col("cvec")).as("cvec"))
        // truncate lineage per round — an un-checkpointed iterative plan
        // nests the previous round and analysis cost doubles per
        // iteration; the centroid frame is k rows, materializing is free
        .localCheckpoint(true)
    }
    centroids
  }

  /** Quantized Lloyd's: vectors pre-quantized to Long (round(x·1000)), so
    * distances are exact integer sums and the centroid update is the
    * floor of an exact integer mean — every step is order-independent and
    * bit-identical on any engine, which makes the whole training loop
    * DuckDB-oracle-expressible (the double-precision [[fit]] above cannot
    * hash-match: its avg() update is partition-order-dependent).
    *
    * vectors: (id: Long, qv: Array[Long]). Init: centroids = ids < k
    * (cid = id). Returns (cid, cv: Array[Long]).
    */
  def fitQuantized(vectors: DataFrame, k: Int, iters: Int): DataFrame =
    fitQuantizedFrom(vectors,
      vectors.filter(col("id") < k)
        .select(col("id").as("cid"), col("qv").as("cv")),
      iters)

  /** [[fitQuantized]]'s Lloyd loop with EXPLICIT initial centroids —
    * `init`: (cid, cv). The public entry keeps the oracle-pinned id&lt;k
    * prefix init; samplers and hierarchical trainers (whose row ids are
    * arbitrary) pass their own deterministic seed set. */
  private[graft] def fitQuantizedFrom(vectors: DataFrame, init: DataFrame,
      iters: Int): DataFrame = {
    var cents = init
    for (_ <- 0 until iters) {
      val updated = assignQuantized(vectors, cents)
        .select(col("cell"), posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        // EXACT integer floor mean: (s − floorMod(s, c)) div c — the
        // subtraction makes the dividend exactly divisible, so truncating
        // div IS floor. The previous floor(double s / c) loses low bits
        // past 2^53 and can floor one off from the true mean at scale.
        .agg(expr("(sum(v) - pmod(sum(v), count(1))) div count(1)")
          .cast(LongType).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
        .select(col("cell").as("cid"),
          transform(col("pairs"), p => p.getField("m")).as("next"))
      // empty-cluster retention, as in [[fit]]
      cents = cents
        .join(updated, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("next"), col("cv")).as("cv"))
        // truncate lineage per round — an iterative plan that isn't
        // checkpointed nests the previous round and analysis cost doubles
        // per iteration (same pitfall as ConnectedComponents); the
        // centroid frame is k rows, so materializing it is free
        .localCheckpoint(true)
    }
    cents
  }

  /** BRANCH-LOCAL quantized Lloyd's — the FINE layer of a two-level IVF
    * trainer. `sample`: (branch, id, qv); every branch trains its own
    * `kPerBranch` centroids over only its members, all branches inside
    * the same distributed jobs: the centroids live in a (branch, cid,
    * cv) TABLE keyed by branch and the assignment is a branch-keyed
    * SHUFFLE join — never a broadcast of the full fine-centroid set,
    * which is O(numCells) and outgrows executor memory once numCells
    * tracks the corpus (numCells ≈ N/cellTarget). Per-iteration work is
    * |sample| × kPerBranch distance rows — with a bounded sample of
    * c·numCells vectors and kPerBranch = ⌈√numCells⌉ that is
    * c·numCells^1.5, the same N^1.5 envelope as the hierarchical
    * assignment itself.
    *
    * Deterministic throughout: init = each branch's kPerBranch members
    * with the smallest `xxhash64(id)` — HASH order, not id order: ids
    * correlate with data position in clustered corpora (the r14 ×100
    * pile-up was precisely id-prefix seeding), while the hash ranks
    * uniformly over the branch's members, i.e. the standard random
    * k-means init made reproducible. Integer distances with ties to the
    * smaller cid; the exact integer floor-mean update of
    * [[fitQuantized]]; empty-cluster retention per (branch, cid).
    * Returns (branch, cid, cv) with cid the BRANCH-LOCAL index
    * 0..kPerBranch-1 (callers globalize as branch·kPerBranch + cid).
    *
    * `cellCapFactor > 1` turns on BALANCED training (VERDICT r15 item 1
    * — the ×600 residual: per-query probe work tracks PEAK cell mass,
    * because the probe quota must always admit a query's top cell, so a
    * density spike that lands in one cell re-creates the skew the
    * trained quantizer exists to remove). After every Lloyd update, a
    * cell holding more than `cellCapFactor ×` its branch's mean sample
    * mass DONATES: the emptiest cell of the same branch (empty cells
    * first) re-seeds just INSIDE the donor — an eighth of the way from
    * its centroid toward its farthest member (the LBG ε-split; see
    * [[rebalance]]) — and the next assignment splits the donor's mass
    * near its center — the standard split-merge balancing move, kept
    * branch-local so everything rides the existing branch-keyed
    * shuffles and k per branch never changes.
    * Donors pair with victims rank-by-rank (largest donor ↔ emptiest
    * victim, ties to the smaller cid) — deterministic, like every other
    * step. The final iteration's re-seed is intentionally kept: the
    * caller's assignment is what actually splits the over-full cell. */
  private[graft] def fitQuantizedPerBranch(sample: DataFrame,
      kPerBranch: Int, iters: Int,
      cellCapFactor: Double = 0.0): DataFrame = {
    val wInit = Window.partitionBy(col("branch"))
      .orderBy(xxhash64(col("id")), col("id"))
    var cents = sample
      .withColumn("_rn", row_number().over(wInit))
      .filter(col("_rn") <= kPerBranch)
      .select(col("branch"), (col("_rn") - 1).cast(LongType).as("cid"),
        col("qv").as("cv"))
      .localCheckpoint(true)
    val balance = cellCapFactor > 1.0 && kPerBranch > 1
    for (_ <- 0 until iters) {
      val wa = Window.partitionBy(col("id"))
        .orderBy(col("dist2"), col("cid"))
      val assignedLazy = sample.join(cents, Seq("branch"))
        .withColumn("dist2", VectorExprs.sqDistLong(col("qv"), col("cv")))
        .withColumn("_rn", row_number().over(wa))
        .filter(col("_rn") === 1)
        .select(col("branch"), col("cid"), col("id"), col("qv"),
          col("dist2"))
      // balancing consumes the assignment THREE times (update agg, the
      // cap counts, the split seeds) — materialize it once per round
      // (sample-sized) instead of re-running the distance join each
      // time (measured: train 15 → 54 s at ×100 without this); the
      // uncapped path keeps the fused single-pass pipeline
      val assigned =
        if (balance) assignedLazy.localCheckpoint(true) else assignedLazy
      val updated = assigned
        .select(col("branch"), col("cid"),
          posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy(col("branch"), col("cid"), col("dim"))
        // the exact integer floor mean of [[fitQuantized]]
        .agg(expr("(sum(v) - pmod(sum(v), count(1))) div count(1)")
          .cast(LongType).as("m"))
        .groupBy(col("branch"), col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
        .select(col("branch"), col("cid"),
          transform(col("pairs"), p => p.getField("m")).as("next"))
      cents = cents.join(updated, Seq("branch", "cid"), "left")
        .select(col("branch"), col("cid"),
          coalesce(col("next"), col("cv")).as("cv"))
        .localCheckpoint(true)
      if (balance) {
        cents = rebalance(cents, assigned, cellCapFactor)
        assigned.unpersist()
      }
    }
    cents
  }

  /** One balancing move per over-cap cell (see [[fitQuantizedPerBranch]]):
    * re-seed the branch's emptiest cells a small step inside the
    * over-cap cells (the ε-split — see the seeding comment below). All
    * work is proportional to the SAMPLE (one count agg, one window over
    * donor-cell members) and stays keyed by branch — no broadcast, no
    * O(N) anything; a round with no over-cap cell costs one count-agg
    * probe and changes nothing. */
  private def rebalance(cents: DataFrame, assigned: DataFrame,
      cellCapFactor: Double): DataFrame = {
    // counts INCLUDING empty cells (they never appear in `assigned` but
    // are the best victims)
    val counts = cents.select(col("branch"), col("cid"))
      .join(assigned.groupBy(col("branch"), col("cid"))
          .agg(count(lit(1)).as("n")),
        Seq("branch", "cid"), "left")
      .na.fill(0L, Seq("n"))
    val withCap = counts
      // per-branch cell count comes from the centroid table itself, so
      // the cap is allocation-agnostic (uniform OR mass-proportional k)
      .join(counts.groupBy(col("branch"))
          .agg(sum(col("n")).as("tot"), count(lit(1)).as("kb")),
        Seq("branch"))
      // cap over the branch MEAN (tot/kb, empties included)
      .withColumn("cap",
        ceil(col("tot") * cellCapFactor / col("kb")).cast(LongType))
    val wDonor = Window.partitionBy(col("branch"))
      .orderBy(col("n").desc, col("cid"))
    val donors = withCap.filter(col("n") > col("cap"))
      .withColumn("rank", row_number().over(wDonor))
      .select(col("branch"), col("cid"), col("rank"))
    // no over-cap cell anywhere → the re-seed join is an exact identity;
    // skip its jobs AND the per-iteration checkpoint (on balanced data
    // the cap costs one tiny count-agg probe, not a 2× trainer wall —
    // measured: train 5.6 s → 11.1 s at ×10 without this short-circuit)
    if (donors.isEmpty) return cents
    val wVictim = Window.partitionBy(col("branch"))
      .orderBy(col("n"), col("cid"))
    // victims strictly below the branch mean — re-seeding a well-fed
    // cell would just move the imbalance
    val victims = withCap.filter(col("n") * col("kb") < col("tot"))
      .withColumn("rank", row_number().over(wVictim))
      .select(col("branch"), col("cid"), col("rank"))
    val wFar = Window.partitionBy(col("branch"), col("cid"))
      .orderBy(col("dist2").desc, col("id"))
    // ε-split seeding (LBG): the victim re-seeds an EIGHTH of the way
    // from the donor's centroid toward its farthest member — the
    // donor/victim bisector then cuts the dense core near its CENTER
    // and the next assignment halves the donor's mass. Seeding AT the
    // far member (the obvious choice) only shaves the blob's edge: the
    // bisector sits halfway out, the dense core stays whole (measured:
    // ×100 cell_max 490 → 513, i.e. no improvement). Integer
    // arithmetic, truncation toward zero — deterministic like every
    // other step; a donor tighter than the quantization grid yields a
    // zero offset and the tie-break keeps the mass put (near-duplicate
    // blobs are unsplittable by any centroid placement).
    val seeds = assigned
      .join(donors, Seq("branch", "cid"))
      .withColumn("_rf", row_number().over(wFar))
      .filter(col("_rf") === 1)
      .select(col("branch"), col("rank"), col("qv"))
      .join(cents.join(donors, Seq("branch", "cid"))
          .select(col("branch"), col("rank"), col("cv").as("dcv")),
        Seq("branch", "rank"))
      .select(col("branch"), col("rank"),
        zip_with(col("dcv"), col("qv"),
          (c, x) => c + ((x - c) / lit(8L)).cast(LongType)).as("seedCv"))
    val reseed = victims.join(seeds, Seq("branch", "rank"))
      .select(col("branch"), col("cid"), col("seedCv"))
    cents.join(reseed, Seq("branch", "cid"), "left")
      .select(col("branch"), col("cid"),
        coalesce(col("seedCv"), col("cv")).as("cv"))
      .localCheckpoint(true)
  }

  /** Exact integer nearest-centroid assignment: (id, qv, cell, dist2),
    * ties broken by smaller cid. */
  def assignQuantized(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = VectorExprs.sqDistLong(col("qv"), col("cv"))
    val w = Window.partitionBy(col("id")).orderBy(col("dist2"), col("cid"))
    vectors.join(broadcast(cents))
      .withColumn("dist2", d2)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("id"), col("qv"), col("cid").as("cell"), col("dist2"))
  }

  /** Nearest-centroid assignment: (id, vec, cell, dist2). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dist2"), col("cid"))
    vectors.join(broadcast(centroids))
      .withColumn("dist2", sqDist(col("vec"), col("cvec")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("id"), col("vec"), col("cid").as("cell"), col("dist2"))
  }

  /** Sum of squared distances to assigned centroids (training objective). */
  def inertia(vectors: DataFrame, centroids: DataFrame): Double =
    assign(vectors, centroids).agg(sum(col("dist2"))).head().getDouble(0)

  /** Embedding table → (id, vec double) shape. */
  def embeddingVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("vec"))
}
