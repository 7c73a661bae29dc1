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

  /** Rows below which the quantized Lloyd loop trains ON THE DRIVER
    * instead of as distributed jobs. Every step of the loop is
    * order-independent integer arithmetic (exact distances, floor means,
    * cid tie-breaks) — the same property that makes it DuckDB-oracle-
    * expressible — so the local twin is bit-identical by construction
    * (spec-pinned, and the k-means oracles replay the whole loop
    * end-to-end). The distributed loop costs ~6 driver-blocking jobs +
    * AQE stage materializations PER ITERATION whatever the data size
    * (measured: the 16-cell trained-IVF build spent ~10 s training over
    * a 128-row sample — 94 jobs, 9 s of it between jobs on the driver);
    * below the cutoff the same arithmetic is microseconds in one collect.
    * 64k rows × 64 dims ≈ 35 MB on the driver — far under the driver's
    * working budget; above the cutoff the distributed loop runs exactly
    * as before (the 100 TB shape: a corpus-tracking sample keeps
    * training distributed). */
  private[graft] val LocalTrainMax = 65536L

  private def collectQuantized(vectors: DataFrame): Array[(Long, Array[Long])] =
    vectors.select(col("id"), col("qv")).collect().map { r =>
      (r.getLong(0), r.getSeq[Long](1).toArray)
    }

  private def sqDistL(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** Driver-local twin of the [[fitQuantizedFrom]] loop body: argmin by
    * (dist2, cid), exact integer floor-mean update, empty-cluster
    * retention. `cents` iterated in ascending-cid order with a strict
    * `<` keeps ties on the smaller cid — the window's (dist2, cid)
    * order. */
  private[graft] def localLloyd(rows: Array[(Long, Array[Long])],
      init: Seq[(Long, Array[Long])], iters: Int): Seq[(Long, Array[Long])] = {
    var cents = init.sortBy(_._1)
    for (_ <- 0 until iters) {
      val sums = scala.collection.mutable.LongMap
        .empty[(Array[Long], Array[Long])] // cid -> (dim sums, count in [0])
      rows.foreach { case (_, qv) =>
        var best = -1L
        var bestD = Long.MaxValue
        cents.foreach { case (cid, cv) =>
          val d = sqDistL(qv, cv)
          if (d < bestD) { bestD = d; best = cid }
        }
        val (s, c) = sums.getOrElseUpdate(best,
          (new Array[Long](rows.head._2.length), new Array[Long](1)))
        var i = 0
        while (i < qv.length) { s(i) += qv(i); i += 1 }
        c(0) += 1L
      }
      cents = cents.map { case (cid, cv) =>
        sums.get(cid) match {
          case Some((s, c)) => (cid, s.map(Math.floorDiv(_, c(0))))
          case None => (cid, cv) // empty-cluster retention
        }
      }
    }
    cents
  }

  /** [[fitQuantized]]'s Lloyd loop with EXPLICIT initial centroids —
    * `init`: (cid, cv). The public entry keeps the oracle-pinned id&lt;k
    * prefix init; samplers and hierarchical trainers (whose row ids are
    * arbitrary) pass their own deterministic seed set. Training sets at
    * or under `localMax` rows run the driver-local twin (bit-identical —
    * see [[LocalTrainMax]]); the distributed loop is unchanged above it.
    * Specs force the distributed path with `localMax = 0`. */
  private[graft] def fitQuantizedFrom(vectors: DataFrame, init: DataFrame,
      iters: Int, localMax: Long = LocalTrainMax): DataFrame = {
    if (iters > 0 && localMax > 0 && vectors.count() <= localMax) {
      val spark = vectors.sparkSession
      import spark.implicits._
      val rows = collectQuantized(vectors)
      val init0 = init.select(col("cid"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
      return localLloyd(rows, init0, iters)
        .map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cid", "cv")
    }
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
  /** Driver-local twin of the per-branch loop (init by (xxhash64(id),
    * id) per branch, argmin ties to the smaller cid, exact floor means,
    * the [[rebalance]] ε-split move) — bit-identical for the same
    * reason as [[localLloyd]]; spec-pinned against the distributed path
    * on the real corpus. */
  /** Local twin of [[assignQuantized]]'s argmin (ties to the smaller
    * cid): each row's nearest centroid. `cents` must be cid-ascending. */
  private[graft] def localAssignQ(rows: Array[(Long, Array[Long])],
      cents: Seq[(Long, Array[Long])]): Array[(Long, Array[Long], Long)] =
    rows.map { case (id, qv) =>
      var best = -1L
      var bestD = Long.MaxValue
      cents.foreach { case (cid, cv) =>
        val d = sqDistL(qv, cv)
        if (d < bestD) { bestD = d; best = cid }
      }
      (id, qv, best)
    }

  private[graft] def localPerBranch(rows: Array[(Long, Long, Array[Long])],
      kPerBranch: Int, iters: Int, cellCapFactor: Double)
      : Seq[(Long, Long, Array[Long])] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val byBranch = rows.groupBy(_._1)
    val balance = cellCapFactor > 1.0 && kPerBranch > 1
    // cid ascending inside each branch — strict `<` in the argmin then
    // keeps ties on the smaller cid, the window's (dist2, cid) order
    var cents: Map[Long, IndexedSeq[(Long, Array[Long])]] = byBranch.map {
      case (b, ms) =>
        b -> ms.sortBy(m => (XXH64.hashLong(m._2, 42L), m._2))
          .take(kPerBranch).zipWithIndex
          .map { case (m, i) => (i.toLong, m._3) }.toIndexedSeq
    }
    for (_ <- 0 until iters) {
      val assigned = rows.map { case (b, id, qv) =>
        var best = -1L
        var bestD = Long.MaxValue
        cents(b).foreach { case (cid, cv) =>
          val d = sqDistL(qv, cv)
          if (d < bestD) { bestD = d; best = cid }
        }
        (b, best, id, qv, bestD)
      }
      val agg = assigned.groupBy(r => (r._1, r._2)).map { case (k, ms) =>
        val s = new Array[Long](ms.head._4.length)
        ms.foreach { m =>
          var i = 0
          while (i < s.length) { s(i) += m._4(i); i += 1 }
        }
        k -> s.map(Math.floorDiv(_, ms.length.toLong))
      }
      cents = cents.map { case (b, cs) =>
        b -> cs.map { case (cid, cv) => (cid, agg.getOrElse((b, cid), cv)) }
      }
      if (balance) cents = localRebalance(cents, assigned, cellCapFactor)
    }
    cents.toSeq.flatMap { case (b, cs) =>
      cs.map { case (cid, cv) => (b, cid, cv) }
    }
  }

  /** Local twin of [[rebalance]] — same cap (ceil over the branch mean,
    * empties included), same donor/victim ranking and rank-pairing, same
    * ε-split seed arithmetic (double division truncated toward zero,
    * exactly the Divide + cast(Long) the column expression evaluates). */
  private def localRebalance(
      cents: Map[Long, IndexedSeq[(Long, Array[Long])]],
      assigned: Array[(Long, Long, Long, Array[Long], Long)],
      cellCapFactor: Double): Map[Long, IndexedSeq[(Long, Array[Long])]] = {
    val nOf = assigned.groupBy(r => (r._1, r._2)).map { case (k, ms) =>
      k -> ms.length.toLong
    }
    val donorsByBranch = cents.map { case (b, cs) =>
      val counts = cs.map { case (cid, _) => cid -> nOf.getOrElse((b, cid), 0L) }
      val tot = counts.map(_._2).sum
      val kb = cs.size.toLong
      val cap = math.ceil((tot.toDouble * cellCapFactor) / kb.toDouble).toLong
      val donors = counts.filter(_._2 > cap)
        .sortBy { case (cid, n) => (-n, cid) }.map(_._1)
      val victims = counts.filter { case (_, n) => n * kb < tot }
        .sortBy { case (cid, n) => (n, cid) }.map(_._1)
      b -> ((donors, victims))
    }
    if (donorsByBranch.forall(_._2._1.isEmpty)) return cents
    cents.map { case (b, cs) =>
      val (donors, victims) = donorsByBranch(b)
      val centOf = cs.toMap
      // rank-paired: donor r's ε-split seed re-seeds victim r
      val reseed = donors.zip(victims).map { case (dCid, vCid) =>
        val far = assigned.iterator
          .filter(r => r._1 == b && r._2 == dCid)
          .reduce { (x, y) =>
            if (y._5 > x._5 || (y._5 == x._5 && y._3 < x._3)) y else x
          }
        val dcv = centOf(dCid)
        val seed = dcv.zip(far._4).map { case (c, x) =>
          c + ((x - c).toDouble / 8.0).toLong
        }
        vCid -> seed
      }.toMap
      b -> cs.map { case (cid, cv) => (cid, reseed.getOrElse(cid, cv)) }
    }
  }

  private[graft] def fitQuantizedPerBranch(sample: DataFrame,
      kPerBranch: Int, iters: Int,
      cellCapFactor: Double = 0.0,
      localMax: Long = LocalTrainMax): DataFrame = {
    if (iters > 0 && localMax > 0 && sample.count() <= localMax) {
      val spark = sample.sparkSession
      import spark.implicits._
      val rows = sample.select(col("branch"), col("id"), col("qv")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
      return localPerBranch(rows, kPerBranch, iters, cellCapFactor)
        .map { case (b, cid, cv) => (b, cid, cv.toSeq) }
        .toDF("branch", "cid", "cv")
    }
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
