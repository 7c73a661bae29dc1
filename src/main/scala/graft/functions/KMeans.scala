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
  def fitQuantized(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = vectors.filter(col("id") < k)
      .select(col("id").as("cid"), col("qv").as("cv"))
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
