package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): compress each 64-dim embedding to
  * 8 one-byte codes (8 subspaces × 4-centroid codebooks here), the memory
  * layer under IVF-PQ ANN indexes — at 100 TB the corpus lives in RAM as
  * codes (8 B per vector instead of 256 B) and distances are looked up
  * per-subspace.
  *
  * Deterministic and integer-exact end to end: vectors are quantized to
  * round(x·1000) ints, codebooks are a fixed subset (vec_id < 4 per
  * subspace — `KMeans.fitQuantized` is the drop-in trained upgrade, proven
  * separately by sim_kmeans_cells), assignment is argmin of integer L2
  * with ties to the smaller code — so the full encode pipeline, including
  * per-vector reconstruction error, is DuckDB-oracle-verified.
  *
  * Plan shape: subspace fan-out is a narrow explode (8× row multiplier on
  * the id+subvector projection, not the full row); the codebook side is 32
  * rows broadcast; argmin is a window over (vec_id, subspace) partitions —
  * keys that the explode already co-partitioned, and re-assembly is one
  * hash agg back to vec_id. One shuffle total.
  */
object SimilarityPq {

  private val Subspaces = 8
  private val SubDim = 8
  private val K = 4

  private def quant(c: Column): Column =
    graft.functions.VectorExprs.quantize1000(c)

  private def d2(a: Column, b: Column): Column =
    graft.functions.VectorExprs.sqDistLong(a, b)

  val pqCodes: Q = Q(
    "sim_pq_codes",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), quant(col("embedding")).as("qv"))
      val subs = e
        .select(col("vec_id"), col("qv"),
          explode(sequence(lit(0), lit(Subspaces - 1))).as("sub"))
        .select(col("vec_id"), col("sub"),
          slice(col("qv"), col("sub") * SubDim + 1, lit(SubDim)).as("sv"))
      val cents = broadcast(subs.filter(col("vec_id") < K)
        .select(col("sub").as("c_sub"), col("vec_id").cast(IntegerType).as("cidx"),
          col("sv").as("cv")))
      val w = Window.partitionBy(col("vec_id"), col("sub"))
        .orderBy(col("dist2"), col("cidx"))
      subs.join(cents, col("sub") === col("c_sub"))
        .withColumn("dist2", d2(col("sv"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("vec_id"))
        .agg(
          array_sort(collect_list(struct(col("sub"), col("cidx")))).as("pairs"),
          sum(col("dist2")).as("recon_err"))
        // codes as a dash-joined STRING, not array<int>: no list-typed
        // column has gone through the driver's hash gate yet — string is
        // the proven-safe shape, and PQ codes serialize anyway
        .select(col("vec_id"),
          concat_ws("-", transform(col("pairs"),
            p => p.getField("cidx").cast(StringType))).as("codes"),
          col("recon_err"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |subs AS (
      |  SELECT vec_id, t.s AS sub,
      |    v[(t.s * $SubDim + 1):(t.s * $SubDim + $SubDim)] AS sv
      |  FROM q CROSS JOIN range(0, $Subspaces) t(s)),
      |cents AS (
      |  SELECT sub AS c_sub, CAST(vec_id AS INT) AS cidx, sv AS cv
      |  FROM subs WHERE vec_id < $K),
      |dists AS (
      |  SELECT subs.vec_id, subs.sub, cents.cidx,
      |    CAST(list_sum(list_transform(range(1, ${SubDim + 1}),
      |      i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS BIGINT) AS dist2
      |  FROM subs JOIN cents ON subs.sub = cents.c_sub),
      |best AS (
      |  SELECT vec_id, sub, cidx, dist2,
      |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist2, cidx) AS rn
      |  FROM dists)
      |SELECT vec_id,
      |  array_to_string(list(CAST(cidx AS VARCHAR) ORDER BY sub), '-') AS codes,
      |  CAST(SUM(dist2) AS BIGINT) AS recon_err
      |FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin))

  val all: Seq[Q] = Seq(pqCodes)
}
