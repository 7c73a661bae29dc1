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

  /** (vec_id, qv): embeddings quantized to round(x·1000) long vectors. */
  private def quantized(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), quant(col("embedding")).as("qv"))

  /** (vec_id, sub, sv): the 8 subvectors of every quantized vector. */
  private def subvectors(e: DataFrame): DataFrame = e
    .select(col("vec_id"), col("qv"),
      explode(sequence(lit(0), lit(Subspaces - 1))).as("sub"))
    .select(col("vec_id"), col("sub"),
      slice(col("qv"), col("sub") * SubDim + 1, lit(SubDim)).as("sv"))

  /** (c_sub, cidx, cv): the fixed 4-centroid codebook per subspace. */
  private def codebooks(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < K)
      .select(col("sub").as("c_sub"), col("vec_id").cast(IntegerType).as("cidx"),
        col("sv").as("cv"))

  /** (vec_id, sub, cidx, dist2): argmin codebook assignment per subvector,
    * ties to the smaller code. */
  private def assignments(subs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dist2"), col("cidx"))
    subs.join(broadcast(cents), col("sub") === col("c_sub"))
      .withColumn("dist2", d2(col("sv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  val pqCodes: Q = Q(
    "sim_pq_codes",
    (s, dir) => {
      val e = quantized(s, dir)
      val subs = subvectors(e)
      assignments(subs, codebooks(subs))
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

  // ------------------------------------------------------------------
  // ADC search + exact re-rank: the full IVF-PQ query path.
  //
  // For each query vector, build the 8×4 asymmetric distance table
  // (query subvector ↔ codebook centroid), score EVERY corpus vector by
  // code lookup (sum of 8 table entries — this is what scans billions of
  // vectors in RAM at 100 TB: 8 adds per vector, no float math), keep the
  // top-`Shortlist` by approximate distance, then re-rank only that shortlist
  // with exact integer L2 and return the top-`TopK`.
  //
  // Plan shape: the distance table is queries×32 rows → broadcast; the
  // ADC scan is a broadcast join + hash agg on (qid, vec_id); shortlist
  // and re-rank are rank-limit windows over per-qid partitions, which
  // Spark plans as partial WindowGroupLimit BEFORE each exchange — every
  // map partition keeps only its own top-Shortlist per qid, so the
  // shortlist shuffle carries ≤ partitions × queries × Shortlist rows,
  // never the corpus. The exact pass joins only Shortlist×queries rows
  // back to the vectors. The one corpus-sized shuffle is the scan's own
  // hash agg.
  private val NQueries = 3
  private val Shortlist = 20
  private val TopK = 10

  val pqRerank: Q = Q(
    "sim_pq_rerank",
    (s, dir) => {
      val e = quantized(s, dir)
      val subs = subvectors(e)
      val cents = codebooks(subs)
      // corpus codes: (vec_id, sub, cidx)
      val codes = assignments(subs, cents)
        .select(col("vec_id"), col("sub"), col("cidx"))
      // asymmetric distance table: (qid, sub, cidx, qd2)
      val dtable = subs.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("sub").as("q_sub"), col("sv").as("qsv"))
        .join(cents, col("q_sub") === col("c_sub"))
        .select(col("qid"), col("q_sub"), col("cidx").as("q_cidx"),
          d2(col("qsv"), col("cv")).as("qd2"))
      // ADC scan: approximate distance of every corpus vector to every query
      val approx = codes
        .join(broadcast(dtable),
          col("sub") === col("q_sub") && col("cidx") === col("q_cidx"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("qd2")).as("approx_d2"))
      val wApprox = Window.partitionBy(col("qid"))
        .orderBy(col("approx_d2"), col("vec_id"))
      val shortlist = approx
        .withColumn("arn", row_number().over(wApprox))
        .filter(col("arn") <= Shortlist)
        .select(col("qid"), col("vec_id"), col("approx_d2"))
      // exact re-rank of the shortlist only (shortlist is tiny → broadcast
      // it into the vector join; the corpus is only touched by vec_id)
      val qVecs = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qv_id"), col("qv").as("query_qv"))
      val wExact = Window.partitionBy(col("qid"))
        .orderBy(col("exact_d2"), col("vec_id"))
      e.join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(qVecs), col("qid") === col("qv_id"))
        .withColumn("exact_d2", d2(col("qv"), col("query_qv")))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("vec_id"),
          col("exact_d2"), col("approx_d2"))
        .orderBy(col("qid"), col("rank"))
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
      |codes AS (
      |  SELECT vec_id, sub, cidx FROM (
      |    SELECT vec_id, sub, cidx,
      |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist2, cidx) AS rn
      |    FROM dists) WHERE rn = 1),
      |dtable AS (
      |  SELECT subs.vec_id AS qid, subs.sub AS q_sub, cents.cidx AS q_cidx,
      |    CAST(list_sum(list_transform(range(1, ${SubDim + 1}),
      |      i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS BIGINT) AS qd2
      |  FROM subs JOIN cents ON subs.sub = cents.c_sub
      |  WHERE subs.vec_id < $NQueries),
      |approx AS (
      |  SELECT qid, codes.vec_id, CAST(SUM(qd2) AS BIGINT) AS approx_d2
      |  FROM codes JOIN dtable ON codes.sub = dtable.q_sub
      |    AND codes.cidx = dtable.q_cidx
      |  GROUP BY qid, codes.vec_id),
      |shortlist AS (
      |  SELECT qid, vec_id, approx_d2 FROM (
      |    SELECT qid, vec_id, approx_d2,
      |      row_number() OVER (PARTITION BY qid ORDER BY approx_d2, vec_id) AS arn
      |    FROM approx) WHERE arn <= $Shortlist),
      |exact AS (
      |  SELECT sl.qid, sl.vec_id, sl.approx_d2,
      |    CAST(list_sum(list_transform(range(1, ${Subspaces * SubDim + 1}),
      |      i -> (c.v[i] - qv.v[i]) * (c.v[i] - qv.v[i]))) AS BIGINT) AS exact_d2
      |  FROM shortlist sl
      |  JOIN q c ON c.vec_id = sl.vec_id
      |  JOIN q qv ON qv.vec_id = sl.qid)
      |SELECT qid, CAST(rank AS INT) AS rank, vec_id, exact_d2, approx_d2
      |FROM (
      |  SELECT qid, vec_id, approx_d2, exact_d2,
      |    row_number() OVER (PARTITION BY qid ORDER BY exact_d2, vec_id) AS rank
      |  FROM exact)
      |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin))

  val all: Seq[Q] = Seq(pqCodes, pqRerank)
}
