package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over `embeddings.embedding` (Array[Float], dim 64).
  *
  * Three tiers:
  *  1. `sim_topk_quantized` — brute-force cosine top-k with the arithmetic
  *     made INTEGER-exact (elements quantized to round(x*1000)): dot
  *     products and norms are order-independent integer sums, cosine is a
  *     deterministic IEEE expression of them → full DuckDB oracle.
  *  2. `sim_bruteforce_cosine` — the production double-precision path
  *     (zip_with product + aggregate sum, all codegen'd array exprs);
  *     rows-only (double summation order differs across engines).
  *  3. `sim_lsh_buckets` — the 100 TB scale path: random-hyperplane LSH
  *     sign-sketch → bucket join → exact re-rank inside buckets only.
  *     Hyperplanes are derived deterministically from xxhash64(plane, dim)
  *     so the sketch is reproducible with no RNG state.
  *
  * Scale notes: brute force is O(Q·N) — fine for a broadcast query set
  * (queries side is always `broadcast()`), impossible for N×N; the LSH
  * variant turns N×N into per-bucket blocks, the standard ANN trade. An
  * IVF variant (k-means coarse quantizer) is the next step up and shares
  * the same bucket-join shape.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private def quant(c: Column): Column =
    graft.functions.VectorExprs.quantize1000(c)

  // fused native kernel: integer sums are order-independent, so only the
  // allocation profile changes (no per-pair product array)
  private def dotL(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotProductLong(a, b)

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  // ------------------------------------------------------------------
  val topkQuantized: Q = Q(
    "sim_topk_quantized",
    (s, dir) => {
      // Self-norms are computed per SIDE before the join (row-local), so the
      // per-pair work is a single dot fold — same IEEE expression, so the
      // oracle hash is unchanged.
      val e = emb(s, dir).select(col("vec_id"), quant(col("embedding")).as("qv"))
        .withColumn("n2", dotL(col("qv"), col("qv")))
      val queries = broadcast(
        e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("qv").as("q"), col("n2").as("nq")))
      val cands = e.select(col("vec_id").as("cid"), col("qv").as("c"), col("n2").as("nc"))
      val dot = dotL(col("q"), col("c"))
      val cos = dot.cast(DoubleType) /
        sqrt(col("nq").cast(DoubleType)) / sqrt(col("nc").cast(DoubleType))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      queries.join(cands, col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), dot.as("dot_q"), cos.as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("cid"), col("rk"), col("dot_q"), col("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some("""WITH qv AS (
      |  SELECT vec_id AS qid,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings WHERE vec_id < 20),
      |cv AS (
      |  SELECT vec_id AS cid,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS c
      |  FROM embeddings),
      |pairs AS (
      |  SELECT qid, cid,
      |    CAST(list_sum(list_transform(range(1, 65), i -> q[i] * c[i])) AS BIGINT) AS dot_q,
      |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nq,
      |    CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS nc
      |  FROM qv, cv WHERE qid <> cid),
      |scored AS (
      |  SELECT qid, cid, dot_q,
      |    CAST(dot_q AS DOUBLE) / sqrt(CAST(nq AS DOUBLE)) / sqrt(CAST(nc AS DOUBLE)) AS cos,
      |    ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY CAST(dot_q AS DOUBLE) / sqrt(CAST(nq AS DOUBLE)) / sqrt(CAST(nc AS DOUBLE)) DESC,
      |               cid) AS rk
      |  FROM pairs)
      |SELECT qid, cid, CAST(rk AS INT) AS rk, dot_q, cos
      |FROM scored WHERE rk <= 5 ORDER BY qid, rk""".stripMargin))

  // ------------------------------------------------------------------
  // production double-precision brute force. Oracle-exact after all:
  // Spark's `aggregate` and DuckDB's `list_reduce` are both left folds, so
  // the float→double products accumulate in the same order → bit-identical
  // IEEE sums, no quantization needed.
  val bruteforce: Q = Q(
    "sim_bruteforce_cosine",
    (s, dir) => {
      // per-side norm precompute, as in sim_topk_quantized: identical
      // left-fold arithmetic, 1 fold per pair instead of 3.
      val e = emb(s, dir)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val queries = broadcast(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("q"), col("nrm").as("nq")))
      val cands = e.select(col("vec_id").as("cid"), col("embedding").as("c"), col("nrm").as("nc"))
      // fused native expression on the O(Q·N) pair loop: same left-fold
      // arithmetic as the zip_with+aggregate form (oracle hash unchanged),
      // but one allocation-free loop per pair instead of materializing the
      // per-pair product array.
      val cos = graft.functions.VectorExprs.dotProduct(col("q"), col("c")) /
        col("nq") / col("nc")
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      queries.join(cands, col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), cos.as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("cid"), col("cos"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS cid, embedding AS c FROM embeddings),
      |pairs AS (
      |  SELECT qid, cid,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, 65), i -> CAST(q[i] AS DOUBLE) * CAST(c[i] AS DOUBLE))),
      |      (a, b) -> a + b)
      |    / sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(range(1, 65), i -> CAST(q[i] AS DOUBLE) * CAST(q[i] AS DOUBLE))),
      |        (a, b) -> a + b))
      |    / sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(range(1, 65), i -> CAST(c[i] AS DOUBLE) * CAST(c[i] AS DOUBLE))),
      |        (a, b) -> a + b)) AS cos
      |  FROM q, c WHERE qid <> cid),
      |ranked AS (
      |  SELECT qid, cid, cos,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      |  FROM pairs)
      |SELECT qid, cid, cos, CAST(rk AS INT) AS rk
      |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin))

  // ------------------------------------------------------------------
  // LSH sign-sketch buckets: 16 deterministic pseudo-random hyperplanes.
  // plane p weight for dim i = pmod(xxhash64(p, i), 1000) - 500 (integer,
  // deterministic, zero RNG state). Bucket = 16-bit sign pattern.
  // pmod, NOT %: xxhash64 is negative half the time and signed % keeps
  // the sign, which would make the weights uniform on [-1499, 499] —
  // a mean of -500 gives every plane a large common component along
  // -(1,..,1), correlating all 16 bits with sign(-Σx) and collapsing the
  // sketch into two mega-buckets. pmod keeps the symmetric [-500, 499].
  private val Planes = 16

  def signSketch(embCol: Column): Column = {
    val bits = (0 until Planes).map { p =>
      val proj = aggregate(
        zip_with(embCol, sequence(lit(0), lit(63)),
          (x, i) => x.cast(DoubleType) *
            (pmod(xxhash64(lit(p), i), lit(1000L)) - 500).cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  val lshBuckets: Q = Q(
    "sim_lsh_buckets",
    (s, dir) => {
      val sk = emb(s, dir).select(col("vec_id"), col("label"),
        signSketch(col("embedding")).as("bucket"))
      // bucket histogram + per-bucket exact candidate count — the shape of
      // the ANN search index; join-on-bucket then re-rank happens per query.
      sk.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"), countDistinct(col("label")).as("n_labels"))
        .orderBy(col("bucket"))
    },
    None)

  // ------------------------------------------------------------------
  // The registered-function surface end to end: SQL TEXT (not the Column
  // API) calling the custom codegen'd expressions injected by
  // GraftExtensions — dot_product / cosine_sim (left-fold contract ⇒
  // list_reduce oracle) and hamming64 (⇒ bit_count(xor) oracle).
  private val foldSql = (a: String, b: String) =>
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |      (x, y) -> x + y)""".stripMargin

  val vectorExprs: Q = Q(
    "q_vector_exprs",
    (s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""SELECT a.vec_id AS qid,
        |  dot_product(a.embedding, b.embedding) AS dot,
        |  cosine_sim(a.embedding, b.embedding) AS cos,
        |  hamming64(
        |    CAST(round(CAST(a.embedding[0] AS DOUBLE) * 1000) AS BIGINT),
        |    CAST(round(CAST(b.embedding[0] AS DOUBLE) * 1000) AS BIGINT)) AS ham
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 100 ORDER BY qid""".stripMargin)
    },
    Some(s"""SELECT a.vec_id AS qid,
      |  ${foldSql("a.embedding", "b.embedding")} AS dot,
      |  ${foldSql("a.embedding", "b.embedding")}
      |    / sqrt(${foldSql("a.embedding", "a.embedding")})
      |    / sqrt(${foldSql("b.embedding", "b.embedding")}) AS cos,
      |  CAST(bit_count(xor(
      |    CAST(round(CAST(a.embedding[1] AS DOUBLE) * 1000) AS BIGINT),
      |    CAST(round(CAST(b.embedding[1] AS DOUBLE) * 1000) AS BIGINT))) AS INT) AS ham
      |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      |WHERE a.vec_id < 100 ORDER BY qid""".stripMargin))

  // ------------------------------------------------------------------
  // Oracle-verifiable LSH (md5-hyperplane twin of sim_lsh_buckets, the
  // same relationship dedup_minhash_oracle has to the xxhash pipeline):
  // hyperplane weights derive from md5("plane:dim") — 1024 constants the
  // Scala side precomputes with MessageDigest and the oracle recomputes
  // with DuckDB's md5() + hex fold. Sketch → bucket join → exact top-1
  // re-rank inside the bucket, the full ANN search path hash-verified.
  // Queries whose bucket is a singleton drop out of the inner join (an
  // honest property of LSH recall). 8 planes (256 buckets over 1k isotropic
  // vectors, ~4 per bucket) — 16 planes made every bucket a singleton and
  // the result degenerate.
  private val OPlanes = 8

  /** (first 15 md5 hex chars of "p:i" as a long) % 1000 - 500 — identical
    * to the oracle's strpos/fold restatement. */
  private def planeWeight(p: Int, i: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000 - 500
  }

  val lshOracle: Q = Q(
    "sim_lsh_oracle",
    (s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), quant(col("embedding")).as("qv"))
        .withColumn("n2", dotL(col("qv"), col("qv")))
      val bits = (0 until OPlanes).map { p =>
        val w = array((1 to 64).map(i => lit(planeWeight(p, i))): _*)
        when(dotL(col("qv"), w) > 0, lit(1L << p)).otherwise(lit(0L))
      }
      val sk = e.withColumn("bucket", bits.reduce(_.bitwiseOR(_)))
      val q = sk.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qid"), col("bucket"),
          col("qv").as("q"), col("n2").as("nq"))
      val c = sk.select(col("vec_id").as("cid"), col("bucket").as("cb"),
        col("qv").as("c"), col("n2").as("nc"))
      val cos = dotL(col("q"), col("c")).cast(DoubleType) /
        sqrt(col("nq").cast(DoubleType)) / sqrt(col("nc").cast(DoubleType))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      q.join(c, col("bucket") === col("cb") && col("qid") =!= col("cid"))
        .select(col("qid"), col("bucket"), col("cid"), cos.as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("qid"), col("bucket"), col("cid").as("nn"), col("cos"))
        .orderBy(col("qid"))
    },
    Some(s"""WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |w AS (
      |  SELECT p.p AS p, i.i AS i,
      |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, 16), j -> CAST(strpos('0123456789abcdef',
      |        substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), j, 1)) - 1 AS BIGINT))),
      |      (a, b) -> a * 16 + b) % 1000) - 500 AS wt
      |  FROM range(0, $OPlanes) p(p), range(1, 65) i(i)),
      |proj AS (
      |  SELECT q.vec_id, w.p, SUM(q.v[w.i] * w.wt) AS proj
      |  FROM q, w GROUP BY q.vec_id, w.p),
      |buck AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) << p
      |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id),
      |qv AS (SELECT b.vec_id, b.bucket, q.v FROM buck b JOIN q ON b.vec_id = q.vec_id),
      |pairs AS (
      |  SELECT a.vec_id AS qid, a.bucket, b.vec_id AS cid,
      |    CAST(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) AS DOUBLE)
      |      / sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) AS DOUBLE))
      |      / sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE)) AS cos
      |  FROM qv a JOIN qv b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      |  WHERE a.vec_id < 30),
      |ranked AS (
      |  SELECT qid, bucket, cid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
      |  FROM pairs)
      |SELECT qid, bucket, cid AS nn, cos
      |FROM ranked WHERE rn = 1 ORDER BY qid""".stripMargin))

  // ------------------------------------------------------------------
  // Matryoshka funnel (Kusupati et al., "Matryoshka Representation
  // Learning", NeurIPS 2022): MRL-trained embeddings concentrate signal in
  // the prefix dims, so ANN searches the 16-dim PREFIX (4× less compute +
  // memory traffic per candidate), keeps a shortlist, and re-ranks only
  // the shortlist at full 64 dims. The query reports the funnel's top-10
  // per query AND whether each hit is in the exact full-dim top-10 —
  // measured recall is part of the operator's contract, not a side note.
  // Integer-quantized L2 end to end → DuckDB-oracle-exact.
  //
  // Plan shape: queries broadcast twice (prefix pass, re-rank pass);
  // the corpus is touched once at 16 dims (the point of the funnel) and
  // once more only for the ground-truth evaluation frame.
  private val MrlPrefix = 16
  private val MrlQueries = 3
  private val MrlShort = 20
  private val MrlK = 10

  val matryoshka: Q = Q(
    "sim_matryoshka",
    (s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), quant(col("embedding")).as("qv"))
        .withColumn("pv", slice(col("qv"), 1, MrlPrefix))
      val queries = broadcast(e.filter(col("vec_id") < MrlQueries)
        .select(col("vec_id").as("qid"), col("qv").as("qfull"), col("pv").as("qpre")))
      def sq(a: Column, b: Column): Column =
        graft.functions.VectorExprs.sqDistLong(a, b)
      val wPre = Window.partitionBy(col("qid"))
        .orderBy(col("d2_prefix"), col("vec_id"))
      val short = e.crossJoin(queries)
        .withColumn("d2_prefix", sq(col("pv"), col("qpre")))
        .withColumn("prn", row_number().over(wPre))
        .filter(col("prn") <= MrlShort)
        .select(col("qid"), col("vec_id"), col("d2_prefix"))
      val wFull = Window.partitionBy(col("qid"))
        .orderBy(col("d2_full"), col("vec_id"))
      val funnel = e.join(broadcast(short), Seq("vec_id"))
        .join(queries.select(col("qid").as("q2"), col("qfull")),
          col("qid") === col("q2"))
        .withColumn("d2_full", sq(col("qv"), col("qfull")))
        .withColumn("rank", row_number().over(wFull))
        .filter(col("rank") <= MrlK)
        .select(col("qid"), col("rank"), col("vec_id"),
          col("d2_full"), col("d2_prefix"))
      // ground truth: exact full-dim top-10 (evaluation frame)
      val exact = e.crossJoin(queries)
        .withColumn("d2_full", sq(col("qv"), col("qfull")))
        .withColumn("rank", row_number().over(wFull))
        .filter(col("rank") <= MrlK)
        .select(col("qid").as("eqid"), col("vec_id").as("evid"), lit(1).as("hit"))
      funnel.join(exact,
          col("qid") === col("eqid") && col("vec_id") === col("evid"), "left")
        .select(col("qid"), col("rank"), col("vec_id"),
          col("d2_full"), col("d2_prefix"),
          coalesce(col("hit"), lit(0)).as("in_exact_topk"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |pre AS (SELECT vec_id, v, v[1:$MrlPrefix] AS p FROM q),
      |qs AS (
      |  SELECT vec_id AS qid, v AS qfull, p AS qpre FROM pre
      |  WHERE vec_id < $MrlQueries),
      |short AS (
      |  SELECT qid, vec_id, d2_prefix FROM (
      |    SELECT qs.qid, pre.vec_id,
      |      CAST(list_sum(list_transform(range(1, ${MrlPrefix + 1}),
      |        i -> (p[i] - qpre[i]) * (p[i] - qpre[i]))) AS BIGINT) AS d2_prefix,
      |      row_number() OVER (PARTITION BY qs.qid ORDER BY
      |        CAST(list_sum(list_transform(range(1, ${MrlPrefix + 1}),
      |          i -> (p[i] - qpre[i]) * (p[i] - qpre[i]))) AS BIGINT),
      |        pre.vec_id) AS prn
      |    FROM pre CROSS JOIN qs) WHERE prn <= $MrlShort),
      |funnel AS (
      |  SELECT qid, rank, vec_id, d2_full, d2_prefix FROM (
      |    SELECT short.qid, short.vec_id, short.d2_prefix,
      |      CAST(list_sum(list_transform(range(1, 65),
      |        i -> (pre.v[i] - qs.qfull[i]) * (pre.v[i] - qs.qfull[i]))) AS BIGINT)
      |        AS d2_full,
      |      row_number() OVER (PARTITION BY short.qid ORDER BY
      |        CAST(list_sum(list_transform(range(1, 65),
      |          i -> (pre.v[i] - qs.qfull[i]) * (pre.v[i] - qs.qfull[i]))) AS BIGINT),
      |        short.vec_id) AS rank
      |    FROM short
      |    JOIN pre ON pre.vec_id = short.vec_id
      |    JOIN qs ON qs.qid = short.qid) WHERE rank <= $MrlK),
      |exact AS (
      |  SELECT qid AS eqid, vec_id AS evid FROM (
      |    SELECT qs.qid, pre.vec_id,
      |      row_number() OVER (PARTITION BY qs.qid ORDER BY
      |        CAST(list_sum(list_transform(range(1, 65),
      |          i -> (pre.v[i] - qs.qfull[i]) * (pre.v[i] - qs.qfull[i]))) AS BIGINT),
      |        pre.vec_id) AS rank
      |    FROM pre CROSS JOIN qs) WHERE rank <= $MrlK)
      |SELECT qid, CAST(rank AS INT) AS rank, vec_id, d2_full, d2_prefix,
      |  CASE WHEN evid IS NULL THEN 0 ELSE 1 END AS in_exact_topk
      |FROM funnel LEFT JOIN exact ON qid = eqid AND vec_id = evid
      |ORDER BY qid, rank""".stripMargin))

  // ------------------------------------------------------------------
  // Random projection (Johnson–Lindenstrauss shape) — 64 → 16 dims with a
  // ±1 sign matrix derived from an engine-neutral affine hash, so the
  // whole reduction is integer-exact and the oracle replays every
  // projected coordinate (md5-pinned) plus both norms. For a ±1 matrix
  // E[p_k²] = ‖q‖² holds exactly, and the corpus-level ratio
  // Σ‖p‖²/16 / Σ‖q‖² measures 1.014 at sf0.1 — but the PER-VECTOR
  // distortion on THIS corpus is heavy-tailed (median 51%, p99 286%,
  // measured): the embeddings are cluster-dominated/low-rank, so a
  // single fixed sign matrix concentrates poorly per vector. That is the
  // honest JL story — the guarantee is probabilistic over the matrix
  // draw and kicks in with more target dims — so the query pins the
  // exact arithmetic and norms, and OperatorSpec pins the AGGREGATE
  // norm/distance preservation (which is what downstream ANN recall
  // actually rides on). No per-vector boolean is claimed.
  //
  // 100 TB shape: a pure narrow map — 16 fused integer dot products per
  // row inside codegen'd higher-order functions; nothing shuffles. This
  // is the cheap front end that lets every downstream ANN stage (LSH,
  // IVF, brute force rerank) run at 1/4 the dimensionality.
  private val ProjDims = 16
  private val SrcDims = 64

  val randomProjection: Q = Q(
    "sim_random_projection",
    (s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"),
          graft.functions.VectorExprs.quantize1000(col("embedding")).as("qv"))
      val sign: (Column, Column) => Column = (k, j) =>
        when(((k * 37 + (j - 1) * 101) % 97 % 2) === 0, lit(1L))
          .otherwise(lit(-1L))
      val pv = transform(sequence(lit(0), lit(ProjDims - 1)), k =>
        aggregate(sequence(lit(1), lit(SrcDims)), lit(0L), (acc, j) =>
          acc + sign(k, j) * element_at(col("qv"), j)))
      val qn = aggregate(col("qv"), lit(0L), (a, x) => a + x * x)
      val pn = aggregate(col("pv"), lit(0L), (a, x) => a + x * x)
      e.select(col("vec_id"), pv.as("pv"), qn.as("q_norm2"))
        .select(col("vec_id"),
          md5(array_join(transform(col("pv"), _.cast(StringType)), " "))
            .as("proj_md5"),
          col("q_norm2"), pn.as("p_norm2"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |p AS (
      |  SELECT vec_id, qv,
      |    list_transform(range(0, $ProjDims), k ->
      |      list_sum(list_transform(range(1, ${SrcDims + 1}), j ->
      |        (CASE WHEN ((k * 37 + (j - 1) * 101) % 97) % 2 = 0
      |              THEN 1 ELSE -1 END) * qv[CAST(j AS INT)]))) AS pv
      |  FROM q)
      |SELECT vec_id,
      |  md5(array_to_string(pv, ' ')) AS proj_md5,
      |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_norm2,
      |  CAST(list_sum(list_transform(pv, x -> x * x)) AS BIGINT) AS p_norm2
      |FROM p ORDER BY vec_id""".stripMargin))

  // ------------------------------------------------------------------
  // Hard-negative mining — the contrastive-training data prep step: for
  // each anchor, the closest SAME-label vector (the positive) and the
  // closest DIFFERENT-label vector (the hard negative), plus the margin
  // between them. Triplet-loss/InfoNCE pipelines feed on exactly these
  // rows; a negative that outranks the positive (margin < 0) is the
  // "hard" case worth oversampling. One broadcast of the bounded anchor
  // slice against the corpus, one integer-exact cosine per pair, ONE
  // window partitioned by (anchor, same-label side) — both argmaxes fall
  // out of a single rank pass, then a conditional aggregate folds the two
  // winners into one row. Anchors are a bounded slice (the recall-audit
  // discipline); at 100 TB the candidate generator swaps to the IVF/LSH
  // banded index while this exact broadcast form stays the per-slice
  // ground truth.
  val hardNegatives: Q = Q(
    "sim_hard_negatives",
    (s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"), col("label"), quant(col("embedding")).as("qv"))
        .withColumn("n2", dotL(col("qv"), col("qv")))
      val anchors = broadcast(
        e.filter(col("vec_id") >= 30 && col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("label").as("label_a"),
            col("qv").as("q"), col("n2").as("nq")))
      val cos = dotL(col("q"), col("qv")).cast(DoubleType) /
        sqrt(col("nq").cast(DoubleType)) / sqrt(col("n2").cast(DoubleType))
      val w = Window.partitionBy(col("qid"), col("is_pos"))
        .orderBy(col("ccos").desc, col("vec_id"))
      anchors.join(e, col("qid") =!= col("vec_id"))
        .withColumn("ccos", cos)
        .withColumn("is_pos", col("label") === col("label_a"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("qid"), col("label_a"))
        .agg(
          max(when(col("is_pos"), col("vec_id"))).as("pos_id"),
          max(when(col("is_pos"), col("ccos"))).as("pos_cos"),
          max(when(!col("is_pos"), col("vec_id"))).as("neg_id"),
          max(when(!col("is_pos"), col("ccos"))).as("neg_cos"))
        .select(col("qid"), col("label_a"), col("pos_id"), col("pos_cos"),
          col("neg_id"), col("neg_cos"),
          (col("pos_cos") - col("neg_cos")).as("margin"))
        .orderBy(col("qid"))
    },
    Some("""WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, v,
      |    CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2
      |  FROM e),
      |a AS (SELECT vec_id AS qid, label AS label_a, v AS q, n2 AS nq
      |      FROM n WHERE vec_id >= 30 AND vec_id < 50),
      |p AS (
      |  SELECT a.qid, a.label_a, n.vec_id, n.label = a.label_a AS is_pos,
      |    CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * n.v[i])) AS DOUBLE)
      |      / sqrt(CAST(a.nq AS DOUBLE)) / sqrt(CAST(n.n2 AS DOUBLE)) AS ccos
      |  FROM a JOIN n ON n.vec_id <> a.qid),
      |r AS (
      |  SELECT qid, label_a, vec_id, is_pos, ccos,
      |    ROW_NUMBER() OVER (PARTITION BY qid, is_pos
      |      ORDER BY ccos DESC, vec_id) AS rn
      |  FROM p)
      |SELECT qid, label_a,
      |  MAX(CASE WHEN is_pos THEN vec_id END) AS pos_id,
      |  MAX(CASE WHEN is_pos THEN ccos END) AS pos_cos,
      |  MAX(CASE WHEN NOT is_pos THEN vec_id END) AS neg_id,
      |  MAX(CASE WHEN NOT is_pos THEN ccos END) AS neg_cos,
      |  MAX(CASE WHEN is_pos THEN ccos END)
      |    - MAX(CASE WHEN NOT is_pos THEN ccos END) AS margin
      |FROM r WHERE rn = 1 GROUP BY qid, label_a ORDER BY qid""".stripMargin))

  val all: Seq[Q] = Seq(topkQuantized, bruteforce, lshBuckets, lshOracle,
    vectorExprs, matryoshka, randomProjection, hardNegatives)
}
