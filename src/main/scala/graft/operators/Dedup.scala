package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators over `documents`: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash.
  *
  * The testdata corpus has no duplicate texts, so the dup-finding queries
  * run against `documents ∪ perturbed(documents)` — each doc unioned with a
  * near-copy (id + 2_000_000, last token dropped / text unchanged for the
  * exact case). That makes every query's result non-trivial and, for the
  * exact/Jaccard variants, still DuckDB-oracle-expressible.
  *
  * Scale design:
  *  - exact dedup: hash-groupBy on the text (or a hash of it) — one shuffle;
  *    at 100 TB group on xxhash64(text) first so the shuffle carries 8-byte
  *    keys, not document bodies (`dedupExactByHash`).
  *  - n-gram Jaccard: candidate pairs come from an equi-join on a blocking
  *    key (here `source`), never a full cross join.
  *  - MinHash+LSH: signatures are a narrow map; candidate generation is an
  *    equi-join on (band, band-hash) buckets — the classic shingle→minhash→
  *    band→bucket-join pipeline, linear shuffle volume in corpus size.
  *  - SimHash: narrow map producing one 64-bit key per doc; near-dup lookup
  *    is a self-join on rotated prefixes (not materialized here).
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** corpus ∪ near-copies: id+2e6, last whitespace token dropped. */
  private def withNearCopies(d: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    d.select(col("doc_id"), col("text"))
      .unionAll(d.select(
        (col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ", slice(t, lit(1), size(t) - 1)).as("text")))
  }

  /** corpus ∪ exact copies (id+1e6). */
  private def withExactCopies(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text"))
      .unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

  // ------------------------------------------------------------------
  // exact dedup: group by text, keep the smallest id. At scale, group by
  // xxhash64(text) instead so the shuffle key is 8 bytes (collision check
  // optional second pass) — that variant is `dedupExactByHash`.
  val exact: Q = Q(
    "dedup_exact",
    (s, dir) => withExactCopies(docs(s, dir))
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id")),
    Some("""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
      |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM all_docs GROUP BY text ORDER BY keep_id""".stripMargin))

  /** Scale path for exact dedup: 8-byte shuffle keys. Not oracle-bound
    * (xxhash64 is Spark-specific); exercised by unit tests and bench. */
  def dedupExactByHash(d: DataFrame): DataFrame =
    d.withColumn("_h", xxhash64(col("text")))
      .groupBy(col("_h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("_h")

  // ------------------------------------------------------------------
  // n-gram Jaccard near-dup: block on `source`-like key (here: both halves
  // of the perturbed corpus share doc_id%500-ish blocks via original id),
  // compare distinct-token sets. Integer set sizes → exact oracle.
  // Candidate blocking: pair each original with its own near-copy id space
  // block — an equi-join, not a cross join.
  val ngramJaccard: Q = Q(
    "dedup_ngram_jaccard",
    (s, dir) => {
      val base = withNearCopies(docs(s, dir))
        .withColumn("block", col("doc_id") % 2000000L)
        .withColumn("toks", array_distinct(split(col("text"), " ")))
      val a = base.select(col("block"), col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = base.select(col("block"), col("doc_id").as("id_b"), col("toks").as("toks_b"))
      a.join(b, Seq("block"))
        .filter(col("id_a") < col("id_b"))
        .select(
          col("id_a"), col("id_b"),
          size(array_intersect(col("toks_a"), col("toks_b"))).as("n_inter"),
          size(array_union(col("toks_a"), col("toks_b"))).as("n_union"),
          (size(array_intersect(col("toks_a"), col("toks_b"))).cast(DoubleType) /
            size(array_union(col("toks_a"), col("toks_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
      |  FROM documents),
      |base AS (
      |  SELECT doc_id % 2000000 AS block, doc_id,
      |    list_distinct(string_split(text, ' ')) AS toks
      |  FROM all_docs),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS n_inter,
      |    CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS INT) AS n_union
      |  FROM base a JOIN base b ON a.block = b.block AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, n_inter, n_union,
      |  CAST(n_inter AS DOUBLE) / n_union AS jaccard
      |FROM pairs
      |WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.5
      |ORDER BY id_a, id_b""".stripMargin))

  // ------------------------------------------------------------------
  // Edit-distance near-dup: levenshtein over blocked candidate pairs — the
  // character-level complement to token-level Jaccard (catches typo-class
  // duplicates tokenization misses). Blocking keeps it off the N² path;
  // the distance itself is Spark's codegen'd built-in. Near-copies drop the
  // last token, so the distance to the original is that token's length +1
  // (the space) — small for short tails, which the <= 8 cut selects.
  val editDistance: Q = Q(
    "dedup_edit_distance",
    (s, dir) => {
      val base = withNearCopies(docs(s, dir))
        .withColumn("block", col("doc_id") % 2000000L)
      // The corpus arrives as ONE parquet split per union branch, so the
      // broadcast-join probe (where the per-pair levenshtein actually
      // runs) would execute on 2 cores. Spread the probe side first —
      // the distance evaluation dominates this operator, not the join.
      val a = base.select(col("block"), col("doc_id").as("id_a"), col("text").as("text_a"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = base.select(col("block"), col("doc_id").as("id_b"), col("text").as("text_b"))
      a.join(b, Seq("block"))
        .filter(col("id_a") < col("id_b"))
        // thresholded levenshtein: band-limited DP with early exit, O(8·n)
        // per pair instead of O(n·m) — identical distances for surviving
        // pairs, -1 (filtered like >8) beyond the band. At 100 TB the
        // pairwise stage only ever runs inside LSH/blocking candidates,
        // and the threshold bound is what keeps it linear in text length.
        .select(col("id_a"), col("id_b"),
          levenshtein(col("text_a"), col("text_b"), 8).as("dist"))
        .filter(col("dist").between(0, 8))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
      |  FROM documents),
      |base AS (SELECT doc_id % 2000000 AS block, doc_id, text FROM all_docs),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(levenshtein(a.text, b.text) AS INT) AS dist
      |  FROM base a JOIN base b ON a.block = b.block AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, dist FROM pairs WHERE dist <= 8
      |ORDER BY id_a, id_b""".stripMargin))

  // ------------------------------------------------------------------
  // Near-dup CLUSTERING: similarity pairs are only half of dedup — the
  // pipeline needs one cluster id per doc to keep a single representative.
  // Three corpus variants (original, last-token-dropped id+2e6,
  // first-token-dropped id+4e6) make closure transitive-only: both copies
  // are near-dups of the original but not necessarily of each other, so a
  // pairwise filter alone would under-merge. Edges = blocked Jaccard ≥ 0.5;
  // clusters = ConnectedComponents (min-label propagation); the oracle
  // recomputes the same closure with a recursive CTE.
  /** The 3-variant corpus similarity graph shared by the clustering and
    * survivor queries: (Jaccard ≥ 0.5 blocked edges, full node set,
    * corpus (doc_id, text, …)). */
  private def ccCorpusGraph(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (edges, nodes) = ccEdgesShared(s, dir)
    (edges, nodes, ccCorpusBase(s, dir))
  }

  private def ccCorpusBase(s: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val d = docs(s, dir)
    // withNearCopies supplies the first two variants (one definition to
    // keep in sync with the oracle SQL prefix); only the third
    // (first-token-dropped, id+4e6) is specific to the CC graph
    withNearCopies(d)
      .unionAll(d.select((col("doc_id") + 4000000L).as("doc_id"),
        concat_ws(" ", slice(t, lit(2), size(t) - 1)).as("text")))
      .withColumn("block", col("doc_id") % 2000000L)
      .withColumn("toks", array_distinct(split(col("text"), " ")))
  }

  /** The blocked-Jaccard edge set + node list, memoized per (session,
    * dir) since r16: `ccShared` (min-label CC) and `dedup_cc_star`
    * (star CC) both consume the IDENTICAL graph — only the labelling
    * ALGORITHM is under test in the star twin, so each previously
    * re-running the token-array block join paid the edge generation
    * twice. Eager localCheckpoints: two longs per edge / one per node.
    * The Jaccard gate is the exact integer form (J ≥ 1/2 ⟺ 3·|∩| ≥
    * |a| + |b| since |∪| = |a| + |b| − |∩| on distinct arrays) — ONE
    * array_intersect per pair instead of intersect + union, same rows
    * (both comparisons are exact at these cardinalities). */
  private val ccEdgesShared =
    new graft.SessionMemo[(DataFrame, DataFrame)]({ (s, dir) =>
    val base = ccCorpusBase(s, dir)
    val a = base.select(col("block"), col("doc_id").as("src"), col("toks").as("toks_a"))
    val b = base.select(col("block"), col("doc_id").as("dst"), col("toks").as("toks_b"))
    val edges = a.join(b, Seq("block"))
      .filter(col("src") < col("dst"))
      .filter(lit(3) * size(array_intersect(col("toks_a"), col("toks_b")))
        >= size(col("toks_a")) + size(col("toks_b")))
      .select(col("src"), col("dst"))
    (edges.localCheckpoint(true),
      base.select(col("doc_id").as("id")).localCheckpoint(true))
  })

  /** Shared oracle prefix: the 3-variant corpus, its Jaccard edges, and
    * the recursive label closure (through the `reach` CTE). */
  private val ccOracleCtes: String =
    """WITH RECURSIVE all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 4000000,
      |    array_to_string(string_split(text, ' ')[2:len(string_split(text, ' '))], ' ')
      |  FROM documents),
      |base AS (
      |  SELECT doc_id % 2000000 AS block, doc_id,
      |    list_distinct(string_split(text, ' ')) AS toks
      |  FROM all_docs),
      |pairs AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM base a JOIN base b ON a.block = b.block AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5),
      |edges AS (
      |  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
      |reach AS (
      |  SELECT doc_id AS node, doc_id AS lbl FROM all_docs
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)""".stripMargin

  /** Session-memoized CC labelling of the 3-variant corpus graph — the
    * exactPairsShared discipline: `dedup_cc_clusters`, `dedup_survivors`,
    * and `dedup_quality_survivors` all consume the identical (id, cluster)
    * frame, so the iterative CC drive runs once per session. Eager
    * localCheckpoint = block-manager-resident (the bench's per-sweep
    * clearCache can't drop it); two longs per corpus row. `dedup_cc_star`
    * deliberately keeps its own drive — it exists to prove the OTHER
    * algorithm reaches the same labelling. */
  private val ccShared = new graft.SessionMemo[DataFrame]({ (s, dir) =>
    // Pass the FULL corpus as the node set: a doc with no similarity edge
    // must still get a (singleton) cluster id, or downstream keep-one-per-
    // cluster would silently drop every unique document.
    val (edges, nodes, _) = ccCorpusGraph(s, dir)
    graft.plans.ConnectedComponents.run(edges, nodes = Some(nodes))
      .localCheckpoint(true)
  })

  val ccClusters: Q = Q(
    "dedup_cc_clusters",
    (s, dir) => ccShared(s, dir)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
        .orderBy(col("doc_id")),
    Some(s"""$ccOracleCtes
      |SELECT node AS doc_id, MIN(lbl) AS cluster_id
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin))

  /** Same clustering through the alternating large-star/small-star path
    * ([[graft.plans.ConnectedComponents.runStar]]) — the O(log² n)-round
    * variant for graphs whose diameter min-label propagation can't afford.
    * Same graph, same oracle, same expected clusters: the oracle-hash
    * equality IS the proof the two algorithms agree end-to-end on the
    * corpus. */
  val ccClustersStar: Q = Q(
    "dedup_cc_star",
    (s, dir) => {
      val (edges, nodes, _) = ccCorpusGraph(s, dir)
      graft.plans.ConnectedComponents.runStar(edges, nodes = Some(nodes))
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
        .orderBy(col("doc_id"))
    },
    ccClusters.oracle)

  // ------------------------------------------------------------------
  // Dedup SURVIVORS — the pipeline endpoint the clustering exists for:
  // keep one canonical representative per near-dup cluster (the min-id
  // member, which under min-label CC is the cluster label itself) and
  // materialize the surviving corpus' stats, md5-pinning each survivor's
  // text so the oracle hash certifies the exact kept corpus. n_members
  // carries the provenance (how many variants each survivor absorbed).
  //
  // 100 TB shape: CC's cost (see dedup_cc_*); past that, one
  // cluster-cardinality count agg and one doc-id equi-join back to the
  // corpus — both map-side-combinable/broadcastable, nothing new shuffles
  // the text except the survivor rows themselves.
  val survivors: Q = Q(
    "dedup_survivors",
    (s, dir) => {
      val (_, _, corpus) = ccCorpusGraph(s, dir)
      val cc = ccShared(s, dir)
      val members = cc.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"))
      corpus.join(members, corpus("doc_id") === members("cluster"))
        .select(col("cluster").as("survivor_id"), col("n_members"),
          size(split(col("text"), " ")).as("n_tokens"),
          md5(col("text")).as("text_md5"))
        .orderBy(col("survivor_id"))
    },
    Some(s"""$ccOracleCtes,
      |clusters AS (
      |  SELECT node AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY node),
      |m AS (
      |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
      |  FROM clusters GROUP BY cluster)
      |SELECT m.cluster AS survivor_id, m.n_members,
      |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
      |  md5(d.text) AS text_md5
      |FROM m JOIN all_docs d ON d.doc_id = m.cluster
      |ORDER BY survivor_id""".stripMargin))

  // ------------------------------------------------------------------
  // Quality-aware survivor selection — the real pipelines don't keep the
  // min-id member of a near-dup cluster, they keep the BEST one (FineWeb/
  // RefinedWeb keep the longest / highest-scoring variant, because the
  // duplicates are truncations, boilerplate-injected rehosts, or scrapes
  // of the same page). Survivor = argmax over the cluster by an integer
  // quality score (tokens·1000 + stopword hits — longer and more natural
  // text wins), tie → min doc_id. On THIS corpus the variants are strict
  // token-dropped subsets so the winner coincides with the original; the
  // argmax machinery is what the driver checks (score join, per-cluster
  // ranking, deterministic tie-break), and the spec plants a cluster whose
  // best member is NOT the min id to prove the policy differs from
  // dedup_survivors.
  //
  // 100 TB shape: CC's cost (see dedup_cc_*); past that, the score is a
  // narrow map on the corpus and the argmax is one ranking window
  // partitioned by cluster — no new shuffle shape beyond the clustering.
  private val qsStop = Seq("the", "a", "of", "and", "to", "in")

  /** argmax-by-quality per cluster; split out so the spec can feed a
    * planted (cc, corpus) where the best member is not the min id. */
  private[graft] def bestQualitySurvivors(cc: DataFrame,
      corpus: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val score = (size(t).cast(LongType) * 1000L +
      size(filter(t, w => w.isin(qsStop: _*)))).as("score")
    val scored = cc.select(col("id").as("doc_id"), col("cluster"))
      .join(corpus.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("cluster"), col("text"), score)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("score").desc, col("doc_id"))
    val members = scored.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(members, "cluster")
      .select(col("cluster").as("cluster_id"), col("doc_id").as("survivor_id"),
        col("score"), col("n_members"), md5(col("text")).as("text_md5"))
      .orderBy(col("cluster_id"))
  }

  // ------------------------------------------------------------------
  // Cluster-size distribution — the dedup diagnostic every curation run
  // reports before committing to a threshold: how many clusters of each
  // size exist, how many documents they hold, and how many tokens dedup
  // would remove (cluster members minus the one survivor). A heavy tail
  // here means boilerplate or a scraping loop; a spike at size k means a
  // systematic k-way duplication (this corpus plants exactly k=3).
  //
  // 100 TB shape: two hash aggs over the shared CC labelling (cluster →
  // size, then size → stats) — both map-side-combinable, output bounded
  // by the largest cluster size.
  val clusterStats: Q = Q(
    "dedup_cluster_stats",
    (s, dir) => {
      val (_, _, corpus) = ccCorpusGraph(s, dir)
      val toksOf = corpus.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      val perCluster = ccShared(s, dir)
        .join(toksOf, col("id") === col("doc_id"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("sz"), sum(col("n_tok")).as("tok"),
          // survivor = min id = the cluster label under min-label CC; its
          // tokens are what dedup KEEPS
          sum(when(col("id") === col("cluster"), col("n_tok"))
            .otherwise(0L)).as("kept_tok"))
      perCluster.groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz")).as("n_docs"),
          sum(col("tok")).as("n_tokens"),
          sum(col("tok") - col("kept_tok")).as("tokens_removed"))
        .orderBy(col("cluster_size"))
    },
    Some(s"""$ccOracleCtes,
      |clusters AS (
      |  SELECT node AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY node),
      |tk AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM all_docs),
      |per_cluster AS (
      |  SELECT c.cluster, CAST(COUNT(*) AS BIGINT) AS sz,
      |    CAST(SUM(tk.n_tok) AS BIGINT) AS tok,
      |    CAST(SUM(CASE WHEN c.doc_id = c.cluster THEN tk.n_tok ELSE 0 END) AS BIGINT) AS kept_tok
      |  FROM clusters c JOIN tk ON tk.doc_id = c.doc_id
      |  GROUP BY c.cluster)
      |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(SUM(sz) AS BIGINT) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(tok - kept_tok) AS BIGINT) AS tokens_removed
      |FROM per_cluster GROUP BY sz ORDER BY cluster_size""".stripMargin))

  val qualitySurvivors: Q = Q(
    "dedup_quality_survivors",
    (s, dir) => {
      val (_, _, corpus) = ccCorpusGraph(s, dir)
      bestQualitySurvivors(ccShared(s, dir), corpus)
    },
    Some(s"""$ccOracleCtes,
      |clusters AS (
      |  SELECT node AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY node),
      |scored AS (
      |  SELECT c.doc_id, c.cluster,
      |    CAST(len(string_split(d.text, ' ')) AS BIGINT) * 1000
      |      + len(list_filter(string_split(d.text, ' '),
      |          w -> w IN (${qsStop.map(w => s"'$w'").mkString(", ")}))) AS score,
      |    md5(d.text) AS text_md5
      |  FROM clusters c JOIN all_docs d ON d.doc_id = c.doc_id),
      |m AS (
      |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
      |  FROM scored GROUP BY cluster)
      |SELECT s.cluster AS cluster_id, s.doc_id AS survivor_id, s.score,
      |  m.n_members, s.text_md5
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY cluster ORDER BY score DESC, doc_id) AS rn
      |  FROM scored) s
      |JOIN m ON m.cluster = s.cluster
      |WHERE s.rn = 1 ORDER BY cluster_id""".stripMargin))

  // ------------------------------------------------------------------
  // MinHash + LSH: shingle → 32 minhashes → 8 bands × 4 rows → bucket join.
  // Hashes are xxhash64 (Spark-native, codegen'd) so this is rows-only
  // (no oracle); correctness is asserted by unit tests (near-copies land in
  // shared buckets, unrelated docs overwhelmingly don't) and the verified
  // Jaccard query above cross-checks the candidate set semantics.
  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** doc_id → distinct 3-word shingles. Tokenize in its own projection:
    * referencing split() inside the shingle lambda would re-split the
    * document once per shingle (O(tokens²) per doc — measured 10× on this
    * stage). The corpus arrives as one small parquet split, so spread it
    * across all cores first — at scale the source is already partitioned.
    */
  private def shingleDf(d: DataFrame): DataFrame =
    d.repartition(d.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("toks")) - 2, lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(3))))).as("shingles"))

  /** doc_id, shingles(3-word) → minhash signature array of length 32. */
  def minhashSignatures(d: DataFrame): DataFrame = {
    val shingled = shingleDf(d)
    // One string xxhash64 per shingle, exploded to (doc_id, h) rows, then
    // the 32 minhash functions are 32 `min(xxhash64(seed_i, h))` aggregates
    // in a single hash-aggregate pass: map-side partial mins mean the
    // shuffle carries one 32-long signature per doc per mapper — the right
    // shape at any corpus size — and the codegen stays small (32 simple
    // min exprs, vs. 32 array-lambda transforms whose fused method blows
    // past the JIT/Janino sweet spot). Long-rehashing per seed is ANSI-safe
    // (Spark 4 default ANSI mode rejects the wrapping-multiply trick).
    // explode_outer, not explode: plain explode makes the optimizer infer a
    // `size(shingles) > 0` filter (InferFiltersFromGenerate) and push it
    // below the repartition into the parquet scan — re-evaluating the whole
    // shingle expression once per row on the single-split scan, serially.
    // The shingle array is never empty (sequence end is >= 1), so outer
    // explode is semantically identical and keeps the scan clean.
    val exploded = shingled
      .select(col("doc_id"), explode_outer(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val mins = (0 until NumHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    exploded.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Candidate pairs via banded LSH: equal (band, hash-of-band-slice).
    * Signatures ride along through the explode so downstream similarity
    * estimation needs no second join against (and recompute of) the
    * signature table — one signature pass, one bucket equi-join.
    */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map { b =>
        hash(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand))
      }: _*)).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      // a pair can collide in several bands — keep one copy
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
  }

  val minhashLsh: Q = Q(
    "dedup_minhash_lsh",
    (s, dir) => {
      val corpus = withNearCopies(docs(s, dir))
      // Persist the signatures: the LSH self-join consumes them on both
      // sides, and without materialization each side would recompute the
      // full shingle→32-hash pipeline. Signatures are 32 longs per doc —
      // tiny next to the corpus — so caching them is the right trade at
      // any scale (disk-spillable if executors are tight).
      val sigs = minhashSignatures(corpus)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // estimated similarity = fraction of matching minhashes
      lshCandidates(sigs)
        .select(col("id_a"), col("id_b"),
          aggregate(
            zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).as("n_match_hashes"))
        .orderBy(col("id_a"), col("id_b"))
    },
    None)

  // ------------------------------------------------------------------
  // SimHash: 64-bit signature; bit j is the sign of the sum over tokens of
  // ±1 according to bit j of the token hash. Narrow map; rows-only.
  def simhash(tokensCol: Column): Column = {
    val hashes = transform(array_distinct(tokensCol), w => xxhash64(w))
    val bits = (0 until 64).map { j =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  val simhashQ: Q = Q(
    "dedup_simhash",
    (s, dir) => {
      val corpus = withNearCopies(docs(s, dir))
      corpus.select(col("doc_id"), simhash(split(col("text"), " ")).as("simhash64"))
        .orderBy(col("doc_id"))
    },
    None)

  /** SimHash near-dup pairs: per-original hamming distance to its planted
    * near-copy via the codegen'd Hamming64 expression — the simhash lookup
    * join (at scale the join key is a rotated-prefix bucket; here the
    * planted-pair join keeps the result deterministic and test-assertable).
    */
  val simhashPairs: Q = Q(
    "dedup_simhash_pairs",
    (s, dir) => {
      graft.functions.Hamming64.register(s)
      val corpus = withNearCopies(docs(s, dir))
      val sigs = corpus.select(col("doc_id"), simhash(split(col("text"), " ")).as("sh"))
      val orig = sigs.filter(col("doc_id") < 2000000L)
        .select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val copies = sigs.filter(col("doc_id") >= 2000000L)
        .select((col("doc_id") - 2000000L).as("id_a"), col("sh").as("sh_b"))
      orig.join(copies, "id_a")
        .select(col("id_a"), expr("hamming64(sh_a, sh_b)").as("hamming"))
        .orderBy(col("id_a"))
    },
    None)

  // ------------------------------------------------------------------
  // Oracle-verifiable MinHash+LSH: hash = first 15 hex digits of md5 mod P
  // (md5 is identical in both engines; the hex fold equals conv(hex,16,10)
  // mod P), 32 affine re-mixes mod P (products stay < 2^63, ANSI-safe),
  // 8 bands × 4 rows with a mod-P polynomial bucket hash. The ENTIRE
  // shingle → signature → band → bucket-join → similarity-estimate pipeline
  // hash-matches DuckDB — not just spot-checked. xxhash64 variant above
  // stays as the fast production path.
  private val P = 1000000007L
  private def mixA(i: Int): Long = 2L * i + 1
  private def mixB(i: Int): Long = 7919L * i + 13

  def md5MinhashSignatures(d: DataFrame): DataFrame = {
    val hl = shingleDf(d).select(col("doc_id"),
      transform(col("shingles"),
        sh => (conv(substring(md5(sh), 1, 15), 16, 10).cast(LongType) % P)).as("hl"))
    val sig = array((0 until NumHashes).map { i =>
      array_min(transform(col("hl"), h => (h * mixA(i) + mixB(i)) % P))
    }: _*)
    hl.select(col("doc_id"), sig.as("sig"))
  }

  private def bandBucket(sigCol: Column, b: Int): Column =
    (0 until RowsPerBand)
      .map(j => element_at(sigCol, b * RowsPerBand + j + 1))
      .reduceLeft((acc, x) => (acc * 31 + x) % P)

  /** Banded-LSH candidate pairs over the md5 signature space, with the
    * estimated-similarity witness: unordered (id_a, id_b, n_match). */
  private def md5LshPairs(base: DataFrame): DataFrame = {
    val sigs = md5MinhashSignatures(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map(b => bandBucket(col("sig"), b)): _*))
        .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val nMatch = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
      .select(col("id_a"), col("id_b"), nMatch.as("n_match"))
  }

  val minhashOracle: Q = Q(
    "dedup_minhash_oracle",
    (s, dir) => md5LshPairs(withNearCopies(docs(s, dir)))
      .select(col("id_a"), col("id_b"), col("n_match"),
        (col("n_match").cast(DoubleType) / NumHashes).as("est_sim"))
      .orderBy(col("id_a"), col("id_b")),
    Some {
      val sigExprs = (0 until NumHashes).map { i =>
        s"list_min(list_transform(hl, h -> (h * ${mixA(i)} + ${mixB(i)}) % $P))"
      }.mkString(",\n    ")
      def bucketSql(b: Int): String =
        (0 until RowsPerBand).map(j => s"sig[${b * RowsPerBand + j + 1}]")
          .reduceLeft((acc, x) => s"(($acc) * 31 + $x) % $P")
      val bandSelects = (0 until Bands).map { b =>
        s"SELECT doc_id, sig, $b AS band, ${bucketSql(b)} AS bucket FROM sigs"
      }.mkString("\n  UNION ALL ")
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        |shing AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS sh
        |  FROM toks),
        |mdl AS (SELECT doc_id, list_transform(sh, s -> substr(md5(s), 1, 15)) AS ml FROM shing),
        |hl AS (
        |  SELECT doc_id,
        |    list_transform(ml, m -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, 16),
        |          j -> CAST(strpos('0123456789abcdef', substr(m, j, 1)) - 1 AS BIGINT))),
        |      (a, b) -> (a * 16 + b) % $P)) AS hl
        |  FROM mdl),
        |sigs AS (SELECT doc_id, [$sigExprs] AS sig FROM hl),
        |banded AS (
        |  $bandSelects),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) AS INT) AS n_match,
        |  CAST(len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) AS DOUBLE) / $NumHashes AS est_sim
        |FROM cand ORDER BY id_a, id_b""".stripMargin
    })

  // ------------------------------------------------------------------
  // Oracle-verifiable SimHash: 60-bit signature from md5 halves (32-bit +
  // 28-bit hex folds — no mod, values stay < 2^32 so the fold is ANSI-safe
  // and preserves independent bits, unlike the mod-P minhash mix). Bit j
  // votes ±1 per distinct token; exact integer arithmetic end to end.
  val simhashOracle: Q = Q(
    "dedup_simhash_oracle",
    (s, dir) => {
      val corpus = withNearCopies(docs(s, dir))
        .repartition(s.sparkContext.defaultParallelism)
      val withMl = corpus
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("td"))
        .select(col("doc_id"), transform(col("td"), w => md5(w.cast("binary"))).as("ml"))
      val h1 = transform(col("ml"), m => conv(substring(m, 1, 8), 16, 10).cast(LongType))
      val h2 = transform(col("ml"), m => conv(substring(m, 9, 7), 16, 10).cast(LongType))
      val withH = withMl.select(col("doc_id"), h1.as("h1"), h2.as("h2"))
      def votes(hs: Column, j: Int): Column =
        aggregate(hs, lit(0),
          (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      val bits = (0 until 60).map { j =>
        val v = if (j < 32) votes(col("h1"), j) else votes(col("h2"), j - 32)
        when(v > 0, lit(1L << j)).otherwise(lit(0L))
      }
      withH.select(col("doc_id"), bits.reduce(_.bitwiseOR(_)).as("simhash60"))
        .orderBy(col("doc_id"))
    },
    Some {
      def hexFoldSql(sub: String): String =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(1, length($sub) + 1),
           |        j -> CAST(strpos('0123456789abcdef', substr($sub, j, 1)) - 1 AS BIGINT))),
           |      (a, b) -> a * 16 + b)""".stripMargin
      val bitTerms = (0 until 60).map { j =>
        val (list, sh) = if (j < 32) ("h1", j) else ("h2", j - 32)
        s"CASE WHEN list_sum(list_transform($list, h -> CASE WHEN (h >> $sh) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END"
      }.mkString("\n  + ")
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
        |  FROM documents),
        |ml AS (
        |  SELECT doc_id,
        |    list_transform(list_distinct(string_split(text, ' ')), w -> md5(w)) AS ml
        |  FROM corpus),
        |hs AS (
        |  SELECT doc_id,
        |    list_transform(ml, m -> ${hexFoldSql("substr(m, 1, 8)")}) AS h1,
        |    list_transform(ml, m -> ${hexFoldSql("substr(m, 9, 7)")}) AS h2
        |  FROM ml)
        |SELECT doc_id,
        |  $bitTerms AS simhash60
        |FROM hs ORDER BY doc_id""".stripMargin
    })

  // ------------------------------------------------------------------
  // TF-IDF weighted cosine near-dup via an INVERTED-INDEX join — the
  // weighted cousin of ngramJaccard with the candidate generator the
  // similarity-join literature actually uses at scale: no blocking key is
  // assumed; two documents become a candidate pair iff they SHARE a
  // (df-capped) 3-gram shingle, so candidate volume is Σ_t df(t)² over
  // surviving terms — bounded by the df cap, never corpus². (On this
  // corpus: 16k distinct shingles, max df 7, so the cap is pure skew
  // armor; the WORD vocabulary, by contrast, is 31 terms with df up to
  // 80% of the corpus — word-level inverted indexing would be quadratic,
  // which is exactly why the shingle space is the indexing unit.)
  //
  // Exactness discipline: idf is the RATIONAL form quantized to integers
  // (iw = N·100 div df, the bigram-LM/fixed-point trick — ln-based idf
  // would hinge on libm rounding), presence-weighted (shingles are
  // near-unique within a doc). dot and the norms stay exact BIGINTs; the
  // cosine threshold cos ≥ 1/2 is evaluated crosswise as
  // 4·dot² ≥ ‖a‖²·‖b‖² in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — no
  // division, no sqrt, no doubles anywhere, so the driver hash is exact.
  // Output carries the integer evidence (dot, norm_a, norm_b), not a
  // float score.
  //
  // 100 TB shape: shingle explode is a narrow map; df and norms are
  // map-side-combinable hash aggs; the pair generation is ONE equi-join
  // on the shingle followed by a (id_a, id_b) hash agg whose partials
  // collapse shared-shingle fan-in; the df cap (HAVING df ≤ 20) is the
  // skew guard that keeps any stop-shingle from generating df² pairs.
  private val TfidfDfCap = 20

  /** ONE distinct-shingle census (doc_id, s: xxhash64 long) over the
    * near-copy corpus — the widest frame of BOTH the tfidf-cosine census
    * and the exact prefix pipeline, whose shingle expressions are
    * identical (same base, same 3-token xxhash64 key, same per-doc
    * array_distinct). Measured (JobProfile, sf0.1): materializing it was
    * the single largest job of EACH query — 5.3 s inside
    * drive:dedup_exact_pairs and 4.0 s inside dedup_tfidf_cosine — so the
    * second materialization was the "replay the topic N times" mistake at
    * the census level (guide §1.2 step 1). Eager localCheckpoint
    * (block-manager-resident, survives the bench's clearCache);
    * `drive:dedup_shingles` times it as its own bench row. */
  private val shingleCensusShared = new graft.SessionMemo[DataFrame]({
    (s, dir) =>
      // the corpus is one parquet file → ONE input split, so without the
      // repartition the whole tokenize+hash+distinct map runs on 1-2
      // tasks (guide §2.5 input skew / §6; the ChangeGen discipline —
      // the shuffle moves only (doc_id, text), a fraction of the census
      // it unblocks 32 cores for)
      val base = withNearCopies(
        docs(s, dir).repartition(s.sparkContext.defaultParallelism))
      val t = split(col("text"), " ")
      val shingle = transform(
        sequence(lit(1), size(t) - 2),
        i => xxhash64(element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))
      base.filter(size(t) >= 3)
        .select(col("doc_id"), explode(array_distinct(shingle)).as("s"))
        .localCheckpoint(true)
  })

  /** The tfidf-cosine pair pipeline, parameterized on the shingle key so
    * the spec can pin the 8-byte hash key ≡ the string key on the real
    * corpus (the substringSpans discipline). `shShared` supplies the
    * already-checkpointed census for the registered (xxhash64) key — the
    * construction below is expression-identical to
    * [[shingleCensusShared]]'s; spec key variants pass None and build
    * their own. */
  private[graft] def tfidfPairs(base: DataFrame,
      keyOf: (Column, Column, Column) => Column,
      shShared: Option[DataFrame] = None): DataFrame = {
      // corpus size as an eagerly-counted literal: a 1-row broadcast
      // crossJoin carrier plans as a BroadcastNestedLoopJoin and drops the
      // whole iw pipeline out of whole-stage codegen (ROADMAP invariant,
      // measured 8x on the bloom probe); one driver count job is cheaper
      val nCorpus = base.count()
      val t = split(col("text"), " ")
      val shingle = transform(
        sequence(lit(1), size(t) - 2),
        i => keyOf(element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))
      // presence (per-doc DISTINCT), not tf: a shingle repeating inside one
      // doc counts once — array_distinct on the shingle array BEFORE the
      // explode keeps that a narrow map (a corpus-wide .distinct() here
      // was a full shuffle — the prefixFilter lesson); the >=3-token guard
      // keeps sequence() ascending (sequence(1, 0) yields a DESCENDING
      // [1, 0] under ANSI, not empty). sh feeds df AND the weight join and
      // iw feeds norms AND both pair sides — Spark shares no duplicate
      // subplans (ROADMAP invariant), so both stay checkpointed (measured
      // 4x without iw's; re-running the split+shingle map twice for sh's
      // two consumers measured +3 s over the one checkpoint write)
      val sh = shShared.getOrElse(
        base.filter(size(t) >= 3)
          .select(col("doc_id"), explode(array_distinct(shingle)).as("s"))
          .localCheckpoint(true))
      val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= TfidfDfCap)
      val iw = sh.join(dfreq, "s")
        .select(col("doc_id"), col("s"),
          expr(s"(${nCorpus}L * 100) div df").as("iw"))
        .localCheckpoint(true)
      val norms = iw.groupBy(col("doc_id"))
        .agg(sum(col("iw") * col("iw")).as("norm2"))
      // both sides of a shared shingle carry the SAME weight (iw is a
      // function of s alone), so dot = Σ iw² over shared shingles — carry
      // iw² on one side only and keep the join payload two longs wide
      val dots = iw.select(col("s"), col("doc_id").as("id_a"),
          (col("iw") * col("iw")).as("iw2"))
        .join(iw.select(col("s"), col("doc_id").as("id_b")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("iw2")).as("dot"))
      val d38 = DecimalType(38, 0)
      dots
        .join(norms.select(col("doc_id").as("id_a"), col("norm2").as("norm_a")), "id_a")
        .join(norms.select(col("doc_id").as("id_b"), col("norm2").as("norm_b")), "id_b")
        .filter(lit(4).cast(d38) * col("dot").cast(d38) * col("dot").cast(d38)
          >= col("norm_a").cast(d38) * col("norm_b").cast(d38))
        .select(col("id_a"), col("id_b"), col("dot"),
          col("norm_a"), col("norm_b"))
        .orderBy(col("id_a"), col("id_b"))
  }

  val tfidfCosine: Q = Q(
    "dedup_tfidf_cosine",
    // shingles keyed by xxhash64 of the three tokens — the
    // dedup_substring_spans scale key: 8 bytes through every checkpoint,
    // shuffle, and join instead of a ~30-byte concat string (and no string
    // allocation at all in the hot map). Collisions merge two shingles' df
    // counts; vanishing at these SFs (16k keys in 2^64) and spec-pinned ≡
    // the string key; at true 100 TB census scale the few birthday
    // collisions perturb individual df weights, the documented tradeoff
    // shared with the substring-span census.
    (s, dir) => tfidfPairs(withNearCopies(docs(s, dir)),
      (a, b, c) => xxhash64(a, b, c),
      Some(shingleCensusShared(s, dir))),
    Some(s"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
      |  FROM documents),
      |n AS (SELECT COUNT(*) AS n FROM all_docs),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM all_docs),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS s
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
      |dfreq AS (
      |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
      |  HAVING COUNT(*) <= $TfidfDfCap),
      |iw AS (
      |  SELECT sh.doc_id, sh.s, ((SELECT n FROM n) * 100) // dfreq.df AS iw
      |  FROM sh JOIN dfreq ON sh.s = dfreq.s),
      |norms AS (SELECT doc_id, SUM(iw * iw) AS norm2 FROM iw GROUP BY doc_id),
      |dots AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.iw * b.iw) AS dot
      |  FROM iw a JOIN iw b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT d.id_a, d.id_b, CAST(d.dot AS BIGINT) AS dot,
      |  CAST(na.norm2 AS BIGINT) AS norm_a, CAST(nb.norm2 AS BIGINT) AS norm_b
      |FROM dots d
      |JOIN norms na ON na.doc_id = d.id_a
      |JOIN norms nb ON nb.doc_id = d.id_b
      |WHERE 4 * CAST(d.dot AS HUGEINT) * CAST(d.dot AS HUGEINT)
      |      >= CAST(na.norm2 AS HUGEINT) * CAST(nb.norm2 AS HUGEINT)
      |ORDER BY id_a, id_b""".stripMargin))

  // ------------------------------------------------------------------
  // Semantic dedup (the SemDeDup shape, Abbas et al. 2023): cluster the
  // embedding space coarsely, find near-duplicate pairs ONLY within each
  // cluster, then connected-components the pair graph and keep one
  // representative per component. The cell restriction is the scale move:
  // candidate volume is Σ_cell |cell|² instead of corpus² (the documented
  // recall tradeoff — a cross-cell near-dup pair is missed, which is the
  // same approximation the published method makes). Composes three
  // machines this engine already oracle-verifies separately: the IVF cell
  // assignment (sim_kmeans_cells / sim_ivf_topk), the integer-quantized
  // cosine (dedup_embedding_cosine), and min-label CC (dedup_cc_clusters)
  // — and the DuckDB oracle replays the WHOLE composition end-to-end,
  // recursive CC included.
  //
  // 100 TB shape: assignment is a broadcast join against O(K) centroids;
  // the pair join shuffles on the cell key (cells are the partition unit,
  // exactly how the persisted IVF index is laid out); norms are computed
  // once per vector BEFORE the pair join (1 fold per pair, not 3); CC
  // rounds ∝ near-dup component diameter (tiny — threshold graphs are
  // dense small clusters).
  private val SemK = 8
  private val SemThreshold = 0.3

  /** The cell-restricted near-dup pair graph (exposed so the plan-shape
    * spec can pin the pre-CC machinery — the CC tail is checkpointed, so
    * the registered query's final plan no longer shows it). */
  private[graft] def semanticEdges(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.{dotProductLong, quantize1000}
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), quantize1000(col("embedding")).as("qv"))
    val cents = broadcast(e.filter(col("vec_id") < SemK)
      .select(col("vec_id").as("cid"), col("qv").as("cv")))
    def cosC(a: Column, b: Column): Column =
      dotProductLong(a, b).cast(DoubleType) /
        sqrt(dotProductLong(a, a).cast(DoubleType)) /
        sqrt(dotProductLong(b, b).cast(DoubleType))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val assigned = e.join(cents)
      .withColumn("ccos", cosC(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"), col("qv"))
      // self-norm once per vector, before the pair join
      .withColumn("nrm", sqrt(dotProductLong(col("qv"), col("qv"))
        .cast(DoubleType)))
      // PINNED (r17 — VERDICT r16 item 8): the r15 rationale for leaving
      // this un-persisted assumed ReusedExchange would compute the
      // assignment stage once for both self-join sides, but the r17 plan
      // audit (plans/r17/dedup_semantic_before.txt) shows NO
      // ReusedExchange under AQE — the assignment subtree (embedding
      // scan, quantize, broadcast join, rank window) executed once per
      // side per consumer, 9 parquet scans in one plan. The checkpoint
      // is N narrow rows (~1 MB at sf0.1) and both sides now scan it.
      .localCheckpoint(true)
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("qv").as("qa"), col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("qv").as("qb"), col("nrm").as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.VectorExprs.dotProductLong(col("qa"), col("qb"))
        .cast(DoubleType) / col("na") / col("nb") >= SemThreshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
  }

  val semantic: Q = Q(
    "dedup_semantic",
    (s, dir) => {
      val edges = semanticEdges(s, dir)
      val nodes = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("id"))
      graft.plans.ConnectedComponents.run(edges, nodes = Some(nodes))
        .select(col("id").as("vec_id"), col("cluster").as("cluster_id"),
          (col("id") === col("cluster")).as("keep"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH RECURSIVE q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < $SemK),
      |sim AS (
      |  SELECT q.vec_id, cents.cid,
      |    CAST(list_sum(list_transform(range(1, 65), i -> q.v[i] * cents.cv[i])) AS DOUBLE)
      |      / sqrt(CAST(list_sum(list_transform(q.v, x -> x * x)) AS DOUBLE))
      |      / sqrt(CAST(list_sum(list_transform(cents.cv, x -> x * x)) AS DOUBLE)) AS ccos
      |  FROM q, cents),
      |assigned AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT vec_id, cid,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
      |    FROM sim) WHERE rn = 1),
      |pairs AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst
      |  FROM assigned a
      |  JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  JOIN q qa ON qa.vec_id = a.vec_id
      |  JOIN q qb ON qb.vec_id = b.vec_id
      |  WHERE CAST(list_sum(list_transform(range(1, 65), i -> qa.v[i] * qb.v[i])) AS DOUBLE)
      |      / sqrt(CAST(list_sum(list_transform(qa.v, x -> x * x)) AS DOUBLE))
      |      / sqrt(CAST(list_sum(list_transform(qb.v, x -> x * x)) AS DOUBLE))
      |      >= $SemThreshold),
      |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
      |reach AS (
      |  SELECT vec_id AS node, vec_id AS lbl FROM q
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
      |SELECT node AS vec_id, MIN(lbl) AS cluster_id,
      |  (node = MIN(lbl)) AS keep
      |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin))

  // ------------------------------------------------------------------
  // Prefix-filtered set-similarity self-join (AllPairs/PPJoin candidate
  // generation, Bayardo et al.): sort each document's shingle set
  // rarest-first (global df asc, lexicographic ties) and index ONLY the
  // first n − ⌈t·n⌉ + 1 shingles — two sets with Jaccard ≥ t MUST share a
  // prefix element (pigeonhole on the ⌈t·n⌉-sized suffixes), so the
  // prefix equi-join is a lossless candidate generator with no blocking
  // key, no bands, and no df cap. Completes the candidate-generation
  // family: blocking (ngram_jaccard), minhash bands, simhash bands,
  // df-capped inverted index (tfidf), pigeonhole hamming bands (phash),
  // cells (semantic) — and now the prefix filter. t = 0.7 (the standard
  // near-dup bar; J ≥ t ⇒ |∩| ≥ ⌈t·n⌉ per side since the union bounds
  // both sizes, which is what makes the per-side prefix sound), plus
  // PPJoin's length filter (10·min(n_a,n_b) ≥ 7·max — sets too unequal
  // in size cannot reach t) before any pair materializes. Verification
  // is exact integer Jaccard: J ≥ 7/10 ⟺ 17·|∩| ≥ 7·(|a| + |b|).
  //
  // 100 TB shape: df and per-doc rank are a hash agg + a per-document
  // window (bounded by the doc's shingle count, a row-size bound);
  // candidates = Σ_prefix-shingle df² but prefix shingles are by
  // construction the RAREST — the adaptive version of tfidf's fixed df
  // cap; intersection counting touches candidates × doc size, linear in
  // the candidate volume, never corpus².
  /** Exact near-pairs at J ≥ 0.7 via the prefix-filtered pipeline —
    * LOSSLESS (the pigeonhole prefix theorem), so this doubles as the
    * ground truth for [[minhashEval]]. Returns unordered
    * (id_a, id_b, n_common, n_a, n_b). */
  /** The un-checkpointed pipeline — the plan-shape spec audits THIS (the
    * checkpoint erases the lineage, so the memoized frame's explain shows
    * only an RDD scan). */
  private[graft] def exactPairsPlan(s: SparkSession, dir: String,
      keyOf: (Column, Column, Column) => Column =
        (a, b, c) => xxhash64(a, b, c),
      shShared: Option[DataFrame] = None): DataFrame =
    exactNearPairs(withNearCopies(docs(s, dir)), keyOf, shShared)
  /** Session-memoized exact near-pairs over the standard near-copy corpus:
    * [[prefixFilter]] and [[minhashEval]] both need this exact join (the
    * latter as ground truth), and it is the most expensive candidate
    * pipeline in the dedup family — running it twice per sweep is the
    * "replay the topic N times" mistake the CDC dual-drive cache exists
    * to prevent. The memoized frame is an eager localCheckpoint — a few
    * thousand (id, id, 3×count) rows, block-manager-resident (NOT
    * CacheManager), so the bench's per-sweep clearCache cannot drop it
    * and no repersist re-pin is needed. */
  private val exactPairsShared = new graft.SessionMemo[DataFrame](
    (s, dir) => exactPairsPlan(s, dir,
      shShared = Some(shingleCensusShared(s, dir))).localCheckpoint(true))

  /** `keyOf` maps a 3-token shingle to its census/join key. The
    * registered drive rides 8-byte xxhash64 keys (r16 — the tfidf
    * discipline): the checkpoint, the df/rank shuffles, the prefix
    * self-join, and the intersection fan-out all carry a long instead of
    * a ~30-byte string. The prefix theorem needs only a CONSISTENT
    * global total order — (df, key) is one whatever the key type, so the
    * pipeline stays lossless; the rank tie-break among equal-df shingles
    * changes, which moves the candidate SET but provably not the output
    * pairs. Collisions are the documented tfidf tradeoff
    * (~distinct-shingles²/2⁶⁴); spec-pinned ≡ the string key on the real
    * corpus. */
  private def exactNearPairs(base: DataFrame,
      keyOf: (Column, Column, Column) => Column =
        (a, b, c) => xxhash64(a, b, c),
      shShared: Option[DataFrame] = None): DataFrame = {
      val t = split(col("text"), " ")
      val shingle = transform(
        sequence(lit(1), size(t) - 2),
        i => keyOf(element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))
      // per-doc distinct is array_distinct BEFORE the explode — a narrow
      // map, versus a full (doc_id, s) shuffle+agg over the widest frame
      // in the query ((doc_id, s) pairs are only ever duplicated WITHIN
      // a document, so a global distinct bought nothing a per-doc one
      // doesn't)
      // feeds df, sizes, rank, and intersection; the registered xxhash64
      // key rides the SHARED census (see shingleCensusShared)
      val sh = shShared.getOrElse(
        base.filter(size(t) >= 3)
          .select(col("doc_id"), explode(array_distinct(shingle)).as("s"))
          .localCheckpoint(true))
      val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val ranked = sh.join(dfreq, "s")
        .select(col("doc_id"), col("s"),
          row_number().over(Window.partitionBy(col("doc_id"))
            .orderBy(col("df"), col("s"))).as("rk"))
      val prefix = ranked.join(sizes, "doc_id")
        .filter(col("rk") <= expr("n - (7 * n + 9) div 10 + 1"))
        .select(col("doc_id"), col("s"), col("n"), col("rk"))
      val cand = prefix.select(col("s"), col("doc_id").as("id_a"),
          col("n").as("n_a"), col("rk").as("rk_a"))
        .join(prefix.select(col("s"), col("doc_id").as("id_b"),
          col("n").as("n_b"), col("rk").as("rk_b")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
        // length filter: J >= 0.7 forces 10*min(n) >= 7*max(n)
        .filter(lit(10) * least(col("n_a"), col("n_b")) >=
          lit(7) * greatest(col("n_a"), col("n_b")))
        // PPJoin positional filter, exists-form (lossless): common tokens
        // of a pair all lie in the suffixes starting at this match, so
        // |∩| ≤ 1 + min(n_a − rk_a, n_b − rk_b); J ≥ 7/10 needs
        // 17·|∩| ≥ 7·(n_a + n_b). For a truly similar pair the FIRST
        // common token in (df, s) order sits inside BOTH prefixes (the
        // per-side prefix theorem) and satisfies this bound, so keeping
        // pairs where ANY matching prefix token passes prunes only pairs
        // that cannot reach t — candidates drop before the expensive
        // exact-intersection fan-out.
        .filter(lit(17) *
          (lit(1) + least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b"))) >=
          lit(7) * (col("n_a") + col("n_b")))
        // keep the pair NARROW (two longs): a wider cand frame measured
        // 2.5× slower end-to-end — its estimated size crosses the
        // broadcast threshold and the fan-out joins below flip from
        // broadcast to shuffling the full shingle frame twice; n_a/n_b
        // re-attach from the tiny `sizes` aggregate after the
        // intersection instead
        .select(col("id_a"), col("id_b")).distinct()
      // intersection size per candidate: fan the pair out over a's
      // shingles, keep those b also holds — cost ∝ candidates × doc size.
      // (Two r17 variants measured WORSE and were reverted: per-doc
      // array_intersect over collected candidate-doc arrays 4.8 → 8.5 s —
      // the doc-sized array join defeats the narrow pair frame's
      // broadcast — and a broadcast semi-join pre-cut of the b-side
      // census 4.8 → 8.0 s — building the broadcast re-computes the
      // whole cand pipeline, since Spark shares no duplicate subplans.)
      val inter = cand
        .join(sh.select(col("doc_id").as("id_a"), col("s")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("s")), Seq("id_b", "s"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
      inter
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
        .filter(lit(17) * col("n_common") >= lit(7) * (col("n_a") + col("n_b")))
        .select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
          col("n_b"))
  }

  val prefixFilter: Q = Q(
    "dedup_prefix_filter",
    (s, dir) => exactPairsShared(s, dir)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
      |  FROM documents),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM all_docs),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS s
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
      |dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |rk AS (
      |  SELECT sh.doc_id, sh.s,
      |    row_number() OVER (PARTITION BY sh.doc_id ORDER BY dfreq.df, sh.s)
      |      AS rk
      |  FROM sh JOIN dfreq ON dfreq.s = sh.s),
      |pfx AS (
      |  SELECT rk.doc_id, rk.s, sz.n, rk.rk FROM rk JOIN sz USING (doc_id)
      |  WHERE rk <= n - (7 * n + 9) // 10 + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM pfx a JOIN pfx b ON a.s = b.s AND a.doc_id < b.doc_id
      |  WHERE 10 * least(a.n, b.n) >= 7 * greatest(a.n, b.n)
      |    AND 17 * (1 + least(a.n - a.rk, b.n - b.rk)) >= 7 * (a.n + b.n)),
      |inter AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      |  FROM cand c
      |    JOIN sh sa ON sa.doc_id = c.id_a
      |    JOIN sh sb ON sb.doc_id = c.id_b AND sb.s = sa.s
      |  GROUP BY c.id_a, c.id_b)
      |SELECT i.id_a, i.id_b, CAST(i.n_common AS BIGINT) AS n_common,
      |  CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b
      |FROM inter i
      |JOIN sz za ON za.doc_id = i.id_a
      |JOIN sz zb ON zb.doc_id = i.id_b
      |WHERE 17 * i.n_common >= 7 * (za.n + zb.n)
      |ORDER BY id_a, id_b""".stripMargin))

  // ------------------------------------------------------------------
  // MinHash-LSH quality evaluation — the measurement loop a production
  // dedup pipeline runs before trusting an approximate candidate
  // generator: ground truth is the LOSSLESS prefix-filtered exact join at
  // J ≥ 0.7 ([[exactNearPairs]] — pigeonhole-complete, so "missed" means
  // missed by LSH, never by the truth side), candidates are the banded
  // md5-minhash pairs ([[md5LshPairs]], 8 bands × 4 rows ⇒ theoretical
  // recall 1−(1−J⁴)⁸ ≈ 0.89 at the J = 0.7 boundary and →1 for the
  // planted near-copies). One full-outer join + one aggregate emits
  // all-integer metrics: recall = n_hit/n_true, precision n_hit/n_cand
  // (LSH "false" candidates are pairs below the bar that still collided),
  // and sum_match_hits (Σ matching minhashes over true positives — the
  // calibration mass; est_sim averages to sum/(32·n_hit)).
  //
  // 100 TB shape: both sides are the already-scale-shaped generators
  // (rarest-first prefixes; banded buckets); the metric join keys on
  // (id_a, id_b) pairs — linear in candidate volume — and collapses to
  // ONE summary row via a map-side-combinable aggregate.
  val minhashEval: Q = Q(
    "dedup_minhash_eval",
    (s, dir) => {
      // the near-copy corpus feeds ONLY the LSH side here (the truth side
      // is the session-shared exactPairsShared frame, which builds its own
      // corpus) — and md5LshPairs persists its signature frame internally,
      // so no checkpoint of the raw corpus is warranted
      val base = withNearCopies(docs(s, dir))
      val truth = exactPairsShared(s, dir)
        .select(col("id_a"), col("id_b"), lit(1L).as("is_true"))
      val cand = md5LshPairs(base)
        .select(col("id_a"), col("id_b"), col("n_match"), lit(1L).as("is_cand"))
      val hit = col("is_true").isNotNull && col("is_cand").isNotNull
      truth.join(cand, Seq("id_a", "id_b"), "full_outer")
        .agg(
          sum(when(col("is_true").isNotNull, 1L).otherwise(0L)).as("n_true"),
          sum(when(col("is_cand").isNotNull, 1L).otherwise(0L)).as("n_cand"),
          sum(when(hit, 1L).otherwise(0L)).as("n_hit"),
          sum(when(hit, col("n_match").cast(LongType)).otherwise(0L))
            .as("sum_match_hits"))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          (col("n_true") - col("n_hit")).as("n_missed"),
          col("sum_match_hits"))
    },
    Some {
      val sigExprs = (0 until NumHashes).map { i =>
        s"list_min(list_transform(hl, h -> (h * ${mixA(i)} + ${mixB(i)}) % $P))"
      }.mkString(",\n    ")
      def bucketSql(b: Int): String =
        (0 until RowsPerBand).map(j => s"sig[${b * RowsPerBand + j + 1}]")
          .reduceLeft((acc, x) => s"(($acc) * 31 + $x) % $P")
      val bandSelects = (0 until Bands).map { b =>
        s"SELECT doc_id, sig, $b AS band, ${bucketSql(b)} AS bucket FROM sigs"
      }.mkString("\n  UNION ALL ")
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM all_docs),
        |sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS s
        |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
        |dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |rk AS (
        |  SELECT sh.doc_id, sh.s,
        |    row_number() OVER (PARTITION BY sh.doc_id ORDER BY dfreq.df, sh.s)
        |      AS rk
        |  FROM sh JOIN dfreq ON dfreq.s = sh.s),
        |pfx AS (
        |  SELECT rk.doc_id, rk.s, sz.n, rk.rk FROM rk JOIN sz USING (doc_id)
        |  WHERE rk <= n - (7 * n + 9) // 10 + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM pfx a JOIN pfx b ON a.s = b.s AND a.doc_id < b.doc_id
        |  WHERE 10 * least(a.n, b.n) >= 7 * greatest(a.n, b.n)
        |    AND 17 * (1 + least(a.n - a.rk, b.n - b.rk)) >= 7 * (a.n + b.n)),
        |inter AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        |  FROM cand c
        |    JOIN sh sa ON sa.doc_id = c.id_a
        |    JOIN sh sb ON sb.doc_id = c.id_b AND sb.s = sa.s
        |  GROUP BY c.id_a, c.id_b),
        |truth AS (
        |  SELECT i.id_a, i.id_b FROM inter i
        |  JOIN sz za ON za.doc_id = i.id_a
        |  JOIN sz zb ON zb.doc_id = i.id_b
        |  WHERE 17 * i.n_common >= 7 * (za.n + zb.n)),
        |shing AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS sh
        |  FROM toks),
        |mdl AS (SELECT doc_id, list_transform(sh, s -> substr(md5(s), 1, 15)) AS ml FROM shing),
        |hl AS (
        |  SELECT doc_id,
        |    list_transform(ml, m -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, 16),
        |          j -> CAST(strpos('0123456789abcdef', substr(m, j, 1)) - 1 AS BIGINT))),
        |      (a, b) -> (a * 16 + b) % $P)) AS hl
        |  FROM mdl),
        |sigs AS (SELECT doc_id, [$sigExprs] AS sig FROM hl),
        |banded AS (
        |  $bandSelects),
        |lshpre AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |lshc AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) AS BIGINT)
        |      AS n_match
        |  FROM lshpre),
        |j AS (
        |  SELECT t.id_a IS NOT NULL AS is_true, l.id_a IS NOT NULL AS is_cand,
        |    l.n_match
        |  FROM truth t FULL OUTER JOIN lshc l
        |    ON t.id_a = l.id_a AND t.id_b = l.id_b)
        |SELECT
        |  CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |  CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
        |  CAST(SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END)
        |    - SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
        |  CAST(COALESCE(SUM(CASE WHEN is_true AND is_cand THEN n_match ELSE 0 END), 0) AS BIGINT)
        |    AS sum_match_hits
        |FROM j""".stripMargin
    })

  // ------------------------------------------------------------------
  // Content-defined chunking (CDC) dedup — the OFFSET-ROBUST exact-
  // substring discipline (the rsync/LBFS/dedup-storage lineage; cf.
  // Muthitacharoen et al., "A Low-Bandwidth Network File System", SOSP
  // 2001). Every other exact method here keys on aligned units (words,
  // shingles, fixed segments); CDC places chunk boundaries where a
  // ROLLING HASH of the trailing 8 characters hits 0 mod 64, so the
  // boundaries are a function of CONTENT alone — insert a prefix, edit a
  // word, and the chunking re-synchronizes at the next boundary instead
  // of shifting every downstream unit. The planted copies here are
  // prefix-shifted by 3 characters ("zq " + text): any fixed-stride
  // scheme sees disjoint windows; CDC recovers every chunk after the
  // first boundary.
  //
  // 100 TB shape: chunking is a pure narrow map (an 8-term polynomial
  // per character — scan speed, whole-stage codegen); the duplicate
  // verdict is ONE hash aggregation keyed by chunk content plus a join
  // back; per-doc rollup is a second hash agg. No window, no sort of the
  // corpus, nothing pairwise.
  //
  // All arithmetic is integer-exact (codepoint polynomial mod 1000003)
  // and chunk comparison is string equality, so DuckDB replays the whole
  // operator hash-exactly.
  private val CdcW = 8 // rolling window (chars)
  private val CdcMod = 1000003L
  private val CdcDiv = 64L // boundary divisor → ~64-char average chunks

  /** The per-position rolling hash as an engine-neutral expression over a
    * precomputed codepoint array `cps`: h(i) = Σ_{j=0..7}
    * cps[i-j]·31^j mod 1000003. The codepoints are extracted ONCE per
    * character (one substring+ascii each) and the per-position window is
    * pure integer array arithmetic — the 8-substrings-per-position form
    * measured 5× slower. `base` = 1 for Spark's 0-based array indexing,
    * 0 for DuckDB's 1-based lists; the 8 terms are written out so both
    * engines evaluate the identical integer formula. */
  private def cdcHashTerms(base: Int): String =
    (0 until CdcW).map { j =>
      val coeff = BigInt(31).pow(j)
      s"cps[i - $j - $base] * CAST($coeff AS BIGINT)"
    }.mkString("(", " + ", s") % $CdcMod")

  /** Content-defined chunking of `(doc_id, text)` rows → one row per
    * (doc_id, chunk), boundaries purely content-determined. Exposed for
    * the offset-robustness spec. */
  private[graft] def cdcChunkify(base: DataFrame): DataFrame = {
    val cps = expr(
      "transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))")
    // sequence(8, len) DESCENDS when len < 8 (the sequence(1,0) lesson)
    // — short texts get the empty boundary list explicitly
    val cuts = expr(
      s"""concat(array(0),
         |  CASE WHEN length(text) >= $CdcW THEN
         |    filter(sequence($CdcW, length(text)),
         |      i -> ${cdcHashTerms(1)} % $CdcDiv = 0)
         |  ELSE array() END,
         |  array(length(text)))""".stripMargin)
    base
      .select(col("doc_id"), col("text"), cps.as("cps"))
      .select(col("doc_id"), col("text"), cuts.as("cuts"))
      .select(col("doc_id"),
        explode(expr(
          """filter(
            |  transform(sequence(2, size(cuts)),
            |    k -> substring(text, cuts[k - 2] + 1,
            |                   cuts[k - 1] - cuts[k - 2])),
            |  c -> length(c) > 0)""".stripMargin)).as("chunk"))
  }

  /** The chunk-census duplication rollup, parameterized on the census key
    * (identity = string-keyed / oracle-bound shape; xxhash64 = the 8-byte
    * scale key, spec-pinned ≡ on the real corpus). The chunk LENGTH is
    * precomputed in the same narrow map, so the key variant never carries
    * chunk text past the chunking stage. */
  private[graft] def cdcDupStats(baseIn: DataFrame,
      keyOf: Column => Column): DataFrame = {
    // single-split corpus → spread the rolling-hash chunking map across
    // the cores first (the shingleDf discipline)
    val base = baseIn.repartition(
      baseIn.sparkSession.sparkContext.defaultParallelism)
    val chunks = cdcChunkify(base)
      .select(col("doc_id"), keyOf(col("chunk")).as("ck"),
        length(col("chunk")).cast(LongType).as("clen"))
      .localCheckpoint(true) // feeds the content census AND the rollup
    val census = chunks.select(col("ck"), col("doc_id")).distinct()
      .groupBy(col("ck")).agg(count(lit(1)).as("n_docs"))
    chunks.join(census, "ck")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("n_docs") >= 2, col("clen"))
          .otherwise(0L)).as("dup_chars"),
        sum(col("clen")).as("total_chars"))
      .orderBy(col("doc_id"))
  }

  val cdcChunks: Q = Q(
    "dedup_cdc_chunks",
    // registered on the 8-byte xxhash64 census key (r16 — the
    // dedup_substring_spans / tfidf discipline, spec-pinned ≡ the string
    // key): the checkpoint, the distinct + census shuffles, and the join
    // back carry (8-byte key, 8-byte length) instead of the ~64-char
    // average chunk text; output carries only counts and summed lengths,
    // so the string-keyed DuckDB oracle stays valid. Collision risk is
    // the documented tfidf tradeoff (~distinct-chunks²/2⁶⁴).
    (s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
        .unionAll(docs(s, dir).select(
          (col("doc_id") + 3000000L).as("doc_id"),
          concat(lit("zq "), col("text")).as("text")))
      cdcDupStats(base, xxhash64(_))
    },
    Some(s"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 3000000, 'zq ' || text FROM documents),
      |cpl AS (
      |  SELECT doc_id, text,
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))
      |      AS cps
      |  FROM all_docs),
      |cutl AS (
      |  SELECT doc_id, text,
      |    list_concat(list_concat([CAST(0 AS BIGINT)],
      |      list_filter(range($CdcW, length(text) + 1),
      |        i -> ${cdcHashTerms(0)} % $CdcDiv = 0)),
      |      [CAST(length(text) AS BIGINT)]) AS cuts
      |  FROM cpl),
      |chunks AS (
      |  SELECT doc_id, c AS chunk FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(
      |        list_transform(range(2, len(cuts) + 1),
      |          k -> substr(text, CAST(cuts[k - 1] + 1 AS INT),
      |                      CAST(cuts[k] - cuts[k - 1] AS INT))),
      |        c -> length(c) > 0)) AS c
      |    FROM cutl)),
      |census AS (
      |  SELECT chunk, COUNT(*) AS n_docs
      |  FROM (SELECT DISTINCT chunk, doc_id FROM chunks) GROUP BY chunk)
      |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(CASE WHEN n.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS dup_chunks,
      |  CAST(SUM(CASE WHEN n.n_docs >= 2 THEN length(c.chunk) ELSE 0 END)
      |    AS BIGINT) AS dup_chars,
      |  CAST(SUM(length(c.chunk)) AS BIGINT) AS total_chars
      |FROM chunks c JOIN census n USING (chunk)
      |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin))

  // ------------------------------------------------------------------
  // Exact duplicated-substring spans — the ExactSubstr axis of Lee et
  // al., "Deduplicating Training Data Makes Language Models Better"
  // (ACL 2022): mark every region of the corpus whose every length-L
  // character window occurs at least twice corpus-wide (including
  // within one document), and merge adjacent marked positions into
  // MAXIMAL spans. This is the duplication-COVERAGE semantics a scrub
  // pipeline removes: a position is duplicated text iff some globally
  // duplicated L-window contains it. (Lee et al. compute it with a
  // suffix array on one node; the L-gram census + island merge below is
  // the shuffle-native equivalent: a census keyed by window content, a
  // semi-join back to positions, and a per-document run-length merge.)
  //
  // 100 TB shape: the sliding-window explode is O(L·corpus) bytes if the
  // window STRINGS shuffle. The scale variant keys the census on
  // xxhash64(window) — positions carry (doc_id, pos, 8-byte key)
  // independent of L, and a collision census-overcount can only EXTEND a
  // span (never invent one from zero true duplicates at practical rates:
  // ~n²/2⁶⁴ expected colliding window pairs). `SubstringSpanSpec` pins
  // hash-key ≡ string-key spans on the real corpus. The island merge is
  // a per-document window function (documents are bounded; no global
  // sort — the final orderBy exists for oracle determinism only).
  private[graft] val SpanL = 40

  /** Maximal duplicated-coverage spans of `(doc_id, text)`; `key` maps
    * the window-content column to the census key (identity = exact /
    * oracle-bound; xxhash64 = 8-byte scale key, spec-pinned equal). */
  private[graft] def substringSpans(
      baseIn: DataFrame, key: Column => Column = identity): DataFrame = {
    // single-split corpus → spread the per-position window explode (the
    // widest map in the dedup family) across the cores first
    val base = baseIn.repartition(
      baseIn.sparkSession.sparkContext.defaultParallelism)
    val pos = base
      .where(length(col("text")) >= SpanL)
      .select(col("doc_id"),
        explode(expr(s"sequence(CAST(1 AS BIGINT), CAST(length(text) - ${SpanL - 1} AS BIGINT))")).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        key(expr(s"substring(text, CAST(pos AS INT), $SpanL)")).as("g"))
      // feeds the census AND the cover join — one materialization
      .localCheckpoint(true)
    val census = pos.groupBy(col("g")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
    val covered = pos.join(census, "g")
      .select(col("doc_id"), col("pos"), col("n_occ"))
    // Island merge on COVERAGE intervals, not start-position adjacency:
    // window starts p and p' produce one contiguous covered run whenever
    // p' ≤ p + L (their [p, p+L-1] extents overlap or touch), so two
    // duplicated windows whose starts differ by >1 must still fold into
    // ONE span — emitted spans are pairwise disjoint and Σ span_len is
    // exactly the duplicated coverage (Lee-et-al maximal-coverage
    // semantics; SubstringSpanSpec pins disjointness on the real corpus).
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val isl = covered
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(w) + lit(SpanL.toLong),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(SpanL.toLong)).as("span_len"),
        max(col("n_occ")).as("max_occ"))
      .select(col("doc_id"), col("span_start"), col("span_len"), col("max_occ"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  val substringSpansQ: Q = Q(
    "dedup_substring_spans",
    // registered on the 8-byte xxhash64 census key (r16 — the
    // dedup_tfidf_cosine / text_ngram_novelty scale key, spec-pinned ≡
    // the string key on this corpus): the checkpoint, census shuffle,
    // and cover join carry a long instead of the 40-char window string
    // (≈6× narrower rows through the query's widest frames); output
    // carries only positions and counts, so the string-keyed DuckDB
    // oracle stays valid. Collision risk is the documented tfidf
    // tradeoff: ~positions²/2⁶⁴ expected colliding window pairs. A
    // collision can both extend a span AND (two colliding singleton
    // windows reaching n_occ = 2) invent one in docs with no true
    // duplicate — the safety argument is the vanishing probability plus
    // the string-keyed oracle comparison at both SFs, not a structural
    // one-sidedness (r16 ADVICE correction).
    (s, dir) => substringSpans(docs(s, dir).select(col("doc_id"), col("text")),
      c => xxhash64(c)),
    Some(s"""WITH pos AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |    substr(text, CAST(i AS INT), $SpanL) AS g
      |  FROM documents, LATERAL unnest(range(1, length(text) - $SpanL + 2)) AS t(i)
      |  WHERE length(text) >= $SpanL),
      |census AS (
      |  SELECT g, COUNT(*) AS n_occ FROM pos GROUP BY g HAVING COUNT(*) >= 2),
      |covered AS (
      |  SELECT p.doc_id, p.pos, c.n_occ FROM pos p JOIN census c USING (g)),
      |brk AS (
      |  SELECT doc_id, pos, n_occ,
      |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
      |              + $SpanL THEN 1 ELSE 0 END AS b
      |  FROM covered),
      |isl AS (
      |  SELECT doc_id, pos, n_occ,
      |    SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM brk)
      |SELECT doc_id, MIN(pos) AS span_start,
      |  MAX(pos) - MIN(pos) + $SpanL AS span_len,
      |  CAST(MAX(n_occ) AS BIGINT) AS max_occ
      |FROM isl GROUP BY doc_id, grp
      |ORDER BY doc_id, span_start""".stripMargin))

  /** Shared drives for the bench's `drive:*` pseudo-entries (see
    * [[graft.cdc.CdcQueries.drives]]). */
  private[graft] val drives: Seq[(String, (SparkSession, String) => Unit)] =
    Seq(
      "drive:dedup_shingles" -> ((s, d) => { shingleCensusShared(s, d); () }),
      "drive:dedup_cc" -> ((s, d) => { ccShared(s, d); () }),
      "drive:dedup_exact_pairs" -> ((s, d) => { exactPairsShared(s, d); () }))

  val all: Seq[Q] = Seq(exact, ngramJaccard, editDistance, ccClusters,
    ccClustersStar, minhashLsh, minhashOracle, simhashQ, simhashOracle,
    simhashPairs, tfidfCosine, semantic, survivors, qualitySurvivors,
    clusterStats, prefixFilter, cdcChunks,
    substringSpansQ, minhashEval)
}
