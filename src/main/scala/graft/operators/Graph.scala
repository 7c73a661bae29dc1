package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a deterministic document link graph.
  *
  * Reference behavior target: link-analysis ranking / graph-shape stats as
  * a source-weighting signal in a training-data pipeline (complementing the
  * duplicate-graph clustering in [[graft.plans.ConnectedComponents]]).
  *
  * The testdata ships no edge table, so one is DERIVED deterministically
  * from `documents`: doc_id is dense 0..N-1 (TESTDATA.md), and each doc
  * links via three rays the DuckDB oracle replays exactly —
  *   `(id*7+1) % N`   a bijection (uniform background traffic),
  *   `(id*id+3) % N`  quadratic (collisions → mid-degree spread),
  *   `id % 97`        hubs: 97 docs absorb ~N/97 in-links each, the
  *                    popular-page skew PageRank exists to measure (and
  *                    the reducer skew every per-dst shuffle must survive).
  * Self-loops drop, duplicate (src,dst) pairs dedupe, so out-degree is
  * 1..3 and a handful of nodes can be dangling — all mirrored in SQL.
  */
object Graph {

  private val Scale = 1000000000000L // fixed-point 1.0
  private val Iters = 5

  /** (edges, verts, n) for the derived link graph. */
  private def linkGraph(s: SparkSession, dir: String): (DataFrame, DataFrame, Long) = {
    val verts = Tables.load(s, dir, "documents").select(col("doc_id").as("id"))
    // one scalar count on a vertex-cardinality frame (drives the modulus
    // and the fixed-point constants) — not a data collect
    val n = verts.count()
    def ray(dst: org.apache.spark.sql.Column): DataFrame =
      verts.select(col("id").as("src"), dst.as("dst"))
    val edges = ray((col("id") * 7 + 1) % n)
      .unionAll(ray((col("id") * col("id") + 3) % n))
      .unionAll(ray(col("id") % 97))
      .filter(col("src") =!= col("dst"))
      .distinct()
    (edges, verts, n)
  }

  /** Shared oracle CTE prefix building the identical graph in SQL. */
  private val graphCtes: String =
    """verts AS (SELECT doc_id AS id FROM documents),
      |nn AS (SELECT COUNT(*) AS n FROM verts),
      |eraw AS (
      |  SELECT id AS src, (id * 7 + 1) % nn.n AS dst FROM verts, nn
      |  UNION ALL SELECT id, (id * id + 3) % nn.n FROM verts, nn
      |  UNION ALL SELECT id, id % 97 FROM verts),
      |edges AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst)""".stripMargin

  // -- PageRank ------------------------------------------------------------
  // Integer-exact fixed-point (see plans.PageRank); the oracle UNROLLS the
  // five iterations as chained CTEs — same floor-division formula, so the
  // distributed run and the single-node SQL run agree bit for bit.
  val pagerank: Q = Q(
    "graph_pagerank",
    (s, dir) => {
      val (edges, verts, n) = linkGraph(s, dir)
      graft.plans.PageRank.run(edges, verts, n, Iters, Scale)
        .select(col("id"), col("r").as("rank"))
        .orderBy(col("id"))
    },
    Some {
      val base = s"CAST(15 * $Scale // (100 * n) AS BIGINT)"
      val iterCtes = (1 to Iters).map { k =>
        s"""it$k AS (
           |  SELECT v.id, b.base + COALESCE(c.contrib, CAST(0 AS BIGINT)) AS r
           |  FROM verts v
           |  CROSS JOIN (SELECT $base AS base FROM nn) b
           |  LEFT JOIN (
           |    SELECT ed.dst AS id,
           |      CAST(SUM((p.r * 85) // (ed.deg * 100)) AS BIGINT) AS contrib
           |    FROM ed JOIN it${k - 1} p ON p.id = ed.src
           |    GROUP BY ed.dst) c ON c.id = v.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $graphCtes,
         |outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |ed AS (SELECT e.src, e.dst, o.deg FROM edges e
         |       JOIN outdeg o ON o.src = e.src),
         |it0 AS (SELECT id, CAST((SELECT $Scale // n FROM nn) AS BIGINT) AS r
         |        FROM verts),
         |$iterCtes
         |SELECT id, r AS rank FROM it$Iters ORDER BY id""".stripMargin
    })

  // -- Degree profile ------------------------------------------------------
  // In-degree histogram of the link graph: the shape sanity-check run
  // before any iterative algorithm (skew here predicts reducer skew in
  // every per-dst shuffle above).
  val degreeStats: Q = Q(
    "graph_degree_stats",
    (s, dir) => {
      val (edges, verts, _) = linkGraph(s, dir)
      val indeg = verts
        .join(edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("c")),
          Seq("id"), "left")
        .select(coalesce(col("c"), lit(0L)).as("indeg"))
      indeg.groupBy(col("indeg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("indeg"))
    },
    Some(s"""WITH $graphCtes,
       |ind AS (
       |  SELECT COALESCE(d.c, CAST(0 AS BIGINT)) AS indeg
       |  FROM verts v LEFT JOIN (
       |    SELECT dst, COUNT(*) AS c FROM edges GROUP BY dst) d
       |    ON d.dst = v.id)
       |SELECT indeg, COUNT(*) AS n_nodes FROM ind
       |GROUP BY indeg ORDER BY indeg""".stripMargin))

  val all: Seq[Q] = Seq(pagerank, degreeStats)
}
