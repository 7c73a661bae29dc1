package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator pack into the `queries`/`oracleSql` maps the
  * driver's Verify/Bench mains consume. Each pack is a Seq[Q]; a Q with an
  * oracle is hash-compared against DuckDB at sf0.01, a Q without one gets
  * the weaker rows-only check (non-SQL-expressible ops).
  */
object SparkEntry {

  private def packs: Seq[Q] =
    operators.Relational.all ++
      operators.Extended.all ++
      operators.TpchMore.all ++
      operators.TpchWave3.all ++
      operators.StatsPack.all ++
      operators.GapOps.all ++
      operators.EventAnalytics.all ++
      operators.TimeSeries.all ++
      operators.Scalars.all ++
      cdc.CdcQueries.all ++
      operators.TextAnalysis.all ++
      operators.QualityModel.all ++
      operators.Dedup.all ++
      operators.Similarity.all ++
      operators.Pca.all ++
      operators.SimilarityIvf.all ++
      operators.SimilarityPq.all ++
      operators.Multimodal.all ++
      operators.Graph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full CDC pipeline (decode → compact) and joins the surviving
    * snapshot to orders — the reference's replication semantics feeding a
    * downstream analytical query.
    */
  def entry(spark: SparkSession): DataFrame =
    cdc.CdcQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // toMap would silently keep the LAST of a duplicate name — the
    // shadowed query then never runs and its checks pass vacuously (the
    // same silent-vacuous class Verify guards against for typo'd filters)
    val dup = packs.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query name(s): ${dup.mkString(", ")}")
    packs.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Named shared drives — the SessionMemo artifacts several queries
    * consume (exact-pairs, CC labelling, SCD2/dual-sink drives, BM25
    * indexes, the trained k-means assignment). The bench forces and times
    * each BEFORE the query sweep, emitting `drive:*` pseudo-entries, so
    * regression gating tracks every drive directly instead of whichever
    * consumer query happens to run first (whose per-query number was
    * nominal for every later consumer and silently re-attributed when
    * registration order changed). */
  def drives: Seq[(String, (SparkSession, String) => Unit)] =
    cdc.CdcQueries.drives ++
      operators.Dedup.drives ++
      operators.TextAnalysis.drives ++
      operators.SimilarityIvf.drives ++
      operators.Graph.drives
}
