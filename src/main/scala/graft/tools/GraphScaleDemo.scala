package graft.tools

import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale demonstration for the degree-oriented triangle machinery
  * (SCALE.md): rebuild the SAME derived link graph (bijective ray,
  * quadratic ray, id%97 hub ray) over ×1/×3/×10 vertex sets and measure
  * triangle-count wall time and the oriented wedge count. The claim under
  * test: orientation points edges INTO hubs (they have the high degree),
  * so hub out-degree — and with it the wedge count Σ C(d_out, 2) — stays
  * bounded and the join grows ~linearly, even though hub IN-degree grows
  * linearly with N.
  *
  * Usage: runMain graft.tools.GraphScaleDemo [baseN] [multiples e.g. 1,3,10]
  */
object GraphScaleDemo {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def linkEdges(spark: SparkSession, n: Long): DataFrame = {
    val verts = spark.range(n).toDF("id")
    def ray(dst: org.apache.spark.sql.Column): DataFrame =
      verts.select(col("id").as("src"), dst.as("dst"))
    ray((col("id") * 7 + 1) % n)
      .unionAll(ray((col("id") * col("id") + 3) % n))
      .unionAll(ray(col("id") % 97))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val baseN = if (args.nonEmpty) args(0).toLong else 6000L
    val mults = (if (args.length > 1) args(1) else "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    mults.foreach { m =>
      val n = baseN * m
      val edges = linkEdges(spark, n).localCheckpoint(true)
      val nEdges = edges.count()
      val (tri, tTri) = timed(
        Graph.triangleCount(edges).collect()(0).getLong(0))
      val (_, tSup) = timed(
        Graph.edgeSupportHistogram(edges).collect())
      // k-core peel: rounds are structural (cascade depth), so wall time
      // should track rounds × per-round latency with per-round cost
      // frontier-bound, not edge-bound — wall/round must stay ~flat as N
      // grows even though the edge list is 10× bigger.
      val verts = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id"))).distinct()
      val (core, tCore) = timed(
        Graph.kcorePeel(edges, verts, k = 4).collect())
      val rounds = core.map(_.getInt(1)).max
      // k-truss: the incidence table is built once; the peel's round count
      // is structural (k levels + cascade depth), so wall should track the
      // one-time triangle machinery plus a near-constant round tail
      val (maxT, tTruss) = timed(Graph.ktruss(edges)
        .agg(org.apache.spark.sql.functions.max(col("trussness")))
        .head().getInt(0))
      // coreness h-index fixpoint: rounds = fixpoint delay (structural);
      // per-round cost is frontier-bound — s/round must stay ~flat at 10×
      // the edges, same claim as the peel
      val (_, tCoreness) = timed(
        Graph.corenessHIndex(edges, verts).collect())
      val cRounds = Graph.lastCorenessRounds
      // LPA: fixed 3 synchronous rounds — per-round cost is two algebraic
      // aggs over the edge list, so s/round must grow ~linearly with
      // edges and never with any hub's degree (the partials absorb it)
      val (_, tLpa) = timed(Graph.lpaRun(edges, verts, 3).collect())
      println(f"[graphscale] lpa x$m%-3d 3 rounds ${tLpa}%6.2f s " +
        f"(${tLpa / 3}%5.3f s/round)")
      println(f"[graphscale] x$m%-3d n=$n%9d edges=$nEdges%9d " +
        f"triangles=$tri%8d  count=$tTri%6.2f s  support=$tSup%6.2f s  " +
        f"kcore=$tCore%6.2f s/$rounds%d rounds (${tCore / math.max(rounds, 1)}%5.3f s/round)  " +
        f"ktruss=$tTruss%6.2f s (maxT=$maxT%d)  " +
        f"coreness=$tCoreness%6.2f s/$cRounds%d steps (${tCoreness / math.max(cRounds, 1)}%5.3f s/step)")
    }
    spark.stop()
  }
}
