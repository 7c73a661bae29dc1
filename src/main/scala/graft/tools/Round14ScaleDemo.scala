package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-14 measurements on the hierarchical kNN build
  * (`SimilarityIvf.knnGraphHierarchical`):
  *
  *  1. TRAINED coarse quantizer (VERDICT r13 item 4): seed the coarse
  *     centroids from `KMeans.fitQuantized` over the fine-centroid table
  *     instead of corpus-prefix vectors, and measure flat-ranking edge
  *     agreement at equal coarseProbe — the r13 number to move is the
  *     39% coverage floor on the ×1 isotropic base.
  *  2. the ×100 column (VERDICT r13 item 6): retire Round13ScaleDemo's
  *     flat ~25 s vs hier ~8 s projection with data, including the
  *     probe-stage candidate volume (`cand_rows`).
  *
  * Usage: runMain graft.tools.Round14ScaleDemo <sfDir> [multiples]
  *        [cellTarget] [trainIters]
  */
object Round14ScaleDemo {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val cellTarget = if (args.length > 2) args(2).toInt else 64
    val trainIters = if (args.length > 3) args(3).toInt else 2
    // variant filter: at ×100 the flat build's N²-assignment + probe puts
    // it beyond any demo budget (itself the datum the scale table
    // records) — run the hierarchical paths alone there
    val variants = (if (args.length > 4) args(4) else "flat,hier,hierT")
      .split(',').map(_.trim).toSet
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

    /** Cold + warm build; returns (lineage-free warm src/dst frame, warm
      * stage walls, warm total). Index temp dirs deleted per run. */
    def run2(f: (String, (String, Double) => Unit) => DataFrame)
        : (DataFrame, Map[String, Double], Double) = {
      var warmEdges: DataFrame = null
      var stages = Map.empty[String, Double]
      val walls = (0 until 2).map { i =>
        val tmp = java.nio.file.Files.createTempDirectory("graft-knn14")
        try {
          val (_, sec) = timed {
            val st = scala.collection.mutable.Map.empty[String, Double]
            val edges = f(tmp.toString, (n, s) => st(n) = s)
            edges.count()
            if (i == 1) {
              warmEdges = edges.select(col("src"), col("dst"))
                .localCheckpoint(true)
              stages = st.toMap
            }
            edges.unpersist()
          }
          sec
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
      (warmEdges, stages, walls.last)
    }

    println("| mult | vecs | cells | coarse | flat s | hier s | hierT s | " +
      "train s | flat cands | hier cands | hierT cands | agree | agreeT |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    mults.foreach { m =>
      val vecs = ScaleDemo.vecsAt(spark, sfDir, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = vecs.count()
      val numCells = math.max(nprobe + 1, (n / cellTarget).toInt)

      val (flatEdges, flatStages, flatWarm) =
        if (variants("flat")) run2(
          (dir, onStage) => graft.operators.SimilarityIvf
            .knnGraphFromIndex(vecs, k, numCells, nprobe, dir,
              onStage = onStage))
        else (null, Map.empty[String, Double], Double.NaN)
      val (hierEdges, hierStages, hierWarm) =
        if (variants("hier")) run2(
          (dir, onStage) => graft.operators.SimilarityIvf
            .knnGraphHierarchical(vecs, k, numCells, nprobe, dir,
              onStage = onStage))
        else (null, Map.empty[String, Double], Double.NaN)
      val (tEdges, tStages, tWarm) =
        if (variants("hierT")) run2(
          (dir, onStage) => graft.operators.SimilarityIvf
            .knnGraphHierarchical(vecs, k, numCells, nprobe, dir,
              coarseTrainIters = trainIters, onStage = onStage))
        else (null, Map.empty[String, Double], Double.NaN)

      val total =
        if (flatEdges != null) flatEdges.count() else n * k
      val agree = if (flatEdges != null && hierEdges != null)
        hierEdges.intersect(flatEdges).count() else -1L
      val agreeT = if (flatEdges != null && tEdges != null)
        tEdges.intersect(flatEdges).count() else -1L
      vecs.unpersist()
      val numCoarse = math.ceil(math.sqrt(numCells.toDouble)).toInt
      def cands(st: Map[String, Double]) =
        st.getOrElse("cand_rows", 0.0).toLong
      println(f"| x$m%-3d | $n%7d | $numCells%5d | $numCoarse%4d | " +
        f"$flatWarm%6.2f | $hierWarm%6.2f | $tWarm%6.2f | " +
        f"${tStages.getOrElse("coarse_train", 0.0)}%5.2f | " +
        f"${cands(flatStages)}%10d | ${cands(hierStages)}%10d | " +
        f"${cands(tStages)}%10d | " +
        f"${100.0 * agree / total}%5.1f%% | ${100.0 * agreeT / total}%5.1f%% |")
      System.err.println(
        s"[stages x$m] flat=$flatStages hier=$hierStages hierT=$tStages")
    }
    spark.stop()
  }
}
