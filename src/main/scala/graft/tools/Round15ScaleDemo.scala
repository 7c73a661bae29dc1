package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-15 measurement: TRAINED FINE centroids in the hierarchical kNN
  * build (`SimilarityIvf.knnGraphHierarchical(fineTrainIters > 0)`) —
  * closing round 14's one `weak`. SCALE.md r14 measured that on the
  * CLUSTERED ×m corpora (each replica a shifted cluster) the
  * prefix-seeded fine cells (`vec_id < numCells`, all inside replica 0)
  * pile the shifted clusters into few cells and the probe join's
  * candidate volume goes quadratic — the flat build did not finish a
  * cold+warm pair in a 40-minute budget at ×100. With both quantizer
  * layers k-means-trained over a bounded sample, cells are sized by the
  * data and candidates should return to ~N·nprobe·cellTarget (linear).
  *
  * Columns: hierT = trained coarse + PREFIX fine (the r14 shape whose
  * ×100 column was the finding); hierF = trained coarse + trained fine
  * (this round). `cands` is the probe-stage candidate volume
  * (`cand_rows`), `cell_max` the largest index-cell population (the
  * pile-up witness), `train` the quantizer training wall.
  *
  * Usage: runMain graft.tools.Round15ScaleDemo <sfDir> [multiples]
  *        [cellTarget] [trainIters] [variants]
  */
object Round15ScaleDemo {

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
    val variants = (if (args.length > 4) args(4) else "hierT,hierF")
      .split(',').map(_.trim).toSet
    // hierQ = hierF + probe-by-cell-mass-quota (bounds per-query
    // candidate volume by construction on skewed corpora)
    val quota = if (args.length > 5) args(5).toInt else 3 * cellTarget
    val nprobe = 3
    val k = 4
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

    /** Cold + warm build; returns (warm stage walls incl. cell_max, warm
      * total). Index temp dirs deleted per run. */
    def run2(f: (String, (String, Double) => Unit) => DataFrame)
        : (Map[String, Double], Double) = {
      var stages = Map.empty[String, Double]
      val walls = (0 until 2).map { i =>
        val tmp = java.nio.file.Files.createTempDirectory("graft-knn15")
        try {
          val (_, sec) = timed {
            val st = scala.collection.mutable.Map.empty[String, Double]
            val edges = f(tmp.toString, (n, s) => st(n) = s)
            edges.count()
            // pile-up witness: the largest cell's population, read back
            // from the cell-partitioned index layout
            st("cell_max") = spark.read.parquet(tmp.toString)
              .groupBy(col("cell")).count()
              .agg(max(col("count"))).head().getLong(0).toDouble
            if (i == 1) stages = st.toMap
            edges.unpersist()
          }
          sec
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
      (stages, walls.last)
    }

    println("| mult | vecs | cells | hierT s | hierF s | train s | " +
      "hierT cands | hierF cands | hierT cellmax | hierF cellmax | " +
      "hierQ s | hierQ cands |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|")
    mults.foreach { m =>
      val vecs = ScaleDemo.vecsAt(spark, sfDir, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = vecs.count()
      val numCells = math.max(nprobe + 1, (n / cellTarget).toInt)
      val (tStages, tWarm) =
        if (variants("hierT")) run2(
          (dir, onStage) => graft.operators.SimilarityIvf
            .knnGraphHierarchical(vecs, k, numCells, nprobe, dir,
              coarseTrainIters = trainIters, onStage = onStage))
        else (Map.empty[String, Double], Double.NaN)
      val (fStages, fWarm) =
        if (variants("hierF")) run2(
          (dir, onStage) => graft.operators.SimilarityIvf
            .knnGraphHierarchical(vecs, k, numCells, nprobe, dir,
              fineTrainIters = trainIters, onStage = onStage))
        else (Map.empty[String, Double], Double.NaN)
      val (qStages, qWarm) =
        if (variants("hierQ")) run2(
          (dir, onStage) => graft.operators.SimilarityIvf
            .knnGraphHierarchical(vecs, k, numCells, nprobe, dir,
              fineTrainIters = trainIters, probeMassQuota = quota,
              onStage = onStage))
        else (Map.empty[String, Double], Double.NaN)
      vecs.unpersist()
      def lg(st: Map[String, Double], key: String) =
        st.getOrElse(key, 0.0).toLong
      println(f"| x$m%-3d | $n%8d | $numCells%6d | $tWarm%7.2f | " +
        f"$fWarm%7.2f | ${fStages.getOrElse("train", 0.0)}%6.2f | " +
        f"${lg(tStages, "cand_rows")}%11d | ${lg(fStages, "cand_rows")}%11d | " +
        f"${lg(tStages, "cell_max")}%9d | ${lg(fStages, "cell_max")}%9d | " +
        f"$qWarm%7.2f | ${lg(qStages, "cand_rows")}%11d |")
      System.err.println(
        s"[stages x$m] hierT=$tStages hierF=$fStages hierQ=$qStages")
    }
    spark.stop()
  }
}
