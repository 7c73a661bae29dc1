package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-16 measurement: SIZE-CAPPED (balanced) fine k-means
  * (`KMeans.fitQuantizedPerBranch(cellCapFactor > 1)`) — the
  * trainer-side complement SCALE.md's ×600 column named. r15 measured
  * that on the ×m smear the density peak grows with the replica count
  * itself, the probe quota must always admit a query's TOP cell, and so
  * per-query work tracks peak cell mass (cell_max 2,721 → 4,134 from
  * ×300 to ×600; over-ideal 1.92× → 2.92×). The balanced trainer
  * re-seeds each branch's emptiest cell onto an over-cap cell's
  * farthest member every Lloyd round — branch-local, nothing O(N) — so
  * the peak cell is split where it forms instead of being absorbed at
  * probe time.
  *
  * Columns: hierU = trained fine, cap OFF (the r15 shape); hierB =
  * trained fine, cap 2× branch mean; hierBQ = hierB + the r15 probe
  * quota (the full production stack). `cands` is the probe-stage
  * candidate volume, `cell_max` the largest index-cell population (the
  * quantity the cap exists to bound), `train` the trainer wall.
  *
  * Usage: runMain graft.tools.Round16ScaleDemo <sfDir> [multiples]
  *        [cellTarget] [trainIters] [variants] [quota] [capFactor]
  */
object Round16ScaleDemo {

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
    val trainIters = if (args.length > 3) args(3).toInt else 3
    val variants = (if (args.length > 4) args(4) else "hierU,hierB,hierBQ")
      .split(',').map(_.trim).toSet
    val quota = if (args.length > 5) args(5).toInt else 3 * cellTarget
    val capFactor = if (args.length > 6) args(6).toDouble else 2.0
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
        val tmp = java.nio.file.Files.createTempDirectory("graft-knn16")
        try {
          val (_, sec) = timed {
            val st = scala.collection.mutable.Map.empty[String, Double]
            val edges = f(tmp.toString, (n, s) => st(n) = s)
            edges.count()
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

    println("| mult | vecs | cells | hierU s | hierB s | hierBQ s | " +
      "train s | hierU cands | hierB cands | hierBQ cands | " +
      "hierU cellmax | hierB cellmax |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|")
    mults.foreach { m =>
      val vecs = ScaleDemo.vecsAt(spark, sfDir, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = vecs.count()
      val numCells = math.max(nprobe + 1, (n / cellTarget).toInt)
      def variant(name: String, q: Int, cap: Double)
          : (Map[String, Double], Double) =
        if (variants(name)) run2(
          (dir, onStage) => graft.operators.SimilarityIvf
            .knnGraphHierarchical(vecs, k, numCells, nprobe, dir,
              fineTrainIters = trainIters, probeMassQuota = q,
              fineCellCapFactor = cap, onStage = onStage))
        else (Map.empty[String, Double], Double.NaN)
      val (uStages, uWarm) = variant("hierU", 0, 0.0)
      val (bStages, bWarm) = variant("hierB", 0, capFactor)
      val (qStages, qWarm) = variant("hierBQ", quota, capFactor)
      vecs.unpersist()
      def lg(st: Map[String, Double], key: String) =
        st.getOrElse(key, 0.0).toLong
      println(f"| x$m%-3d | $n%8d | $numCells%6d | $uWarm%7.2f | " +
        f"$bWarm%7.2f | $qWarm%8.2f | " +
        f"${bStages.getOrElse("train", qStages.getOrElse("train", 0.0))}%6.2f | " +
        f"${lg(uStages, "cand_rows")}%11d | ${lg(bStages, "cand_rows")}%11d | " +
        f"${lg(qStages, "cand_rows")}%12d | " +
        f"${lg(uStages, "cell_max")}%9d | ${lg(bStages, "cell_max")}%9d |")
      System.err.println(
        s"[stages x$m] hierU=$uStages hierB=$bStages hierBQ=$qStages")
    }
    spark.stop()
  }
}
