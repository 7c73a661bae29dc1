package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted-IVF serving path: the cell-partitioned index is actually
  * PRUNED at the scan (the 100 TB claim), and pruning changes no result. */
class SimilarityIvfSpec extends SparkSpec {
  import spark.implicits._

  test("served IVF reads only the probed cell partitions and matches the in-flight plan") {
    val out = SimilarityIvf.ivfServed.fn(spark, sfDir)
      .select($"qid", $"cid", $"rk").as[(Long, Long, Int)].collect().toSeq
    val flight = SimilarityIvf.ivfTopK.fn(spark, sfDir)
      .select($"qid", $"cid", $"rk").as[(Long, Long, Int)].collect().toSeq
    assert(out == flight, "pruned serving must equal the in-flight ranking")

    // rebuild the index here to inspect the pruned scan directly
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id",
        graft.functions.VectorExprs.quantize1000($"embedding").as("qv"))
    val cents = broadcast(e.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"qv".as("cv")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-spec")
    try {
      SimilarityIvf.buildCellIndex(e, cents, tmp.toString)
      val allCells = spark.read.parquet(tmp.toString)
        .select($"cell").distinct().as[Long].collect().toSet
      assert(allCells.size > 3, s"need >3 populated cells, got $allCells")
      val probed = allCells.take(2).toSeq
      val pruned = spark.read.parquet(tmp.toString)
        .filter($"cell".isin(probed: _*))
      // the scan must prune at PARTITION level: every file actually read
      // lives under a probed cell=... directory
      val files = pruned.select(input_file_name()).distinct().as[String].collect()
      assert(files.nonEmpty)
      assert(files.forall(f => probed.exists(c => f.contains(s"cell=$c"))),
        files.mkString("\n"))
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        plan.take(600))
      // one file per populated cell: the repartition(cell) write discipline
      val allFiles = spark.read.parquet(tmp.toString)
        .select(input_file_name()).distinct().count()
      assert(allFiles == allCells.size,
        s"$allFiles files for ${allCells.size} cells")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
