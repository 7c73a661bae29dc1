package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pca]] contract. The moment table is driver-oracle'd (sim_pca_model);
  * these specs pin what static SQL cannot: the eigensolve and the
  * projection. Ground-truth covariance is recomputed here with BigInt
  * arithmetic from the same quantization, so the residual checks compare
  * against an exact reference, not a second float summation. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val Q = 1048576.0

  /** Exact covariance of the quantized vectors (BigInt sums). */
  private def cov(vs: Array[Array[Float]]): Array[Array[Double]] = {
    val n = vs.length
    val q = vs.map(_.map(x => math.floor(x.toDouble * Q).toLong))
    val s = Array.ofDim[BigInt](Dim, Dim)
    val m = Array.fill[BigInt](Dim)(BigInt(0))
    for (d <- 0 until Dim; e <- d until Dim) s(d)(e) = BigInt(0)
    q.foreach { v =>
      var d = 0
      while (d < Dim) {
        m(d) += v(d)
        var e = d
        while (e < Dim) { s(d)(e) += BigInt(v(d)) * v(e); e += 1 }
        d += 1
      }
    }
    Array.tabulate(Dim, Dim) { (d, e) =>
      val (a, b) = if (d <= e) (d, e) else (e, d)
      (s(a)(b).toDouble / n -
        (m(d).toDouble / n) * (m(e).toDouble / n)) / (Q * Q)
    }
  }

  private def matVec(c: Array[Array[Double]], v: Array[Double]): Array[Double] =
    c.map(row => row.zip(v).map { case (a, b) => a * b }.sum)

  private def toDf(vs: Array[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")

  test("real embeddings: components orthonormal, eigen-residuals vanish, values descend") {
    val embs = graft.Tables.load(spark, sfDir, "embeddings")
    val vs = embs.select($"embedding").as[Seq[Float]].collect().map(_.toArray)
    val model = Pca.fit(toDf(vs), 8)
    val c = cov(vs)
    // eigenvalues descending and non-negative (covariance is PSD)
    assert(model.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    assert(model.eigenvalues.forall(_ >= -1e-10))
    // orthonormal components
    for (i <- model.components.indices; j <- i until model.components.length) {
      val dot = model.components(i).zip(model.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"component $i . $j = $dot")
    }
    // ||C v - lambda v||_inf ~ 0 against the EXACT covariance
    model.components.zip(model.eigenvalues).foreach { case (v, l) =>
      val r = matVec(c, v).zip(v).map { case (cv, vi) => math.abs(cv - l * vi) }.max
      assert(r < 1e-9 * math.max(1.0, math.abs(l)), s"residual $r for lambda $l")
    }
  }

  test("planted principal direction is recovered") {
    val rnd = new scala.util.Random(42)
    val u0 = Array.fill(Dim)(rnd.nextGaussian())
    val nrm = math.sqrt(u0.map(x => x * x).sum)
    val u = u0.map(_ / nrm)
    // strong variance along u, weak isotropic noise
    val vs = Array.tabulate(400) { i =>
      val a = (i % 9) - 4.0
      Array.tabulate(Dim)(d => (a * u(d) + 0.01 * rnd.nextGaussian()).toFloat)
    }
    val model = Pca.fit(toDf(vs), 2)
    val cosTop = model.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cosTop) > 0.999,
      s"top component should align with the planted direction, |cos|=$cosTop")
    assert(model.eigenvalues(0) > 50 * model.eigenvalues(1),
      "planted direction must dominate the spectrum")
  }

  test("projection variance per component equals its eigenvalue") {
    val embs = graft.Tables.load(spark, sfDir, "embeddings")
    val model = Pca.fit(embs, 4)
    val proj = Pca.project(embs, model)
    val stats = proj.agg(
      count(lit(1)).as("n"),
      (0 until 4).flatMap(c => Seq(
        sum(col(s"pc$c")).as(s"s$c"),
        sum(col(s"pc$c") * col(s"pc$c")).as(s"ss$c"))): _*).head()
    val n = stats.getLong(0).toDouble
    (0 until 4).foreach { c =>
      val s = stats.getDouble(1 + 2 * c); val ss = stats.getDouble(2 + 2 * c)
      val varC = ss / n - (s / n) * (s / n)
      // projection runs on raw floats, covariance on 2^-20-quantized
      // values — agreement to ~1e-4 relative is the expected gap
      assert(math.abs(varC - model.eigenvalues(c)) <
        1e-3 * math.max(1.0, model.eigenvalues(c)),
        s"pc$c variance $varC vs eigenvalue ${model.eigenvalues(c)}")
    }
  }
}
