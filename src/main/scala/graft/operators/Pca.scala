package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact PCA for embedding compression — the dimensionality-reduction
  * stage in front of semantic dedup / clustering at scale (public
  * precedent: SemDeDup and friends run KMeans/near-dup on PCA'd
  * embeddings; FAISS's OPQ/PCAMatrix pretransform is the same shape).
  *
  * Two phases, both deterministic:
  *
  * 1. FIT — one distributed pass accumulates per-partition second
  *    moments (count, Σx, upper-triangular Σxxᵀ: d(d+1)/2 + d doubles
  *    per partition, constant in corpus size); the driver reduces the
  *    partials IN PARTITION ORDER (bit-reproducible for a fixed input
  *    layout — the Classifier.trainLogistic rationale), forms the
  *    covariance, and runs a cyclic Jacobi eigendecomposition
  *    (deterministic rotation order, deterministic sign convention:
  *    the largest-|component| coordinate of each eigenvector is made
  *    positive, first index on tie).
  * 2. PROJECT — the loadings and the pre-folded mean offsets enter
  *    the plan as constants inside ONE native codegen'd expression
  *    ([[graft.plans.native.MatVecProject]]), so projecting the whole
  *    corpus is a zero-shuffle narrow pass: no centered-vector
  *    materialization, no HOF lambda (interpreted per element), no
  *    MLlib RowMatrix driver Gramian of corpus-sized rows.
  *
  * Scale shape at 100 TB: the fit moves #partitions × ~2 KB to the
  * driver once; the projection is map-only and column-pruned to the
  * embedding column. The 64×64 eigenproblem is driver-side constant
  * work.
  */
object Pca {

  /** Fitted model: `loadings` is row-major nComponents × dim;
    * `offsets(r)` = loadings_r · mean (pre-folded so projection is a
    * single fused multiply-add walk); `eigenvalues` are ALL dim
    * eigenvalues sorted descending (explained-variance reporting);
    * `trace` = total variance.
    */
  final case class PcaModel(dim: Int, nComponents: Int,
      mean: Array[Double], loadings: Array[Double],
      offsets: Array[Double], eigenvalues: Array[Double]) {
    def trace: Double = eigenvalues.sum
    def explained: Double =
      if (trace == 0.0) 0.0 else eigenvalues.take(nComponents).sum / trace
    /** Row r of the loading matrix. */
    def component(r: Int): Array[Double] =
      java.util.Arrays.copyOfRange(loadings, r * dim, (r + 1) * dim)
  }

  def fit(emb: DataFrame, nComponents: Int,
      vecCol: String = "embedding"): PcaModel = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(nComponents >= 1 && nComponents <= dim,
      s"nComponents must be in [1, $dim]")
    val tri = dim * (dim + 1) / 2
    val partials = emb.select(col(vecCol)).rdd.mapPartitionsWithIndex {
      (pid, rows) =>
        var n = 0L
        val s = new Array[Double](dim)
        val m = new Array[Double](tri)
        rows.foreach { r =>
          n += 1
          val x = r.getSeq[Float](0)
          var i = 0
          var t = 0
          while (i < dim) {
            val xi = x(i).toDouble
            s(i) += xi
            var j = i
            while (j < dim) { m(t) += xi * x(j).toDouble; t += 1; j += 1 }
            i += 1
          }
        }
        Iterator((pid, n, s, m))
    }.collect().sortBy(_._1)
    var n = 0L
    val sum = new Array[Double](dim)
    val mom = new Array[Double](tri)
    partials.foreach { case (_, pn, ps, pm) =>
      n += pn
      var i = 0
      while (i < dim) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < tri) { mom(i) += pm(i); i += 1 }
    }
    require(n > 1, "pca needs at least two vectors")
    val mean = sum.map(_ / n)
    // population covariance from the raw moments
    val cov = new Array[Double](dim * dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = mom(t) / n - mean(i) * mean(j)
        cov(i * dim + j) = c
        cov(j * dim + i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEig(cov, dim)
    // order by (eigenvalue desc, index asc) — deterministic under ties
    val order = eigVals.indices.sortBy(k => (-eigVals(k), k))
    val loadings = new Array[Double](nComponents * dim)
    var r = 0
    while (r < nComponents) {
      val k = order(r)
      // sign convention: largest-|coordinate| positive, first on tie
      var maxIdx = 0
      var maxAbs = 0.0
      var q = 0
      while (q < dim) {
        val a = math.abs(eigVecs(q * dim + k))
        if (a > maxAbs) { maxAbs = a; maxIdx = q }
        q += 1
      }
      val flip = if (eigVecs(maxIdx * dim + k) < 0) -1.0 else 1.0
      q = 0
      while (q < dim) {
        loadings(r * dim + q) = flip * eigVecs(q * dim + k)
        q += 1
      }
      r += 1
    }
    val offsets = new Array[Double](nComponents)
    r = 0
    while (r < nComponents) {
      var acc = 0.0
      var q = 0
      while (q < dim) { acc += loadings(r * dim + q) * mean(q); q += 1 }
      offsets(r) = acc
      r += 1
    }
    PcaModel(dim, nComponents, mean, loadings, offsets,
      order.map(eigVals(_)).toArray)
  }

  /** Project every vector onto the model's components: vec_id plus
    * pc1..pcK (rounded to 6; the centered dot products are computed
    * in one native pass).
    */
  def project(emb: DataFrame, model: PcaModel, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val pc = graft.plans.native.matVecProject(col(vecCol), model.loadings,
      model.offsets, model.dim)
    emb.select(col(idCol), pc.as("__pc"))
      .select(col(idCol) +:
        (0 until model.nComponents).map(j =>
          round(element_at(col("__pc"), j + 1), 6).as(s"pc${j + 1}")): _*)
  }

  /** Fit + project in one call — the registered-query shape. */
  def fitProject(emb: DataFrame, nComponents: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    project(emb, fit(emb, nComponents, vecCol), idCol, vecCol)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (row-major
    * d×d). Returns (eigenvalues, eigenvectors column-major: vector k
    * is [v(0·d+k) … v((d−1)·d+k)]). Deterministic: fixed (p,q) sweep
    * order, threshold-based convergence with a hard sweep cap.
    */
  private[operators] def jacobiEig(aIn: Array[Double], d: Int)
      : (Array[Double], Array[Double]) = {
    val a = aIn.clone()
    val v = new Array[Double](d * d)
    var i = 0
    while (i < d) { v(i * d + i) = 1.0; i += 1 }
    var frob = 0.0
    i = 0
    while (i < d * d) { frob += a(i) * a(i); i += 1 }
    val tol = 1e-28 * math.max(frob, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          off += 2.0 * apq * apq
          if (apq != 0.0) {
            val app = a(p * d + p); val aqq = a(q * d + q)
            val theta = (aqq - app) / (2.0 * apq)
            val tVal = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → signum 0; rotate at 45°
                case x => x
              }
            val c = 1.0 / math.sqrt(tVal * tVal + 1.0)
            val s = tVal * c
            // rows/cols p and q of A
            var k = 0
            while (k < d) {
              val akp = a(k * d + p); val akq = a(k * d + q)
              a(k * d + p) = c * akp - s * akq
              a(k * d + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p * d + k); val aqk = a(q * d + k)
              a(p * d + k) = c * apk - s * aqk
              a(q * d + k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k * d + p); val vkq = v(k * d + q)
              v(k * d + p) = c * vkp - s * vkq
              v(k * d + q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = new Array[Double](d)
    i = 0
    while (i < d) { eig(i) = a(i * d + i); i += 1 }
    (eig, v)
  }
}
