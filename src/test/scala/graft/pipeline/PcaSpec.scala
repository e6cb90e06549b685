package graft.pipeline

import graft.SparkSpec

/** The eigen step of [[PcaQueries]] is the one part of q_pca_project the
  * DuckDB oracle cannot recompute (it re-derives everything else from the
  * staged projection matrix) — so the algebra is pinned here: residual,
  * orthonormality, eigenvalue ordering, determinism, and a 2×2 case with a
  * hand-computable answer.
  */
class PcaSpec extends SparkSpec {

  private def randSym(d: Int, seed: Long): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val v = r.nextGaussian(); m(i)(j) = v; m(j)(i) = v
    }
    m
  }

  test("jacobi: A·v = λ·v within 1e-9 and eigenvalues sorted descending") {
    val d = 16
    val a = randSym(d, 7L)
    val (vals, vecs) = PcaQueries.jacobiEigen(a)
    assert(vals.toSeq == vals.sortBy(-_).toSeq)
    for (c <- 0 until d) {
      val v = vecs(c)
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      val resid = math.sqrt((0 until d).map(i => {
        val e = av(i) - vals(c) * v(i); e * e
      }).sum)
      assert(resid < 1e-9, s"component $c residual $resid")
    }
  }

  test("jacobi: eigenvectors orthonormal within 1e-10") {
    val d = 16
    val (_, vecs) = PcaQueries.jacobiEigen(randSym(d, 11L))
    for (c1 <- 0 until d; c2 <- c1 until d) {
      val dot = (0 until d).map(i => vecs(c1)(i) * vecs(c2)(i)).sum
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"<v$c1, v$c2> = $dot")
    }
  }

  test("jacobi: deterministic (bit-identical across calls) and sign-fixed") {
    val a = randSym(32, 13L)
    val (v1, e1) = PcaQueries.jacobiEigen(a)
    val (v2, e2) = PcaQueries.jacobiEigen(a)
    assert(v1.toSeq == v2.toSeq)
    assert(e1.map(_.toSeq).toSeq == e2.map(_.toSeq).toSeq)
    // sign convention: each component's largest-|coeff| entry is positive
    e1.foreach { v =>
      val m = v.indices.maxBy(k => (math.abs(v(k)), -k))
      assert(v(m) > 0.0)
    }
  }

  test("jacobi: known 2x2 answer") {
    // [[2,1],[1,2]] has eigenvalues 3 (v ∝ [1,1]) and 1 (v ∝ [1,-1])
    val (vals, vecs) = PcaQueries.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r2) < 1e-12 && math.abs(vecs(0)(1) - r2) < 1e-12)
    assert(math.abs(math.abs(vecs(1)(0)) - r2) < 1e-12)
  }

  test("q_pca_project output is invariant under input partitioning") {
    // the projection is a sum of BIGINT products — any partial aggregation
    // order must yield identical rows (the 100 TB determinism contract)
    val build = graft.SparkEntry.queries("q_pca_project")
    val base = build(spark, sf("sf0.001")).collect().map(_.toSeq).toSeq
    val p = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = build(spark, sf("sf0.001")).collect().map(_.toSeq).toSeq
      assert(alt == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", p)
  }
}
