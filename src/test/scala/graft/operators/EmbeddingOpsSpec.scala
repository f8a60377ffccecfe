package graft.operators

import graft.SparkSpec

class EmbeddingOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pca power iteration: unit-lattice leading component, positive " +
    "lead, explained share in (0,1], and Gv aligns with v") {
    val rows = EmbeddingOps.s329PcaPower(spark, dir).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 64))
    val v = rows.map(_.getLong(1))
    // renormalized each round to max|component| = 1e9; sign fixed positive
    assert(v.map(math.abs).max == 1000000000L)
    val lead = v.zipWithIndex.minBy { case (x, d) => (-math.abs(x), d) }
    assert(lead._1 > 0, s"lead component must be positive, got $lead")
    val lambda6 = rows.head.getLong(2)
    val explained6 = rows.head.getLong(3)
    assert(lambda6 > 0)
    assert(explained6 > 0 && explained6 <= 1000000L,
      s"explained share must be a ratio, got $explained6")
    assert(rows.forall(r =>
      r.getLong(2) == lambda6 && r.getLong(3) == explained6))
    // eigen property: after 10 iterations Gv must point (almost) along v —
    // compute G in the test from the raw vectors and check the cosine
    val vecs = Similarity.vecs(spark, dir)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val g = Array.ofDim[Double](64, 64)
    vecs.foreach { x =>
      var i = 0
      while (i < 64) {
        var j = 0
        while (j < 64) { g(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    val vd = v.map(_.toDouble / 1e9)
    val gv = (0 until 64).map(i =>
      (0 until 64).map(j => g(i)(j) * vd(j)).sum).toArray
    val cos = gv.zip(vd).map { case (a, b) => a * b }.sum /
      (math.sqrt(gv.map(x => x * x).sum) * math.sqrt(vd.map(x => x * x).sum))
    // the bound reflects the FIXED budget, not full convergence: this
    // corpus's eigen-gap is λ2/λ1 ≈ 0.86, so 20 synchronous rounds land
    // at alignment ≈ 0.9989 (measured; lattice-independent — 1e6 and 1e9
    // agree to 1e-9). The fixed budget is the determinism contract (the
    // pagerank3 convention): both engines run the same rounds and agree
    // bit-for-bit on the state they reach.
    assert(cos > 0.995, s"Gv/v alignment $cos — diverged from the top axis")
  }
}
