package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed integer-PageRank cases: every division truncates, so
  * the expected values are derivable on paper — and must match exactly
  * (the operator's whole point is bit-reproducibility).
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pagerankInt: hand-computed two rounds, damping 1/2") {
    import spark.implicits._
    // 1→2, 2→1, 2→3; node 3 dangling (its mass drops, documented)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    def run(iters: Int) = graft.operators.GraphOps
      .pagerankInt(edges, iters, scale = 1000L, dampNum = 1L, dampDen = 2L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // n=3, init=333, base=(1*333) div 2=166
    // r1: share 1→333, 2→166; ranks: 1:166+83=249, 2:166+166=332, 3:166+83=249
    assert(run(1) == Seq((1L, 249L), (2L, 332L), (3L, 249L)))
    // r2: share 1→249, 2→166; ranks: 1:166+83=249, 2:166+124=290, 3:166+83=249
    assert(run(2) == Seq((1L, 249L), (2L, 290L), (3L, 249L)))
    // zero iterations: uniform init
    assert(run(0) == Seq((1L, 333L), (2L, 333L), (3L, 333L)))
  }

  test("pagerankInt: parallel edges dedup; result is partitioning-invariant") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = graft.operators.GraphOps.pagerankInt(edges, 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = graft.operators.GraphOps.pagerankInt(edges.repartition(7), 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    // the 2-cycle conserves non-truncated mass symmetrically
    assert(a.map(_._2).distinct.size == 1)
  }
}
