package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Bpe

/** BPE merge learning: hand-computed merges on the classic tiny
  * corpus, greedy-scan edge cases, and a fold-vs-reference property
  * over random symbol sequences (the HOF fold must match an
  * independent imperative greedy scan exactly).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def applied(syms: Seq[String], l: String, r: String): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(syms)).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), l, r).as("m"))
      .collect()(0).getSeq[String](0)
  }

  /** Independent reference: imperative leftmost-nonoverlapping scan. */
  private def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("applyMerge: greedy leftmost-nonoverlapping scan semantics") {
    assert(applied(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(applied(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(applied(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(applied(Seq("x", "a", "b", "c"), "a", "b") == Seq("x", "ab", "c"))
    assert(applied(Seq("xa", "b"), "a", "b") == Seq("xa", "b"))
    assert(applied(Seq("q"), "a", "b") == Seq("q"))
  }

  test("applyMerge matches the imperative reference on random sequences") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("a", "b", "ab", "c")
    val cases = Seq.fill(200) {
      Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length)))
    }
    for ((l, r) <- Seq(("a", "b"), ("a", "a"), ("ab", "c"), ("b", "a"))) {
      val got = cases.map(Tuple1(_)).toDF("syms")
        .select(Bpe.applyMerge(col("syms"), l, r).as("m"))
        .collect().map(_.getSeq[String](0).toSeq)
      val want = cases.map(refMerge(_, l, r))
      assert(got.toSeq == want.toSeq, s"divergence for merge ($l,$r)")
    }
  }

  test("learn reproduces the hand-computed classic example") {
    import spark.implicits._
    // "low low lower": words low×2 (l o w), lower×1 (l o w e r)
    // r1: (l,o)=3 ties (o,w)=3 → lex least (l,o); r2: (lo,w)=3;
    // r3: (e,r)=1 beats (low,e)=1 lexicographically; r4: (low,er)=1
    val docs = Seq("low low lower").toDF("text")
    val (merges, wt) = Bpe.learn(docs, 4)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.pairCount)) == Seq(
      (1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)))
    val finalSyms = wt.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(finalSyms("low") == Seq("low"))
    // merge 4 (low,er) is itself applied to the final table
    assert(finalSyms("lower") == Seq("lower"))
    graft.plans.Checkpoints.unpersist(wt)
  }

  test("learn stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq("ab ab cd").toDF("text")
    val (merges, wt) = Bpe.learn(docs, 10)
    // r1 merges (a,b)=2; r2 merges (c,d)=1; then every word is one
    // symbol — no pairs, so learning stops at 2 merges, not 10
    assert(merges.length == 2)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b"), ("c", "d")))
    graft.plans.Checkpoints.unpersist(wt)
  }

  test("tokenCounts joins distinct words, weighted by occurrences") {
    import spark.implicits._
    val docs = Seq(("s1", "low low"), ("s2", "lower low"))
      .toDF("source", "text")
    val (_, wt) = Bpe.learn(docs.select(col("text")), 2) // (l,o), (lo,w)
    val got = Bpe.tokenCounts(docs, wt).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // after 2 merges: low → [low] (1 token), lower → [low, e, r] (3)
    assert(got.toSeq == Seq(("s1", 2L, 2L), ("s2", 4L, 2L)))
    graft.plans.Checkpoints.unpersist(wt)
  }

  test("per-round checkpoints are freed: only the final table stays") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val docs = Seq("low low lower wider").toDF("text")
    val (_, wt) = Bpe.learn(docs, 4)
    val during = spark.sparkContext.getPersistentRDDs.size
    assert(during <= before + 1,
      s"superseded BPE rounds left pinned: $before -> $during")
    graft.plans.Checkpoints.unpersist(wt)
  }
}
