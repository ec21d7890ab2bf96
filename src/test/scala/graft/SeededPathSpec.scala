package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.Term
import graft.sparql.Sparql

/** Seeded (constant-endpoint) path closure on a chain long enough to
  * run many BFS rounds — the shape the scale entry uses; also pins
  * agreement with the unseeded doubling closure on the same graph.
  */
class SeededPathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val NS = "http://graft.test/"
  private val termType =
    "struct<termType:string,lex:string,datatype:string,lang:string>"

  private def chain(n: Int) = {
    def node(c: org.apache.spark.sql.Column) = struct(
      lit(Term.IRI).as("termType"),
      concat(lit(s"${NS}n/"), c.cast("string")).as("lex"),
      lit(null).cast("string").as("datatype"),
      lit(null).cast("string").as("lang"))
    spark.range(n.toLong)
      .select(
        lit(null).cast(termType).as("graph"),
        node(col("id")).as("subject"),
        struct(lit(Term.IRI).as("termType"), lit(s"${NS}next").as("lex"),
          lit(null).cast("string").as("datatype"),
          lit(null).cast("string").as("lang")).as("predicate"),
        node(col("id") + 1).as("obj"))
  }

  test("seeded + over a 25-edge chain reaches all successors") {
    val res = Sparql.execute(chain(25),
        s"SELECT ?o { <${NS}n/0> <${NS}next>+ ?o }")
      .select(regexp_extract(col("o").getField("lex"), "n/(\\d+)$", 1)
        .cast("long").as("o"))
      .collect().map(_.getLong(0)).sorted
    assert(res.toSeq == (1L to 25L))
    Sparql.releaseClosures()
  }

  test("seeded matches unseeded on random graphs (branching, cycles)") {
    val rnd = new scala.util.Random(7L)
    for (trial <- 0 until 6) {
      val n = 8 + rnd.nextInt(8)
      val edges = Seq.fill(12 + rnd.nextInt(10))(
        (rnd.nextInt(n), rnd.nextInt(n))).distinct
      def node(i: Int) = struct(
        lit(Term.IRI).as("termType"), lit(s"${NS}n/$i").as("lex"),
        lit(null).cast("string").as("datatype"),
        lit(null).cast("string").as("lang"))
      val q = edges.map { case (a, b) =>
        spark.range(1).select(
          lit(null).cast(termType).as("graph"),
          node(a).as("subject"),
          struct(lit(Term.IRI).as("termType"), lit(s"${NS}next").as("lex"),
            lit(null).cast("string").as("datatype"),
            lit(null).cast("string").as("lang")).as("predicate"),
          node(b).as("obj"))
      }.reduce(_.unionByName(_))
      val seedN = rnd.nextInt(n)
      for (op <- Seq("+", "*")) {
        val seeded = Sparql.execute(q,
            s"SELECT ?o { <${NS}n/$seedN> <${NS}next>$op ?o }")
          .select(col("o").getField("lex").as("l"))
          .collect().map(_.getString(0)).toSet
        val full = Sparql.execute(q, s"SELECT ?s ?o { ?s <${NS}next>$op ?o }")
          .filter(col("s").getField("lex") === s"${NS}n/$seedN")
          .select(col("o").getField("lex").as("l"))
          .collect().map(_.getString(0)).toSet
        assert(seeded == full, s"trial=$trial op=$op seed=$seedN edges=$edges")
      }
      Sparql.releaseClosures()
    }
  }

  test("seeded matches unseeded closure filtered to the seed") {
    val q = chain(12)
    val seeded = Sparql.execute(q, s"SELECT ?o { <${NS}n/3> <${NS}next>+ ?o }")
      .select(col("o").getField("lex").as("l")).collect().map(_.getString(0)).toSet
    val full = Sparql.execute(q, s"SELECT ?s ?o { ?s <${NS}next>+ ?o }")
      .filter(col("s").getField("lex") === s"${NS}n/3")
      .select(col("o").getField("lex").as("l")).collect().map(_.getString(0)).toSet
    assert(seeded == full && seeded.size == 9)
    Sparql.releaseClosures()
  }
}
