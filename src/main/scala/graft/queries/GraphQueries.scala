package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics entries over a link graph derived from the TPC-H
  * tables: customers and suppliers become nodes (suppliers offset by
  * 10,000,000 so the two key spaces cannot collide), and every
  * distinct customer–supplier trade (orders ⋈ lineitem) becomes one
  * edge in each direction. Exact integer PageRank over that graph is
  * re-derived in DuckDB as three unrolled power-iteration CTEs — the
  * integer arithmetic makes the comparison exact, not approximate.
  */
object GraphQueries {
  import Tables._

  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    // no distinct here: pagerankInt deduplicates as part of its one
    // src-partitioning exchange, so a pre-distinct would only add a
    // second full shuffle of the edge list for the same result
    val pairs = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + 10000000L).as("s"))
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_pagerank" -> { (s, dir) =>
      graft.operators.GraphOps.pagerankInt(tradeEdges(s, dir), iterations = 3)
        .orderBy(col("node"))
    })

  // one power-iteration round as SQL, parameterized by the previous
  // round's relation name (the same integer update the operator runs)
  private def round(prev: String, out: String): String =
    s"""$out AS (
         SELECT nodes.node,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM cnt)
                + (85 * COALESCE(inf.inflow, 0)) // 100 AS rank
         FROM nodes LEFT JOIN (
           SELECT e.dst AS node,
                  SUM($prev.rank // od.outdeg)::BIGINT AS inflow
           FROM e JOIN $prev ON $prev.node = e.src
                  JOIN od ON od.src = e.src
           GROUP BY 1) inf USING (node))"""

  val oracle: Map[String, String] = Map(
    "q28_pagerank" ->
      s"""WITH pairs AS (
           SELECT DISTINCT o_custkey AS c, 10000000 + l_suppkey AS s
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         e AS (SELECT c AS src, s AS dst FROM pairs
               UNION ALL SELECT s, c FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         cnt AS (SELECT count(*) AS n FROM nodes),
         od AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
         r0 AS (SELECT node, (SELECT 1000000000000 // n FROM cnt) AS rank
                FROM nodes),
         ${round("r0", "r1")},
         ${round("r1", "r2")},
         ${round("r2", "r3")}
         SELECT node, rank FROM r3 ORDER BY node""")
}
