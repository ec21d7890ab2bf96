package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class RelationalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("every declared query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but should be a deliberate, short list
    assert(noOracle.forall(n => SparkEntry.queries.contains(n)))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries execute at sf0.001 and are non-degenerate") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("q1 aggregates match hand-computed values at sf0.001") {
    import spark.implicits._
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter($"l_shipdate" <= "1999-12-01")
    val total = df.agg(org.apache.spark.sql.functions.sum($"count_order")).as[Long].head()
    assert(total == li.count())
  }

  test("q9 topk ordering is deterministic") {
    val rows = SparkEntry.queries("q9_topk")(spark, sf).collect()
    assert(rows.length == 15)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sameElements(prices.sorted.reverse))
  }
}
