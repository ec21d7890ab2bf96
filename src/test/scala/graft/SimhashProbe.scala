package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.queries.Tables

/** Throwaway probe: simhash pair-key bucket skew and whether a bucket
  * cap would lose true pairs.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.t(spark, sf, "documents")
      val keyed = docs
        .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
        .select(col("id"),
          posexplode(graft.functions.Sketches.simhashPairKeys(col("toks")))
            .as(Seq("band", "key")))
      val sizes = keyed.groupBy("band", "key").agg(count(lit(1)).as("n"))
      val stats = sizes.agg(max("n"), expr("percentile(n, 0.5)"),
        expr("percentile(n, 0.99)"), sum(expr("n*(n-1)/2"))).collect()(0)
      println(s"PROBE $sf buckets=${sizes.count()} maxSize=${stats.get(0)} " +
        s"p50=${stats.get(1)} p99=${stats.get(2)} candidatePairs=${stats.get(3)}")
      // true pairs (jaccard >= 0.5 like the entry) via the existing op
      val truePairs = Dedup.nearDupSimhash(docs).select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // for caps: which true pairs still share a bucket of size <= B?
      for (cap <- Seq(16, 32, 64, 128)) {
        val small = sizes.filter(col("n") <= cap).select("band", "key")
        val keptKeys = keyed.join(small, Seq("band", "key"))
        val pairsKept = keptKeys.alias("a").join(keptKeys.alias("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.id") < col("b.id"))
          .select(col("a.id").as("x"), col("b.id").as("y")).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val lost = truePairs.count(p => !pairsKept.contains(p))
        println(s"PROBE $sf cap=$cap truePairs=${truePairs.length} lost=$lost")
      }
    }
  }
}
