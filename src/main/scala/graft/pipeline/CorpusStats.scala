package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics for training-data pipelines: per-document
  * salient terms by tf·idf-style weighting.
  *
  * Physical shape (the canonical corpus-aggregation plan):
  * one `explode` over tokens, two hash aggregations (both with
  * map-side partial aggregation — term frequency keyed on
  * (doc, token), document frequency keyed on token), a join of tf
  * against the much smaller df relation (Catalyst broadcasts it when
  * the vocabulary fits, sort-merge otherwise), and one window shuffle
  * partitioned by document for the top-k. No driver-side iteration at
  * any step; every stage scales with executors.
  */
object CorpusStats {

  /** Top-k salient terms per document, scored tf/df — monotone in
    * term frequency and inverse document frequency like classic
    * tf·idf, but ln-free: a single integer-over-integer double
    * division is bit-identical across engines, so the DuckDB oracle
    * can check the full output exactly (a log-based idf would drift
    * in the last ulp between libm implementations).
    *
    * Ties break by token so the result is total-order deterministic.
    * Returns (id, token, tf, df) rows, ≤ k per document.
    */
  def topTerms(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "token")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy((col("tf").cast("double") / col("df")).desc, col("token"))))
    scored.filter(col("rn") <= k)
      .select(col("id"), col("token"), col("tf"), col("df"))
  }

  /** EXACT corpus heavy hitters (tokens with count > total·num/den) in
    * two scans, never shuffling the distinct-token set:
    *
    * Pass 1 aggregates a mergeable Misra-Gries summary
    * ([[graft.functions.MisraGriesSummary]]) — `capacity` counters per
    * partial state, so the shuffle is O(capacity · partitions) pairs
    * regardless of vocabulary size, and the corpus total rides in the
    * same single-row aggregate. Every token with true frequency
    * > total/(capacity+1) provably survives the merge, so requiring
    * num/den ≥ 1/(capacity+1) makes the summary a SUPERSET of the
    * answer. Pass 2 exact-recounts only the ≤ capacity candidates (a
    * map-side isin filter — the bounded candidate list is the only
    * thing that ever reaches the driver) and applies the threshold as
    * pure integer arithmetic (`cnt·den > total·num`), so the result is
    * bit-identical across engines — no approximation survives the
    * operator. The alternative exact plan, COUNT(*) GROUP BY token
    * over 100 TB, shuffles every distinct token; this shuffles
    * `capacity` pairs per partition plus the final ≤ capacity groups.
    *
    * Returns (word, cnt) with exact counts, ordered (-cnt, word).
    */
  def heavyHitters(docs: DataFrame, textCol: String = "text",
      capacity: Int = 29, supportNum: Long = 1, supportDen: Long = 30): DataFrame = {
    require(supportNum > 0 && supportDen > 0 &&
      supportNum * (capacity + 1) >= supportDen,
      s"support $supportNum/$supportDen below the MG guarantee 1/${capacity + 1}")
    val words = docs.select(explode(split(col(textCol), " ")).as("word"))
    val mg = words
      .agg(graft.functions.FreqSketch.misraGries(col("word"), capacity).as("mg"))
      .head().getStruct(0)
    val total = mg.getLong(0)
    val candidates = mg.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    words.filter(col("word").isin(candidates: _*))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * supportDen > lit(total) * supportNum)
      .orderBy(col("cnt").desc, col("word"))
  }

  /** Positional inverted index with a hot-term guard — the retrieval
    * sibling of [[topTerms]]: token → document frequency + serialized
    * posting list "doc:pos,pos;doc:pos,…" in ascending doc order.
    *
    * The guard is what makes this a 100 TB plan rather than a toy:
    * document frequency is computed FIRST (an agg-sized relation), and
    * only terms with df ≤ `postingCap` ever enter the posting-list
    * collection — a stop-word's postings (≈ corpus-sized for "the")
    * are never collected, shuffled, or materialized anywhere; hot
    * terms emit (token, df, NULL). Stages: one posexplode scan, a
    * (token, doc) partial-agg shuffle, the tiny df aggregation, a
    * token-keyed join (skew-immune: every surviving token group is
    * ≤ postingCap postings by construction), and the per-token
    * assembly as sort_array/transform HOFs — no window, no driver
    * loop. Postings serialize to ONE string column so the result
    * crosses engines without nested-type hashing hazards.
    */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", postingCap: Int = 1000): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
    val perDoc = tok.groupBy(col("token"), col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
    val dfTab = perDoc.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val cold = perDoc
      .join(dfTab.filter(col("df") <= postingCap), Seq("token"))
      .select(col("token"), col("df"),
        struct(col("id").as("id"),
          concat(col("id").cast("string"), lit(":"),
            array_join(col("positions"), ",")).as("txt")).as("p"))
      .groupBy(col("token"), col("df"))
      .agg(array_join(
        transform(array_sort(collect_list(col("p"))), x => x("txt")),
        ";").as("postings"))
    val hot = dfTab.filter(col("df") > postingCap)
      .select(col("token"), col("df"),
        lit(null).cast("string").as("postings"))
    cold.unionByName(hot)
  }

  /** Distribution drift per source: the L1 distance between each
    * source's token distribution and the whole-corpus distribution —
    * the monitoring statistic of a mixture pipeline (a source whose
    * language suddenly shifts shows up here before it shows up in
    * loss curves).
    *
    * Exactness discipline: with per-source token counts c_st, source
    * totals n_s, global counts c_t and corpus total n,
    *   L1(s) = Σ_t |c_st/n_s − c_t/n| = (Σ_t |c_st·n − c_t·n_s|) / (n_s·n)
    * and the numerator splits into tokens PRESENT in the source plus
    * n_s·(n − Σ_present c_t) for the absent ones — so everything up to
    * the single final IEEE division is integer arithmetic,
    * order-independent and bit-reproducible across engines. (The
    * integer products bound the corpus at ~3·10⁹ tokens before BIGINT
    * overflow; past that, lift the same expressions to DECIMAL(38,0).)
    *
    * Plan: ONE corpus scan into the (source, token) partial-agg
    * shuffle; global token counts ROLL UP from that agg (vocab-sized,
    * never a second corpus pass), per-source totals broadcast, and the
    * final per-source fold is output-sized. Returns
    * (source, n_tokens, l1_num, l1_den, divergence in [0, 2]).
    */
  def sourceDivergence(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val st = docs.select(col(sourceCol).as("src"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("src"), col("token")).agg(count(lit(1)).as("c_st"))
    val tot = st.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val ns = st.groupBy(col("src")).agg(sum(col("c_st")).as("n_s"))
    val n = tot.agg(sum(col("c_t"))).head().getLong(0)
    val present = st.join(tot, Seq("token")).join(broadcast(ns), Seq("src"))
      .groupBy(col("src"))
      .agg(sum(abs(col("c_st") * n - col("c_t") * col("n_s"))).as("a"),
        sum(col("c_t")).as("g"))
    ns.join(present, Seq("src"))
      .select(col("src").as(sourceCol), col("n_s").as("n_tokens"),
        (col("a") + col("n_s") * (lit(n) - col("g"))).as("l1_num"),
        (col("n_s") * n).as("l1_den"))
      .withColumn("divergence",
        col("l1_num").cast("double") / col("l1_den").cast("double"))
  }
}
