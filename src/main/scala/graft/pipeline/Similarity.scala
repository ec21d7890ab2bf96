package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]) —
  * beyond-reference extension (SURVEY.md §7 phase 7).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *    baseline. The query side is broadcast; the big side is scanned
  *    once, scored with codegen'd zip_with/aggregate, and ranked with
  *    one window shuffle partitioned by query id. Exact kNN is
  *    inherently a full scan; this is the canonical distributed shape.
  *  - [[lshTopK]]: random-hyperplane LSH — the 100 TB path. Candidates
  *    come from T sketch tables (bucket join, no all-pairs), then the
  *    exact rerank runs only within buckets. Recall is tunable via
  *    table count; tested against the brute-force baseline.
  *
  * All arithmetic is double-precision and in deterministic
  * element order (aggregate folds left-to-right), so scores reproduce
  * bit-for-bit across engines given the same formula.
  */
object Similarity {

  /** Dot product of two numeric array columns, computed in double by a
    * native codegen'd expression (left-to-right sum — bit-identical to
    * the oracle's formulation).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.Sketches.dotDouble(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: for each row of `queries`, the k nearest rows
    * of `embs` (self-match excluded). Output (query_id, rank,
    * neighbor_id); rank is 1-based, ties broken by neighbor id.
    *
    * Ranking uses dot/norm(neighbor) — the query norm is constant per
    * query, so ordering equals cosine ordering while avoiding one sqrt.
    */
  def bruteForceTopK(embs: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val e = embs.select(col(idCol).as("neighbor_id"), col(vecCol).as("ev"))
    val scored = q.crossJoin(e)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("ev")) / norm(col("ev"))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Random-hyperplane sketch keys: `tables` keys, each folding `bits`
    * sign bits into an integer bucket id. Hyperplanes are seeded and
    * materialized as literal arrays — pure codegen'd expressions.
    */
  def sketchKeys(vec: Column, dim: Int, tables: Int, bits: Int, seed: Long): Column =
    graft.functions.Sketches.hyperplaneSketch(vec.cast("array<double>"), dim, tables, bits, seed)

  /** Approximate cosine top-k: candidates from `tables` sketch tables
    * (bucket equi-join against the query side), exact rerank within
    * candidates. Same output shape as [[bruteForceTopK]]; recall < 1
    * by construction — tune `tables`/`bits` per corpus. Defaults were
    * swept at sf0.01 (5k vectors): 64 tables x 6 bits → recall 0.955
    * with ~n expected candidates/query; 48x6 fell to 0.86. Fewer bits
    * also raises recall but doubles expected bucket size per bit
    * removed (candidates ~ tables * n / 2^bits), the wrong trade at
    * scale.
    */
  def lshTopK(embs: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, tables: Int = 64, bits: Int = 6, seed: Long = 7L): DataFrame = {
    def keyed(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
        posexplode(sketchKeys(col(vecCol), dim, tables, bits, seed)).as(Seq("table", "key")))
    // dedup candidate PAIRS on ids only — shuffling the 64-float
    // vectors through a distinct was the dominant cost; vectors join
    // back afterwards (queries broadcast, one hash join for neighbors)
    val q = broadcast(keyed(queries, "query_id"))
    val e = keyed(embs, "neighbor_id")
    val cands = q.join(e, Seq("table", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = cands
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))), "query_id")
      .join(embs.select(col(idCol).as("neighbor_id"), col(vecCol).as("ev")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("ev")) / norm(col("ev"))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** IVF (inverted-file) top-k — the other classic ANN scale path
    * next to LSH: a coarse quantizer of `nlist` centroids partitions
    * the corpus into cells (at 100 TB the assignment is computed once
    * and persisted beside the vectors); a query probes its `nprobe`
    * closest cells and reranks exactly inside them, touching about
    * nprobe/nlist of the corpus.
    *
    * Training is `iters` Lloyd rounds executed as DataFrame
    * aggregations (assign: argmax dot against broadcast centroid
    * literals; update: per-dimension mean via posexplode + groupBy).
    * Only the centroid MODEL (nlist × dim doubles) ever reaches the
    * driver — data never does. Deterministic end to end: stride
    * sampling by id order for init, fixed round count, cosine metric
    * on unit-normalized centroids, ties to the higher cell index.
    *
    * Default `nprobe` is tuned for the synthetic corpus, which is
    * nearly ISOTROPIC (no cluster structure) — the worst case for
    * IVF, needing 12/16 cells for recall ≥ 0.9 (measured 0.94 at
    * sf0.01, 0.955 at sf0.1). Real embedding corpora cluster, which
    * is the IVF assumption; there nprobe/nlist shrinks by orders of
    * magnitude. [[lshTopK]] is the distribution-free default.
    */
  def ivfTopK(embs: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, nprobe: Int = 12, iters: Int = 2): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val centroids = trainCentroids(e, nlist, iters)
    val assigned = assignCells(e, centroids)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    // nprobe closest cells per query: scores against the centroid
    // literals, sorted in-row, explode — no shuffle on the query side
    val probed = q.select(col("query_id"), col("qv"),
        explode(slice(sort_array(cellScores(col("qv"), centroids), asc = false),
          1, nprobe).getField("i")).as("cell"))
    // a vector lives in exactly one cell and probed cells are
    // distinct, so candidate pairs need no dedup
    val scored = broadcast(probed).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / sqrt(dot(col("v"), col("v")))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Per-centroid (score, index) structs for a vector column. */
  private def cellScores(v: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.Sketches.dotDouble(v, typedLit(c.toSeq)).as("s"),
        lit(i).as("i"))
    }: _*)

  /** Hard cell assignment: argmax cosine against unit centroids
    * (array_max on (score, index) structs — ties to the larger
    * index, deterministic).
    */
  private[pipeline] def assignCells(e: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    e.select(col("id"), col("v"),
      array_max(cellScores(col("v"), centroids)).getField("i").as("cell"))

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Deterministic spread sample for quantizer init, as a plan:
    * hash-select ~2×`count` ids (`pmod(xxhash64(id), ·)` — a pure
    * filter, fully parallel), then the `count` smallest by id
    * (TakeOrdered: per-partition top-k merged at the driver). The
    * row_number-over-global-Window form this replaces funneled the
    * ENTIRE embeddings table through one task — a scale-killer shape
    * at 100 TB even when it only runs at training time.
    */
  private[graft] def strideSampleDf(e: DataFrame, count: Int, n: Long): DataFrame = {
    val mod = math.max(1L, n / (2L * count))
    e.filter(pmod(xxhash64(col("id")), lit(mod)) === 0)
      .orderBy(col("id")).limit(count).select(col("v"))
  }

  /** [[strideSampleDf]] collected, falling back to the first `count`
    * ids when the hash sample under-fills (tiny corpora).
    */
  private def strideSample(e: DataFrame, count: Int, n: Long): Array[Array[Double]] = {
    var rows = strideSampleDf(e, count, n).collect()
    if (rows.length < count && n > rows.length)
      rows = e.orderBy(col("id")).limit(count).select(col("v")).collect()
    rows.map(_.getSeq[Double](0).toArray)
  }

  private[pipeline] def trainCentroids(e: DataFrame, nlist: Int, iters: Int): Array[Array[Double]] = {
    // ONE pass does both pre-checks (guide §1.2 — don't pay two full
    // scans for two scalars): the count, and a fail-fast on non-finite
    // components (the decimal-mean cast would turn NaN/Inf into NULL
    // and avg() would silently skip them, yielding a quietly biased
    // centroid instead of a visible error).
    val Seq(n, poisoned) = e.agg(count(lit(1)),
        sum(when(exists(col("v"), x => isnan(x) ||
          x === Double.PositiveInfinity || x === Double.NegativeInfinity), 1L)
          .otherwise(0L)))
      .head().toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long]))
    require(poisoned == 0, "ivfTopK: embeddings contain NaN/Infinity components")
    require(n > 0, "ivfTopK: no embeddings to train on")
    val dim = e.select(size(col("v"))).head().getInt(0)
    var centroids = strideSample(e, nlist, n).map(unit)
    for (_ <- 0 until iters) {
      // exact DECIMAL means: double partial sums merge in shuffle
      // arrival order and would make centroids (hence the literal
      // recall oracle) run-to-run nondeterministic. Means are computed
      // as one per-dimension column aggregation — the posexplode form
      // this replaces shuffled dim× the rows through two aggregations
      // for the same decimal-exact result (guide §2.3: aggregate
      // columns, don't explode rows).
      val meanCols = (0 until dim).map(i =>
        avg(element_at(col("v"), i + 1).cast("decimal(28,14)"))
          .cast("double").as(s"m$i"))
      val means = assignCells(e, centroids)
        .groupBy(col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect().map(r => r.getInt(0) ->
          unit((1 to dim).map(r.getDouble).toArray)).toMap
      // an emptied cell keeps its previous centroid
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Product-quantization top-k (PQ + ADC + exact rerank) — the
    * COMPRESSION scale path next to LSH (hashing) and IVF
    * (partitioning): vectors are encoded once into `m` sub-codes
    * (argmin-L2 against per-subspace codebooks of `ksub` centroids),
    * so the ADC scan reads m bytes per vector instead of dim floats —
    * a 32× smaller corpus footprint at 100 TB, where scan bytes ARE
    * the cost. Each query precomputes a (m × ksub) inner-product
    * lookup table ONCE; scoring a candidate is then m array lookups
    * + adds (codegen'd), not a dim-wide dot. The `shortlist` best by
    * approximate score rerank exactly (full vectors join back only
    * for shortlisted ids), which restores exact ordering among the
    * survivors; recall is governed by shortlist size and codebook
    * distortion. In a production system this composes with IVF
    * (IVF-PQ: probe cells, ADC within them).
    *
    * Deterministic: hash-sampled init over ids ([[strideSampleDf]]),
    * fixed Lloyd rounds with exact DECIMAL means (same rationale as
    * [[ivfTopK]]), argmax ties to the FIRST (smallest) code index —
    * so the recall entry can assert a literal row.
    *
    * Plan-size note: the quantizer and the per-query lookup table are
    * expressed as higher-order functions (`transform`/`zip_with`) over
    * ONE 3-D codebook literal, not as m × ksub unrolled per-centroid
    * expressions. The unrolled form produced 256-node trees whose
    * optimize+codegen cost (~20 s) dwarfed the data at bench scale and
    * would be re-paid per training round; the HOF form keeps the plan
    * constant-size regardless of m/ksub, and only train/encode (run
    * once per corpus) take the interpreted-lambda path — the ADC scan
    * itself stays codegen'd element_at lookups.
    */
  def pqTopK(embs: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, m: Int = 8, ksub: Int = 32, iters: Int = 3,
      shortlist: Int = 0): DataFrame = {
    require(dim % m == 0, "dim must divide into m subspaces")
    val dsub = dim / m
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val n = e.count()
    // shortlist 0 = auto: a FRACTION of the corpus (n/4, ≥ 10k) so
    // recall holds as the corpus grows instead of decaying with a
    // fixed candidate count. The synthetic corpus is ISOTROPIC — the
    // worst case for any quantizer (same caveat as ivfTopK's nprobe):
    // measured recall 0.955 at sf0.01 with ksub=32/iters=3/n/4. On
    // clustered real corpora the workable fraction drops by orders of
    // magnitude; the ADC scan itself always reads m bytes/vector.
    val effShortlist =
      if (shortlist > 0) shortlist
      else math.max(10L * k, n / 4).toInt
    val books = trainCodebooks(e, m, dsub, ksub, iters, n)
    // the full codebook rides the plan as ONE 3-D literal (m × ksub ×
    // dsub doubles) plus its per-centroid ||c||² table — every
    // quantizer/lookup below indexes into these
    val lit3d = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val cnorm2: Array[Array[Double]] = books.map(_.map(c => c.map(x => x * x).sum))
    val halfN2 = typedLit(cnorm2.map(_.map(_ / 2).toSeq).toSeq)
    def sub(v: Column, mi: Column) = slice(v, mi * dsub + 1, lit(dsub))
    // argmin_j ||v_m - c_j||² = argmax_j (dot(v_m, c_j) - ||c_j||²/2);
    // array_position takes the FIRST max (deterministic tie-break)
    def codesOf(v: Column): Column =
      transform(sequence(lit(0), lit(m - 1)), mi => {
        val scores = zip_with(element_at(lit3d, mi + 1), element_at(halfN2, mi + 1),
          (c, h) => graft.functions.Sketches.dotDouble(sub(v, mi), c) - h)
        (array_position(scores, array_max(scores)) - 1).cast("int")
      })
    // the 100 TB shape: codes are computed ONCE and stored beside the
    // corpus (8 bytes/vector); only ids+codes ride the ADC scan
    val encoded = e.select(col("id"), codesOf(col("v")).as("codes"))
    // per-QUERY lookup tables, computed once on the broadcast side:
    // tab[m][j] = dot(q_m, c_{m,j})
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("tab", transform(sequence(lit(0), lit(m - 1)), mi =>
        transform(element_at(lit3d, mi + 1),
          c => graft.functions.Sketches.dotDouble(sub(col("qv"), mi), c))))
      .select(col("query_id"), col("tab"))
    val normTab = typedLit(cnorm2.map(_.toSeq).toSeq)
    def lookup(t: Column, mi: Int) =
      element_at(element_at(t, mi + 1), element_at(col("codes"), mi + 1) + 1)
    val approxDot = (0 until m).map(lookup(col("tab"), _)).reduce(_ + _)
    val approxNorm2 = (0 until m).map(lookup(normTab, _)).reduce(_ + _)
    val scoredApprox = broadcast(q).crossJoin(encoded)
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (approxDot / sqrt(approxNorm2)).as("ascore"))
    val w0 = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("neighbor_id").asc)
    val short = scoredApprox.withColumn("arank", row_number().over(w0))
      .filter(col("arank") <= effShortlist)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank of the shortlist only
    val rescored = short
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        "query_id")
      .join(embs.select(col(idCol).as("neighbor_id"), col(vecCol).as("ev")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("ev")) / norm(col("ev"))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Per-subspace Lloyd training of the PQ codebooks; the model
    * (m × ksub × dsub doubles) is the only thing the driver holds.
    *
    * ALL subspaces train in one pass per iteration: sub-vectors ride
    * an exploded (mi, s) projection, the assignment reads the full
    * codebook as ONE 3-D literal indexed by mi (zip_with lambda —
    * constant plan size, same rationale as [[pqTopK]]'s quantizer),
    * and a single (mi, cell, pos) aggregation updates every codebook —
    * `iters` jobs total instead of m × iters.
    *
    * Training reads a bounded hash sample of the corpus (≤ 2^16
    * vectors): Lloyd centroids converge on a sample — at 100 TB the
    * full-corpus pass is reserved for the ONE encode scan, never for
    * the training loop. Below the cap the sample is the whole corpus,
    * so small-SF results are unchanged by the bound.
    */
  private[graft] def trainCodebooks(e: DataFrame, m: Int, dsub: Int, ksub: Int,
      iters: Int, n: Long): Array[Array[Array[Double]]] = {
    val trainCap = 1 << 16
    val train =
      if (n <= trainCap) e
      else e.filter(pmod(xxhash64(col("id")), lit(math.max(1L, n / trainCap))) === 0)
    val sample = strideSample(e, ksub, n)
    var books: Array[Array[Array[Double]]] =
      (0 until m).toArray.map(mi => sample.map(_.slice(mi * dsub, mi * dsub + dsub)))
    val subs = train.select(
      posexplode(array((0 until m).map(mi =>
        slice(col("v"), mi * dsub + 1, dsub)): _*)).as(Seq("mi", "s")))
    for (_ <- 0 until iters) {
      val lit3d = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
      val halfN2 = typedLit(books.map(_.map(c => c.map(x => x * x).sum / 2).toSeq).toSeq)
      val scores = zip_with(element_at(lit3d, col("mi") + 1),
        element_at(halfN2, col("mi") + 1),
        (c, h) => graft.functions.Sketches.dotDouble(col("s"), c) - h)
      val cell = (array_position(scores, array_max(scores)) - 1).cast("int")
      // per-dimension columnar decimal means (same rationale as
      // trainCentroids: one aggregation, no posexplode row blowup)
      val meanCols = (0 until dsub).map(i =>
        avg(element_at(col("s"), i + 1).cast("decimal(28,14)"))
          .cast("double").as(s"mn$i"))
      val means = subs.select(col("mi"), cell.as("cell"), col("s"))
        .groupBy(col("mi"), col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          (2 until 2 + dsub).map(r.getDouble).toArray)
        .toMap
      books = books.indices.toArray.map(mi =>
        books(mi).indices.toArray.map(j => means.getOrElse((mi, j), books(mi)(j))))
    }
    books
  }

  /** Gate-checkable PQ recall vs the exact baseline — same contract
    * as [[lshRecall]].
    */
  def pqRecall(embs: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val brute = bruteForceTopK(embs, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val pq = pqTopK(embs, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    recallOf(brute, pq)
  }

  /** Gate-checkable IVF recall vs the exact baseline — same contract
    * as [[lshRecall]].
    */
  def ivfRecall(embs: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val brute = bruteForceTopK(embs, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = ivfTopK(embs, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    recallOf(brute, ivf)
  }

  /** Recall of [[lshTopK]] against [[bruteForceTopK]] as ONE
    * deterministic row `(n_queries, total_hits, mean_recall_ge_09)`.
    *
    * Both sides are deterministic (fixed hyperplane seed, exact
    * rerank, id-tiebroken ranks), so the row is a stable scenario
    * fact that a literal oracle can assert — this is what makes the
    * approximate operator checkable by the verify gate rather than
    * only by a unit test. `total_hits` is an integer (portable);
    * the mean recall is exposed only as a >= 0.9 boolean so no
    * cross-engine float formatting is involved.
    */
  def lshRecall(embs: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val brute = bruteForceTopK(embs, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val lsh = lshTopK(embs, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    recallOf(brute, lsh)
  }

  /** hits = true top-k pairs the approximate tier also surfaced;
    * grouped by query so partial coverage of one query can't mask
    * another.
    */
  private def recallOf(brute0: DataFrame, approx: DataFrame): DataFrame = {
    // the truth side is read twice (hit join + per-query totals);
    // without the checkpoint each read re-runs the full brute-force
    // scan+window — the most expensive plan in every recall entry
    val brute = brute0.localCheckpoint()
    try {
      val perQuery = brute
        .join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
      val out = brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
        .join(perQuery, Seq("query_id"), "left_outer")
        .select(col("n_true"), coalesce(col("hits"), lit(0L)).as("hits"))
        .agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("total_hits"),
          (sum(col("hits")).cast("double") / sum(col("n_true"))).as("mean_recall"))
        .select(col("n_queries"), col("total_hits"),
          (col("mean_recall") >= 0.9).as("mean_recall_ge_09"))
      // the recall summary is ONE row: materialize it now so the
      // checkpointed truth side — the largest intermediate in every
      // recall entry — is freed in-function instead of pinned for the
      // JVM lifetime (guide §5)
      val rows = java.util.Arrays.asList(out.collect(): _*)
      out.sparkSession.createDataFrame(rows, out.schema)
    } finally graft.plans.Checkpoints.unpersist(brute)
  }
}
