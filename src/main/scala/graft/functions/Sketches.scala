package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch-heavy pipeline operators
  * (SURVEY.md §2.6 "UDF / custom expression surface").
  *
  * Why expressions and not SQL higher-order functions: Spark HOFs
  * (transform/aggregate/filter) always run INTERPRETED — a k=64
  * minhash over ~400 shingles is ~25k boxed lambda invocations per
  * row, which measured ~180 s for 5k docs. These expressions implement
  * `doGenCode`, so the sketch loop is one tight JVM method call inside
  * whole-stage codegen: same semantics, ~100× less overhead, and the
  * surrounding plan (scan → project → explode → join) stays fully
  * codegen'd. Each expression is deterministic and null-safe, so
  * Catalyst can prune/push/reorder around it freely.
  */
object Sketches {

  // ---- Column API ----------------------------------------------------------

  /** Banded MinHash bucket keys of a distinct-shingle array; one 31-bit
    * key per band (k permutations, k/bands rows per band).
    */
  def minhashBandKeys(sh: Column, k: Int = 64, bands: Int = 16, seed: Long = 42L): Column =
    ExpressionUtils.column(MinhashBandKeys(ExpressionUtils.expression(sh.cast("array<string>")), k, bands, seed))

  /** 64-bit SimHash of a token array, as nChunks equal bit-chunks. */
  def simhashChunks(tokens: Column, nChunks: Int = 8): Column =
    ExpressionUtils.column(SimhashChunks64(ExpressionUtils.expression(tokens.cast("array<string>")), nChunks))

  /** LSH band keys over PAIRS of simhash chunks: one key per unordered
    * chunk pair (C(nChunks,2) keys), key = both chunk values packed.
    * Complete through hamming ≤ nChunks-2 (pigeonhole: that many bit
    * errors leave ≥2 clean chunks, hence ≥1 clean pair); doubling the
    * key width tames the bucket skew single 8-bit chunks suffer on
    * homogeneous corpora.
    */
  def simhashPairKeys(tokens: Column, nChunks: Int = 8): Column =
    ExpressionUtils.column(SimhashPairKeys(ExpressionUtils.expression(tokens.cast("array<string>")), nChunks))

  /** Random-hyperplane sketch bucket keys: `tables` keys of `bits`
    * sign-bits each, planes seeded deterministically.
    */
  def hyperplaneSketch(vec: Column, dim: Int, tables: Int, bits: Int, seed: Long): Column =
    ExpressionUtils.column(HyperplaneSketch(ExpressionUtils.expression(vec.cast("array<double>")), dim, tables, bits, seed))

  /** Distinct word n-gram shingles of a token array (falls back to the
    * distinct tokens when there are fewer than n of them).
    */
  def wordNgrams(tokens: Column, n: Int = 3): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(tokens.cast("array<string>")), n))

  /** Exact Jaccard similarity |A∩B| / |A∪B| of two string arrays
    * (duplicates ignored) — an integer-ratio double, so bit-identical
    * to any other engine's formulation.
    */
  def jaccardSim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSim(ExpressionUtils.expression(a.cast("array<string>")),
      ExpressionUtils.expression(b.cast("array<string>"))))

  /** One-pass token statistics: returns
    * [n_tokens, n_distinct, hits(set_0), …, hits(set_k-1)] as
    * array<long> — the shared input of quality scoring and language ID
    * (one scan of the token array instead of k+2 interpreted HOF
    * passes).
    */
  def tokenSetCounts(tokens: Column, sets: Seq[Seq[String]]): Column =
    ExpressionUtils.column(TokenSetCounts(ExpressionUtils.expression(tokens.cast("array<string>")), sets))

  /** Hamming distance between two equal-length long arrays (e.g.
    * chunked simhashes): sum of bit_count(xor) per element.
    */
  def hammingDist(a: Column, b: Column): Column =
    ExpressionUtils.column(HammingDist(ExpressionUtils.expression(a.cast("array<bigint>")),
      ExpressionUtils.expression(b.cast("array<bigint>"))))

  /** Double-precision dot product of two numeric arrays, summed in
    * element order (bit-reproducible across engines).
    */
  def dotDouble(a: Column, b: Column): Column =
    ExpressionUtils.column(DotDouble(ExpressionUtils.expression(a.cast("array<double>")), ExpressionUtils.expression(b.cast("array<double>"))))

  /** Z-order (Morton) value of already-scaled dimension values: bit i
    * of dim d lands at position i·dims + d, so the sort order
    * interleaves all dimensions' bits — rows close in EVERY dimension
    * sort close, which is what makes multi-dimensional rectangle
    * predicates prune row groups ([[graft.pipeline.CorpusLayout
    * .writeZOrdered]]). Each value must already be in [0, 2^bits).
    */
  def zValue(scaled: Column, bits: Int): Column =
    ExpressionUtils.column(ZValue(ExpressionUtils.expression(scaled.cast("array<bigint>")), bits))

  // ---- shared helpers (called from generated code: must be static) ---------

  /** Interleave `bits` low bits of each array element (dim count =
    * array length): result bit i·dims + d = bit i of element d.
    */
  def zInterleave(scaled: ArrayData, bits: Int): Long = {
    val dims = scaled.numElements()
    var z = 0L
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < dims) {
        z |= ((scaled.getLong(d) >>> i) & 1L) << (i * dims + d)
        d += 1
      }
      i += 1
    }
    z
  }

  /** FNV-1a 64-bit over UTF8 bytes — deterministic, allocation-free.
    * (Internal sketch hash only; never crosses the oracle boundary.)
    */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val P = 2305843009213693951L // 2^61 - 1
  private val M31 = 1L << 31

  private val permCache = new ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()
  private def perms(k: Int, seed: Long): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent((k, seed), { case (kk, ss) =>
      val rnd = new scala.util.Random(ss)
      (Array.fill(kk)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
       Array.fill(kk)(rnd.nextInt(Int.MaxValue).toLong))
    })

  def minhashBandKeys(sh: ArrayData, k: Int, bands: Int, seed: Long): ArrayData = {
    val (a, b) = perms(k, seed)
    val minv = Array.fill(k)(Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val x = fnv64(sh.getUTF8String(i)) & (M31 - 1)
      var j = 0
      while (j < k) {
        val h = (a(j) * x + b(j)) % P
        if (h < minv(j)) minv(j) = h
        j += 1
      }
      i += 1
    }
    val r = k / bands
    val keys = new Array[Long](bands)
    var bI = 0
    while (bI < bands) {
      var acc = 0L
      var j = bI * r
      while (j < (bI + 1) * r) {
        acc = (acc * 31 + (minv(j) % M31)) % M31
        j += 1
      }
      keys(bI) = acc
      bI += 1
    }
    new GenericArrayData(keys)
  }

  def simhashChunks(tokens: ArrayData, nChunks: Int): ArrayData = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = fnv64(tokens.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    val bitsPerChunk = 64 / nChunks
    val chunks = new Array[Long](nChunks)
    var c = 0
    while (c < nChunks) {
      var acc = 0L
      var jj = 0
      while (jj < bitsPerChunk) {
        val bit = if (counts(c * bitsPerChunk + jj) * 2 >= n) 1L else 0L
        acc = acc * 2 + bit
        jj += 1
      }
      chunks(c) = acc
      c += 1
    }
    new GenericArrayData(chunks)
  }

  def simhashPairKeys(tokens: ArrayData, nChunks: Int): ArrayData = {
    val chunks = simhashChunks(tokens, nChunks).toLongArray()
    val keys = new Array[Long](nChunks * (nChunks - 1) / 2)
    var idx = 0
    var i = 0
    while (i < nChunks) {
      var j = i + 1
      while (j < nChunks) {
        keys(idx) = (chunks(i) << 32) | chunks(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(keys)
  }

  private val planeCache = new ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Double]]]()
  private def planes(dim: Int, tables: Int, bits: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, tables, bits, seed), { case (d, t, bi, ss) =>
      val rnd = new scala.util.Random(ss)
      Array.fill(t * bi)(Array.fill(d)(rnd.nextDouble() * 2 - 1))
    })

  def hyperplaneSketch(vec: ArrayData, dim: Int, tables: Int, bits: Int, seed: Long): ArrayData = {
    val pl = planes(dim, tables, bits, seed)
    val v = vec.toDoubleArray()
    val n = math.min(v.length, dim)
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var bI = 0
      while (bI < bits) {
        val p = pl(t * bits + bI)
        var d = 0.0
        var i = 0
        while (i < n) { d += v(i) * p(i); i += 1 }
        acc = acc * 2 + (if (d > 0) 1L else 0L)
        bI += 1
      }
      keys(t) = acc
      t += 1
    }
    new GenericArrayData(keys)
  }

  def wordNgrams(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (cnt < n) {
      var i = 0
      while (i < cnt) { out.add(tokens.getUTF8String(i)); i += 1 }
    } else {
      val sep = UTF8String.fromString(" ")
      var i = 0
      while (i + n <= cnt) {
        val parts = new Array[UTF8String](2 * n - 1)
        var j = 0
        while (j < n) {
          parts(2 * j) = tokens.getUTF8String(i + j)
          if (j < n - 1) parts(2 * j + 1) = sep
          j += 1
        }
        out.add(UTF8String.concat(parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def jaccardSim(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < b.numElements()) { sb.add(b.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) inter += 1 }
    val union = sa.size() + sb.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  def tokenSetCounts(tokens: ArrayData, sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](2 + sets.length)
    out(0) = n
    val distinct = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      distinct.add(t)
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(t)) out(2 + j) += 1
        j += 1
      }
      i += 1
    }
    out(1) = distinct.size()
    new GenericArrayData(out)
  }

  def hammingDist(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    acc
  }

  /** Left-to-right double sum — MUST keep this order: the DuckDB oracle
    * computes the same expression with the same associativity.
    */
  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }
}

/** See [[Sketches.minhashBandKeys(sh:org\.apache\.spark\.sql\.Column*]]. */
final case class MinhashBandKeys(child: Expression, k: Int, bands: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.minhashBandKeys(input.asInstanceOf[ArrayData], k, bands, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Sketches.minhashBandKeys($c, $k, $bands, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
}

/** See [[Sketches.simhashChunks(tokens:org\.apache\.spark\.sql\.Column*]]. */
final case class SimhashChunks64(child: Expression, nChunks: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_chunks"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.simhashChunks(input.asInstanceOf[ArrayData], nChunks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhashChunks($c, $nChunks)")
  override protected def withNewChildInternal(newChild: Expression): SimhashChunks64 =
    copy(child = newChild)
}

/** See [[Sketches.simhashPairKeys(tokens:org\.apache\.spark\.sql\.Column*]]. */
final case class SimhashPairKeys(child: Expression, nChunks: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_pair_keys"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.simhashPairKeys(input.asInstanceOf[ArrayData], nChunks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhashPairKeys($c, $nChunks)")
  override protected def withNewChildInternal(newChild: Expression): SimhashPairKeys =
    copy(child = newChild)
}

/** See [[Sketches.hyperplaneSketch(vec:org\.apache\.spark\.sql\.Column*]]. */
final case class HyperplaneSketch(child: Expression, dim: Int, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sketch"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.hyperplaneSketch(input.asInstanceOf[ArrayData], dim, tables, bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Sketches.hyperplaneSketch($c, $dim, $tables, $bits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}

/** See [[Sketches.wordNgrams(tokens:org\.apache\.spark\.sql\.Column*]]. */
final case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.wordNgrams(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.wordNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** See [[Sketches.jaccardSim(a:org\.apache\.spark\.sql\.Column*]]. */
final case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs two array<string>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sketches.jaccardSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sketches.jaccardSim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** See [[Sketches.tokenSetCounts(tokens:org\.apache\.spark\.sql\.Column*]]. */
final case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_set_counts"

  @transient private lazy val compiled: Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val hs = new java.util.HashSet[UTF8String]()
      ws.foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    Sketches.tokenSetCounts(input.asInstanceOf[ArrayData], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("tscSets", compiled,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.tokenSetCounts($c, $setsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenSetCounts =
    copy(child = newChild)
}

/** See [[Sketches.hammingDist(a:org\.apache\.spark\.sql\.Column*]]. */
final case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs two array<bigint>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_dist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sketches.hammingDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sketches.hammingDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
    copy(left = l, right = r)
}

/** See [[Sketches.zValue(scaled:org\.apache\.spark\.sql\.Column*]]. */
final case class ZValue(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<bigint>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"
  override protected def nullSafeEval(a: Any): Any =
    Sketches.zInterleave(a.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.zInterleave($c, $bits)")
  override protected def withNewChildInternal(c: Expression): ZValue =
    copy(child = c)
}

/** See [[Sketches.dotDouble(a:org\.apache\.spark\.sql\.Column*]]. */
final case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs two array<double>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sketches.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sketches.dotDouble($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotDouble =
    copy(left = l, right = r)
}
