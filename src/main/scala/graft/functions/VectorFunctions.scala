package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static vector kernels. Accumulation is sequential in index order and
  * entirely in double, with cosine = dot / (sqrt(na) * sqrt(nb)) — the
  * exact op sequence DuckDB's list_cosine_similarity uses on DOUBLE[],
  * so oracle comparisons are bit-identical (verified empirically).
  */
object VectorMath {
  // All binary kernels read ArrayData slots IN PLACE (getFloat/
  // getDouble on UnsafeArrayData is a direct word read) instead of
  // toFloatArray copies: an n²/2 pair scan evaluating a copying kernel
  // allocates ~0.5 KB PER PAIR — ~10 TB of young-gen churn at the
  // factor-100 probe's 2e10 pairs, which put the scan at the G1
  // allocation wall rather than the FMA throughput it should run at.
  // Values are bit-identical (same elements, same in-order double
  // accumulation); no caller feeds null elements.
  def cosF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = a.getFloat(i).toDouble; val yi = b.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** [[cosF]] over plain float arrays — the same in-order double
    * accumulation for partition-local kernels (per-group reranking)
    * that hold deserialized arrays rather than ArrayData slots;
    * bit-identical to `cosine_sim` on the same inputs. */
  def cosArr(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = a.getDouble(i); val yi = b.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2F(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  def l2D(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  def normF(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val xi = a.getFloat(i).toDouble; s += xi * xi; i += 1 }
    math.sqrt(s)
  }

  def normD(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * a.getDouble(i); i += 1 }
    math.sqrt(s)
  }

  /** nBits-bit random-hyperplane signature of a float vector: bit j is
    * the sign of the dot product with a pseudo-random ±1 hyperplane whose
    * entries come from the shared mix64 hash of (dim, bit) — every
    * executor derives identical planes with zero coordination or
    * broadcast state. P(bit agrees) = 1 - angle/pi (Charikar), so
    * banding the signature gives an ANN candidate filter for cosine. */
  def simhashVec(a: ArrayData, nBits: Int): Long =
    simhashVecSeeded(a, nBits, 0L)

  /** Seed-indexed hyperplane FAMILY: seed 0 is the original family
    * (signatures bit-identical to the unseeded kernel — every pinned
    * hash/bench stays put), and each other seed draws an independent
    * plane set by folding mix64(seed) into the (dim, bit) hash. This
    * is what frees LSH banding from the single-long 64-hyperplane
    * budget: band b reads its own full r-bit signature from seed b, so
    * band-key width can GROW with corpus size (the r17 emb_neardup_lsh
    * scale-wall fix) instead of slicing one fixed signature. */
  def simhashVecSeeded(a: ArrayData, nBits: Int, seed: Long): Long = {
    val x = a.toFloatArray()
    val acc = new Array[Double](nBits)
    val sm = if (seed == 0L) 0L else TextHash.mix64(seed)
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble
      var j = 0
      while (j < nBits) {
        val h = TextHash.mix64(((i.toLong << 32) | j.toLong) ^ sm)
        if ((h & 1L) == 0L) acc(j) += xi else acc(j) -= xi
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) { if (acc(j) >= 0.0) sig |= (1L << j); j += 1 }
    sig
  }

  /** POOLED multi-band signature — the WIDENED LSH arm's kernel (one
    * call computes every band's r-bit signature) with BLOCK hashing:
    * the per-bit family above burns one mix64 per (dim, bit) and uses
    * ONE of its 64 output bits, so a widened plan at bands x r total
    * bits pays bands x r x dim hash calls per row (the dominant
    * banded-stage cost in the ProdProfile factor-100 breakdown). Here
    * conceptual bit k = band * r + j draws its ±1 sign from bit
    * (k mod 64) of mix64((dim << 32) | (k / 64) ^ mix64(seed)) — all
    * 64 output bits of each hash call are spent, cutting hash calls
    * 64x (dim x ceil(totalBits/64) per row), and the embedding is
    * decoded ONCE per row instead of once per band expression.
    * Distinct conceptual bits are distinct hyperplanes, so disjoint
    * r-bit slices are exactly as independent as the per-band seeded
    * signatures they replace — the banding recall closed form is
    * unchanged; only the concrete hyperplane FAMILY differs (bucket
    * contents re-roll, pair-set contracts re-verified). Returns one
    * long per band, the band's r-bit signature in the low bits. */
  def simhashPool(a: ArrayData, r: Int, bands: Int, seed: Long)
      : ArrayData = {
    val x = a.toFloatArray()
    val total = r * bands
    val nBlocks = (total + 63) >>> 6
    val sm = TextHash.mix64(seed)
    val acc = new Array[Double](total)
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble
      var k = 0
      var blk = 0
      while (blk < nBlocks) {
        val h = TextHash.mix64(((i.toLong << 32) | blk.toLong) ^ sm)
        var t = 0
        val end = math.min(64, total - (blk << 6))
        while (t < end) {
          if (((h >>> t) & 1L) == 0L) acc(k) += xi else acc(k) -= xi
          t += 1
          k += 1
        }
        blk += 1
      }
      i += 1
    }
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < r) {
        if (acc(b * r + j) >= 0.0) sig |= (1L << j)
        j += 1
      }
      sigs(b) = sig
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sigs)
  }
}

/** `blocked_tile_pairs(tileA, tileB, diag)` -> array<struct<va, vb,
  * cos>>: ALL unordered pairs of the block tile clearing `tau`, scored
  * with exactly [[VectorMath]]'s cosine op sequence (per-row norms
  * hoisted, dot / (na * nb) — bit-identical to the expression-level
  * `dot_product / (vec_norm * vec_norm)` form, so the brute-force
  * oracle hash is unchanged).
  *
  * WHY a tile kernel: the declarative block join evaluates its pair
  * predicate through join-row plumbing — per PAIR it re-wraps both
  * embedding slots (an UnsafeArrayData allocation each) before the
  * 64-FMA dot even starts, and at the factor-100 probe's 2e10 pairs
  * that allocation churn, not arithmetic, was the measured wall (the
  * r18 SCALE probe: 305 s where the serial-dependency FMA floor is
  * ~55 s). Here each tile row is decoded to a primitive float array
  * ONCE (O(tile) allocations), and the O(tile²) inner loop is pure
  * arithmetic. One eval per TILE — nBlocks² calls per corpus — so
  * CodegenFallback costs nothing; per-group state is the tile itself,
  * bounded by the caller's nBlocks choice exactly like the join form
  * it replaces. Inputs: array<struct<id:long, e:array<float>>> per
  * side; `diag` = the two sides are the SAME block (emit i < j within
  * tile A, ignore B) vs a cross tile (emit the full A x B rectangle).
  * Output pairs are id-canonicalized (va < vb); only survivors of the
  * UNROUNDED cos >= tau cut materialize, so the output is near-dup-
  * density-sized, never tile². */
case class BlockedTilePairs(tileA: Expression, tileB: Expression,
                            diag: Expression, tau: Double)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  override def first: Expression = tileA
  override def second: Expression = tileB
  override def third: Expression = diag
  override def prettyName: String = "blocked_tile_pairs"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("va", LongType, nullable = false),
    StructField("vb", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))))
  override def checkInputDataTypes(): TypeCheckResult = {
    def tileOk(t: DataType): Boolean = t match {
      case ArrayType(StructType(Array(a, b)), _) =>
        a.dataType == LongType && b.dataType == ArrayType(FloatType, false) ||
          a.dataType == LongType && b.dataType == ArrayType(FloatType, true)
      case _ => false
    }
    if (tileOk(tileA.dataType) && tileOk(tileB.dataType) &&
        diag.dataType == org.apache.spark.sql.types.BooleanType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<long, array<float>>> tiles " +
        s"and a boolean, got ${tileA.dataType.simpleString}, " +
        s"${tileB.dataType.simpleString}, ${diag.dataType.simpleString}")
  }
  private def decode(t: ArrayData)
      : (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = t.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val s = t.getStruct(i, 2)
      ids(i) = s.getLong(0)
      val v = s.getArray(1).toFloatArray()
      vecs(i) = v
      var acc = 0.0; var j = 0
      while (j < v.length) { val x = v(j).toDouble; acc += x * x; j += 1 }
      norms(i) = math.sqrt(acc)
      i += 1
    }
    (ids, vecs, norms)
  }
  protected override def nullSafeEval(ta: Any, tb: Any, dg: Any): Any = {
    val (idsA, vecsA, normsA) = decode(ta.asInstanceOf[ArrayData])
    val isDiag = dg.asInstanceOf[Boolean]
    val (idsB, vecsB, normsB) =
      if (isDiag) (idsA, vecsA, normsA)
      else decode(tb.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < idsA.length) {
      val xi = vecsA(i); val ni = normsA(i)
      var j = if (isDiag) i + 1 else 0
      while (j < idsB.length) {
        val yj = vecsB(j)
        val nj = normsB(j)
        val p = ni * nj
        // same zero-norm convention and op order as cosFromNorms:
        // dot / (na * nb), in-order double accumulation
        val cos =
          if (ni == 0.0 || nj == 0.0) 0.0
          else {
            val n = math.min(xi.length, yj.length)
            var dot = 0.0; var k = 0
            while (k < n) { dot += xi(k).toDouble * yj(k).toDouble; k += 1 }
            dot / p
          }
        if (cos >= tau) {
          val a = idsA(i); val b = idsB(j)
          out += new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](math.min(a, b),
              math.max(a, b), cos))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(tileA = newFirst, tileB = newSecond, diag = newThird)
}

/** `cosine_sim(a, b)` -> double; a/b are array<float> or array<double>.
  * Native codegen expression: one tight loop per row, no per-element
  * boxing (vs functions.aggregate/zip_with which allocate intermediate
  * arrays and box every element).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def kernel: String = if (isFloat) "cosF" else "cosD"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  // The kernel is picked from the LEFT child's type and reads raw array
  // slots — without this check, int arrays or mixed float/double inputs
  // (reachable via the SQL registry) would read wrong-width data and
  // return garbage instead of failing analysis.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires both arguments to be array<float> or both " +
          s"array<double>, got ${lt.simpleString} and ${rt.simpleString}")
    }
  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat) VectorMath.cosF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorMath.cosD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.$kernel($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `l2_dist(a, b)` -> double: Euclidean distance, sqrt of the sequential
  * in-order sum of squared diffs in double — the op sequence DuckDB's
  * list_distance uses on DOUBLE[], so oracle comparisons stay
  * bit-identical (same discipline as [[CosineSimilarity]]). */
case class L2Distance(left: Expression, right: Expression)
  extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def kernel: String = if (isFloat) "l2F" else "l2D"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_dist"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires both arguments to be array<float> or both " +
          s"array<double>, got ${lt.simpleString} and ${rt.simpleString}")
    }
  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat) VectorMath.l2F(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorMath.l2D(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.$kernel($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dot_product(a, b)` -> double: the dot component of [[CosineSimilarity]]
  * alone — the per-pair kernel of an all-pairs scan whose norms were
  * hoisted out with [[VecNorm]]. `dot_product(a,b) / (vec_norm(a) *
  * vec_norm(b))` is BIT-identical to `cosine_sim(a,b)` (same in-order
  * double accumulation, same final sqrt-product division) whenever both
  * vectors share the corpus dimensionality, at ~1/3 the per-pair
  * arithmetic: an n²/2 scan evaluates norms n times instead of n²/2. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def kernel: String = if (isFloat) "dotF" else "dotD"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires both arguments to be array<float> or both " +
          s"array<double>, got ${lt.simpleString} and ${rt.simpleString}")
    }
  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat) VectorMath.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorMath.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.$kernel($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_norm(v)` -> double: L2 norm, sqrt of the in-order double sum of
  * squares — exactly the na/nb factor [[CosineSimilarity]] computes per
  * pair, hoisted to once per row (see [[DotProduct]]). */
case class VecNorm(child: Expression) extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def kernel: String = if (isFloat) "normF" else "normD"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.simpleString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    if (isFloat) VectorMath.normF(input.asInstanceOf[ArrayData])
    else VectorMath.normD(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorMath.$kernel($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `vec_simhash(v, nBits[, seed])` -> long: random-hyperplane LSH
  * signature of an array<float> embedding (see
  * [[VectorMath.simhashVecSeeded]]); seed selects an independent
  * hyperplane family (0 = the original, bit-compatible family). */
case class VecSimHash(child: Expression, nBits: Int, seed: Long = 0L)
  extends UnaryExpression {
  require(nBits > 0 && nBits <= 64)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_simhash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    VectorMath.simhashVecSeeded(input.asInstanceOf[ArrayData], nBits, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorMath.simhashVecSeeded($a, $nBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `vec_simhash_pool(v, r, bands[, seed])` -> array<long>: every
  * band's r-bit random-hyperplane signature in one pass (see
  * [[VectorMath.simhashPool]] — block-hashed sign stream, 64x fewer
  * hash calls than per-band [[VecSimHash]] evaluation, one embedding
  * decode per row). */
case class VecSimHashPool(child: Expression, r: Int, bands: Int,
                          seed: Long = 1L)
  extends UnaryExpression {
  require(r > 0 && r <= 62 && bands > 0)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_simhash_pool"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    VectorMath.simhashPool(input.asInstanceOf[ArrayData], r, bands, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorMath.simhashPool($a, $r, $bands, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    SparkBridge.column(CosineSimilarity(
      SparkBridge.expression(a), SparkBridge.expression(b)))

  def vec_simhash_pool(v: Column, r: Int, bands: Int): Column =
    SparkBridge.column(VecSimHashPool(SparkBridge.expression(v), r, bands))

  def vec_simhash(v: Column, nBits: Int): Column =
    SparkBridge.column(VecSimHash(SparkBridge.expression(v), nBits))

  def vec_simhash_seeded(v: Column, nBits: Int, seed: Long): Column =
    SparkBridge.column(VecSimHash(SparkBridge.expression(v), nBits, seed))

  def blocked_tile_pairs(tileA: Column, tileB: Column, diag: Column,
                         tau: Double): Column =
    SparkBridge.column(BlockedTilePairs(SparkBridge.expression(tileA),
      SparkBridge.expression(tileB), SparkBridge.expression(diag), tau))

  def dot_product(a: Column, b: Column): Column =
    SparkBridge.column(DotProduct(
      SparkBridge.expression(a), SparkBridge.expression(b)))

  def vec_norm(v: Column): Column =
    SparkBridge.column(VecNorm(SparkBridge.expression(v)))

  def l2_dist(a: Column, b: Column): Column =
    SparkBridge.column(L2Distance(
      SparkBridge.expression(a), SparkBridge.expression(b)))
}
