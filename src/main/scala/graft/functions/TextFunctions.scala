package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text-hash kernels, callable from interpreted eval and generated
  * code alike. All hashing is deterministic (FNV-1a 64 + splitmix64
  * finalizer) — no JVM-identity or seed-at-runtime dependence, so results
  * are stable across executors and runs (a requirement for shuffle-key
  * use: two executors must bucket the same shingle identically).
  */
object TextHash {
  /** FNV-1a 64 over UTF-8 bytes, strengthened with a splitmix64 finalizer. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Word n-gram shingles in one pass. Composing this from built-ins
    * (transform + element_at over split) looks declarative but Catalyst's
    * CollapseProject inlines the split() alias into every element_at,
    * re-tokenizing the document O(shingles x n) times — measured ~0.9 ms
    * per document vs microseconds here. */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val parts = s.split(UTF8String.fromString(" "), -1)
    if (parts.length < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](parts.length - n + 1)
    var i = 0
    while (i <= parts.length - n) {
      val slice = new Array[UTF8String](n)
      var j = 0
      while (j < n) { slice(j) = parts(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, slice: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k-permutation MinHash signature in ONE pass over the shingle array
    * (Kirsch–Mitzenmacher: h_i = h1 + i*h2), vs the naive k scans. */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h1 = hash64(arr.getUTF8String(i))
        val h2 = mix64(h1 ^ 0x5851f42d4c957f2dL) | 1L
        var h = h1
        var j = 0
        while (j < k) { if (h < out(j)) out(j) = h; h += h2; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token/shingle array: per-bit vote of each
    * element's hash, sign of the vote becomes the output bit. */
  def simhash(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
        var j = 0
        while (j < 64) { if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1; j += 1 }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Number of char k-grams the winnow walks: the SAME arithmetic
    * [[winnow]] sizes its hash array with (a short doc degenerates to
    * one whole-doc hash, hence the floor of 1). Exposed as its own
    * expression so the fingerprint verdict's n_kgrams column is
    * KERNEL-derived — a winnow that miscounts k-grams disagrees with
    * the oracle's closed form and breaks the hash. */
  def kgramCount(s: UTF8String, k: Int): Long = {
    val n = s.toString.length
    if (n < k) 1L else (n - k + 1).toLong
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): rolling hashes of
    * char k-grams, rightmost minimum per window of w, distinct + sorted.
    * Two documents sharing a run of >= k+w-1 chars share a fingerprint. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return new GenericArrayData(Array(mix64(str.hashCode.toLong)))
    val m = kgramCount(s, k).toInt
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h ^= str.charAt(i + j).toLong; h *= 0x100000001b3L; j += 1 }
      hs(i) = mix64(h)
      i += 1
    }
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    var start = 0
    while (start <= m - w || (start == 0 && m < w)) {
      val end = math.min(start + w, m)
      var minIdx = start
      var j = start + 1
      while (j < end) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      sel += hs(minIdx)
      start += 1
    }
    new GenericArrayData(sel.toArray)
  }
}

/** `word_shingles(text, n)` -> array<string> of word n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.wordShingles(input.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_signature(shingles, k)` -> array<long> of length k. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {
  require(numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[ArrayData], numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(tokens)` -> long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_fingerprint(text, k, w)` -> sorted distinct array<long>. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k > 0 && w > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.winnow(input.asInstanceOf[UTF8String], k, w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `kgram_count(text, k)` -> long: the winnow kernel's own k-gram count. */
case class KgramCount(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kgram_count"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.kgramCount(input.asInstanceOf[UTF8String], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.kgramCount($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrappers for the native text-hash expressions. */
object TextFunctions {
  def word_shingles(text: Column, n: Int): Column =
    SparkBridge.column(WordShingles(SparkBridge.expression(text), n))
  def minhash_signature(shingles: Column, k: Int): Column =
    SparkBridge.column(MinHashSignature(SparkBridge.expression(shingles), k))
  def simhash64(tokens: Column): Column =
    SparkBridge.column(SimHash64(SparkBridge.expression(tokens)))
  def winnow_fingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    SparkBridge.column(WinnowFingerprint(SparkBridge.expression(text), k, w))
  def kgram_count(text: Column, k: Int = 8): Column =
    SparkBridge.column(KgramCount(SparkBridge.expression(text), k))
}
