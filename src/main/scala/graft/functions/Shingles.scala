package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram shingling as a single native kernel.
  *
  * The composable formulation (`transform(sequence(...)) |> array_distinct`)
  * is interpreted (higher-order functions have no codegen) and
  * `array_distinct` is O(n²) on string arrays — ~2.4 ms per 300-char doc,
  * which dominated the whole dedup family. One imperative pass with a hash
  * set is ~100x cheaper and emits the same first-occurrence-ordered set.
  */
object ShingleOps {
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    if (str.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= str.length) {
      seen.add(str.substring(i, i + n))
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct character n-grams PACKED into a long — 16 bits per UTF-16
    * code unit, big-endian, so packing is INJECTIVE for n ≤ 4 and
    * equality of packed values is exactly string equality of the grams.
    * Value-equivalent to [[shingles]] up to the bijection (same distinct
    * set, so the same counts/intersections/jaccard downstream), but the
    * exploded candidate stream shuffles, sorts and window-counts
    * primitive longs instead of 3-char strings (guide §2.3 "narrower
    * types": ~2× fewer exchange bytes, primitive comparisons in the
    * (block, sh) sort, no UTF8String allocation per gram). Set order is
    * insertion order; nothing downstream reads array order. */
  def packedShingles(s: UTF8String, n: Int): ArrayData = {
    require(n <= 4, s"packedShingles supports n <= 4, got $n")
    val str = s.toString
    val total = str.length - n + 1
    if (total <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    // open-addressing long set (power-of-two table, linear probing);
    // `used` flags instead of a sentinel so the all-\0 gram stays valid
    var cap = 4
    while (cap < total * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](total)
    val mask = cap - 1
    var m = 0
    var i = 0
    while (i < total) {
      var v = 0L
      var j = 0
      while (j < n) { v = (v << 16) | str.charAt(i + j); j += 1 }
      // Stafford mix13 finalizer spreads the low-entropy packed chars
      var h = v
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      var idx = ((h ^ (h >>> 31)).toInt) & mask
      var continue = true
      while (continue) {
        if (!used(idx)) {
          used(idx) = true; table(idx) = v; out(m) = v; m += 1
          continue = false
        } else if (table(idx) == v) continue = false
        else idx = (idx + 1) & mask
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }

  /** Distinct space-joined word `n`-grams of an (already-normalized)
    * text, first-occurrence order. Value-identical to the
    * split + transform(sequence…slice…concat_ws) + array_distinct
    * higher-order formulation (which the DuckDB oracles still derive via
    * string_split + generate_series) but one imperative pass — the
    * higher-order chain is interpreted per gram and dominated the
    * decontamination scan. */
  def wordGrams(s: UTF8String, n: Int): ArrayData = {
    val words = TextKernelOps.splitWords(s.toString)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + n <= words.length) {
      seen.add(TextKernelOps.joinGram(words, j, n))
      j += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

object MinHashOps {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 8 consecutive hex nibbles of a digest starting at `nibbleOff`, as
    * an unsigned 32-bit value — exactly what
    * `conv(substring(hex(md5), nibbleOff+1, 8), 16, 10)` parses, read
    * straight off the digest bytes (no hex-string round trip). */
  @inline private def window32(d: Array[Byte], nibbleOff: Int): Long = {
    var v = 0L
    var j = nibbleOff
    val end = nibbleOff + 8
    while (j < end) {
      val b = d(j >> 1) & 0xff
      v = (v << 4) | (if ((j & 1) == 0) b >> 4 else b & 0xf)
      j += 1
    }
    v
  }

  /** All 16 md5-window minhash family minima of a NORMALIZED text's
    * distinct n-gram shingles, in one pass: families 0-7 are stride-3
    * 8-hex windows of md5(sh), 8-15 of md5('x'||sh) — exactly the
    * values `min(conv(substring(md5(sh), (i%8)*3+1, 8), 16, 10))`
    * aggregates, with no explode and no shuffle. Returns null-free
    * array<long> of 16; empty for texts shorter than `n` (the explode
    * formulation yields no group there — callers filter those out). */
  def minhash16(s: UTF8String, n: Int): ArrayData = minhash(s, n, 16)

  /** Like [[minhash16]] but computing only the first `numHashes` family
    * minima — the second digest (families 8-15) is skipped entirely when
    * `numHashes` ≤ 8, halving the md5 work for that configuration. */
  def minhash(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val str = s.toString
    if (str.length < n) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val md = md5Local.get()
    var i = 0
    while (i + n <= str.length) {
      val sh = str.substring(i, i + n)
      if (seen.add(sh)) {
        md.reset()
        val d1 = md.digest(sh.getBytes("UTF-8"))
        val d2 = if (numHashes > 8) {
          md.reset()
          md.digest(("x" + sh).getBytes("UTF-8"))
        } else null
        var f = 0
        while (f < numHashes) {
          val v = if (f < 8) window32(d1, f * 3) else window32(d2, (f - 8) * 3)
          if (v < mins(f)) mins(f) = v
          f += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }
}

object WinnowOps {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Winnowing fingerprints of a NORMALIZED text in one pass: 32-bit
    * md5-prefix hash per k-gram, minimum of each full sliding window of
    * `w` hashes, distinct minima out. Value-identical to the explode +
    * `min() OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)` + distinct
    * formulation (the DuckDB oracle's), with no explode and no window
    * shuffle. Texts with fewer than k+w-1 chars have no full window and
    * yield an empty array. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val nGrams = str.length - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val d = md.digest(str.substring(i, i + k).getBytes("UTF-8"))
      // first 8 hex nibbles = conv(substring(md5, 1, 8), 16, 10)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nGrams - w) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      out.add(m)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow_fps(text, k, w)` — distinct winnowing fingerprints, one pass. */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    WinnowOps.winnow(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowOps.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFps = copy(c)
}

/** `minhash16(text, n)` — the first `numHashes` (≤16) md5-window minhash
  * minima, one pass. */
case class MinHash16(child: Expression, n: Int, numHashes: Int = 16)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    MinHashOps.minhash(v.asInstanceOf[UTF8String], n, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashOps.minhash($c, $n, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHash16 = copy(c)
}

object ArraySetOps {
  /** |A ∩ B| for two string arrays whose elements are distinct within
    * each array (shingle sets) — hash the smaller side, probe the
    * larger. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      set.add(small.getUTF8String(i))
      i += 1
    }
    var n = 0
    i = 0
    while (i < large.numElements()) {
      if (set.contains(large.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  /** |A ∩ B| for two long arrays with distinct elements (packed shingle
    * sets) — open-addressing set over the smaller side, probe the
    * larger; no boxing, no UTF8String hashing. */
  def intersectCountLong(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    if (ns == 0) return 0
    var cap = 4
    while (cap < ns * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var i = 0
    while (i < ns) {
      val v = small.getLong(i)
      var h = v
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      var idx = ((h ^ (h >>> 31)).toInt) & mask
      var continue = true
      while (continue) {
        if (!used(idx)) { used(idx) = true; table(idx) = v; continue = false }
        else if (table(idx) == v) continue = false
        else idx = (idx + 1) & mask
      }
      i += 1
    }
    var n = 0
    val nl = large.numElements()
    i = 0
    while (i < nl) {
      val v = large.getLong(i)
      var h = v
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      var idx = ((h ^ (h >>> 31)).toInt) & mask
      var continue = true
      while (continue) {
        if (!used(idx)) continue = false
        else if (table(idx) == v) { n += 1; continue = false }
        else idx = (idx + 1) & mask
      }
      i += 1
    }
    n
  }
}

/** `intersect_count(a, b)` — distinct-element array intersection size. */
case class IntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArraySetOps.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArraySetOps.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectCount = copy(l, r)
}

/** `intersect_count_long(a, b)` — long-array intersection size. */
case class IntersectCountLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArraySetOps.intersectCountLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArraySetOps.intersectCountLong($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectCountLong = copy(l, r)
}

/** `packed_char_shingles(text, n)` — distinct n-grams packed to longs
  * (n ≤ 4), insertion order. */
case class PackedCharShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.packedShingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.packedShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): PackedCharShingles =
    copy(c)
}

/** `char_shingles(text, n)` — distinct n-grams in first-occurrence order. */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharShingles = copy(c)
}

/** `word_grams(s, n)` — distinct space-joined word n-grams, single-pass. */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.wordGrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.wordGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordGrams = copy(c)
}

object Shingles {
  def charShingles(c: Column, n: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(c), n))
  def wordGrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(c), n))
  def minhash16(c: Column, n: Int, numHashes: Int = 16): Column =
    ColumnBridge.column(MinHash16(ColumnBridge.expression(c), n, numHashes))
  def winnowFps(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(c), k, w))
  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def packedCharShingles(c: Column, n: Int): Column =
    ColumnBridge.column(PackedCharShingles(ColumnBridge.expression(c), n))
  def intersectCountLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntersectCountLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
