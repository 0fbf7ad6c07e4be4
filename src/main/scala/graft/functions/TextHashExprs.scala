package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM kernels for the text-dedup hot path (shingling,
  * MinHash/LSH banding, SimHash). Each kernel computes, per ROW, what
  * the interpreted higher-order-function form computes per ELEMENT —
  * the per-element lambda dispatch (UTF8String concat → md5 expression
  * → string compare, repeated k × |shingles| times per document) is
  * what dominated the dedup queries (PLANS.md).
  *
  * Semantics are bit-identical to the HOF forms the DuckDB oracles
  * mirror ([[graft.queries.CorpusQueries]]):
  *  - shingles: n-token windows joined by ' ', distinct in first-
  *    occurrence order — `array_distinct(transform(sequence(...)))`;
  *  - MinHash row i: lexicographic MIN over shingles of
  *    md5("i:" ++ shingle) — minimized as raw 16-byte digests, which
  *    orders identically to lowercase-hex strings (hex is monotone in
  *    unsigned bytes), then hexified once;
  *  - LSH band j of b bands over k rows: md5(mh_{j·k/b} ‖ '|' ‖ …) —
  *    digest fed directly, UTF-8(concat) = concat(UTF-8);
  *  - SimHash bit b: set iff strictly more n-token windows (multiset)
  *    have md5 hex digit b ≥ '8' than not — counted from the digest
  *    nibble, `hexDigit ≥ '8' ⇔ nibble ≥ 8`.
  */
object TextKernels {

  private val hexDigits = "0123456789abcdef".toCharArray.map(_.toByte)

  private def md5(): MessageDigest = MessageDigest.getInstance("MD5")

  private def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** Unsigned byte-array compare — the 16-byte digest order that
    * equals lexicographic order of the lowercase-hex rendering. */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean =
    java.util.Arrays.compareUnsigned(a, b) < 0

  private def tokenBytes(tokens: ArrayData): Array[Array[Byte]] = {
    val n = tokens.numElements()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      out(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    out
  }

  /** UTF-8 bytes of `array_join(slice(tokens, start+1, n), " ")`. */
  private def windowBytes(toks: Array[Array[Byte]], start: Int, n: Int): Array[Byte] = {
    var len = n - 1
    var i = 0
    while (i < n) { len += toks(start + i).length; i += 1 }
    val out = new Array[Byte](len)
    var pos = 0
    i = 0
    while (i < n) {
      if (i > 0) { out(pos) = ' '.toByte; pos += 1 }
      val t = toks(start + i)
      System.arraycopy(t, 0, out, pos, t.length)
      pos += t.length
      i += 1
    }
    out
  }

  /** Distinct n-token shingles in first-occurrence order. Callers
    * filter `size(tokens) >= n` first (an empty array comes back
    * otherwise, same as the HOF form under that filter). */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val toks = tokenBytes(tokens)
    val nWin = toks.length - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < nWin) {
      seen.add(UTF8String.fromBytes(windowBytes(toks, i, n)))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** LSH band hashes over the MinHash signature, computed in one pass:
    * mins(j) = MIN digest of md5("j:" ++ shingle); band hash =
    * md5(hex(mins(j·r)) ‖ '|' ‖ … ‖ hex(mins(j·r+r−1))). Returns the
    * `bands` band hashes as lowercase hex (band_idx = array index). */
  def lshBands(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val md = md5()
    val nSh = shingles.numElements()
    val mins = new Array[Array[Byte]](k)
    var tmp = new Array[Byte](16)
    val salts = new Array[Array[Byte]](k)
    var j = 0
    while (j < k) { salts(j) = (j.toString + ":").getBytes("UTF-8"); j += 1 }
    var i = 0
    while (i < nSh) {
      val s = shingles.getUTF8String(i).getBytes
      j = 0
      while (j < k) {
        md.reset()
        md.update(salts(j))
        md.update(s)
        md.digest(tmp, 0, 16)
        if (mins(j) == null) { mins(j) = tmp; tmp = new Array[Byte](16) }
        else if (lessThan(tmp, mins(j))) { val old = mins(j); mins(j) = tmp; tmp = old }
        j += 1
      }
      i += 1
    }
    val rows = k / bands
    val out = new Array[AnyRef](bands)
    j = 0
    while (j < bands) {
      md.reset()
      var r = 0
      while (r < rows) {
        if (r > 0) md.update('|'.toByte)
        md.update(hex(mins(j * rows + r)))
        r += 1
      }
      md.digest(tmp, 0, 16)
      out(j) = UTF8String.fromBytes(hex(tmp))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature rows as lowercase hex (mh0..mh{k-1}) — the
    * intermediate [[lshBands]] folds over, exposed for the
    * signature-level API and spec cross-checks. */
  def minhashSigs(shingles: ArrayData, k: Int): ArrayData = {
    val md = md5()
    val nSh = shingles.numElements()
    val mins = new Array[Array[Byte]](k)
    var tmp = new Array[Byte](16)
    val salts = new Array[Array[Byte]](k)
    var j = 0
    while (j < k) { salts(j) = (j.toString + ":").getBytes("UTF-8"); j += 1 }
    var i = 0
    while (i < nSh) {
      val s = shingles.getUTF8String(i).getBytes
      j = 0
      while (j < k) {
        md.reset()
        md.update(salts(j))
        md.update(s)
        md.digest(tmp, 0, 16)
        if (mins(j) == null) { mins(j) = tmp; tmp = new Array[Byte](16) }
        else if (lessThan(tmp, mins(j))) { val old = mins(j); mins(j) = tmp; tmp = old }
        j += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](k)
    j = 0
    while (j < k) { out(j) = UTF8String.fromBytes(hex(mins(j))); j += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash bit-string over the MULTISET of n-token windows
    * (repeats weigh more, as in the original algorithm). Bit b
    * (0-based) is fed by BIT b of the window's md5 — i.e. bit
    * `8 >> (b & 3)` of hex digit `b / 4` — so the fingerprint uses
    * the digest's full first 64 bits. 64 bits is the standard
    * (Google-scale) width: 16-bit LSH bands give 65536-way bucket
    * spread where a 32-bit fingerprint's 8-bit bands cap at 256
    * buckets and its candidate joins explode at corpus scale. */
  def simhash(tokens: ArrayData, n: Int): UTF8String = {
    val md = md5()
    val toks = tokenBytes(tokens)
    val nWin = toks.length - n + 1
    val counts = new Array[Int](64)
    val tmp = new Array[Byte](16)
    var i = 0
    while (i < nWin) {
      md.reset()
      md.update(windowBytes(toks, i, n))
      md.digest(tmp, 0, 16)
      var b = 0
      while (b < 64) {
        val hexIdx = b >> 2
        val nibble =
          if ((hexIdx & 1) == 0) (tmp(hexIdx >> 1) >> 4) & 0xf
          else tmp(hexIdx >> 1) & 0xf
        if ((nibble & (8 >> (b & 3))) != 0) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    val bits = new Array[Byte](64)
    var b = 0
    while (b < 64) {
      bits(b) = if (counts(b) > 0) '1'.toByte else '0'.toByte
      b += 1
    }
    UTF8String.fromBytes(bits)
  }

  /** |A ∩ B| for two DISTINCT string arrays (shingle sets are
    * distinct by construction): hash-set membership of the smaller
    * side, one pass over the larger — the candidate-verify hot path,
    * replacing `size(array_intersect(...))`, which materializes the
    * whole intersection array per candidate pair. Equals DuckDB
    * `len(list_intersect(...))` on distinct inputs. */
  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val nSmall = small.numElements()
    val set = new java.util.HashSet[UTF8String](nSmall * 2)
    var i = 0
    while (i < nSmall) { set.add(small.getUTF8String(i)); i += 1 }
    val nLarge = large.numElements()
    var n = 0L
    i = 0
    while (i < nLarge) {
      if (set.contains(large.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

private[functions] trait StringArrayInput { self: UnaryExpression =>
  def prettyName: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
}

/** `graft_shingles(tokens, n)` → distinct n-token shingle array. */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullSafeEval(tokens: Any): Any =
    TextKernels.shingles(tokens.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.shingles($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_lsh_bands(shingles, k, bands)` → LSH band-hash array. */
case class LshBandsExpr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"
  override def nullSafeEval(shingles: Any): Any =
    TextKernels.lshBands(shingles.asInstanceOf[ArrayData], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.lshBands($c, $k, $bands);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_minhash(shingles, k)` → k-row MinHash signature array. */
case class MinHashSigsExpr(child: Expression, k: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullSafeEval(shingles: Any): Any =
    TextKernels.minhashSigs(shingles.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.minhashSigs($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash(tokens, n)` → 32-char SimHash bit-string. */
case class SimHashExpr(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(tokens: Any): Any =
    TextKernels.simhash(tokens.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_intersect_size(a, b)` → |A ∩ B| of two distinct string
  * arrays (single pass, no intersection array materialized). */
case class IntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_intersect_size"
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.intersectSize($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-API entry points for the text kernels. */
object TextExprs {
  private def lit(c: Column) = GraftColumnBridge.expression(c)
  def shingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(ShinglesExpr(lit(tokens), n))
  def lshBands(shingles: Column, k: Int, bands: Int): Column =
    GraftColumnBridge.column(LshBandsExpr(lit(shingles), k, bands))
  def minhashSigs(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSigsExpr(lit(shingles), k))
  def simhash(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(SimHashExpr(lit(tokens), n))
  def intersectSize(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectSizeExpr(lit(a), lit(b)))
}
