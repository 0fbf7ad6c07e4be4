package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Group-level MinHash as a custom aggregate
  * (`TypedImperativeAggregate`): the k-row signature of the UNION of
  * all shingle sets in a group, computed as a mergeable sketch —
  * update folds a row's shingles into k running min-digests, merge is
  * an elementwise min, so partial aggregation combines map-side and
  * the shuffle carries k×16 bytes per group regardless of group size.
  * That mergeability is exactly what makes group-level similarity
  * (near-duplicate SOURCES/sites/users, not just documents) feasible
  * at corpus scale.
  *
  * Signature rows are identical to the per-document form
  * ([[TextKernels.minhashSigs]]): row i = lexicographic MIN over the
  * group's shingles of md5("i:" ++ shingle), hexified — so a 1-doc
  * group equals the document signature, and the DuckDB oracle is a
  * plain GROUP BY MIN.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Array[Byte]]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](k)

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(k)(j => (j.toString + ":").getBytes("UTF-8"))

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val shingles = v.asInstanceOf[ArrayData]
      var i = 0
      val n = shingles.numElements()
      var tmp = new Array[Byte](16)
      while (i < n) {
        val s = shingles.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(salts(j))
          md.update(s)
          md.digest(tmp, 0, 16)
          if (buf(j) == null) { buf(j) = tmp; tmp = new Array[Byte](16) }
          else if (java.util.Arrays.compareUnsigned(tmp, buf(j)) < 0) {
            val old = buf(j); buf(j) = tmp; tmp = old
          }
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Array[Byte]], b2: Array[Array[Byte]]): Array[Array[Byte]] = {
    var j = 0
    while (j < k) {
      if (b1(j) == null) b1(j) = b2(j)
      else if (b2(j) != null && java.util.Arrays.compareUnsigned(b2(j), b1(j)) < 0)
        b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Array[Byte]]): Any =
    if (buf(0) == null) null
    else {
      val hexDigits = "0123456789abcdef".toCharArray.map(_.toByte)
      new GenericArrayData(buf.map { d =>
        val out = new Array[Byte](32)
        var i = 0
        while (i < 16) {
          out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
          out(2 * i + 1) = hexDigits(d(i) & 0xf)
          i += 1
        }
        UTF8String.fromBytes(out): AnyRef
      })
    }

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](k * 17)
    var j = 0
    while (j < k) {
      if (buf(j) != null) {
        out(j * 17) = 1
        System.arraycopy(buf(j), 0, out, j * 17 + 1, 16)
      }
      j += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](k)
    var j = 0
    while (j < k) {
      if (bytes(j * 17) == 1) {
        buf(j) = java.util.Arrays.copyOfRange(bytes, j * 17 + 1, j * 17 + 17)
      }
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** DataFrame-API aggregate column: `df.groupBy(g).agg(minhashAgg(shingles, 16))`. */
  def minhashAgg(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(shingles), k).toAggregateExpression())
}
