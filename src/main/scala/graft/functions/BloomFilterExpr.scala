package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership test — the semi-join pruner for the
  * 100 TB decontamination / keep-set shape: build one compact filter
  * from the SMALL side (distributed `df.stat.bloomFilter`, a
  * tree-aggregated build), ship its bytes inside this expression, and
  * prefilter the BIG side map-only so only might-contain survivors
  * reach the exact join. No false negatives, so
  * `bloom-prefilter → exact join` returns EXACTLY the plain join's
  * rows — same oracle, a plan that shuffles ~fpp of the corpus
  * instead of all of it.
  *
  * Codegen calls straight into the referenced filter object
  * (deserialized once per executor, not per row); strings test via
  * their UTF-8 bytes, matching `putString`'s hashing.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or bigint test value, got ${other.simpleString}")
  }

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(bloomBytes)

  // content equality (Array[Byte] compares by reference): without it
  // two structurally identical probes never canonicalize equal and
  // Catalyst's subexpression elimination can't deduplicate them
  override def equals(other: Any): Boolean = other match {
    case e: BloomMightContainExpr =>
      child == e.child && java.util.Arrays.equals(bloomBytes, e.bloomBytes)
    case _ => false
  }
  // cached: Catalyst hashes expressions repeatedly during planning and
  // the serialized filter can be megabytes
  @transient private lazy val bytesHash = java.util.Arrays.hashCode(bloomBytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case _ => filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case StringType => s"${ev.value} = $ref.mightContainBinary($v.getBytes());"
      case _ => s"${ev.value} = $ref.mightContainLong($v);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFilterExpr {

  /** Distributed build over a column of the (small) key set; returns
    * the serialized filter for [[mightContain]]. `fpp` trades filter
    * size against the fraction of the big side that survives to the
    * exact join. */
  def build(keys: DataFrame, column: String, fpp: Double): Array[Byte] = {
    val n = math.max(keys.select(column).count(), 1L)
    val filter = keys.stat.bloomFilter(column, n, fpp)
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  /** DataFrame-API entry point: `mightContain(bytes, col("shingle"))`. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftColumnBridge.column(
      BloomMightContainExpr(GraftColumnBridge.expression(value), bloomBytes))
}
