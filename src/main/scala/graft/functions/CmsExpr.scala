package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-sketch frequency estimate — the heavy-hitter pruner: a
  * CMS never UNDER-estimates, so `estimate >= T` keeps a superset of
  * the values with true count >= T. Filtering the raw rows on the
  * estimate BEFORE the exact aggregation means only candidate-value
  * rows ever shuffle, and the exact count afterwards removes the
  * overestimates — exact heavy hitters with a map-only prefilter, the
  * frequency-domain analog of [[BloomFilterExpr]]'s semi-join
  * pruning. */
case class CmsEstimateExpr(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or bigint value, got ${other.simpleString}")
  }

  @transient private lazy val sketch: CountMinSketch = CountMinSketch.readFrom(cmsBytes)

  // content equality (Array[Byte] compares by reference) so identical
  // estimates canonicalize equal and subexpression elimination works
  override def equals(other: Any): Boolean = other match {
    case e: CmsEstimateExpr =>
      child == e.child && java.util.Arrays.equals(cmsBytes, e.cmsBytes)
    case _ => false
  }
  // cached: planning hashes expressions repeatedly; sketches are large
  @transient private lazy val bytesHash = java.util.Arrays.hashCode(cmsBytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash

  override def nullSafeEval(v: Any): Any = child.dataType match {
    // CountMinSketchAgg (the distributed builder) adds strings as
    // their UTF-8 bytes — estimate through the same path
    case StringType => sketch.estimateCount(v.asInstanceOf[UTF8String].getBytes)
    case _ => sketch.estimateCount(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", sketch, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case StringType => s"${ev.value} = $ref.estimateCount($v.getBytes());"
      case _ => s"${ev.value} = $ref.estimateCount((Long) $v);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsExpr {

  /** Distributed sketch build over a column; eps ≈ overestimate as a
    * fraction of total adds, confidence = P[within eps]. */
  def build(rows: DataFrame, column: String, eps: Double, confidence: Double): Array[Byte] = {
    val sketch = rows.stat.countMinSketch(column, eps, confidence, seed = 42)
    val out = new java.io.ByteArrayOutputStream()
    sketch.writeTo(out)
    out.toByteArray
  }

  def estimate(cmsBytes: Array[Byte], value: Column): Column =
    GraftColumnBridge.column(
      CmsEstimateExpr(GraftColumnBridge.expression(value), cmsBytes))
}
