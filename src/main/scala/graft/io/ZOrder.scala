package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for the write path — multi-column data
  * skipping: linear sort order makes parquet min/max stats selective
  * on ONE leading column; interleaving the bits of two normalized
  * columns makes every file cover a small rectangle in BOTH
  * dimensions, so scans filtered on either column (or both) prune
  * most files. The standard lakehouse layout technique (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), here as plain codegen-friendly bit
  * arithmetic over parquet.
  *
  * Scale: normalization needs one global (min, max) per column
  * (a broadcast scalar agg), the Morton code itself is pure
  * per-row bit math, and the layout is a `repartitionByRange` +
  * within-partition sort on the code — the same one-shuffle cost as
  * any sorted rewrite.
  */
object ZOrder {

  private val Bits = 21 // 2 × 21 = 42 bits of interleave, fits a long

  /** Spread the low 21 bits of `x` so consecutive bits land 2 apart —
    * the classic 2D Morton magic masks (each step halves the group
    * size until every bit sits at an even position). */
  private def spread(x: Column): Column = {
    var v = x.bitwiseAND(lit((1L << Bits) - 1))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
    v
  }

  /** Min-max normalize a numeric column to the [0, 2²¹) grid using
    * precomputed bounds. */
  private def gridCell(c: Column, min: Column, max: Column): Column = {
    val span = max.cast("double") - min.cast("double")
    val unit = when(span > 0, (c.cast("double") - min.cast("double")) / span)
      .otherwise(lit(0.0))
    least(floor(unit * ((1L << Bits) - 1)), lit((1L << Bits) - 1)).cast("long")
  }

  /** The interleaved Morton code of two numeric columns (bounds as
    * columns so they can come from a broadcast agg join). */
  def mortonCode(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column): Column =
    spread(gridCell(a, aMin, aMax))
      .bitwiseOR(shiftleft(spread(gridCell(b, bMin, bMax)), 1))

  /** Rewrite `df` into `nFiles` files z-ordered on (a, b): one
    * broadcast bounds agg, one range shuffle on the code, sorted
    * within partitions so row groups inside each file are tight
    * too. */
  def writeZOrdered(df: DataFrame, a: String, b: String, nFiles: Int, path: String): Unit = {
    val bounds = df.agg(
      min(col(a)).as("__amin"), max(col(a)).as("__amax"),
      min(col(b)).as("__bmin"), max(col(b)).as("__bmax"))
    val coded = df.crossJoin(broadcast(bounds))
      .withColumn("__z", mortonCode(
        col(a), col("__amin"), col("__amax"),
        col(b), col("__bmin"), col("__bmax")))
    coded
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__amin", "__amax", "__bmin", "__bmax", "__z")
      .write.mode("overwrite").parquet(path)
  }
}
