package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge: apply an update batch to a
  * versioned dimension, closing the current row and opening a new one
  * ONLY where a tracked attribute actually changed (no-op updates
  * must not mint versions, or every full-snapshot feed doubles the
  * dimension).
  *
  * Contract: `dim` carries `key ++ tracked ++ (valid_from: DATE,
  * valid_to: DATE nullable — NULL = current)`; `updates` carries
  * `key ++ tracked`, one row per key; `effective` must not precede
  * any open row's valid_from. Update keys with no CURRENT dimension
  * row — brand-new keys, or retired keys whose versions are all
  * closed — INSERT as a new open version. A re-opened retired key
  * starts at max(effective, its latest closed valid_to), never
  * inside an existing version's validity range.
  *
  * Scale: one key-partitioned left join of the CURRENT slice against
  * the batch (history rows pass through untouched — with the
  * dimension partitioned on `valid_to IS NULL` the scan prunes to the
  * current slice), then a union of closed/kept/opened rows. Change
  * detection is null-safe (`<=>`), so NULL→value and value→NULL both
  * version. No window functions, no global sort — every step is
  * map-side or a key join, the same shape at 100 rows or 10 B.
  */
object Scd2 {

  def merge(
      dim: DataFrame,
      updates: DataFrame,
      key: Seq[String],
      tracked: Seq[String],
      effective: Column): DataFrame = {
    val hist = dim.where(col("valid_to").isNotNull)
    val cur = dim.where(col("valid_to").isNull)
    val upd = updates.select(
      key.map(col) ++ tracked.map(c => col(c).as(s"__u_$c")) :+ lit(true).as("__matched"): _*)
    val joined = cur.join(upd, key, "left")
    val changed = coalesce(col("__matched"), lit(false)) &&
      tracked.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    val dimCols = (key ++ tracked ++ Seq("valid_from", "valid_to")).map(col)
    // current rows whose tracked attributes changed: close at `effective`
    val closed = joined.where(changed)
      .select(key.map(col) ++ tracked.map(col)
        :+ col("valid_from") :+ effective.as("valid_to"): _*)
    // current rows with no (effective) update: pass through open
    val kept = joined.where(!changed).select(dimCols: _*)
    // changed updates become the new open version
    val opened = joined.where(changed)
      .select(key.map(col) ++ tracked.map(c => col(s"__u_$c").as(c))
        :+ effective.as("valid_from") :+ lit(null).cast("date").as("valid_to"): _*)
    // update keys with no current row: insert as a fresh open version.
    // A retired key re-opens past its newest closed version — opening
    // at a bare `effective` could overlap a closed row's validity
    val histMaxTo = hist.groupBy(key.map(col): _*)
      .agg(max(col("valid_to")).as("__max_to"))
    val inserted = updates
      .join(cur.select(key.map(col): _*).distinct(), key, "left_anti")
      .join(histMaxTo, key, "left")
      .select(key.map(col) ++ tracked.map(col)
        :+ greatest(effective, coalesce(col("__max_to"), effective)).as("valid_from")
        :+ lit(null).cast("date").as("valid_to"): _*)

    hist.select(dimCols: _*)
      .unionByName(closed)
      .unionByName(kept)
      .unionByName(opened)
      .unionByName(inserted)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
