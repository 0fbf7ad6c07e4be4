package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** The one Spark-package bridge in this codebase: V1 streaming
  * sources must hand `MicroBatchExecution` an isStreaming=true frame
  * (it asserts), and the only constructor for that —
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * is `private[sql]`. This is the same access Spark's own
  * `FileStreamSource.getBatch` uses; connector codebases
  * conventionally open it with exactly this kind of shim. Nothing
  * else from the private surface is touched: the input is the
  * batch plan's own physical RDD, so the wrap is lazy and
  * distributed. */
object StreamingFrameBridge {
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
