package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet+CSV: ORC and JSON-lines
  * round-trips with explicit schemas (schema-on-read everywhere — the
  * engine never infers). */
class IoFormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trip preserves rows and schema") {
    val src = graft.io.Tables.table(spark, dir, "customer")
    val path = "/tmp/graft_io/customer_orc"
    src.write.mode("overwrite").orc(path)
    val back = spark.read.schema(src.schema).orc(path)
    assert(back.schema == src.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      src.orderBy("c_custkey").collect().toSeq)
  }

  test("JSON-lines round-trip with explicit schema (no inference)") {
    val src = graft.io.Tables.table(spark, dir, "nation")
    val path = "/tmp/graft_io/nation_json"
    src.write.mode("overwrite").json(path)
    val back = spark.read.schema(src.schema).json(path)
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
    // corrupt record handling: unparseable lines surface as nulls in
    // PERMISSIVE mode rather than failing the job
    val corrupt = spark.read.schema(src.schema)
      .option("mode", "PERMISSIVE")
      .json(spark.createDataset(Seq("""{"n_nationkey": 1, "n_name": "A"}""", "not json"))(
        org.apache.spark.sql.Encoders.STRING))
    assert(corrupt.count() == 2)
    assert(corrupt.where(col("n_nationkey").isNull).count() == 1)
  }
}
