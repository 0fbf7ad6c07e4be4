package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFilterExpr

/** Bloom membership expression: no false negatives, bounded false
  * positives, long support, and codegen/interpreted agreement. */
class BloomFilterExprSpec extends SparkSpec {
  import spark.implicits._

  test("string membership: every inserted key survives, few outsiders do") {
    val keys = (1 to 500).map(i => s"key-$i").toDF("k")
    val bloom = BloomFilterExpr.build(keys, "k", fpp = 0.01)
    val members = keys.where(BloomFilterExpr.mightContain(bloom, col("k"))).count()
    assert(members == 500, "Bloom filters must have no false negatives")
    val outsiders = (1 to 2000).map(i => s"other-$i").toDF("k")
      .where(BloomFilterExpr.mightContain(bloom, col("k"))).count()
    assert(outsiders < 200, s"false-positive count $outsiders way over fpp")
  }

  test("long membership works and misses cleanly") {
    val keys = (1L to 100L).toDF("k")
    val bloom = BloomFilterExpr.build(keys, "k", fpp = 0.01)
    val hits = spark.range(1, 5000).toDF("k")
      .where(BloomFilterExpr.mightContain(bloom, col("k"))).count()
    assert(hits >= 100 && hits < 300, s"hits=$hits")
  }

  test("interpreted eval matches the codegen path") {
    val keys = Seq("alpha", "beta").toDF("k")
    val bloom = BloomFilterExpr.build(keys, "k", fpp = 0.01)
    val viaDf = Seq("alpha", "beta", "gamma", "delta").toDF("k")
      .select(BloomFilterExpr.mightContain(bloom, col("k"))).as[Boolean].collect().toSeq
    val expr = graft.functions.BloomMightContainExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.StringType), bloom)
    val viaEval = Seq("alpha", "beta", "gamma", "delta").map { s =>
      expr.nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .asInstanceOf[Boolean]
    }
    assert(viaDf == viaEval)
    assert(viaEval.take(2) == Seq(true, true))
  }

  test("SQL registration: graft_bloom_might_contain with a binary literal") {
    // extensions apply at session build; register through the same
    // registry entry GraftExtensions injects (as DotProductExprSpec)
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.BloomMightContainExpr].getCanonicalName,
        "graft_bloom_might_contain"),
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BloomMightContainExpr(
          c(0), c(1).eval().asInstanceOf[Array[Byte]]))
    val keys = Seq("x1", "x2").toDF("k")
    val bloom = BloomFilterExpr.build(keys, "k", fpp = 0.01)
    val hex = bloom.map("%02X".format(_)).mkString
    Seq("x1", "nope-definitely-out").toDF("k").createOrReplaceTempView("bloom_probe")
    val got = spark.sql(
      s"SELECT k, graft_bloom_might_contain(k, X'$hex') AS hit FROM bloom_probe ORDER BY k")
      .as[(String, Boolean)].collect().toMap
    assert(got("x1"))
  }
}
