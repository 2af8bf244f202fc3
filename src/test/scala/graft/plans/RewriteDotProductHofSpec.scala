package graft.plans

import graft.SparkSpec
import graft.functions.{DotProduct, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The injected optimizer rule must turn the portable HOF dot product into
  * the codegen'd DotProduct without changing a single bit of output. */
class RewriteDotProductHofSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(df: DataFrame): DataFrame = {
    graft.GraftExtensions.register(spark) // idempotent; experimentalMethods path
    df.select(col("id"), Vectors.dotHof(col("a"), col("b")).as("dot"))
  }

  private def containsDotProduct(df: DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: DotProduct => found = true
      case _ => ()
    }))
    found
  }

  // RDD-backed (not a LocalRelation): ConvertToLocalRelation would
  // otherwise constant-fold the projection before the rewrite is observable
  private lazy val vecs = spark.createDataset(spark.sparkContext.parallelize(Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.5, -0.25, 8.0), Array(-1.5, 2.0, 0.125)))))
    .toDF("id", "a", "b")

  test("HOF aggregate(zip_with(*)) is rewritten to DotProduct") {
    assert(containsDotProduct(hofDot(vecs)))
  }

  test("rewritten plan returns bit-identical values to the interpreted HOF") {
    val expected = Map(1L -> (1.0 * 4 + 2.0 * 5 + 3.0 * 6), 2L -> (-0.75 - 0.5 + 1.0))
    val got = hofDot(vecs).as[(Long, Double)].collect().toMap
    assert(got == expected)
    // and equals the explicit Vectors.dot form
    val direct = vecs.select(col("id"), Vectors.dot(col("a"), col("b")).as("dot"))
      .as[(Long, Double)].collect().toMap
    assert(got == direct)
  }

  test("strict mode preserves the HOF's null on unequal lengths") {
    val uneven = spark.createDataset(spark.sparkContext.parallelize(
      Seq((1L, Array(1.0, 2.0), Array(1.0, 2.0, 3.0))))).toDF("id", "a", "b")
    val out = hofDot(uneven)
    assert(containsDotProduct(out)) // still rewritten...
    assert(out.select("dot").collect().head.isNullAt(0)) // ...and still null
  }

  test("nullable array elements are NOT rewritten (semantics guard)") {
    // array(...) of nullable expressions types as containsNull = true
    val nullable = vecs.select(col("id"),
      array(col("a")(0), col("b")(1)).as("a"),
      array(col("b")(0), col("a")(1)).as("b"))
    assert(!containsDotProduct(hofDot(nullable)))
  }

  test("raw float x*y (float-typed product) is NOT rewritten") {
    // float arrays (Array[Float] encoder: containsNull = false) with a
    // lambda WITHOUT double casts: Multiply types as float, so the HOF
    // rounds each product to float — not what DotProduct computes. The
    // rule must leave it alone.
    graft.GraftExtensions.register(spark)
    val f = spark.createDataset(spark.sparkContext.parallelize(Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))))
      .toDF("id", "a", "b")
    val raw = f.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, v) => acc + v).as("dot"))
    assert(!containsDotProduct(raw))
    // while the explicitly-widened dotHof form over the same float arrays IS
    val widened = f.select(col("id"), Vectors.dotHof(col("a"), col("b")).as("dot"))
    assert(containsDotProduct(widened))
  }

  test("a product of different lambda args (x*x) is NOT rewritten") {
    val df = vecs.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, _) => x * x), lit(0.0),
        (acc, v) => acc + v).as("dot"))
    assert(!containsDotProduct(df))
  }
}
