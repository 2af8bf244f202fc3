package graft

import graft.functions.{DotProduct, MinHashBandKeys, MinHashMd5, SimHash64, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works alongside the Column API, and graft's optimizer rules
  * ([[graft.plans.RewriteDotProductHof]]: portable HOF dot product ->
  * codegen'd DotProduct).
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashMd5].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashMd5(args(0), intArg(args(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "graft_minhash_bands"),
      (args: Seq[Expression]) =>
        MinHashBandKeys(args(0), intArg(args(1), "k"), intArg(args(2), "bands"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), intArg(args(1), "n"))))
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProductHof)
  }
}

object GraftExtensions {
  /** Register the same function set on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name must be an integer literal, got $other")
    }
    reg.createOrReplaceTempFunction("graft_dot",
      args => DotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      args => SimHash64(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      args => MinHashMd5(args(0), intLit(args(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_bands",
      args => MinHashBandKeys(args(0), intLit(args(1), "k"), intLit(args(2), "bands")),
      "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      args => WordShingles(args(0), intLit(args(1), "n")), "built-in")
    // optimizer rules can't be injected post-build via SparkSessionExtensions;
    // experimentalMethods is the supported late-registration hook
    if (!spark.sessionState.experimentalMethods.extraOptimizations
        .contains(graft.plans.RewriteDotProductHof)) {
      spark.sessionState.experimentalMethods.extraOptimizations ++=
        Seq(graft.plans.RewriteDotProductHof)
    }
  }
}
