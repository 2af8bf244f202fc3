package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of registered queries.
  *
  * `runMain graft.Explain <sfDir> <name>[,<name>...]` — the fast way to
  * audit whether a query's plan is the plan you'd run at 100 TB (filters
  * pushed, joins broadcast where they should be, no stray Exchange)
  * without writing a spec first. PlanSpec remains the durable pin; this
  * is the iteration loop that feeds it.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    names.split(",").map(_.trim).foreach { n =>
      println(s"===== $n =====")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString)
      catch { case t: Throwable => println(s"  failed: $t") }
    }
    spark.stop()
  }
}
