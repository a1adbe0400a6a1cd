package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev tool: condensed physical-plan diagnostics per query — exchange
  * count, scan pushdown, join strategies, codegen coverage. Run at a
  * small SF; plan SHAPE is what matters.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(plan).size
        val flags = Seq(
          "exch" -> n("Exchange"),
          "bhj" -> n("BroadcastHashJoin"),
          "smj" -> n("SortMergeJoin"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "cart" -> n("CartesianProduct"),
          "scans" -> n("FileScan"),
          "pushed" -> n("PushedFilters: \\[[^\\]]"),
          "wsc" -> n("WholeStageCodegen")
        ).collect { case (k, v) if v > 0 => s"$k=$v" }.mkString(" ")
        println(f"$name%-24s $flags")
      } catch { case e: Throwable => println(f"$name%-24s ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
