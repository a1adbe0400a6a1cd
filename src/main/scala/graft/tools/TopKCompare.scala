package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev micro-benchmark: native TopKPerKey (custom two-phase plan) vs the
  * window row_number() equivalent on the events table — min of 3 each,
  * noop-sink. Usage: `runMain graft.tools.TopKCompare <sfDir> [k]`.
  */
object TopKCompare {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (c, v) => b.config(c, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    def native() = org.apache.spark.sql.graft.TopKPerKey(
      ev, Seq("event_type"), Seq(("value", false), ("event_id", true)), k)
    def window() = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      ev.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
    }
    def time(mk: () => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    val rows = ev.count()
    // interleave to share any load spike
    val (n1, w1) = (time(native _), time(window _))
    println(f"rows=$rows k=$k native=${n1}%.3f s window=${w1}%.3f s speedup=${w1 / n1}%.2fx")
    spark.stop()
  }
}
