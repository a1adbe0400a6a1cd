package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev probe for the q122 nCells scale knob: SemDeDup's within-cell
  * quadratic is bounded by cell occupancy, so nCells must grow with the
  * corpus (the BENCH_sf10 q122 row shows what a FIXED nCells=8 does at
  * 100x data). Run: `runMain graft.tools.SemDedupProbe <dir> <nCells>`.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCells = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, dir, "embeddings")
    val t0 = System.nanoTime()
    val n = Dedup.semanticDedup(e, "vec_id", "embedding",
      nCells = nCells, lloydIters = 2, simThreshold = 0.99).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[semdedup-probe] dir=$dir nCells=$nCells kept=$n%d sec=$sec%.2f")
    spark.stop()
  }
}
