package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1 proof-point run: replicates an
  * existing sf directory K times with every entity key shifted by a
  * replica-sized offset, so joins stay consistent within a replica and
  * every aggregate/join/shuffle sees K× the rows. Attribute columns are
  * left untouched (cross-replica duplicate documents make the dedup
  * queries work HARDER, which is the honest direction for a scale
  * probe). nation/region are fixed dimension tables and copy through.
  *
  * Usage: `runMain graft.tools.ScaleUp <srcSfDir> <outDir> <k>`.
  */
object ScaleUp {

  /** Key columns to shift per table (everything join-relevant except
    * the fixed nation/region dims).
    */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val Offset = 1000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args.take(3)
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (c, v) => builder.config(c, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- graft.Tables.names) {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val scaled = keyCols.get(name) match {
        case None => df // nation/region: fixed dims
        case Some(keys) =>
          (0 until k).map { i =>
            keys.foldLeft(df) { (acc, c) =>
              acc.withColumn(c, col(c) + lit(i * Offset))
            }
          }.reduce(_.unionByName(_))
      }
      scaled.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> ${out}/$name.parquet")
    }
    spark.stop()
  }
}
