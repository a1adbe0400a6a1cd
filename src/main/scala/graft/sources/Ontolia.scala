package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ontolia-output source (reference S8,
  * `etl/workflow/readers/ontolia_reader.py:38-66`): parses
  * `REGIMEN=T1,T2` lines into (regimen, treatments) rows, treatments kept
  * as a trimmed comma-joined string exactly as the reference emits them.
  */
object Ontolia {

  case class RegimenLink(regimen: String, treatments: String)

  def parseLine(line: String): Option[RegimenLink] = {
    val t = line.trim
    val i = t.indexOf('=')
    if (t.isEmpty || i < 0) None
    else {
      val regimen = t.substring(0, i).trim
      val treatments = t.substring(i + 1).split(",").map(_.trim).mkString(",")
      Some(RegimenLink(regimen, treatments))
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val src = scala.io.Source.fromFile(path)
    try {
      val rows = src.getLines().flatMap(parseLine).toSeq
      import spark.implicits._
      rows.toDF()
    } finally src.close()
  }
}
