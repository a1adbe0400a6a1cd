package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OBO ontology-file source (reference S7,
  * `etl/workflow/readers/ncit_reader.py:10-50`): line-parses `[Term]`
  * stanzas into (term_id, term_name, term_url, is_a) rows.
  *
  * Parsed driver-side: ontology files are ~100k terms / a few MB — far
  * below the threshold where distribution pays. The result becomes an
  * ordinary (broadcastable) DataFrame.
  */
object Obo {

  case class OboTerm(
      term_id: String,
      term_name: String,
      term_url: String,
      is_a: Seq[String])

  def parse(lines: Iterator[String]): Seq[OboTerm] = {
    val out = Seq.newBuilder[OboTerm]
    var id = ""; var name = ""; var url = ""
    var isA = List.empty[String]
    def flush(): Unit = {
      if (id.nonEmpty) out += OboTerm(id, name, url, isA.reverse)
      id = ""; name = ""; url = ""; isA = Nil
    }
    lines.foreach { line =>
      val t = line.trim
      if (t == "[Term]") flush()
      else if (t.startsWith("id:")) {
        id = t.drop(3).trim
        url = "http://purl.obolibrary.org/obo/" + id.replace(":", "_")
      } else if (t.startsWith("name:")) name = t.drop(5).trim
      else if (t.startsWith("is_a:")) {
        val body = t.drop(5)
        val end = body.lastIndexOf('!')
        val ref = (if (end >= 0) body.substring(0, end) else body).trim
        if (ref.nonEmpty) isA = ref :: isA
      }
    }
    flush()
    out.result()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val src = scala.io.Source.fromFile(path)
    try {
      val terms = parse(src.getLines())
      import spark.implicits._
      terms.toDF()
    } finally src.close()
  }
}
