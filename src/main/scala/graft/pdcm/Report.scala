package graft.pdcm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release report — the Spark form of the reference's `report` table
  * (`scripts/reports.sql:1-146`): one (report_type, report_key,
  * report_value) row per fact about the release.
  *
  *  - `records_by_table` (reports.sql:66-84): row count per entity. The
  *    reference walks a Postgres cursor over pg_class estimates; here
  *    every entity contributes one tiny aggregate and the UNION of all
  *    of them is ONE lazy plan — Spark runs the per-entity counts as
  *    parallel stages of a single action, no driver-side loop.
  *  - `records_by_provider`: the same count split by `data_source` for
  *    provider-scoped entities (the per-release provider accounting the
  *    release notes want).
  *  - `fk_null_values` (reports.sql:91-137): per FK column, how many
  *    rows have a null FK — "could be normal, could be a wrong join"
  *    (their comment). The reference discovers FKs from
  *    information_schema constraints; a lake has no constraint catalog,
  *    so the convention is declared here: columns ending `_id`/`_fk`
  *    (minus the entity's own surrogate/external ids). Only non-zero
  *    counts are reported, like the reference.
  *
  * All three sections fold into one DataFrame the caller writes as the
  * `report` entity — the whole report is a metadata-sized result no
  * matter how large the release is.
  */
object Report {

  private val prov = graft.sources.Tsv.ProvenanceCol

  /** FK-shaped columns: `*_fk` / `*_id`, excluding the entity's own
    * identity columns (`id`, natural `<entity>_id`, external ids).
    */
  private[pdcm] def fkColumns(name: String, df: DataFrame): Seq[String] = {
    val own = Set("id", s"${name}_id", "external_model_id", "model_id",
      "patient_id", "sample_id", "external_ids", "parent_model_id")
    df.columns.toSeq.filter { c =>
      (c.endsWith("_fk") || c.endsWith("_id")) && !own(c)
    }
  }

  private def row(tpe: String, key: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column) =
    Seq(lit(tpe).as("report_type"), key.as("report_key"),
      value.cast("string").as("report_value"))

  /** Assemble the full report for `entities` (name → DataFrame). */
  def build(entities: Map[String, DataFrame]): DataFrame = {
    require(entities.nonEmpty, "report needs at least one entity")
    val sections = entities.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      val counts = df.agg(count(lit(1)).as("v"))
        .select(row("records_by_table", lit(name), col("v")): _*)
      val byProvider =
        if (!df.columns.contains(prov)) Nil
        else Seq(df.groupBy(col(prov)).agg(count(lit(1)).as("v"))
          .select(row("records_by_provider",
            concat_ws(":", lit(name), col(prov)), col("v")): _*))
      val fks = fkColumns(name, df)
      val fkNulls =
        if (fks.isEmpty) Nil
        else {
          // ONE pass over the entity computes every FK's null count;
          // the stack to rows is a metadata-sized explode.
          val agg = df.agg(
            fks.head -> "count", fks.tail.map(_ -> "count"): _*)
          val total = df.agg(count(lit(1)).as("total"))
          Seq(agg.crossJoin(total)
            .select(explode(array(fks.map(c => struct(
              lit(s"$name->${c.stripSuffix("_fk").stripSuffix("_id")} ($c)")
                .as("k"),
              (col("total") - col(s"count($c)")).as("v"))): _*)).as("e"))
            .select(row("fk_null_values", col("e.k"), col("e.v")): _*)
            .filter(col("report_value") =!= "0"))
        }
      counts +: (byProvider ++ fkNulls)
    }
    sections.reduce(_.unionByName(_))
  }
}
