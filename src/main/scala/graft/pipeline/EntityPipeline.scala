package graft.pipeline

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Entity-pipeline core: a registry of named entity transforms with
  * declared dependencies and output contracts, plus a topological
  * executor.
  *
  * This replaces the reference's entire orchestration layer — the Luigi
  * task DAG (`etl/workflow/transformer.py:37-581`) and entity registry
  * (`etl/entities_registry.py:96-743`) — with an IN-PROCESS lazy DAG:
  * one SparkSession, one logical plan per entity, no per-entity
  * spark-submit spawn and no mandatory parquet round-trip between stages
  * (the reference pays ~60 JVM launches + materializations per run;
  * BASELINE.md lists this as its dominant structural overhead).
  *
  * Scale design:
  *  - entities that fan out to multiple consumers are persisted once
  *    (the reference's `molecular_characterization` feeds 5 jobs and is
  *    recomputed by each);
  *  - optional per-entity parquet checkpointing gives Luigi-style
  *    resumability (skip-if-exists) without making it the default cost;
  *  - output contracts (`expected_database_columns` in the reference)
  *    are enforced by projection, so column pruning propagates upstream
  *    through every entity plan.
  */
case class EntityDef(
    name: String,
    deps: Seq[String],
    transform: (SparkSession, Map[String, DataFrame]) => DataFrame,
    /** Declared output columns (the DB contract). Empty = helper entity
      * (intermediate-only, never loaded — reference
      * `entities_registry.py:85-93`).
      */
    outputColumns: Seq[String] = Nil)

final class EntityRegistry {
  private val defs = mutable.LinkedHashMap.empty[String, EntityDef]

  def register(d: EntityDef): this.type = {
    require(!defs.contains(d.name), s"duplicate entity '${d.name}'")
    defs += d.name -> d
    this
  }

  def apply(name: String): EntityDef =
    defs.getOrElse(name, throw new NoSuchElementException(s"unknown entity '$name'"))

  def names: Seq[String] = defs.keys.toSeq

  /** Dependency-respecting order over `targets` and everything they need.
    * Fails fast on cycles and on unknown deps (a dep may also be an
    * external source name supplied at run time).
    */
  def topoOrder(targets: Seq[String], external: Set[String]): Seq[String] = {
    val order = mutable.ArrayBuffer.empty[String]
    val state = mutable.Map.empty[String, Int] // 0=visiting, 1=done
    def visit(n: String, path: List[String]): Unit = {
      if (external.contains(n)) return
      // A dep that is neither registered nor external may still be bound
      // at run time; the executor reports it with the entity that needs
      // it. Unknown TARGETS fail here.
      if (!defs.contains(n) && path.nonEmpty) return
      state.get(n) match {
        case Some(1) => ()
        case Some(0) =>
          throw new IllegalStateException(
            s"dependency cycle: ${(n :: path.takeWhile(_ != n) ::: List(n)).reverse.mkString(" -> ")}")
        case None =>
          state(n) = 0
          apply(n).deps.foreach(visit(_, n :: path))
          state(n) = 1
          order += n
      }
    }
    targets.foreach(visit(_, Nil))
    order.toSeq
  }
}

final class PipelineRunner(
    spark: SparkSession,
    registry: EntityRegistry,
    sources: Map[String, DataFrame],
    checkpointDir: Option[String] = None) {

  private val persisted = mutable.ArrayBuffer.empty[DataFrame]

  /** Drop every cache this runner created. Call after the run's outputs
    * have been materialized (written/collected) — persists are only needed
    * while the lazy plans that reference them still have pending actions.
    * Without this a long multi-target run accumulates executor storage.
    *
    * Fan-out seams are localCheckpoint()s (see [[run]]), whose
    * MEMORY_AND_DISK blocks belong to the checkpointed RDD, not the
    * CacheManager — `Dataset.unpersist()` would be a silent no-op on them
    * (r12 advice), so the checkpointed leaf's RDD is unpersisted directly.
    * After this call a checkpointed entity CANNOT be recomputed (its
    * lineage was truncated); honor the "outputs materialized first"
    * contract above.
    */
  def unpersistAll(): Unit = {
    persisted.foreach { df =>
      df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => df.unpersist()
      }
    }
    persisted.clear()
  }

  /** How many entities consume each entity (for persist decisions). */
  private def consumerCounts(order: Seq[String]): Map[String, Int] =
    order
      .flatMap(n => registry(n).deps)
      .groupBy(identity).map { case (k, v) => k -> v.size }

  /** Materialize `targets` (and all dependencies), returning every
    * computed entity. Entities with >1 consumer are persisted; entities
    * with a checkpoint on disk are loaded instead of recomputed
    * (Luigi-style resume); helper entities are never checkpointed.
    */
  def run(targets: Seq[String]): Map[String, DataFrame] = {
    val order = registry.topoOrder(targets, sources.keySet)
    val fanOut = consumerCounts(order)
    val built = mutable.LinkedHashMap.empty[String, DataFrame]
    order.foreach { name =>
      val d = registry(name)
      val ckptPath = checkpointDir.map(dir => s"$dir/$name")
      val existing = ckptPath.filter(p =>
        d.outputColumns.nonEmpty && pathExists(p))
      val df = existing match {
        case Some(p) => spark.read.parquet(p)
        case None =>
          val inputs = d.deps.map(dep =>
            dep -> built.getOrElse(dep, sources.getOrElse(dep,
              throw new NoSuchElementException(s"missing input '$dep' for '$name'")))).toMap
          val raw = d.transform(spark, inputs)
          val contracted =
            if (d.outputColumns.isEmpty) raw
            else raw.select(d.outputColumns.map(col): _*)
          ckptPath match {
            case Some(p) if d.outputColumns.nonEmpty =>
              contracted.write.mode("overwrite").parquet(p)
              spark.read.parquet(p)
            case _ =>
              if (fanOut.getOrElse(name, 0) > 1) {
                // localCheckpoint, not persist (r12; the q295/r10-item-5
                // lesson applied INSIDE the runner): persist() caches the
                // data but keeps the full composed lineage, so every one
                // of the entity's consumers re-pays Catalyst analysis/
                // optimization of the whole upstream DAG — on the 60-
                // transform registry that driver cost dominates the
                // rebuild (q466). The checkpoint truncates each fan-out
                // seam to a materialized leaf: same rows computed from
                // the same inputs within this run, consumers plan against
                // a leaf. (guide §5: localCheckpoint as the cheap
                // lineage cut; §3.3: materialize to truncate huge plans.)
                // Cluster gate (r12 advice): localCheckpoint blocks are
                // executor-local and UNREPLICATED — with lineage truncated,
                // losing one executor fails every downstream consumer
                // instead of recomputing (Spark's docs warn against
                // combining it with dynamic allocation). That trade is
                // right on local[N] (no executor to lose) and wrong on a
                // fleet, so non-local masters fall back to persist()
                // unless `spark.graft.seam.localCheckpoint=true` opts in
                // (e.g. static allocation + cheap re-runs).
                val seamCheckpoint = spark.conf
                  .getOption("spark.graft.seam.localCheckpoint")
                  .map(_.toBoolean)
                  .getOrElse(spark.sparkContext.isLocal)
                // Lazy (r13): the first consumer's action materializes the
                // seam and persists its blocks for the rest — an EAGER
                // checkpoint paid one extra driver-barrier job per fan-out
                // entity during the rebuild (q466) for rows a consumer was
                // about to compute anyway. Plan truncation (the reason the
                // seam exists) is identical either way.
                val p =
                  if (seamCheckpoint) contracted.localCheckpoint(false)
                  else contracted.persist(
                    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                persisted += p
                p
              } else contracted
          }
      }
      built += name -> df
    }
    built.toMap
  }

  private def pathExists(p: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(p)
    hPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hPath)
  }
}
