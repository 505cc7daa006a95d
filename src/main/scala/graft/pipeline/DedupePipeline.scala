package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.blocking.{Blocker, FirstChars, Predicate, PredicateLearner, TokenField, WholeField}
import graft.cluster.{ExactMatches, Hierarchical}
import graft.config.DedupeConfig
import graft.model.{LogisticModel, Settings, Training}
import graft.ops.RelationalOps

/** End-to-end dedupe dataflow, mirroring the reference's six CLI stages
  * (ref: pgdedupe/cli.py:46-62 — preprocess → train → block → cluster →
  * write → apply; SURVEY.md §3.1). Each stage is public and individually
  * composable (ref: tests/test_reproducibility.py:10 drives phases
  * directly — SURVEY.md §3.3).
  *
  * Everything is one lazy DataFrame lineage per phase; only the learned
  * model (a few doubles) lives on the driver.
  */
object DedupePipeline {

  final case class Result(
      entriesUnique: DataFrame,
      blockingMap: DataFrame,
      pairs: DataFrame,
      scoredPairs: DataFrame,
      entityMap: DataFrame,
      mapped: DataFrame, // _unique_id grain with dedupe_id
      uniqueMap: DataFrame, // source-key grain with dedupe_id
      model: LogisticModel,
      predicates: Seq[Predicate],
      cached: Seq[DataFrame] = Nil) {

    /** Unpersist every frontier `run` pinned, except the `keep` frames
      * (by reference) the caller still reads — so a loop over corpora /
      * repeated bench reps doesn't accumulate storage blocks for the
      * session lifetime.
      */
    def release(keep: DataFrame*): Unit =
      cached.filterNot(f => keep.exists(_ eq f))
        .foreach(_.unpersist(false))
  }

  /** Static default predicate set when no learned settings exist — legal
    * predicate shapes from the reference's learner (ref: SURVEY.md D5):
    * exact key per Categorical/Exact field; first-4-chars + whole-field
    * per String field.
    */
  def defaultPredicates(cfg: DedupeConfig): Seq[Predicate] =
    cfg.fields.flatMap { f =>
      f.ftype match {
        case "String" => Seq(WholeField(f.field), FirstChars(f.field, 4))
        case _        => Seq(WholeField(f.field))
      }
    }

  /** preprocess (ref run.py:62-99): filter + exact-duplicate merge. */
  def preprocess(entries: DataFrame, cfg: DedupeConfig): DataFrame =
    RelationalOps.exactDedup(entries, cfg.columns, cfg.key, cfg.filterCondition)

  /** train (ref run.py:113-182): resolve the model + predicate set.
    * Precedence mirrors the reference: a saved settings file when
    * `use_saved_model` (run.py:126-129); else fit from the labeled
    * training file and persist settings (run.py:156-181); else the
    * static default model + predicate shapes.
    */
  def trainOrLoad(
      entriesUnique: DataFrame,
      cfg: DedupeConfig): (LogisticModel, Seq[Predicate]) = {
    def exists(p: Option[String]): Option[String] =
      p.filter(f => java.nio.file.Files.exists(java.nio.file.Paths.get(f)))
    if (cfg.useSavedModel && exists(cfg.settingsFile).isDefined) {
      val s = Settings.load(cfg.settingsFile.get)
      (s.model,
        if (s.predicates.nonEmpty) s.predicates else defaultPredicates(cfg))
    } else exists(cfg.trainingFile) match {
      case Some(tf) =>
        def sub[T](name: String)(f: => T): T = {
          val t0 = System.nanoTime()
          val r = f
          PhaseLog.record(name, (System.nanoTime() - t0) / 1e9)
          r
        }
        val spark = entriesUnique.sparkSession
        val labeled = Training.readTrainingFile(spark, tf, cfg)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val model = sub("train_model")(Training.train(cfg, labeled))
        val learned = sub("train_predicates")(
          PredicateLearner.learn(entriesUnique, labeled, cfg))
        val predicates =
          if (learned.nonEmpty) learned else defaultPredicates(cfg)
        labeled.unpersist(false)
        cfg.settingsFile.foreach(sf => Settings(model, predicates).save(sf))
        (model, predicates)
      case None =>
        (LogisticModel.default(cfg), defaultPredicates(cfg))
    }
  }

  /** create_blocking (ref run.py:187-321): predicate application +
    * singleton elimination + Kolb coverage tables, one lineage.
    */
  def block(
      entriesUnique: DataFrame,
      cfg: DedupeConfig,
      predicates: Seq[Predicate]): (DataFrame, DataFrame, DataFrame) = {
    // Persisted: the blocking-map lineage — including any canopy
    // refit's tokenize → idf → token self-join — is read TWICE
    // structurally (pluralKeys' eager zipWithIndex numbering job, then
    // again as the probe side of pluralBlocks' join; only the part
    // below pluralKeys' range exchange is covered by retained shuffle
    // files). The handle rides Result.cached like pb/sc, so the
    // caller's release() drops it.
    val bm = Blocker.blockingMap(entriesUnique, predicates)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pk = RelationalOps.pluralKeys(bm, cfg.maxBlockSize.toLong)
    val pb = RelationalOps.pluralBlocks(bm, pk)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val covered = RelationalOps.coveredBlocks(pb)
    // Persist: kolbPairs self-joins this (two scans), and without the
    // persist each scan recomputes the groupBy+join lineage. Both
    // handles are returned so run() can track them in Result.cached —
    // a dropped handle is a storage block pinned until session end.
    val sc = RelationalOps.smallerCoverage(pb, covered)
      .persist(StorageLevel.MEMORY_AND_DISK)
    (bm, sc, pb)
  }

  /** cluster phase part 1 (ref run.py:362-379): redundant-free pairs with
    * record payloads re-attached (J3) and model scores (D1+D2+D7).
    */
  def scorePairs(
      entriesUnique: DataFrame,
      smallerCoverage: DataFrame,
      cfg: DedupeConfig,
      model: LogisticModel): (DataFrame, DataFrame) = {
    val pairs = RelationalOps.kolbPairs(smallerCoverage)
    val lrec = entriesUnique.select(col("_unique_id").as("l_id"),
      struct(cfg.columns.map(col): _*).as("l_rec"))
    val rrec = entriesUnique.select(col("_unique_id").as("r_id"),
      struct(cfg.columns.map(col): _*).as("r_rec"))
    val withRecs = pairs
      .join(lrec, "l_id")
      .join(rrec, "r_id")
      .select(Seq(col("l_id"), col("r_id")) ++
        cfg.columns.map(c => col(s"l_rec.$c").as(s"l_$c")) ++
        cfg.columns.map(c => col(s"r_rec.$c").as(s"r_$c")): _*)
    val scored = model.scorePairs(cfg, withRecs)
    (pairs, scored)
  }

  /** cluster phase part 2 + write_results (ref run.py:383-425). */
  def cluster(scored: DataFrame, cfg: DedupeConfig): DataFrame =
    Hierarchical.cluster(
      scored.select("l_id", "r_id", "score"),
      cfg.threshold, cfg.maxComponentSize, cfg.ccEdgeCap,
      cfg.maxEdgesPerComponent)

  /** apply_results (ref run.py:429-491): right-join + coalesce, exact-match
    * merge passes over unique records, then explode to source grain;
    * merge sets containing NON-dedup columns run at source grain against
    * the raw entries table (ref run.py:477-483 — the reference updates
    * unique_map, not entries_unique, for those sets; `mapped` therefore
    * keeps the pre-raw-merge ids, mirroring the reference's table states).
    */
  def apply(
      entityMap: DataFrame,
      entriesUnique: DataFrame,
      entries: DataFrame,
      cfg: DedupeConfig): (DataFrame, DataFrame) = {
    var mapped = RelationalOps.applyClusters(entityMap, entriesUnique)
    // merge_exact sets whose columns are all dedup fields run on unique
    // records (ref run.py:454-460).
    val (uniqueFieldSets, rawFieldSets) =
      cfg.mergeExact.partition(_.forall(cfg.columns.contains))
    if (uniqueFieldSets.nonEmpty) {
      val withFields = mapped.join(
        entriesUnique.select((Seq(col("_unique_id")) ++
          cfg.columns.map(col)): _*), "_unique_id")
      val merged = uniqueFieldSets.zipWithIndex
        .foldLeft(withFields) { case (d, (cols, i)) =>
          ExactMatches.merge(d, cols, "dedupe_id",
            label = s"exact-merge-u$i")
        }
      mapped = merged.select("dedupe_id", "_unique_id", "cluster_score",
        "src_ids")
    }
    var um = RelationalOps.uniqueMap(mapped, cfg.key)
    // Raw-table merges (ref run.py:477-483): attach the merge columns
    // from the source table by key, link dedupe_ids sharing exact values
    // (transitively), then drop the payload columns again.
    rawFieldSets.zipWithIndex.foreach { case (cols, i) =>
      // Missing columns fail loudly (the reference's SQL would, too —
      // no silent caps).
      val withCols = um.join(
        entries.select((cfg.key +: cols).distinct.map(col): _*), cfg.key)
      um = ExactMatches.merge(withCols, cols, "dedupe_id",
          label = s"exact-merge-r$i")
        .select("dedupe_id", cfg.key, "cluster_score")
    }
    (mapped, um)
  }

  /** Full pipeline with a static (or defaulted) model.
    *
    * Persistence points: `entries` (read by preprocess AND the
    * apply-phase raw-table merge), `entriesUnique` (read by blocking,
    * scoring, and apply), `scored` (read by the clustering threshold
    * filter, the CC component join, and — transitively — every
    * exact-match merge pass), and `entityMap` (read by applyClusters plus
    * each merge pass). Without these every downstream action re-runs the
    * whole block → pair → affine-gap lineage, which is what timed out the
    * sf0.1 bench.
    *
    * Each persisted frontier is materialized EAGERLY (a count) before its
    * consumers run: downstream fan-out then always reads the cache,
    * never races to recompute the same lineage — this was the q50
    * run-to-run 2× variance. The phase wall-clocks go to `onPhase`
    * (phase name, seconds); the `apply` phase stays lazy (the caller's
    * action materializes it).
    */
  def run(
      entries: DataFrame,
      cfg: DedupeConfig,
      modelOpt: Option[LogisticModel] = None,
      predicatesOpt: Option[Seq[Predicate]] = None,
      onPhase: (String, Double) => Unit = (_, _) => ()): Result = {
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      onPhase(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    val src = entries.persist(StorageLevel.MEMORY_AND_DISK)
    // Built INSIDE the timed block: preprocess's denseIds seam runs its
    // zipWithIndex jobs eagerly at DataFrame-build time, and timing only
    // the count() under-reported the phase by those jobs' wall-clock.
    val eu = timed("preprocess") {
      val e = preprocess(src, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      e
    }
    lazy val trained = trainOrLoad(eu, cfg)
    // ONE timed block for both: with modelOpt supplied but
    // predicatesOpt absent, the predicate getOrElse is what forces the
    // lazy trainOrLoad — timing only the model lookup attributed the
    // whole training wall-clock to no phase.
    val (model, predicates) = timed("train")(
      (modelOpt.getOrElse(trained._1), predicatesOpt.getOrElse(trained._2)))
    val (bm, sc, pb) = block(eu, cfg, predicates)
    val (pairs, scored0) = scorePairs(eu, sc, cfg, model)
    // Persist only the (l_id, r_id, score) projection the clustering and
    // merge passes actually read — caching the wide pair rows (all l_/r_
    // field payloads) costs more than the scoring pass itself.
    val scored = scored0.select("l_id", "r_id", "score")
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("block_score")(scored.count())
    val em = timed("cluster") {
      val m = cluster(scored, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      m.count()
      m
    }
    val (mapped, um0) = apply(em, eu, src, cfg)
    val um = um0.persist(StorageLevel.MEMORY_AND_DISK)
    timed("apply")(um.count())
    Result(eu, bm, pairs, scored, em, mapped, um, model, predicates,
      cached = Seq(src, eu, bm, pb, sc, scored, em, um))
  }
}
