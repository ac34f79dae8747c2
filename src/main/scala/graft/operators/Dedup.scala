package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Cluster-representative selection for near-dup keep-lists (the step
  * after candidate generation + verification — see
  * `graft.queries.PipelineQueries` q72/q87).
  *
  * [[keepListToFixpoint]] runs min-label propagation over the verified
  * edge set until no label changes, which yields the minimum id of each
  * connected component — the canonical "keep the smallest doc_id per dup
  * cluster" rule. The fixpoint is order-independent, so it is
  * oracle-checkable (DuckDB replays it as a recursive CTE, q87) even
  * though the round count is data-dependent.
  *
  * Cost model per round (the 100 TB accounting):
  *   - one shuffle of the *materialized* edge blocks joined with the
  *     label table on the edge key (edges are pinned once at entry, so a
  *     round never re-runs the candidate-generation lineage that produced
  *     them — MinHash banding + Jaccard verification execute exactly
  *     once),
  *   - one shuffle for the per-src min,
  *   - one left join back onto the label table (corpus-wide, 2 columns),
  *   - one count action on the checkpointed result to test convergence.
  * Checkpointing after every round truncates lineage so round N's plan
  * does not replay rounds 1..N-1 — without it the plan doubles per round
  * and the driver dies long before the data does. The previous round's
  * blocks are unpersisted as soon as the next round is materialized, so
  * peak storage is TWO 2-column label tables plus the edges, not
  * `maxRounds` of them. By default rounds pin via `localCheckpoint`
  * (executor blocks — fine for local mode); on a cluster pass
  * `checkpointDir` (HDFS/object store) to switch to RELIABLE
  * `RDD.checkpoint()` so executor loss can't silently restart the
  * chain. Rounds needed = the longest propagation path in any component
  * (chains of near-dups), bounded by `maxRounds` as a runaway guard.
  */
object Dedup {

  private val warnedSubstitutions =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Pin a small/intermediate frame: materialize it to checkpoint
    * storage and hand back both the checkpoint-backed frame and the RDD
    * whose blocks can be `unpersist`ed once the frame is no longer
    * needed. `checkpointDir = Some(dir)` uses a reliable checkpoint
    * (cached first so the materializing job doesn't compute the lineage
    * twice — once for the count, once for the checkpoint write).
    */
  private def pinRdd(rdd: RDD[Row], df: DataFrame,
      checkpointDir: Option[String]): DataFrame = {
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        sc.getCheckpointDir match {
          case None => sc.setCheckpointDir(dir)
          case Some(existing) =>
            // setCheckpointDir appends a UUID; a context-level dir set
            // by someone else silently wins over the argument — make
            // the substitution LOUD (once per requested dir) so rounds
            // don't checkpoint to a location the caller never chose
            val want = new org.apache.hadoop.fs.Path(dir).toUri.getPath
            if (!existing.contains(want) && warnedSubstitutions.add(dir))
              System.err.println(s"[dedup] WARNING: SparkContext " +
                s"checkpoint dir is already '$existing'; requested " +
                s"'$dir' is ignored — rounds checkpoint to the existing dir")
        }
        rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rdd.checkpoint()
      case None => rdd.localCheckpoint()
    }
    rdd.count() // eager: materialize before anything downstream replans
    df.sparkSession.createDataFrame(rdd, df.schema)
  }

  private def pin(df: DataFrame,
      checkpointDir: Option[String]): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd
    (pinRdd(rdd, df, checkpointDir), rdd)
  }

  /** Release a pinned round: drop its storage blocks AND its reliable
    * checkpoint files (best-effort). Without the file deletion a
    * `maxRounds`-deep fixpoint leaves every round's table in the
    * checkpoint dir for the life of the app even though only the
    * latest round is ever referenced again. Only call once the NEXT
    * round is materialized — its checkpoint truncated the lineage, so
    * nothing can recompute through the deleted files.
    */
  private def release(rdd: RDD[Row]): Unit = {
    rdd.unpersist(blocking = false)
    rdd.getCheckpointFile.foreach { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(rdd.sparkContext.hadoopConfiguration).delete(p, true)
      } catch { case _: Throwable => () } // cleanup must never fail the job
    }
  }

  /** @param docs  one row per document; `idCol` must be its unique id
    * @param edges verified near-dup pairs in BOTH directions, columns
    *              `src`, `dst` (same type as `idCol`)
    * @param checkpointDir when set, every round checkpoints RELIABLY to
    *              this directory (HDFS/object store on a cluster) instead
    *              of to executor-local blocks, so losing an executor
    *              cannot silently restart the propagation chain
    * @return docs' ids with `rep` = min id of the connected component and
    *         `is_kept` = (id == rep). The result reads from the final
    *         round's pinned storage — with the default local checkpoint,
    *         consume (write/collect) before the SparkContext that
    *         produced it goes away.
    */
  def keepListToFixpoint(docs: DataFrame, edges: DataFrame, idCol: String = "doc_id",
      maxRounds: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    val (e, eRdd) = pin(edges.select(col("src"), col("dst")), checkpointDir)
    var (labels, labelsRdd) = pin(docs.select(col(idCol), col(idCol).as("rep")),
      checkpointDir)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val nbr = e.join(
          labels.select(col(idCol).as("nbr_id"), col("rep").as("nrep")),
          col("dst") === col("nbr_id"))
        .groupBy(col("src")).agg(min(col("nrep")).as("minrep"))
      val steppedDf = labels.join(nbr, labels(idCol) === nbr("src"), "left")
        .select(col(idCol), col("rep").as("prev"),
          least(col("rep"), coalesce(col("minrep"), col("rep"))).as("rep"))
      // fuse the convergence test into the materializing pass: a separate
      // `filter(changed).count()` would re-read the full label table once
      // more per round — at corpus scale that is a whole extra pass. A
      // retried task can only OVER-count, which never turns "changed"
      // into "converged", so the fixpoint test stays sound.
      val chAcc = steppedDf.sparkSession.sparkContext.longAccumulator("dedupChanged")
      val steppedRdd = steppedDf.rdd.map { r =>
        if (r.get(1) != r.get(2)) chAcc.add(1)
        r
      }
      val stepped = pinRdd(steppedRdd, steppedDf, checkpointDir)
      changed = chAcc.value
      release(labelsRdd) // prior round no longer referenced: blocks + files
      labels = stepped.select(col(idCol), col("rep"))
      labelsRdd = steppedRdd
      round += 1
    }
    release(eRdd)
    // non-convergence aborts: release the final round too, or its blocks
    // stay pinned in the block manager for the life of the session. On
    // success the final round's storage intentionally survives — the
    // returned frame reads from it.
    if (changed != 0) release(labelsRdd)
    require(changed == 0,
      s"keepListToFixpoint did not converge in $maxRounds rounds — " +
        "either raise maxRounds or check the edge set for corruption " +
        "(a component's propagation path can't exceed its node count)")
    labels.withColumn("is_kept", col(idCol) === col("rep"))
  }
}
