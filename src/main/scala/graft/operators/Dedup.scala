package graft.operators

import org.apache.spark.sql.DataFrame
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
  *   - one shuffle of `edges` joined with the label table on the edge key
  *     (edges are tiny relative to the corpus — only docs with a verified
  *     near-dup partner appear),
  *   - one shuffle for the per-src min,
  *   - one left join back onto the label table (corpus-wide, 2 columns),
  *   - one count action on the checkpointed result to test convergence.
  * `localCheckpoint(eager = true)` after every round truncates lineage so
  * round N's plan does not replay rounds 1..N-1 — without it the plan
  * doubles per round and the driver dies long before the data does. On a
  * cluster prefer `checkpoint()` to a reliable store so executor loss
  * can't silently restart the chain. Rounds needed = the longest
  * propagation path in any component (chains of near-dups), bounded by
  * `maxRounds` as a runaway guard.
  */
object Dedup {

  /** @param docs  one row per document; `idCol` must be its unique id
    * @param edges verified near-dup pairs in BOTH directions, columns
    *              `src`, `dst` (same type as `idCol`)
    * @return docs' ids with `rep` = min id of the connected component and
    *         `is_kept` = (id == rep)
    */
  def keepListToFixpoint(docs: DataFrame, edges: DataFrame, idCol: String = "doc_id",
      maxRounds: Int = 50): DataFrame = {
    var labels = docs.select(col(idCol), col(idCol).as("rep")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val nbr = edges.join(
          labels.select(col(idCol).as("nbr_id"), col("rep").as("nrep")),
          col("dst") === col("nbr_id"))
        .groupBy(col("src")).agg(min(col("nrep")).as("minrep"))
      val stepped = labels.join(nbr, labels(idCol) === nbr("src"), "left")
        .select(col(idCol), col("rep").as("prev"),
          least(col("rep"), coalesce(col("minrep"), col("rep"))).as("rep"))
        .localCheckpoint()
      changed = stepped.filter(col("rep") =!= col("prev")).count()
      labels = stepped.select(col(idCol), col("rep"))
      round += 1
    }
    require(changed == 0,
      s"keepListToFixpoint did not converge in $maxRounds rounds — " +
        "either raise maxRounds or check the edge set for corruption " +
        "(a component's propagation path can't exceed its node count)")
    labels.withColumn("is_kept", col(idCol) === col("rep"))
  }
}
