package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Weighted damped PageRank — the graph-authority primitive a crawl
  * curation pipeline runs over its link / citation / shipment graph
  * (domain authority for source weighting, hub scoring for crawl
  * frontier priority).
  *
  * This is VALUE propagation where [[Dedup.connectedComponents]] is
  * LABEL propagation: per round every node's rank is redistributed
  * along its out-edges (proportional to edge weight) and damped
  * toward the uniform teleport distribution:
  *
  *   pr'(v) = (1-d)/N + d * Σ_{u→v} share(u,v) · pr(u),
  *   share(u,v) = w(u,v) / Σ_x w(u,x)
  *
  * Cost model per round (the 100 TB accounting): one join of the
  * pinned share table with the 2-column rank table on `src`, one
  * partial-aggregated sum shuffle on `dst`, one left join back onto
  * the node list — the same per-round discipline as
  * [[Dedup.keepListToFixpoint]]: every round is pinned
  * (localCheckpoint, or RELIABLE checkpoint via `checkpointDir` on a
  * real cluster) so round N's plan never replays rounds 1..N-1, and
  * the previous round's blocks are released as soon as the next is
  * materialized. The share table is computed and pinned ONCE — the
  * out-weight normalization never re-runs. On a real cluster the
  * share table would be bucketed by `src` so the per-round join
  * reshuffles only the rank table (|V| rows, 2 columns), never the
  * edge set.
  *
  * Cross-engine determinism (the repo convention — see
  * [[graft.queries.Det]]): per-edge contributions are IEEE products
  * of identically-derived doubles, canonicalized at 9 decimals via
  * the double→decimal CAST (Spark's cast and DuckDB's varchar-hop
  * cast round the same shortest decimal representation — round()
  * would disagree by one ULP at exact .5 boundaries), and summed as
  * exact decimals, so the aggregation order can't skew the total;
  * the damped update is then an IEEE chain over exact inputs, cast
  * back through decimal(20,9) — every round's rank vector is
  * bit-identical between engines, and DuckDB replays the whole
  * recursion as unrolled CTEs.
  *
  * Dangling nodes (out-degree 0) are NOT redistributed — callers
  * model an undirected random walk by passing each edge in both
  * directions (then every node with an in-edge has an out-edge and
  * no rank mass leaks beyond the damping itself).
  */
object PageRank {

  /** Per-phase instrumentation of the last [[run]]: wall plus EXACT
    * shuffle-write/spill attribution per phase (round 0 is `prepare`,
    * 1..iters the damped rounds), via the shared [[PhaseStats]]
    * job-group attribution (one implementation for every iterative
    * operator — [[Dedup]] shares it).
    */
  type RoundStat = PhaseStats.RoundStat

  private val lastRunByThread = new ThreadLocal[PhaseStats.Handle]
  @volatile private var lastRun: PhaseStats.Handle = PhaseStats.emptyHandle

  /** Per-phase stats of the most recent [[run]] — the CALLING THREAD's
    * last run when it has one (so concurrent runs each read their own),
    * else the JVM-wide most recent. Empty before any run. Shuffle/spill
    * read from the listener at CALL time — call after the run returns,
    * not mid-loop.
    */
  def lastRunStats: Seq[RoundStat] = {
    val tl = lastRunByThread.get()
    (if (tl != null) tl else lastRun).stats
  }

  /** [[lastRunStats]] as one JSON array — the single serialization every
    * artifact writer (Bench's q146_rounds, the stress harness lines)
    * shares, so the rows can't drift in shape between artifacts.
    */
  def lastRunStatsJson: String = {
    val tl = lastRunByThread.get()
    (if (tl != null) tl else lastRun).json
  }

  /** Bucketed-by-src edge storage — the cluster-scale layout the class
    * doc prescribes, as code: write the link graph ONCE with this, pass
    * `spark.table(name)` to [[run]]/[[prepare]], and the out-weight
    * aggregate and share join run with NO |E|-row exchange — the scan's
    * HashPartitioning(src, buckets) feeds the `groupBy(src)` directly
    * and co-partitions the edges⋈outW join (plan-locked in
    * PlanShapeSpec). The only |E| movement left in prepare is the one
    * dst-alignment repartition the per-round exchange-elision rests on
    * (bucketing can serve ONE key; src owns the storage layout because
    * the normalization and join both key on it).
    */
  def writeBucketedEdges(edges: DataFrame, table: String,
      buckets: Int = 32, path: Option[String] = None): Unit = {
    val w = edges.select(col("src"), col("dst"), col("w"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "src").sortBy("src")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** @param edges directed weighted edges: `src`, `dst` (long), `w`
    *              (long > 0); (src, dst) pairs must be unique
    * @param iters fixed number of damped rounds (oracle-replayable —
    *              convergence detection would make the round count
    *              data-dependent, which callers can layer on top)
    * @param damping d in the update above (teleport prob = 1-d)
    * @param checkpointDir reliable-checkpoint dir for real clusters
    *              (defaults to executor-local blocks — see [[Dedup]])
    * @return (nid, pr): one row per node that has at least one
    *         out-edge, pr rounded to 9 decimals
    */
  /** `pinEvery` — checkpoint INTERVAL (the GraphX pregel discipline):
    * pin every k-th damped round instead of every round. Rounds between
    * pins chain as plan depth; the intermediate round's rank vector is
    * computed exactly once (it feeds only the NEXT round's broadcast
    * build, which materializes it), so total pass count over the pinned
    * share table is unchanged while checkpoint writes drop k-fold. The
    * DEFAULT stays 1: measured at sf0.1 (r18), k = 2 won the isolated
    * subset A/B slightly (5-round wall 2.59 → 2.35 s) but was tail-
    * UNSTABLE in full bench context — individual batch phases spiked to
    * 8+ s (an unpinned intermediate re-materializing under storage
    * churn), and min-of-5 regressed 3.30 → 4.31 s. Multi-executor row
    * (r19, ClusterPerf local-cluster[2,16,8192] at sf0.1, warm seconds,
    * 3 invocations each): k = 1 → 12.76 / 12.90 / 13.20; k = 2 →
    * 11.93 / 14.20 / 12.28. Min and median favor k = 2 by ~4–5% but
    * the 14.2 s outlier reproduces the local tail instability, and the
    * band overlaps — not decisive enough to flip the default off the
    * measured-stable local winner. The knob exists for cluster runs
    * where the per-round |V|-row RELIABLE checkpoint write is a real
    * IO term and storage churn is per-executor; q146 exposes it as
    * `spark.graft.pagerank.pinEvery`. k bounds lineage depth either way, so the
    * driver-death-by-lineage guarantee the per-round pin existed for is
    * kept. Results are bit-identical (the same IEEE/decimal chain,
    * pinned or not); per-phase attribution reports one row per PIN.
    */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85,
      checkpointDir: Option[String] = None, pinEvery: Int = 1): DataFrame = {
    require(pinEvery >= 1, s"pinEvery must be >= 1, got $pinEvery")
    val sc = edges.sparkSession.sparkContext
    val runStats = PhaseStats.start(sc, "pagerank")
    try {
      val prep = runStats.phase(0)(prepare(edges, damping, checkpointDir))
      var pr = prep.pr
      var releasePr = prep.releasePr
      var i = 1
      var phase = 1
      while (i <= iters) {
        val hi = math.min(i + pinEvery - 1, iters)
        val (p, r) = runStats.phase(phase) {
          var cur = pr
          (i to hi).foreach(_ => cur = step(prep, cur, damping))
          pin(cur, checkpointDir)
        }
        releasePr()
        pr = p; releasePr = r
        i = hi + 1
        phase += 1
      }
      prep.releaseShares()
      prep.releaseNodes()
      val handle = runStats.finish()
      lastRunByThread.set(handle)
      lastRun = handle
      pr
    } catch { case t: Throwable => runStats.abort(); throw t }
  }

  /** The pinned per-run frames one damped round steps over (exposed
    * `private[graft]` so PlanShapeSpec can lock the round's physical
    * plan without running the loop). Release thunks are the caller's.
    */
  private[graft] final case class Prep(shares: DataFrame, nodes: DataFrame,
      pr: DataFrame, teleport: Double, bcastRanks: Boolean,
      releaseShares: () => Unit, releaseNodes: () => Unit,
      releasePr: () => Unit)

  /** The pre-pin share table: out-weight normalization + the one dst
    * alignment repartition. Exposed `private[graft]` so PlanShapeSpec
    * can lock the BUCKETED path's physical plan (a bucketed-by-src
    * edges table feeds the `groupBy(src)` and the edges⋈outW join with
    * no |E| exchange — the only Exchange left here is the dst one).
    */
  private[graft] def sharesOf(edges: DataFrame): DataFrame = {
    val outW = edges.groupBy(col("src").as("ou")).agg(sum(col("w")).as("ow"))
    edges.join(outW, col("src") === col("ou"))
      .select(col("src"), col("dst"),
        (col("w").cast(DoubleType) / col("ow").cast(DoubleType)).as("share"))
      .repartition(col("dst"))
  }

  private[graft] def prepare(edges: DataFrame, damping: Double,
      checkpointDir: Option[String]): Prep = {
    // out-weight normalization, once: share(u,v) = w / W(u) — an IEEE
    // division of two exact longs, identical in any engine.
    // Pinned REPARTITIONED BY dst: with the rank side broadcast, each
    // round's contribution stage maps over these dst-aligned blocks,
    // so every task's partial-agg table covers exactly ITS dst range —
    // map-side combine is COMPLETE (one row per dst leaves each task)
    // and the per-round exchange carries |V| partially-summed rows
    // instead of |E| raw contributions. (AQE keeps an ENSURE_
    // REQUIREMENTS exchange above the partial agg — plan-locked — but
    // it moves the combined rows only; eliminating it entirely would
    // save |V|, not |E|.) Measured at 2M nodes / 40M edges / 5 rounds,
    // together with the UnsafeRow pin below: 156 s + 3.4 GB spill →
    // 32 s + 0.18 GB.
    val (shares, releaseShares) = pin(sharesOf(edges), checkpointDir)
    // node list pinned too: it is |V| rows derived from the |E|-row share
    // table via distinct — left lazy, every round's stepped plan would
    // re-shuffle the EDGE set just to rebuild it (measured at 2M nodes /
    // 40M edges: the unpinned form spilled 5.1 GB over 5 rounds).
    // Partitioned by nid = the contribution table's dst hash layout, so
    // the per-round left join back onto the node list is co-partitioned
    // (no exchange on either side).
    // the node-list pin and the graph-order scalar share ONE action: the
    // count IS the materializing pass on the armed checkpoint (the
    // Pin.arm discipline the per-round convergence digests already use)
    // — the former pin-then-count shape ran two jobs over the same rows
    val (nodes, nodesRdd, releaseNodes) = Pin.arm(
      shares.select(col("src").as("nid")).distinct()
        .repartition(col("nid")), checkpointDir)
    val n = nodesRdd.count() // driver scalar: graph order, not graph size
    // pr₀ is a 2-column LITERAL projection of the pinned node list — a
    // third checkpoint of it bought nothing (the first round's broadcast
    // collect re-runs the projection over the pinned blocks for the same
    // cost as reading a pinned copy); release is the no-op accordingly
    val pr = nodes.select(col("nid"), lit(1.0 / n).as("pr"))
    val releasePr = () => ()
    // rank-side join strategy: the rank table is 2 columns × |V| rows —
    // up to ~4M nodes (≈64 MB) broadcasting it makes the share⋈rank
    // join map-side over the PINNED edge blocks (no edge exchange, no
    // sort — the unhinted SMJ re-sorted all |E| rows every round).
    // Past that, a shuffle-hash hint keeps the exchange but drops the
    // per-round edge sort; on a real cluster shares would be bucketed
    // by src so only the |V|-row rank table moves (see class doc).
    Prep(shares, nodes, pr, (1.0 - damping) / n, n <= 4000000L,
      releaseShares, releaseNodes, releasePr)
  }

  /** One damped round over the pinned frames: the per-round plan the
    * 32 s measurement rests on — broadcast rank join over the pinned
    * dst-aligned share blocks, COMPLETE map-side combine, one
    * |V|-row exchange, co-partitioned left join back onto the nodes.
    */
  private[graft] def step(prep: Prep, pr: DataFrame,
      damping: Double): DataFrame = {
    // per-edge contributions canonicalized at 9 decimals via the
    // decimal CAST (not round(): the engines' round() disagree by one
    // ULP on products landing at exact .5 boundaries; the double→
    // decimal cast is the proven cross-engine pair — see Det)
    val prSide = pr.select(col("nid").as("u"), col("pr").as("upr"))
    val contrib = prep.shares
      .join(if (prep.bcastRanks) broadcast(prSide) else prSide.hint("shuffle_hash"),
        col("src") === col("u"))
      .select(col("dst"),
        (col("upr") * col("share")).cast(DecimalType(28, 9)).as("c"))
      .groupBy(col("dst"))
      .agg(sum(col("c")).cast(DoubleType).as("s"))
    // NB oracle writers: the teleport is DOUBLE arithmetic — a plain
    // `(1.0 - 0.85) / n` in DuckDB runs in decimal (its numeric
    // literals are DECIMAL) and lands one ULP away; wrap the literals
    // in CAST(… AS DOUBLE) (see q146OracleSql)
    prep.nodes.join(contrib, col("nid") === col("dst"), "left")
      .select(col("nid"),
        (lit(prep.teleport) + lit(damping) * coalesce(col("s"), lit(0.0)))
          .cast(DecimalType(20, 9)).cast(DoubleType).as("pr"))
  }

  /** Dataset-LEVEL pin, shared with [[Dedup]] via [[Pin]]: the
    * checkpoint stores compact UnsafeRows instead of boxed external
    * Rows (the row-pin held the 40M-row share table as ~4 GB of objects
    * — most of the heap, which is what pushed the per-round aggregation
    * to spill), and the resulting LogicalRDD PRESERVES output
    * partitioning, which the whole per-round exchange-elision scheme
    * above rests on. On the reliable path [[Pin]] persists before the
    * materializing action so `RDD.doCheckpoint`'s file-writing pass
    * reads cache instead of replaying the plan. Returns the pinned
    * frame and its release thunk.
    */
  private def pin(df: DataFrame,
      checkpointDir: Option[String] = None): (DataFrame, () => Unit) =
    Pin.pin(df, checkpointDir)
}
