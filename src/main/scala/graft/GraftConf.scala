package graft

/** Session settings every graft entry point applies.
  *
  * `objectHashAggregate.sortBased.fallbackThreshold` (default 128):
  * Spark falls back from hash- to sort-based aggregation once a task's
  * in-memory map holds this many GROUPS — a guard for aggregates with
  * unbounded per-group buffers (`collect_list`). Every
  * `TypedImperativeAggregate` in this library has buffers bounded BY
  * CONSTRUCTION ([[graft.functions.TopKScored]] ≤ k elements,
  * [[graft.functions.CollectPairsCapped]] ≤ maxElems,
  * [[graft.functions.CountMin]] a fixed 4×64 array), so hash
  * aggregation is safe at any group count, and the 128 default is
  * actively harmful: past it, the map-side partial DEGRADES INTO A
  * SORT of the full input — for q138 exactly the per-pair sort the
  * bounded aggregate exists to avoid. Measured at the 10× hard-negative
  * stress (k=20, 20k anchors/task): threshold 128 → 509 MB spill and
  * the aggregate LOSING to the window form; raised → zero spill,
  * bounded map memory (entries × O(k) bytes). Sizing uses the LARGEST
  * bounded buffer in the library (CollectPairsCapped at q127's
  * dfCap+1 = 51 pairs ≈ 850 B/entry): 2¹⁸ entries caps the worst-case
  * map at ~210 MB/task — sized for the 4 GB-heap executors the dial
  * tables assume — while still holding every real per-task group count
  * the stress suite observed (q138's partials peaked at ~40k groups/
  * task); the sort fallback remains as a backstop past it.
  */
object GraftConf {
  val ObjAggFallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val ObjAggFallbackEntries = (1 << 18).toString
}
