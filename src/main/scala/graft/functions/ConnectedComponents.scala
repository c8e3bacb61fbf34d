package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, for turning
  * near-duplicate candidate PAIRS (simhash/minhash/phash banding output)
  * into per-row cluster ASSIGNMENTS — the keep/drop step of a dedup
  * pipeline.
  *
  * Algorithm: minimum-label propagation with pointer jumping — each
  * round every node takes the min label over {itself} ∪ neighbours,
  * then shortcuts to its label's label (path compression). Plain
  * propagation needs O(diameter) rounds; the jump step collapses chains
  * so convergence is O(log d) rounds in practice (the MapReduce
  * "hash-to-min" family — Rastogi et al. 2012; Kiveris et al.'s
  * large-star/small-star is the same regime). Each round is two
  * shuffles keyed on node id: one |E|-sized join + min-agg, one
  * |V|-sized self-join. No driver-side state grows with the graph —
  * only the converged-yet count crosses to the driver — and hot
  * components are ordinary aggregation skew (AQE-splittable), so the
  * shape holds at 10^11 nodes. Lineage is truncated per round with
  * eager localCheckpoint (an iterative plan would otherwise double in
  * depth every round and choke codegen).
  */
object ConnectedComponents {

  /** @param nodes single-column frame of node ids (column `id`); every
    *              edge endpoint must appear in it (near-dup pairs over a
    *              corpus always satisfy this).
    * @param edges two-column frame (`src`, `dst`), undirected — each
    *              pair may appear in either or both orientations.
    * @return (`id`, `label`) where `label` is the minimum node id of the
    *         component; singletons label themselves. */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // Self-loops fold the "keep your own label" case into the edge join,
    // so each round is a single join + min-agg (no union of a frame with
    // its own derivation, which Catalyst's union-constraint rewrite
    // rejects) and singletons survive with their own label.
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionAll(nodes.select(col("id").as("src"), col("id").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint(true)
    // Convergence: propagation is monotone (labels only ever decrease),
    // so Σ label strictly decreases iff any label changed — a narrow
    // exact-decimal aggregate per round instead of a |V| join. decimal
    // sum cannot overflow at any node count a long id space admits.
    def sig(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSig = sig(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id")).agg(min("label").as("label"))
      val jumped = neighborMin.as("a")
        .join(neighborMin.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
          col("a.label") === col("b.lid"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("b.llabel"), col("a.label")).as("label"))
        .localCheckpoint(true)
      val s = sig(jumped)
      converged = s.compareTo(prevSig) == 0
      prevSig = s
      labels = jumped
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
