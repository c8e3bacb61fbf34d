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
  *
  * Small graphs short-circuit to a SINGLE-TASK union-find (same
  * auto-gate idea as the flagship join's broadcast path and the kNN
  * straggler cap): when |V| + 2|E| fits one task comfortably, O(log d)
  * rounds of fixed per-job cost (plan + schedule + collect of the
  * convergence signature) cost more than the whole problem. The gate
  * counts the already-checkpointed symmetrized edge list — one cheap
  * cached-scan job — so the choice is automatic and the iterative
  * shape is untouched for graphs that are genuinely large.
  */
object ConnectedComponents {

  /** @param nodes single-column frame of node ids (column `id`, numeric);
    *              every edge endpoint must appear in it (near-dup pairs
    *              over a corpus always satisfy this).
    * @param edges two-column frame (`src`, `dst`), undirected — each
    *              pair may appear in either or both orientations.
    * @param smallGraph row threshold on the symmetrized self-looped edge
    *              list (= |V| + 2|E| distinct rows) below which the
    *              single-task union-find path is taken; 0 forces the
    *              iterative path (tests use this to exercise it at
    *              small |V|).
    * @return (`id`, `label`) where `label` is the minimum node id of the
    *         component; singletons label themselves. */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30,
          smallGraph: Long = 4L << 20): DataFrame = {
    // Self-loops fold the "keep your own label" case into the edge join,
    // so each round is a single join + min-agg (no union of a frame with
    // its own derivation, which Catalyst's union-constraint rewrite
    // rejects) and singletons survive with their own label. The raw pair
    // list is checkpointed FIRST: symmetrizing is a self-union, and
    // without materialization the (typically expensive — banded
    // self-join + hashing) edge derivation would execute twice.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val sym = e
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .unionAll(nodes.select(col("id").as("src"), col("id").as("dst")))
      .distinct().localCheckpoint(true)
    if (sym.count() <= smallGraph) return runSingleTask(nodes, sym)

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

  /** Exact union-find over the (gate-checked small) symmetrized edge
    * list in one task: roots are kept at the component MINIMUM by always
    * attaching the larger root under the smaller, so the output labels
    * are identical to the iterative path's. Self-loops register every
    * node, so the result covers all of `nodes`; the trailing left join
    * only restores the caller's `id` column type/name. */
  private def runSingleTask(nodes: DataFrame, sym: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val roots = sym.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.getOrDefault(c, c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        it.foreach { case (s, d) =>
          if (!parent.containsKey(s)) parent.put(s, s)
          if (!parent.containsKey(d)) parent.put(d, d)
          val (rs, rd) = (find(s), find(d))
          if (rs < rd) parent.put(rd, rs) else if (rd < rs) parent.put(rs, rd)
        }
        val out = Vector.newBuilder[(Long, Long)]
        parent.keySet().forEach(id => out += ((id, find(id))))
        out.result().iterator
      }
      .toDF("uid", "ulabel")
    val idType = nodes.schema("id").dataType
    nodes.join(roots, nodes("id") === roots("uid"), "left")
      .select(col("id"),
        coalesce(col("ulabel").cast(idType), col("id")).as("label"))
  }
}
