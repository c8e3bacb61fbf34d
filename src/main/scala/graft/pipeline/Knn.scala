package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.index.{GridSystem, ZIndex}

/** Cell id of a 2D point under a pluggable grid (square/H3-hex). */
case class PointCell(x: Expression, y: Expression,
                     grid: GridSystem = GridSystem.Square)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def eval(input: InternalRow): Any = {
    val xv = x.eval(input).asInstanceOf[Number].doubleValue()
    val yv = y.eval(input).asInstanceOf[Number].doubleValue()
    grid.cellOf(xv, yv)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(x = c(0), y = c(1))
}

/** k-ring of cells around a cell id (H3 kRing analogue, J4 /
  * north-rule kNN support). */
case class KRingCells(cell: Expression, k: Int,
                      grid: GridSystem = GridSystem.Square)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(grid.kRing(v.asInstanceOf[Long], k))
  override protected def withNewChildInternal(c: Expression): Expression = copy(cell = c)
  override def child: Expression = cell
}

/** Exact k-nearest-neighbour join over 2D points via cell-ring expansion
  * + distance refine (J4: the reference has no kNN; this is the
  * north-rule addition).
  *
  * Algorithm (scales to a distributed points table):
  *  1. candidates = queries ⋈ points on kRing(queryCell, r) cells,
  *  2. rank by exact distance (window, deterministic tiebreak on id),
  *  3. PROOF CHECK: a result set is exact iff the k-th distance <= r
  *     (any point outside ring r is farther than r cell-units) and at
  *     least k candidates were found,
  *  4. unsatisfied queries re-run with doubled r (only the stragglers).
  *
  * The ring keeps doubling until either every query is proven exact or
  * the ring provably covers the joint data extent (minDistOutsideRing(r)
  * exceeds the query∪point bounding-box diagonal): at that radius every
  * point is a candidate for every remaining query, so the top-k is exact
  * by definition — including queries with fewer than k neighbours.
  *
  * Ring cap: exploding a ring costs ringCellCount(r) cell keys PER
  * remaining query; for sparse/wide extents that (2r+1)² blow-up would
  * dwarf the points table itself. Once ringCellCount(r) exceeds
  * max(|points|, ringCap), the remaining straggler set is instead
  * all-pairs joined against the points with the smaller side broadcast
  * (a bounded BroadcastNestedLoopJoin — one pass over the bigger side,
  * no shuffle, no cell explosion) — exact by definition, and strictly
  * cheaper than the ring it replaces. The equi-join ring path never
  * produces a cartesian/BNLJ plan. Choose the grid cell size near the
  * typical k-th-neighbour distance so stragglers are rare and rings
  * stay small.
  *
  * Coordinates are in cell units (1 cell = 1 unit). Columns:
  * queries(qid, qx, qy), points(pid, px, py) -> (qid, rank, pid, dist2).
  */
object KnnJoin {
  import Exprs.{col => ec, expr => ee}

  def run(spark: SparkSession, queries: DataFrame, points: DataFrame, k: Int,
          initialRing: Int = 1,
          grid: GridSystem = GridSystem.Square,
          ringCap: Long = 4096L): DataFrame = {
    val pts = points.withColumn("pcell", ec(PointCell(ee(col("px")), ee(col("py")), grid)))

    // Coverage radius: one bounded agg per side (4 doubles each). Once
    // minDistOutsideRing(r) > maxDist, any point OUTSIDE ring r would be
    // farther than the largest possible query↔point distance — i.e. no
    // such point exists and the ring covers the whole points table.
    val qb = queries.agg(min("qx"), max("qx"), min("qy"), max("qy")).head()
    val pb = points.agg(min("px"), max("px"), min("py"), max("py"), count(lit(1))).head()
    if (qb.isNullAt(0) || pb.isNullAt(0))
      return queries.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0).as("rank"), lit(0L).as("pid"), lit(0.0).as("dist2"))
        .limit(0)
    val dx = math.max(qb.getDouble(1), pb.getDouble(1)) - math.min(qb.getDouble(0), pb.getDouble(0))
    val dy = math.max(qb.getDouble(3), pb.getDouble(3)) - math.min(qb.getDouble(2), pb.getDouble(2))
    val maxDist = math.sqrt(dx * dx + dy * dy)
    val nPoints = pb.getLong(4)

    val dist2Col =
      (col("px") - col("qx")) * (col("px") - col("qx")) +
        (col("py") - col("qy")) * (col("py") - col("qy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("dist2"), col("pid"))
    def rank(cand: DataFrame): DataFrame = cand
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "pid", "dist2")

    var remaining = queries
    var results: DataFrame = null
    var r = initialRing
    var done = false
    while (!done && !remaining.isEmpty) {
      val covered = grid.minDistOutsideRing(r) > maxDist
      if (grid.ringCellCount(r) > math.max(nPoints, ringCap)) {
        // Ring cap (see scaladoc): the ring would explode more cell keys
        // than there are points. All-pairs over the remaining straggler
        // set is exact by definition and strictly cheaper; broadcast the
        // smaller side so the bigger one streams without a shuffle.
        val nRemaining = remaining.count()
        val cand = (if (nRemaining <= nPoints) pts.crossJoin(broadcast(remaining))
                    else remaining.crossJoin(broadcast(pts)))
          .where(col("qid") =!= col("pid"))
          .withColumn("dist2", dist2Col)
        val ranked = rank(cand)
        results = if (results == null) ranked else results.unionAll(ranked)
        done = true
      } else {
      val cand = remaining
        .withColumn("qcell", ec(PointCell(ee(col("qx")), ee(col("qy")), grid)))
        .withColumn("cell", explode(ec(KRingCells(ee(col("qcell")), r, grid))))
        .join(pts, col("cell") === col("pcell"))
        .where(col("qid") =!= col("pid"))
        .withColumn("dist2", dist2Col)
      // no dedup needed: ring cells are distinct and each point lives in
      // exactly one cell, so every (query, point) pair matches at most once

      val ranked = rank(cand)

      if (covered) {
        // every point was a candidate: ranked is exact for ALL remaining
        // queries (queries with < k neighbours keep what exists)
        results = if (results == null) ranked else results.unionAll(ranked)
        done = true
      } else {
        // exactness: k candidates found and k-th distance within the ring guarantee.
        // localCheckpoint truncates the iterative lineage — status and the
        // new `remaining` would otherwise each embed the previous round's
        // tree twice (via ranked AND the join), doubling the logical plan
        // per round and making Catalyst analysis exponential in rounds.
        // Both frames are at most one row per unresolved query.
        val status = ranked.groupBy("qid")
          .agg(count(lit(1)).as("found"), max(sqrt(col("dist2"))).as("maxd"))
          .withColumn("exact", // strict <: a point just outside ring r can sit at the bound
            col("found") === k && col("maxd") < lit(grid.minDistOutsideRing(r)))
          .localCheckpoint()
        val good = ranked.join(status.where(col("exact")).select("qid"), Seq("qid"))
        results = if (results == null) good else results.unionAll(good)
        remaining = remaining.join(status.where(col("exact")).select("qid"), Seq("qid"), "left_anti")
          .localCheckpoint()
        r *= 2
      }
      }
    }
    if (results == null) queries.select(col("qid"), lit(0).as("rank"),
      lit(0L).as("pid"), lit(0.0).as("dist2")).limit(0)
    else results
  }
}
