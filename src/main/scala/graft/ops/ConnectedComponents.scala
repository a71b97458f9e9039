package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii:
  * "Connected Components in MapReduce and Beyond", SoCC 2014 — a published
  * algorithm; no reference-repo counterpart, this is the dedup-clustering
  * step a training-data pipeline runs on near-duplicate pairs).
  *
  * Why not label propagation: min-label propagation needs diameter-many
  * shuffle rounds, and a 100 TB near-dup graph can contain long chains
  * (A~B~C~... incremental page edits). Star contraction converges in
  * O(log^2 n) rounds worst case and 2-3 rounds on typical dup clusters.
  *
  * Why no adjacency lists: both operations are expressed as a map-side-
  * combinable `min` aggregate plus an equi-join back onto the edge list,
  * so a mega-component (the celebrity-page failure mode of
  * `collect_list`-based CC) never materializes one node's full neighbor
  * set in a single task; AQE's skew-join split applies to the join side.
  */
object ConnectedComponents {

  /** Canonical undirected form: (u = max, v = min), no self-loops. */
  private def canon(e: DataFrame): DataFrame =
    e.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct()

  /** Both directions of every canonical edge: one row (u=x, v=y) per
    * ordered pair, so "the neighbors of x" is the group u = x. */
  private def sym(e: DataFrame): DataFrame =
    e.union(e.select(col("v").as("u"), col("u").as("v")))

  /** large-star(x): m = min(N(x) ∪ {x}); emit (y, m) for y ∈ N(x), y > x.
    * Preserves connectivity, hooks every strict-greater neighbor onto the
    * neighborhood minimum (Kiveris et al. §3, Alg. 2). */
  private def largeStar(e: DataFrame): DataFrame = {
    val s = sym(e)
    val m = s.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    canon(s.filter(col("v") > col("u"))
      .join(m, "u")
      .select(col("v").as("a"), col("m").as("b")))
  }

  /** small-star(x): over S = smaller neighbors of x, m = min(S); emit
    * (y, m) for y ∈ S ∪ {x}, y ≠ m (Kiveris et al. §3, Alg. 3). Nodes
    * with no smaller neighbor (component minima) emit nothing — their
    * edges are processed from the larger endpoint. */
  private def smallStar(e: DataFrame): DataFrame = {
    val s = sym(e).filter(col("v") < col("u"))
    val m = s.groupBy(col("u")).agg(min(col("v")).as("m"))
    val fromNbrs = s.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("a"), col("m").as("b"))
    val fromSelf = m.select(col("u").as("a"), col("m").as("b"))
    canon(fromNbrs.union(fromSelf))
  }

  /** (count, order-independent content hash) of a canonical edge set —
    * the convergence probe, one map-side-combined aggregate per round.
    * bit_xor (not sum) so ANSI mode can't overflow; edges are distinct
    * post-canon, so xor is a sound set hash (no pair cancellation). */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Connected components of an undirected graph given as an edge list
    * (first two columns = endpoint ids, castable to long; self-loops
    * ignored). Returns (node, canon) for every node incident to an edge,
    * canon = the component's minimum node id. Isolated nodes don't appear
    * (the caller left-joins and coalesces to self).
    *
    * Each round checkpoints the new edge set (truncating the
    * iterative lineage, same hygiene as Knn.pointKnn) and compares a
    * count+hash checksum; at the fixpoint the graph is a forest of stars
    * child→root, so labels read directly off the edges.
    *
    * `checkpointDir`: by default rounds are localCheckpoint'ed — correct
    * and fastest on a healthy cluster, but localCheckpoint blocks live
    * only in executor storage, so losing an executor mid-run fails the
    * job. Pass a (fault-tolerant, e.g. HDFS/S3) directory to switch every
    * round to a RELIABLE Dataset.checkpoint: executor loss then recomputes
    * from the checkpoint files instead of failing. Same results either way
    * (CcSpec runs both). */
  /** Canonical-edge cap for the driver union-find fast path: below this
    * many distinct edges the whole contraction loop (5-8 jobs per round)
    * collapses into one bounded take + an O(E α(E)) driver union-find —
    * the same boundedness pattern as the engine's maxDriverEdges alias
    * closure (~8 MB of longs at the cap). Larger graphs — and ALL runs
    * with a reliable checkpointDir, whose fault-tolerance contract is the
    * distributed loop — take the star-contraction path unchanged. */
  final val DRIVER_MAX_EDGES = 1 << 19

  def run(edges0: DataFrame, maxRounds: Int = 50,
      checkpointDir: Option[String] = None,
      driverMaxEdges: Int = DRIVER_MAX_EDGES): DataFrame = {
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cp(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val c = edges0.columns
    val canonEdges = canon(edges0.select(
      col(c(0)).cast("long").as("a"), col(c(1)).cast("long").as("b")))
    if (checkpointDir.isEmpty) {
      // bounded probe: one extra row is the overflow sentinel that sends
      // oversized graphs to the distributed loop below. take(), not
      // count()+collect(): the take's partition escalation stays inside
      // ONE query execution (upstream stages shared), while two separate
      // actions over the uncached edge pipeline would run it twice
      // (measured +10 jobs on q25).
      val spark = edges0.sparkSession
      import spark.implicits._
      val cap = math.min(Int.MaxValue.toLong, driverMaxEdges.toLong + 1).toInt
      val es = canonEdges.as[(Long, Long)].take(cap)
      if (es.length <= driverMaxEdges) {
        // union-find, roots ordered by id (attach max root under min), so
        // every root IS its component's minimum — the star-contraction
        // fixpoint's exact labeling
        val parent = new java.util.HashMap[Long, Long](es.length * 2)
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.get(r)
          var w = x
          while (parent.getOrDefault(w, w) != w) {
            val n = parent.get(w); parent.put(w, r); w = n
          }
          r
        }
        es.foreach { case (u, v) =>
          val ru = find(u); val rv = find(v)
          if (ru < rv) parent.put(rv, ru)
          else if (rv < ru) parent.put(ru, rv)
        }
        val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
        return spark.createDataset(
          nodes.toSeq.map(n => (n, find(n)))).toDF("node", "canon")
      }
    }
    var edges = cp(canonEdges)
    var (cnt, hash) = checksum(edges)
    var round = 0
    var converged = cnt == 0L
    while (!converged && round < maxRounds) {
      val prev = edges
      edges = cp(smallStar(largeStar(edges)))
      val (c2, h2) = checksum(edges)
      converged = c2 == cnt && h2 == hash
      cnt = c2; hash = h2; round += 1
      prev.unpersist()
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    // star fixpoint: every child has exactly one edge, to its root
    edges.select(col("u").as("node"), col("v").as("canon"))
      .union(edges.select(col("v").as("node"), col("v").as("canon")).distinct())
  }
}
