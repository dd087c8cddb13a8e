package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the transitive
  * closure of near-duplicate pairs into dup GROUPS (SURVEY.md §7 hard part
  * 2: "iterative smallest-id label propagation in DataFrames, no GraphX").
  *
  * Algorithm: each node's label starts as its own id; every iteration each
  * node takes the min label in its neighborhood (large-star/small-star
  * simplified to symmetric propagation); stop when no label changes. Each
  * iteration is one shuffle on node id; iteration count is bounded by the
  * graph diameter (near-dup clusters are tiny cliques, so 2–3 rounds).
  * localCheckpoint per round truncates the lineage so plans stay O(1) deep.
  */
object Graph {

  /** @param edges two long columns (src, dst); undirected.
    * @param reliable use reliable (HDFS-able) checkpoints instead of
    *   localCheckpoint: local checkpoints live in executor block storage and
    *   are LOST on executor death — fine on local[n], wrong for a long
    *   iterative job on a real cluster, where a single lost executor would
    *   fail the lineage-truncated job unrecoverably. Reliable mode REQUIRES
    *   `sparkContext.setCheckpointDir` to point at SHARED storage (HDFS/
    *   object store): the method throws rather than inventing a directory,
    *   because a driver-local temp path would be invisible to executors on
    *   other nodes — failing in exactly the multi-node scenario the flag
    *   exists to protect.
    * @return (node, component) where component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 20, reliable: Boolean = false): DataFrame = {
    if (reliable && edges.sparkSession.sparkContext.getCheckpointDir.isEmpty)
      throw new IllegalStateException(
        "reliable=true requires sparkContext.setCheckpointDir(<shared storage>) — " +
          "a local temp dir would not be readable across executors")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // LAZY checkpoint for per-round intermediates: materialization rides the
    // round's single count() action instead of adding an eager action per
    // checkpoint (2 extra job submissions per round are pure overhead on a
    // tiny label table; lineage is still truncated once materialized)
    def ckptLazy(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = false) else df.localCheckpoint(eager = false)
    val sym = ckpt(edges.select(col(src).as("a"), col(dst).as("b"))
      .unionAll(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct())
    var labels = ckpt(sym.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate label for each node: min over its own and neighbors' labels
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "b").withColumnRenamed("comp", "nc"), "b")
        .groupBy(col("a").as("node")).agg(min("nc").as("minNeighbor"))
      val viaStep = ckptLazy(labels.join(viaNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("minNeighbor"), col("comp"))).as("comp"),
          col("comp").as("prev"))) // consumed twice below (join left side + parents)
      // pointer jumping: also adopt the label OF the current label, which
      // doubles propagation distance per round — convergence in
      // O(log diameter) rounds instead of O(diameter) (a 30-node chain
      // needs ~6 rounds, not 29)
      val parents = viaStep.select(col("node").as("p_node"), col("comp").as("p_comp"))
      val next = ckptLazy(viaStep.join(parents, col("comp") === col("p_node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("p_comp"), col("comp"))).as("comp"),
          col("prev")))
      changed = next.filter(col("comp") =!= col("prev")).count()
      labels = next.select("node", "comp")
      iter += 1
    }
    if (changed > 0) {
      // labels may have become correct ON the final allowed round; converged
      // state is only observable via one extra quiet round, so check before
      // declaring failure
      val check = sym
        .join(labels.withColumnRenamed("node", "b").withColumnRenamed("comp", "nc"), "b")
        .groupBy(col("a").as("node")).agg(min("nc").as("minNeighbor"))
        .join(labels, Seq("node"))
        .filter(col("minNeighbor") < col("comp"))
        .count()
      if (check > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge within $maxIter iterations " +
            s"($check labels would still change) — with pointer jumping rounds grow " +
            "with log2(diameter); raise maxIter")
    }
    labels
  }

  /** Dup groups from a near-dup pair list: every doc in a transitive
    * cluster labeled with the cluster's smallest doc_id. Singletons (docs
    * with no dup edge) are not returned — they are their own group.
    */
  def dupGroups(pairs: DataFrame): DataFrame =
    connectedComponents(pairs, "ida", "idb")
      .withColumnRenamed("node", "doc_id")
      .withColumnRenamed("comp", "group_id")
      .orderBy("group_id", "doc_id")
}
