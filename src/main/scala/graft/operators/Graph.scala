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
    * @param maxIter convergence bound for the ITERATIVE path; the bounded
    *   driver fast path (inputs under `graft.cc.maxDriverEdges`) converges
    *   exactly in one union-find pass and never consults maxIter — set
    *   `graft.cc.maxDriverEdges=0` to use maxIter as a cost guard on all
    *   inputs (r19 advice: the exemption is deliberate, documented here).
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
    // ---- bounded driver fast path (r19 optimization, measured): the
    // iterative loop costs 2-4 rounds x (3 shuffles + 1 action) of pure
    // job dispatch on a label table that is TINY whenever the edge list
    // is — near-dup pair lists are the LSH-verified survivors, orders of
    // magnitude smaller than the corpus. Under an exact edge-count bound
    // (driver ingress <= maxDriverEdges 16-byte rows, the same bounded-
    // finale class as the q112/q113 kernels and lrTrain), collect the
    // checkpointed symmetric edge list ONCE and run the driver union-find
    // that OperatorsSpec already holds the iterative path equal to —
    // min-id linking, so the root IS the component's smallest id, the
    // identical label function. Past the bound (or on any null id, which
    // only the join path defines semantics for), the O(log diameter)
    // iterative rounds below remain the path — a 100 TB edge list never
    // lands on a driver. The count is one job over checkpointed blocks;
    // the fast path replaces the per-round convergence actions, so the
    // job count strictly drops for every bounded input.
    // Driver cost at the bound (r19 advice, measured honestly): the collect
    // materializes ~80 B/edge of transient boxed Rows before the immediate
    // copy into two primitive long arrays (16 B/edge retained), and the
    // union-find map holds one boxed (Long, Long) entry per NON-ROOT node
    // (~50 B each, nodes <= 2·edges). Default 1M edges ==> <= ~80 MB
    // transient + ~120 MB worst-case retained — safe headroom on a default
    // 1g driver (the r19 4M default was sized to the retained arrays only
    // and could spike ~1 GB at the bound). Non-long edge columns (e.g. int
    // ids) take the iterative path: getLong on an int column would throw,
    // and the join path owns those semantics (r19 advice).
    val maxDriverEdges =
      edges.sparkSession.conf.get("graft.cc.maxDriverEdges", (1024 * 1024).toString).toLong
    val edgesAreLong = sym.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (edgesAreLong && sym.count() <= maxDriverEdges) {
      val rows = sym.collect()
      if (!rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        val m = rows.length
        val ea = new Array[Long](m)
        val eb = new Array[Long](m)
        var i = 0
        while (i < m) { ea(i) = rows(i).getLong(0); eb(i) = rows(i).getLong(1); i += 1 }
        val parent = new java.util.HashMap[Long, Long]()
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrDefault(x, x)
          while (p != x) { // path-halve while walking to the root
            val gp = parent.getOrDefault(p, p)
            parent.put(x, gp)
            x = gp
            p = parent.getOrDefault(x, x)
          }
          x
        }
        i = 0
        while (i < m) {
          val ra = find(ea(i)); val rb = find(eb(i))
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
          i += 1
        }
        // distinct nodes ascending, primitively: sort the concatenated
        // endpoint array and deduplicate in place (the TreeSet<Long> this
        // replaces held every node boxed twice over)
        val ns = new Array[Long](2 * m)
        System.arraycopy(ea, 0, ns, 0, m)
        System.arraycopy(eb, 0, ns, m, m)
        java.util.Arrays.sort(ns)
        var nUniq = if (m == 0) 0 else 1
        i = 1
        while (i < 2 * m) {
          if (ns(i) != ns(i - 1)) { ns(nUniq) = ns(i); nUniq += 1 }
          i += 1
        }
        val out = new Array[org.apache.spark.sql.Row](nUniq)
        i = 0
        while (i < nUniq) {
          out(i) = org.apache.spark.sql.Row(ns(i), find(ns(i)))
          i += 1
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField("comp",
            org.apache.spark.sql.types.LongType, nullable = true)))
        import scala.jdk.CollectionConverters._
        return edges.sparkSession.createDataFrame(out.toSeq.asJava, schema)
      }
    }
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
