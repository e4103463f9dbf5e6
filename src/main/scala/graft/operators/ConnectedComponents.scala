package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components over an undirected pair graph —
  * the step between "near-dup pairs found" and "one canonical doc per
  * duplicate group". Input: edges (src, dst); output: (doc, label)
  * where label = the component's minimum node id.
  *
  * Three EXACT algorithms, selected by `spark.graft.cc.algo`
  * (default `auto`):
  *
  *  - `auto`: driver-side union-find when the symmetrized edge set is
  *    at most `spark.graft.cc.localThreshold` edges (default 1M ≈
  *    16 MB of longs — BOUNDED, unlike a corpus collect: the pair
  *    graph is near-dup density × corpus, tiny next to the documents,
  *    and above the bound it falls through to `star`). A dedup
  *    pipeline's cluster step is usually a small graph riding behind
  *    a huge scan; burning 5–10 distributed stage launches per
  *    contraction round on 300 edges is pure overhead.
  *  - `star`: alternating large-star/small-star contraction
  *    (Kiveris et al. 2014, "Connected Components in MapReduce and
  *    Beyond") — converges in ~log(n) rounds INDEPENDENT of graph
  *    diameter, so serial boilerplate chains (diameter ≫ 50) that
  *    abort plain propagation finish in a handful of rounds. The
  *    above-threshold web-corpus path.
  *  - `propagation`: min-label propagation — rounds ∝ diameter; kept
  *    as the reference implementation.
  *
  * Both loops checkpoint each round eagerly (lineage would double per
  * round otherwise) and explicitly free the PREVIOUS generation's
  * checkpoint blocks — `Dataset.unpersist` is a no-op for local
  * checkpoints, so without the RDD-level release, block-manager
  * storage grows linearly with rounds. Only two generations are ever
  * live.
  *
  * Convergence is detected by a (count, hash-checksum) fixpoint and
  * then VERIFIED exactly: every input edge must connect two
  * same-labeled nodes, else the run fails loudly — no
  * plausible-but-wrong labelings.
  */
object ConnectedComponents {

  private val MaxRounds = 50

  /** Rounds the last run took — test-visible: the chain spec pins the
    * star path's round count at ~log(diameter), not ∝ diameter. */
  @volatile private[graft] var lastRounds = 0

  /** Eager lineage snapshot for iterative loops. Default is
    * `localCheckpoint` (executor-local blocks — fastest, right for the
    * single-JVM test envelope) but blocks die with their executor: at
    * cluster scale set `spark.graft.checkpointDir` and every loop
    * snapshot becomes a RELIABLE `checkpoint()` into that directory,
    * so losing an executor mid-iteration recomputes nothing and fails
    * nothing (the delta between the two is exactly executor-loss
    * resilience; results are identical). */
  // last dir WE set per context — SparkContext stores a fs-qualified
  // "<dir>/<uuid>" internally, so comparing against getCheckpointDir
  // can never match and would re-mkdir a fresh directory per snapshot
  private val ckptDirSet = new java.util.WeakHashMap[org.apache.spark.SparkContext, String]()

  private[operators] def snapshot(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        val sc = s.sparkContext
        ckptDirSet.synchronized {
          if (ckptDirSet.get(sc) != dir) { sc.setCheckpointDir(dir); ckptDirSet.put(sc, dir) }
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Free a snapshot frame's blocks (two-generation lifecycle). Safe
    * only once nothing will read the frame again. Shared with the
    * other iterative operator ([[GraphOps.pagerank]]): plain
    * `unpersist` is a no-op for local checkpoints, so each iteration
    * would otherwise leak a generation of blocks. */
  private[operators] def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false) // no-op for checkpoints, real for persist()
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** Labels for `edges` (undirected; either or both orientations may be
    * present, self-loops ignored). Output has one row per node that
    * appears in any edge. */
  def run(s: SparkSession, edges: DataFrame): DataFrame = {
    val sym = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(snapshot)
    val labels = s.conf.getOption("spark.graft.cc.algo").getOrElse("auto") match {
      case "propagation" => viaPropagation(sym)
      case "star" => viaStarContraction(sym)
      case _ =>
        val threshold = s.conf.getOption("spark.graft.cc.localThreshold")
          .map(_.toLong).getOrElse(1000000L)
        // sym is checkpointed — the count reads materialized blocks
        if (sym.count() <= threshold) viaLocalUnionFind(sym)
        else viaStarContraction(sym)
    }
    // exactness gate: a hash-checksum fixpoint (star) or changed-count
    // (propagation) said "converged"; prove it — every edge must join
    // two same-labeled nodes. O(|E|) once, vs silent wrong clusters.
    val inconsistent = sym
      .join(labels.select(col("doc"), col("label").as("la")), col("src") === col("doc"))
      .drop("doc")
      .join(labels.select(col("doc"), col("label").as("lb")), col("dst") === col("doc"))
      .filter(col("la") =!= col("lb"))
      .limit(1).count()
    if (inconsistent > 0) throw new IllegalStateException(
      "connected components: convergence check passed but an edge crosses two labels — report this")
    release(sym)
    labels
  }

  /** Driver-side union-find with path compression and union-by-min —
    * the small-graph fast path. Memory is bounded by the caller's edge
    * threshold, not the corpus; a million edges resolve in
    * milliseconds where each distributed contraction round costs
    * several stage launches. Union-by-min makes every root the
    * component minimum — same labeling as the distributed paths. */
  private[operators] def viaLocalUnionFind(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    val edges = sym.select(col("src"), col("dst")).collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
    }
    lastRounds = 1
    val out = new Array[(Long, Long)](parent.size)
    var i = 0
    val it = parent.keySet.iterator()
    while (it.hasNext) { val k = it.next(); out(i) = (k, find(k)); i += 1 }
    spark.createDataFrame(spark.sparkContext.parallelize(out.toIndexedSeq))
      .toDF("doc", "label")
  }

  /** Large-star ∘ small-star rounds until the edge set reaches its
    * fixpoint: stars centered at each component's minimum. */
  private[operators] def viaStarContraction(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    // state: undirected edge list, one row per (u,v) orientation as
    // produced by the previous small-star (orientation is irrelevant —
    // large-star re-symmetrizes)
    var edges = sym
    var prevSig: (Long, java.math.BigDecimal) = null
    var rounds = 0
    var converged = false
    while (!converged && rounds < MaxRounds) {
      // ---- large-star: ∀u, m(u) = min(Γ(u) ∪ {u}); emit (v, m(u)) for v > u
      val both = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val mins = both.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val large = both.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
      // ---- small-star: edges now point big→small; ∀u over smaller
      // neighbors, m(u) = min; re-home them (and u) onto m(u)
      val mins2 = large.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val small = large.join(mins2, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins2.select(col("src"), col("m").as("dst")))
        .distinct()
        .transform(snapshot)
      // fixpoint signature: count + order-independent hash checksum,
      // computed in the SAME action that materializes the checkpoint
      val sigRow = small.agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("src"), col("dst")).cast(DecimalType(38, 0))).as("h")).head()
      val sig = (sigRow.getLong(0), sigRow.getDecimal(1))
      if (rounds > 0) release(edges) // free previous generation (not the caller's sym)
      edges = small
      converged = prevSig != null && sig == prevSig
      prevSig = sig
      rounds += 1
      lastRounds = rounds
      System.err.println(s"[graft] cc star round=$rounds edges=${sig._1}")
    }
    if (!converged) throw new IllegalStateException(
      s"connected components (star) did not converge in $rounds rounds")
    // fixpoint edges are (node, component-min); roots appear only as dst
    val nodes = sym.select(col("src").as("doc")).distinct()
    val out = nodes
      .join(edges.groupBy(col("src")).agg(min(col("dst")).as("m")),
        col("doc") === col("src"), "left")
      .select(col("doc"), coalesce(col("m"), col("doc")).as("label"))
      .transform(snapshot)
    release(edges)
    out
  }

  /** Min-label propagation: rounds ∝ diameter. Kept for known-tiny
    * graphs (`spark.graft.cc.algo=propagation`). */
  private[operators] def viaPropagation(sym: DataFrame): DataFrame = {
    var labels = sym.select(col("src").as("doc")).distinct()
      .withColumn("label", col("doc")).persist()
    // the handle to the CHECKPOINTED frame itself — release() must see
    // the LogicalRDD, not a projection over it, to free its blocks
    var prevGen: DataFrame = null
    var converged = false
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      val nbrMin = sym.join(labels, col("src") === col("doc"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_label"))
      // carry a per-row changed flag so convergence costs one agg over
      // the SAME materialized frame — no extra old-vs-new join per
      // round (a self-referential join is also where Spark's relation
      // dedup can silently collapse the comparison to a tautology)
      val next = labels.join(nbrMin, col("doc") === col("dst"), "left")
        .select(col("doc"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).cast("long").as("chg"))
        .transform(snapshot)
      // coalesce: sum over an EMPTY label set (no qualifying pairs in
      // the corpus) is null, and an empty graph is trivially converged
      val nChanged = next.agg(coalesce(sum(col("chg")), lit(0L))).head.getLong(0)
      if (prevGen != null) release(prevGen) else labels.unpersist(blocking = false)
      prevGen = next
      labels = next.select(col("doc"), col("label"))
      converged = nChanged == 0
      rounds += 1
      lastRounds = rounds
      System.err.println(s"[graft] cc propagation round=$rounds changed=$nChanged")
    }
    if (!converged) throw new IllegalStateException(
      s"connected components (propagation) did not converge in $rounds rounds " +
        "(graph diameter too large — use spark.graft.cc.algo=star)")
    labels
  }
}
