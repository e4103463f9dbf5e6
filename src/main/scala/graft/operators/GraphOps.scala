package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over derived relational graphs (connected
  * components lives in [[ConnectedComponents]]; this adds the numeric
  * iteration family).
  *
  * Cross-engine float parity for iterative numerics: every iteration
  * ROUNDS the rank vector to 10 decimals in BOTH engines, so the
  * per-iteration state is bit-identical (a sum's fold-order ULP sits
  * ~1e-17 relative; a 1e-10 grid snaps it) and errors cannot compound
  * across iterations. The oracle unrolls the fixed iteration count as
  * chained CTEs — no reliance on aggregation-in-recursive-term, which
  * standard SQL forbids.
  */
object GraphOps {

  private val Damping = 0.85
  private val Iters = 10
  private val HitsIters = 8
  private val LpaRounds = 6

  /** PageRank over the nation trade graph (supplier nation → customer
    * nation edges derived from lineitem⋈orders⋈supplier⋈customer).
    * Fixed 10 iterations, damping 0.85, dangling mass dropped (the
    * simple formulation — both sides state the SAME semantics, which
    * is what the oracle checks).
    *
    * Scale shape: the graph (distinct nation pairs) is tiny, but the
    * loop body is the standard join-aggregate round — ranks ⋈ edges on
    * src, groupBy dst, one shuffle per iteration — exactly what runs
    * on a billion-edge web graph; each round eagerly checkpoints so
    * lineage stays flat (the round-1 lesson ConnectedComponents
    * learned). The EDGE DERIVATION is the expensive part at 100 TB and
    * it is one pass over the pruned fact join. */
  val pagerank: GraftOp = GraftOp(
    "graph_pagerank",
    {
      val base = """WITH edges AS (
        |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
        |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |    AND o_custkey = c_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND n1.n_nationkey <> n2.n_nationkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nc AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |p0 AS (SELECT node,
        |  round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nc), 10) AS rank FROM nodes)""".stripMargin
      val iters = (1 to Iters).map { k =>
        s"""p$k AS (
           |  SELECT n.node,
           |    round(CAST(${1 - Damping} AS DOUBLE) / (SELECT n FROM nc)
           |      + CAST($Damping AS DOUBLE) * coalesce(sum(p.rank / d.outdeg), 0), 10) AS rank
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN p${k - 1} p ON p.node = e.src
           |  LEFT JOIN deg d ON d.src = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      s"$base$iters\nSELECT node, rank FROM p$Iters ORDER BY node"
    }) { (s, d) =>
    pagerankFrom(tradeEdges(s, d), Iters, Damping).orderBy(col("node"))
  }

  /** Supplier-nation → customer-nation trade edges (distinct pairs) —
    * one pass over the fact join. Only the FIXED-size dims
    * (nation: 25 rows at every SF) carry a broadcast hint; supplier
    * and customer scale with SF (billions of rows at the 100-TB design
    * point, where a forced broadcast would fail the job), so their
    * joins are left to AQE, which still picks broadcast at test SFs. The
    * derivation is the expensive part of every graph op (the graph
    * itself is tiny), so the frame is registry-persisted and shared by
    * pagerank and triangle counting: one fact scan per session+dir,
    * not one per operator. */
  /** Times the trade-edge derivation actually ran this JVM (the
    * zero-rebuild proof for [[IndexStore]]). */
  @volatile private[graft] var edgeBuilds = 0

  private[operators] def tradeEdges(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.CachedPlans.cached(s, s"graph.tradeEdges:$d") {
      edgeBuilds += 1
      tradeEdgesPlan(s, d)
    }

  private def tradeEdgesPlan(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("nk1"), col("n_name").as("src"))),
        col("s_nationkey") === col("nk1"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("nk2"), col("n_name").as("dst"))),
        col("c_nationkey") === col("nk2"))
      .filter(col("nk1") =!= col("nk2"))
      .select(col("src"), col("dst")).distinct()

  /** Distinct undirected trade edges (u = lexicographic min endpoint)
    * — ten graph ops consume this exact frame, and each was re-paying
    * the distinct exchange on top of the shared [[tradeEdges]]; the
    * persisted copy makes the per-op plan start at the (tiny) edge
    * list. The `% 4` sparsifier several ops then apply is a map over
    * this frame, not worth its own registry entry. */
  private[operators] def undirectedTradeEdges(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.CachedPlans.cached(s, s"graph.undTradeEdges:$d")(
      tradeEdges(s, d)
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct())

  /** Iterations the last [[pagerankFrom]] actually ran — test-visible
    * (the early-stop spec pins it below the requested bound). */
  @volatile private[graft] var lastIterations = 0

  /** The PageRank loop over an arbitrary (src, dst) edge frame.
    *
    * Early stop WITHOUT breaking the fixed-iteration oracle contract:
    * every iteration snaps ranks to the 1e-10 grid, so when an
    * iteration reproduces the previous vector EXACTLY (L1 delta = 0 on
    * the grid — not an ε-tolerance), the map is at a fixpoint and
    * every remaining iteration is the identity: emitting now is
    * bit-identical to running all `iters`. The delta check is one
    * |nodes|-row aggregate per round, riding on the rank frame the
    * round materialized anyway.
    *
    * Snapshots go through [[ConnectedComponents.snapshot]]: eager
    * localCheckpoint by default, reliable `checkpoint()` into
    * `spark.graft.checkpointDir` when set (executor-loss resilience at
    * cluster scale). */
  private[graft] def pagerankFrom(rawEdges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val edges = ConnectedComponents.snapshot(rawEdges)
    val nodes = ConnectedComponents.snapshot(
      edges.select(col("src").as("node")).union(edges.select(col("dst"))).distinct())
    val n = nodes.count()
    val deg = ConnectedComponents.snapshot(
      edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    var snap: DataFrame = ConnectedComponents.snapshot(
      nodes.select(col("node"), round(lit(1.0) / n, 10).as("rank")))
    var ranks: DataFrame = snap
    var iter = 0
    var fixpoint = false
    def oneRound(r: DataFrame): DataFrame = nodes
      .join(edges.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .join(r.select(col("node").as("src"), col("rank")), Seq("src"), "left")
      .join(deg, Seq("src"), "left")
      .groupBy(col("node"))
      .agg(round(lit(1 - damping) / n +
        lit(damping) * coalesce(sum(col("rank") / col("outdeg")), lit(0.0)), 10).as("rank"))
    while (iter < iters && !fixpoint) {
      val next = oneRound(ranks)
      iter += 1
      // probe the exact-grid fixpoint every 3rd round only: each probe
      // is a driver action, and post-fixpoint rounds are the IDENTITY
      // under the 1e-10 snap, so late detection (≤2 extra rounds) emits
      // a bit-identical vector at a third of the driver round-trips.
      // The penultimate round ALWAYS probes, so an early stop is
      // observable (lastIterations < iters) whenever a fixpoint exists
      // before the budget — the spec's invariant is structural, not an
      // artifact of where the 3-cadence lands (r15, AD advice).
      //
      // r16 (optimization): snapshots now run on the SAME cadence as
      // the probes instead of every round. Each eager localCheckpoint
      // is a driver-blocking job; chaining up to 3 lazy rounds into one
      // materialization cuts the per-query job count by ~2× while the
      // arithmetic (per-round 1e-10 snap inside the plan) is unchanged
      // — bit-identical output. The probe still compares round i to
      // round i-1: the PRE-probe round (`ranks`, one round behind
      // `next`) is re-derived inside the probe plan, never a 3-rounds-
      // apart compare (a k-apart delta=0 would not prove per-round
      // identity).
      val probing = (iter % 3 == 0 || iter == iters - 1) && iter < iters
      if (probing || iter == iters) {
        val nextSnap = ConnectedComponents.snapshot(next)
        if (probing) {
          val delta = nextSnap.join(ranks.select(col("node"), col("rank").as("prev")), Seq("node"))
            .agg(coalesce(sum(abs(col("rank") - col("prev"))), lit(0.0))).head.getDouble(0)
          fixpoint = delta == 0.0
        }
        // plain unpersist is a no-op for local checkpoints — release
        // the previous generation's blocks explicitly (shared CC
        // machinery)
        ConnectedComponents.release(snap)
        snap = nextSnap
        ranks = nextSnap
      } else ranks = next
    }
    lastIterations = iter
    // the loop exit always lands on a snapshot (the iter == iters and
    // fixpoint branches both materialize), so `ranks eq snap` here
    // final ranks (|nodes| rows) stays checkpointed for the caller to
    // consume; the working frames are released
    Seq(edges, nodes, deg).foreach(ConnectedComponents.release)
    ranks
  }

  /** HITS hubs & authorities over the directed trade graph (Kleinberg
    * 1999) — the bipartite-influence twin of PageRank: exporter
    * nations score as HUBS (they point at good authorities), importer
    * nations as AUTHORITIES (pointed at by good hubs). Fixed 8
    * mutual-reinforcement rounds, L1 normalization each half-step
    * (values are non-negative, so the L1 norm is a plain sum — no
    * sqrt, one less transcendental to agree on), every half-step
    * snapped to the 1e-10 grid exactly like PageRank so per-iteration
    * state is bit-identical across engines.
    *
    * Scale shape: each half-step is the same join-aggregate round
    * PageRank runs (scores ⋈ edges, groupBy the other endpoint, one
    * shuffle); the normalizer is a single-row aggregate broadcast back
    * as a cross join — no driver round trip inside the loop. Early
    * stop at an EXACT grid fixpoint of the hub vector: authorities are
    * a function of the previous hubs within the round, so hub-vector
    * equality makes every later round the identity — emitting early is
    * bit-identical to running all 8. */
  val hits: GraftOp = GraftOp(
    "graph_hits",
    {
      val base = """WITH edges AS (
        |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
        |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |    AND o_custkey = c_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND n1.n_nationkey <> n2.n_nationkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nc AS (SELECT count(*) AS n FROM nodes),
        |h0 AS (SELECT node,
        |  round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nc), 10) AS hub FROM nodes)""".stripMargin
      val iters = (1 to HitsIters).map { k =>
        s"""a${k}r AS MATERIALIZED (
           |  SELECT n.node, coalesce(sum(h.hub), 0) AS raw
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN h${k - 1} h ON h.node = e.src
           |  GROUP BY n.node),
           |a$k AS MATERIALIZED (
           |  SELECT node, round(raw / (SELECT sum(raw) FROM a${k}r), 10) AS auth FROM a${k}r),
           |h${k}r AS MATERIALIZED (
           |  SELECT n.node, coalesce(sum(a.auth), 0) AS raw
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.src = n.node
           |  LEFT JOIN a$k a ON a.node = e.dst
           |  GROUP BY n.node),
           |h$k AS MATERIALIZED (
           |  SELECT node, round(raw / (SELECT sum(raw) FROM h${k}r), 10) AS hub FROM h${k}r)""".stripMargin
      }.mkString(",\n", ",\n", "")
      s"""$base$iters
         |SELECT h.node, h.hub, a.auth
         |FROM h$HitsIters h JOIN a$HitsIters a ON h.node = a.node ORDER BY h.node""".stripMargin
    }) { (s, d) =>
    hitsFrom(tradeEdges(s, d), HitsIters).orderBy(col("node"))
  }

  /** Iterations the last [[hitsFrom]] actually ran (early-stop spec). */
  @volatile private[graft] var lastHitsIterations = 0

  /** The HITS loop over an arbitrary (src, dst) edge frame. One
    * L1-normalized half-step:
    * scores ⋈ edges → groupBy other endpoint → sum → ÷ total → snap. */
  private[graft] def hitsFrom(rawEdges: DataFrame, iters: Int): DataFrame = {
    val edges = ConnectedComponents.snapshot(rawEdges)
    val nodes = ConnectedComponents.snapshot(
      edges.select(col("src").as("node")).union(edges.select(col("dst"))).distinct())
    val n = nodes.count()

    // one half-step: fold `scores` (on `from`) across edges onto `to`.
    // NB (r16): a lazy probe-cadence variant of this loop was measured
    // SLOWER in-bench (1.22 → ~2.2 s min across 4 passes) — the probe
    // re-evaluated the un-materialized half-step chain (each half-step
    // carries a broadcast-total cross join) several times per
    // materialization point — and was reverted; eager per-half-step
    // snapshots stay.
    def halfStep(scores: DataFrame, from: String, to: String, outCol: String): DataFrame = {
      val raw = nodes
        .join(edges.withColumnRenamed(to, "node"), Seq("node"), "left")
        .join(scores.withColumnRenamed("node", from), Seq(from), "left")
        .groupBy(col("node"))
        .agg(coalesce(sum(col("score")), lit(0.0)).as("raw"))
      val total = raw.agg(sum(col("raw")).as("total"))
      ConnectedComponents.snapshot(
        raw.crossJoin(broadcast(total))
          .select(col("node"), round(col("raw") / col("total"), 10).as(outCol))
          .withColumnRenamed(outCol, "score"))
    }

    var hubs: DataFrame = ConnectedComponents.snapshot(
      nodes.select(col("node"), round(lit(1.0) / n, 10).as("score")))
    var auths: DataFrame = null
    var iter = 0
    var fixpoint = false
    while (iter < iters && !fixpoint) {
      val nextAuths = halfStep(hubs, from = "src", to = "dst", outCol = "auth")
      val nextHubs = halfStep(nextAuths, from = "dst", to = "src", outCol = "hub")
      val delta = nextHubs.select(col("node"), col("score").as("next"))
        .join(hubs.select(col("node"), col("score").as("prev")), Seq("node"))
        .agg(coalesce(sum(abs(col("next") - col("prev"))), lit(0.0))).head.getDouble(0)
      fixpoint = delta == 0.0
      ConnectedComponents.release(hubs)
      if (auths != null) ConnectedComponents.release(auths)
      hubs = nextHubs
      auths = nextAuths
      iter += 1
    }
    lastHitsIterations = iter
    val out = hubs.select(col("node"), col("score").as("hub"))
      .join(auths.select(col("node"), col("score").as("auth")), Seq("node"))
    Seq(edges, nodes).foreach(ConnectedComponents.release)
    out
  }

  /** Per-node triangle counts over the undirected trade graph — the
    * clustering-coefficient / community-density primitive.
    *
    * Scale shape: DEGREE ORIENTATION (Cohen 2009 / the MapReduce
    * triangle-counting standard). Each undirected edge is directed
    * from its lower to its higher endpoint in the (degree, name) total
    * order; wedges are enumerated only at each edge's SMALLER-degree
    * endpoint, so per-node wedge fan-out is bounded by O(√m) instead
    * of the max degree — the quadratic hub blowup a naive
    * neighbor-join suffers on power-law graphs never happens. Two
    * self-joins on the oriented edge list (wedge build + closing-edge
    * check), one explode, one count — every triangle found exactly
    * once. The oracle enumerates x<y<z lexicographically, which counts
    * the same triangles — the hash match proves orientation-invariance. */
  val triangles: GraftOp = GraftOp(
    "graph_triangles",
    """WITH e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |tri AS (
      |  SELECT a.u AS x, a.v AS y, b.v AS z
      |  FROM und a JOIN und b ON a.v = b.u JOIN und c ON c.u = a.u AND c.v = b.v),
      |m AS (SELECT unnest([x, y, z]) AS node FROM tri)
      |SELECT node, count(*) AS n_triangles FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
    val deg = und.select(col("u").as("node")).union(und.select(col("v")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient each edge toward the (deg, name)-larger endpoint
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tri = wedges.join(oriented.select(col("a"), col("b").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("node"))
  }

  /** Global transitivity (3·triangles / wedges) — the ONE-NUMBER
    * clustering summary next to [[clustering]]'s per-node coefficients
    * (mean local clustering and global transitivity diverge on skewed
    * graphs, which is exactly why both are reported). Runs on the
    * hash-sparsified graph (the [[closeness]] discipline — the full
    * trade graph is near-complete, transitivity ≡ 1): triangles via
    * the same degree-oriented wedge join as [[triangles]] (work
    * ∝ Σ deg², never node³), wedges Σ deg(deg−1)/2 from one degree
    * aggregate, both exact BIGINTs; the ratio is one deterministic
    * double divide. */
  val transitivity: GraftOp = GraftOp(
    "graph_transitivity",
    """WITH e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |tri AS (
      |  SELECT a.u AS x, a.v AS y, b.v AS z
      |  FROM und a JOIN und b ON a.v = b.u JOIN und c ON c.u = a.u AND c.v = b.v),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_tri FROM tri),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      |        GROUP BY 1),
      |w AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |             CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
      |e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
      |SELECT n_nodes, n_edges, n_tri AS n_triangles, n_wedges,
      |  CAST(3 * n_tri AS DOUBLE) / n_wedges AS transitivity
      |FROM t, w, e""".stripMargin) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // triangle count via the closed u<v<w form the oracle's tri CTE
    // states: und is already (min, max)-oriented, so a.v=b.u chains
    // x<y<z and the closing edge lookup is an equi join
    val tri = und.as("a")
      .join(und.as("b"), col("a.v") === col("b.u"))
      .join(und.as("c"), col("c.u") === col("a.u") && col("c.v") === col("b.v"))
      .agg(count(lit(1)).as("n_tri"))
    val w = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val e = und.agg(count(lit(1)).as("n_edges"))
    broadcast(tri).crossJoin(broadcast(w)).crossJoin(broadcast(e))
      .select(col("n_nodes"), col("n_edges"), col("n_tri").as("n_triangles"),
        col("n_wedges"),
        expr("CAST(3 * n_tri AS DOUBLE) / n_wedges").as("transitivity"))
  }

  /** Neighborhood Jaccard similarity — the classic link-prediction /
    * role-similarity primitive: for node pairs sharing at least one
    * neighbor, |N(a)∩N(b)| / |N(a)∪N(b)| over the hash-sparsified
    * trade graph (the full graph is near-complete — every Jaccard ≈ 1,
    * nothing to rank).
    *
    * Scale shape: the intersection is a WEDGE JOIN on the shared
    * neighbor (adjacency ⋈ adjacency on the middle node — one
    * co-partitioned shuffle, work ∝ Σ deg², the standard
    * common-neighbor enumeration), never an all-pairs set comparison;
    * the union comes free from broadcast degrees (|A∪B| = dA+dB−∩).
    * Jaccard is one ratio of exact small ints — deterministic, ordered
    * on the rounded score with a pair tiebreak. */
  val jaccard: GraftOp = GraftOp(
    "graph_jaccard", {
      s"""WITH e0 AS (
         |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
         |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
         |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |    AND o_custkey = c_custkey
         |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         |    AND n1.n_nationkey <> n2.n_nationkey),
         |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
         |e AS (SELECT u, v FROM und
         |  WHERE ${graft.functions.Exprs.sqlMd5Long("concat(u, '|', v)")} % 4 = 0),
         |nb AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
         |deg AS (SELECT x, count(*) AS d FROM nb GROUP BY 1),
         |wedge AS (
         |  SELECT a.x AS pa, b.x AS pb, count(*) AS n_common
         |  FROM nb a JOIN nb b ON a.y = b.y AND a.x < b.x
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT pa, pb, n_common, da.d + db.d - n_common AS n_union
         |  FROM wedge JOIN deg da ON pa = da.x JOIN deg db ON pb = db.x)
         |SELECT pa, pb, n_common, n_union,
         |  CAST(n_common AS DOUBLE) / n_union AS jaccard
         |FROM j ORDER BY jaccard DESC, pa, pb""".stripMargin
    }) { (s, d) =>
    val e = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val nb = e.select(col("u").as("x"), col("v").as("y"))
      .union(e.select(col("v").as("x"), col("u").as("y")))
    val deg = nb.groupBy(col("x")).agg(count(lit(1)).as("d"))
    val wedge = nb.as("a")
      .join(nb.as("b"), col("a.y") === col("b.y") && col("a.x") < col("b.x"))
      .groupBy(col("a.x").as("pa"), col("b.x").as("pb"))
      .agg(count(lit(1)).as("n_common"))
    wedge
      .join(broadcast(deg.select(col("x").as("pa"), col("d").as("da"))), Seq("pa"))
      .join(broadcast(deg.select(col("x").as("pb"), col("d").as("db"))), Seq("pb"))
      .select(col("pa"), col("pb"), col("n_common"),
        (col("da") + col("db") - col("n_common")).as("n_union"))
      .select(col("pa"), col("pb"), col("n_common"), col("n_union"),
        (col("n_common").cast("double") / col("n_union")).as("jaccard")) // r11: raw exact-int ratio
      .orderBy(col("jaccard").desc, col("pa"), col("pb"))
  }

  /** Label-propagation communities (Raghavan et al. 2007) over the
    * sparsified trade graph — the near-linear community detector
    * (PageRank ranks, k-core filters, LPA PARTITIONS). SYNCHRONOUS
    * rounds with a total-order tie-break ((count desc, label asc) —
    * asynchronous/random LPA is non-deterministic and could never be
    * oracle-checked), fixed 6 rounds: each round is one adjacency ⋈
    * labels join + a per-node majority argmax — the same
    * co-partitioned join-aggregate shape as the PageRank loop, with
    * the same snapshot/release generation lifecycle. The oracle
    * unrolls the 6 rounds as MATERIALIZED CTEs. */
  /** Shared oracle prefix for the LPA family: CTEs e0/und/e/nb/l0..lN
    * replicating the sampled undirected trade graph and the N
    * deterministic label-propagation rounds; enders compose FROM
    * l$LpaRounds / e / nb. */
  private def lpaCtes: String = {
    val base = s"""e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |e AS MATERIALIZED (SELECT u, v FROM und
      |  WHERE ${graft.functions.Exprs.sqlMd5Long("concat(u, '|', v)")} % 4 = 0),
      |nb AS MATERIALIZED (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
      |l0 AS MATERIALIZED (
      |  SELECT DISTINCT x AS node, x AS lbl FROM nb)""".stripMargin
    val rounds = (1 to LpaRounds).map { k =>
      s"""l$k AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT t.node, t.lbl,
         |      row_number() OVER (PARTITION BY t.node ORDER BY t.c DESC, t.lbl) AS rn
         |    FROM (
         |      SELECT nb.x AS node, l.lbl, count(*) AS c
         |      FROM nb JOIN l${k - 1} l ON l.node = nb.y
         |      GROUP BY 1, 2) t)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds
  }

  val lpa: GraftOp = GraftOp(
    "graph_lpa",
    s"""WITH $lpaCtes
       |SELECT node, lbl AS community FROM l$LpaRounds ORDER BY node""".stripMargin) { (s, d) =>
    val e = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    lpaFrom(e, LpaRounds).orderBy(col("node"))
  }
  /** The synchronous LPA loop over an undirected (u, v) edge frame. */
  private[graft] def lpaFrom(rawEdges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val edges = ConnectedComponents.snapshot(rawEdges)
    val nb = ConnectedComponents.snapshot(
      edges.select(col("u").as("x"), col("v").as("y"))
        .union(edges.select(col("v").as("x"), col("u").as("y"))))
    var snap: DataFrame = ConnectedComponents.snapshot(
      nb.select(col("x").as("node")).distinct().withColumn("lbl", col("node")))
    var labels: DataFrame = snap
    val byNode = W.partitionBy(col("node")).orderBy(col("c").desc, col("lbl"))
    // r16: rounds chain lazily and materialize every 3rd (each round
    // reads `labels` exactly ONCE, so the lazy plan grows linearly —
    // the snapshot cadence bounds lineage depth for cluster-scale
    // recovery while cutting the per-query job count ~3×; the
    // per-round arithmetic is unchanged)
    (1 to rounds).foreach { r =>
      val next = nb.join(labels.select(col("node").as("y"), col("lbl")), Seq("y"))
        .groupBy(col("x").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(byNode))
        .filter(col("rn") === 1)
        .select(col("node"), col("lbl"))
      if (r % 3 == 0 || r == rounds) {
        val nextSnap = ConnectedComponents.snapshot(next)
        ConnectedComponents.release(snap)
        snap = nextSnap
        labels = nextSnap
      } else labels = next
    }
    Seq(edges, nb).foreach(ConnectedComponents.release)
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** k-core decomposition (k=4) by iterative peeling over the
    * deterministically sparsified trade graph — the community-density /
    * graph-cleaning primitive (keep only nodes with ≥k neighbors that
    * themselves survive). The dense trade graph is sparsified to ~¼ of
    * its edges with the portable edge hash (md5(u|v) % 4 = 0 — a
    * pseudo-random but engine-independent subgraph; the FULL graph's
    * 4-core is trivially everything), which makes the peel cascade for
    * real: removing a weak node drops neighbors below k in later
    * rounds.
    *
    * Scale shape: each round is one degree aggregation + two
    * semi-joins against the surviving-node set — the standard
    * distributed k-core round (O(cores·E) total) — with the same
    * snapshot/release generation lifecycle the other iterative ops
    * use; rounds are bounded by the peel depth, not |V|. Fixpoint is
    * detected on the induced-edge COUNT (any removed node removes at
    * least one edge, so equal counts ⇔ no node was removed). The
    * oracle unrolls 12 peel rounds as chained CTEs — more than the
    * observed depth at every SF; extra rounds past the fixpoint are
    * the identity, so over-unrolling is always safe. */
  val kcore: GraftOp = GraftOp(
    "graph_kcore", {
      val base = s"""WITH e0 AS (
        |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
        |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |    AND o_custkey = c_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND n1.n_nationkey <> n2.n_nationkey),
        |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
        |e AS MATERIALIZED (SELECT u, v FROM und
        |  WHERE ${graft.functions.Exprs.sqlMd5Long("concat(u, '|', v)")} % 4 = 0),
        |r1 AS MATERIALIZED (
        |  SELECT node FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node HAVING count(*) >= 4)""".stripMargin
      def induced(prev: String) =
        s"""SELECT e.u AS node FROM e JOIN $prev a ON e.u = a.node JOIN $prev b ON e.v = b.node
           |    UNION ALL
           |    SELECT e.v FROM e JOIN $prev a ON e.u = a.node JOIN $prev b ON e.v = b.node""".stripMargin
      val rounds = (2 to 12).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT node FROM (
           |    ${induced(s"r${i - 1}")})
           |  GROUP BY node HAVING count(*) >= 4)""".stripMargin
      }.mkString(",\n", ",\n", "")
      s"""$base$rounds
         |SELECT node, count(*) AS core_deg FROM (
         |    ${induced("r12")})
         |GROUP BY node ORDER BY node""".stripMargin
    }) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    kcoreFrom(und, 4)
  }

  /** The peel loop over an arbitrary undirected (u, v) edge frame. */
  private[graft] def kcoreFrom(rawEdges: DataFrame, k: Int): DataFrame = {
    var edges = ConnectedComponents.snapshot(rawEdges)
    var nEdges = edges.count()
    var fixpoint = false
    while (!fixpoint && nEdges > 0) {
      val deg = edges.select(col("u").as("node")).union(edges.select(col("v")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      val next = ConnectedComponents.snapshot(
        edges
          .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .select(col("u"), col("v")))
      val nNext = next.count()
      fixpoint = nNext == nEdges
      ConnectedComponents.release(edges)
      edges = next
      nEdges = nNext
    }
    // the final generation stays checkpointed for the caller to consume
    // (same contract as pagerankFrom's final ranks); working generations
    // were released each round above
    edges.select(col("u").as("node")).union(edges.select(col("v")))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
      .orderBy(col("node"))
  }

  /** Iterations the last [[bfsFrom]] actually ran — test-visible (the
    * early-stop spec pins it at the source eccentricity + 1). */
  @volatile private[graft] var lastBfsIterations = 0

  /** Single-source BFS over an arbitrary (src, dst) edge frame — the
    * frontier-expansion loop every Pregel-style engine runs: each
    * round joins the CURRENT frontier (not the full distance table)
    * against edges, anti-joins out already-visited nodes, and stops
    * the moment a frontier comes back empty (≤ eccentricity + 1
    * rounds, never maxIters on a reachable graph). First-visit =
    * minimal hops by BFS invariant, so no min() re-aggregation is
    * ever needed. Per-round frames go through
    * [[ConnectedComponents.snapshot]] (eager localCheckpoint /
    * reliable checkpoint) so lineage stays flat at depth — the same
    * hygiene as [[pagerankFrom]]; each shuffle carries only the
    * frontier × edges, the scale shape of billion-edge BFS. */
  private[graft] def bfsFrom(rawEdges: DataFrame, source: String, maxIters: Int = 30): DataFrame = {
    val edges = ConnectedComponents.snapshot(rawEdges)
    var dist = ConnectedComponents.snapshot(
      edges.sparkSession.range(1)
        .select(lit(source).as("node"), lit(0).as("hops")))
    var frontier = dist
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      iter += 1
      val next = ConnectedComponents.snapshot(
        frontier.join(edges, frontier("node") === edges("src"))
          .select(col("dst").as("node")).distinct()
          .join(dist.select(col("node")), Seq("node"), "left_anti")
          .select(col("node"), lit(iter).as("hops")))
      if (next.isEmpty) {
        done = true
        ConnectedComponents.release(next)
      } else {
        // r16: dist is a UNION of materialized frontier layers — the
        // old per-round merged re-snapshot copied the whole distance
        // table each round (a job + O(depth²) block writes) purely to
        // keep one handle; a union of checkpointed layers already has
        // flat lineage, and the layers ARE the result
        dist = dist.unionAll(next)
        frontier = next
      }
    }
    lastBfsIterations = iter
    ConnectedComponents.release(edges)
    dist
  }

  /** BFS hop distances from the lexicographically-first nation over
    * the trade graph — "how many trade hops away is every reachable
    * market". The oracle states the same frontier semantics as a
    * WITH RECURSIVE UNION (set-dedup) expansion with min(hops) over
    * the accumulated rows; the engine's first-visit loop never
    * re-visits, so the two agree exactly. */
  val bfs: GraftOp = GraftOp(
    "graph_bfs",
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |bfs AS (
      |  SELECT (SELECT min(node) FROM nodes) AS node, 0 AS hops
      |  UNION
      |  SELECT e.dst, b.hops + 1 FROM bfs b JOIN edges e ON e.src = b.node
      |  WHERE b.hops < 30)
      |SELECT node, CAST(min(hops) AS INT) AS hops FROM bfs
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val edges = tradeEdges(s, d)
    // 25-nation node set: a one-row aggregate, bounded by schema
    val source = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst")))
      .agg(min(col("node"))).head.getString(0)
    bfsFrom(edges, source).orderBy(col("node"))
  }

  /** Max route legs for [[cheapestRoute]] — a "max stops" routing
    * constraint, and what keeps the oracle's recursive expansion
    * bounded. Bellman-Ford with k rounds is EXACTLY min-cost over
    * paths of ≤ k edges, so both engines state the same semantics. */
  private val RouteLegs = 4

  /** Cheapest ≤4-leg trade route from the lexicographically-first
    * nation — graph_bfs upgraded to weighted min-plus: lane cost =
    * floor(mean ship-delay days) per (src,dst) nation pair (integer:
    * BIGINT day-diff sum div line count; delays are non-negative so
    * div and // agree), route cost = sum of lane costs, minimized over
    * routes with at most [[RouteLegs]] legs. Engine shape: k rounds of
    * (dist ⋈ edges) + min-aggregate — the distance frame never exceeds
    * |nations| rows while the oracle enumerates whole paths; weights
    * stay exact BIGINTs end to end. */
  val cheapestRoute: GraftOp = GraftOp(
    "graph_cheapest_route",
    """WITH RECURSIVE edges AS (
      |  SELECT n1.n_name AS src, n2.n_name AS dst,
      |    CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))
      |      * 1 // count(*) AS BIGINT) AS w
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey
      |  GROUP BY 1, 2),
      |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |r AS (
      |  SELECT (SELECT min(node) FROM nodes) AS node, CAST(0 AS BIGINT) AS cost, 0 AS legs
      |  UNION
      |  SELECT e.dst, r.cost + e.w, r.legs + 1
      |  FROM r JOIN edges e ON e.src = r.node WHERE r.legs < 4)
      |SELECT node, CAST(min(cost) AS BIGINT) AS cost FROM r
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val edges = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("nk1"), col("n_name").as("src"))),
        col("s_nationkey") === col("nk1"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("nk2"), col("n_name").as("dst"))),
        col("c_nationkey") === col("nk2"))
      .filter(col("nk1") =!= col("nk2"))
      .groupBy(col("src"), col("dst"))
      .agg(expr("sum(datediff(to_date(l_shipdate), to_date(o_orderdate))) div count(*)").as("w"))
    // r16: materialize the lane-cost edge list FIRST and derive the
    // source from it — the old order ran the 4-way fact join TWICE
    // (once for the one-row source aggregate, once for the snapshot).
    val e = ConnectedComponents.snapshot(edges)
    // 25-nation node set: a one-row aggregate, bounded by schema
    val source = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst")))
      .agg(min(col("node"))).head.getString(0)
    // r16: the k Bellman-Ford rounds chain LAZILY into one
    // materialization — with ≤|nations| rows per round and a
    // checkpointed edge list, four relax rounds are a small fixed plan,
    // and each eager per-round localCheckpoint was a driver-blocking
    // job. Arithmetic is unchanged (exact BIGINT min-plus).
    var dist: DataFrame = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("cost"))
    for (leg <- 1 to RouteLegs) {
      // fresh per-round aliases: `e` appears once per chained round, so
      // unaliased column refs would be ambiguous self-join references
      val ei = e.select(col("src").as(s"src_$leg"), col("dst").as(s"dst_$leg"),
        col("w").as(s"w_$leg"))
      val relaxed = dist.join(ei, col("node") === col(s"src_$leg"))
        .select(col(s"dst_$leg").as("node"), (col("cost") + col(s"w_$leg")).as("cost"))
      dist = dist.unionAll(relaxed).groupBy(col("node")).agg(min(col("cost")).as("cost"))
    }
    val out = ConnectedComponents.snapshot(dist)
    ConnectedComponents.release(e)
    out.orderBy(col("node"))
  }

  /** Directed-graph reciprocity — what share of trade lanes flow both
    * ways (the symmetry diagnostic read before choosing directed vs
    * undirected algorithms; near-1 means HITS ≈ PageRank here): one
    * self-equi-join of the dimension-bounded edge set on the swapped
    * key pair, three exact integers + a ppm floor in one row. */
  val reciprocity: GraftOp = GraftOp(
    "graph_reciprocity",
    """WITH edges AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey)
      |SELECT CAST(count(*) AS BIGINT) AS n_edges,
      |  CAST(sum(CASE WHEN EXISTS (
      |    SELECT 1 FROM edges r WHERE r.src = e.dst AND r.dst = e.src)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocated,
      |  CAST(sum(CASE WHEN EXISTS (
      |    SELECT 1 FROM edges r WHERE r.src = e.dst AND r.dst = e.src)
      |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS reciprocity_ppm
      |FROM edges e""".stripMargin) { (s, d) =>
    val e = tradeEdges(s, d)
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val marked = e.join(rev, Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocated"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(marked) // two one-row aggregates
      .select(col("n_edges"), col("n_reciprocated"),
        expr("n_reciprocated * 1000000 div n_edges").as("reciprocity_ppm"))
  }

  /** Log₂-binned degree distribution of the customer↔part purchase
    * graph — the first diagnostic run on ANY large graph (is it
    * power-law? where does the heavy tail start? what hub size must
    * the skew-join planning survive?). Bipartite degrees: distinct
    * parts per customer and distinct customers per part. The bin is
    * length(bin(deg)) = ⌊log₂ deg⌋+1 — INTEGER via the binary-string
    * length, no runtime log to diverge on. One distinct pair shuffle
    * + two key-local aggregates; output is ≤2·64 bins regardless of
    * corpus size. */
  val degreeDist: GraftOp = GraftOp(
    "graph_degree_dist",
    """WITH cp AS (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |d AS (
      |  SELECT 'customer' AS side, c AS node, count(*) AS deg FROM cp GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'part' AS side, p AS node, count(*) AS deg FROM cp GROUP BY 1, 2)
      |SELECT side, CAST(length(bin(deg)) AS INT) AS log2_bin,
      |  count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val cp = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val deg = cp.groupBy(col("c")).agg(count(lit(1)).as("deg"))
      .select(lit("customer").as("side"), col("deg"))
      .unionAll(cp.groupBy(col("p")).agg(count(lit(1)).as("deg"))
        .select(lit("part").as("side"), col("deg")))
    deg
      .groupBy(col("side"), length(bin(col("deg"))).cast("int").as("log2_bin"))
      .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"))
      .orderBy(col("side"), col("log2_bin"))
  }

  /** Local clustering coefficient per node — "how clique-like is each
    * node's neighborhood" (2·T(v) / deg(v)·(deg(v)−1)), the standard
    * small-world / community-structure readout next to
    * [[triangles]]'s raw counts. Same degree-oriented wedge join (work
    * ∝ Σ deg², never all-pairs); the coefficient is one double
    * division over two exact integers. Nodes of degree < 2 are
    * excluded (coefficient undefined). */
  val clustering: GraftOp = GraftOp(
    "graph_clustering",
    """WITH e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY 1),
      |tri AS (
      |  SELECT a.u AS x, a.v AS y, b.v AS z
      |  FROM und a JOIN und b ON a.v = b.u JOIN und c ON c.u = a.u AND c.v = b.v),
      |t AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri
      |  FROM (SELECT unnest([x, y, z]) AS node FROM tri) GROUP BY 1)
      |SELECT deg.node, deg.deg, coalesce(t.n_tri, 0) AS n_triangles,
      |  2.0 * coalesce(t.n_tri, 0) / (CAST(deg.deg AS DOUBLE) * (deg.deg - 1))
      |    AS clustering
      |FROM deg LEFT JOIN t ON deg.node = t.node
      |WHERE deg.deg >= 2 ORDER BY deg.node""".stripMargin) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tri = wedges.join(oriented.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val t = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(t, Seq("node"), "left")
      .filter(col("deg") >= 2)
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        expr("2.0D * coalesce(n_tri, 0) / (CAST(deg AS DOUBLE) * (deg - 1))") // r11: raw
          .as("clustering"))
      .orderBy(col("node"))
  }

  /** Degree assortativity of the undirected trade graph — does a
    * well-connected market trade with other hubs (r > 0) or with the
    * periphery (r < 0)? Newman's edge-end Pearson over both
    * orientations of every edge: all five cross-row sums fold in
    * DECIMAL(38)/HUGEINT and the Pearson numerator/denominator
    * m2·sjk − sj² / m2·sjj − sj² are assembled EXACTLY in the same
    * type (r10), so the coefficient is one raw deterministic double
    * division. Degrees join onto edges broadcast — one pass, no
    * iteration. */
  val assortativity: GraftOp = GraftOp(
    "graph_assortativity",
    """WITH e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY 1),
      |pairs AS (
      |  SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und),
      |jk AS (
      |  SELECT da.deg AS j, db.deg AS k
      |  FROM pairs JOIN deg da ON pairs.a = da.node JOIN deg db ON pairs.b = db.node),
      |g AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS m2,
      |    CAST(sum(CAST(j AS HUGEINT)) AS HUGEINT) AS sj,
      |    CAST(sum(CAST(j AS HUGEINT) * k) AS HUGEINT) AS sjk,
      |    CAST(sum(CAST(j AS HUGEINT) * j) AS HUGEINT) AS sjj
      |  FROM jk)
      |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
      |  CAST(m2 * sjk - sj * sj AS DOUBLE)
      |    / CAST(m2 * sjj - sj * sj AS DOUBLE) AS assortativity
      |FROM g""".stripMargin) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val pairs = und.select(col("u").as("a"), col("v").as("b"))
      .unionAll(und.select(col("v"), col("u")))
    val jk = pairs
      .join(broadcast(deg.select(col("node").as("a"), col("deg").as("j"))), Seq("a"))
      .join(broadcast(deg.select(col("node").as("b"), col("deg").as("k"))), Seq("b"))
    jk.agg(count(lit(1)).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("m2"),
        sum(col("j").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sj"),
        sum(col("j").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("k")).as("sjk"),
        sum(col("j").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("j")).as("sjj"))
      .select(expr("CAST(m2 div 2 AS BIGINT)").as("n_edges"),
        expr("""CAST(m2 * sjk - sj * sj AS DOUBLE)
          | / CAST(m2 * sjj - sj * sj AS DOUBLE)""".stripMargin)
          .as("assortativity"))
  }

  /** Closeness centrality of every node — (reachable−1) / Σ hops with
    * the standard connected-component normalization ((r−1)/(n−1)
    * scaling), via ALL-SOURCES BFS: the single-source frontier loop
    * run with a (root, node) composite frontier, so one round expands
    * EVERY root's frontier in the same co-partitioned join (rounds =
    * graph diameter, not diameter × |roots|). Runs on the
    * hash-sparsified UNDIRECTED graph (the [[jaccard]] discipline —
    * the full trade graph is complete, every closeness would be the
    * vacuous 1.0). The oracle states the same semantics as a recursive
    * closure with min(hops) per (root, node). Node-bounded on the
    * nation graph; on a billion-node graph the same loop runs
    * landmark-sampled roots. */
  val closeness: GraftOp = GraftOp(
    "graph_closeness",
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |edges AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
      |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |nc AS (SELECT CAST(count(DISTINCT node) AS BIGINT) AS n FROM nodes),
      |walk AS (
      |  SELECT node AS root, node, 0 AS hops FROM nodes
      |  UNION
      |  SELECT w.root, e.dst, w.hops + 1
      |  FROM walk w JOIN edges e ON e.src = w.node
      |  WHERE w.hops < 30),
      |d AS (
      |  SELECT root, node, CAST(min(hops) AS BIGINT) AS hops
      |  FROM walk GROUP BY 1, 2),
      |agg AS (
      |  SELECT root, CAST(count(*) - 1 AS BIGINT) AS reached,
      |    CAST(sum(hops) AS BIGINT) AS tot
      |  FROM d GROUP BY 1)
      |SELECT root AS node, reached, tot AS sum_hops,
      |  CAST(reached AS DOUBLE) * reached / (tot * (CAST(n AS DOUBLE) - 1))
      |    AS closeness
      |FROM agg, nc WHERE tot > 0 ORDER BY node""".stripMargin) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val edges = ConnectedComponents.snapshot(
      und.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(und.select(col("v"), col("u"))))
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst"))).distinct()
    // materialize |V| NOW — the final select runs after release(edges),
    // when a lazy plan over the checkpointed edge frame can no longer read
    val nGraph = nodes.count()
    var dist = ConnectedComponents.snapshot(
      nodes.select(col("node").as("root"), col("node"), lit(0L).as("hops")))
    var frontier = dist
    var iter = 0
    var done = false
    // r16: `dist` is a UNION of materialized frontier layers instead of
    // a re-snapshotted copy per round — the old merged-copy job
    // re-materialized the whole distance table every round (O(diameter²)
    // block writes) purely to keep one handle. A union of checkpointed
    // layers has flat lineage already; layers stay alive for the final
    // aggregate (they ARE the result) and drop with the frame refs.
    while (iter < 30 && !done) {
      iter += 1
      val next = ConnectedComponents.snapshot(
        frontier.join(edges, frontier("node") === edges("src"))
          .select(col("root"), col("dst").as("node")).distinct()
          .join(dist.select(col("root"), col("node")), Seq("root", "node"), "left_anti")
          .select(col("root"), col("node"), lit(iter.toLong).as("hops")))
      if (next.isEmpty) {
        done = true
        ConnectedComponents.release(next)
      } else {
        dist = dist.unionAll(next)
        frontier = next
      }
    }
    ConnectedComponents.release(edges)
    dist.groupBy(col("root"))
      .agg((count(lit(1)) - 1).as("reached"), sum(col("hops")).as("tot"))
      .filter(col("tot") > 0)
      .withColumn("n", lit(nGraph))
      .select(col("root").as("node"), col("reached"), col("tot").as("sum_hops"),
        expr("CAST(reached AS DOUBLE) * reached / (tot * (CAST(n AS DOUBLE) - 1))") // r11: raw
          .as("closeness"))
      .orderBy(col("node"))
  }

  /** Personalized PageRank from a single seed nation (teleport mass
    * returns to the SEED instead of spreading uniformly) — the
    * "influence relative to X" / seeded-recommendation variant.
    * Identical loop shape to [[pagerank]] (ranks ⋈ edges on src,
    * groupBy dst, one shuffle per round, 1e-10 grid snap per round →
    * exact-fixpoint early stop stays bit-identical to the fixed
    * 10-round oracle); only the teleport vector changes, so the
    * 100-TB story is the same join-aggregate round. Dangling mass is
    * dropped, matching [[pagerank]]'s stated semantics. */
  val ppr: GraftOp = GraftOp(
    "graph_ppr",
    {
      val seed = "NATION_0"
      val base = s"""WITH edges AS (
        |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
        |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |    AND o_custkey = c_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND n1.n_nationkey <> n2.n_nationkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |p0 AS (SELECT node,
        |  CASE WHEN node = '$seed' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank
        |  FROM nodes)""".stripMargin
      val iters = (1 to Iters).map { k =>
        s"""p$k AS (
           |  SELECT n.node,
           |    round(CASE WHEN n.node = '$seed' THEN CAST(${1 - Damping} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
           |      + CAST($Damping AS DOUBLE) * coalesce(sum(p.rank / d.outdeg), 0), 10) AS rank
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN p${k - 1} p ON p.node = e.src
           |  LEFT JOIN deg d ON d.src = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      s"$base$iters\nSELECT node, rank FROM p$Iters ORDER BY rank DESC, node"
    }) { (s, d) =>
    val seed = "NATION_0"
    val edges = ConnectedComponents.snapshot(tradeEdges(s, d))
    val nodes = ConnectedComponents.snapshot(
      edges.select(col("src").as("node")).union(edges.select(col("dst"))).distinct())
    val deg = ConnectedComponents.snapshot(
      edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val teleport = when(col("node") === seed, lit(1.0 - Damping)).otherwise(lit(0.0))
    // NB (r16): a lazy probe-cadence variant (3 chained rounds per
    // materialization) measured slower in-bench here and was reverted —
    // see pagerankFrom, where the same cadence IS kept (flat there;
    // the PPR teleport round carries a max() aggregate that made the
    // re-derived probe chain pricier).
    var ranks: DataFrame = ConnectedComponents.snapshot(
      nodes.select(col("node"),
        when(col("node") === seed, lit(1.0)).otherwise(lit(0.0)).as("rank")))
    var iter = 0
    var fixpoint = false
    while (iter < Iters && !fixpoint) {
      val next = ConnectedComponents.snapshot(nodes
        .join(edges.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"), "left")
        .join(deg, Seq("src"), "left")
        .groupBy(col("node"))
        .agg(round(max(teleport) +
          lit(Damping) * coalesce(sum(col("rank") / col("outdeg")), lit(0.0)), 10).as("rank")))
      iter += 1
      // fixpoint probe every 3rd round (see pagerankFrom — identity
      // rounds under the grid snap make late detection bit-identical)
      if (iter % 3 == 0 && iter < Iters) {
        val delta = next.join(ranks.select(col("node"), col("rank").as("prev")), Seq("node"))
          .agg(coalesce(sum(abs(col("rank") - col("prev"))), lit(0.0))).head.getDouble(0)
        fixpoint = delta == 0.0
      }
      ConnectedComponents.release(ranks)
      ranks = next
    }
    Seq(edges, nodes, deg).foreach(ConnectedComponents.release)
    ranks.orderBy(col("rank").desc, col("node"))
  }

  /** Strongly-connected component of a pivot node (forward-backward /
    * FW-BW): SCC(pivot) = forward-reachable ∩ backward-reachable —
    * the DIRECTED-cycle membership question the undirected CC family
    * can't answer (mutual trade dependency, not mere contact). Two
    * [[bfsFrom]] frontier loops (the second over reversed edges — a
    * projection, not a new derivation), one |V|-bounded join; rounds =
    * diameter each. Emits each member with both hop distances. The
    * oracle runs the two recursive closures with min(hops) per node
    * (min is dedup-insensitive — the §6 WITH RECURSIVE UNION gotcha)
    * and joins them. */
  val sccPivot: GraftOp = GraftOp(
    "graph_scc_pivot",
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |fwd AS (
      |  SELECT (SELECT min(node) FROM nodes) AS node, 0 AS hops
      |  UNION
      |  SELECT e.dst, f.hops + 1 FROM fwd f JOIN edges e ON e.src = f.node
      |  WHERE f.hops < 30),
      |bwd AS (
      |  SELECT (SELECT min(node) FROM nodes) AS node, 0 AS hops
      |  UNION
      |  SELECT e.src, b.hops + 1 FROM bwd b JOIN edges e ON e.dst = b.node
      |  WHERE b.hops < 30),
      |f2 AS (SELECT node, CAST(min(hops) AS INT) AS fwd_hops FROM fwd GROUP BY 1),
      |b2 AS (SELECT node, CAST(min(hops) AS INT) AS bwd_hops FROM bwd GROUP BY 1)
      |SELECT f2.node AS node, f2.fwd_hops, b2.bwd_hops
      |FROM f2 JOIN b2 ON f2.node = b2.node
      |ORDER BY node""".stripMargin) { (s, d) =>
    val edges = tradeEdges(s, d)
    val pivot = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst")))
      .agg(min(col("node"))).head.getString(0)
    val fwd = bfsFrom(edges, pivot)
      .select(col("node"), col("hops").cast(org.apache.spark.sql.types.IntegerType).as("fwd_hops"))
    val bwd = bfsFrom(edges.select(col("dst").as("src"), col("src").as("dst")), pivot)
      .select(col("node"), col("hops").cast(org.apache.spark.sql.types.IntegerType).as("bwd_hops"))
    fwd.join(bwd, "node").orderBy(col("node"))
  }

  /** Adamic-Adar link prediction on the sampled undirected trade graph
    * — the frequency-weighted refinement of graph_jaccard: a shared
    * RARE partner (low degree) is stronger evidence of a future link
    * than a shared hub, so each common neighbor w contributes
    * 1/ln(deg(w)) instead of 1. Cross-engine determinism: the per-
    * neighbor weight is FLOOR-SNAPPED to exact micro units
    * (⌊10⁶/ln(d)⌋ — d is a small integer and 10⁶/ln(d) is irrational,
    * so the 1-ulp Java-vs-glibc ln divergence can never straddle the
    * floor), making the per-pair score an exact BIGINT sum — order-free
    * — with one division at emit. deg(w) ≥ 2 for every common neighbor
    * by construction, so ln never sees 1. Same wedge shuffle as
    * jaccard: pairs are born grouped, never enumerated per-edge. */
  val adamicAdar: GraftOp = GraftOp(
    "graph_adamic_adar", {
      s"""WITH e0 AS (
         |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
         |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
         |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |    AND o_custkey = c_custkey
         |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         |    AND n1.n_nationkey <> n2.n_nationkey),
         |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
         |e AS (SELECT u, v FROM und
         |  WHERE ${graft.functions.Exprs.sqlMd5Long("concat(u, '|', v)")} % 4 = 0),
         |nb AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
         |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY 1),
         |wedge AS (
         |  SELECT a.x AS pa, b.x AS pb,
         |    CAST(count(*) AS BIGINT) AS n_common,
         |    CAST(sum(CAST(floor(1000000.0 / ln(CAST(dw.d AS DOUBLE))) AS BIGINT)) AS BIGINT)
         |      AS aa_micro
         |  FROM nb a JOIN nb b ON a.y = b.y AND a.x < b.x
         |  JOIN deg dw ON dw.x = a.y
         |  GROUP BY 1, 2)
         |SELECT pa, pb, n_common,
         |  CAST(aa_micro AS DOUBLE) / 1000000.0 AS adamic_adar
         |FROM wedge ORDER BY adamic_adar DESC, pa, pb""".stripMargin
    }) { (s, d) =>
    val e = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val nb = e.select(col("u").as("x"), col("v").as("y"))
      .union(e.select(col("v").as("x"), col("u").as("y")))
    val deg = nb.groupBy(col("x")).agg(count(lit(1)).as("d"))
    nb.as("a")
      .join(nb.as("b"), col("a.y") === col("b.y") && col("a.x") < col("b.x"))
      .join(broadcast(deg.select(col("x").as("w"), col("d").as("dw"))),
        col("a.y") === col("w"))
      .groupBy(col("a.x").as("pa"), col("b.x").as("pb"))
      .agg(count(lit(1)).as("n_common"),
        sum(expr("CAST(floor(1000000.0 / ln(CAST(dw AS DOUBLE))) AS BIGINT)"))
          .cast("long").as("aa_micro"))
      .select(col("pa"), col("pb"), col("n_common"),
        expr("CAST(aa_micro AS DOUBLE) / 1000000.0").as("adamic_adar"))
      .orderBy(col("adamic_adar").desc, col("pa"), col("pb"))
  }

  /** Newman modularity of the LPA communities — the quality readout
    * that tells you whether graph_lpa's labels MEAN anything (Q≈0:
    * no better than random; Q>0.3: strong structure). Emitted PER
    * COMMUNITY (the q_anova discipline — no cross-engine double fold;
    * the caller sums k rows for Q): intra-edge count e_c, degree sum
    * d_c and m are exact BIGINTs off the same sampled undirected
    * graph, and each community's term e_c/m − (d_c/2m)² is one
    * shared-text double formula. Oracle reuses the LPA CTE chain
    * verbatim, so label assignment is bit-identical by construction. */
  val modularity: GraftOp = GraftOp(
    "graph_modularity",
    s"""WITH $lpaCtes,
       |lab AS (SELECT node, lbl FROM l$LpaRounds),
       |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS dx FROM nb GROUP BY 1),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
       |ie AS (
       |  SELECT la.lbl AS community, CAST(count(*) AS BIGINT) AS intra
       |  FROM e JOIN lab la ON la.node = e.u
       |  JOIN lab lb ON lb.node = e.v AND la.lbl = lb.lbl
       |  GROUP BY 1),
       |dc AS (
       |  SELECT lab.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(deg.dx) AS BIGINT) AS degree_sum
       |  FROM lab JOIN deg ON deg.x = lab.node GROUP BY 1)
       |SELECT dc.community, dc.n_nodes,
       |  CAST(coalesce(ie.intra, 0) AS BIGINT) AS intra_edges, dc.degree_sum,
       |  round(CAST(coalesce(ie.intra, 0) AS DOUBLE) / m.m
       |      - (CAST(dc.degree_sum AS DOUBLE) / (2.0 * m.m))
       |      * (CAST(dc.degree_sum AS DOUBLE) / (2.0 * m.m)), 6) AS q_term
       |FROM dc LEFT JOIN ie USING (community), m
       |ORDER BY dc.community""".stripMargin) { (s, d) =>
    val e = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val lab = lpaFrom(e, LpaRounds)
    val nb = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
    val deg = nb.groupBy(col("x")).agg(count(lit(1)).as("dx"))
    val m = broadcast(e.agg(count(lit(1)).as("m")))
    val ie = e
      .join(lab.select(col("node").as("u"), col("community").as("lu")), "u")
      .join(lab.select(col("node").as("v"), col("community").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community")).agg(count(lit(1)).as("intra"))
    val dc = lab.join(deg, col("node") === col("x"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("dx")).as("degree_sum"))
    dc.join(ie, Seq("community"), "left").crossJoin(m)
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra"), lit(0L)).as("intra_edges"), col("degree_sum"),
        expr("""round(CAST(coalesce(intra, 0) AS DOUBLE) / m
          |    - (CAST(degree_sum AS DOUBLE) / (2.0 * m))
          |    * (CAST(degree_sum AS DOUBLE) / (2.0 * m)), 6)""".stripMargin).as("q_term"))
      .orderBy(col("community"))
  }

  /** Per-EDGE triangle support (r8) — the k-truss primitive
    * [[triangles]] (per-node counts) cannot give: an edge's support is
    * the number of triangles that contain it, the quantity truss
    * decomposition prunes on and the strongest simple signal for
    * "is this tie embedded in a community or a bridge?" (support 0 on
    * a well-connected graph is exactly a local bridge — the
    * complement of [[clustering]]'s node view). Reuses the shared
    * degree-oriented triangle enumeration (each triangle found once,
    * O(√m) wedge bound), canonicalizes each triangle's three edges
    * with least/greatest, and LEFT-joins the full undirected edge
    * list so zero-support bridges emit too. The edge frame is
    * nation-level — bounded by |nations|² regardless of corpus size —
    * so the emit is ≤300 rows at any SF; the oracle enumerates
    * x<y<z lexicographically (the orientation-invariance contract the
    * triangles hash already proves). */
  val edgeSupport: GraftOp = GraftOp(
    "graph_edge_support",
    """WITH e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |tri AS (
      |  SELECT a.u AS x, a.v AS y, b.v AS z
      |  FROM und a JOIN und b ON a.v = b.u JOIN und c ON c.u = a.u AND c.v = b.v),
      |te AS (
      |  SELECT x AS u, y AS v FROM tri
      |  UNION ALL SELECT x, z FROM tri
      |  UNION ALL SELECT y, z FROM tri),
      |sup AS (SELECT u, v, CAST(count(*) AS BIGINT) AS support FROM te GROUP BY 1, 2)
      |SELECT und.u, und.v,
      |  CAST(coalesce(sup.support, 0) AS BIGINT) AS support,
      |  coalesce(sup.support, 0) > 0 AS in_triangle
      |FROM und LEFT JOIN sup USING (u, v) ORDER BY u, v""".stripMargin) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
    val deg = und.select(col("u").as("node")).union(und.select(col("v")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tri = wedges.join(oriented.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val triEdges = tri.select(explode(array(
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
        struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v")),
        struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v"))))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val sup = triEdges.groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
    und.join(sup, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).cast(org.apache.spark.sql.types.LongType).as("support"),
        (coalesce(col("support"), lit(0L)) > 0).as("in_triangle"))
      .orderBy(col("u"), col("v"))
  }

  /** Exact shortest-path betweenness centrality — the broker/bridge
    * ranking closeness and degree cannot give (a node can be central
    * to FLOW while being neither near everything nor high-degree).
    * Runs on the hash-sparsified undirected graph (the [[closeness]]
    * discipline — the full trade graph is near-complete and every
    * betweenness would be ~0).
    *
    * Both engines count shortest paths exactly: the all-sources BFS
    * of [[closeness]] extended to carry σ (the number of shortest
    * paths root→node — frontier expansion SUMS σ over same-level
    * predecessors instead of deduplicating), then the pair-dependency
    * form BC(v) = Σ_{s<t} σ_sv·σ_vt/σ_st over the triple join with
    * d(s,v)+d(v,t)=d(s,t). Each term is FLOOR-SNAPPED to exact micro
    * units via integral division (the q_cramers_v trick: σ products
    * are small exact BIGINTs), so the cross-pair sum is an exact
    * BIGINT and the emitted double is one division. The DuckDB replay
    * enumerates shortest paths as a UNION ALL recursive walk
    * constrained to the BFS DAG (extend only to nodes exactly one
    * level deeper), so σ = path count with no explosion beyond the
    * true number of shortest paths.
    *
    * Scale: rounds = diameter; every frame is ≤|V|² on the
    * nation-bounded graph, and the triple join is |V|³ worst case —
    * the exact algorithm is for domain-bounded graphs. For unbounded
    * graphs set `spark.graft.betweenness.roots=K`: the op switches to
    * Brandes-pivot landmark sampling (K portable-hash-chosen pivot
    * sources, ordered-pair dependencies rescaled by |V|/(2K)), which
    * reduces bit-exactly to the exact route when K ≥ |V| (spec-pinned)
    * and drops the triple join to K·|V|². */
  /** Shared all-sources σ-BFS over the hash-sparsified undirected
    * graph: one frame (root, node, hops, sigma) with exact
    * shortest-path counts, registry-persisted because THREE ops
    * consume it (node betweenness, edge betweenness, eccentricity) —
    * without sharing, each re-ran the same diameter-round loop.
    * Frontier expansion SUMS σ over same-level predecessors (the
    * BFS-DAG recurrence) instead of deduplicating. */
  private[operators] def sigmaBfs(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.CachedPlans.cached(s, s"graph.sigmaBfs:$d") {
      val und = undirectedTradeEdges(s, d)
        .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
      val edges = ConnectedComponents.snapshot(
        und.select(col("u").as("src"), col("v").as("dst"))
          .unionAll(und.select(col("v"), col("u"))))
      val nodes = und.select(col("u").as("node"))
        .unionAll(und.select(col("v"))).distinct()
      var dist = ConnectedComponents.snapshot(
        nodes.select(col("node").as("root"), col("node"),
          lit(0L).as("hops"), lit(1L).as("sigma")))
      var frontier = dist
      var iter = 0
      var done = false
      while (iter < 30 && !done) {
        iter += 1
        val next = ConnectedComponents.snapshot(
          frontier.join(edges, frontier("node") === edges("src"))
            .select(col("root"), col("dst").as("node"), col("sigma"))
            .groupBy(col("root"), col("node")).agg(sum(col("sigma")).as("sigma"))
            .join(dist.select(col("root"), col("node")), Seq("root", "node"), "left_anti")
            .select(col("root"), col("node"), lit(iter.toLong).as("hops"), col("sigma")))
        if (next.isEmpty) {
          done = true
          ConnectedComponents.release(next)
        } else {
          // r16: union of materialized layers instead of a re-snapshot
          // copy per round (see closeness — the layers ARE the result)
          dist = dist.unionAll(next)
          frontier = next
        }
      }
      ConnectedComponents.release(edges)
      dist
    }

  val betweenness: GraftOp = GraftOp(
    "graph_betweenness",
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |edges AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |walk AS (
      |  SELECT node AS root, node, 0 AS hops FROM nodes
      |  UNION
      |  SELECT w.root, e.dst, w.hops + 1
      |  FROM walk w JOIN edges e ON e.src = w.node
      |  WHERE w.hops < 30),
      |d AS (
      |  SELECT root, node, CAST(min(hops) AS BIGINT) AS hops
      |  FROM walk GROUP BY 1, 2),
      |paths AS (
      |  SELECT node AS root, node, 0 AS hops FROM nodes
      |  UNION ALL
      |  SELECT p.root, e.dst, p.hops + 1
      |  FROM paths p
      |  JOIN edges e ON e.src = p.node
      |  JOIN d ON d.root = p.root AND d.node = e.dst AND d.hops = p.hops + 1),
      |ds AS (
      |  SELECT d.root, d.node, d.hops, CAST(count(*) AS BIGINT) AS sigma
      |  FROM d JOIN paths p ON p.root = d.root AND p.node = d.node
      |  GROUP BY 1, 2, 3),
      |st AS (
      |  SELECT root AS s, node AS t, hops AS dh, sigma AS sig_st
      |  FROM ds WHERE root < node AND hops > 0),
      |mid AS (
      |  SELECT st.s, st.t, a.node AS v,
      |    CAST(a.sigma * b.sigma * 1000000 // st.sig_st AS BIGINT) AS c_micro
      |  FROM st
      |  JOIN ds a ON a.root = st.s AND a.node <> st.s AND a.node <> st.t
      |  JOIN ds b ON b.root = a.node AND b.node = st.t
      |  WHERE a.hops + b.hops = st.dh),
      |bc AS (
      |  SELECT v AS node, CAST(count(*) AS BIGINT) AS n_pair_paths,
      |    CAST(sum(c_micro) AS BIGINT) AS bc_micro
      |  FROM mid GROUP BY 1)
      |SELECT n.node, coalesce(bc.n_pair_paths, 0) AS n_pair_paths,
      |  coalesce(bc.bc_micro, 0) AS bc_micro,
      |  CAST(coalesce(bc.bc_micro, 0) AS DOUBLE) / 1000000.0 AS betweenness
      |FROM nodes n LEFT JOIN bc ON n.node = bc.node
      |ORDER BY n.node""".stripMargin) { (s, d) =>
    val ds = sigmaBfs(s, d)
    val nodes = ds.filter(col("hops") === 0).select(col("node"))
    val a = ds.select(col("root").as("s"), col("node").as("v"),
      col("hops").as("ha"), col("sigma").as("sig_sv"))
    val b = ds.select(col("root").as("v"), col("node").as("t"),
      col("hops").as("hb"), col("sigma").as("sig_vt"))
    // Validate the sampling conf up front: a malformed or non-positive
    // value must fail with a message naming the conf (a bare .toInt
    // would throw NumberFormatException mid-plan, and K = 0 would
    // divide by zero in the |V|/(2K) rescale).
    s.conf.getOption("spark.graft.betweenness.roots").map { raw =>
      val k = raw.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"spark.graft.betweenness.roots must be a positive integer, got '$raw'"))
      require(k >= 1, s"spark.graft.betweenness.roots must be >= 1, got $k")
      k
    } match {
      case None =>
        val st = ds.filter(col("root") < col("node") && col("hops") > 0)
          .select(col("root").as("s"), col("node").as("t"),
            col("hops").as("dh"), col("sigma").as("sig_st"))
        val mid = st.join(a, Seq("s")).filter(col("v") =!= col("s") && col("v") =!= col("t"))
          .join(b, Seq("v", "t"))
          .filter(col("ha") + col("hb") === col("dh"))
          .select(col("v"),
            expr("CAST(sig_sv * sig_vt * 1000000 div sig_st AS BIGINT)").as("c_micro"))
        val bc = mid.groupBy(col("v").as("node"))
          .agg(count(lit(1)).as("n_pair_paths"), sum(col("c_micro")).as("bc_micro"))
        nodes.join(bc, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("n_pair_paths"), lit(0L)).as("n_pair_paths"),
            coalesce(col("bc_micro"), lit(0L)).as("bc_micro"),
            expr("CAST(coalesce(bc_micro, 0) AS DOUBLE) / 1000000.0").as("betweenness"))
          .orderBy(col("node"))
      case Some(k) =>
        // Brandes-pivot landmark sampling (Brandes & Pich 2007): run
        // the pair-dependency sum only for ORDERED pairs whose source
        // is one of K pivots chosen by portable hash (deterministic,
        // engine-replayable), then scale by |V|/K. Ordered pairs make
        // the per-source dependency the unit of sampling; on the
        // undirected graph Σ_ordered = 2·Σ_{s<t}, so the |V|/(2K)
        // rescale reduces BIT-EXACTLY to the exact route when K ≥ |V|
        // (the spec pin). At billion-node scale this is the admissible
        // route: the σ-BFS root frame shrinks |V|× → K×, and the
        // triple join is K·|V|² instead of |V|³.
        val pivots = broadcast(nodes
          .orderBy(graft.functions.Exprs.md5Long(col("node")), col("node"))
          .limit(k)
          .select(col("node").as("s")))
        val tot = broadcast(nodes.agg(count(lit(1)).as("n_nodes"))
          .crossJoin(pivots.agg(count(lit(1)).as("k_roots"))))
        val st = ds.filter(col("hops") > 0)
          .join(pivots, ds("root") === pivots("s"))
          .select(col("root").as("s"), col("node").as("t"),
            col("hops").as("dh"), col("sigma").as("sig_st"))
        val mid = st.join(a, Seq("s")).filter(col("v") =!= col("s") && col("v") =!= col("t"))
          .join(b, Seq("v", "t"))
          .filter(col("ha") + col("hb") === col("dh"))
          .select(col("v"),
            expr("CAST(sig_sv * sig_vt * 1000000 div sig_st AS BIGINT)").as("c_micro"))
        val bc = mid.groupBy(col("v").as("node"))
          .agg(count(lit(1)).as("n_ordered"), sum(col("c_micro")).as("c_sum"))
        nodes.join(bc, Seq("node"), "left").crossJoin(tot)
          .select(col("node"),
            expr("CAST(coalesce(n_ordered, 0) * n_nodes div (2 * k_roots) AS BIGINT)")
              .as("n_pair_paths"),
            expr("CAST(coalesce(c_sum, 0) * n_nodes div (2 * k_roots) AS BIGINT)")
              .as("bc_micro"),
            expr("""round(CAST(CAST(coalesce(c_sum, 0) * n_nodes div (2 * k_roots) AS BIGINT)
              |  AS DOUBLE) / 1000000.0, 6)""".stripMargin).as("betweenness"))
          .orderBy(col("node"))
    }
  }

  /** Eccentricity / diameter / radius — the worst-case-distance
    * companion to [[closeness]]'s average-distance view (an SLA
    * question: "how many hops can a route need", and center/periphery
    * membership for placement decisions). Reuses the exact
    * all-sources BFS loop on the same sparsified graph; eccentricity
    * is the per-root MAX hop, diameter/radius the max/min
    * eccentricity, and the center/periphery flags compare exact
    * integers. Rounds = diameter, frames ≤|V|² — same scale shape as
    * closeness (landmark roots at billion-node scale). */
  /** Katz centrality over the directed trade graph — PageRank's
    * path-counting sibling: score = Σ_k αᵏ·(walks of length k ending
    * here), so influence flows along ALL walks attenuated by length,
    * without PageRank's out-degree division (a nation's influence is
    * not diluted by exporting widely — the semantic difference that
    * makes Katz the standard choice for citation/influence graphs).
    * α = 0.01 keeps α·λmax < 1 on the near-complete ≤25-node trade
    * graph, β = 1. Same loop shape and oracle contract as PageRank:
    * each round is one scores ⋈ edges join-aggregate (one shuffle),
    * every round snaps to the 1e-10 grid, and the exact grid fixpoint
    * allows early stop bit-identical to the fixed 8-round oracle
    * replay. */
  val katz: GraftOp = GraftOp(
    "graph_katz",
    {
      val base = """WITH edges AS (
        |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
        |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |    AND o_custkey = c_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND n1.n_nationkey <> n2.n_nationkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |k0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS score FROM nodes)""".stripMargin
      val iters = (1 to 8).map { k =>
        s"""k$k AS (
           |  SELECT n.node,
           |    round(1.0 + 0.01 * coalesce(sum(p.score), 0), 10) AS score
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.node
           |  LEFT JOIN k${k - 1} p ON p.node = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      s"$base$iters\nSELECT node, score AS katz FROM k8 ORDER BY node"
    }) { (s, d) =>
    val edges = ConnectedComponents.snapshot(tradeEdges(s, d))
    val nodes = ConnectedComponents.snapshot(
      edges.select(col("src").as("node")).union(edges.select(col("dst"))).distinct())
    // NB (r16): a lazy probe-cadence variant measured slower in-bench
    // here (like graph_ppr / graph_hits) and was reverted.
    var scores: DataFrame = ConnectedComponents.snapshot(
      nodes.select(col("node"), lit(1.0).as("score")))
    var iter = 0
    var fixpoint = false
    while (iter < 8 && !fixpoint) {
      val next = ConnectedComponents.snapshot(nodes
        .join(edges.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .join(scores.select(col("node").as("src"), col("score")), Seq("src"), "left")
        .groupBy(col("node"))
        .agg(round(lit(1.0) + lit(0.01) * coalesce(sum(col("score")), lit(0.0)), 10)
          .as("score")))
      iter += 1
      // fixpoint probe every 3rd round (see pagerankFrom)
      if (iter % 3 == 0 && iter < 8) {
        val delta = next.join(scores.select(col("node"), col("score").as("prev")), Seq("node"))
          .agg(coalesce(sum(abs(col("score") - col("prev"))), lit(0.0))).head.getDouble(0)
        fixpoint = delta == 0.0
      }
      ConnectedComponents.release(scores)
      scores = next
    }
    Seq(edges, nodes).foreach(ConnectedComponents.release)
    scores.select(col("node"), col("score").as("katz")).orderBy(col("node"))
  }

  /** Harmonic centrality — closeness's disconnected-robust sibling:
    * Σ 1/d(s,t) instead of 1/Σd, so unreachable nodes contribute 0
    * rather than poisoning the sum (the form the centrality
    * literature recommends on graphs that are not strongly
    * connected). Reuses the registry-shared [[sigmaBfs]] distance
    * frame (fourth consumer — no new BFS loop); each inverse distance
    * is the exact micro integer 10⁶ div hops, so the per-root sum is
    * an exact BIGINT and both the raw and the (n−1)-normalized emits
    * are micro-grid doubles. Same landmark-sampling story as
    * closeness at unbounded scale. */
  val harmonic: GraftOp = GraftOp(
    "graph_harmonic",
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |edges AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      |walk AS (
      |  SELECT node AS root, node, 0 AS hops FROM nodes
      |  UNION
      |  SELECT w.root, e.dst, w.hops + 1
      |  FROM walk w JOIN edges e ON e.src = w.node
      |  WHERE w.hops < 30),
      |d AS (
      |  SELECT root, node, CAST(min(hops) AS BIGINT) AS hops
      |  FROM walk GROUP BY 1, 2),
      |h AS (
      |  SELECT root, CAST(count(*) AS BIGINT) AS reached,
      |    CAST(sum(1000000 // hops) AS BIGINT) AS h_micro
      |  FROM d WHERE hops > 0 GROUP BY 1)
      |SELECT n.node, coalesce(h.reached, 0) AS reached,
      |  coalesce(h.h_micro, 0) AS harmonic_micro,
      |  CAST(coalesce(h.h_micro, 0) AS DOUBLE) / 1000000.0 AS harmonic,
      |  CAST(coalesce(h.h_micro, 0) AS DOUBLE)
      |    / (1000000.0 * (CAST(nc.n AS DOUBLE) - 1)) AS harmonic_norm
      |FROM nodes n LEFT JOIN h ON n.node = h.root CROSS JOIN nc
      |ORDER BY n.node""".stripMargin) { (s, d) =>
    val ds = sigmaBfs(s, d)
    val nodes = ds.filter(col("hops") === 0).select(col("node"))
    val nc = broadcast(nodes.agg(count(lit(1)).as("n")))
    val h = ds.filter(col("hops") > 0)
      .groupBy(col("root"))
      .agg(count(lit(1)).as("reached"),
        sum(expr("1000000 div hops")).as("h_micro"))
    nodes.join(h, nodes("node") === h("root"), "left").crossJoin(nc)
      .select(col("node"),
        coalesce(col("reached"), lit(0L)).as("reached"),
        coalesce(col("h_micro"), lit(0L)).as("harmonic_micro"),
        expr("CAST(coalesce(h_micro, 0) AS DOUBLE) / 1000000.0").as("harmonic"),
        expr("""CAST(coalesce(h_micro, 0) AS DOUBLE)
          |  / (1000000.0D * (CAST(n AS DOUBLE) - 1))""".stripMargin).as("harmonic_norm"))
      .orderBy(col("node"))
  }

  val eccentricity: GraftOp = GraftOp(
    "graph_eccentricity",
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |edges AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |walk AS (
      |  SELECT node AS root, node, 0 AS hops FROM nodes
      |  UNION
      |  SELECT w.root, e.dst, w.hops + 1
      |  FROM walk w JOIN edges e ON e.src = w.node
      |  WHERE w.hops < 30),
      |d AS (
      |  SELECT root, node, CAST(min(hops) AS BIGINT) AS hops
      |  FROM walk GROUP BY 1, 2),
      |ecc AS (
      |  SELECT root, CAST(count(*) - 1 AS BIGINT) AS reached,
      |    CAST(max(hops) AS BIGINT) AS ecc
      |  FROM d GROUP BY 1),
      |ext AS (SELECT CAST(max(ecc) AS BIGINT) AS diameter,
      |               CAST(min(ecc) AS BIGINT) AS radius FROM ecc)
      |SELECT root AS node, reached, ecc, diameter, radius,
      |  CASE WHEN ecc = radius THEN 1 ELSE 0 END AS is_center,
      |  CASE WHEN ecc = diameter THEN 1 ELSE 0 END AS is_periphery
      |FROM ecc, ext ORDER BY node""".stripMargin) { (s, d) =>
    val ecc = sigmaBfs(s, d).groupBy(col("root"))
      .agg((count(lit(1)) - 1).as("reached"), max(col("hops")).as("ecc"))
    val ext = broadcast(ecc.agg(max(col("ecc")).as("diameter"), min(col("ecc")).as("radius")))
    ecc.crossJoin(ext)
      .select(col("root").as("node"), col("reached"), col("ecc"),
        col("diameter"), col("radius"),
        when(col("ecc") === col("radius"), 1).otherwise(0).as("is_center"),
        when(col("ecc") === col("diameter"), 1).otherwise(0).as("is_periphery"))
      .orderBy(col("node"))
  }

  /** EDGE betweenness — the Girvan-Newman primitive ([[betweenness]]
    * ranks broker NODES; community detection removes the highest-
    * betweenness EDGES, and [[edgeSupport]]'s zero-triangle view only
    * finds bridges, not load): for the undirected edge {u,v},
    * Σ_{s<t} σ_su·σ_vt/σ_st over placements where the edge lies on a
    * shortest path (d(s,u)+1+d(v,t) = d(s,t)), both orientations.
    * Same σ-carrying all-sources BFS and the same per-term micro
    * floor-snap as node betweenness, so the per-edge sum folds as an
    * exact BIGINT; the oracle replays the identical path-DAG walk.
    * Frames ≤|V|²·|E| on the nation-bounded graph; landmark roots at
    * scale. */
  val edgeBetweenness: GraftOp = GraftOp(
    "graph_edge_betweenness",
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |und0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0),
      |und AS (SELECT u, v FROM und0
      |  WHERE CAST(concat('0x', substring(md5(concat(u, '|', v)), 1, 15)) AS BIGINT) % 4 = 0),
      |edges AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |walk AS (
      |  SELECT node AS root, node, 0 AS hops FROM nodes
      |  UNION
      |  SELECT w.root, e.dst, w.hops + 1
      |  FROM walk w JOIN edges e ON e.src = w.node
      |  WHERE w.hops < 30),
      |d AS (
      |  SELECT root, node, CAST(min(hops) AS BIGINT) AS hops
      |  FROM walk GROUP BY 1, 2),
      |paths AS (
      |  SELECT node AS root, node, 0 AS hops FROM nodes
      |  UNION ALL
      |  SELECT p.root, e.dst, p.hops + 1
      |  FROM paths p
      |  JOIN edges e ON e.src = p.node
      |  JOIN d ON d.root = p.root AND d.node = e.dst AND d.hops = p.hops + 1),
      |ds AS (
      |  SELECT d.root, d.node, d.hops, CAST(count(*) AS BIGINT) AS sigma
      |  FROM d JOIN paths p ON p.root = d.root AND p.node = d.node
      |  GROUP BY 1, 2, 3),
      |st AS (
      |  SELECT root AS s, node AS t, hops AS dh, sigma AS sig_st
      |  FROM ds WHERE root < node AND hops > 0),
      |mid AS (
      |  SELECT least(e.src, e.dst) AS u, greatest(e.src, e.dst) AS v,
      |    CAST(a.sigma * b.sigma * 1000000 // st.sig_st AS BIGINT) AS c_micro
      |  FROM st
      |  JOIN ds a ON a.root = st.s
      |  JOIN edges e ON e.src = a.node
      |  JOIN ds b ON b.root = e.dst AND b.node = st.t
      |  WHERE a.hops + 1 + b.hops = st.dh),
      |bc AS (
      |  SELECT u, v, CAST(count(*) AS BIGINT) AS n_pair_paths,
      |    CAST(sum(c_micro) AS BIGINT) AS ebc_micro
      |  FROM mid GROUP BY 1, 2)
      |SELECT un.u, un.v, coalesce(bc.n_pair_paths, 0) AS n_pair_paths,
      |  coalesce(bc.ebc_micro, 0) AS ebc_micro,
      |  CAST(coalesce(bc.ebc_micro, 0) AS DOUBLE) / 1000000.0 AS edge_betweenness
      |FROM und un LEFT JOIN bc ON un.u = bc.u AND un.v = bc.v
      |ORDER BY un.u, un.v""".stripMargin) { (s, d) =>
    val und = undirectedTradeEdges(s, d)
      .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
    val ds = sigmaBfs(s, d)
    val dirEdges = und.select(col("u").as("esrc"), col("v").as("edst"))
      .unionAll(und.select(col("v"), col("u")))
    val st = ds.filter(col("root") < col("node") && col("hops") > 0)
      .select(col("root").as("s"), col("node").as("t"),
        col("hops").as("dh"), col("sigma").as("sig_st"))
    val a = ds.select(col("root").as("s"), col("node").as("esrc"),
      col("hops").as("ha"), col("sigma").as("sig_su"))
    val b = ds.select(col("root").as("edst"), col("node").as("t"),
      col("hops").as("hb"), col("sigma").as("sig_vt"))
    val mid = st.join(a, Seq("s"))
      .join(dirEdges, Seq("esrc"))
      .join(b, Seq("edst", "t"))
      .filter(col("ha") + 1 + col("hb") === col("dh"))
      .select(least(col("esrc"), col("edst")).as("u"),
        greatest(col("esrc"), col("edst")).as("v"),
        expr("CAST(sig_su * sig_vt * 1000000 div sig_st AS BIGINT)").as("c_micro"))
    val bc = mid.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_pair_paths"), sum(col("c_micro")).as("ebc_micro"))
    und.join(bc, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("n_pair_paths"), lit(0L)).as("n_pair_paths"),
        coalesce(col("ebc_micro"), lit(0L)).as("ebc_micro"),
        expr("CAST(coalesce(ebc_micro, 0) AS DOUBLE) / 1000000.0")
          .as("edge_betweenness"))
      .orderBy(col("u"), col("v"))
  }

  val ops: Seq[GraftOp] = Seq(pagerank, hits, lpa, triangles, kcore, jaccard, bfs, cheapestRoute, reciprocity, degreeDist,
    clustering, assortativity, closeness, ppr, sccPivot, adamicAdar, modularity, edgeSupport, betweenness, eccentricity,
    edgeBetweenness, harmonic, katz, transitivity)
}
