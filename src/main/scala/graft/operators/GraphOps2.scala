package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second graph tier (round 9, continued): global-structure
  * diagnostics over the nation trade graph — the rich-club coefficient
  * (do high-degree hubs preferentially interconnect?) and the
  * conductance of the region partition (are the schema-given
  * communities actually communities?).
  *
  * Same scale contract as [[GraphOps]]: every statistic is assembled
  * from exact integer counts over the dimension-bounded edge list
  * (≤25² nation pairs at any corpus size — 100× data grows the edge
  * DERIVATION, one scan + one distinct, not the graph algebra), and
  * ratios are emitted as exact floor ppm, never a double divide that
  * engines could disagree on. */
object GraphOps2 {

  /** Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) for a fixed
    * ladder of degree thresholds — "do the best-connected markets
    * trade with EACH OTHER more densely than the graph overall" (the
    * hub-oligarchy diagnostic; read with [[GraphOps.assortativity]]:
    * assortativity says whether degree correlates along edges, the
    * rich club says whether an elite subgraph approaches a clique).
    * Degrees come from one explode of the undirected edge frame;
    * for each threshold the induced edge count joins both endpoints
    * against the >k node set. Everything is exact integers; φ is
    * floor ppm. Thresholds where fewer than 2 nodes qualify emit no
    * row (φ undefined), stated identically in both engines. */
  val richClub: GraftOp = GraftOp(
    "graph_rich_club",
    """WITH und AS (
      |  SELECT DISTINCT least(n1.n_name, n2.n_name) AS u,
      |    greatest(n1.n_name, n2.n_name) AS v
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS degree
      |  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY 1),
      |ks AS (SELECT k FROM (VALUES (4), (8), (12), (16), (20)) t(k)),
      |rich AS (
      |  SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
      |  FROM ks JOIN deg ON deg.degree > ks.k GROUP BY 1),
      |ek AS (
      |  SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
      |  FROM ks JOIN und ON true
      |  JOIN deg da ON da.node = und.u AND da.degree > ks.k
      |  JOIN deg db ON db.node = und.v AND db.degree > ks.k
      |  GROUP BY 1)
      |SELECT rich.k, rich.n_nodes, coalesce(ek.n_edges, 0) AS n_edges,
      |  CAST(coalesce(ek.n_edges, 0) * 2 * 1000000
      |    // (rich.n_nodes * (rich.n_nodes - 1)) AS BIGINT) AS phi_ppm
      |FROM rich LEFT JOIN ek ON rich.k = ek.k
      |WHERE rich.n_nodes >= 2 ORDER BY rich.k""".stripMargin) { (s, d) =>
    val und = GraphOps.undirectedTradeEdges(s, d)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val ks = s.range(1).select(explode(array(lit(4), lit(8), lit(12), lit(16), lit(20))).as("k"))
    val rich = broadcast(ks.join(deg, deg("degree") > ks("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_nodes")))
    val ek = broadcast(ks.crossJoin(und)
      .join(deg.select(col("node").as("na"), col("degree").as("da")),
        col("na") === col("u"))
      .filter(col("da") > col("k"))
      .join(deg.select(col("node").as("nb"), col("degree").as("db")),
        col("nb") === col("v"))
      .filter(col("db") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_edges")))
    rich.join(ek, Seq("k"), "left")
      .filter(col("n_nodes") >= 2)
      .select(col("k"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        expr("""CAST(coalesce(n_edges, 0) * 2 * 1000000
          |  div (n_nodes * (n_nodes - 1)) AS BIGINT)""".stripMargin).as("phi_ppm"))
      .orderBy(col("k"))
  }

  /** Conductance of the REGION partition on the trade graph — "is
    * each region a real trade community or an administrative label"
    * (φ(S) = cut(S)/min(vol(S), vol(V∖S)); low = most trade stays
    * inside, the partition-quality readout [[GraphOps.modularity]]
    * gives for LPA's discovered communities, here for the schema's
    * given one — comparing the two is the point). Nation→region is a
    * broadcast dim join; cut and volume are exact integer counts on
    * the bounded undirected edge list; conductance is floor ppm. */
  val conductance: GraftOp = GraftOp(
    "graph_conductance",
    """WITH und AS (
      |  SELECT DISTINCT least(n1.n_name, n2.n_name) AS u,
      |    greatest(n1.n_name, n2.n_name) AS v
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n1.n_nationkey <> n2.n_nationkey),
      |nr AS (
      |  SELECT n_name AS node, r_name AS region
      |  FROM nation JOIN region ON n_regionkey = r_regionkey),
      |lab AS (
      |  SELECT und.u, und.v, a.region AS ru, b.region AS rv
      |  FROM und JOIN nr a ON a.node = und.u JOIN nr b ON b.node = und.v),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
      |vol AS (
      |  SELECT region, CAST(count(*) AS BIGINT) AS volume
      |  FROM (SELECT ru AS region FROM lab UNION ALL SELECT rv FROM lab)
      |  GROUP BY 1),
      |cut AS (
      |  SELECT region, CAST(count(*) AS BIGINT) AS cut_edges
      |  FROM (SELECT ru AS region FROM lab WHERE ru <> rv
      |        UNION ALL SELECT rv FROM lab WHERE ru <> rv)
      |  GROUP BY 1),
      |nodes AS (
      |  SELECT region, CAST(count(DISTINCT nr.node) AS BIGINT) AS n_nodes
      |  FROM nr JOIN (SELECT u AS node FROM und UNION SELECT v FROM und) g
      |    ON g.node = nr.node
      |  GROUP BY 1)
      |SELECT vol.region, nodes.n_nodes, coalesce(cut.cut_edges, 0) AS cut_edges,
      |  vol.volume,
      |  CAST(coalesce(cut.cut_edges, 0) * 1000000
      |    // least(vol.volume, 2 * m.m - vol.volume) AS BIGINT) AS conductance_ppm
      |FROM vol JOIN nodes ON vol.region = nodes.region
      |LEFT JOIN cut ON vol.region = cut.region
      |CROSS JOIN m ORDER BY vol.region""".stripMargin) { (s, d) =>
    val und = GraphOps.undirectedTradeEdges(s, d)
    val nr = broadcast(Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("node"), col("r_name").as("region")))
    val lab = und
      .join(nr.select(col("node").as("na"), col("region").as("ru")), col("na") === col("u"))
      .join(nr.select(col("node").as("nb"), col("region").as("rv")), col("nb") === col("v"))
    val m = broadcast(und.agg(count(lit(1)).as("m")))
    val vol = lab.select(col("ru").as("region"))
      .unionAll(lab.select(col("rv").as("region")))
      .groupBy(col("region")).agg(count(lit(1)).as("volume"))
    val cut = lab.filter(col("ru") =!= col("rv"))
      .select(col("ru").as("region"))
      .unionAll(lab.filter(col("ru") =!= col("rv")).select(col("rv").as("region")))
      .groupBy(col("region")).agg(count(lit(1)).as("cut_edges"))
    val nodes = nr
      .join(und.select(col("u").as("gn")).union(und.select(col("v").as("gn"))).distinct(),
        col("gn") === col("node"))
      .groupBy(col("region")).agg(countDistinct(col("node")).as("n_nodes"))
    vol.join(nodes, Seq("region"))
      .join(cut, Seq("region"), "left")
      .crossJoin(m)
      .select(col("region"), col("n_nodes"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"), col("volume"),
        expr("""CAST(coalesce(cut_edges, 0) * 1000000
          |  div least(volume, 2 * m - volume) AS BIGINT)""".stripMargin)
          .as("conductance_ppm"))
      .orderBy(col("region"))
  }

  val ops: Seq[GraftOp] = Seq(richClub, conductance)
}
