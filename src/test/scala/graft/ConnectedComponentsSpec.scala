package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("200-long chain: star contraction converges in ~log rounds, labels = chain min") {
    // diameter 199 ≫ the 50-round bound that aborts plain propagation —
    // the exact failure mode star contraction exists to remove
    import spark.implicits._
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    spark.conf.set("spark.graft.cc.algo", "star") // pin the distributed path
    val labels =
      try ConnectedComponents.run(spark, edges)
      finally spark.conf.unset("spark.graft.cc.algo")
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 200)
    assert(out.forall(_._2 == 0L), "every chain node must label to the chain minimum")
    assert(ConnectedComponents.lastRounds <= 15,
      s"star contraction took ${ConnectedComponents.lastRounds} rounds on a 200-chain " +
        "— that's diameter-proportional, not logarithmic")
  }

  test("star and propagation agree on a random sparse graph") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(150)((rng.nextInt(300).toLong, rng.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    def labelsWith(algo: String): Array[(Long, Long)] = {
      spark.conf.set("spark.graft.cc.algo", algo)
      try ConnectedComponents.run(spark, edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      finally spark.conf.unset("spark.graft.cc.algo")
    }
    val star = labelsWith("star")
    val prop = labelsWith("propagation")
    val local = labelsWith("auto") // 150 edges ≪ localThreshold → union-find
    assert(star.nonEmpty)
    assert(star.sameElements(prop))
    assert(star.sameElements(local))
  }

  test("empty edge set yields empty labels (no hang, no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.run(spark, empty).count() === 0)
  }

  test("pagerank early-stops at an exact grid fixpoint, result == full run") {
    import spark.implicits._
    // 3-cycle: uniform 1/3 is stationary ON THE 1e-10 GRID after one
    // round, so the loop must detect the fixpoint and stop — and
    // stopping is bit-identical to running all 10 rounds
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ranks = graft.operators.GraphOps.pagerankFrom(cycle, iters = 10, damping = 0.85)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(graft.operators.GraphOps.lastIterations < 10,
      s"fixpoint not detected: ran ${graft.operators.GraphOps.lastIterations} rounds")
    val third = BigDecimal(1.0 / 3).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ranks === Array((1L, third), (2L, third), (3L, third)))
    // a non-symmetric graph must NOT trigger the early stop prematurely
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val chainRanks = graft.operators.GraphOps.pagerankFrom(chain, iters = 5, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(chainRanks(3L) > chainRanks(1L), "sink of the chain must accumulate rank")
  }

  test("HITS early-stops at an exact hub fixpoint, hubs/auths normalized") {
    import spark.implicits._
    // 3-cycle: the uniform vector is stationary on the grid after one
    // round (in-degree = out-degree = 1 everywhere) — early stop fires
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val scores = graft.operators.GraphOps.hitsFrom(cycle, iters = 8)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(graft.operators.GraphOps.lastHitsIterations < 8,
      s"fixpoint not detected: ran ${graft.operators.GraphOps.lastHitsIterations} rounds")
    val third = BigDecimal(1.0 / 3).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scores === Array((1L, third, third), (2L, third, third), (3L, third, third)))
    // asymmetric star: the center is the only authority; leaves the hubs
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val s2 = graft.operators.GraphOps.hitsFrom(star, iters = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(s2(9L)._2 === 1.0, "sole authority must take all authority mass")
    assert(s2(9L)._1 === 0.0, "pure sink has no hub score")
    assert(s2(1L)._1 > 0.3 && s2(1L)._2 === 0.0, "leaves are pure hubs")
  }

  test("spark.graft.checkpointDir switches loops to reliable checkpoints, same labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val edges = (0L until 60L).map(i => (i, i + 1)).toDF("src", "dst")
    val local = ConnectedComponents.run(spark, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      spark.conf.set("spark.graft.cc.algo", "star") // force the distributed loop
      val reliable = ConnectedComponents.run(spark, edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(reliable.sameElements(local))
      def countFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(countFiles).sum else 1
      assert(countFiles(new java.io.File(dir)) > 0,
        "no reliable checkpoint data written under spark.graft.checkpointDir")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      spark.conf.unset("spark.graft.cc.algo")
    }
  }

  test("checkpoint blocks from intermediate rounds are released (two-generation lifecycle)") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val edges = (0L until 120L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = ConnectedComponents.run(spark, edges)
    labels.count()
    val after = sc.getPersistentRDDs.size
    // the returned labels frame may keep ONE checkpointed generation
    // alive; the per-round intermediates must be gone
    assert(after - before <= 2,
      s"expected at most 2 retained RDD handles, got ${after - before} " +
        "(intermediate round checkpoints are leaking)")
  }
}

class BfsSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bfs: path distances exact, cycle handled, early stop at eccentricity+1") {
    import spark.implicits._
    // directed path a->b->c->d plus a back edge d->a (cycle must not
    // re-visit) and an unreachable island x->y
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("x", "y"))
      .toDF("src", "dst")
    val dist = graft.operators.GraphOps.bfsFrom(edges, "a", maxIters = 30)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dist === Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3),
      s"path distances wrong: $dist")
    // eccentricity 3 -> 3 productive rounds + 1 empty probe, not 30
    assert(graft.operators.GraphOps.lastBfsIterations === 4,
      s"ran ${graft.operators.GraphOps.lastBfsIterations} rounds")
    // isolated source: just itself, one probing round
    val solo = graft.operators.GraphOps.bfsFrom(edges, "y", maxIters = 30)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(solo === Map("y" -> 0))
  }
}

class KCoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("k-core peel cascades: lollipop tail unravels hop by hop") {
    import spark.implicits._
    // K4 clique (a,b,c,d) + pendant chain d-e-f. 2-core: chain nodes
    // have degree 1 once the tip is peeled, so e and f unravel over
    // TWO rounds (f first, then e) — the cascade a single-pass degree
    // filter would miss; the clique survives with degree 3 each.
    val clique = for { x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d"); if x < y }
      yield (x, y)
    val edges = (clique ++ Seq(("d", "e"), ("e", "f"))).toDF("u", "v")
    val core = graft.operators.GraphOps.kcoreFrom(edges, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L),
      s"2-core of the lollipop must be exactly the K4: $core")
    // k above the max degree: everything peels to the empty core
    assert(graft.operators.GraphOps.kcoreFrom(edges, k = 5).count() === 0)
  }
}

class SemanticDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cluster-local pruning recalls most exact near-dup pairs at far less work") {
    // exact all-pairs truth from dedup_embed (same τ = 0.45)
    val exact = graft.operators.DedupOps.embed.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // dedup_semantic emits (dropped, kept) prune decisions; a decision
    // exists only if the underlying pair was found by the cluster pass
    val found = graft.operators.DedupOps.semantic.run(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (kept, dropped) = (lo, hi)
    val recalled = exact.count(found.contains)
    assert(exact.nonEmpty, "truth set empty — τ too high for this corpus")
    // i.i.d. random corpus = worst case for clustering; on it the
    // top-3-of-16 multi-probe assignment still recovers ≥ 70%
    assert(recalled >= math.ceil(0.7 * exact.size).toInt,
      s"recall $recalled/${exact.size} below floor")
    graft.CachedPlans.clear(spark)
  }
}
