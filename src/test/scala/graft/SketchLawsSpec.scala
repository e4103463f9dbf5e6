package graft

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws the mergeable-sketch tier depends on for
  * correctness under ANY partitioning: Spark may split, reorder, and
  * re-merge partial aggregation buffers arbitrarily (map-side
  * partials, AQE re-plans, speculative retries), so each sketch's
  * merge must be a commutative, associative, idempotent monoid and
  * its insert must commute with merge. Checked over 100 seeded random
  * input splits per law — the unit specs pin accuracy on real data;
  * these pin the algebra that makes the distributed answer
  * independent of the plan. (Seeded loops, not ScalaCheck's forAll:
  * the scalatest-scalacheck bridge artifact isn't in the offline
  * cache; determinism is a feature here anyway.)
  */
class SketchLawsSpec extends AnyFunSuite {

  private def cases(seed: Long): Seq[(Vector[Long], Vector[Long], Vector[Long])] = {
    val rnd = new scala.util.Random(seed)
    (1 to 100).map { _ =>
      def vec() = Vector.fill(rnd.nextInt(400))(rnd.nextLong())
      (vec(), vec(), vec())
    }
  }

  private def hllOf(vs: Seq[Long]): Array[Byte] = {
    val r = new Array[Byte](functions.HllImpls.M)
    vs.foreach(functions.HllImpls.add(r, _))
    r
  }

  private def hllMerged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val m = a.clone(); functions.HllImpls.merge(m, b); m
  }

  test("hll: merge is commutative, associative, idempotent; insert distributes") {
    cases(seed = 11L).foreach { case (xs, ys, zs) =>
      val (a, b, c) = (hllOf(xs), hllOf(ys), hllOf(zs))
      assert(hllMerged(a, b).sameElements(hllMerged(b, a)), "commutative")
      assert(hllMerged(hllMerged(a, b), c).sameElements(hllMerged(a, hllMerged(b, c))),
        "associative")
      assert(hllMerged(a, a).sameElements(a), "idempotent")
      // building from the concatenation == merging the parts — the law
      // that makes map-side partials correct under any input split
      assert(hllOf(xs ++ ys).sameElements(hllMerged(a, b)), "insert-merge distributivity")
      // duplicates never move registers (the CRDT/replay property)
      assert(hllOf(xs ++ xs).sameElements(a), "duplicate inserts are no-ops")
    }
  }

  test("hll: estimate within 5% across magnitudes") {
    Seq(10, 500, 5000, 50000).foreach { n =>
      val est = functions.HllImpls.estimate(hllOf((1L to n.toLong).toVector))
      assert(math.abs(est - n) <= math.max(2, 0.05 * n), s"n=$n est=$est")
    }
  }

  test("bloom: no false negatives under any split/merge of the build") {
    cases(seed = 23L).foreach { case (xs, ys, _) =>
      val bits = functions.BloomImpls.optimalBits(math.max(1, xs.size + ys.size), 0.01)
      val k = functions.BloomImpls.optimalHashes(0.01)
      def filterOf(vs: Seq[Long]) = {
        val b = new functions.BloomBuffer(new Array[Long]((bits + 63) / 64), k)
        vs.foreach(b.add); b
      }
      val merged = filterOf(xs)
      merged.orWith(filterOf(ys))
      val ser = functions.BloomImpls.serialize(merged.bits, k)
      (xs ++ ys).foreach(v =>
        assert(functions.BloomImpls.mightContain(ser, v), s"false negative for $v"))
      // OR-merge == serial build (byte-identical, the lossless-merge law)
      val serial = filterOf(xs ++ ys)
      assert(functions.BloomImpls.serialize(serial.bits, k).sameElements(ser))
    }
  }

  private def thetaOf(vs: Seq[Long]): Array[Byte] = {
    val s = functions.ThetaImpls.newSet()
    vs.foreach(functions.ThetaImpls.add(s, _))
    functions.ThetaImpls.serialize(s)
  }

  private def thetaMerged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val s = functions.ThetaImpls.newSet()
    functions.ThetaImpls.mergeInto(s, a)
    functions.ThetaImpls.mergeInto(s, b)
    functions.ThetaImpls.serialize(s)
  }

  test("theta: merge is commutative, associative, idempotent; insert distributes") {
    cases(seed = 41L).foreach { case (xs, ys, zs) =>
      val (a, b, c) = (thetaOf(xs), thetaOf(ys), thetaOf(zs))
      assert(thetaMerged(a, b).sameElements(thetaMerged(b, a)), "commutative")
      assert(thetaMerged(thetaMerged(a, b), c).sameElements(thetaMerged(a, thetaMerged(b, c))),
        "associative")
      assert(thetaMerged(a, a).sameElements(a), "idempotent")
      assert(thetaOf(xs ++ ys).sameElements(thetaMerged(a, b)), "insert-merge distributivity")
      assert(thetaOf(xs ++ xs).sameElements(a), "duplicate inserts are no-ops")
    }
  }

  test("theta: EXACT below K — counts, intersections and differences are true values") {
    // two overlapping key ranges, both under K=4096 distinct
    val a = thetaOf((1L to 3000L) ++ (1L to 1000L)) // dups must not matter
    val b = thetaOf(2001L to 5000L)
    assert(functions.ThetaImpls.estimate(a) === 3000L)
    assert(functions.ThetaImpls.estimate(b) === 3000L)
    assert(functions.ThetaImpls.intersect(a, b) === 1000L) // 2001..3000
    assert(functions.ThetaImpls.aNotB(a, b) === 2000L) // 1..2000
    assert(functions.ThetaImpls.aNotB(b, a) === 2000L) // 3001..5000
  }

  test("theta: estimates within 5% (distinct) / 10% (set ops) above K") {
    val a = thetaOf((1L to 100000L).toVector)
    val b = thetaOf((50001L to 150000L).toVector)
    val ea = functions.ThetaImpls.estimate(a)
    assert(math.abs(ea - 100000L) <= 5000, s"est=$ea")
    val inter = functions.ThetaImpls.intersect(a, b)
    assert(math.abs(inter - 50000L) <= 5000, s"intersect=$inter")
    val diff = functions.ThetaImpls.aNotB(a, b)
    assert(math.abs(diff - 50000L) <= 5000, s"aNotB=$diff")
    // sanity: the three must roughly partition A
    assert(math.abs((inter + diff) - ea) <= 8000)
  }

  test("tdigest: merged halves preserve rank accuracy vs the raw data") {
    val rnd = new scala.util.Random(37L)
    (1 to 25).foreach { _ =>
      val vs = Vector.fill(200 + rnd.nextInt(800))(rnd.nextDouble() * 2e6 - 1e6)
      val (l, r) = vs.splitAt(vs.size / 2)
      def digestOf(d: Seq[Double]) = {
        val t = new functions.TDigest(300.0)
        d.foreach(t.add); t
      }
      val merged = digestOf(l)
      merged.mergeWith(digestOf(r))
      val sorted = vs.sorted
      Seq(0.1, 0.5, 0.9).foreach { q =>
        val est = merged.quantile(q)
        // rank of the estimate must sit within 5% of the target rank
        val rank = sorted.count(_ <= est).toDouble / sorted.size
        assert(math.abs(rank - q) <= 0.05, s"q=$q est=$est rank=$rank n=${vs.size}")
      }
    }
  }

  private def bitmapOf(vs: Seq[Long]): Array[Long] = {
    var w = new Array[Long](1)
    vs.foreach(v => w = functions.BitmapImpls.set(w, v))
    w
  }

  test("bitmap: exact cardinality, canonical bytes under any split, OR laws") {
    import functions.BitmapImpls._
    val rnd = new scala.util.Random(53L)
    (1 to 100).foreach { _ =>
      def vec() = Vector.fill(rnd.nextInt(400))(rnd.nextInt(1 << 20).toLong)
      val (a, b) = (vec(), vec())
      // exact cardinality
      assert(cardinality(bitmapOf(a)) === a.distinct.size.toLong)
      // merge == set union, commutative, idempotent
      val ab = or(bitmapOf(a), bitmapOf(b))
      assert(cardinality(ab) === (a ++ b).distinct.size.toLong)
      assert(serialize(ab).toSeq === serialize(or(bitmapOf(b), bitmapOf(a))).toSeq)
      assert(serialize(or(ab, bitmapOf(b))).toSeq === serialize(ab).toSeq)
      // canonical serialization: growth history doesn't leak — building
      // from a shuffled copy yields byte-identical bitmaps
      assert(serialize(bitmapOf(rnd.shuffle(a))).toSeq === serialize(bitmapOf(a)).toSeq)
      // round trip
      assert(serialize(deserialize(serialize(ab))).toSeq === serialize(ab).toSeq)
    }
    // dense-domain contract fails loud, never truncates
    intercept[IllegalArgumentException](set(new Array[Long](1), MaxBits))
    intercept[IllegalArgumentException](set(new Array[Long](1), -1L))
  }

  test("bitmap rollup executes partial aggregation (state crosses the shuffle)") {
    val spark = SparkTestSession.spark
    val plan = graft.operators.EventsAnalytics.bitmapRollup
      .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("partial_bitmap_agg"),
      s"expected partial_bitmap_agg in plan (complete-mode fallback would mean no map-side state):\n$plan")
  }
}
