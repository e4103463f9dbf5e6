package graft

import org.scalatest.funsuite.AnyFunSuite

/** First-principles pins for the r13 continued-widening keys. The
  * oracle hash-compare is the exactness gate; these assert the
  * operators mean what they claim on the small SF. */
class R13bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_energy_distance: windowed sums equal the brute pairwise-distance statistic") {
    import org.apache.spark.sql.functions.{col, expr}
    val p = sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").cast("string").as("u"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (functions.Exprs.md5Long15(r.getString(0)) % 2 == 0, r.getLong(1)))
    val a = p.filter(_._1).map(_._2)
    val b = p.filterNot(_._1).map(_._2)
    def orderedAbs(xs: Array[Long], ys: Array[Long]): BigInt =
      xs.foldLeft(BigInt(0))((acc, x) => acc + ys.foldLeft(BigInt(0))((s, y) => s + (x - y).abs))
    val (sxy, sxx, syy) = (orderedAbs(a, b), orderedAbs(a, a), orderedAbs(b, b))
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val eExpect = 2.0 * (sxy.toDouble / (na * nb)) -
      sxx.toDouble / (na * na) - syy.toDouble / (nb * nb)
    val row = operators.StatsOps5.energyDistance.run(spark, sf).collect().head
    assert(row.getAs[Long]("na") === a.length && row.getAs[Long]("nb") === b.length)
    assert(row.getAs[Double]("e_stat") === eExpect,
      "windowed telescoping must reproduce the brute pairwise sums exactly")
    assert(row.getAs[Double]("t_stat") === na * nb / (na + nb) * eExpect)
    // energy distance is nonnegative (negative-type of |·| on R)
    assert(row.getAs[Double]("e_stat") >= 0.0)
  }

  test("q_page_trend: L equals the replayed within-block rank fold; z standardizes it") {
    import org.apache.spark.sql.functions.{col, expr, sum, year}
    val cells = sources.Tables.orders(spark, sf)
      .join(sources.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), year(col("o_orderdate")).as("yr"))
      .agg(expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val ordOf = cells.map(_._2).distinct.sorted.zipWithIndex
      .map { case (yr, i) => yr -> (i + 1).toLong }.toMap
    val l = cells.groupBy(_._1).toSeq.map { case (_, cs) =>
      cs.sortBy(c => (c._3, c._2)).zipWithIndex
        .map { case ((_, yr, _), i) => ordOf(yr) * (i + 1) }.sum
    }.sum
    val bN = cells.map(_._1).distinct.length
    val kN = cells.map(_._2).distinct.length
    val row = operators.StatsOps5.pageTrend.run(spark, sf).collect().head
    assert(row.getAs[Long]("b") === bN.toLong && row.getAs[Long]("k") === kN.toLong)
    assert(row.getAs[Long]("l_stat") === l)
    val (bD, kD) = (bN.toDouble, kN.toDouble)
    assert(row.getAs[Double]("z") ===
      (12.0 * l.toDouble - 3.0 * bD * kD * (kD + 1.0) * (kD + 1.0)) /
        (kD * (kD + 1.0) * math.sqrt(bD * (kD - 1.0))))
    // L is bounded by the perfectly anti-ordered / ordered block sums
    val minL = bN.toLong * (1 to kN).map(j => j.toLong * (kN - j + 1)).sum
    val maxL = bN.toLong * (1 to kN).map(j => j.toLong * j).sum
    assert(l >= minL && l <= maxL)
  }

  test("q_shapley: subset-weight formula equals the raw 24-permutation average; efficiency holds") {
    import org.apache.spark.sql.functions.col
    val bitOf = Map("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2)))
    val firstP = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min(Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _)) }
    val masks = firstP.toSeq.map { case (u, pts) =>
      ev.filter(e => e._1 == u && e._2 != "purchase" && e._3.isBefore(pts))
        .map(e => bitOf(e._2)).fold(0)(_ | _)
    }
    def v(s: Int): Long = masks.count(m => (s & m) == m).toLong
    // raw Shapley: average marginal contribution over all 4! orderings, ×24
    val chans = Seq(1, 2, 4, 8)
    val phiPerm = chans.map { i =>
      i -> chans.permutations.map { perm =>
        val before = perm.takeWhile(_ != i).fold(0)(_ | _)
        v(before | i) - v(before)
      }.sum
    }.toMap
    val rows = operators.PrefOps.shapley.run(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("click", "error", "signup", "view"))
    rows.foreach { r =>
      assert(r.getAs[Long]("phi_x24") === phiPerm(bitOf(r.getString(0))),
        s"${r.getString(0)}: subset-weight phi must equal the permutation average")
      assert(r.getAs[Long]("v_full") === v(15) && r.getAs[Long]("v_none") === v(0))
      assert(r.getAs[Long]("v_solo") === v(bitOf(r.getString(0))))
    }
    // efficiency: credit sums to exactly what the grand coalition adds
    assert(rows.map(_.getAs[Long]("phi_x24")).sum === 24L * (v(15) - v(0)))
  }

  test("q_isotonic: minimax closed form equals classic pool-adjacent-violators") {
    // reference PAVA with exact rationals: pool blocks while a left
    // neighbor's mean exceeds the right's (BigInt cross-multiplication)
    val rows = operators.StatsOps5.isotonic.run(spark, "/root/testdata/sf0.01").collect()
      .sortBy(_.getAs[Long]("score"))
    val buckets = rows.map(r => (r.getAs[Long]("pos"), r.getAs[Long]("n")))
    case class Blk(pos: BigInt, n: BigInt)
    val pooled = buckets.foldLeft(List.empty[Blk]) { case (acc, (p, nn)) =>
      var st = Blk(BigInt(p), BigInt(nn)) :: acc
      while (st.lengthCompare(2) >= 0 &&
        st.tail.head.pos * st.head.n >= st.head.pos * st.tail.head.n) {
        val (a, b) = (st.head, st.tail.head)
        st = Blk(a.pos + b.pos, a.n + b.n) :: st.tail.tail
      }
      st
    }.reverse
    // each bucket inherits its pooled block's exact-mean ppm floor
    var remaining = pooled
    var left = BigInt(0)
    var curPpm = 0L
    val perBucket = buckets.map { case (_, nn) =>
      if (left == 0) {
        val b = remaining.head; remaining = remaining.tail
        left = b.n; curPpm = (b.pos * 1000000 / b.n).toLong
      }
      left -= nn
      curPpm
    }
    assert(remaining.isEmpty && left == 0, "blocks must tile the buckets exactly")
    assert(rows.map(_.getAs[Long]("iso_ppm")).toSeq === perBucket.toSeq,
      "minimax fit must equal PAVA block means bucket-for-bucket")
    // isotonic: fitted curve is nondecreasing in the score
    val iso = rows.map(_.getAs[Long]("iso_ppm"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
  }

  test("q_lorenz: distributed ranked route assigns the same deciles as the one-task ntile") {
    val local = operators.StatsOps.lorenz.run(spark, sf).collect()
    assert(local.length === 10)
    assert(local.last.getAs[Long]("cum_share_ppm") === 1000000L,
      "cumulative share must close at exactly 10^6 ppm")
    spark.conf.set("spark.graft.ntile.localMaxBytes", "0")
    try {
      val dist = operators.StatsOps.lorenz.run(spark, sf).collect()
      assert(dist.map(_.toSeq).toSeq === local.map(_.toSeq).toSeq,
        "the distributed rank formula must reproduce ntile() decile-for-decile")
    } finally spark.conf.unset("spark.graft.ntile.localMaxBytes")
  }
}
