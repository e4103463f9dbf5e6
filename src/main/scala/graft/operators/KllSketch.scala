package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic compaction-based rank sketch (the KLL/Munro-Paterson
  * family, SURVEY.md §2b) — the engine's first ORACLE-checked quantile
  * sketch, next to the rows-only t-digest (`q_approx_percentile`).
  *
  * Why the randomized textbook KLL cannot be hash-checked cross-engine:
  * its compactor keeps odd- or even-indexed items by a COIN FLIP, and
  * its state depends on arrival order — two legal executions of the
  * same corpus disagree, so a DuckDB replay can never hash-match. This
  * operator fixes both knobs to their deterministic corner (the
  * original Munro-Paterson 1980 discipline, which KLL randomizes for a
  * better constant): buffers of k=256 compact EXACTLY when full,
  * always keeping the odd-indexed items of the sorted buffer, and the
  * stream is fed in VALUE order.
  *
  * The payoff of that corner: fed sorted, every level's buffer is a
  * contiguous run of its level stream, so the retained state has a
  * CLOSED FORM over global ranks — level-ℓ stream item i (0-based) is
  * the corpus' 2^ℓ·(i+1)-th smallest, the residual (never-compacted)
  * tail of each level survives, and the whole sketch reduces to
  * "items at computable ranks with weight 2^ℓ". The schedule (stream
  * length, compaction count, residual per level) depends on n alone:
  * m₀ = n, m_{ℓ+1} = ⌊m_ℓ/k⌋·(k/2). Both engines replay the schedule
  * exactly — Spark on the driver (O(k·log n) state, no data), DuckDB
  * as a recursive CTE over levels — and the only distributed work is
  * selecting the answer-rank values, done with the q_equidepth
  * range-partition + per-partition-offset discipline (never a global
  * single-task sort). Everything emitted is an exact integer or a
  * boolean; the within_bound flag compares |est_rank·100 − φ·n| to the
  * a-priori compaction error bound E = Σ_ℓ ⌊m_ℓ/k⌋·2^ℓ in exact
  * integer arithmetic.
  *
  * The streaming kernel itself ([[KllStream]]) — update, cascade
  * compaction, merge — is the mergeable-summary piece a 100-TB
  * pipeline ships per partition; KllSpec pins (a) sorted-feed kernel
  * state ≡ the closed form, (b) the rank-error bound under shuffled
  * feeds, (c) merge preserving the bound. The op's closed form and the
  * kernel are two views of the same deterministic object, which is
  * what makes the oracle check possible at all.
  */
object KllKernel {
  /** Per-level schedule for stream length n, buffer k:
    * (level, stream length m, full compactions, residual items). */
  def schedule(n: Long, k: Int): Seq[(Int, Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var m = n
    var l = 0
    while (m > 0 && l < 63) {
      val c = m / k
      out += ((l, m, c, m % k))
      m = c * (k / 2)
      l += 1
    }
    out.toSeq
  }

  /** Canonical sorted-feed state: (1-based global rank, weight),
    * rank-ascending. |state| ≤ k·levels — driver-sized. */
  def canonicalState(n: Long, k: Int): Seq[(Long, Long)] =
    schedule(n, k).flatMap { case (l, m, _, r) =>
      val w = 1L << l
      ((m - r) until m).map(i => ((i + 1) * w, w))
    }.sortBy(_._1)

  /** A-priori rank-error bound: each full compaction at level ℓ moves
    * any rank by at most 2^ℓ. */
  def errBound(n: Long, k: Int): Long =
    schedule(n, k).map { case (l, _, c, _) => c * (1L << l) }.sum

  /** For each φ = num/den: the answer's 1-based global rank — the
    * first retained item whose cumulative weight covers φ·n (exact
    * integer comparison, no doubles). */
  def answerRanks(n: Long, k: Int, phis: Seq[(Int, Int)]): Seq[((Int, Int), Long)] = {
    if (n <= 0) return Seq.empty // empty corpus: no answer rows (matches the oracle's shape)
    val st = canonicalState(n, k)
    val cum = st.scanLeft(0L) { case (acc, (_, w)) => acc + w }.tail.zip(st)
    phis.map { case (num, den) =>
      val rk = cum.find { case (cw, _) => cw * den >= num.toLong * n }
        .map(_._2._1).getOrElse(st.last._1)
      ((num, den), rk)
    }
  }
}

/** The streaming/mergeable kernel: what each partition of a 100-TB
  * pipeline runs. Deterministic corner of KLL — compact exactly at k
  * items, keep odd indices of the sorted buffer, weight doubles per
  * level. Merge concatenates level buffers and re-compacts full ones
  * (holding one item back when a buffer is odd-sized, so compactions
  * stay pairwise). Spec-covered; the oracle-checked query path uses
  * the closed form in [[KllKernel]], which KllSpec proves is this
  * kernel's exact sorted-feed state. */
final class KllStream(val k: Int) {
  require(k >= 2 && k % 2 == 0, s"buffer size must be even and >= 2; got $k")
  private val levels =
    scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Long])
  var count: Long = 0L

  def update(v: Long): Unit = {
    levels(0) += v
    count += 1
    carry(0)
  }

  private def carry(l: Int): Unit =
    if (levels(l).size >= k) {
      if (levels.size == l + 1) levels += scala.collection.mutable.ArrayBuffer.empty[Long]
      compactInto(l)
      carry(l + 1)
    }

  /** Sort level l's buffer, promote odd-indexed items of its even-size
    * prefix to level l+1, keep the one leftover when odd-sized. */
  private def compactInto(l: Int): Unit = {
    val sorted = levels(l).sorted
    val even = sorted.size - (sorted.size % 2)
    levels(l).clear()
    if (even < sorted.size) levels(l) += sorted(even)
    var i = 1
    while (i < even) {
      levels(l + 1) += sorted(i)
      i += 2
    }
  }

  def merge(o: KllStream): Unit = {
    require(o.k == k, "mismatched compactor widths")
    count += o.count
    for (l <- o.levels.indices) {
      while (levels.size <= l) levels += scala.collection.mutable.ArrayBuffer.empty[Long]
      levels(l) ++= o.levels(l)
    }
    var l = 0
    while (l < levels.size) {
      while (levels(l).size >= k) {
        if (levels.size == l + 1) levels += scala.collection.mutable.ArrayBuffer.empty[Long]
        compactInto(l)
      }
      l += 1
    }
  }

  /** Retained (value, weight) pairs, value-ascending. */
  def state: Seq[(Long, Long)] =
    levels.zipWithIndex
      .flatMap { case (buf, l) => buf.map(v => (v, 1L << l)) }
      .sortBy(x => (x._1, x._2)).toSeq

  /** Quantile estimate: first retained value whose cumulative weight
    * covers φ = num/den of the count. An empty sketch has no
    * quantiles — callers must check `count` first (the query op's
    * closed-form leg returns zero answer rows for an empty corpus). */
  def query(num: Int, den: Int): Long = {
    require(count > 0, "empty sketch has no quantiles")
    val st = state
    var cw = 0L
    st.find { case (_, w) => cw += w; cw * den >= num.toLong * count }
      .map(_._1).getOrElse(st.last._1)
  }
}

object KllOps {
  private val K = 256
  private val Phis = Seq(1, 25, 50, 75, 99)

  val kll: GraftOp = GraftOp(
    "q_kll",
    s"""WITH RECURSIVE nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
       |lv AS (
       |  SELECT 0 AS l, n AS m FROM nn
       |  UNION ALL
       |  SELECT l + 1, (m // $K) * ${K / 2} FROM lv WHERE m >= $K AND l < 62),
       |ret AS (
       |  SELECT CAST((i + 1) * (CAST(1 AS BIGINT) << l) AS BIGINT) AS rk,
       |    CAST(CAST(1 AS BIGINT) << l AS BIGINT) AS w
       |  FROM lv, unnest(range(m - (m % $K), m)) AS t(i)
       |  WHERE m % $K > 0),
       |cwt AS (SELECT rk, sum(w) OVER (ORDER BY rk) AS cw FROM ret),
       |eb AS (
       |  SELECT CAST(sum((m // $K) * (CAST(1 AS BIGINT) << l)) AS BIGINT) AS e FROM lv),
       |phis AS (SELECT unnest([${Phis.mkString(", ")}]) AS phi_pct),
       |ans AS (
       |  SELECT phi_pct, min(rk) AS est_rank
       |  FROM phis, cwt, nn WHERE cw * 100 >= phi_pct * n GROUP BY phi_pct),
       |ranked AS (
       |  SELECT cents, row_number() OVER (ORDER BY cents) AS rk
       |  FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |        FROM lineitem))
       |SELECT CAST(phi_pct AS INT) AS phi_pct, r.cents AS est_cents, a.est_rank,
       |  nn.n AS n, eb.e AS err_bound,
       |  (abs(a.est_rank - ((phi_pct * nn.n + 99) // 100)) <= eb.e) AS within_bound
       |FROM ans a JOIN ranked r ON r.rk = a.est_rank CROSS JOIN nn CROSS JOIN eb
       |ORDER BY phi_pct""".stripMargin) { (s, d) =>
    import s.implicits._
    val cents = Tables.lineitem(s, d)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    // range-partition + per-partition offsets: exact global ranks with
    // no single-task sort (the q_equidepth discipline); pinned via the
    // session registry so the offsets job and the rank job see the
    // same partitioning under AQE
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.CachedPlans.cached(s, s"kll.ranged:$d")(
      cents.repartitionByRange(parts, col("cents"))
        .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    var acc = 0L
    val offsets: Map[Int, Long] =
      counts.map { case (pid, c) => val o = acc; acc += c; pid -> o }.toMap
    val e = KllKernel.errBound(n, K)
    // target rank ⌈φ·n⌉ and the bound check are schedule facts — exact
    // integer arithmetic on the driver, data adds only the values
    val answers = KllKernel.answerRanks(n, K, Phis.map(_ -> 100))
      .map { case ((num, _), rk) =>
        val target = (num.toLong * n + 99) / 100
        (num, rk, math.abs(rk - target) <= e)
      }
    val ranksDf = answers.toDF("phi_pct", "rk", "within_bound")
    val rk = element_at(typedLit(offsets), col("__pid")) +
      row_number().over(Window.partitionBy(col("__pid")).orderBy(col("cents")))
    ranged
      .withColumn("rk", rk)
      .join(broadcast(ranksDf), "rk")
      .select(col("phi_pct"), col("cents").as("est_cents"), col("rk").as("est_rank"),
        lit(n).as("n"), lit(e).as("err_bound"), col("within_bound"))
      .orderBy(col("phi_pct"))
  }

  val ops: Seq[GraftOp] = Seq(kll)
}
