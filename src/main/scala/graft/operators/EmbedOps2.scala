package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second embedding-diagnostics tier (round 9, continued): covariance
  * effective rank (participation ratio) and the Two-NN intrinsic
  * dimension estimator — the two standard answers to "how many
  * dimensions is this 64-dim embedding REALLY using", linear
  * (spectrum-level) and nonlinear (manifold-level) respectively.
  * Read together with [[EmbedOps]]'s `emb_anisotropy` (mean pairwise
  * cosine via the sum-vector identity): anisotropy says how strongly
  * the vectors share a common direction; effective
  * rank summarizes the whole spectrum; Two-NN ignores the linear
  * algebra entirely and asks what the local neighbor-distance ratios
  * imply.
  *
  * Determinism contract: embeddings are snapped to a fixed integer
  * grid up front, every cross-row fold is then an exact integer
  * (DECIMAL(38)/HUGEINT where products scale with n or the value
  * bound), and libm (ln) terms are micro-snapped per sample before
  * the exact integer fold — so both engines fold identical integers
  * in any order. Final formulas are written-out double expressions
  * with one cast per exact integer. */
object EmbedOps2 {

  /** Embedding dimensionality, fixed by the corpus schema (the same
    * constant the LSH/PQ index ops pin). */
  private val Dim = 64

  /** Covariance effective rank via the participation ratio
    * PR = tr(C)²/‖C‖²_F = (Σλ)²/Σλ² — "how many principal directions
    * carry the variance" without an eigendecomposition (PR equals the
    * exact count for isotropic spectra and collapses toward 1 under
    * rank-collapse, the representation-collapse tell). The full d×d
    * covariance is assembled EXACTLY: vectors snap to the 1e-4 grid,
    * pair sums Σqᵢqⱼ come from a double posexplode (n·d² rows — grows
    * linearly in n with d²-bounded aggregate state; the map-side
    * partial agg keeps the exchange at d² rows), and each entry's
    * numerator Dᵢⱼ = n·Σqᵢqⱼ − SᵢSⱼ is micro-snapped by EXACT integral
    * division before the trace/Frobenius folds — so PR is a ratio of
    * two exact integers at any corpus size. The 1e-4 input grid is the
    * op's stated quantization (the bound that keeps Dᵢⱼ² inside
    * DECIMAL(38) past 10⁸ vectors). */
  val effectiveRank: GraftOp = GraftOp(
    "emb_effective_rank",
    s"""WITH q AS (
       |  SELECT list_transform(embedding,
       |    v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
       |p AS (
       |  SELECT i.i AS i, j.j AS j,
       |    CAST(sum(CAST(q[i.i] AS HUGEINT) * q[j.j]) AS HUGEINT) AS sp
       |  FROM q, generate_series(1, $Dim) i(i), generate_series(1, $Dim) j(j)
       |  GROUP BY 1, 2),
       |sv AS (
       |  SELECT i.i AS i, CAST(sum(q[i.i]) AS BIGINT) AS si
       |  FROM q, generate_series(1, $Dim) i(i) GROUP BY 1),
       |c AS (
       |  SELECT p.i, p.j,
       |    CAST((n.n * p.sp - CAST(a.si AS HUGEINT) * b.si)
       |      // (CAST(n.n AS HUGEINT) * n.n * 100) AS BIGINT) AS cu
       |  FROM p JOIN sv a ON a.i = p.i JOIN sv b ON b.i = p.j, n),
       |f AS (
       |  SELECT CAST(sum(CASE WHEN i = j THEN cu ELSE 0 END) AS BIGINT) AS tr,
       |    CAST(sum(CAST(cu AS HUGEINT) * cu) AS BIGINT) AS fr
       |  FROM c)
       |SELECT n.n AS n_vectors, $Dim AS dim,
       |  CAST(tr AS DOUBLE) / 1000000.0 AS trace,
       |  CAST(tr AS DOUBLE) * tr / CAST(fr AS DOUBLE) AS effective_rank
       |FROM f, n""".stripMargin) { (s, d) =>
    // Gram accumulation runs as d×d Long arrays per PARTITION (one
    // tight i/j loop per row), so the exchange carries |parts|·d²
    // partial rows instead of n·d² exploded elements — the shape that
    // survives a 100-TB corpus (per-partition partials stay exact:
    // |q|≤~5.3e3 on the 1e-4 grid ⇒ products ≤2.8e7, Long-safe to
    // ~3·10¹¹ rows per partition; the global fold is DECIMAL(38)).
    val q = Tables.embeddings(s, d).select(
      expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))")
        .as("q"))
    val dim = Dim
    val partSchema = StructType(Seq(
      StructField("i", IntegerType), StructField("j", IntegerType),
      StructField("sp", LongType), StructField("sv", LongType),
      StructField("cnt", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(partSchema)
    val partials = q.mapPartitions { rows =>
      val acc = Array.ofDim[Long](dim, dim)
      val vec = new Array[Long](dim)
      val buf = new Array[Long](dim)
      var n = 0L
      rows.foreach { r =>
        val arr = r.getSeq[Long](0)
        var i = 0
        while (i < dim) { buf(i) = arr(i); i += 1 }
        n += 1
        i = 0
        while (i < dim) {
          val qi = buf(i)
          vec(i) += qi
          val row = acc(i)
          var j = 0
          while (j < dim) { row(j) += qi * buf(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else (for { i <- 0 until dim; j <- 0 until dim } yield org.apache.spark.sql.Row(
        i, j, acc(i)(j), if (j == 0) vec(i) else 0L,
        if (i == 0 && j == 0) n else 0L)).iterator
    }(enc)
    val tot = partials.groupBy(col("i"), col("j"))
      .agg(sum(col("sp").cast(DecimalType(38, 0))).as("sp"),
        sum(col("sv")).as("sv0"), sum(col("cnt")).as("c0"))
    val sv = broadcast(tot.filter(col("j") === 0).select(col("i"), col("sv0").as("si")))
    val n = broadcast(tot.filter(col("i") === 0 && col("j") === 0)
      .select(col("c0").as("n")))
    val c = tot.select(col("i"), col("j"), col("sp"))
      .join(broadcast(sv.select(col("i"), col("si").as("sa"))), Seq("i"))
      .join(broadcast(sv.select(col("i").as("j"), col("si").as("sb"))), Seq("j"))
      .crossJoin(n)
      .select(col("i"), col("j"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * sp - CAST(sa AS DECIMAL(38,0)) * sb)
          |  div (CAST(n AS DECIMAL(38,0)) * n * 100) AS BIGINT)""".stripMargin).as("cu"))
    val f = c.agg(
      sum(when(col("i") === col("j"), col("cu")).otherwise(lit(0L))).as("tr"),
      sum(col("cu").cast(DecimalType(38, 0)) * col("cu")).cast(LongType).as("fr"))
    f.crossJoin(n)
      .select(col("n").as("n_vectors"), lit(Dim).as("dim"),
        expr("CAST(tr AS DOUBLE) / 1000000.0D").as("trace"),
        expr("CAST(tr AS DOUBLE) * tr / CAST(fr AS DOUBLE)").as("effective_rank"))
  }

  /** Two-NN intrinsic dimension (Facco et al.): ID ≈ ln2 / E[ln r₂/r₁]
    * over a deterministic ⅛ query sample — the manifold-dimension
    * estimate that needs only each query's two nearest neighbors, so
    * the scan is |sample|×n exact integer L2 kernels (broadcast the
    * sample through one corpus pass; no n² join, the knn_brute scale
    * shape). Distances are EXACT micro-grid integers; the 1st/2nd
    * neighbor choice orders by (dsq, vec_id) — integer-deterministic;
    * zero-distance duplicates are excluded (r₁ > 0 is the estimator's
    * own requirement); each sample's ln(d²₂/d²₁) is micro-snapped and
    * the fold is an exact integer sum. With E[ln d²-ratio] = 2·E[ln
    * r-ratio], ID = ln4 / mean — the literal and the op order are
    * identical in both engines. */
  val intrinsicDim: GraftOp = GraftOp(
    "emb_intrinsic_dim",
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
      |  FROM embeddings),
      |qs AS (SELECT vec_id AS query_id, q AS qq FROM v WHERE vec_id % 8 = 0),
      |p AS (
      |  SELECT query_id, vec_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, len(q) + 1),
      |        i -> (q[i] - qq[i]) * (q[i] - qq[i]))),
      |      (acc, x) -> acc + x) AS dsq
      |  FROM v, qs WHERE vec_id <> query_id),
      |r AS (
      |  SELECT query_id, dsq,
      |    row_number() OVER (PARTITION BY query_id ORDER BY dsq, vec_id) AS rn
      |  FROM p WHERE dsq > 0),
      |w AS (
      |  SELECT query_id,
      |    max(CASE WHEN rn = 1 THEN dsq END) AS d1,
      |    max(CASE WHEN rn = 2 THEN dsq END) AS d2
      |  FROM r WHERE rn <= 2 GROUP BY 1),
      |t AS (
      |  SELECT CAST(round(ln(CAST(d2 AS DOUBLE) / d1) * 1000000) AS BIGINT) AS t
      |  FROM w WHERE d2 IS NOT NULL),
      |f AS (SELECT CAST(count(*) AS BIGINT) AS nq, CAST(sum(t) AS BIGINT) AS s FROM t)
      |SELECT nq AS n_queries,
      |  CAST(s AS DOUBLE) / (CAST(nq AS DOUBLE) * 1000000.0) AS mean_log_dsq_ratio,
      |  CAST('1.3862943611198906' AS DOUBLE)
      |    / (CAST(s AS DOUBLE) / (CAST(nq AS DOUBLE) * 1000000.0)) AS id_twonn
      |FROM f""".stripMargin) { (s, d) =>
    // dsq = ‖a‖² + ‖b‖² − 2⟨a,b⟩ over the quantized values carried as
    // exact-integer DOUBLES: every term stays < 2⁵³ (‖·‖² ≤ 7.2e13,
    // 2⟨a,b⟩ likewise), so the identity is EXACT and the codegen'd
    // VecDot kernel replaces a per-element interpreted lambda — the
    // 10.4 s → sub-second fix for the |sample|×n scan (same values as
    // the oracle's integer zip fold, by exactness).
    val v = Tables.embeddings(s, d).select(col("vec_id"),
      expr("""transform(embedding,
        |  x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE))"""
        .stripMargin).as("q"))
      .withColumn("n2", graft.functions.vec_dot(col("q"), col("q")))
    val qs = v.filter(col("vec_id") % 8 === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2"))
    val p = v.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (col("n2") + col("qn2")
          - lit(2.0) * graft.functions.vec_dot(col("q"), col("qq")))
          .cast(LongType).as("dsq"))
      .filter(col("dsq") > 0)
    val r = p.withColumn("rn",
      row_number().over(Window.partitionBy(col("query_id")).orderBy(col("dsq"), col("vec_id"))))
      .filter(col("rn") <= 2)
    val w = r.groupBy(col("query_id"))
      .agg(max(when(col("rn") === 1, col("dsq"))).as("d1"),
        max(when(col("rn") === 2, col("dsq"))).as("d2"))
      .filter(col("d2").isNotNull)
    w.select(expr("CAST(round(ln(CAST(d2 AS DOUBLE) / d1) * 1000000) AS BIGINT)").as("t"))
      .agg(count(lit(1)).as("nq"), sum(col("t")).as("s"))
      .select(col("nq").as("n_queries"),
        expr("CAST(s AS DOUBLE) / (CAST(nq AS DOUBLE) * 1000000.0D)").as("mean_log_dsq_ratio"),
        expr("""CAST(1.3862943611198906D AS DOUBLE)
          |  / (CAST(s AS DOUBLE) / (CAST(nq AS DOUBLE) * 1000000.0D))""".stripMargin)
          .as("id_twonn"))
  }

  /** SQ8 reconstruction-error audit — the accuracy half of the
    * [[EmbedOps]] `emb_quantize` story (codes alone don't say whether
    * 8 bits suffice; this emits the per-dimension mean/max absolute
    * reconstruction error and the dynamic range, the table that
    * decides SQ8 vs PQ vs float16 for a corpus). Replays the same
    * min/max affine codebook, reconstructs x̂ = lo + code·(hi−lo)/255,
    * and NANO-snaps each |x−x̂| (identical deterministic doubles on
    * both engines → identical integer snap; positive, so HALF_UP and
    * half-away agree) so the per-dim folds are exact integers. One
    * |dim|-row broadcast + one corpus pass; constant dims emit zero
    * error identically. */
  val sq8Error: GraftOp = GraftOp(
    "emb_sq8_error",
    """WITH e AS (
      |  SELECT vec_id,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |rng AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM e GROUP BY 1),
      |c AS (
      |  SELECT e.vec_id, e.dim, e.v, rng.lo, rng.hi,
      |    CASE WHEN hi = lo THEN 0
      |         ELSE CAST(round((v - lo) / (hi - lo) * 255, 0) AS INT) END AS code
      |  FROM e JOIN rng ON e.dim = rng.dim),
      |err AS (
      |  SELECT dim, lo, hi,
      |    CAST(round(abs(v - (lo + code * (hi - lo) / 255.0))
      |      * 1000000000) AS BIGINT) AS nano
      |  FROM c)
      |SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |  CAST(max(nano) AS DOUBLE) / 1000000000.0 AS max_abs_err,
      |  CAST(sum(nano) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000000.0)
      |    AS mean_abs_err,
      |  max(hi) - min(lo) AS dim_range
      |FROM err GROUP BY dim ORDER BY dim""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("vec_id", "dim", "v")
      .withColumn("v", col("v").cast(DoubleType))
    val rng = e.groupBy(col("dim").as("rdim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val c = e.join(broadcast(rng), col("dim") === col("rdim"))
      .withColumn("code",
        when(col("hi") === col("lo"), 0)
          .otherwise(round((col("v") - col("lo")) / (col("hi") - col("lo")) * 255, 0)
            .cast(IntegerType)))
    c.withColumn("nano",
        expr("""CAST(round(abs(v - (lo + code * (hi - lo) / 255.0D))
          |  * 1000000000) AS BIGINT)""".stripMargin))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(max(nano) AS DOUBLE) / 1000000000.0D").as("max_abs_err"),
        expr("""CAST(sum(nano) AS DOUBLE)
          |  / (CAST(count(*) AS DOUBLE) * 1000000000.0D)""".stripMargin).as("mean_abs_err"),
        (max(col("hi")) - min(col("lo"))).as("dim_range"))
      .orderBy(col("dim"))
  }

  /** Centroid-margin audit — "are the labels centroid-separable, and
    * by how much": per vector, cosine to its OWN label centroid minus
    * the best OTHER centroid (negative margin = the vector would be
    * misrouted by a nearest-centroid classifier — the failure set
    * `knn_classify` then pays for). Centroids are micro-snapped
    * per-dimension integer means (exact integral division of exact
    * sums — the same 1e-4 grid discipline as 33an, bounding every
    * fold), each vector×centroid cosine is ONE deterministic double
    * (exact-integer dot and norms through IEEE sqrt/div — identical
    * cross-engine, so comparisons and the argmax pick identical
    * winners), and per-label aggregates fold micro-snapped margins as
    * exact integers. |labels| is schema-bounded → the centroid table
    * broadcasts; one corpus pass. */
  val centroidMargin: GraftOp = GraftOp(
    "emb_centroid_margin",
    """WITH e AS (
      |  SELECT vec_id, label,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q
      |  FROM embeddings),
      |cent AS (
      |  SELECT label AS clabel, dim,
      |    CAST(sum(q) // (CAST(count(*) AS BIGINT) * 100) AS BIGINT) AS c
      |  FROM e GROUP BY 1, 2),
      |cn AS (SELECT clabel, CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS nc2
      |       FROM cent GROUP BY 1),
      |vn AS (SELECT vec_id, CAST(sum(CAST(q AS HUGEINT) * q) AS BIGINT) AS nv2
      |       FROM e GROUP BY 1),
      |dots AS (
      |  SELECT e.vec_id, e.label, cent.clabel,
      |    CAST(sum(CAST(e.q AS HUGEINT) * cent.c) AS BIGINT) AS dot
      |  FROM e JOIN cent ON e.dim = cent.dim
      |  GROUP BY 1, 2, 3),
      |cos AS (
      |  SELECT d.vec_id, d.label, d.clabel,
      |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(vn.nv2 AS DOUBLE)) * sqrt(CAST(cn.nc2 AS DOUBLE)))
      |      AS cs
      |  FROM dots d JOIN vn ON d.vec_id = vn.vec_id JOIN cn ON d.clabel = cn.clabel),
      |own AS (SELECT vec_id, label, cs AS own_cs FROM cos WHERE label = clabel),
      |best AS (
      |  SELECT vec_id, max(cs) AS other_cs
      |  FROM cos WHERE label <> clabel GROUP BY 1),
      |m AS (
      |  SELECT own.label,
      |    CAST(round((own.own_cs - best.other_cs) * 1000000) AS BIGINT) AS margin_u
      |  FROM own JOIN best ON own.vec_id = best.vec_id)
      |SELECT label, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(margin_u) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0)
      |    AS mean_margin,
      |  CAST(min(margin_u) AS DOUBLE) / 1000000.0 AS min_margin,
      |  CAST(count(*) FILTER (WHERE margin_u < 0) AS BIGINT) AS n_misrouted
      |FROM m GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
    // r16: registry-persisted — the quantized explode feeds THREE
    // subplans (centroids, vector norms, dots); each re-exploded the
    // corpus before
    val e = graft.CachedPlans.cached(s, s"emb.centroidMarginE:$d")(
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .toDF("vec_id", "label", "dim", "v")
        .select(col("vec_id"), col("label"), col("dim"),
          expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").as("q")))
    val cent = e.groupBy(col("label").as("clabel"), col("dim"))
      .agg(expr("CAST(sum(q) div (CAST(count(*) AS BIGINT) * 100) AS BIGINT)").as("c"))
    val cn = broadcast(cent.groupBy(col("clabel"))
      .agg(sum(col("c").cast(DecimalType(38, 0)) * col("c")).cast(LongType).as("nc2")))
    val vn = e.groupBy(col("vec_id").as("nvid"))
      .agg(sum(col("q").cast(DecimalType(38, 0)) * col("q")).cast(LongType).as("nv2"))
    val dots = e.join(broadcast(cent), Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum(col("q").cast(DecimalType(38, 0)) * col("c")).cast(LongType).as("dot"))
    // r16: registry-persisted — own-cosine and best-other both read the
    // |vecs|×|labels| cosine frame; each re-ran the dot aggregation
    val cos = graft.CachedPlans.cached(s, s"emb.centroidMarginCos:$d")(
      dots
        .join(vn, col("vec_id") === col("nvid"))
        .join(cn, Seq("clabel"))
        .select(col("vec_id"), col("label"), col("clabel"),
          expr("""CAST(dot AS DOUBLE)
            |  / (sqrt(CAST(nv2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE)))""".stripMargin)
            .as("cs")))
    val own = cos.filter(col("label") === col("clabel"))
      .select(col("vec_id"), col("label"), col("cs").as("own_cs"))
    val best = cos.filter(col("label") =!= col("clabel"))
      .groupBy(col("vec_id").as("bvid")).agg(max(col("cs")).as("other_cs"))
    own.join(best, col("vec_id") === col("bvid"))
      .select(col("label"),
        expr("CAST(round((own_cs - other_cs) * 1000000) AS BIGINT)").as("margin_u"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        expr("""CAST(sum(margin_u) AS DOUBLE)
          |  / (CAST(count(*) AS DOUBLE) * 1000000.0D)""".stripMargin).as("mean_margin"),
        expr("CAST(min(margin_u) AS DOUBLE) / 1000000.0D").as("min_margin"),
        count(when(col("margin_u") < 0, 1)).as("n_misrouted"))
      .orderBy(col("label"))
  }

  /** BINARY (sign-bit) embedding quantization + Hamming recall audit —
    * the 1-bit-per-dimension compression tier below SQ8
    * (`emb_quantize`) and PQ (`emb_pq_encode`): each 64-dim vector
    * packs to ONE BIGINT (bit i = embedding[i] > 0), a 256×
    * compression, and candidate search becomes bit_count(xor) — the
    * vector-database fast-scan trick (binary prefilter + exact
    * rerank). The audit half answers the only question that matters
    * before turning it on: per sampled query (deterministic 1-in-32
    * portable-hash sample, self excluded), how many of the exact
    * cosine top-10 survive in the Hamming top-10, what the closest
    * Hamming distance is, and how far (in bits) the TRUE cosine NN
    * sits — the recall/distance-distortion evidence, all exact
    * integers.
    *
    * Determinism/oracle: sign bits compare identically in both
    * engines (the raw doubles are casts of the same floats), codes
    * fold as exact integer bit sums (DuckDB assembles the two 32-bit
    * halves in HUGEINT and wraps to the signed BIGINT two's
    * complement via the sqlU2S idiom), Hamming is bit_count over xor
    * (the dedup_simhash parity), cosine ranks ride the VecDot fold
    * contract, and every ORDER has an id tiebreak. Scale shape: codes
    * are one linear pass; the audit is sampled-queries × corpus (the
    * knn recall-audit cost model — the serving path would bucket by
    * code prefix, not scan). */
  val binaryQuantize: GraftOp = GraftOp(
    "emb_binary_quantize", {
      val E = graft.functions.Exprs
      s"""WITH raw AS (
         |  SELECT vec_id, ${E.sqlVecAsDouble("embedding")} AS e FROM embeddings),
         |v AS (
         |  SELECT vec_id, ${E.sqlUnit("e")} AS u,
         |    ${E.sqlU2S(
               s"""(CAST((SELECT sum(CASE WHEN e[i + 33] > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END)
                  |       FROM unnest(range(32)) t(i)) AS HUGEINT) * 4294967296
                  | + (SELECT sum(CASE WHEN e[i + 1] > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END)
                  |    FROM unnest(range(32)) t(i)))""".stripMargin)} AS code
         |  FROM raw),
         |q AS (
         |  SELECT vec_id AS qid, u AS qu, code AS qcode FROM v
         |  WHERE ${E.sqlMd5Long("concat('bq#', CAST(vec_id AS VARCHAR))")} % 32 = 0),
         |p AS (
         |  SELECT q.qid, v.vec_id AS cid,
         |    CAST(bit_count(xor(q.qcode, v.code)) AS INT) AS ham,
         |    ${E.sqlDot("q.qu", "v.u")} AS cos
         |  FROM q JOIN v ON v.vec_id <> q.qid),
         |h AS (
         |  SELECT qid, cid, ham,
         |    row_number() OVER (PARTITION BY qid ORDER BY ham, cid) AS rh,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rc
         |  FROM p)
         |SELECT qid AS query_id,
         |  CAST(sum(CASE WHEN rh <= 10 AND rc <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
         |  CAST(min(ham) AS INT) AS best_hamming,
         |  CAST(min(CASE WHEN rc = 1 THEN ham END) AS INT) AS true_nn_hamming
         |FROM h GROUP BY qid ORDER BY query_id""".stripMargin
    }) { (s, d) =>
    val E = graft.functions.Exprs
    val codeExpr = expr(
      """aggregate(zip_with(e, sequence(0, 63), (x, i) ->
        |  CASE WHEN x > 0D THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END),
        |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin)
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), E.vecAsDouble(col("embedding")).as("e"))
      .select(col("vec_id"), E.unit(col("e")).as("u"), codeExpr.as("code"))
    val q = v.filter(E.md5Long(
        concat(lit("bq#"), col("vec_id").cast(StringType))) % 32 === 0)
      .select(col("vec_id").as("qid"), col("u").as("qu"), col("code").as("qcode"))
    val p = broadcast(q)
      .join(v.select(col("vec_id").as("cid"), col("u").as("cu"), col("code").as("ccode")),
        col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        expr("CAST(bit_count(qcode ^ ccode) AS INT)").as("ham"),
        E.dot(col("qu"), col("cu")).as("cos"))
    val h = p
      .withColumn("rh", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ham"), col("cid"))))
      .withColumn("rc", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
    h.groupBy(col("qid"))
      .agg(sum(when(col("rh") <= 10 && col("rc") <= 10, 1).otherwise(0)).as("hits10"),
        min(col("ham")).as("best_hamming"),
        min(when(col("rc") === 1, col("ham"))).as("true_nn_hamming"))
      .select(col("qid").as("query_id"), col("hits10"),
        col("best_hamming").cast(IntegerType).as("best_hamming"),
        col("true_nn_hamming").cast(IntegerType).as("true_nn_hamming"))
      .orderBy(col("query_id"))
  }

  val ops: Seq[GraftOp] =
    Seq(effectiveRank, intrinsicDim, sq8Error, centroidMargin, binaryQuantize)
}
