package graft

import graft.functions.HashImpls
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 kernel laws: the TokenWindowHashes Rabin-Karp kernel that
  * replaces per-window md5 in the stride-1 ExactSubstr ops. */
class R13OpsSpec extends AnyFunSuite {
  private def arr(toks: String*): ArrayData =
    ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)

  /** O(w)-per-position reference: direct polynomial, no rolling. */
  private def direct(toks: Seq[String], w: Int): Seq[Long] = {
    val B = 1099511628211L
    val th = toks.map(t => HashImpls.md5Hash64(UTF8String.fromString(t)))
    (0 to toks.length - w).map { i =>
      th.slice(i, i + w).foldLeft(0L)((h, x) => h * B + x)
    }
  }

  test("rolling window hashes equal the direct polynomial at every position") {
    val toks = (1 to 100).map(i => s"tok${i % 17}_${i % 7}")
    for (w <- Seq(2, 5, 20)) {
      val got = HashImpls.windowHashes(arr(toks: _*), w).toLongArray().toSeq
      assert(got === direct(toks, w), s"w=$w")
    }
  }

  test("equal token sequences hash equal; a one-token change at any offset differs") {
    val base = (1 to 30).map(i => s"w$i")
    val w = 20
    val h1 = HashImpls.windowHashes(arr(base: _*), w).toLongArray()
    val h2 = HashImpls.windowHashes(arr(base: _*), w).toLongArray()
    assert(h1.toSeq === h2.toSeq)
    for (k <- base.indices) {
      val mutated = base.updated(k, "CHANGED")
      val hm = HashImpls.windowHashes(arr(mutated: _*), w).toLongArray()
      for (i <- hm.indices) {
        val covers = k >= i && k < i + w
        assert((hm(i) != h1(i)) === covers, s"mutation at $k, window $i")
      }
    }
  }

  test("31-fold-colliding tokens (Aa/BB) do NOT collide through md5Hash64") {
    // rollingHash("Aa") == rollingHash("BB") — the java-hashCode-style
    // collision class that forced the per-token hash to be md5
    assert(HashImpls.rollingHash(UTF8String.fromString("Aa"))
      === HashImpls.rollingHash(UTF8String.fromString("BB")))
    assert(HashImpls.md5Hash64(UTF8String.fromString("Aa"))
      !== HashImpls.md5Hash64(UTF8String.fromString("BB")))
    // and the window kernel therefore separates the two sequences
    val a = HashImpls.windowHashes(arr("x", "Aa", "y"), 3).toLongArray()
    val b = HashImpls.windowHashes(arr("x", "BB", "y"), 3).toLongArray()
    assert(a(0) !== b(0))
  }

  test("short input yields an empty hash array (no windows)") {
    assert(HashImpls.windowHashes(arr("a", "b"), 20).numElements() === 0)
    assert(HashImpls.windowHashes(arr(), 20).numElements() === 0)
    // exactly one window at n == w
    assert(HashImpls.windowHashes(arr((1 to 20).map(_.toString): _*), 20)
      .numElements() === 1)
  }

  test("text_bpe_learn: greedy merge fold is non-overlapping and symbol-boundary-safe") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def mergeFold(sym: String, ml: String, mr: String): String =
      Seq((sym, ml, mr)).toDF("sym", "ml", "mr").selectExpr(
        """aggregate(split(sym, ' '), '', (acc, x) ->
          |CASE WHEN acc = '' THEN x
          |     WHEN (acc = ml OR endswith(acc, ' ' || ml)) AND x = mr THEN acc || mr
          |     ELSE acc || ' ' || x END)""".stripMargin).head().getString(0)
    // BPE greedy left-to-right non-overlap: "a a a" under (a,a) -> "aa a"
    assert(mergeFold("a a a", "a", "a") === "aa a")
    assert(mergeFold("a a a a", "a", "a") === "aa aa")
    // plain merge + repeated occurrence
    assert(mergeFold("h e l l o", "l", "l") === "h e ll o")
    assert(mergeFold("a b c a b", "a", "b") === "ab c ab")
    // boundary safety: tail symbol 'ya' must NOT match merge-left 'a'
    assert(mergeFold("ya b", "a", "b") === "ya b")
    // merged symbols participate in later rounds as single symbols
    assert(mergeFold("ab c d", "ab", "c") === "abc d")
  }

  test("emb_binary_quantize: sign-bit packing law (bit i = dim i > 0, full 64-bit range)") {
    val spark = SparkTestSession.spark
    val code =
      """aggregate(zip_with(e, sequence(0, 63), (x, i) ->
        |  CASE WHEN x > 0D THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END),
        |  CAST(0 AS BIGINT), (a, b) -> a + b) AS code""".stripMargin
    def codeOf(e: Seq[Double]): Long = {
      import spark.implicits._
      Seq(Tuple1(e)).toDF("e").selectExpr(code).head().getLong(0)
    }
    assert(codeOf(Seq.fill(64)(1.0)) === -1L, "all positive = all 64 bits set")
    assert(codeOf(Seq.fill(64)(-1.0)) === 0L)
    assert(codeOf(1.0 +: Seq.fill(63)(-1.0)) === 1L, "bit 0 from dim 0")
    assert(codeOf(Seq.fill(63)(-1.0) :+ 1.0) === Long.MinValue, "bit 63 = sign bit")
    // one sign flip = exactly one bit of Hamming distance
    val a = codeOf(Seq.tabulate(64)(i => if (i % 3 == 0) 2.0 else -0.5))
    val b = codeOf(Seq.tabulate(64)(i => if (i % 3 == 0 ^ i == 17) 2.0 else -0.5))
    assert(java.lang.Long.bitCount(a ^ b) === 1)
  }

  test("knn_graph_search: walk invariants (hop cap, self-exclusion, rank consistency)") {
    val spark = SparkTestSession.spark
    val rows = graft.operators.KnnOps.knnGraphSearch.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, found, steps, rank, isNn) =
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(6), r.getBoolean(5))
      assert(steps >= 0 && steps <= 12, s"q$qid steps $steps outside [0, cap]")
      assert(found !== qid, s"q$qid walk landed on the query itself")
      assert(isNn === (rank === 1L), s"q$qid found_is_true_nn disagrees with found_rank")
      assert(rank >= 1L)
    }
  }

  test("text_topk_sketch: the audited theorems hold under adversarial merge shapes") {
    // the op's oracle row asserts est>=true / est<=N / size=min(vocab,cap)
    // as theorem-truths; pin them here under merge shapes the query
    // engine never exercises (skewed trees, single-token partitions)
    val items = (0 until 2000).map(i => s"t${i % 37}") // 37 distinct > cap
    val cap = 16
    def sketchOf(chunk: Seq[String]) = {
      val a = new graft.functions.SpaceSavingTopK(cap, cap)
      chunk.foldLeft(a.zero)((b, x) => a.reduce(b, x))
    }
    val agg = new graft.functions.SpaceSavingTopK(cap, cap)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (shape <- Seq(Seq(2000), Seq(1, 1999), (0 until 40).map(_ => 50).toSeq)) {
      var off = 0
      val parts = shape.map { sz => val c = items.slice(off, off + sz); off += sz; c }
      // left-deep merge (the worst compounding shape)
      val merged = parts.map(sketchOf).reduce(agg.merge)
      assert(merged.size === cap, "size = min(vocab, capacity)")
      merged.foreach { case (tok, est) =>
        assert(est >= truth(tok), s"$tok est $est < true ${truth(tok)} (shape $shape)")
        assert(est <= items.size.toLong, s"$tok est exceeds stream length")
      }
    }
    // under-capacity corpus: sketch is exact
    val small = Seq("a", "a", "b", "c")
    val exact = sketchOf(small)
    assert(exact === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }

  test("sample_dsir: per-doc weight equals the hand-computed hashed-bigram ratio mean") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // target (en) talks about "the quick fox"; raw adds a de doc with
    // unrelated text and a de doc REUSING the target's phrasing — DSIR
    // must weight the target-like de doc above the unrelated one
    val texts = Seq(
      (0L, "the quick fox jumps over the quick fox", "en"),
      (1L, "the quick fox runs past the quick fox", "en"),
      (2L, "ein ganz anderes thema ohne bezug dazu", "de"),
      (3L, "the quick fox jumps over the quick fox", "de"))
    val dir = java.nio.file.Files.createTempDirectory("dsir-spec").toString
    texts.map { case (id, t, l) => (id, t, l, "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // driver-side reference of the op's exact integer math
    val B = 4096
    def bigrams(t: String): Seq[Long] = {
      val toks = t.split("\\s+").toSeq
      toks.zip(toks.tail).map { case (a, b) =>
        graft.functions.Exprs.md5Long15(s"$a $b") % B
      }
    }
    val all = texts.flatMap { case (id, t, l) => bigrams(t).map(b => (id, l, b)) }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nr = all.size.toLong
    val nt = all.count(_._2 == "en").toLong
    def ratioPpm(b: Long): Long =
      ((BigInt(ct.getOrElse(b, 0L) + 1) * (nr + B) * 1000000) /
        (BigInt(cr(b) + 1) * (nt + B))).toLong
    val expected = texts.map { case (id, t, _) =>
      val bs = bigrams(t)
      id -> bs.map(ratioPpm).sum / bs.size
    }.toMap

    val out = graft.operators.Sampling.dsir.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L), "4 docs, all selected at k=200")
    expected.foreach { case (id, w) =>
      assert(out(id) === w, s"doc $id weight mismatch")
    }
    // the DSIR point: target-like raw text outranks unrelated raw text
    // regardless of its own language label
    assert(out(3L) > out(2L))
  }
}
