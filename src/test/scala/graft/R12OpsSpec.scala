package graft

import org.scalatest.funsuite.AnyFunSuite

/** First-principles pins for the r12 widening keys. The oracle
  * hash-compare is the exactness gate; these assert the operators
  * mean what they claim on the small SF. */
class R12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_rrf_fusion: RRF recomputes from the two source rankings") {
    import org.apache.spark.sql.functions.col
    val lex = operators.TextOps.bm25.run(spark, sf).collect()
      .sortBy(r => (-r.getAs[Double]("bm25"), r.getAs[Long]("doc_id")))
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1L) }.toMap
    val dense = operators.MipsOps.mips.run(spark, sf)
      .filter(col("query_id") === 0).collect()
      .map(r => r.getAs[Long]("corpus_id") -> r.getAs[Int]("rn").toLong).toMap
    val fused = operators.FusionOps.rrf.run(spark, sf).collect()
    assert(fused.nonEmpty && fused.length <= 20)
    // every fused doc comes from at least one list, its ranks echo the
    // sources, and the score is exactly the two-term reciprocal sum
    fused.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (rl, rd) = (r.getAs[Long]("r_lex"), r.getAs[Long]("r_dense"))
      assert(rl == lex.getOrElse(id, 0L), s"doc $id lex rank")
      assert(rd == dense.getOrElse(id, 0L), s"doc $id dense rank")
      assert(rl > 0 || rd > 0, s"doc $id in neither source list")
      val expect = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rd > 0) 1.0 / (60 + rd) else 0.0)
      assert(r.getAs[Double]("rrf") === expect, s"doc $id score")
    }
    // descending by score with doc_id tiebreak, rn is 1..k
    val scores = fused.map(r => (r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy { case (s, id) => (-s, id) }))
    assert(fused.map(_.getAs[Int]("rn")).toSeq === (1 to fused.length))
    // a doc in BOTH lists outranks a doc appearing in only one at
    // equal-or-worse rank (the point of fusion)
    val both = fused.filter(r => r.getAs[Long]("r_lex") > 0 && r.getAs[Long]("r_dense") > 0)
    if (both.nonEmpty) assert(both.head.getAs[Int]("rn") === 1,
      "a doc ranked by both lists should lead this corpus' fusion")
  }

  test("dedup_substring: spans are exactly the stride-1 duplicated-window closure") {
    // brute-force replay: every 20-token window, duplicated = hash
    // seen elsewhere in the corpus; spans = maximal runs
    val W = 20
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split("\\s+").toSeq)
    val wins = docs.flatMap { case (id, toks) =>
      (0 to toks.length - W).map(i => (id, i.toLong, toks.slice(i, i + W).mkString(" ")))
    }
    val occ = wins.groupBy(_._3).view.mapValues(_.length).toMap
    val dupStarts = wins.filter(w => occ(w._3) > 1).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val expect = dupStarts.toSeq.flatMap { case (id, starts) =>
      // merge consecutive starts into islands
      starts.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, s) if s == e0 + 1 => (s0, s) :: rest
        case (acc, s) => (s, s) :: acc
      }.reverse.map { case (s0, e0) => (id, s0, e0 + W - 1, e0 + W - s0) }
    }.sortBy(x => (x._1, x._2))
    val got = operators.DedupOps.substrSpans.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens")))
    assert(got.nonEmpty, "corpus has duplicated spans by construction")
    assert(got.toSeq === expect)
    // stride-1 must dominate the stride-10 screen: every dedup_spans
    // duplicated window hash lies inside some substring span's doc
    got.foreach { case (_, s0, e0, n) => assert(n === e0 - s0 + 1 && n >= W) }
  }
}
