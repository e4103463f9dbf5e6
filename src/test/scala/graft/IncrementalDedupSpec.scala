package graft

import graft.operators.{DedupOps, IncrementalDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("connected components: pairs end up co-clustered, cluster id = min member") {
    val pairs = DedupOps.minhash.run(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val clusters = DedupOps.clusters.run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly the docs that appear in some pair are clustered
    assert(clusters.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every pair share a cluster (incl. transitively)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is the minimum doc_id of its members
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid min is ${members.keys.min}")
    }
  }
}

class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("containment catches a short doc embedded in a long one; jaccard misses it") {
    import spark.implicits._
    // synthesize a dir-shaped corpus: doc 2 is a verbatim subset of
    // doc 1 (containment 1.0) but jaccard |A|/|B| ≈ 0.4 — invisible to
    // the symmetric dedup family by construction
    val core = (0 until 30).map(i => s"core$i").mkString(" ")
    val extra = (0 until 45).map(i => s"extra$i").mkString(" ")
    val other = (0 until 40).map(i => s"other$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    Seq((1L, s"$core $extra"), (2L, core), (3L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.DedupOps.containment.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 1 && got.head._1 === 1L && got.head._2 === 2L,
      s"expected exactly the (1,2) containment pair, got ${got.mkString(",")}")
    assert(got.head._3 === 1.0, s"verbatim subset must have containment 1.0")
    // and the symmetric family indeed does NOT flag the pair
    val jacPairs = graft.operators.DedupOps.ngram.run(spark, dir).count()
    assert(jacPairs === 0, "jaccard >= 0.8 should not fire on a 40% overlap")
    graft.operators.DedupOps.clearCache(spark)
  }
}

class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("pii redaction scrubs planted emails and IPs, counts them, leaves clean text alone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (1L, "contact alice.smith+x@example.co.uk or 192.168.1.250 for access"),
      (2L, "plain text with no identifiers at all"),
      (3L, "two mails a@b.io c@d.org one ip 10.0.0.1"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.piiRedact.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got(0)._2 === 2 && got(0)._3 === "contact [EMAIL] or [IP] for access")
    assert(got(1)._2 === 0 && got(1)._3 === "plain text with no identifiers at all")
    assert(got(2)._2 === 3 && got(2)._3 === "two mails [EMAIL] [EMAIL] one ip [IP]")
  }

  test("overlapping PII: count equals placeholders actually emitted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii2").toString
    // the IP is INSIDE the email's local part: the sequential
    // replacement emits ONE placeholder — the audit count must say 1,
    // not 2 (counting both patterns on the original double-counts)
    Seq((1L, "mail 1.2.3.4@example.com end"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextOps.piiRedact.run(spark, dir).head
    assert(r.getString(2) === "mail [EMAIL] end")
    assert(r.getLong(1) === 1L, s"count ${r.getLong(1)} != 1 emitted placeholder")
  }
}

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("increment vs corpus-index finds cross-split near-dups, passes clean docs") {
    val docs = graft.sources.Tables.documents(spark, sf)
    // known near-dup pairs from the oracle-checked batch op
    val pairs = DedupOps.ngram.run(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // split so that each known pair straddles corpus/increment
    val incIds = pairs.map(_._2).toSet
    val corpus = docs.filter(!col("doc_id").isin(incIds.toSeq: _*))
    val increment = docs.filter(col("doc_id").isin(incIds.toSeq: _*))

    val index = IncrementalDedup.buildIndex(corpus)
    val res = IncrementalDedup.dedupIncrement(increment, index)

    // no exact dups exist in this corpus (all texts distinct)
    assert(res.exactDups.count() === 0)
    // every cross-split near-dup pair must surface as a candidate
    val found = res.nearDupCandidates.collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    val straddling = pairs.filter { case (a, b) => !incIds.contains(a) && incIds.contains(b) }.toSet
    assert(straddling.subsetOf(found),
      s"missed cross-split dups: ${straddling -- found}")
    // clean + flagged partition the increment
    assert(res.clean.count() + res.nearDupCandidates.select("doc_id").distinct().count()
      === increment.count())
  }

  test("exact duplicate in the increment is caught by the hash index") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 400)
    // clone corpus doc 7 into the increment under a new id
    val clone = corpus.filter(col("doc_id") === 7)
      .withColumn("doc_id", lit(99999L))
    val res = IncrementalDedup.dedupIncrement(clone, IncrementalDedup.buildIndex(corpus))
    val dups = res.exactDups.collect()
    assert(dups.length === 1)
    assert(dups.head.getLong(0) === 99999L && dups.head.getLong(1) === 7L)
    assert(res.clean.count() === 0)
  }
}
