package graft

import graft.operators.MipsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MipsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("norm-augmented reduction: augmented cosine ranks EXACTLY like the raw inner product") {
    // the Neyshabur-Srebro property the serve path rests on:
    // cos(q~, x~) = <q,x> / (||q|| * M) is monotone in <q,x> per query
    import graft.functions.Exprs
    val v = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Exprs.vecAsDouble(col("embedding")).as("e"))
      .withColumn("nsq", Exprs.dot(col("e"), col("e")))
    val m2 = v.agg(max(col("nsq"))).head.getDouble(0)
    val aug = v.select(col("vec_id"),
      concat(col("e"), array(sqrt(lit(m2) - col("nsq")))).as("ea"), col("e"))
    val q = aug.filter(col("vec_id") === 0)
      .select(col("e").as("qe"), Exprs.unit(col("ea")).as("qu")).head
    val scored = aug.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Exprs.dot(typedLit(q.getSeq[Double](0)), col("e")).as("ip"),
        Exprs.dot(typedLit(q.getSeq[Double](1)), Exprs.unit(col("ea"))).as("aug_cos"))
      .collect()
    val byIp = scored.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0)).toSeq
    val byAug = scored.sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(byIp === byAug, "augmented-cosine order diverged from inner-product order")
  }

  test("knn_mips recall@10 vs exact MIPS baseline") {
    def topSets(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = topSets("knn_mips_brute")
    val got = topSets("knn_mips")
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean MIPS recall@10 = $mean < 0.5")
  }

  test("corpus is never shuffled on the brute path (broadcast-query scan)") {
    val plan = MipsOps.mipsBrute.run(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled:\n$plan")
  }
}
