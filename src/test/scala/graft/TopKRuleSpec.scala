package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule rewrites row_number-limit filters into
  * the native TopKPerKey operator — transparently, for any user query
  * of that shape. */
class TopKRuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rankedQuery() = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  test("row_number<=k filter is rewritten to TopKPerKeyExec") {
    val plan = rankedQuery().queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window should be gone:\n$plan")
  }

  test("rewritten query returns identical rows incl. the rank column") {
    val got = rankedQuery()
      .orderBy("user_id", "rn").collect()
    // reference computed WITHOUT the rewrite: extra window column blocks
    // the (single-window-expression) pattern, so this runs as a Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    val want = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("blocker", lag(col("value"), 1).over(w))
      .filter(col("rn") <= 3)
      .drop("blocker")
      .orderBy("user_id", "rn").collect()
    assert(want.length > 0 && got.length === want.length)
    assert(got.map(_.toString).sameElements(want.map(_.toString)))
  }

  test("global top-n (empty PARTITION BY) is left alone and still plans") {
    val w = Window.orderBy(col("value").desc, col("event_id"))
    val df = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.count() === 5)
  }

  test("degenerate limits are not rewritten (overflow guard)") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    def q(cond: org.apache.spark.sql.Column) =
      graft.sources.Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"))
        .withColumn("rn", row_number().over(w)).filter(cond)
    // rn < Int.MinValue: k-1 would overflow to Int.MaxValue — must stay
    // a Window and return zero rows
    val neg = q(col("rn") < Int.MinValue)
    assert(!neg.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(neg.count() === 0)
    // above the heap threshold: keep the spill-capable Window
    val huge = q(col("rn") <= 100000000)
    assert(!huge.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("rewrite survives plan-change validation (producedAttributes)") {
    withConf("spark.sql.planChangeValidation" -> "true") {
      val df = rankedQuery()
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() > 0)
    }
  }

  test("rewrite can be disabled via spark.graft.topk.rewrite.enabled") {
    withConf("spark.graft.topk.rewrite.enabled" -> "false") {
      val plan = rankedQuery().queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), s"rewrite fired while disabled:\n$plan")
    }
  }

  test("partial-phase buffer cap degrades to pass-through, results exact") {
    val want = rankedQuery().orderBy("user_id", "rn").collect()
    // cap of 4 buffered rows per partition: nearly every key overflows,
    // so most rows take the pass-through path — results must not change
    val got = withConf("graft.topk.maxBufferedRows" -> "4") {
      rankedQuery().orderBy("user_id", "rn").collect()
    }
    assert(got.length === want.length && got.length > 0)
    assert(got.map(_.toString).sameElements(want.map(_.toString)))
  }

  test("float partition keys: -0.0 and 0.0 land in one group") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    val df = Seq((0.0, 1), (-0.0, 2), (0.0, 3), (1.5, 4), (-0.0, 5)).toDF("key", "v")
    val w = Window.partitionBy(col("key")).orderBy(col("v"))
    val got = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(got.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // unnormalized keys would split the zero group by byte pattern and
    // keep all five rows; normalized: top-2 of {1,2,3,5} plus {4}
    val rows = got.collect()
    assert(rows.length === 3, rows.mkString(","))
    assert(rows.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 4)))
  }

  test("rule does NOT fire when the window has other functions") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    val plan = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("rn") <= 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"must stay a Window:\n$plan")
  }
}
