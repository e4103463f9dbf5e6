package graft.tools

import org.apache.spark.sql.types.DecimalType
import graft.{GraftSession, SparkEntry}

/** Walks every registered op's OUTPUT schema at a tiny SF and prints any
  * DecimalType field — the class the driver compare is version-sensitive
  * to (decimals are intermediates only; emit DOUBLE or BIGINT).
  * usage: runMain graft.tools.SchemaScan [sfDir]
  */
object SchemaScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.allOps.foreach { op =>
      try {
        val dec = op.run(spark, sfDir).schema.fields
          .filter(_.dataType.isInstanceOf[DecimalType])
        if (dec.nonEmpty) {
          bad += 1
          println(s"DECIMAL ${op.name}: " + dec.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
        }
      } catch {
        case e: Throwable => println(s"ERROR ${op.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"scan done, flagged=$bad")
    spark.stop()
  }
}
