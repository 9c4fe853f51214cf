package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for q41's AQE skew-join trigger: sweeps threshold/force
  * combinations over the q41 join shape and reports whether
  * OptimizeSkewedJoin fired (SMJ `skew=true` + skewed shuffle reads).
  * Usage: scripts/run.sh graft.tools.SkewProbe [sfDir]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive",
      org.apache.logging.log4j.Level.DEBUG)
    for (force <- Seq("false", "true"); thresh <- Seq("32KB", "4KB", "1KB")) {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "32")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thresh)
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force)
      // many map tasks: a skewed reduce partition splits by MAPPER chunks
      s.conf.set("spark.sql.files.maxPartitionBytes", "64KB")
      s.conf.set("spark.sql.files.openCostInBytes", "16KB")
      val hot = col("l_orderkey") % 3 === 0
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(16) // multiple MAPPERS: skew splits are mapper-chunk ranges
        .select(when(hot, lit(7L)).otherwise(col("l_orderkey")).as("k"),
          col("l_quantity"), col("l_extendedprice"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("k"), col("o_orderstatus"))
      val j = li.join(ord.hint("merge"), Seq("k"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("p"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      println(s"force=$force thresh=$thresh -> skew=${p.contains("skew=true")} " +
        s"skewedReads=${p.linesIterator.count(_.contains("skewed"))}")
      // dump per-partition shuffle sizes (reflective: mapStats is private[sql])
      def walk(n: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = n match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
        case other => other +: other.children.flatMap(walk)
      }
      walk(j.queryExecution.executedPlan).collect {
        case sq: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          val st = sq.getClass.getMethod("mapStats").invoke(sq).asInstanceOf[Option[AnyRef]]
          st.foreach { ms =>
            val sizes = ms.getClass.getMethod("bytesByPartitionId").invoke(ms)
              .asInstanceOf[Array[Long]]
            println(s"  stage ${sq.id}: n=${sizes.length} max=${sizes.max} " +
              s"sorted_top=${sizes.sorted.reverse.take(5).mkString(",")}")
          }
      }
    }
    spark.stop()
  }
}
