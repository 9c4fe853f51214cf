package graft.tools
import org.apache.spark.sql.SparkSession
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm
    graft.Tables.events(spark, dir).count()
    (1 to 5).foreach { i =>
      var t = System.nanoTime()
      val df1 = spark.read.parquet(s"$dir/events.parquet")
      val tRead = (System.nanoTime() - t) / 1e6
      t = System.nanoTime()
      val df2 = graft.Tables.events(spark, dir)
      val tTables = (System.nanoTime() - t) / 1e6
      t = System.nanoTime()
      df2.count()
      val tCount = (System.nanoTime() - t) / 1e6
      println(f"rep $i: bare read construct ${tRead}%.1fms  Tables.events construct ${tTables}%.1fms  count ${tCount}%.1fms")
    }
    spark.stop()
  }
}
