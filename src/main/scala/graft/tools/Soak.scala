package graft.tools
import graft.sources.pbf._
import org.apache.spark.sql.SparkSession
object Soak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "soak").toString
    try {
      val pbf = s"$dir/big.osm.pbf"
      val n = PbfWriter.synthesize(pbf, blocks = 900, nodesPerBlock = 20000,
        waysPerBlock = 2250, relationsPerBlock = 29)
      println(s"corpus: $n elements")
      val t = System.nanoTime()
      val counts = OsmPbf.transcode(spark, PbfConfig(input = pbf, output = s"$dir/out",
        fileTargetMb = Some(64)))
      val secs = (System.nanoTime() - t) / 1e9
      println(f"soak: ${n / secs}%.0f elem/s over $secs%.1f s, counts=$counts")
      val back = spark.read.parquet(s"$dir/out")
      val byType = back.groupBy("type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"readback: $byType")
      assert(byType.values.sum == n, "element count mismatch!")
      val files = new java.io.File(s"$dir/out/type=node").listFiles().count(_.getName.endsWith(".parquet"))
      println(s"node files: $files (rotation active: ${files > 1})")
      println("SOAK OK")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
