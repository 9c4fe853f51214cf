package graft.tools

import graft.sources.pbf.{OsmPbf, PbfConfig, PbfWriter}
import org.apache.spark.sql.SparkSession

/** Standalone transcode throughput probe (dev tool, not the driver bench):
  * synthesizes the same 4M-element corpus Bench uses and prints elem/s for
  * each of `reps` runs so write-path changes can be measured in isolation.
  */
object TranscodeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shm = java.nio.file.Paths.get("/dev/shm")
    val dir = (if (java.nio.file.Files.isWritable(shm)) java.nio.file.Files.createTempDirectory(shm, "graftpbf") else java.nio.file.Files.createTempDirectory("graftpbf")).toString
    val warmPbf = s"$dir/warm.osm.pbf"
    PbfWriter.synthesize(warmPbf, blocks = 2, nodesPerBlock = 5000)
    OsmPbf.transcode(spark,
      PbfConfig(input = warmPbf, output = s"$dir/warmout"))
    val pbf = s"$dir/synth.osm.pbf"
    val n = PbfWriter.synthesize(pbf, blocks = 200, nodesPerBlock = 20000,
      waysPerBlock = 2250, relationsPerBlock = 29) // planet-like mix, as in Bench
    (1 to reps).foreach { i =>
      val t = System.nanoTime()
      OsmPbf.transcode(spark,
        PbfConfig(input = pbf, output = s"$dir/out$i"))
      val rate = (n / ((System.nanoTime() - t) / 1e9)).round
      println(s"run $i: $rate elem/s")
    }
    spark.stop()
  }
}
