package graft.tools

import graft.sources.pbf.{OsmPbf, PbfConfig, PbfWriter}
import org.apache.spark.sql.SparkSession

/** Standalone transcode throughput probe (dev tool, not the driver bench):
  * synthesizes a planet-mix corpus (blocks arg scales it; 200 = the bench
  * probe's 4.46M elements) and prints elem/s per rep so write-path changes
  * — and corpus-size amortization — can be measured in isolation.
  *
  * Usage: TranscodeBench [reps] [blocks] [commitMode] [fileTargetMb]
  * (commitMode rename|pointer, default rename — the A/B answers whether
  * the object-store pointer protocol costs wall time: it shouldn't, the
  * task write path is identical and the commit differs only in two
  * small writes vs O(files) renames. fileTargetMb forces rotation so the
  * A/B can be taken at MANY-files scale, where both commits' O(files)
  * work — renames vs manifest+existence sweep — actually shows.)
  */
object TranscodeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val blocks = if (args.length > 1) args(1).toInt else 200
    val commitMode = if (args.length > 2) args(2) else PbfConfig.CommitRename
    val fileTargetMb = if (args.length > 3) Some(args(3).toInt) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.Scratch.tempDir("graftpbf").toString
    val warmPbf = s"$dir/warm.osm.pbf"
    PbfWriter.synthesize(warmPbf, blocks = 2, nodesPerBlock = 5000)
    OsmPbf.transcode(spark,
      PbfConfig(input = warmPbf, output = s"$dir/warmout"))
    val pbf = s"$dir/synth.osm.pbf"
    val n = PbfWriter.synthesize(pbf, blocks = blocks, nodesPerBlock = 20000,
      waysPerBlock = 2250, relationsPerBlock = 29) // planet-like mix, as in Bench
    try {
      (1 to reps).foreach { i =>
        val t = System.nanoTime()
        OsmPbf.transcode(spark,
          PbfConfig(input = pbf, output = s"$dir/out$i", commitMode = commitMode,
            fileTargetMb = fileTargetMb))
        val rate = (n / ((System.nanoTime() - t) / 1e9)).round
        // recursive: rename lays out out/type=t/part-*, pointer nests a
        // generation dir above the type dirs
        def parts(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(parts).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        val files = parts(new java.io.File(s"$dir/out$i"))
        println(s"run $i [$commitMode]: $rate elem/s ($files part files)")
        // outputs are never read back — drop each so N reps hold one
        // output's tmpfs RAM, and the dir doesn't outlive the run
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/out$i"))
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
