package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the r15 wiring of Projection.coords buys: an id-only
  * DSv2 scan (coords pruned — the F3/F5 semi-join shape) vs the same
  * scan also reading lat/lon, over a synthesized dense-node corpus.
  * The delta is the packed coord parse + per-row delta+double work the
  * dead flag was silently paying on every pruned scan through r14.
  * Usage: scripts/run.sh graft.tools.CoordPruneProbe [blocks]
  */
object CoordPruneProbe {
  def main(args: Array[String]): Unit = {
    val blocks = args.headOption.map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.Scratch.tempDir("graft-coordprune").toString
    val pbf = s"$dir/probe.osm.pbf"
    // synthesize also emits one way per block by default — report ITS
    // element count, not the blocks*8000 node arithmetic that understates
    // what the scan actually counts
    val totalRows = graft.sources.pbf.PbfWriter.synthesize(
      pbf, blocks = blocks, nodesPerBlock = 8000)
    def best(of: Int)(body: => Long): Double =
      (1 to of).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }.min
    def scan(cols: Seq[String]): Long =
      spark.read.format("osmpbf").load(pbf)
        .select(cols.map(col): _*).agg(count(lit(1))).head().getLong(0)
    scan(Seq("id")) // warm
    val idOnly = best(3)(scan(Seq("id")))
    val withCoords = best(3)(scan(Seq("id", "lat", "lon")))
    println(f"""{"blocks":$blocks,"rows":$totalRows,"id_only_sec":$idOnly%.2f,"id_lat_lon_sec":$withCoords%.2f,"coord_decode_share":${(withCoords - idOnly) / withCoords}%.2f}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
