package graft.tools

import graft.sources.pbf._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Depth soak for the indexed two-pass query (judge ask r16#6): p01's
  * distributed ways→deps (zone-map prune + semi-join,
  * `IndexedPbf.readWaysAndDeps`) had only ever run at fixture scale. This
  * drives it at 1× (~4M elements) and 10× (~40M) over a PLANET-LAYOUT
  * corpus — node blocks first, way blocks after, the blob segregation the
  * reference's `ways_available()` pruning (indexed.rs:264-330) actually
  * sees on planet files, which the mixed-block test fixtures do not —
  * with a SELECTIVE predicate (tagged ways whose refs live in a narrow
  * id band: the "bbox extract" shape zone-map pruning exists for) and a
  * NON-SELECTIVE one (every way: the worst case, where pass 2 degrades
  * to a full node scan + a big semi-join).
  *
  * Reported per (scale, predicate): index-build wall, best-of-2 query
  * wall, shuffle MB, output rows, and the pass-1/pass-2 prune ratios from
  * `IndexedPbf.lastPrune`. The scale read: selective wall should scale
  * with pass-1 (way blobs) + O(selected), its node-blob prune ratio
  * should stay ~constant; non-selective shuffle grows with the ref set —
  * the honest cost of asking for everything.
  *
  * Usage: scripts/run.sh graft.tools.IndexedDepthSoak [outJson]
  */
object IndexedDepthSoak {

  /** Planet-layout corpus: `nodeBlocks` dense-node blocks (ids dense from
    * 1) followed by `wayBlocks` way blocks. Every 97th way is tagged
    * motorway and refs 16 nodes from the FIRST 2% of the id space (the
    * spatially-local query target); the rest are residential and stride
    * across the whole space. */
  private def synthesize(path: String, nodeBlocks: Int, wayBlocks: Int): Long = {
    import PbfWriter._
    val nodesPerBlock = 8000
    val waysPerBlock = 1000
    val nNodes = nodeBlocks.toLong * nodesPerBlock
    val band = math.max(nNodes / 50, 32L) // the selective refs' narrow home
    var wid = 1000000000L
    val payloads =
      (0 until nodeBlocks).iterator.map { b =>
        val base = b.toLong * nodesPerBlock
        primitiveBlock((0 until nodesPerBlock).map { i =>
          val id = base + i + 1
          DenseNode(id, 52000000000L + id * 37, 11000000000L + id * 53,
            if (i % 500 == 0) Seq("amenity" -> "bench") else Nil,
            1, 1049522828000L + id, 7L, 17, s"u${b % 13}")
        })
      } ++ (0 until wayBlocks).iterator.map { w =>
        primitiveBlock(Nil, ways = (0 until waysPerBlock).map { i =>
          wid += 1
          val k = w.toLong * waysPerBlock + i
          if (k % 97 == 0) {
            val at = (k * 16339L) % (band - 16)
            WayData(wid, (0L until 16L).map(j => at + j + 1),
              Seq("highway" -> "motorway"))
          } else {
            val at = (k * 16339L) % (nNodes - 16)
            WayData(wid, (0L until 16L).map(j => at + j + 1),
              Seq("highway" -> "residential"))
          }
        })
      }
    writeFile(path, payloads.toSeq)
    nNodes + wayBlocks.toLong * waysPerBlock
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r17_indexed.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-indexed-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scales = Seq(
      ("1x", 450, 40),    // 3.6M nodes + 40k ways
      ("10x", 4500, 400)) // 36M nodes + 400k ways
    val preds = Seq(
      ("selective", element_at(col("tags"), "highway") === "motorway"),
      ("nonselective", lit(true)))

    val legs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    scales.foreach { case (tag, nb, wb) =>
      val dir = graft.Scratch.tempDir(s"graft-idxsoak-$tag").toString
      try {
        val pbf = s"$dir/planet-$tag.osm.pbf"
        val tSynth0 = System.nanoTime()
        val elems = synthesize(pbf, nb, wb)
        val synthSec = (System.nanoTime() - tSynth0) / 1e9
        val tIdx0 = System.nanoTime()
        val idx = IndexedPbf.index(spark, pbf)
        val idxSec = (System.nanoTime() - tIdx0) / 1e9
        println(f"$tag: $elems elems, ${idx.size} blobs, synth $synthSec%.1fs index $idxSec%.1fs")
        preds.foreach { case (pname, pred) =>
          val runs = (1 to 2).map { _ =>
            ScaleProbe.measure(spark) {
              IndexedPbf.readWaysAndDeps(spark, pbf, pred).count()
            }
          }
          val best = runs.minBy(_.secs)
          val prune = IndexedPbf.lastPrune.get()
          val pruneJ = prune.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""$k":$v""" }.mkString(",")
          legs(s"${tag}_$pname") =
            f"""{"elements":$elems,"index_blobs":${idx.size},"index_sec":$idxSec%.2f,""" +
            f""""wall_sec":${best.secs}%.2f,"walls":[${runs.map(r => f"${r.secs}%.2f").mkString(",")}],""" +
            f""""shuffle_mb":${best.shuffleMb},"rows":${best.rows},""" +
            f""""cpu_steal_pct":${best.stealPct},"cpu_sys_pct":${best.sysPct},$pruneJ}"""
          println(s"$tag/$pname: ${legs(s"${tag}_$pname")}")
        }
      } finally {
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        catch { case _: Throwable => () }
        graft.Scratch.untrack(dir)
      }
    }
    val json =
      s"""{"note":"indexed two-pass ways+deps at depth over a planet-layout corpus (node blocks then way blocks); prune ratios from IndexedPbf.lastPrune; selective = motorway tag with refs in the first 2pct of id space, nonselective = all ways",""" +
      legs.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
