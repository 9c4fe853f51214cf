package graft.operators

import graft.sources.pbf.{IndexedPbf, PbfWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PBF-native query surface entries (SURVEY.md §2 F-operators over the raw
  * PBF, no transcode): the reference's `read_ways_and_deps` two-pass pruned
  * semi-join (osmpbf/src/indexed.rs:264-330).
  *
  * Input is a deterministic synthesized PBF (the sf tables hold no PBF
  * data), so the entry is declared rows-only for the driver; exact-result
  * coverage lives in IndexedPbfSpec, including an oracle comparison against
  * the same query over transcoded parquet.
  */
object PbfQueries {

  /** 4 disjoint node blocks + 1 way block; only the first node block is
    * referenced by the matching way, so the indexed path must prune 3 of 4
    * node blobs. */
  private lazy val pbfPath: String = {
    import PbfWriter._
    val dir = java.nio.file.Files.createTempDirectory("graft-pbf-q").toString
    val path = s"$dir/ways_deps.osm.pbf"
    def nodeBlock(base: Long): Array[Byte] = primitiveBlock(
      (0 until 500).map(i => DenseNode(base + i, 52000000000L + i * 1000,
        11000000000L + i * 700, Nil, 1, 0L, 1L, 1, "u")))
    val ways = primitiveBlock(Nil,
      Seq(WayData(900001L, Seq(1005L, 1006L, 1007L), Seq("highway" -> "primary")),
          WayData(900002L, Seq(7007L), Seq("note" -> "unmatched"))))
    writeFile(path, Seq(nodeBlock(1000), nodeBlock(2000), nodeBlock(3000),
      nodeBlock(4000), ways))
    path
  }

  def p01_ways_and_deps(spark: SparkSession, sfDir: String): DataFrame =
    IndexedPbf.readWaysAndDeps(spark, pbfPath,
        col("tags").getItem("highway") === "primary")
      .select("id", "type")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_ways_and_deps" -> (p01_ways_and_deps(_, _)))
}
