package graft.sources.pbf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end slice (SURVEY.md §7): PBF → DataFrame → hive-partitioned
  * parquet → read back → the reference's own validation queries
  * (validate.py V1 dup check; indexed.rs F2 predicate + F3 semi-join).
  */
class OsmPbfSparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val fixture = "/root/reference/osmpbf/tests/test.osm.pbf"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("osmpbf-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("read produces the unified schema with 5 elements") {
    val df = OsmPbf.read(spark, fixture)
    assert(df.schema === OsmSchema.schema)
    assert(df.count() === 5)
    val byType = df.groupBy("type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("node" -> 3L, "way" -> 1L, "relation" -> 1L))
  }

  test("transcode writes hive-partitioned parquet routed by type (K1/K6)") {
    val out = java.nio.file.Files.createTempDirectory("osmparq").toString
    val counts = OsmPbf.transcode(spark, PbfConfig(input = fixture, output = out, compression = 3))
    // A1 element counters ride the write jobs (Observation API)
    assert(counts === Map("node" -> 3L, "way" -> 1L, "relation" -> 1L))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("type=node", "type=way", "type=relation"))

    val back = spark.read.parquet(out)
    assert(back.count() === 5)
    // V1: no duplicate (id, type) — validate.py:57-64
    assert(back.groupBy("id", "type").count().filter(col("count") > 1).count() === 0)
    // round-trip fidelity for the way row
    val way = back.filter(col("type") === "way").collect().head
    assert(way.getAs[Map[String, String]]("tags") === Map("building" -> "yes", "name" -> "triangle"))
  }

  test("F2/F3: tag predicate filter + broadcast semi-join for dependent nodes") {
    val df = OsmPbf.read(spark, fixture).cache()
    // F2: ways with building=yes (indexed.rs:286-297)
    val matchingWays = df.filter(col("type") === "way" &&
      col("tags").getItem("building") === "yes")
    assert(matchingWays.count() === 1)
    // F3: semi-join nodes on the matching ways' refs (indexed.rs:264-330)
    val refs = matchingWays.select(explode(col("nds.ref")).as("ref")).distinct()
    val depNodes = df.filter(col("type") === "node")
      .join(broadcast(refs), col("id") === col("ref"), "left_semi")
    assert(depNodes.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(105L, 106L, 108L))
    df.unpersist()
  }

  test("typed Dataset[OsmElement] view") {
    val ds = OsmPbf.readTyped(spark, fixture)
    val way = ds.filter(_.isWay).collect().head
    assert(way.id === 107L)
    assert(way.tag("building") === Some("yes"))
    assert(way.nds.get.map(_.ref) === Seq(105L, 106L, 108L, 105L))
    val nodeIds = ds.filter(_.isNode).map(_.id)(org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(nodeIds.toSeq === Seq(105L, 106L, 108L))
    val rel = ds.filter(_.isRelation).collect().head
    assert(rel.members.get.head.role === Some("test_role"))
  }

  test("header metadata surface (S6)") {
    val h = OsmPbf.header(spark, fixture).get
    assert(h.requiredFeatures.toSet === Set("OsmSchema-V0.6", "DenseNodes"))
  }

  test("file-target-mb derives maxRecordsPerFile from sampled row size") {
    val est = OsmPbf.estimateRowBytes(spark, fixture)
    assert(est >= 8.0 && est < 10000.0)
    val out = java.nio.file.Files.createTempDirectory("osmft").toString
    OsmPbf.transcode(spark, PbfConfig(input = fixture, output = out, fileTargetMb = Some(500)))
    assert(spark.read.parquet(out).count() === 5)
  }

  test("config validation mirrors util.rs rules") {
    assertThrows[IllegalArgumentException](
      PbfConfig(input = "/x/data.txt").validate())
    assertThrows[IllegalArgumentException](
      PbfConfig(input = "/x/a.pbf", compression = 23).validate())
    assertThrows[IllegalArgumentException](
      PbfConfig(input = "/x/a.pbf", fileTargetMb = Some(0)).validate())
    PbfConfig(input = "/x/a.osm.pbf").validate() // ok
  }
}
