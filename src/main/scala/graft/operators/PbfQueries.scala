package graft.operators

import graft.sources.pbf.{IndexedPbf, OsmPbf, PbfConfig, PbfWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PBF-native query surface entries (SURVEY.md §2 F-operators over the raw
  * PBF, no transcode): the reference's `read_ways_and_deps` two-pass pruned
  * semi-join (osmpbf/src/indexed.rs:264-330) plus a LocationsOnWays
  * consumer query.
  *
  * Inputs are deterministic synthesized PBFs (the sf tables hold no PBF
  * data). Both entries are FULL oracle rows: each query transcodes its own
  * input PBF to a deterministic parquet path once per JVM, and the DuckDB
  * oracle replays the same semantics over that parquet via `read_parquet`
  * — INDEPENDENT QUERY SEMANTICS over the self-transcoded twin. (The twin
  * comes from this engine's own transcode, so the gate proves PBF-native
  * execution ≡ transcode-then-query; DECODE ground truth is carried
  * separately by the golden-fixture specs over the reference's own PBFs —
  * PbfRoundTripSpec/IndexedPbfSpec.)
  */
object PbfQueries {

  /** Deterministic parquet twins for the DuckDB oracle, transcoded once
    * to CONTENT-FINGERPRINTED paths (the oracle SQL embeds them). The
    * fingerprint covers the input PBF bytes and the transcode output
    * schema, so a stale output from an OLDER code version (different
    * schema or different synthesized input) lands at a different path and
    * can never silently feed the oracle; a completed twin is marked with
    * a sentinel file and never rewritten, so the gate's later DuckDB read
    * can't race a re-transcode's delete+rename commit window. */
  /** Per-user root: on a shared box another user cannot pre-create (squat)
    * the twin path the gate trusts, because each user resolves a
    * different directory. */
  val OracleRoot: String =
    s"/tmp/graft_oracle-${System.getProperty("user.name", "anon")}"

  /** md5(input pbf bytes ++ output schema), 12 hex chars — the twin-path
    * fingerprint. */
  private def fingerprint(pbf: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pbf)))
    md.update(graft.sources.pbf.OsmSchema.schema.catalogString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.digest().map("%02x".format(_)).mkString.take(12)
  }

  private val CompleteMarker = "_GRAFT_ORACLE_OK"
  private val dumped = scala.collection.mutable.Set[String]()
  private def ensureTranscoded(spark: SparkSession, key: String, pbf: String): String =
    synchronized {
      val out = oraclePath(key, pbf)
      if (!dumped.contains(out)) {
        // `synchronized` serializes threads in THIS JVM; the OS file lock
        // serializes other processes (e.g. a dev DumpQuery run while a
        // Bench warmup runs p01). Under the lock: if a prior run already
        // completed this fingerprint (sentinel present), SKIP — the
        // content is fully determined by the path, so rewriting could
        // only race a concurrent gate read through the commit's
        // delete+rename window. Otherwise transcode and mark complete
        // before releasing the lock.
        new java.io.File(OracleRoot).mkdirs()
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(OracleRoot, s".$key.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock()
          try {
            val marker = java.nio.file.Paths.get(out, CompleteMarker)
            if (!java.nio.file.Files.exists(marker)) {
              OsmPbf.transcode(spark, PbfConfig(input = pbf, output = out),
                onProgress = _ => ())
              java.nio.file.Files.createFile(marker)
            }
          } finally lock.release()
        } finally ch.close()
        dumped += out
      }
      out
    }

  private def oraclePath(key: String, pbf: String): String =
    s"$OracleRoot/$key-${fingerprint(pbf)}"
  private lazy val p01Out = oraclePath("p01", pbfPath)
  private lazy val p02Out = oraclePath("p02", locPbfPath)

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

  def p01_ways_and_deps(spark: SparkSession, sfDir: String): DataFrame = {
    ensureTranscoded(spark, "p01", pbfPath)
    IndexedPbf.readWaysAndDeps(spark, pbfPath,
        col("tags").getItem("highway") === "primary")
      .select("id", "type")
  }

  /** LocationsOnWays consumer input: node blocks plus ways that carry the
    * optional per-ref lat/lon arrays (values = the referenced nodes' own
    * nanodegree coordinates, the feature's contract). One single-ref way
    * pins the zero-segment edge. All coordinates are multiples of the
    * block granularity (100), so decode is exact in both paths. */
  private lazy val locPbfPath: String = {
    import PbfWriter._
    val dir = java.nio.file.Files.createTempDirectory("graft-pbf-loc").toString
    val path = s"$dir/loc_ways.osm.pbf"
    def latOf(id: Long) = 52000000000L + id * 1000
    def lonOf(id: Long) = 11000000000L + id * 700
    def nodeBlock(base: Long): Array[Byte] = primitiveBlock(
      (0 until 300).map(i => DenseNode(base + i, latOf(base + i),
        lonOf(base + i), Nil, 1, 0L, 1L, 1, "u")))
    val ways = (0 until 24).map { w =>
      val base = if (w % 2 == 0) 1000L else 2000L
      val refs = (0 until (if (w == 23) 1 else 3 + w % 9))
        .map(i => base + (w * 7 + i * 3) % 300)
      WayData(800000L + w, refs, Seq("highway" -> "service"),
        locations = Some(refs.map(r => (latOf(r), lonOf(r)))))
    }
    writeFile(path, Seq(nodeBlock(1000), nodeBlock(2000),
      primitiveBlock(Nil, ways)))
    path
  }

  /** p02: way geometry lengths computed DIRECTLY from the LocationsOnWays
    * `node_locations` column — the feature's point: no nodes⋈refs join,
    * no shuffle, a single narrow scan→project stage (at planet scale the
    * join-based construction shuffles the whole node corpus; this reads
    * one column of the ways). Lengths are integer-nanodegree Manhattan
    * sums, so the result is partitioning- and float-order-invariant.
    *
    * The DuckDB oracle computes the SAME lengths the expensive way — by
    * joining each way's `nds` refs to the transcoded node coordinates —
    * proving decode-from-way ≡ join-to-nodes on every row, hash-checked.
    */
  def p02_way_lengths(spark: SparkSession, sfDir: String): DataFrame = {
    ensureTranscoded(spark, "p02", locPbfPath)
    spark.read.format("osmpbf").option("wayLocations", "true").load(locPbfPath)
      .filter(col("type") === "way")
      .select(col("id"),
        expr("""aggregate(
            zip_with(slice(node_locations, 1, size(node_locations) - 1),
                     slice(node_locations, 2, size(node_locations) - 1),
              (a, b) -> abs(cast(round(b.lat * 1e9) as bigint) - cast(round(a.lat * 1e9) as bigint))
                      + abs(cast(round(b.lon * 1e9) as bigint) - cast(round(a.lon * 1e9) as bigint))),
            cast(0 as bigint), (acc, x) -> acc + x)""").as("length_nano"),
        size(col("node_locations")).as("n_points"))
      .orderBy("id")
  }

  /** p03: bbox scan + Z-order (Morton) key derivation over the nodes —
    * the clustering key behind [[graft.functions.ZOrder.zorderWrite]].
    * The DuckDB oracle recomputes the ENTIRE key — quantization double
    * math and the five mask-and-shift spread steps — in SQL over the
    * transcoded twin, so the bit-interleave semantics are hash-checked
    * against an independent engine, not just a Scala twin. The layout
    * payoff (row-group pruning under a bbox filter, z-ordered vs
    * spatially shuffled) is measured in `ZOrderSpec` from parquet footer
    * statistics. */
  def p03_zorder_bbox(spark: SparkSession, sfDir: String): DataFrame = {
    ensureTranscoded(spark, "p01", pbfPath)
    spark.read.format("osmpbf").load(pbfPath)
      .filter(col("type") === "node" &&
        col("lat").between(52.0, 52.0002) && col("lon").between(11.0, 11.00014))
      .select(col("id"),
        graft.functions.ZOrder.mortonKey(col("lat"), col("lon")).as("zkey"))
      .orderBy("id")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_ways_and_deps" -> (p01_ways_and_deps(_, _)),
    "p02_way_lengths" -> (p02_way_lengths(_, _)),
    "p03_zorder_bbox" -> (p03_zorder_bbox(_, _)))

  /** DuckDB twins over the transcoded parquet at the fingerprinted
    * [[OracleRoot]] subpaths (dumped by the queries themselves before
    * they return; the paths resolve at dump time, so the SQL always
    * points at the twin THIS code version produced). */
  lazy val oracles: Map[String, String] = Map(
    // ways matching the predicate + their dependent nodes (indexed.rs
    // semantics); map value extraction is m[k][1] in DuckDB
    "p01_ways_and_deps" ->
      s"""WITH t AS (
         |  SELECT * FROM read_parquet('$p01Out/type=*/*.parquet',
         |                             hive_partitioning = 1)
         |), w AS (
         |  SELECT * FROM t WHERE type = 'way' AND tags['highway'][1] = 'primary'
         |), r AS (
         |  SELECT DISTINCT unnest(nds).ref AS ref FROM w
         |)
         |SELECT id, CAST(type AS VARCHAR) AS type FROM w
         |UNION ALL
         |SELECT t.id, CAST(t.type AS VARCHAR) AS type
         |FROM t JOIN r ON t.id = r.ref WHERE t.type = 'node'""".stripMargin,
    // join-based way lengths: per-way consecutive ref pairs (positional
    // unnest of the two slices) joined to node coords, integer Manhattan
    "p02_way_lengths" ->
      s"""WITH w AS (
         |  SELECT id, nds FROM read_parquet('$p02Out/type=way/*.parquet')
         |), seg AS (
         |  SELECT id, unnest(nds[1:len(nds)-1]).ref AS a,
         |         unnest(nds[2:len(nds)]).ref AS b
         |  FROM w
         |), n AS (
         |  SELECT id AS nid, CAST(round(lat * 1e9) AS BIGINT) AS latn,
         |         CAST(round(lon * 1e9) AS BIGINT) AS lonn
         |  FROM read_parquet('$p02Out/type=node/*.parquet')
         |), d AS (
         |  SELECT seg.id, abs(nb.latn - na.latn) + abs(nb.lonn - na.lonn) AS m
         |  FROM seg JOIN n na ON seg.a = na.nid JOIN n nb ON seg.b = nb.nid
         |)
         |SELECT w.id, COALESCE(CAST(sum(d.m) AS BIGINT), 0) AS length_nano,
         |       CAST(len(w.nds) AS INTEGER) AS n_points
         |FROM w LEFT JOIN d ON w.id = d.id
         |GROUP BY w.id, len(w.nds)
         |ORDER BY w.id""".stripMargin,
    // Morton key, recomputed from scratch in SQL: identical quantization
    // arithmetic (same operations, same association order, so the IEEE
    // doubles — and therefore the floor cells — are bit-identical), then
    // the same five-step spread cascade on each axis. Masks are the
    // decimal forms of 0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF,
    // 0x0F0F0F0F0F0F0F0F, 0x3333333333333333, 0x5555555555555555.
    "p03_zorder_bbox" ->
      s"""WITH n AS (
         |  SELECT id, lat, lon FROM read_parquet('$p01Out/type=node/*.parquet')
         |  WHERE lat BETWEEN 52.0 AND 52.0002 AND lon BETWEEN 11.0 AND 11.00014
         |), q AS (
         |  SELECT id,
         |    LEAST(67108863, GREATEST(0,
         |      CAST(floor((lat - -90.0) / 180.0 * 67108864.0) AS BIGINT))) AS y,
         |    LEAST(67108863, GREATEST(0,
         |      CAST(floor((lon - -180.0) / 360.0 * 67108864.0) AS BIGINT))) AS x
         |  FROM n
         |), s1 AS (
         |  SELECT id, (y | (y << 16)) & 281470681808895 AS y,
         |             (x | (x << 16)) & 281470681808895 AS x FROM q
         |), s2 AS (
         |  SELECT id, (y | (y << 8)) & 71777214294589695 AS y,
         |             (x | (x << 8)) & 71777214294589695 AS x FROM s1
         |), s3 AS (
         |  SELECT id, (y | (y << 4)) & 1085102592571150095 AS y,
         |             (x | (x << 4)) & 1085102592571150095 AS x FROM s2
         |), s4 AS (
         |  SELECT id, (y | (y << 2)) & 3689348814741910323 AS y,
         |             (x | (x << 2)) & 3689348814741910323 AS x FROM s3
         |), s5 AS (
         |  SELECT id, (y | (y << 1)) & 6148914691236517205 AS y,
         |             (x | (x << 1)) & 6148914691236517205 AS x FROM s4
         |)
         |SELECT id, (y << 1) | x AS zkey FROM s5 ORDER BY id""".stripMargin,
  )
}
