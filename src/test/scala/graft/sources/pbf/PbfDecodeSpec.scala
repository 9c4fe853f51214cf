package graft.sources.pbf

import java.io.FileInputStream
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture decode tests against the reference's checked-in PBFs
  * (read-only at /root/reference/osmpbf/tests/). Expected values come from
  * osmpbf/tests/read.rs:118-210 and tests/test.osm — this is the same
  * correctness bar the reference library holds itself to.
  *
  * The three test.osm variants deliberately cover both compression paths
  * (zlib / raw) and both node encodings (dense / sparse).
  */
class PbfDecodeSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/osmpbf/tests"

  private def readFile(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  private def decodeAll(path: String): Seq[org.apache.spark.sql.Row] = {
    val in = new FileInputStream(path)
    val spans = try Blobs.enumerate(in) finally in.close()
    val bytes = readFile(path)
    spans.filter(_.blobType == Blobs.TypeOsmData).flatMap { s =>
      val body = java.util.Arrays.copyOfRange(bytes, s.offset.toInt, s.offset.toInt + s.length)
      BlockDecoder.decodeBlock(Blobs.decode(body)).toSeq
    }
  }

  private def fieldIdx(name: String): Int = OsmSchema.schema.fieldIndex(name)

  for (file <- Seq("test.osm.pbf", "test_nozlib.osm.pbf", "test_nozlib_nodense.osm.pbf")) {
    test(s"$file decodes to 3 nodes, 1 way, 1 relation with golden values") {
      val rows = decodeAll(s"$fixtures/$file")
      val byType = rows.groupBy(_.getString(fieldIdx("type")))
      assert(byType("node").size === 3)
      assert(byType("way").size === 1)
      assert(byType("relation").size === 1)

      val nodes = byType("node").sortBy(_.getLong(0))
      assert(nodes.map(_.getLong(0)) === Seq(105L, 106L, 108L))
      // golden coords from read.rs:128-145
      assert(math.abs(nodes(1).getDouble(fieldIdx("lat")) - 52.11992359584) < 1e-6)
      assert(math.abs(nodes(1).getDouble(fieldIdx("lon")) - 11.62564468943) < 1e-6)
      assert(math.abs(nodes(2).getDouble(fieldIdx("lat")) - 52.11989910567) < 1e-6)
      assert(math.abs(nodes(2).getDouble(fieldIdx("lon")) - 11.63101926915) < 1e-6)
      // uid 17, visible true, user testuser, version 1 (test.osm)
      nodes.foreach { n =>
        assert(n.getInt(fieldIdx("uid")) === 17)
        assert(n.getBoolean(fieldIdx("visible")))
        assert(n.getString(fieldIdx("user")) === "testuser")
        assert(n.getInt(fieldIdx("version")) === 1)
      }
      // node timestamps: 2003-04-05T06:07:08/09/10Z (test.osm)
      val ts = nodes.map(_.getAs[java.time.LocalDateTime](fieldIdx("timestamp")))
      assert(ts.map(_.getSecond) === Seq(8, 9, 10))
      assert(ts.head === java.time.LocalDateTime.of(2003, 4, 5, 6, 7, 8))

      val way = byType("way").head
      assert(way.getLong(0) === 107L)
      val wayTags = way.getAs[Map[String, String]](fieldIdx("tags"))
      assert(wayTags === Map("building" -> "yes", "name" -> "triangle"))
      val nds = way.getAs[Seq[org.apache.spark.sql.Row]](fieldIdx("nds"))
      assert(nds.map(_.getLong(0)) === Seq(105L, 106L, 108L, 105L))
      assert(way.isNullAt(fieldIdx("lat")) && way.isNullAt(fieldIdx("lon")))

      val rel = byType("relation").head
      assert(rel.getLong(0) === 120L)
      assert(rel.getAs[Map[String, String]](fieldIdx("tags")) === Map("rel_key" -> "rel_value"))
      val members = rel.getAs[Seq[org.apache.spark.sql.Row]](fieldIdx("members"))
      assert(members.size === 1)
      assert(members.head.getString(0) === "way")
      assert(members.head.getLong(1) === 107L)
      assert(members.head.getString(2) === "test_role")
    }
  }

  test("header block decodes features and bbox") {
    val path = s"$fixtures/test.osm.pbf"
    val in = new FileInputStream(path)
    val spans = try Blobs.enumerate(in) finally in.close()
    val bytes = readFile(path)
    val h = spans.find(_.blobType == Blobs.TypeOsmHeader).map { s =>
      val body = java.util.Arrays.copyOfRange(bytes, s.offset.toInt, s.offset.toInt + s.length)
      BlockDecoder.decodeHeader(Blobs.decode(body))
    }.get
    assert(h.requiredFeatures.toSet === Set("OsmSchema-V0.6", "DenseNodes"))
    assert(h.optionalFeatures.isEmpty)
  }

  test("history file: first node deleted (visible=false), second visible") {
    val rows = decodeAll(s"$fixtures/deleted_nodes.osh.pbf")
    val nodes = rows.filter(_.getString(fieldIdx("type")) == "node")
    // read.rs:370-371: node[0] invisible, node[1] visible
    assert(nodes.size === 2)
    assert(!nodes(0).getBoolean(fieldIdx("visible")))
    assert(nodes(1).getBoolean(fieldIdx("visible")))
  }

  test("LocationsOnWays file still decodes way refs (locations ignored like the reference app)") {
    val rows = decodeAll(s"$fixtures/loc_on_ways.osm.pbf")
    val way = rows.filter(_.getString(fieldIdx("type")) == "way").head
    val nds = way.getAs[Seq[org.apache.spark.sql.Row]](fieldIdx("nds"))
    assert(nds.map(_.getLong(0)) === Seq(105L, 106L, 108L, 105L))
    assert(way.isNullAt(fieldIdx("lat")))
    // default schema carries no node_locations column at all
    assert(way.size === OsmSchema.schema.length)
  }

  test("wayLocations projection decodes LocationsOnWays coords (read.rs:418-509 golden)") {
    val path = s"$fixtures/loc_on_ways.osm.pbf"
    val in = new FileInputStream(path)
    val spans = try Blobs.enumerate(in) finally in.close()
    val bytes = readFile(path)
    val proj = BlockDecoder.FullProjection.copy(wayLocs = true)
    val rows = spans.filter(_.blobType == Blobs.TypeOsmData).flatMap { s =>
      val body = java.util.Arrays.copyOfRange(bytes, s.offset.toInt, s.offset.toInt + s.length)
      BlockDecoder.decodeBlock(Blobs.decode(body), proj).toSeq
    }
    val li = OsmSchema.schemaWithWayLocations.fieldIndex("node_locations")

    // header declares the feature (check_header_block_content's
    // LOC_ON_WAYS_FILE_PATH expectation)
    val header = spans.find(_.blobType == Blobs.TypeOsmHeader).map { s =>
      val body = java.util.Arrays.copyOfRange(bytes, s.offset.toInt, s.offset.toInt + s.length)
      BlockDecoder.decodeHeader(Blobs.decode(body))
    }.get
    assert(header.optionalFeatures.contains("LocationsOnWays"))

    val way = rows.filter(_.getString(fieldIdx("type")) == "way").head
    assert(way.getLong(0) === 107L)
    val nds = way.getAs[Seq[org.apache.spark.sql.Row]](fieldIdx("nds"))
    assert(nds.map(_.getLong(0)) === Seq(105L, 106L, 108L, 105L))
    val locs = way.getAs[Seq[org.apache.spark.sql.Row]](li)
    // nano-degree goldens from osmpbf/tests/read.rs:418-485; our column
    // stores degrees = 1e-9 × nano with identical integer arithmetic, so
    // equality is exact
    val nanoLat = Seq(52122403100L, 52119923500L, 52119899100L, 52122403100L)
    val nanoLon = Seq(11628401700L, 11625644600L, 11631019200L, 11628401700L)
    assert(locs.size === 4)
    assert(locs.map(_.getDouble(0)) === nanoLat.map(1e-9 * _))
    assert(locs.map(_.getDouble(1)) === nanoLon.map(1e-9 * _))

    // nodes/relations carry a null node_locations; the relation row from
    // blob 2 still decodes its member role (read.rs:496-509)
    val rel = rows.filter(_.getString(fieldIdx("type")) == "relation").head
    assert(rel.isNullAt(li))
    val members = rel.getAs[Seq[org.apache.spark.sql.Row]](fieldIdx("members"))
    assert(members.map(_.getString(2)) === Seq("test_role"))
  }

  test("way lat/lon in EXPANDED encoding decode and skip correctly") {
    // protobuf spec: a packed-declared repeated field may arrive expanded
    // (one tagged varint per value) and occurrences concatenate. Build a
    // way whose lat values are expanded wire-0 zigzags and whose lon
    // values are a packed wire-2 payload — both must decode, and the
    // pruned path must skip the expanded values by wire type (a
    // length-prefix skip would desynchronize the cursor).
    import PbfWriter.MessageBuilder
    val wm = new MessageBuilder
    wm.writeVarintField(1, 42L) // id
    wm.writePackedZigzag(8, Seq(7L, 1L)) // refs delta -> 7, 8
    wm.writeZigzagField(9, 100L) // lat deltas, expanded
    wm.writeZigzagField(9, 5L)
    wm.writePackedZigzag(10, Seq(200L, -3L)) // lon deltas, packed
    val group = new MessageBuilder
    group.writeMessageField(3, wm)
    val st = new MessageBuilder
    st.writeBytesField(1, Array.empty[Byte]) // string table index 0
    val block = new MessageBuilder
    block.writeMessageField(1, st)
    block.writeMessageField(2, group)
    val payload = block.result()

    // default projection: expanded lat values are SKIPPED (wire-0), and
    // the fields after them (none here, but the cursor must stay sane)
    val plain = BlockDecoder.decodeBlock(payload).toSeq
    assert(plain.size === 1)
    assert(plain.head.getLong(0) === 42L)
    assert(plain.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      fieldIdx("nds")).map(_.getLong(0)) === Seq(7L, 8L))

    // wayLocations projection: cumulative sums with default granularity
    // 100, offsets 0 -> degrees = 1e-9 * 100 * cum
    val locs = BlockDecoder.decodeBlock(payload,
        BlockDecoder.FullProjection.copy(wayLocs = true)).toSeq.head
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
        OsmSchema.schemaWithWayLocations.fieldIndex("node_locations"))
    assert(locs.map(_.getDouble(0)) === Seq(100L, 105L).map(c => 1e-9 * 100 * c))
    assert(locs.map(_.getDouble(1)) === Seq(200L, 197L).map(c => 1e-9 * 100 * c))
  }

  test("blob enumeration caps and framing") {
    val in = new FileInputStream(s"$fixtures/test.osm.pbf")
    val spans = try Blobs.enumerate(in) finally in.close()
    assert(spans.size === 2)
    assert(spans.head.blobType === Blobs.TypeOsmHeader)
    assert(spans(1).blobType === Blobs.TypeOsmData)
    // shallow body scan captures the decoded size without decompressing
    assert(spans(1).rawSize > spans(1).length) // zlib'd fixture: raw > compressed
    assert(spans(1).rawSize === Blobs.decode({
      val f = new java.io.RandomAccessFile(s"$fixtures/test.osm.pbf", "r")
      try {
        f.seek(spans(1).offset)
        val b = new Array[Byte](spans(1).length); f.readFully(b); b
      } finally f.close()
    }).length)
  }

  test("task groups are weighted by decoded size, not blob count") {
    def span(i: Int, raw: Int): Blobs.BlobSpan =
      Blobs.BlobSpan(i * 100L, 10, Blobs.TypeOsmData, rawSize = raw)
    // 100 tiny-compressed blobs decoding to 1MB each, 4MB target → 4/group:
    // the old 8MB-per-blob assumption would have serialized these 12×
    val even = OsmPbf.groupSpans((0 until 100).map(span(_, 1 << 20)), 4L << 20)
    assert(even.size === 25)
    assert(even.forall(_.length === 4))
    // unknown raw size falls back to the format's 32MB worst case → 1/group
    val unknown = OsmPbf.groupSpans(
      (0 until 10).map(i => Blobs.BlobSpan(i * 100L, 10, Blobs.TypeOsmData)), 64L << 20)
    assert(unknown.size === 5)
    // a single blob never splits, however large its decoded payload
    val huge = OsmPbf.groupSpans(Seq(span(0, 32 << 20)), 1L << 20)
    assert(huge.size === 1 && huge.head.length === 1)
  }

  test("packed repeated fields CONCATENATE across occurrences (protobuf spec)") {
    import PbfWriter.MessageBuilder
    // DenseNodes with ids/lats/lons each split across TWO packed
    // occurrences; the delta chain must continue across the split
    val dense = new MessageBuilder
    dense.writePackedZigzag(1, Seq(100L, 1L))  // ids 100, 101
    dense.writePackedZigzag(1, Seq(1L, 1L))    // ids 102, 103
    dense.writePackedZigzag(8, Seq(520000000L, 1000L))
    dense.writePackedZigzag(8, Seq(1000L, 1000L))
    dense.writePackedZigzag(9, Seq(110000000L, 1000L))
    dense.writePackedZigzag(9, Seq(1000L, 1000L))
    val group = new MessageBuilder
    group.writeMessageField(2, dense)
    val block = new MessageBuilder
    block.writeMessageField(1, new MessageBuilder) // empty stringtable
    block.writeMessageField(2, group)
    val rows = BlockDecoder.decodeBlock(block.result()).toSeq
    assert(rows.map(_.getLong(0)) === Seq(100L, 101L, 102L, 103L))
    val lat = fieldIdx("lat")
    // 4 continuous 100-nanodegree-granularity steps, no reset at the split
    val lats = rows.map(_.getDouble(lat))
    assert(lats.zip(lats.tail).forall { case (a, b) => math.abs(b - a - 1e-4) < 1e-9 },
      lats.toString)
    // the id-only zone-map walk shares the accumulator rule
    val ranges = BlockDecoder.idRanges(block.result())
    assert(ranges.nodeMin === 100L && ranges.nodeMax === 103L)
  }

  test("pruned coords skip the coordinate decode (null lat/lon, ids intact)") {
    import PbfWriter._
    val block = primitiveBlock((0 until 5).map(i =>
      DenseNode(10L + i, 52000000000L + i, 11000000000L + i, Nil, 1, 0L, 1L, 1, "u")))
    val proj = BlockDecoder.Projection(coords = false)
    val rows = BlockDecoder.decodeBlock(block, proj).toSeq
    assert(rows.map(_.getLong(0)) === (10L until 15L))
    val (lat, lon) = (fieldIdx("lat"), fieldIdx("lon"))
    assert(rows.forall(r => r.isNullAt(lat) && r.isNullAt(lon)))
  }

  test("zlib stream shorter or longer than declared raw_size fails typed") {
    import PbfWriter.MessageBuilder
    def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val out = new Array[Byte](data.length * 2 + 64)
      val n = d.deflate(out); d.end()
      java.util.Arrays.copyOf(out, n)
    }
    val payload = Array.fill[Byte](100)(3)
    def blob(declared: Int): Array[Byte] = {
      val b = new MessageBuilder
      b.writeVarintField(2, declared.toLong)
      b.writeBytesField(3, deflate(payload))
      b.result()
    }
    // correct size round-trips
    assert(Blobs.decode(blob(100)).toSeq === payload.toSeq)
    // declared LARGER than the stream: previously a silently zero-padded
    // tail; declared SMALLER: previously silently dropped trailing bytes
    intercept[PbfFormatException](Blobs.decode(blob(150)))
    intercept[PbfFormatException](Blobs.decode(blob(50)))
  }

  test("zstd blob missing required raw_size fails typed (was a silent empty payload)") {
    import PbfWriter.MessageBuilder
    val payload = Array.fill[Byte](64)(9)
    val b = new MessageBuilder
    b.writeBytesField(7, com.github.luben.zstd.Zstd.compress(payload))
    intercept[PbfFormatException](Blobs.decode(b.result()))
    val ok = new MessageBuilder
    ok.writeVarintField(2, 64L)
    ok.writeBytesField(7, com.github.luben.zstd.Zstd.compress(payload))
    assert(Blobs.decode(ok.result()).toSeq === payload.toSeq)
  }

  test("checksum-valid FDICT zlib header fails typed instead of spinning forever") {
    import PbfWriter.MessageBuilder
    // 0x78 0x20: CMF/FLG with the FDICT bit set AND a valid FCHECK
    // ((0x7820 % 31) == 0) — spec-legal zlib that PBF never uses, and a
    // corrupt flip can fabricate. Inflater returns 0 bytes forever with
    // needsDictionary() (neither finished nor needsInput) — before the
    // zero-progress guard this was an INFINITE CPU loop in the executor
    // (found by a 17-minute FuzzCampaign hang, the exact class the fuzz
    // contract bans; the in-suite single-flip corpus missed it because a
    // random flip almost always breaks FCHECK first).
    assert((0x7820 % 31) === 0)
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 5, 6)
    def blob(declareSize: Boolean): Array[Byte] = {
      val b = new MessageBuilder
      if (declareSize) b.writeVarintField(2, 100L)
      b.writeBytesField(3, fdict)
      b.result()
    }
    // both inflate paths: declared raw_size (sized loop) and absent
    // raw_size (growing loop)
    for (declared <- Seq(true, false)) {
      val ex = intercept[PbfFormatException](Blobs.decode(blob(declared)))
      assert(ex.getMessage.contains("dictionary"), ex.getMessage)
    }
  }

  test("zstd corruption and raw_size mismatch fail typed (zlib-path symmetry)") {
    import PbfWriter.MessageBuilder
    val payload = Array.fill[Byte](128)(5)
    def blob(declared: Int, stream: Array[Byte]): Array[Byte] = {
      val b = new MessageBuilder
      b.writeVarintField(2, declared.toLong)
      b.writeBytesField(7, stream)
      b.result()
    }
    val good = com.github.luben.zstd.Zstd.compress(payload)
    assert(Blobs.decode(blob(128, good)).toSeq === payload.toSeq)
    // declared size too small / too large: corruption, not padding
    intercept[PbfFormatException](Blobs.decode(blob(64, good)))
    intercept[PbfFormatException](Blobs.decode(blob(200, good)))
    // corrupt stream bytes: typed, never a raw ZstdException
    val corrupt = good.clone(); corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x5a).toByte
    try { Blobs.decode(blob(128, corrupt)); () }
    catch {
      case _: PbfFormatException => ()
      case e: Throwable => fail(s"escaped with ${e.getClass.getName}: ${e.getMessage}")
    }
    // pure-noise stream
    intercept[PbfFormatException](Blobs.decode(blob(128, Array.fill[Byte](40)(0x2f))))
  }

  test("dense coord arrays mismatching ids fail typed (not a silent all-null block)") {
    import PbfWriter.MessageBuilder
    // 4 ids, 3 lats/lons — per the PBF spec dense coords are mandatory,
    // so a length mismatch with coords requested is ALWAYS corruption;
    // nulling every coordinate would make downstream bbox filters
    // silently drop the block
    def block(nLat: Int, nLon: Int): Array[Byte] = {
      val dense = new MessageBuilder
      dense.writePackedZigzag(1, Seq.fill(4)(1L))
      if (nLat > 0) dense.writePackedZigzag(8, Seq.fill(nLat)(1000L))
      if (nLon > 0) dense.writePackedZigzag(9, Seq.fill(nLon)(1000L))
      val group = new MessageBuilder
      group.writeMessageField(2, dense)
      val b = new MessageBuilder
      b.writeMessageField(1, new MessageBuilder)
      b.writeMessageField(2, group)
      b.result()
    }
    intercept[PbfFormatException](BlockDecoder.decodeBlock(block(3, 3)).length)
    intercept[PbfFormatException](BlockDecoder.decodeBlock(block(4, 3)).length)
    intercept[PbfFormatException](BlockDecoder.decodeBlock(block(5, 4)).length)
    // lats present but lons entirely absent is also corruption
    intercept[PbfFormatException](BlockDecoder.decodeBlock(block(4, 0)).length)
    // matched arrays decode
    assert(BlockDecoder.decodeBlock(block(4, 4)).length === 4)
    // BOTH arrays absent with coords requested: the pruned-writer shape —
    // null coords, ids intact (the advice-sanctioned null path)
    val rows = BlockDecoder.decodeBlock(block(0, 0)).toSeq
    assert(rows.size === 4 && rows.forall(_.isNullAt(fieldIdx("lat"))))
    // coords pruned from the projection: mismatch is never even read
    val pruned = BlockDecoder.decodeBlock(block(3, 3),
      BlockDecoder.Projection(coords = false)).toSeq
    assert(pruned.size === 4 && pruned.forall(_.isNullAt(fieldIdx("lat"))))
  }

  test("DenseInfo visible in EXPANDED encoding decodes like its sibling fields") {
    import PbfWriter.MessageBuilder
    // spec-legal: a packed-declared field may arrive as individual
    // wire-type-0 values; an unconditional packed read misparses the
    // first value as a length prefix and desyncs the whole info message
    val n = 3
    val dense = new MessageBuilder
    dense.writePackedZigzag(1, Seq(100L, 1L, 1L))
    val info = new MessageBuilder
    info.writePackedVarint(1, Seq.fill(n)(1L))     // version
    info.writePackedZigzag(2, Seq(7L, 0L, 0L))     // timestamp deltas
    info.writePackedZigzag(3, Seq(9L, 0L, 0L))     // changeset deltas
    info.writePackedZigzag(4, Seq(17L, 0L, 0L))    // uid deltas
    info.writePackedZigzag(5, Seq(0L, 0L, 0L))     // user_sid deltas
    info.writeVarintField(6, 1L)                   // visible, EXPANDED
    info.writeVarintField(6, 0L)
    info.writeVarintField(6, 1L)
    dense.writeMessageField(5, info)
    dense.writePackedZigzag(8, Seq(520000000L, 0L, 0L))
    dense.writePackedZigzag(9, Seq(110000000L, 0L, 0L))
    val group = new MessageBuilder
    group.writeMessageField(2, dense)
    val b = new MessageBuilder
    b.writeMessageField(1, new MessageBuilder)
    b.writeMessageField(2, group)
    val rows = BlockDecoder.decodeBlock(b.result()).toSeq
    assert(rows.map(_.getLong(0)) === Seq(100L, 101L, 102L))
    assert(rows.map(_.getBoolean(fieldIdx("visible"))) === Seq(true, false, true))
    // sibling fields decoded past the expanded values without desync
    assert(rows.forall(_.getInt(fieldIdx("uid")) === 17))
    assert(rows.forall(_.getInt(fieldIdx("version")) === 1))
  }
}
