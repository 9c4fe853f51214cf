package graft.sources.pbf

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Minimal OSM PBF encoder — enough of the format (dense nodes with
  * DenseInfo, ways, relations, zlib blobs, header) to:
  *
  *  - round-trip-test the decoder at scale (encode → decode = identity on
  *    generated corpora, complementing the golden fixtures), and
  *  - synthesize arbitrarily large inputs for transcode throughput
  *    benchmarking without shipping a planet file.
  *
  * The reference has no encoder; this is test/bench infrastructure, not a
  * user-facing sink (the engine's sink is partitioned parquet).
  */
object PbfWriter {

  final class MessageBuilder {
    private var buf = new Array[Byte](64)
    private var len = 0

    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var cap = buf.length * 2
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }

    def writeVarint(v: Long): this.type = {
      ensure(10)
      var x = v
      while ((x & ~0x7fL) != 0) { buf(len) = ((x & 0x7f) | 0x80).toByte; len += 1; x >>>= 7 }
      buf(len) = (x & 0x7f).toByte; len += 1
      this
    }

    def writeTag(field: Int, wire: Int): this.type = writeVarint((field << 3) | wire)

    def writeZigzagField(field: Int, v: Long): this.type = {
      writeTag(field, 0); writeVarint((v << 1) ^ (v >> 63))
    }

    def writeVarintField(field: Int, v: Long): this.type = {
      writeTag(field, 0); writeVarint(v)
    }

    def writeBytesField(field: Int, bytes: Array[Byte]): this.type = {
      writeTag(field, 2); writeVarint(bytes.length.toLong)
      ensure(bytes.length)
      System.arraycopy(bytes, 0, buf, len, bytes.length)
      len += bytes.length
      this
    }

    def writeStringField(field: Int, s: String): this.type =
      writeBytesField(field, s.getBytes(StandardCharsets.UTF_8))

    def writeMessageField(field: Int, m: MessageBuilder): this.type =
      writeBytesField(field, m.result())

    def writePackedVarint(field: Int, vs: Iterable[Long]): this.type = {
      val m = new MessageBuilder
      vs.foreach(m.writeVarint)
      writeBytesField(field, m.result())
    }

    def writePackedZigzag(field: Int, vs: Iterable[Long]): this.type =
      writePackedVarint(field, vs.map(v => (v << 1) ^ (v >> 63)))

    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  final case class DenseNode(id: Long, latNano: Long, lonNano: Long,
                             tags: Seq[(String, String)],
                             version: Int, timestampMs: Long, changeset: Long,
                             uid: Int, user: String)

  /** `locations`: optional LocationsOnWays (latNano, lonNano) per ref —
    * encoded as the Way's optional delta-zigzag lat=9/lon=10 arrays with
    * the block's granularity/offset math, mirroring what the decoder reads
    * back (osmformat.proto Way comment; osmpbf/src/elements.rs:390-423). */
  final case class WayData(id: Long, refs: Seq[Long], tags: Seq[(String, String)],
                           locations: Option[Seq[(Long, Long)]] = None)

  /** members: (memid, type 0=node/1=way/2=relation, role). */
  final case class RelationData(id: Long, members: Seq[(Long, Int, String)],
                                tags: Seq[(String, String)])

  /** Builds one PrimitiveBlock of dense nodes plus optional ways.
    * Non-default granularity/offsets exercise the decoder's coordinate
    * formula (degrees = 1e-9 × (offset + granularity × raw)) beyond what
    * the reference fixtures cover (they only use the defaults). */
  def primitiveBlock(nodes: Seq[DenseNode], ways: Seq[WayData] = Nil,
                     granularity: Int = 100, latOffset: Long = 0, lonOffset: Long = 0,
                     dateGranularity: Int = 1000,
                     relations: Seq[RelationData] = Nil): Array[Byte] = {
    // string table: index 0 reserved blank
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    val dense = new MessageBuilder
    dense.writePackedZigzag(1, delta(nodes.map(_.id)))
    val info = new MessageBuilder
    info.writePackedVarint(1, nodes.map(_.version.toLong))
    info.writePackedZigzag(2, delta(nodes.map(_.timestampMs / dateGranularity)))
    info.writePackedZigzag(3, delta(nodes.map(_.changeset)))
    info.writePackedZigzag(4, delta(nodes.map(_.uid.toLong)))
    info.writePackedZigzag(5, delta(nodes.map(n => sid(n.user).toLong)))
    dense.writeMessageField(5, info)
    dense.writePackedZigzag(8, delta(nodes.map(n => (n.latNano - latOffset) / granularity)))
    dense.writePackedZigzag(9, delta(nodes.map(n => (n.lonNano - lonOffset) / granularity)))
    dense.writePackedVarint(10, nodes.flatMap(n =>
      n.tags.flatMap { case (k, v) => Seq(sid(k).toLong, sid(v).toLong) } :+ 0L))

    val group = new MessageBuilder
    group.writeMessageField(2, dense)
    ways.foreach { w =>
      val wm = new MessageBuilder
      wm.writeVarintField(1, w.id)
      wm.writePackedVarint(2, w.tags.map(t => sid(t._1).toLong))
      wm.writePackedVarint(3, w.tags.map(t => sid(t._2).toLong))
      wm.writePackedZigzag(8, delta(w.refs))
      w.locations.foreach { locs =>
        wm.writePackedZigzag(9, delta(locs.map(l => (l._1 - latOffset) / granularity)))
        wm.writePackedZigzag(10, delta(locs.map(l => (l._2 - lonOffset) / granularity)))
      }
      group.writeMessageField(3, wm)
    }
    relations.foreach { r =>
      // osmformat.proto Relation: roles_sid=8, memids=9 (delta sint64),
      // types=10 (enum NODE=0/WAY=1/RELATION=2) — parallel arrays
      val rm = new MessageBuilder
      rm.writeVarintField(1, r.id)
      rm.writePackedVarint(2, r.tags.map(t => sid(t._1).toLong))
      rm.writePackedVarint(3, r.tags.map(t => sid(t._2).toLong))
      rm.writePackedVarint(8, r.members.map(m => sid(m._3).toLong))
      rm.writePackedZigzag(9, delta(r.members.map(_._1)))
      rm.writePackedVarint(10, r.members.map(_._2.toLong))
      group.writeMessageField(4, rm)
    }

    val st = new MessageBuilder
    strings.keys.foreach(s => st.writeBytesField(1, s.getBytes(StandardCharsets.UTF_8)))

    val block = new MessageBuilder
    block.writeMessageField(1, st)
    block.writeMessageField(2, group)
    if (granularity != 100) block.writeVarintField(17, granularity.toLong)
    if (dateGranularity != 1000) block.writeVarintField(18, dateGranularity.toLong)
    if (latOffset != 0) block.writeVarintField(19, latOffset)
    if (lonOffset != 0) block.writeVarintField(20, lonOffset)
    block.result()
  }

  private def delta(vs: Seq[Long]): Seq[Long] = {
    var prev = 0L
    vs.map { v => val d = v - prev; prev = v; d }
  }

  /** Frames payloads into a PBF file: OSMHeader blob + one OSMData blob per
    * payload, zlib-compressed. */
  def writeFile(path: String, blockPayloads: Seq[Array[Byte]]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    try {
      val header = new MessageBuilder
      header.writeStringField(4, "OsmSchema-V0.6")
      header.writeStringField(4, "DenseNodes")
      header.writeStringField(16, "graft-pbf-writer")
      writeBlob(out, Blobs.TypeOsmHeader, header.result())
      blockPayloads.foreach(p => writeBlob(out, Blobs.TypeOsmData, p))
    } finally out.close()
  }

  private def writeBlob(out: DataOutputStream, blobType: String, payload: Array[Byte]): Unit = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(payload); deflater.finish()
    // deflate's worst case EXPANDS: ~5 bytes per 16 KiB stored block + a
    // constant — "+ 64" alone under-sizes incompressible payloads past
    // ~200 KB, and a full buffer makes deflate() return 0 forever (the
    // same zero-progress spin class the inflate side fails typed on)
    val comp = new Array[Byte](payload.length + (payload.length >> 10) + 64)
    var clen = 0
    while (!deflater.finished()) {
      val n = deflater.deflate(comp, clen, comp.length - clen)
      require(n > 0 || deflater.finished(),
        s"deflate made no progress at $clen of ${comp.length}")
      clen += n
    }
    deflater.end()

    val blob = new MessageBuilder
    blob.writeVarintField(2, payload.length.toLong)
    blob.writeBytesField(3, java.util.Arrays.copyOf(comp, clen))
    val blobBytes = blob.result()

    val header = new MessageBuilder
    header.writeStringField(1, blobType)
    header.writeVarintField(3, blobBytes.length.toLong)
    val headerBytes = header.result()

    out.writeInt(headerBytes.length)
    out.write(headerBytes)
    out.write(blobBytes)
  }

  /** Deterministic synthetic corpus: `blocks` blocks of `nodesPerBlock`
    * dense nodes (every 100th node tagged) + `waysPerBlock` ways (16 refs
    * into the block's nodes) + `relationsPerBlock` relations (3 members:
    * two nodes and a way). Defaults keep the original 1-way/0-relation
    * shape the decode specs pin; the transcode BENCHMARK requests a
    * planet-like mix (~89% nodes / ~10% ways / ~0.1% relations) so the
    * headline elem/s is measured on representative element proportions,
    * not on the cheapest element type. */
  def synthesize(path: String, blocks: Int, nodesPerBlock: Int,
                 waysPerBlock: Int = 1, relationsPerBlock: Int = 0): Long = {
    var id = 0L
    val payloads = (0 until blocks).map { b =>
      val nodes = (0 until nodesPerBlock).map { i =>
        id += 1
        DenseNode(id, 52000000000L + id * 1000, 11000000000L + id * 700,
          if (i % 100 == 0) Seq("amenity" -> "bench", "ref" -> s"b$b") else Nil,
          version = 1, timestampMs = 1049522828000L + id * 1000L, changeset = 1000L + b,
          uid = 17, user = s"user${b % 13}")
      }
      val ways = (0 until waysPerBlock).map { w =>
        val at = (w * 16) % math.max(nodesPerBlock - 16, 1)
        WayData(1000000000L + b.toLong * waysPerBlock + w,
          nodes.slice(at, at + 16).map(_.id), Seq("highway" -> "residential"))
      }
      val rels = (0 until relationsPerBlock).map { r =>
        RelationData(2000000000L + b.toLong * relationsPerBlock + r,
          Seq((nodes(r % nodesPerBlock).id, 0, "outer"),
            (nodes((r + 1) % nodesPerBlock).id, 0, "inner")) ++
            (if (waysPerBlock > 0) Seq((ways(r % waysPerBlock).id, 1, "")) else Nil),
          Seq("type" -> "multipolygon"))
      }
      primitiveBlock(nodes, ways, relations = rels)
    }
    writeFile(path, payloads)
    blocks.toLong * (nodesPerBlock + waysPerBlock + relationsPerBlock)
  }
}
