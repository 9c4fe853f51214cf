package graft.sources.pbf

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable.ArrayBuffer

/** HeaderBlock metadata (osmformat.proto HeaderBlock; decoded like
  * osmpbf/src/block.rs:15-86). bbox is ×1e-9 degrees.
  */
final case class OsmHeader(
    bboxLeft: Option[Double], bboxRight: Option[Double],
    bboxTop: Option[Double], bboxBottom: Option[Double],
    requiredFeatures: Seq[String], optionalFeatures: Seq[String],
    writingProgram: Option[String], source: Option[String],
    replicationTimestamp: Option[Long], replicationSequence: Option[Long],
    replicationBaseUrl: Option[String])

/** Decodes OSM PBF payloads (the uncompressed output of [[Blobs.decode]])
  * into Spark [[Row]]s of [[OsmSchema.schema]].
  *
  * Semantics mirror the reference exactly:
  *  - coords: degrees = 1e-9 × (offset + granularity × raw)
  *    (osmpbf/src/elements.rs:84-111, dense.rs:36-63)
  *  - timestamps: raw × date_granularity milliseconds (elements.rs:583-591)
  *  - tag pairs with invalid-UTF-8 key or value are silently dropped
  *    (block.rs:439-456)
  *  - sparse elements: absent user → "" (sink.rs:183,227,249); visible
  *    always present, defaulting true (elements.rs:616-619)
  *  - dense nodes without DenseInfo: every info column null including
  *    user and visible (sink.rs:203-222)
  *  - relation member roles with invalid UTF-8 → null role
  *    (sink.rs:251-260 `.role().ok()`)
  *  - node id is sint64 (zigzag), way/relation ids are int64 (plain)
  */
object BlockDecoder {

  /** Column-pruning projection for the scan (DataSourceV2
    * `SupportsPushDownRequiredColumns`): columns not required skip their
    * decode-side allocation entirely — the Spark-native version of the
    * reference's lazy decode (blob.rs:92-113). `types` prunes whole
    * primitive groups when a `type = …` predicate is pushed down, the
    * analog of the reference's known-empty blob skip (indexed.rs:275-300).
    */
  final case class Projection(
      tags: Boolean = true,
      coords: Boolean = true,
      nds: Boolean = true,
      members: Boolean = true,
      info: Boolean = true,
      types: Set[String] = Set(OsmSchema.TypeNode, OsmSchema.TypeWay, OsmSchema.TypeRelation),
      // LocationsOnWays read option: rows carry a 14th `node_locations`
      // column (OsmSchema.schemaWithWayLocations). Off by default — the
      // 13-col transcode/scan paths are untouched.
      wayLocs: Boolean = false)

  val FullProjection: Projection = Projection()

  /** PrimitiveBlock → element rows. Field order in the wire format puts
    * granularity (17-20) after the groups (2), so we collect group spans
    * first and decode them once the block-level scalars are known.
    */
  def decodeBlock(payload: Array[Byte]): Iterator[Row] =
    decodeBlock(payload, FullProjection)

  /** Row view of the decode — convenience for tests and library users;
    * the scan path uses [[decodeBlockInternal]] (no conversion layer). */
  def decodeBlock(payload: Array[Byte], proj: Projection): Iterator[Row] = {
    val conv = CatalystTypeConverters.createToScalaConverter(OsmSchema.schemaFor(proj.wayLocs))
    decodeBlockInternal(payload, proj).map(r => conv(r).asInstanceOf[Row])
  }

  /** PrimitiveBlock → InternalRows: decode writes Catalyst's own runtime
    * formats (UTF8String, ArrayBasedMapData, epoch-micros) directly — no
    * per-row converter between the decoder and the parquet writer, which
    * is worth ~10x transcode throughput vs an external-Row path. */
  def decodeBlockInternal(payload: Array[Byte], proj: Projection): Iterator[InternalRow] =
    decodeBlockInternal(payload, proj, reuseDense = false)

  /** `reuseDense = true` yields dense-node rows through ONE mutable
    * `SpecificInternalRow` (primitive slots — no per-row allocation, no
    * per-field boxing). ONLY safe when the caller consumes each row
    * before requesting the next (the transcode's write loop); any
    * consumer that buffers rows must use the allocating overload. */
  def decodeBlockInternal(payload: Array[Byte], proj: Projection,
                          reuseDense: Boolean): Iterator[InternalRow] = {
    val r = new ProtoReader(payload)
    var stringTable: Array[UTF8String] = Array.empty
    val groups = ArrayBuffer.empty[ProtoReader]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    var dateGranularity = 1000L
    while (r.hasNext) {
      val tag = r.readTag()
      (tag: @annotation.switch) match {
        case 0x0a => stringTable = decodeStringTable(r.readMessage()) // 1
        case 0x12 => groups += r.readMessage() // 2
        case _ =>
          val field = tag >>> 3
          val wire = tag & 7
          field match {
            case 17 => granularity = r.readVarint()
            case 18 => dateGranularity = r.readVarint()
            case 19 => latOffset = r.readVarint()
            case 20 => lonOffset = r.readVarint()
            case _ => r.skip(wire)
          }
      }
    }
    val ctx = new BlockCtx(stringTable, granularity, latOffset, lonOffset, dateGranularity)
    groups.iterator.flatMap(g => decodeGroup(g, ctx, proj, reuseDense))
  }

  private val TypeNodeU = UTF8String.fromString(OsmSchema.TypeNode)
  private val TypeWayU = UTF8String.fromString(OsmSchema.TypeWay)
  private val TypeRelationU = UTF8String.fromString(OsmSchema.TypeRelation)
  private val EmptyTags = new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]), new GenericArrayData(Array.empty[Any]))
  private val EmptyUser = UTF8String.fromString("")

  @inline private def row13(id: Long, tags: Any, lat: Any, lon: Any, nds: Any,
      members: Any, changeset: Any, tsMicros: Any, uid: Any, user: Any,
      version: Any, visible: Any, tpe: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](id, tags, lat, lon, nds, members,
      changeset, tsMicros, uid, user, version, visible, tpe))

  /** 13-col row, plus the trailing `node_locations` slot when the
    * wayLocations projection is active (null for non-way rows). */
  @inline private def mkRow(proj: Projection, id: Long, tags: Any, lat: Any,
      lon: Any, nds: Any, members: Any, changeset: Any, tsMicros: Any,
      uid: Any, user: Any, version: Any, visible: Any, tpe: UTF8String,
      locs: Any): InternalRow =
    if (!proj.wayLocs)
      row13(id, tags, lat, lon, nds, members, changeset, tsMicros, uid, user,
        version, visible, tpe)
    else new GenericInternalRow(Array[Any](id, tags, lat, lon, nds, members,
      changeset, tsMicros, uid, user, version, visible, tpe, locs))

  /** StringTable: repeated bytes s = 1. Invalid UTF-8 entries decode to
    * null so tag/role lookups can drop them like the reference (UTF8String
    * tolerates any bytes, so validity is checked once here at build time).
    * The bytes go straight into UTF8String (one slice copy + an in-place
    * validity scan) — the former bytes→String→re-encoded-bytes path cost
    * a CharsetDecoder, a char[], and a second byte[] per entry. */
  private def decodeStringTable(r: ProtoReader): Array[UTF8String] = {
    val out = ArrayBuffer.empty[UTF8String]
    while (r.hasNext) {
      val tag = r.readTag()
      if (tag == 0x0a) {
        val s = UTF8String.fromBytes(r.readBytes())
        out += (if (s.isValid) s else null)
      } else r.skip(tag & 7)
    }
    out.toArray
  }

  private final class BlockCtx(
      val strings: Array[UTF8String],
      val granularity: Long,
      val latOffset: Long,
      val lonOffset: Long,
      val dateGranularity: Long) {
    @inline def coord(offset: Long, raw: Long): Double =
      1e-9 * (offset + granularity * raw)
    @inline def millis(rawTs: Long): Long = rawTs * dateGranularity
    @inline def string(idx: Int): UTF8String =
      if (idx >= 0 && idx < strings.length) strings(idx) else null
  }

  /** Input-ordered tag map (ArrayBasedMapData preserves array order, like
    * the reference's Arrow map builder); pairs whose key or value is
    * invalid UTF-8 (null in the string table) are dropped. */
  private def tags(keys: Array[Long], vals: Array[Long], ctx: BlockCtx): ArrayBasedMapData = {
    val n = math.min(keys.length, vals.length)
    if (n == 0) return EmptyTags
    val ks = new ArrayBuffer[Any](n)
    val vs = new ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val k = ctx.string(keys(i).toInt)
      val v = ctx.string(vals(i).toInt)
      if (k != null && v != null) { ks += k; vs += v }
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
  }

  /** PrimitiveGroup: nodes=1, dense=2, ways=3, relations=4. Groups of a
    * type excluded by a pushed `type` predicate are skipped without decode.
    *
    * Sparse elements decode eagerly (they are <11% of a planet mix);
    * dense-node groups return a LAZY iterator that decodes one node per
    * `next()` — no intermediate row buffer for the 89% case, and the
    * prerequisite for the reused-row transcode path. */
  private def decodeGroup(r: ProtoReader, ctx: BlockCtx, proj: Projection,
                          reuseDense: Boolean): Iterator[InternalRow] = {
    val parts = ArrayBuffer.empty[AnyRef] // InternalRow | Iterator[InternalRow]
    val wantNode = proj.types(OsmSchema.TypeNode)
    val wantWay = proj.types(OsmSchema.TypeWay)
    val wantRel = proj.types(OsmSchema.TypeRelation)
    while (r.hasNext) {
      val tag = r.readTag()
      (tag: @annotation.switch) match {
        case 0x0a => if (wantNode) parts += decodeNode(r.readMessage(), ctx, proj) else r.skip(2)
        case 0x12 => if (wantNode) parts += decodeDense(r.readMessage(), ctx, proj, reuseDense) else r.skip(2)
        case 0x1a => if (wantWay) parts += decodeWay(r.readMessage(), ctx, proj, reuseDense) else r.skip(2)
        case 0x22 => if (wantRel) parts += decodeRelation(r.readMessage(), ctx, proj) else r.skip(2)
        case t => r.skip(t & 7)
      }
    }
    parts.iterator.flatMap {
      case it: Iterator[_] => it.asInstanceOf[Iterator[InternalRow]]
      case row => Iterator.single(row.asInstanceOf[InternalRow])
    }
  }

  /** Info message: version=1, timestamp=2, changeset=3, uid=4, user_sid=5,
    * visible=6. Values surface as boxed-or-null per reference Option
    * semantics; `userOrEmpty` applies the sparse-element "" fallback.
    */
  private final class SparseInfo {
    var version: Integer = null
    var timestampMs: java.lang.Long = null
    var changeset: java.lang.Long = null
    var uid: Integer = null
    var userSid: Int = -1
    var visible: Boolean = true

    def user(ctx: BlockCtx): UTF8String =
      if (userSid < 0) EmptyUser // absent → "" (sink.rs:183)
      else { val s = ctx.string(userSid); if (s == null) EmptyUser else s }

    /** epoch-micros (TimestampNTZ internal form) or null. */
    def tsMicros: Any =
      if (timestampMs == null) null else timestampMs.longValue() * 1000L
  }

  private def decodeInfo(r: ProtoReader, ctx: BlockCtx): SparseInfo = {
    val info = new SparseInfo
    while (r.hasNext) {
      val tag = r.readTag()
      (tag >>> 3) match {
        case 1 => info.version = r.readVarint().toInt
        case 2 => info.timestampMs = ctx.millis(r.readVarint())
        case 3 => info.changeset = r.readVarint()
        case 4 => info.uid = r.readVarint().toInt
        case 5 => info.userSid = r.readVarint().toInt
        case 6 => info.visible = r.readVarint() != 0
        case _ => r.skip(tag & 7)
      }
    }
    info
  }

  /** Node: id=1 sint64, keys=2, vals=3, info=4, lat=8 sint64, lon=9 sint64. */
  private def decodeNode(r: ProtoReader, ctx: BlockCtx, proj: Projection): InternalRow = {
    var id = 0L
    var keys: Array[Long] = Array.empty
    var vals: Array[Long] = Array.empty
    var info = new SparseInfo
    var lat = 0L
    var lon = 0L
    while (r.hasNext) {
      val tag = r.readTag()
      (tag >>> 3) match {
        case 1 => id = r.readZigzag()
        case 2 => if (proj.tags) keys = appendVarints(keys, r, tag) else r.skip(tag & 7)
        case 3 => if (proj.tags) vals = appendVarints(vals, r, tag) else r.skip(tag & 7)
        case 4 => if (proj.info) info = decodeInfo(r.readMessage(), ctx) else r.skip(2)
        case 8 => lat = r.readZigzag()
        case 9 => lon = r.readZigzag()
        case _ => r.skip(tag & 7)
      }
    }
    mkRow(proj, id, if (proj.tags) tags(keys, vals, ctx) else null,
      if (proj.coords) ctx.coord(ctx.latOffset, lat) else null,
      if (proj.coords) ctx.coord(ctx.lonOffset, lon) else null,
      null, null, info.changeset, info.tsMicros,
      info.uid, info.user(ctx), info.version, Boolean.box(info.visible),
      TypeNodeU, null)
  }

  /** DenseNodes: id=1Δ, denseinfo=5, lat=8Δ, lon=9Δ, keys_vals=10.
    * The running-sum delta decode is inherently sequential per blob —
    * exactly why the parallelism unit is the blob (dense.rs:148-151).
    * Field parse is eager (packed arrays); row production is LAZY — one
    * node per `next()`, with all delta accumulators as iterator state.
    */
  private def decodeDense(r: ProtoReader, ctx: BlockCtx, proj: Projection,
                          reuse: Boolean): Iterator[InternalRow] = {
    var ids: Array[Long] = Array.empty
    var lats: Array[Long] = Array.empty
    var lons: Array[Long] = Array.empty
    var keysVals: Array[Long] = Array.empty
    var di: DenseInfoArrays = null
    while (r.hasNext) {
      val tag = r.readTag()
      (tag >>> 3) match {
        case 1 => ids = appendZigzags(ids, r, tag)
        case 5 => if (proj.info) di = decodeDenseInfo(r.readMessage()) else r.skip(2)
        // pruned coords skip the packed parse AND the per-row delta+double
        // work below — the column-pruning claim the DSv2 scaladoc makes,
        // now actually wired (proj.coords was a dead flag through r14)
        case 8 => if (proj.coords) lats = appendZigzags(lats, r, tag) else r.skip(tag & 7)
        case 9 => if (proj.coords) lons = appendZigzags(lons, r, tag) else r.skip(tag & 7)
        case 10 => if (proj.tags) keysVals = appendVarints(keysVals, r, tag) else r.skip(tag & 7)
        case _ => r.skip(tag & 7)
      }
    }
    new DenseRows(ids, lats, lons, keysVals, di, ctx, proj, reuse)
  }

  /** The dense-node hot loop as an iterator. With `reuse` every call to
    * `next()` returns the SAME `SpecificInternalRow` refilled in place —
    * primitive slots, so the 89%-of-planet path does zero per-row
    * allocation and zero boxing for id/coords/info fields (the map object
    * still allocates only for tagged nodes, ~1-10% of dense nodes). */
  private final class DenseRows(ids: Array[Long], lats: Array[Long],
      lons: Array[Long], keysVals: Array[Long], di: DenseInfoArrays,
      ctx: BlockCtx, proj: Projection, reuse: Boolean)
      extends Iterator[InternalRow] {
    private[this] val n = ids.length
    private[this] val width = if (proj.wayLocs) 14 else 13
    // ALL five delta arrays must cover every node — gating on version
    // alone let a corrupt payload with a full version array but a short
    // timestamp/changeset/uid/userSid array escape as an
    // ArrayIndexOutOfBounds from the accumulator reads (found by
    // DecodeFuzzSpec); visible is individually length-guarded at use
    private[this] val hasInfo = di != null && di.version.length == n &&
      di.timestamp.length == n && di.changeset.length == n &&
      di.uid.length == n && di.userSid.length == n
    // Dense-node coords are MANDATORY per the PBF spec: when coords are
    // requested and the payload carries lat/lon arrays of the wrong length,
    // that is corruption and must fail typed — not silently NULL every
    // coordinate in the block (which downstream bbox filters would then
    // silently drop). The null path stays ONLY for the pruned case
    // (proj.coords off, or both arrays absent entirely).
    if (proj.coords && (lats.nonEmpty || lons.nonEmpty) &&
        (lats.length != n || lons.length != n))
      throw new PbfFormatException(
        s"DenseNodes coord arrays mismatch ids: ids=$n lats=${lats.length} lons=${lons.length}")
    private[this] val hasCoords = lats.length == n && lons.length == n
    private[this] val target: InternalRow =
      if (reuse) {
        val t = new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
          OsmSchema.schemaFor(proj.wayLocs).fields.map(_.dataType).toIndexedSeq)
        // constant across all dense rows
        t.update(12, TypeNodeU)
        t.setNullAt(4); t.setNullAt(5) // nds, members
        if (width == 14) t.setNullAt(13)
        t
      } else null
    private[this] var i = 0
    private[this] var id = 0L; private[this] var lat = 0L; private[this] var lon = 0L
    private[this] var ts = 0L; private[this] var cs = 0L
    private[this] var uid = 0L; private[this] var usid = 0L
    private[this] var kv = 0 // cursor into keys_vals
    // reusable tag scratch (grown on demand, trimmed per node at emit)
    private[this] var ks = new Array[Any](8)
    private[this] var vs = new Array[Any](8)

    override def hasNext: Boolean = i < n

    override def next(): InternalRow = {
      id += ids(i)
      if (hasCoords) { lat += lats(i); lon += lons(i) }
      // 0-delimited (key,val) pairs for this node (dense.rs:153-163)
      var nk = 0
      while (kv < keysVals.length && keysVals(kv) != 0L) {
        val k = ctx.string(keysVals(kv).toInt)
        val v = if (kv + 1 < keysVals.length) ctx.string(keysVals(kv + 1).toInt) else null
        if (k != null && v != null) {
          if (nk == ks.length) {
            ks = java.util.Arrays.copyOf(ks.asInstanceOf[Array[AnyRef]], nk * 2).asInstanceOf[Array[Any]]
            vs = java.util.Arrays.copyOf(vs.asInstanceOf[Array[AnyRef]], nk * 2).asInstanceOf[Array[Any]]
          }
          ks(nk) = k; vs(nk) = v; nk += 1
        }
        kv += 2
      }
      if (kv < keysVals.length) kv += 1 // skip the 0 delimiter
      val m = if (nk == 0) EmptyTags
        else new ArrayBasedMapData(
          new GenericArrayData(java.util.Arrays.copyOf(ks.asInstanceOf[Array[AnyRef]], nk)),
          new GenericArrayData(java.util.Arrays.copyOf(vs.asInstanceOf[Array[AnyRef]], nk)))
      val row: InternalRow =
        if (reuse) target
        else {
          val g = new GenericInternalRow(width)
          g.update(12, TypeNodeU)
          g
        }
      row.setLong(0, id)
      row.update(1, m)
      if (hasCoords) {
        row.setDouble(2, ctx.coord(ctx.latOffset, lat))
        row.setDouble(3, ctx.coord(ctx.lonOffset, lon))
      } else { row.setNullAt(2); row.setNullAt(3) }
      if (hasInfo) {
        ts += di.timestamp(i); cs += di.changeset(i); uid += di.uid(i); usid += di.userSid(i)
        val user = { val s = ctx.string(usid.toInt); if (s == null) EmptyUser else s }
        row.setLong(6, cs)
        row.setLong(7, ctx.millis(ts) * 1000L)
        row.setInt(8, uid.toInt)
        row.update(9, user)
        row.setInt(10, di.version(i).toInt)
        row.setBoolean(11, if (di.visible.length > i) di.visible(i) else true)
      } else {
        // no DenseInfo: every info column null, including user & visible
        row.setNullAt(6); row.setNullAt(7); row.setNullAt(8)
        row.setNullAt(9); row.setNullAt(10); row.setNullAt(11)
      }
      i += 1
      row
    }
  }

  private final class DenseInfoArrays(
      val version: Array[Long], val timestamp: Array[Long],
      val changeset: Array[Long], val uid: Array[Long],
      val userSid: Array[Long], val visible: Array[Boolean])

  /** DenseInfo: version=1 (plain), timestamp=2Δ, changeset=3Δ, uid=4Δ,
    * user_sid=5Δ, visible=6. */
  private def decodeDenseInfo(r: ProtoReader): DenseInfoArrays = {
    var version: Array[Long] = Array.empty
    var timestamp: Array[Long] = Array.empty
    var changeset: Array[Long] = Array.empty
    var uid: Array[Long] = Array.empty
    var userSid: Array[Long] = Array.empty
    var visible: Array[Long] = Array.empty
    while (r.hasNext) {
      val tag = r.readTag()
      (tag >>> 3) match {
        case 1 => version = appendVarints(version, r, tag)
        case 2 => timestamp = appendZigzags(timestamp, r, tag)
        case 3 => changeset = appendZigzags(changeset, r, tag)
        case 4 => uid = appendZigzags(uid, r, tag)
        case 5 => userSid = appendZigzags(userSid, r, tag)
        // same tag-dispatched append as fields 1-5: a spec-legal EXPANDED
        // (wire-type 0) visible value must not be misparsed as a length
        // prefix (an unconditional readPackedVarint desyncs on it)
        case 6 => visible = appendVarints(visible, r, tag)
        case _ => r.skip(tag & 7)
      }
    }
    new DenseInfoArrays(version, timestamp, changeset, uid, userSid,
      visible.map(_ != 0L))
  }

  /** Way: id=1 int64, keys=2, vals=3, info=4, refs=8Δ, lat=9Δ, lon=10Δ.
    * The optional LocationsOnWays lat/lon arrays (osmformat.proto Way
    * comment at 233-240; decoded like osmpbf/src/elements.rs:390-423) are
    * skipped by default — the reference APP ignores them (sink.rs:235) —
    * and surfaced as the `node_locations` column when the projection's
    * `wayLocs` is on. A way without the arrays yields an EMPTY array,
    * mirroring the reference library's empty iterator
    * (elements.rs:201-216). */
  private def decodeWay(r: ProtoReader, ctx: BlockCtx, proj: Projection,
                        reuse: Boolean = false): InternalRow = {
    var id = 0L
    var keys: Array[Long] = Array.empty
    var vals: Array[Long] = Array.empty
    var info = new SparseInfo
    var refs: Array[Long] = Array.empty
    var dlats: Array[Long] = Array.empty
    var dlons: Array[Long] = Array.empty
    while (r.hasNext) {
      val tag = r.readTag()
      (tag >>> 3) match {
        case 1 => id = r.readVarint()
        case 2 => if (proj.tags) keys = appendVarints(keys, r, tag) else r.skip(tag & 7)
        case 3 => if (proj.tags) vals = appendVarints(vals, r, tag) else r.skip(tag & 7)
        case 4 => if (proj.info) info = decodeInfo(r.readMessage(), ctx) else r.skip(2)
        case 8 => if (proj.nds) refs = appendZigzags(refs, r, tag) else r.skip(tag & 7)
        // lat/lon must accept BOTH encodings of a packed-declared field
        // (protobuf spec: parsers handle packed and expanded, repeats
        // concatenate) — and when pruned, skip by the ACTUAL wire type so
        // an expanded varint doesn't get misread as a length prefix
        case 9 => if (proj.wayLocs) dlats = appendZigzags(dlats, r, tag)
                  else r.skip(tag & 7)
        case 10 => if (proj.wayLocs) dlons = appendZigzags(dlons, r, tag)
                   else r.skip(tag & 7)
        case _ => r.skip(tag & 7)
      }
    }
    // delta decode refs (elements.rs:332-348) in place
    var acc = 0L
    var i = 0
    while (i < refs.length) { acc += refs(i); refs(i) = acc; i += 1 }
    // reuse (transcode): a primitive-long-backed struct-array view — no
    // per-ref struct allocation/boxing; otherwise real independent structs
    val nds: Any =
      if (!proj.nds) null
      else if (reuse) new RefStructArray(refs)
      else {
        val out = new Array[Any](refs.length)
        var j = 0
        while (j < refs.length) { out(j) = new GenericInternalRow(Array[Any](refs(j))); j += 1 }
        new GenericArrayData(out)
      }
    var locs: Any = null
    if (proj.wayLocs) {
      // same running-sum + coordinate math as the node decode
      // (elements.rs:405-412: offset + granularity × cumulative, ×1e-9)
      val n = math.min(dlats.length, dlons.length)
      val out = new Array[Any](n)
      var clat = 0L
      var clon = 0L
      var j = 0
      while (j < n) {
        clat += dlats(j)
        clon += dlons(j)
        out(j) = new GenericInternalRow(Array[Any](
          ctx.coord(ctx.latOffset, clat), ctx.coord(ctx.lonOffset, clon)))
        j += 1
      }
      locs = new GenericArrayData(out)
    }
    mkRow(proj, id, if (proj.tags) tags(keys, vals, ctx) else null, null, null,
      nds, null, info.changeset,
      info.tsMicros, info.uid, info.user(ctx), info.version, Boolean.box(info.visible),
      TypeWayU, locs)
  }

  /** `array<struct<ref:long>>` view over a primitive long array with a
    * REUSED per-element struct holder — the transcode-only representation
    * of a way's `nds` (the write support reads elements strictly
    * sequentially). `copy()` materializes real independent structs for
    * any consumer that buffers. */
  private final class RefStructArray(refs: Array[Long])
      extends org.apache.spark.sql.catalyst.util.ArrayData {
    private[this] val holder =
      new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
        Seq[org.apache.spark.sql.types.DataType](org.apache.spark.sql.types.LongType))
    override def numElements(): Int = refs.length
    override def getStruct(ordinal: Int, numFields: Int): InternalRow = {
      holder.setLong(0, refs(ordinal)); holder
    }
    override def copy(): org.apache.spark.sql.catalyst.util.ArrayData = {
      val out = new Array[Any](refs.length)
      var i = 0
      while (i < refs.length) { out(i) = new GenericInternalRow(Array[Any](refs(i))); i += 1 }
      new GenericArrayData(out)
    }
    override def array: Array[Any] = copy().asInstanceOf[GenericArrayData].array
    override def isNullAt(ordinal: Int): Boolean = false
    override def setNullAt(ordinal: Int): Unit = unsupported()
    override def update(ordinal: Int, value: Any): Unit = unsupported()
    private def unsupported(): Nothing =
      throw new UnsupportedOperationException("RefStructArray: struct elements only")
    override def getBoolean(ordinal: Int): Boolean = unsupported()
    override def getByte(ordinal: Int): Byte = unsupported()
    override def getShort(ordinal: Int): Short = unsupported()
    override def getInt(ordinal: Int): Int = unsupported()
    override def getLong(ordinal: Int): Long = unsupported()
    override def getFloat(ordinal: Int): Float = unsupported()
    override def getDouble(ordinal: Int): Double = unsupported()
    override def getDecimal(ordinal: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal = unsupported()
    override def getUTF8String(ordinal: Int): UTF8String = unsupported()
    override def getBinary(ordinal: Int): Array[Byte] = unsupported()
    override def getInterval(ordinal: Int): org.apache.spark.unsafe.types.CalendarInterval = unsupported()
    override def getVariant(ordinal: Int): org.apache.spark.unsafe.types.VariantVal = unsupported()
    override def getGeography(ordinal: Int): org.apache.spark.unsafe.types.GeographyVal = unsupported()
    override def getGeometry(ordinal: Int): org.apache.spark.unsafe.types.GeometryVal = unsupported()
    override def getArray(ordinal: Int): org.apache.spark.sql.catalyst.util.ArrayData = unsupported()
    override def getMap(ordinal: Int): org.apache.spark.sql.catalyst.util.MapData = unsupported()
    override def get(ordinal: Int, dataType: org.apache.spark.sql.types.DataType): AnyRef =
      getStruct(ordinal, 1)
  }

  /** Packed-declared sint64 field occurrence: wire 2 = packed payload,
    * anything else = one expanded zigzag value; occurrences CONCATENATE —
    * the protobuf spec rule (parsers must accept both encodings, and
    * repeated occurrences of a packed field append). Through round 14 only
    * the way lat/lon fields honored this; every other packed field
    * REPLACED on a repeat occurrence, silently dropping earlier values
    * from a spec-legal multi-occurrence writer. One helper pair now serves
    * every packed field (the common single-occurrence path pays one
    * isEmpty check). */
  private def appendZigzags(cur: Array[Long], r: ProtoReader, tag: Int): Array[Long] =
    if ((tag & 7) == 2) {
      val nw = r.readPackedZigzag()
      if (cur.isEmpty) nw else cur ++ nw
    } else cur :+ r.readZigzag()

  /** int64/uint32 twin of [[appendZigzags]]. */
  private def appendVarints(cur: Array[Long], r: ProtoReader, tag: Int): Array[Long] =
    if ((tag & 7) == 2) {
      val nw = r.readPackedVarint()
      if (cur.isEmpty) nw else cur ++ nw
    } else cur :+ r.readVarint()

  private val MemberTypes = Array(TypeNodeU, TypeWayU, TypeRelationU)

  /** Relation: id=1 int64, keys=2, vals=3, info=4, roles_sid=8, memids=9Δ,
    * types=10. */
  private def decodeRelation(r: ProtoReader, ctx: BlockCtx, proj: Projection): InternalRow = {
    var id = 0L
    var keys: Array[Long] = Array.empty
    var vals: Array[Long] = Array.empty
    var info = new SparseInfo
    var rolesSid: Array[Long] = Array.empty
    var memids: Array[Long] = Array.empty
    var types: Array[Long] = Array.empty
    while (r.hasNext) {
      val tag = r.readTag()
      (tag >>> 3) match {
        case 1 => id = r.readVarint()
        case 2 => if (proj.tags) keys = appendVarints(keys, r, tag) else r.skip(tag & 7)
        case 3 => if (proj.tags) vals = appendVarints(vals, r, tag) else r.skip(tag & 7)
        case 4 => if (proj.info) info = decodeInfo(r.readMessage(), ctx) else r.skip(2)
        case 8 => if (proj.members) rolesSid = appendVarints(rolesSid, r, tag) else r.skip(tag & 7)
        case 9 => if (proj.members) memids = appendZigzags(memids, r, tag) else r.skip(tag & 7)
        case 10 => if (proj.members) types = appendVarints(types, r, tag) else r.skip(tag & 7)
        case _ => r.skip(tag & 7)
      }
    }
    val n = math.min(memids.length, math.min(rolesSid.length, types.length))
    val members = new Array[Any](n)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += memids(i)
      val t = types(i).toInt
      val typeStr = if (t >= 0 && t < 3) MemberTypes(t) else null
      // invalid role → null
      members(i) = new GenericInternalRow(Array[Any](typeStr, acc, ctx.string(rolesSid(i).toInt)))
      i += 1
    }
    mkRow(proj, id, if (proj.tags) tags(keys, vals, ctx) else null, null, null, null,
      if (proj.members) new GenericArrayData(members) else null, info.changeset,
      info.tsMicros, info.uid, info.user(ctx), info.version, Boolean.box(info.visible),
      TypeRelationU, null)
  }

  /** Per-blob min/max element ids — the zone map the reference's
    * IndexedReader records per blob (indexed.rs:36-44, 174-225).
    * `min > max` means the type is absent from the blob. */
  final case class BlobIdRanges(
      nodeMin: Long, nodeMax: Long,
      wayMin: Long, wayMax: Long,
      relMin: Long, relMax: Long) {
    def hasNodes: Boolean = nodeMin <= nodeMax
    def hasWays: Boolean = wayMin <= wayMax
    def hasRelations: Boolean = relMin <= relMax
  }

  /** Id-only decode of a PrimitiveBlock: visits just the id field of every
    * element (nodes field 1 sint64, dense field 1 packed-delta, way/rel
    * field 1 int64) and skips everything else — building the zone map costs
    * a fraction of a full decode (the reference builds its index while
    * already decoding pass-1 blocks, indexed.rs:174-225; a pruned scan has
    * to pay only this). */
  def idRanges(payload: Array[Byte]): BlobIdRanges = {
    var nodeMin = Long.MaxValue; var nodeMax = Long.MinValue
    var wayMin = Long.MaxValue; var wayMax = Long.MinValue
    var relMin = Long.MaxValue; var relMax = Long.MinValue
    @inline def see(id: Long, kind: Int): Unit = (kind: @annotation.switch) match {
      case 0 => if (id < nodeMin) nodeMin = id; if (id > nodeMax) nodeMax = id
      case 1 => if (id < wayMin) wayMin = id; if (id > wayMax) wayMax = id
      case 2 => if (id < relMin) relMin = id; if (id > relMax) relMax = id
    }
    val r = new ProtoReader(payload)
    while (r.hasNext) {
      val tag = r.readTag()
      if (tag == 0x12) { // PrimitiveGroup
        val g = r.readMessage()
        while (g.hasNext) {
          val gt = g.readTag()
          (gt: @annotation.switch) match {
            case 0x0a => // Node: id = 1 sint64
              val m = g.readMessage()
              var done = false
              while (m.hasNext && !done) {
                val t = m.readTag()
                if ((t >>> 3) == 1) { see(m.readZigzag(), 0); done = true }
                else m.skip(t & 7)
              }
            case 0x12 => // DenseNodes: id = 1 packed sint64 delta
              val m = g.readMessage()
              // the delta accumulator persists across repeat occurrences of
              // the packed field (occurrences concatenate per spec — a
              // per-occurrence reset would restart the id chain at 0)
              var acc = 0L
              while (m.hasNext) {
                val t = m.readTag()
                if ((t >>> 3) == 1) {
                  if ((t & 7) == 2)
                    m.readPackedZigzag().foreach { d => acc += d; see(acc, 0) }
                  else { acc += m.readZigzag(); see(acc, 0) }
                } else m.skip(t & 7)
              }
            case 0x1a => // Way: id = 1 int64
              val m = g.readMessage()
              var done = false
              while (m.hasNext && !done) {
                val t = m.readTag()
                if ((t >>> 3) == 1) { see(m.readVarint(), 1); done = true }
                else m.skip(t & 7)
              }
            case 0x22 => // Relation: id = 1 int64
              val m = g.readMessage()
              var done = false
              while (m.hasNext && !done) {
                val t = m.readTag()
                if ((t >>> 3) == 1) { see(m.readVarint(), 2); done = true }
                else m.skip(t & 7)
              }
            case t => g.skip(t & 7)
          }
        }
      } else r.skip(tag & 7)
    }
    BlobIdRanges(nodeMin, nodeMax, wayMin, wayMax, relMin, relMax)
  }

  /** HeaderBlock: bbox=1, required_features=4, optional_features=5,
    * writingprogram=16, source=17, replication ts/seq/url=32/33/34. */
  def decodeHeader(payload: Array[Byte]): OsmHeader = {
    val r = new ProtoReader(payload)
    var left, right, top, bottom: Option[Double] = None
    val req = ArrayBuffer.empty[String]
    val opt = ArrayBuffer.empty[String]
    var program: Option[String] = None
    var source: Option[String] = None
    var repTs: Option[Long] = None
    var repSeq: Option[Long] = None
    var repUrl: Option[String] = None
    while (r.hasNext) {
      val tag = r.readTag()
      (tag >>> 3) match {
        case 1 =>
          val b = r.readMessage()
          while (b.hasNext) {
            val t2 = b.readTag()
            (t2 >>> 3) match {
              case 1 => left = Some(b.readZigzag() * 1e-9)
              case 2 => right = Some(b.readZigzag() * 1e-9)
              case 3 => top = Some(b.readZigzag() * 1e-9)
              case 4 => bottom = Some(b.readZigzag() * 1e-9)
              case _ => b.skip(t2 & 7)
            }
          }
        case 4 => req += r.readString()
        case 5 => opt += r.readString()
        case 16 => program = Some(r.readString())
        case 17 => source = Some(r.readString())
        case 32 => repTs = Some(r.readVarint())
        case 33 => repSeq = Some(r.readVarint())
        case 34 => repUrl = Some(r.readString())
        case _ => r.skip(tag & 7)
      }
    }
    OsmHeader(left, right, top, bottom, req.toSeq, opt.toSeq, program, source,
      repTs, repSeq, repUrl)
  }
}
