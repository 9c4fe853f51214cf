package graft.sources.pbf

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.bytes.HeapByteBufferAllocator
import org.apache.parquet.column.impl.ColumnWriteStoreV1
import org.apache.parquet.column.{ColumnWriter, ParquetProperties}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.hadoop.{CodecFactory, ColumnChunkPageWriteStore, ParquetFileWriter, ParquetWriter}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.spark.sql.catalyst.InternalRow

/** Direct parquet-mr write path for the transcode sink.
  *
  * The reference's hot loop hands decoded element batches straight to an
  * `AsyncArrowWriter` owned by the worker (osm-pbf-parquet/src/sink.rs:29-44,
  * 134-153) — no row-format conversion between decode and the columnar
  * buffer. This is the Spark-side equivalent, taken one step further than
  * the round-5 `WriteSupport` design: each task shreds the decoder's
  * `InternalRow`s COLUMN-DIRECTLY into parquet-mr `ColumnWriter`s with
  * hand-computed repetition/definition levels for the fixed OSM schema,
  * bypassing both Spark's DataFrame writer (UnsafeRow conversion + commit
  * protocol; the measured ~4x writer floor from round 1) and parquet-mr's
  * own `MessageColumnIO` record-assembly layer. Profiling the round-5
  * write path showed ~30% of task CPU inside that layer's per-record
  * bookkeeping — a HashMap-backed null cache for the always-null group
  * columns (nodes never have nds/members), a BitSet field marker walked
  * per row, and per-field index checks — all of which are constant-
  * foldable for a FIXED schema: the writer below encodes each column's
  * (rep, def) directly at the call site, the same shape as the
  * reference's arrow-rs columnar assembly.
  *
  * Schema layout matches what Spark's own parquet writer emits (standard
  * 3-level LIST / key_value MAP, TIMESTAMP(MICROS, isAdjustedToUTC=false)),
  * so `spark.read.parquet` round-trips to the identical DataFrame schema and
  * DuckDB reads it for the oracle. Row-group/page management, column
  * statistics, and column indexes are parquet-mr's own
  * (`ColumnWriteStoreV1` + `ColumnChunkPageWriteStore` flushed through
  * `ParquetFileWriter`, the components `InternalParquetRecordWriter`
  * composes), so the files are bit-compatible with the library's writer.
  */
object DirectParquet {

  /** The 12 data columns of [[OsmSchema.schema]] — `type` is directory-
    * encoded (hive layout), exactly like the reference's by-hand
    * `/type={t}/` paths (sink.rs:166-179, osm_arrow.rs:52-54). */
  val MessageSchema: MessageType = {
    val string = LogicalTypeAnnotation.stringType()
    Types.buildMessage()
      .addField(Types.required(INT64).named("id"))
      .addField(Types.optionalMap()
        .key(Types.required(BINARY).as(string).named("key"))
        .value(Types.optional(BINARY).as(string).named("value"))
        .named("tags"))
      .addField(Types.optional(DOUBLE).named("lat"))
      .addField(Types.optional(DOUBLE).named("lon"))
      .addField(Types.optionalList()
        .element(Types.requiredGroup()
          .addField(Types.required(INT64).named("ref"))
          .named("element"))
        .named("nds"))
      .addField(Types.optionalList()
        .element(Types.requiredGroup()
          .addField(Types.optional(BINARY).as(string).named("type"))
          .addField(Types.optional(INT64).named("ref"))
          .addField(Types.optional(BINARY).as(string).named("role"))
          .named("element"))
        .named("members"))
      .addField(Types.optional(INT64).named("changeset"))
      .addField(Types.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
        .named("timestamp"))
      .addField(Types.optional(INT32).named("uid"))
      .addField(Types.optional(BINARY).as(string).named("user"))
      .addField(Types.optional(INT32).named("version"))
      .addField(Types.optional(BOOLEAN).named("visible"))
      .named("osm")
  }

  private val WriterProps: ParquetProperties = ParquetProperties.builder()
    .withDictionaryEncoding(true)
    // High-cardinality columns (unique-per-element ids/coords/times and
    // way refs) only PAY for dictionary encoding: every value hashes
    // into the dict page until it overflows and falls back to plain —
    // profiling showed the fastutil Long2Int/Double2Int insert+rehash
    // among the hottest transcode frames. Low-cardinality columns
    // (tags, user, uid, version, visible) keep the dictionary.
    .withDictionaryEncoding("id", false)
    .withDictionaryEncoding("lat", false)
    .withDictionaryEncoding("lon", false)
    .withDictionaryEncoding("changeset", false)
    .withDictionaryEncoding("timestamp", false)
    .withDictionaryEncoding("nds.list.element.ref", false)
    .withDictionaryEncoding("members.list.element.ref", false)
    // min/max column statistics STAY ON (scan pushdown and the zone-map
    // pruning depend on them); SIZE statistics (unencoded-byte accounting
    // for external table planners) are pure per-value overhead in the hot
    // write loop with no consumer in this engine
    .withSizeStatisticsEnabled(false)
    // the page-size check walks every column buffer; at ~1KB/row the
    // default 100-row cadence rechecks ~10x per page for nothing
    .withMinRowCountForPageSizeCheck(1000)
    .build()

  /** One parquet file, written column-directly. `write(row)` shreds the
    * decoder's 13-field `InternalRow` (field 12 `type` is skipped — the
    * caller routes on it) into the 15 leaf columns of [[MessageSchema]].
    *
    * Repetition/definition levels, hand-derived once from the fixed
    * schema (parquet's standard Dremel shredding):
    *   - `id` required: (0, 0)
    *   - `tags` optional map: null → def 0; empty → def 1; entry key at
    *     def 2 (required leaf under the repeated group), value def 3
    *     when present / null at def 2; repetition 1 for entries after
    *     the first
    *   - `nds` optional list of required ref: null 0 / empty 1 /
    *     element def 2, rep 1 within the list
    *   - `members` optional list of three OPTIONAL leaves: null 0 /
    *     empty 1 / present leaf def 3, absent leaf def 2
    *   - flat optional primitives: null 0 / value def 1
    *
    * Deterministic name per (task, seq) so a retried task overwrites its
    * own partial output (Mode.OVERWRITE) — idempotent without a commit
    * protocol, because decode is deterministic per input split.
    */
  final class ColumnarWriter(path: Path, conf: Configuration,
      codec: CompressionCodecName, rowGroupBytes: Long,
      rowGroupRows: Option[Int]) {

    private val fw = new ParquetFileWriter(
      HadoopOutputFile.fromPath(path, conf), MessageSchema,
      ParquetFileWriter.Mode.OVERWRITE, rowGroupBytes,
      ParquetWriter.MAX_PADDING_SIZE_DEFAULT)
    fw.start()
    private val codecFactory = new CodecFactory(conf, WriterProps.getPageSizeThreshold)
    private val compressor = codecFactory.getCompressor(codec)
    private val descriptors = MessageSchema.getColumns // schema order

    private var pageStore: ColumnChunkPageWriteStore = _
    private var store: ColumnWriteStoreV1 = _
    private var cw: Array[ColumnWriter] = _
    private var rowsInGroup: Long = _
    private var nextSizeCheck: Long = _

    private def newRowGroup(): Unit = {
      // per-page CRCs are pure per-value overhead with no consumer here
      // (column-index truncate length = parquet default 64)
      pageStore = new ColumnChunkPageWriteStore(compressor, MessageSchema,
        HeapByteBufferAllocator.getInstance(), 64, false)
      store = new ColumnWriteStoreV1(MessageSchema, pageStore, WriterProps)
      cw = new Array[ColumnWriter](descriptors.size())
      var i = 0
      while (i < cw.length) { cw(i) = store.getColumnWriter(descriptors.get(i)); i += 1 }
      rowsInGroup = 0L
      // cap-aware initial cadence: a row-count cap BELOW the first check
      // point would otherwise be silently violated (the replaced
      // ParquetWriter enforced withRowGroupRowCountLimit on every record)
      nextSizeCheck = rowGroupRows.fold(100L)(c => math.min(100L, c.toLong))
    }
    newRowGroup()

    // fromReusedByteArray is safe: every ColumnWriter copies binary bytes
    // into its page/dictionary buffer during write()
    @inline private def bin(s: org.apache.spark.unsafe.types.UTF8String): Binary =
      Binary.fromReusedByteArray(s.getBytes)

    def write(row: InternalRow): Unit = {
      cw(0).write(row.getLong(0), 0, 0) // id

      if (row.isNullAt(1)) { cw(1).writeNull(0, 0); cw(2).writeNull(0, 0) }
      else {
        val m = row.getMap(1)
        val n = m.numElements()
        if (n == 0) { cw(1).writeNull(0, 1); cw(2).writeNull(0, 1) }
        else {
          val keys = m.keyArray(); val vals = m.valueArray()
          var i = 0
          while (i < n) {
            val r = if (i == 0) 0 else 1
            cw(1).write(bin(keys.getUTF8String(i)), r, 2)
            if (vals.isNullAt(i)) cw(2).writeNull(r, 2)
            else cw(2).write(bin(vals.getUTF8String(i)), r, 3)
            i += 1
          }
        }
      }

      if (row.isNullAt(2)) cw(3).writeNull(0, 0) else cw(3).write(row.getDouble(2), 0, 1) // lat
      if (row.isNullAt(3)) cw(4).writeNull(0, 0) else cw(4).write(row.getDouble(3), 0, 1) // lon

      if (row.isNullAt(4)) cw(5).writeNull(0, 0) // nds
      else {
        val a = row.getArray(4)
        val n = a.numElements()
        if (n == 0) cw(5).writeNull(0, 1)
        else {
          var i = 0
          while (i < n) {
            cw(5).write(a.getStruct(i, 1).getLong(0), if (i == 0) 0 else 1, 2)
            i += 1
          }
        }
      }

      if (row.isNullAt(5)) { // members
        cw(6).writeNull(0, 0); cw(7).writeNull(0, 0); cw(8).writeNull(0, 0)
      } else {
        val a = row.getArray(5)
        val n = a.numElements()
        if (n == 0) { cw(6).writeNull(0, 1); cw(7).writeNull(0, 1); cw(8).writeNull(0, 1) }
        else {
          var i = 0
          while (i < n) {
            val s = a.getStruct(i, 3)
            val r = if (i == 0) 0 else 1
            if (s.isNullAt(0)) cw(6).writeNull(r, 2) else cw(6).write(bin(s.getUTF8String(0)), r, 3)
            if (s.isNullAt(1)) cw(7).writeNull(r, 2) else cw(7).write(s.getLong(1), r, 3)
            if (s.isNullAt(2)) cw(8).writeNull(r, 2) else cw(8).write(bin(s.getUTF8String(2)), r, 3)
            i += 1
          }
        }
      }

      if (row.isNullAt(6)) cw(9).writeNull(0, 0) else cw(9).write(row.getLong(6), 0, 1)   // changeset
      if (row.isNullAt(7)) cw(10).writeNull(0, 0) else cw(10).write(row.getLong(7), 0, 1) // timestamp
      if (row.isNullAt(8)) cw(11).writeNull(0, 0) else cw(11).write(row.getInt(8), 0, 1)  // uid
      if (row.isNullAt(9)) cw(12).writeNull(0, 0) else cw(12).write(bin(row.getUTF8String(9)), 0, 1) // user
      if (row.isNullAt(10)) cw(13).writeNull(0, 0) else cw(13).write(row.getInt(10), 0, 1) // version
      if (row.isNullAt(11)) cw(14).writeNull(0, 0) else cw(14).write(row.getBoolean(11), 0, 1) // visible

      store.endRecord()
      rowsInGroup += 1
      if (rowsInGroup >= nextSizeCheck) checkRowGroupSize()
    }

    /** InternalParquetRecordWriter's row-group sizing, inlined: check the
      * buffered size on a cadence predicted from the measured bytes/row,
      * so the walk over column buffers amortizes. */
    private def checkRowGroupSize(): Unit = {
      val sz = store.getBufferedSize
      if (sz >= rowGroupBytes || rowGroupRows.exists(rowsInGroup >= _)) flushRowGroup(reinit = true)
      else {
        val perRow = math.max(1L, sz / math.max(rowsInGroup, 1L))
        val half = (rowGroupBytes - sz) / perRow / 2
        nextSizeCheck = rowsInGroup + math.min(math.max(half, 100L), 10000L)
        rowGroupRows.foreach(cap => nextSizeCheck = math.min(nextSizeCheck, cap.toLong))
      }
    }

    private def flushRowGroup(reinit: Boolean): Unit = if (rowsInGroup > 0) {
      fw.startBlock(rowsInGroup)
      store.flush() // drains values + dictionary pages into pageStore
      pageStore.flushToFileWriter(fw)
      fw.endBlock()
      store.close()
      // the final flush (close()) must not build a whole write-store
      // stack just to immediately discard it — rotation closes a writer
      // thousands of times per transcode. Null the closed store so
      // close() doesn't close it a SECOND time: re-running flush()/
      // finalizeColumnChunk() on closed writers is benign with parquet
      // 1.16's heap allocator but fragile across upgrades or a pooled
      // allocator (ADVICE r14).
      if (reinit) newRowGroup() else { rowsInGroup = 0L; store = null }
    }

    /** Flushed bytes + buffered estimate — the rotation feedback signal
      * (same contract as `ParquetWriter.getDataSize`). */
    def getDataSize: Long = fw.getPos + store.getBufferedSize

    def close(): Unit = {
      // release the codec's pooled/direct buffers even when the final
      // flush fails (disk full mid-close) — the replaced ParquetWriter
      // did this in a finally; a long-lived executor retrying tasks
      // would otherwise accumulate leaked compressor memory. fw.end runs
      // on EVERY path too: after a failed flush the file is torn either
      // way (staging reclaims it), but a never-closed output stream is a
      // leak that outlives the task — first error wins, later ones ride
      // as suppressed.
      var primary: Throwable = null
      def attempt(body: => Unit): Unit =
        try body
        catch { case t: Throwable =>
          if (primary == null) primary = t else primary.addSuppressed(t)
        }
      attempt {
        flushRowGroup(reinit = false) // closes the store iff it flushed rows
        if (store != null) store.close() // empty final group: close the untouched store
      }
      attempt(codecFactory.release())
      attempt(fw.end(java.util.Collections.emptyMap[String, String]()))
      if (primary != null) throw primary
    }
  }

  /** Task-owned writer for one element type: writes into
    * `outputDir/type=<t>/`, rotating files when the in-progress file
    * reaches `fileTargetBytes` (measured from the writer's actual buffered
    * + flushed size — the reference's own feedback loop, sink.rs:82-105)
    * or `maxRecords`. */
  final class RotatingWriter(
      typeDir: Path,
      conf: Configuration,
      codec: CompressionCodecName,
      taskTag: String,
      fileTargetBytes: Long,
      maxRecords: Long,
      rowGroupBytes: Long,
      rowGroupRows: Option[Int]) {

    /** Int-tag convenience for single-attempt callers (tools, specs). */
    def this(typeDir: Path, conf: Configuration, codec: CompressionCodecName,
             taskId: Int, fileTargetBytes: Long, maxRecords: Long,
             rowGroupBytes: Long, rowGroupRows: Option[Int]) =
      this(typeDir, conf, codec, f"$taskId%05d", fileTargetBytes, maxRecords,
        rowGroupBytes, rowGroupRows)

    private var writer: ColumnarWriter = _
    private var fileSeq = 0
    private var recordsInFile = 0L
    private var _total = 0L
    private val names = Seq.newBuilder[String]
    private val ext = if (codec == CompressionCodecName.UNCOMPRESSED) "" else s".${codec.name.toLowerCase}"

    def total: Long = _total

    /** File names this writer produced (the task-commit manifest: the
      * transcode's job commit keeps exactly the winning attempts' files). */
    def fileNames: Seq[String] = names.result()

    /** The `type=<t>` dir name this writer targets. */
    def typeName: String = typeDir.getName

    private def openNext(): Unit = {
      val name = f"part-$taskTag-$fileSeq%04d$ext.parquet"
      names += name
      writer = new ColumnarWriter(new Path(typeDir, name), conf, codec,
        rowGroupBytes, rowGroupRows)
      fileSeq += 1
      recordsInFile = 0L
    }

    def write(row: InternalRow): Unit = {
      if (writer == null) openNext()
      writer.write(row)
      recordsInFile += 1
      _total += 1
      // getDataSize walks column buffers — sample it, don't call per row
      if (recordsInFile >= maxRecords ||
          ((recordsInFile & 0x3ff) == 0 && writer.getDataSize >= fileTargetBytes)) {
        writer.close()
        writer = null
      }
    }

    def close(): Unit = if (writer != null) { writer.close(); writer = null }
  }
}
