package graft.sources.pbf

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.spark.sql.catalyst.InternalRow

/** Direct parquet-mr write path for the transcode sink.
  *
  * The reference's hot loop hands decoded element batches straight to an
  * `AsyncArrowWriter` owned by the worker (osm-pbf-parquet/src/sink.rs:29-44,
  * 134-153) — no row-format conversion between decode and the columnar
  * buffer. This is the Spark-side equivalent: each task feeds the decoder's
  * `InternalRow`s directly into a parquet-mr `RecordConsumer`, bypassing the
  * `DataFrame` writer entirely (which costs an UnsafeRow conversion, a
  * commit-protocol rename pass, and Spark's row-to-parquet adapter — the
  * measured ~4x writer floor from round 1).
  *
  * Schema layout matches what Spark's own parquet writer emits (standard
  * 3-level LIST / key_value MAP, TIMESTAMP(MICROS, isAdjustedToUTC=false)),
  * so `spark.read.parquet` round-trips to the identical DataFrame schema and
  * DuckDB reads it for the oracle.
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

  /** WriteSupport that consumes the decoder's InternalRows (13 fields;
    * field 12 `type` is skipped — the caller routes on it). */
  final class OsmRowWriteSupport extends WriteSupport[InternalRow] {
    private var rc: RecordConsumer = _

    override def init(conf: Configuration): WriteSupport.WriteContext =
      new WriteSupport.WriteContext(MessageSchema, java.util.Collections.emptyMap[String, String]())

    override def prepareForWrite(recordConsumer: RecordConsumer): Unit =
      rc = recordConsumer

    // fromReusedByteArray copies into parquet's buffer immediately — the
    // UTF8String byte arrays are shared with the block string table.
    @inline private def bin(s: org.apache.spark.unsafe.types.UTF8String): Binary =
      Binary.fromReusedByteArray(s.getBytes)

    override def write(row: InternalRow): Unit = {
      rc.startMessage()
      rc.startField("id", 0)
      rc.addLong(row.getLong(0))
      rc.endField("id", 0)

      if (!row.isNullAt(1)) {
        val m = row.getMap(1)
        val n = m.numElements()
        rc.startField("tags", 1)
        rc.startGroup()
        if (n > 0) {
          val keys = m.keyArray()
          val vals = m.valueArray()
          rc.startField("key_value", 0)
          var i = 0
          while (i < n) {
            rc.startGroup()
            rc.startField("key", 0)
            rc.addBinary(bin(keys.getUTF8String(i)))
            rc.endField("key", 0)
            if (!vals.isNullAt(i)) {
              rc.startField("value", 1)
              rc.addBinary(bin(vals.getUTF8String(i)))
              rc.endField("value", 1)
            }
            rc.endGroup()
            i += 1
          }
          rc.endField("key_value", 0)
        }
        rc.endGroup()
        rc.endField("tags", 1)
      }

      if (!row.isNullAt(2)) {
        rc.startField("lat", 2); rc.addDouble(row.getDouble(2)); rc.endField("lat", 2)
      }
      if (!row.isNullAt(3)) {
        rc.startField("lon", 3); rc.addDouble(row.getDouble(3)); rc.endField("lon", 3)
      }

      if (!row.isNullAt(4)) {
        val a = row.getArray(4)
        val n = a.numElements()
        rc.startField("nds", 4)
        rc.startGroup()
        if (n > 0) {
          rc.startField("list", 0)
          var i = 0
          while (i < n) {
            rc.startGroup()
            rc.startField("element", 0)
            rc.startGroup()
            rc.startField("ref", 0)
            rc.addLong(a.getStruct(i, 1).getLong(0))
            rc.endField("ref", 0)
            rc.endGroup()
            rc.endField("element", 0)
            rc.endGroup()
            i += 1
          }
          rc.endField("list", 0)
        }
        rc.endGroup()
        rc.endField("nds", 4)
      }

      if (!row.isNullAt(5)) {
        val a = row.getArray(5)
        val n = a.numElements()
        rc.startField("members", 5)
        rc.startGroup()
        if (n > 0) {
          rc.startField("list", 0)
          var i = 0
          while (i < n) {
            val s = a.getStruct(i, 3)
            rc.startGroup()
            rc.startField("element", 0)
            rc.startGroup()
            if (!s.isNullAt(0)) {
              rc.startField("type", 0); rc.addBinary(bin(s.getUTF8String(0))); rc.endField("type", 0)
            }
            if (!s.isNullAt(1)) {
              rc.startField("ref", 1); rc.addLong(s.getLong(1)); rc.endField("ref", 1)
            }
            if (!s.isNullAt(2)) {
              rc.startField("role", 2); rc.addBinary(bin(s.getUTF8String(2))); rc.endField("role", 2)
            }
            rc.endGroup()
            rc.endField("element", 0)
            rc.endGroup()
            i += 1
          }
          rc.endField("list", 0)
        }
        rc.endGroup()
        rc.endField("members", 5)
      }

      if (!row.isNullAt(6)) {
        rc.startField("changeset", 6); rc.addLong(row.getLong(6)); rc.endField("changeset", 6)
      }
      if (!row.isNullAt(7)) {
        rc.startField("timestamp", 7); rc.addLong(row.getLong(7)); rc.endField("timestamp", 7)
      }
      if (!row.isNullAt(8)) {
        rc.startField("uid", 8); rc.addInteger(row.getInt(8)); rc.endField("uid", 8)
      }
      if (!row.isNullAt(9)) {
        rc.startField("user", 9); rc.addBinary(bin(row.getUTF8String(9))); rc.endField("user", 9)
      }
      if (!row.isNullAt(10)) {
        rc.startField("version", 10); rc.addInteger(row.getInt(10)); rc.endField("version", 10)
      }
      if (!row.isNullAt(11)) {
        rc.startField("visible", 11); rc.addBoolean(row.getBoolean(11)); rc.endField("visible", 11)
      }
      rc.endMessage()
    }
  }

  private final class RowWriterBuilder(file: org.apache.parquet.io.OutputFile)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](file) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new OsmRowWriteSupport
  }

  /** One parquet file; deterministic name per (task, seq) so a retried task
    * overwrites its own partial output (Mode.OVERWRITE) — idempotent without
    * a commit protocol, because decode is deterministic per input split. */
  def open(path: Path, conf: Configuration, codec: CompressionCodecName,
           rowGroupBytes: Long, rowGroupRows: Option[Int]): ParquetWriter[InternalRow] = {
    val b = new RowWriterBuilder(HadoopOutputFile.fromPath(path, conf))
      .withConf(conf)
      .withCompressionCodec(codec)
      .withRowGroupSize(rowGroupBytes)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
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
      // for external table planners) and per-page CRCs are pure per-value
      // overhead in the hot write loop with no consumer in this engine
      .withSizeStatisticsEnabled(false)
      .withPageWriteChecksumEnabled(false)
      // the page-size check walks every column buffer; at ~1KB/row the
      // default 100-row cadence rechecks ~10x per page for nothing
      .withMinRowCountForPageSizeCheck(1000)
      .withValidation(false)
    rowGroupRows.foreach(b.withRowGroupRowCountLimit)
    b.build()
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
      taskId: Int,
      fileTargetBytes: Long,
      maxRecords: Long,
      rowGroupBytes: Long,
      rowGroupRows: Option[Int]) {

    private var writer: ParquetWriter[InternalRow] = _
    private var fileSeq = 0
    private var recordsInFile = 0L
    private var _total = 0L
    private val ext = if (codec == CompressionCodecName.UNCOMPRESSED) "" else s".${codec.name.toLowerCase}"

    def total: Long = _total

    private def openNext(): Unit = {
      val name = f"part-$taskId%05d-$fileSeq%04d$ext.parquet"
      writer = open(new Path(typeDir, name), conf, codec, rowGroupBytes, rowGroupRows)
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
