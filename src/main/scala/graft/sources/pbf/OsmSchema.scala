package graft.sources.pbf

import org.apache.spark.sql.types._

/** The unified 12-column OSM element schema plus the `type` routing column.
  *
  * Mirrors the reference's single Arrow schema for all three element kinds
  * (osm-pbf-parquet/src/osm_arrow.rs:37-108): fields not applicable to a
  * kind are null (nodes have no nds/members; ways/relations no lat/lon).
  * `type` is a real column here and becomes the hive partition directory on
  * write via `partitionBy("type")` (the reference builds `/type={t}/` paths
  * by hand, sink.rs:166-179).
  */
object OsmSchema {

  val ndType: StructType = StructType(Seq(
    StructField("ref", LongType, nullable = false)))

  val memberType: StructType = StructType(Seq(
    StructField("type", StringType, nullable = true),
    StructField("ref", LongType, nullable = true),
    StructField("role", StringType, nullable = true)))

  /** Column order follows osm_arrow.rs:56-107. Timestamps are
    * millisecond-precision without timezone (osm_arrow.rs:98-102) →
    * TimestampNTZType.
    */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = true), nullable = true),
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("nds", ArrayType(ndType, containsNull = false), nullable = true),
    StructField("members", ArrayType(memberType, containsNull = false), nullable = true),
    StructField("changeset", LongType, nullable = true),
    StructField("timestamp", TimestampNTZType, nullable = true),
    StructField("uid", IntegerType, nullable = true),
    StructField("user", StringType, nullable = true),
    StructField("version", IntegerType, nullable = true),
    StructField("visible", BooleanType, nullable = true),
    StructField("type", StringType, nullable = false)))

  val TypeNode = "node"
  val TypeWay = "way"
  val TypeRelation = "relation"

  /** Way node locations (the optional LocationsOnWays feature,
    * osmformat.proto Way.lat/lon = 9/10): degree doubles with the same
    * coordinate math as node lat/lon. The reference LIBRARY exposes these
    * (osmpbf/src/elements.rs:201-216, 390-423) even though the reference
    * APP ignores them — surfaced here behind the source's
    * `wayLocations=true` read option as a trailing `node_locations`
    * column, so the default schema (and every existing reader/writer of
    * it) is byte-identical.
    */
  val nodeLocationType: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false)))

  val NodeLocationsField: StructField = StructField("node_locations",
    ArrayType(nodeLocationType, containsNull = false), nullable = true)

  val schemaWithWayLocations: StructType = StructType(schema :+ NodeLocationsField)

  def schemaFor(wayLocations: Boolean): StructType =
    if (wayLocations) schemaWithWayLocations else schema
}
