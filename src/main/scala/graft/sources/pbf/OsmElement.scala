package graft.sources.pbf

import java.time.LocalDateTime

/** Typed view of the unified element schema (SURVEY.md §1.4: optional
  * case-class sugar over the canonical DataFrame). Field names/types line
  * up 1:1 with [[OsmSchema.schema]] so `.as[OsmElement]` is a plain
  * upcast — same columnar layout underneath, typed lambdas on top.
  */
final case class WayNd(ref: Long)

final case class RelMember(`type`: Option[String], ref: Option[Long],
                           role: Option[String])

final case class OsmElement(
    id: Long,
    tags: Option[Map[String, String]],
    lat: Option[Double],
    lon: Option[Double],
    nds: Option[Seq[WayNd]],
    members: Option[Seq[RelMember]],
    changeset: Option[Long],
    timestamp: Option[LocalDateTime],
    uid: Option[Int],
    user: Option[String],
    version: Option[Int],
    visible: Option[Boolean],
    `type`: String) {

  def isNode: Boolean = `type` == OsmSchema.TypeNode
  def isWay: Boolean = `type` == OsmSchema.TypeWay
  def isRelation: Boolean = `type` == OsmSchema.TypeRelation

  /** Tag lookup mirroring the reference's `tags()` iterator access. */
  def tag(key: String): Option[String] = tags.flatMap(_.get(key))
}
