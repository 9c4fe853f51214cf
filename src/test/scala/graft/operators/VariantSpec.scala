package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q43 variant shredding: the stored VARIANT column's field extraction
  * must be pushed into the DSv2 parquet scan (`PushedVariantExtractions`
  * naming the `$.k` path), and the shredded path's numbers must equal
  * the per-query JSON-string parse (q19's mechanism) bit-for-bit.
  */
class VariantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("variant-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("q43's scan pushes the variant extraction and matches the JSON-string path") {
    val q43 = RelationalQueries.all("q43_variant_shred")(spark, dir)
    val got = q43.collect()
    val plan = q43.queryExecution.executedPlan.toString
    assert(plan.contains("PushedVariantExtractions") && plan.contains("$.k"),
      s"expected the \\$$.k extraction pushed into the scan:\n$plan")

    // the string path re-parses props per row on the gate session's
    // default (V1) reader — same numbers, different materialization
    val want = graft.Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"), col("bucket"))
      .collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    assert(got.nonEmpty)
  }

  test("the variant column round-trips parquet as VariantType") {
    val layout = RelationalQueries.ensureVariant(spark, dir)
    val schema = spark.newSession().read.parquet(layout).schema
    assert(schema("v").dataType.typeName === "variant", schema.treeString)
  }
}
