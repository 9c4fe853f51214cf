package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType, LongType}
import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native graft_morton_key expression: null propagation (the round-14
  * defect — NULL coordinates must yield a NULL key, not cell 0's
  * (-90,-180) corner tile), interpreted-vs-codegen agreement, the SQL
  * 2-arg default-bits form, and analysis-time rejection of bad inputs.
  * Value parity against a bit-by-bit interleave reference is pinned in
  * ZOrderSpec (mortonKey test); this spec owns the expression contract. */
class MortonKeySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("morton-key-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("NULL lat, lon, or both propagate to a NULL key (not cell 0)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lat", DoubleType, nullable = true),
      StructField("lon", DoubleType, nullable = true)))
    val rows = Seq(
      Row(0L, null, 13.4), Row(1L, 52.5, null), Row(2L, null, null),
      Row(3L, -90.0, -180.0), // the REAL corner point nulls must not alias
      Row(4L, 52.5, 13.4))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = df.select(col("id"),
        ZOrder.mortonKey(col("lat"), col("lon")).as("z"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(0L).isEmpty && got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L) === Some(0L), "the real corner point keys to cell 0")
    assert(got(4L).isDefined && got(4L).get > 0L)
  }

  test("interpreted eval agrees with the codegen'd scalar on a coordinate sweep") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val la = rnd.nextDouble() * 180 - 90
      val lo = rnd.nextDouble() * 360 - 180
      val interpreted = MortonKey(Literal(la), Literal(lo), Literal(26))
        .eval(null).asInstanceOf[Long]
      assert(interpreted === MortonKey.key(la, lo, 26), s"($la, $lo)")
    }
    // null children through the interpreted path
    assert(MortonKey(Literal.create(null, DoubleType), Literal(1.0), Literal(26))
      .eval(null) === null)
    assert(MortonKey(Literal(1.0), Literal.create(null, DoubleType), Literal(26))
      .eval(null) === null)
  }

  test("SQL form: 2-arg call defaults bits, 3-arg call matches the Column API") {
    MortonKey.register(spark)
    val r = spark.sql(
      "SELECT graft_morton_key(52.5D, 13.4D) AS a, " +
        s"graft_morton_key(52.5D, 13.4D, ${ZOrder.DefaultBits}) AS b, " +
        "graft_morton_key(52.5D, 13.4D, 8) AS c").head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) === MortonKey.key(52.5, 13.4, ZOrder.DefaultBits))
    assert(r.getLong(2) === MortonKey.key(52.5, 13.4, 8))
  }

  test("analysis rejects non-literal bits, out-of-range bits, and wrong types") {
    MortonKey.register(spark)
    def fails(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).head())
      assert(e.getMessage.contains("graft_morton_key"), e.getMessage)
    }
    fails("SELECT graft_morton_key(1.0D, 2.0D, CAST(id AS INT)) FROM range(1)")
    fails("SELECT graft_morton_key(1.0D, 2.0D, 0)")
    fails("SELECT graft_morton_key(1.0D, 2.0D, 32)")
    fails("SELECT graft_morton_key('x', 2.0D)")
  }
}
