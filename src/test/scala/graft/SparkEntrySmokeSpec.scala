package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface smoke: every SparkEntry query runs at sf0.001, the
  * flagship entry returns rows, and every oracle key has a query. The
  * DuckDB hash-compare is the driver's job (scripts/check.py locally);
  * this guards the surface inside `sbt test`.
  */
class SparkEntrySmokeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("entry-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      // global scale invariants, enforced on EVERY query's plan (incl.
      // subquery plans): a cartesian product or an unpartitioned window
      // is O(n²) / single-task at 100 TB no matter how fast it looks at
      // sf0.001. (The known 1-row aggregate cross joins broadcast, so
      // they plan as BroadcastNestedLoopJoin, never CartesianProduct.)
      val qe = df.queryExecution
      assert(!qe.executedPlan.toString.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      val unpartitioned = qe.optimizedPlan.collectWithSubqueries {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty,
        s"$name has a window with no PARTITION BY — a single-task sort at scale")
      df.count() // materialize — throws on any runtime error
    }
  }
}
