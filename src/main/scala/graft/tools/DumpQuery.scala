package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: dump a SUBSET of SparkEntry queries + their oracle SQL in
  * Verify's output layout, so scripts/check.py can gate just the queries
  * under work without a full Verify run:
  *
  *   scripts/run.sh graft.tools.DumpQuery <sfDir> <outDir> <name>...
  *   python3 scripts/check.py <sfDir> <outDir>
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"dumped $name")
    }
    def q(s: String): String = graft.JsonEscape.q(s) // same escaper as Verify
    val json = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
