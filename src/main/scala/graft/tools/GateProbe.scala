package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{ZOrder, ZRangeContains}

/** Measures p04's z-range pre-filter crossover: at what kept-fraction does
  * filtering envelope survivors through [[ZRangeContains]] (cost: one
  * binary search per row, zkey already computed) start paying for itself
  * in saved ×depths-explode + broadcast-join work?
  *
  * The round-8 spec proved the extremes (99.7% kept = pure overhead,
  * <5% kept = clear win); the gate constant between them
  * (`boxCells < envCells / 2`, PbfQueries) was a guess. This probe sweeps
  * kept-fraction via n×n grids of equal boxes whose per-cell coverage s IS
  * the kept fraction under the uniform spread, and times the identical
  * downstream pipeline with the filter on vs off.
  *
  * Usage: scripts/run.sh graft.tools.GateProbe [rows] [reps]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bits = ZOrder.DefaultBits

    // deterministic uniform points over the [52,53]x[11,13] envelope,
    // zkey precomputed and cached — the sweep measures the filter +
    // downstream pipeline, not point generation
    val pts = spark.range(rows)
      .withColumn("lat", lit(52.0) + (pmod(hash(col("id"), lit(1)).cast("long"), lit(1000000L))) / lit(1e6))
      .withColumn("lon", lit(11.0) + (pmod(hash(col("id"), lit(2)).cast("long"), lit(2000000L))) / lit(1e6))
      .withColumn("zkey", ZOrder.mortonKey(col("lat"), col("lon"), bits))
      .localCheckpoint()

    def gridBoxes(n: Int, s: Double): Seq[(Double, Double, Double, Double)] = {
      val frac = math.sqrt(s)
      for { i <- 0 until n; j <- 0 until n } yield {
        val la0 = 52.0 + i * (1.0 / n); val lo0 = 11.0 + j * (2.0 / n)
        (la0, la0 + frac / n, lo0, lo0 + 2.0 * frac / n)
      }
    }

    for (s <- Seq(0.05, 0.2, 0.35, 0.5, 0.65, 0.8)) {
      val boxes = gridBoxes(4, s)
      val cells = boxes.zipWithIndex.flatMap { case ((la0, la1, lo0, lo1), bid) =>
        ZOrder.bboxCells(la0, la1, lo0, lo1, bits)
          .map { case (d, p) => (bid, d, p, la0, la1, lo0, lo1) }
      }
      val depths = cells.map(_._2).distinct.sorted
      val zranges = ZOrder.unionRanges(boxes.flatMap { case (a, b, c, d) =>
        ZOrder.bboxRanges(a, b, c, d, bits) })
      val cellsDf = spark.createDataFrame(cells)
        .toDF("box_id", "depth", "prefix", "lat_min", "lat_max", "lon_min", "lon_max")
      val envCells = ZOrder.envelopeCells(52.0, 53.0, 11.0, 13.0, bits)
      val boxCells = boxes.map { case (a, b, c, d) => ZOrder.envelopeCells(a, b, c, d, bits) }.sum

      def pipeline(useZ: Boolean): Long = {
        val base = if (useZ)
          pts.filter(ZRangeContains.zInRanges(spark, col("zkey"), zranges))
        else pts
        base
          .withColumn("depth", explode(array(depths.map(lit(_)): _*)))
          .withColumn("prefix", expr(s"shiftrightunsigned(zkey, 2 * ($bits - depth))"))
          .join(broadcast(cellsDf), Seq("depth", "prefix"))
          .filter(col("lat") >= col("lat_min") && col("lat") <= col("lat_max") &&
            col("lon") >= col("lon_min") && col("lon") <= col("lon_max"))
          .groupBy(col("box_id")).agg(count(lit(1)).as("n")).count()
      }
      pipeline(useZ = true); pipeline(useZ = false) // warm
      def time(useZ: Boolean): Double = (1 to reps).map { _ =>
        val t = System.nanoTime(); pipeline(useZ); (System.nanoTime() - t) / 1e9
      }.min
      val kept = pts.filter(ZRangeContains.zInRanges(spark, col("zkey"), zranges)).count()
      val (tOn, tOff) = (time(useZ = true), time(useZ = false))
      println(f"s=$s%.2f kept=${100.0 * kept / rows}%5.1f%% cellEst=${100.0 * boxCells / envCells}%5.1f%% " +
        f"ranges=${zranges.length}%4d depths=${depths.size}%2d on=$tOn%.3f off=$tOff%.3f " +
        f"speedup_on=${tOff / tOn}%.2fx")
    }
    spark.stop()
  }
}
