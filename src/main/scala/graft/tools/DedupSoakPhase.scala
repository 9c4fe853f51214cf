package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.operators.DedupQueries
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-at-scale soak phase (run inside [[Soak]], emitted as the `dedup`
  * section of SOAK_r{N}.json): runs the REAL d02→d07 pipeline code
  * (shingle → minhash → band buckets → posting-list pairs → connected
  * components) over synthesized near-dup corpora at two scales and records
  * the measured candidate-pair counts against the Σ b(b-1)/2 prediction
  * computed from the same band buckets, plus shuffle bytes and wall time.
  *
  * The claim this pins: LSH pair space grows LINEARLY with the corpus
  * (bucket COUNT grows, bucket SIZE stays bounded by true near-dup family
  * size) — the property that makes the design survive 100 TB, measured as
  * curvature between the two scales rather than asserted from plan shape.
  *
  * Corpus: deterministic integer-mixed token streams (no RNG state) —
  * every 4 consecutive doc_ids form a near-dup FAMILY sharing a base
  * 48-token text, each member mutating every 16th token; family token
  * streams overlap across a 2000-word vocabulary so buckets see realistic
  * shingle reuse.
  */
object DedupSoakPhase {

  /** Standalone dev entry: scripts/run.sh graft.tools.DedupSoakPhase [n1 n2 ...] */
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(50000L, 200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(runJson(spark, scales))
    spark.stop()
  }

  /** Deterministic synthetic near-dup corpus as a documents-table-shaped
    * DataFrame (distributed generation — no driver materialization). */
  def corpus(s: SparkSession, nDocs: Long): DataFrame =
    s.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(47)), j => {
        val family = expr("id div 4") // integer division: / would float-split families
        val variant = col("id") % 4
        // base stream: xxhash64-mixed vocabulary pick per (family, j) —
        // a LINEAR mix makes a shingle determined by its first token
        // (503-step cycle over the vocab), so unrelated families share
        // shingle sets and pair space goes superlinear, a generator
        // artifact rather than a pipeline property. Members mutate every
        // 16th token to a variant-specific word (family-unique neighbors
        // keep the mutated shingles family-local too).
        when(pmod(j, lit(16)) === variant,
          concat(lit("m"), variant, lit("_"), j))
          .otherwise(concat(lit("w"),
            pmod(xxhash64(family, j), lit(100000L))))
      })).as("text"),
      lit("en").as("lang"),
      concat(lit("soak"), pmod(col("id"), lit(7))).as("source"))
      .withColumn("n_chars", length(col("text")))

  final case class ScaleResult(docs: Long, buckets: Long, maxBucket: Long,
                               predictedPairs: Long, distinctPairs: Long,
                               clusters: Long, shuffleMb: Long, seconds: Double,
                               drained: Boolean = true)

  def runScale(s: SparkSession, nDocs: Long): ScaleResult = {
    val shuffleBytes = new AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    s.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val docs = corpus(s, nDocs)
      // the real pipeline pieces, composed exactly as d02/d07 compose them
      val bands = DedupQueries.lshBands(DedupQueries.shingles(docs))
        .localCheckpoint() // bucket stats + pair gen share one signature run
      val bucketSizes = bands.groupBy(col("band"), col("h")).count()
        .agg(count(lit(1)).as("buckets"), max(col("count")).as("mx"),
          sum(expr("`count` * (`count` - 1) div 2")).as("pred"))
        .head()
      val pairs = DedupQueries.pairsFromBands(bands).localCheckpoint()
      val nPairs = pairs.count()
      val nClusters = DedupQueries.connectedComponents(pairs)
        .agg(countDistinct(col("cluster_id"))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      // drain the async bus BEFORE reading the counter: the final stages'
      // completion events can still be queued when the action returns, and
      // losing them undercounts shuffle_mb (secs stamped above, untimed)
      val drained = org.apache.spark.GraftListenerBus.drain(s.sparkContext)
      ScaleResult(nDocs, bucketSizes.getLong(0), bucketSizes.getLong(1),
        bucketSizes.getLong(2), nPairs, nClusters,
        shuffleBytes.get() >> 20, secs, drained)
    } finally s.sparkContext.removeSparkListener(listener)
  }

  /** Runs both scales and returns the JSON fragment for the soak artifact. */
  def runJson(s: SparkSession, scales: Seq[Long]): String = {
    val rs = scales.map(runScale(s, _))
    val items = rs.map { r =>
      f"""{"docs":${r.docs},"lsh_buckets":${r.buckets},"max_bucket":${r.maxBucket},
         |"predicted_candidate_pairs":${r.predictedPairs},
         |"distinct_candidate_pairs":${r.distinctPairs},"clusters":${r.clusters},
         |"shuffle_mb":${r.shuffleMb},"seconds":${f"${r.seconds}%.1f"},
         |"listener_drained":${r.drained}}""".stripMargin.replace("\n", "")
    }.mkString("[", ",", "]")
    val growthDocs = rs.last.docs.toDouble / rs.head.docs
    val growthPairs = rs.last.distinctPairs.toDouble / math.max(rs.head.distinctPairs, 1)
    val growthShuffle = rs.last.shuffleMb.toDouble / math.max(rs.head.shuffleMb, 1)
    f"""{"scales":$items,"docs_growth":$growthDocs%.2f,
       |"pairs_growth":$growthPairs%.2f,"shuffle_growth":$growthShuffle%.2f,
       |"note":"pairs/shuffle growth tracking docs growth = linear pair space (bucket size bounded by family size; Sum b(b-1)/2 prediction computed from the live band buckets)"}""".stripMargin.replace("\n", "")
  }
}
