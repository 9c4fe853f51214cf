package graft

import graft.sources.pbf.{OsmPbf, PbfConfig}
import org.apache.spark.sql.SparkSession

/** CLI entry point — the engine's equivalent of the reference's transcode
  * binary (osm-pbf-parquet/src/main.rs + util.rs:24-64 arg surface):
  *
  * {{{
  * graft.Main --input planet.osm.pbf [--output ./parquet]
  *   [--compression 3] [--input-buffer-size-mb 16]
  *   [--max-records-per-file N] [--file-target-mb 500]
 *   [--row-group-target-mb 128] [--max-row-group-count N]
 *   [--commit-mode rename|pointer]
 *   [--master local[*] | --worker-threads N]
  *
  * graft.Main --validate <expectedParquet> --against <actualParquet>
  *   # the reference's validate.py as a CLI verb: prints the V1-V5
  *   # report and exits non-zero on any violation
  * }}}
  *
  * Reads the PBF through the osmpbf source and writes hive-partitioned
  * (`type=node/way/relation`) zstd parquet.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = cleanExit(parseArgs(args))
    val master = cleanExit(masterOf(opts))
    // validate mode — the reference's validate.py as a CLI verb:
    //   graft.Main --validate <expectedParquet> --against <actualParquet>
    if (opts.contains("validate")) {
      val expected = opts("validate")
      val actual = opts.getOrElse("against",
        { System.err.println("missing required --against"); sys.exit(2) })
      val spark = SparkSession.builder()
        .master(master)
        .appName("graft-osm-validate")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      // collect the handful of report rows ONCE (show + filter would each
      // re-run the full scan-and-join suite), and exit only after
      // spark.stop() — sys.exit inside try skips finally
      val bad =
        try {
          val rows = graft.sources.pbf.OsmValidate.report(
            spark.read.parquet(expected), spark.read.parquet(actual)).collect()
          rows.foreach(r => println(f"${r.getString(0)}%-22s ${r.getLong(1)}%d"))
          rows.exists(_.getLong(1) > 0)
        } finally spark.stop()
      if (bad) sys.exit(1)
      return
    }
    // validate() stays INSIDE the clean-exit scope: an in-syntax but
    // out-of-range value (--compression 23) is the same user error as a
    // non-numeric one and gets the same one-line exit-2, not a stack trace
    val config = cleanExit {
      val c = PbfConfig(
        input = opts.getOrElse("input",
          { System.err.println("missing required --input"); sys.exit(2) }),
        output = opts.getOrElse("output", "./parquet"),
        compression = numeric(opts, "compression", "3").toInt,
        inputBufferSizeMb = numeric(opts, "input-buffer-size-mb", "16").toInt,
        maxRecordsPerFile = numeric(opts, "max-records-per-file", "5000000").toLong,
        fileTargetMb = opts.get("file-target-mb").map(v => numeric("file-target-mb", v).toInt),
        rowGroupTargetMb = numeric(opts, "row-group-target-mb", "128").toInt,
        maxRowGroupRows = opts.get("max-row-group-count").map(v => numeric("max-row-group-count", v).toInt),
        // rename (default, HDFS-class atomic-rename stores) or pointer
        // (object stores: write-once generation + _CURRENT PUT, no renames)
        commitMode = opts.getOrElse("commit-mode", PbfConfig.CommitRename))
      c.validate()
      c
    }

    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-osm-pbf-transcode")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    try OsmPbf.transcode(spark, config)
    finally spark.stop()
  }

  /** The full accepted option surface (the reference's clap Args,
    * util.rs:24-64, plus the validate verb). Anything else is an ERROR,
    * matching clap — through round 15 a misspelled option (`--compresion
    * 5`) was silently dropped and the default ran instead. */
  private val KnownOpts = Set("input", "output", "compression",
    "input-buffer-size-mb", "max-records-per-file", "file-target-mb",
    "row-group-target-mb", "max-row-group-count", "master", "worker-threads",
    "commit-mode", "validate", "against")

  /** Every user input error — unknown option, dangling arg, non-numeric
    * or out-of-range value — exits 2 with a one-line message (clap
    * parity), never a raw stack trace. NumberFormatException is an
    * IllegalArgumentException, so huge-digit overflows land here too. */
  private def cleanExit[T](body: => T): T =
    try body
    catch { case e: IllegalArgumentException =>
      System.err.println(e.getMessage); sys.exit(2)
    }

  /** A numeric option's raw string, failing TYPED on a non-number —
    * clap prints "invalid value 'abc' for --compression" and exits;
    * before this guard a `--compression abc` escaped as a raw
    * NumberFormatException stack trace while every other parse problem
    * got the clean exit-2 path (cleanExit catches the IAE). */
  private[graft] def numeric(opts: Map[String, String], name: String,
      default: String): String =
    numeric(name, opts.getOrElse(name, default))

  private[graft] def numeric(name: String, v: String): String = {
    if (!v.matches("-?\\d+"))
      throw new IllegalArgumentException(
        s"invalid value '$v' for --$name: expected an integer")
    v
  }

  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"dangling argument: ${args.lastOption.getOrElse("")} (options are --name value pairs)")
    args.sliding(2, 2).map {
      case Array(k, v) if k.startsWith("--") && KnownOpts(k.stripPrefix("--")) =>
        k.stripPrefix("--") -> v
      case Array(k, _) => throw new IllegalArgumentException(
        s"unknown option: $k (accepted: ${KnownOpts.toSeq.sorted.map("--" + _).mkString(", ")})")
    }.toMap
  }

  /** `--worker-threads N` (the reference's thread-count knob,
    * osm-pbf-parquet/src/util.rs:44-45) is accepted as an alias for the
    * local master's thread count; an explicit `--master` wins if both
    * are given.
    */
  private[graft] def masterOf(opts: Map[String, String]): String =
    opts.get("master").orElse(opts.get("worker-threads").map { n =>
      // length cap short-circuits before toInt so a huge-digit value gets
      // THIS message, not toInt's NumberFormatException one
      require(n.matches("\\d+") && n.length <= 9 && n.toInt > 0,
        s"--worker-threads must be a positive integer, got: $n")
      s"local[$n]"
    }).getOrElse("local[*]")
}
