package graft.cli

import org.apache.spark.sql.SparkSession

/**
 * Table-maintenance CLI — the OPTIMIZE face of [[graft.ops.Layout]].
 * The playbook surface can WRITE physically-laid-out tables
 * (bucketBy/zorderBy/bloomIndexBy in the destination config); this is
 * the operational counterpart a data platform runs on a schedule:
 * small-file compaction (with automatic side-index rebuild), Z-order
 * re-clustering, bloom side-index build/rebuild, and index coherence
 * verification — all from the command line, no Scala required.
 *
 * Beyond-reference surface (the reference has no table-layout story);
 * the commands delegate to the same Layout operators the oracled
 * queries and specs pin.
 *
 * {{{
 * graft.cli.Maintain compact      -path DIR -target-bytes N [-small-bytes N]
 * graft.cli.Maintain zorder       -in DIR -out DIR -by c1,c2 [-bits N] [-files N]
 * graft.cli.Maintain bloom-index  -path DIR -column C [-index DIR] [-items N] [-fpp F]
 * graft.cli.Maintain verify-index -path DIR -column C [-index DIR]
 * }}}
 *
 * Exit codes: 0 ok, 1 operation failed (e.g. stale index), 2 usage.
 */
object Maintain {

  val usage: String =
    """usage: graft.cli.Maintain <command> [options]
      |  compact      -path DIR -target-bytes N [-small-bytes N]
      |               merge adjacent small files into ~target-size bins
      |               (crash-safe journaled swap; stamped bloom side
      |               indexes under <path>_bloomidx_* are rebuilt)
      |  zorder       -in DIR -out DIR -by c1,c2 [-bits N] [-files N]
      |               write a Z-order-clustered copy of a table
      |  bloom-index  -path DIR -column C [-index DIR] [-items N] [-fpp F]
      |               build/rebuild the per-file bloom side index
      |               (default index path: <path>_bloomidx_<column>)
      |  verify-index -path DIR -column C [-index DIR]
      |               check the side index is coherent with the live
      |               table; prints the stamp, exit 1 if stale
      |""".stripMargin

  def main(argv: Array[String]): Unit = {
    if (argv.isEmpty || argv(0) == "-help" || argv(0) == "--help") {
      println(usage); return
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-maintain")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rc =
      try run(spark, argv(0), parseOpts(argv.drop(1).toList))
      finally spark.stop()
    if (rc != 0) sys.exit(rc)
  }

  private def parseOpts(args: List[String]): Map[String, String] = args match {
    case key :: value :: rest if key.startsWith("-") =>
      parseOpts(rest) + (key.stripPrefix("-") -> value)
    case Nil => Map.empty
    case bad :: _ => throw new IllegalArgumentException(s"unexpected argument '$bad'")
  }

  /** Testable core: returns the exit code instead of exiting. */
  def run(spark: SparkSession, command: String, opts: Map[String, String]): Int = {
    def req(k: String): Option[String] = {
      val v = opts.get(k)
      if (v.isEmpty) System.err.println(s"[maintain] $command: missing -$k\n$usage")
      v
    }
    command match {
      case "compact" =>
        (req("path"), req("target-bytes")) match {
          case (Some(path), Some(target)) =>
            val stats = graft.ops.Layout.compactFiles(spark, path,
              targetBytes = target.toLong,
              smallBytes = opts.get("small-bytes").map(_.toLong).getOrElse(Long.MaxValue))
            println(s"[maintain] compact $path: bins=${stats.binsCompacted} " +
              s"removed=${stats.filesRemoved} written=${stats.filesWritten} " +
              s"indexes_rebuilt=${stats.indexesRebuilt}")
            0
          case _ => 2
        }
      case "zorder" =>
        (req("in"), req("out"), req("by")) match {
          case (Some(in), Some(out), Some(by)) =>
            val dims = by.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val df = spark.read.parquet(in)
            graft.ops.Layout.writeClustered(df, out, dims,
              bits = opts.get("bits").map(_.toInt).getOrElse(16),
              files = opts.get("files").map(_.toInt).getOrElse(0))
            println(s"[maintain] zorder $in -> $out on ${dims.mkString(",")}")
            0
          case _ => 2
        }
      case "bloom-index" =>
        (req("path"), req("column")) match {
          case (Some(path), Some(column)) =>
            val index = opts.getOrElse("index", s"${path}_bloomidx_$column")
            graft.ops.Layout.writeBloomIndex(spark, path, index, column,
              itemsPerFile = opts.get("items").map(_.toLong).getOrElse(1000000L),
              fpp = opts.get("fpp").map(_.toDouble).getOrElse(0.01))
            println(s"[maintain] bloom-index $path($column) -> $index")
            0
          case _ => 2
        }
      case "verify-index" =>
        (req("path"), req("column")) match {
          case (Some(path), Some(column)) =>
            val index = opts.getOrElse("index", s"${path}_bloomidx_$column")
            try {
              val meta = graft.ops.Layout.verifyBloomIndex(spark, path, index, column)
              println(s"[maintain] verify-index OK: $index over $path " +
                s"(column=${meta.column} items_per_file=${meta.itemsPerFile} " +
                s"fpp=${meta.fpp} table_fp=${meta.tableFp.take(12)}…)")
              0
            } catch {
              case e: IllegalStateException =>
                System.err.println(s"[maintain] verify-index FAILED: ${e.getMessage}")
                1
            }
          case _ => 2
        }
      case other =>
        System.err.println(s"[maintain] unknown command '$other'\n$usage")
        2
    }
  }
}
