package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.engine.{Model, OutputFormat, RelationText, SpatialConfig, SpatialJoin, SubGeom, RefEdge}

/** The reference's CLI entry point re-expressed on Spark (reference
  * SpatialJoinMain.cpp): line-separated WKT in (stdin, one file, or two
  * files as the non-self left/right sides), relations out (stdout or
  * `-o out[.gz|.bz2]`), with the reference's flags:
  *
  *   --de9im | --within-distance M        mode selection
  *   --prefix/--suffix/--intersects/...   output separators
  *   --no-box-ids / --no-diag-box / --no-oriented-envelope /
  *   --no-fast-sweep-skip / --use-inner-outer
  *                                        filter toggles (output-invariant)
  *   --no-surface-area                    accepted no-op (the reference's
  *                                        area-precompare shortcut has no
  *                                        engine analogue; results and the
  *                                        other toggles are unaffected)
  *   --no-geometry-checks                 candidate count only (stderr)
  *   --stats                              filter-cascade counters + per-
  *                                        predicate relation counts on
  *                                        stderr (reference --stats,
  *                                        SpatialJoinMain.cpp:227)
  *   --num-threads N                      local[N] (a cluster deploy sets
  *                                        --master via spark-submit instead)
  *
  *   -c/--cache DIR                       intermediate-file directory
  *                                        (reference: GeometryCache spill
  *                                        dir, default '.'; here it becomes
  *                                        spark.local.dir — the engine's
  *                                        shuffle/spill scratch). Write-once
  *                                        REUSABLE indexes are the library's
  *                                        `graft.engine.SpatialIndex`.
  *   --num-caches / --cache-max-size / --cache-max-elements
  *                                        accepted no-ops (per-thread cache
  *                                        memory tuning; executor memory
  *                                        config plays that role here) so
  *                                        reference command lines run
  *                                        unchanged.
  *
  * Input `.gz`/`.bz2` decompress natively in the text
  * source. Stdin spools to a temp file in 1 MB
  * chunks and runs through the same distributed text path as file input.
  */
object SpatialJoinCli {

  final case class CliArgs(
      inputs: Seq[String] = Nil,
      output: String = "",
      cfg: SpatialConfig = SpatialConfig(),
      fmt: OutputFormat = OutputFormat(),
      noGeometryChecks: Boolean = false,
      printStats: Boolean = false,
      numThreads: Int = 0,
      verbose: Boolean = false,
      cacheDir: String = "")

  val usage: String =
    """spatialjoin-spark [options] [<input> [<input2>]]
      |
      |Computes all spatial relations between the input geometries
      |(line-separated WKT, `id \t [side \t] WKT-or-<refs>`). One input =
      |self join (unless lines carry sides); two inputs = left/right sides.
      |No input = read stdin.
      |
      |  -o, --output <f>          write relations to f (.gz/.bz2 by suffix)
      |      --de9im               emit DE-9IM matrices instead of predicates
      |      --within-distance <m> emit pairs within m meters with distances
      |      --prefix/--suffix <s> output line decoration
      |      --intersects/--contains/--covers/--touches/--equals/
      |      --overlaps/--crosses <s>   per-predicate separators
      |      --no-box-ids          disable the full-cell decide shortcut
      |      --no-diag-box         disable the 45-degree diag-box pair filter
      |      --no-oriented-envelope disable the oriented-bbox pair filter
      |      --no-fast-sweep-skip  disable the edge-index sweep skip
      |      --use-inner-outer     enable inner/outer simplification checks
      |      --no-surface-area     accepted no-op (see scaladoc)
      |      --no-geometry-checks  report the candidate count only
      |      --stats               filter-cascade + relation stats on stderr
      |  -c, --cache <dir>         intermediate-file (spill) directory
      |      --num-caches/--cache-max-size/--cache-max-elements <v>
      |                            accepted no-ops (executor memory config)
      |      --num-threads <n>     local[n]
      |  -v, --verbose             INFO logging
      |  -h, --help                this message
      |""".stripMargin

  def parseArgs(argv: Seq[String]): CliArgs = {
    @annotation.tailrec
    def go(rest: List[String], a: CliArgs): CliArgs = rest match {
      case Nil => a
      case ("-h" | "--help") :: _ =>
        println(usage); sys.exit(0)
      case ("-o" | "--output") :: v :: t => go(t, a.copy(output = v))
      case "--de9im" :: t => go(t, a.copy(cfg = a.cfg.copy(mode = "de9im")))
      case ("--within-distance" | "--within-dist") :: v :: t =>
        go(t, a.copy(cfg = a.cfg.copy(mode = "distance",
          withinDist = v.toDouble)))
      case "--prefix" :: v :: t => go(t, a.copy(fmt = a.fmt.copy(prefix = v)))
      case "--suffix" :: v :: t => go(t, a.copy(fmt = a.fmt.copy(suffix = v)))
      case "--intersects" :: v :: t =>
        go(t, a.copy(fmt = a.fmt.copy(sepIntersects = v)))
      case "--contains" :: v :: t =>
        go(t, a.copy(fmt = a.fmt.copy(sepContains = v)))
      case "--covers" :: v :: t =>
        go(t, a.copy(fmt = a.fmt.copy(sepCovers = v)))
      case "--touches" :: v :: t =>
        go(t, a.copy(fmt = a.fmt.copy(sepTouches = v)))
      case "--equals" :: v :: t =>
        go(t, a.copy(fmt = a.fmt.copy(sepEquals = v)))
      case "--overlaps" :: v :: t =>
        go(t, a.copy(fmt = a.fmt.copy(sepOverlaps = v)))
      case "--crosses" :: v :: t =>
        go(t, a.copy(fmt = a.fmt.copy(sepCrosses = v)))
      case "--no-box-ids" :: t =>
        go(t, a.copy(cfg = a.cfg.copy(useBoxIds = false)))
      case "--no-diag-box" :: t =>
        go(t, a.copy(cfg = a.cfg.copy(useDiagBox = false)))
      case "--no-oriented-envelope" :: t =>
        go(t, a.copy(cfg = a.cfg.copy(useOrientedBox = false)))
      case "--no-fast-sweep-skip" :: t =>
        go(t, a.copy(cfg = a.cfg.copy(useFastSweepSkip = false)))
      case "--use-inner-outer" :: t =>
        go(t, a.copy(cfg = a.cfg.copy(useInnerOuter = true)))
      case "--no-surface-area" :: t =>
        System.err.println("[spatialjoin] --no-surface-area accepted " +
          "(no-op: no area-precompare shortcut in this engine)")
        go(t, a)
      case "--no-geometry-checks" :: t =>
        go(t, a.copy(noGeometryChecks = true))
      case ("-c" | "--cache") :: v :: t => go(t, a.copy(cacheDir = v))
      case ("--num-caches" | "--cache-max-size" |
          "--cache-max-elements") :: v :: t =>
        System.err.println(s"[spatialjoin] ${rest.head} $v accepted " +
          "(no-op: executor memory config plays this role)")
        go(t, a)
      case "--stats" :: t => go(t, a.copy(printStats = true))
      case "--num-threads" :: v :: t => go(t, a.copy(numThreads = v.toInt))
      case ("-v" | "--verbose") :: t => go(t, a.copy(verbose = true))
      case f :: t if !f.startsWith("-") => go(t, a.copy(inputs = a.inputs :+ f))
      case f :: _ =>
        throw new IllegalArgumentException(s"unknown flag $f\n$usage")
    }
    val a = go(argv.toList, CliArgs())
    require(a.inputs.size <= 2, "at most two input files (left/right sides)")
    a
  }

  /** Parse inputs into the engine tables. Two files = non-self join with
    * the file index as the DEFAULT side (reference README: left/right as
    * two file arguments); an explicit per-line side field overrides it,
    * exactly like the reference (WKTParse.h:139). Default line-number ids
    * continue across the files via parseLines' idOffset (the reference
    * reads both inputs sequentially into one id space) while authored ids
    * pass through verbatim. The geometry table comes back persisted: the
    * side probe below and run()'s own stats pass both reuse the one
    * parse. */
  def readInputs(spark: SparkSession, a: CliArgs)
      : (Dataset[SubGeom], Dataset[RefEdge], SpatialConfig) = {
    import spark.implicits._
    def fileLines(p: String): Dataset[String] = spark.read.textFile(p)
    val ((g0, r), cfg0) = a.inputs match {
      case Seq() =>
        // spool stdin to a temp file in fixed 1 MB chunks and read it back
        // through the distributed text source — the reference streams
        // stdin in 1 MB chunks too (SpatialJoinMain.cpp:359-433); fully
        // materializing a large pipe on the driver would OOM. (Driver-local
        // temp file: stdin input is inherently a single-host entry point;
        // cluster deploys pass files.)
        val tmp = java.nio.file.Files.createTempFile("graft_stdin_", ".wkt")
        tmp.toFile.deleteOnExit()
        val out = java.nio.file.Files.newOutputStream(tmp)
        try {
          val buf = new Array[Byte](1 << 20)
          var n = System.in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = System.in.read(buf) }
        } finally out.close()
        (Model.parseLines(spark, fileLines(tmp.toString)), a.cfg)
      case Seq(one) =>
        (Model.parseLines(spark, fileLines(one)), a.cfg)
      case Seq(left, right) =>
        val leftLines = fileLines(left)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nLeft = leftLines.count()
        val (gl, rl) = Model.parseLines(spark, leftLines, defaultSide = 0)
        val (gr, rr) =
          Model.parseLines(spark, fileLines(right), nLeft, defaultSide = 1)
        ((gl union gr, rl union rr), a.cfg.copy(selfJoin = false))
    }
    val geoms = g0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // reference README: "If sides are defined, only geometries from
    // different sides are compared" — per-line side fields switch the
    // single-input modes to a non-self join. The probe materializes the
    // persisted parse that run() then reuses.
    val cfg =
      if (!cfg0.selfJoin) cfg0
      else cfg0.copy(selfJoin = geoms.filter(_.side == 1).take(1).isEmpty)
    (geoms, r, cfg)
  }

  /** Reference-style `--stats` report (role of Stats.h:63-324 +
    * numReferences/relation counters): the fused kernel's filter-cascade
    * accumulators plus per-predicate relation counts, on stderr. The
    * cascade counters exist for the fused path; the general path (refs /
    * >63-sub multis) reports relation counts only. */
  def printStatsReport(spark: SparkSession,
      rels: org.apache.spark.sql.DataFrame, cfg: SpatialConfig): Unit = {
    val e = System.err
    def v(acc: org.apache.spark.util.LongAccumulator): String =
      if (acc == null) "n/a" else acc.value.toString
    e.println("[stats] ---- filter cascade (fused kernel) ----")
    e.println(s"[stats] pair tests:                ${v(SpatialJoin.lastPairTests)}")
    e.println(s"[stats] bbox passes:               ${v(SpatialJoin.lastBboxPass)}")
    e.println(s"[stats] first-common-cell passes:  ${v(SpatialJoin.lastCellPass)}")
    e.println(s"[stats] decided by shortcuts:      ${v(SpatialJoin.lastDecided)}")
    e.println(s"[stats] exact geometry checks:     ${v(SpatialJoin.lastExactChecks)}")
    e.println(s"[stats] non-intersecting after exact: ${v(SpatialJoin.lastIsectMiss)}")
    e.println(s"[stats] numReferences:             ${SpatialJoin.lastNumReferences}")
    e.println("[stats] ---- relations ----")
    if (cfg.mode == "predicates") {
      import org.apache.spark.sql.functions.count
      val counts = rels.groupBy("predicate").agg(count("*").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      counts.foreach { case (p, n) =>
        e.println(f"[stats] $p%-12s $n%d")
      }
      e.println(s"[stats] total:        ${counts.map(_._2).sum}")
    } else {
      e.println(s"[stats] total (${cfg.mode}): ${rels.count()}")
    }
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv.toIndexedSeq)
    val threads = if (a.numThreads > 0) a.numThreads.toString else "*"
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", s"local[$threads]"))
      .appName("spatialjoin")
      .config("spark.ui.enabled", "false")
    val spark =
      (if (a.cacheDir.nonEmpty) b.config("spark.local.dir", a.cacheDir)
       else b).getOrCreate()
    spark.sparkContext.setLogLevel(if (a.verbose) "INFO" else "WARN")
    if (a.printStats)
      spark.conf.set("graft.kernel.pairstats", "true")
    try {
      val (geoms, refs, cfg) = readInputs(spark, a)
      if (a.noGeometryChecks) {
        // reference --no-geometry-checks: only report candidate count
        val n = SpatialJoin.candidates(spark, geoms, cfg).count()
        System.err.println(s"[spatialjoin] candidates: $n")
      } else {
        val rels0 = SpatialJoin.run(spark, geoms, refs, cfg)
        // --stats reads the output twice (write + counts): persist once
        val rels =
          if (a.printStats)
            rels0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else rels0
        if (a.output.nonEmpty) RelationText.write(rels, a.output, cfg, a.fmt)
        else {
          // stream partitions through the driver without materializing all
          val it = RelationText.lines(rels, cfg, a.fmt).toLocalIterator()
          while (it.hasNext) println(it.next())
        }
        if (a.printStats)
          printStatsReport(spark, rels, cfg)
      }
    } finally spark.stop()
  }
}
