package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over the documents table.
  *
  * All operators here are deliberately expressed with engine-portable
  * primitives (md5, string min/agg, array ops) so each has an exact DuckDB
  * twin: minhash signatures are *lexicographic minima of salted md5
  * strings* rather than modular-arithmetic hashes — same LSH guarantees,
  * zero cross-engine hash drift.
  */
object TextSim {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.parquet(s, s"$dir/documents.parquet")

  /** word 3-gram shingles per doc. */
  private def shingles(d: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    d.select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ", col("w")(i), col("w")(i + 1), col("w")(i + 2))))
        .as("sh"))
  }

  /** MinHash signatures: k salted-md5 minima per doc, computed as k
    * aggregate columns in ONE map-side-combined groupBy — the shuffle
    * carries one partial row per (doc, partition) instead of k exploded
    * copies of every shingle (12x less shuffle at any scale). */
  def minhashSigs(s: SparkSession, dir: String, k: Int = 12): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(i.toLong), lit(":"), col("sh")))).as(s"sig$i"))
    shingles(docs(s, dir))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** (band, bv) structs from the k wide `sig<i>` columns — the ONE
    * definition of the band hash, shared by the groupBy path
    * (minhashBands) and the projection path (bandsProjection) so the two
    * cannot drift apart (TextSimSpec pins them equal, and the DuckDB
    * bandsSql oracle mirrors exactly this shape). */
  private def bandStructs(k: Int, r: Int): Seq[Column] =
    (0 until k / r).map { b =>
      struct(lit(b.toLong).as("band"),
        md5(concat_ws(",",
          (0 until r).map(j => col(s"sig${b * r + j}")): _*)).as("bv"))
    }

  /** LSH banding: band value = md5 of the band's r sigs in i-order.
    * Derived column-wise from the wide signature row (no second shuffle). */
  def minhashBands(s: SparkSession, dir: String, k: Int = 12, r: Int = 3)
      : DataFrame =
    minhashSigs(s, dir, k)
      .select(col("doc_id"),
        explode(array(bandStructs(k, r): _*)).as("_graft_s"))
      .select(col("doc_id"), col("_graft_s.band").as("band"),
        col("_graft_s.bv").as("bv"))

  /** Word 3-gram shingles as ONE array column (no explode): the
    * stateless building block of [[bandsProjection]]. Null for docs with
    * fewer than 3 words (the caller filters).
    *
    * PERF (r6, guide §2.3/§7.2): the r5 form inlined `split(text, " ")`
    * at every element access inside the transform lambda — Catalyst does
    * not subexpression-eliminate inside lambda bodies, so the text was
    * re-split ~3x PER SHINGLE (O(words²) per document). Worse, the
    * caller's `filter(shs.isNotNull)` pushed this whole expression below
    * the scan's repartition, re-evaluating it single-threaded in the
    * 1-task scan stage (~2.9 s CPU per pass at sf0.1). The fix binds the
    * split to a real column once per row ([[withShingles]]) and filters
    * on the cheap `size(words) >= 3` BEFORE the shingle transform, so the
    * pushed-down predicate is a string split, not the O(words²) chain,
    * and shs is non-null by construction. */
  private def shinglesOfWords(w: Column): Column =
    transform(sequence(lit(0), size(w) - 3),
      i => concat_ws(" ", w(i), w(i + 1), w(i + 2)))

  /** d filtered to >=3-word rows, plus a non-null `shs` shingle column —
    * the shared scan shape of the projection paths (row set and `shs`
    * values identical to the r5 shingleArray + isNotNull filter). */
  private def withShingles(d: DataFrame): DataFrame =
    d.withColumn("_graft_w", split(col("text"), " "))
      .filter(size(col("_graft_w")) >= 3)
      .withColumn("shs", shinglesOfWords(col("_graft_w")))
      .drop("_graft_w")

  /** Stateless projection form of the minhash LSH bands: shingle array,
    * k salted-md5 minima (array_min == the groupBy min over exploded
    * shingles), and band values are all expressions over ONE row — no
    * explode-shuffle, no aggregation, no state — so the SAME plan runs on
    * a batch DataFrame and on a STREAM of documents (the batch
    * minhashSigs/minhashBands shape is kept for the oracled q17 path,
    * where the map-side-combined groupBy is the right shuffle shape for a
    * corpus-sized input; this projection is the right shape for a
    * micro-batch). Emits one row per (input row, band) with every input
    * column preserved plus (shs, band, bv) — those three names (and the
    * internal `sig<i>`/`_graft_*` temporaries) are reserved: an input
    * already carrying one of them is rejected up front rather than
    * silently clobbered or failed at analysis depth. (doc_id, band, bv)
    * is parity-pinned against minhashBands in TextSimSpec. */
  def bandsProjection(d: DataFrame, k: Int = 12, r: Int = 3): DataFrame = {
    val reserved = Set("shs", "band", "bv") ++
      (0 until k).map(i => s"sig$i") ++ Set("_graft_s", "_graft_w")
    // compare case-insensitively: Spark resolves columns case-insensitively
    // by default, so an input column named `Band` would collide downstream
    // just as surely as `band`
    val clash = d.columns.filter(c => reserved(c.toLowerCase))
    require(clash.isEmpty,
      s"bandsProjection: input columns collide with reserved names: " +
        clash.mkString(", "))
    val sigs = (0 until k).map(i =>
      array_min(transform(col("shs"),
        sh => md5(concat(lit(i.toLong), lit(":"), sh)))).as(s"sig$i"))
    withShingles(d)
      .select(col("*") +: sigs: _*)
      .withColumn("_graft_s", explode(array(bandStructs(k, r): _*)))
      .select((d.columns.toIndexedSeq.map(col) :+ col("shs") :+
        col("_graft_s.band").as("band") :+
        col("_graft_s.bv").as("bv")): _*)
  }

  /** Incremental near-dup screening: a STREAM of new documents
    * (doc_id, ts, text) against the STATIC corpus documents table — the
    * "dedup today's crawl against yesterday's index" operation. Stream
    * side: [[bandsProjection]] (pure projection, stateless). Corpus
    * side: the same bands plus one distinct-shingle array per corpus
    * doc, both bounded static tables (broadcast or hash-joined per
    * micro-batch; at a 100 TB corpus, write the band table bucketed by
    * (band, bv) so each micro-batch join prunes to the buckets the
    * stream actually touches). Stream-static equi-join on (band, bv) yields
    * candidates; pairs sharing several bands are deduped with
    * dropDuplicatesWithinWatermark (bounded per-key state, the
    * [[graft.streaming.StreamOps.dedupStream]] contract); exact word
    * 3-gram jaccard is then computed PER ROW from the two shingle
    * arrays — no pair aggregation anywhere, so the whole pipeline is
    * stateless apart from the bounded candidate dedup. Emits
    * (doc_id, corpus_id, jaccard) with jaccard >= 0.5. Runs identically
    * on a batch DataFrame (the dedup degrades to dropDuplicates). */
  def nearDupStream(s: SparkSession, stream: DataFrame, dir: String,
      watermark: String = "30 minutes"): DataFrame =
    nearDupScreen(s, stream,
      corpusScreen(s, dir, persist = stream.isStreaming), watermark)

  /** A prepared corpus near-dup screen: LSH band table
    * (corpus_id, band, bv) and distinct-shingle arrays (corpus_id, csh).
    * Built inline with [[corpusScreen]] (cached DataFrames — callers own
    * the caches and should [[CorpusScreen.unpersist]] when their stream
    * stops) or write-once with [[writeCorpusScreen]] /
    * [[readCorpusScreen]] (parquet-backed, nothing to release — the scale
    * path: the corpus prep cost is paid exactly once, not per stream
    * start, and the band files are laid out clustered by (band, bv) so a
    * micro-batch's bucket joins prune). */
  final case class CorpusScreen(bands: DataFrame, shingles: DataFrame) {
    def unpersist(): Unit = { bands.unpersist(); shingles.unpersist() }
  }

  /** Inline screen over the documents table. With `persist` the two
    * derived tables are cached (the corpus side of a stream is consumed
    * every micro-batch; without the cache per-batch latency scales with
    * corpus size instead of batch size) — the caller owns the caches. */
  def corpusScreen(s: SparkSession, dir: String,
      persist: Boolean): CorpusScreen = {
    val corpus = docs(s, dir)
    def maybe(df: DataFrame): DataFrame =
      if (persist)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    CorpusScreen(
      maybe(bandsProjection(corpus)
        .select(col("doc_id").as("corpus_id"), col("band"), col("bv"))),
      maybe(withShingles(corpus)
        .select(col("doc_id").as("corpus_id"),
          array_distinct(col("shs")).as("csh"))))
  }

  /** Write-once corpus screen index (the SpatialIndex analog for text):
    * band table clustered by (band, bv), shingle table clustered by
    * corpus_id. Streams and repeated batch screens then read it instead
    * of recomputing the full-corpus minhash per run. (On a cluster with a
    * metastore, write the same frames as BUCKETED tables so the
    * micro-batch join needs no shuffle at all.) */
  def writeCorpusScreen(s: SparkSession, dir: String, out: String): Unit = {
    // ONE corpus scan + shingle pass feeds BOTH outputs (guide §1.2: the
    // two r5 write jobs each re-read the text and re-built the shingle
    // arrays); the shared (doc_id, shs) projection is corpus-sized, so it
    // is persisted only for the duration of the two writes
    val base = withShingles(docs(s, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("shs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // materialize the shared projection once, then run the two writers
      // CONCURRENTLY (guide §2.6 — independent jobs back-fill each
      // other's stragglers): serially, the shingle write idled most cores
      // while the band write's small output committed, and vice versa
      base.count()
      val k = 12; val r = 3
      val sigs = (0 until k).map(i =>
        array_min(transform(col("shs"),
          sh => md5(concat(lit(i.toLong), lit(":"), sh)))).as(s"sig$i"))
      import scala.concurrent.ExecutionContext.Implicits.global
      val bandsF = scala.concurrent.Future {
        base.select(col("doc_id") +: sigs: _*)
          .withColumn("_graft_s", explode(array(bandStructs(k, r): _*)))
          .select(col("doc_id").as("corpus_id"),
            col("_graft_s.band").as("band"), col("_graft_s.bv").as("bv"))
          .repartition(col("band"), col("bv"))
          .sortWithinPartitions("band", "bv")
          .write.mode("overwrite").parquet(s"$out/bands")
      }
      val shinglesF = scala.concurrent.Future {
        base
          .select(col("doc_id").as("corpus_id"),
            array_distinct(col("shs")).as("csh"))
          .repartition(col("corpus_id"))
          .write.mode("overwrite").parquet(s"$out/shingles")
      }
      scala.concurrent.Await.result(bandsF,
        scala.concurrent.duration.Duration.Inf)
      scala.concurrent.Await.result(shinglesF,
        scala.concurrent.duration.Duration.Inf)
    } finally base.unpersist(false)
  }

  def readCorpusScreen(s: SparkSession, out: String): CorpusScreen =
    CorpusScreen(s.read.parquet(s"$out/bands"),
      s.read.parquet(s"$out/shingles"))

  /** The screen proper, against a prepared [[CorpusScreen]]. The exact
    * jaccard is computed BEFORE the stateful candidate dedup, so the rows
    * entering the shuffle + dropDuplicatesWithinWatermark state are pure
    * scalars (doc_id, ts, corpus_id, jaccard) — the r3 shape carried each
    * document's whole shingle array through the dedup once per matched
    * band (~4x per pair). The jaccard filter also runs pre-dedup (it
    * commutes: jaccard is a function of the pair), so only actual
    * near-dups ever enter state. Both static joins recompute the
    * intersection per matched band instead of per pair — bounded by k/r
    * bands and strictly cheaper than shipping the arrays through a
    * stateful exchange. */
  def nearDupScreen(s: SparkSession, stream: DataFrame,
      screen: CorpusScreen, watermark: String = "30 minutes"): DataFrame = {
    val cands = bandsProjection(stream)
      .select(col("doc_id"), col("ts"),
        array_distinct(col("shs")).as("nsh"), col("band"), col("bv"))
      .join(screen.bands, Seq("band", "bv"))
      .join(screen.shingles, Seq("corpus_id"))
      .withColumn("ni", size(array_intersect(col("nsh"), col("csh"))))
      .select(col("doc_id"), col("ts"), col("corpus_id"),
        round(col("ni").cast("double") /
          (size(col("nsh")) + size(col("csh")) - col("ni")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    val deduped =
      if (cands.isStreaming)
        cands.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
      else cands.dropDuplicates("doc_id", "corpus_id")
    deduped.select(col("doc_id"), col("corpus_id"), col("jaccard"))
  }

  /** The batch face of [[nearDupStream]] for the harness oracle: every
    * 50th document plays the "new batch" screened against the full
    * corpus (so the result includes each probe's self-pair at jaccard
    * 1.0 — the screen is a containment check, not a self-join). Runs the
    * EXACT streaming plan in batch mode. */
  def nearDupCorpusBatch(s: SparkSession, dir: String): DataFrame =
    nearDupStream(s,
      docs(s, dir).filter(col("doc_id") % 50 === 0)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
      dir)

  /** Candidate pairs from shared LSH buckets, verified with exact word
    * 3-gram jaccard; emits pairs with jaccard >= 0.5. */
  def minhashDedup(s: SparkSession, dir: String): DataFrame = {
    // Band table via the PROJECTION face (r6): bandsProjection computes
    // the identical (doc_id, band, bv) rows — parity-pinned against the
    // groupBy face in TextSimSpec — as pure per-row expressions, so the
    // shingle explode + 12 min(md5-string) SortAggregates + their
    // exchange vanish from this query entirely (min over strings has no
    // hash-agg form, so the groupBy face paid a Tungsten sort per side).
    // The per-row shingle array is bounded by document length, the usual
    // contract of an LLM-corpus pipeline; the groupBy face remains
    // available for unbounded-document inputs.
    //
    // guide §2.4/§7.2 on the self-join: as a broadcast join the bucket
    // self-join computed the whole band pipeline once PER SIDE — a
    // BroadcastExchange side never reuses the stream side's exchange.
    // The merge hint puts both sides behind the SAME
    // Exchange(hash(band, bv)), which AQE deduplicates (ReusedExchange),
    // so the projection runs once; sorting the few band rows per side
    // costs nothing at any scale. (An eager persist+count was measured
    // slower: it serializes a barrier job where the duplicate subtrees
    // previously overlapped on idle cores.)
    val bands = bandsProjection(docs(s, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("band"), col("bv"))
    val cands = bands.alias("a").hint("merge").join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // cands/counts are near-dup-sized (small at runtime, but data-derived:
    // no broadcast hints — AQE picks broadcast when a side is actually small)
    val sh = shingles(docs(s, dir)).distinct()
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("ni"))
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ni") / (col("na") + col("nb") - col("ni")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** 16-dim SimHash from md5 hex-digit signs of whitespace tokens. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("h", md5(col("w")))
    val dims = toks.select(col("doc_id"), col("h"),
      explode(sequence(lit(0), lit(15))).as("d"))
      .withColumn("bit",
        when(substring(col("h"), col("d") + 1, lit(1))
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
      .groupBy(col("doc_id"), col("d"))
      .agg(sum(col("bit")).as("v"))
      .withColumn("c", when(col("v") > 0, "1").otherwise("0"))
    dims.groupBy(col("doc_id"))
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("d"), col("c")))),
          x => x.getField("c"))).as("simhash"))
  }

  /** Exact word-3-gram jaccard for a deterministic pair sample. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(docs(s, dir)).distinct()
    val a = sh.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.filter(col("doc_id") % 25 === 5)
      .select(col("doc_id").as("doc_b"), col("sh"))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    a.join(b, Seq("sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("ni"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ni") / (col("na") + col("nb") - col("ni")), 4).as("jaccard"))
      .filter(col("jaccard") > 0)
  }

  /** Dedup clustering: connected components over the verified near-dup
    * pairs (minhashDedup), every document labeled with its cluster
    * canonical (the component's min doc_id) and the cluster size;
    * documents in no near-dup pair are singleton clusters of themselves.
    * The "keep one copy per cluster" step of a dedup pipeline is then
    * `filter(doc_id == canon_id)`. Cluster sizes come from a map-side-
    * combinable groupBy + equi-join back (AQE skew-split applies to a
    * mega-cluster key), not a window over canon_id, which would pin a
    * whole mega-cluster into one task. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashDedup(s, dir).select(col("doc_a"), col("doc_b"))
    val lab = ConnectedComponents.run(pairs)
      .select(col("node").as("doc_id"), col("canon").as("canon_id"))
    val all = docs(s, dir).select(col("doc_id"))
      .join(lab, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canon_id"), col("doc_id")).as("canon_id"))
    val sizes = all.groupBy(col("canon_id")).agg(count(lit(1)).as("csize"))
    all.join(sizes, "canon_id")
      .select(col("doc_id"), col("canon_id"), col("csize"))
  }

  /** Embedding cosine near-duplicate pairs via the shared multi-table
    * hyperplane LSH (graft.ops.Ann): only pairs sharing a bucket in at
    * least one table are scored — the round-1 `a_id < b_id` join was a
    * cartesian product, O(n^2) at scale. Approximate BY DESIGN (pairs in
    * no common bucket are not reported); the DuckDB twin mirrors the same
    * candidate generation exactly. */
  def cosinePairs(s: SparkSession, dir: String): DataFrame = {
    // persisted: e feeds four consumers (the bitsFor count, the bucket
    // table, and the a/b score joins), each of which re-ran the
    // cast-to-double transform + norm aggregate over every embedding; the
    // count() Ann.bitsFor needs anyway materializes the cache
    val e = graft.Tables.parquet(s, s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm",
        sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bits = Ann.bitsFor(e.count())
    val b = Ann.buckets(e, Ann.TABLES, bits)
    val cands = b.alias("x").join(b.alias("y"),
        col("x.t") === col("y.t") && col("x.bkt") === col("y.bkt") &&
          col("x.vec_id") < col("y.vec_id") && col("x.vec_id") % 5 === 0)
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
    val ea = e.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("norm").as("na"))
    val eb = e.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("norm").as("nb"))
    cands.join(ea, Seq("a_id")).join(eb, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(
          aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x) / (col("na") * col("nb")),
          4).as("cosine"))
      .filter(col("cosine") >= 0.15)
  }

  /** q26 through the WRITE-ONCE parquet index (write → read →
    * nearDupScreen) instead of the inline corpus prep — identical output
    * by construction (asserted row-identical in TextSimSpec), so it
    * shares q26's DuckDB twin; registering it puts the indexed text
    * path under the driver's hash gate exactly as sp_rect_index gates
    * the spatial index (r5). */
  def nearDupIndexedBatch(s: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir(s, "graft_corpus_screen_")
    try {
      writeCorpusScreen(s, dir, out)
      val df = nearDupScreen(s,
        docs(s, dir).filter(col("doc_id") % 50 === 0)
          .withColumn("ts",
            lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
        readCorpusScreen(s, out))
      // scratch index deleted at JVM exit, not eagerly: the returned
      // frame's lineage reads it, and the r5 localCheckpoint materialized
      // the screen result a second time inside the builder (guide §5)
      graft.Scratch.rmOnExit(out)
      df
    } catch { case e: Throwable => graft.Scratch.rm(out); throw e }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_minhash_lsh" -> (minhashDedup _),
    "q25_dedup_cc" -> (dedupClusters _),
    "q26_neardup_corpus" -> (nearDupCorpusBatch _),
    "q28_neardup_indexed" -> (nearDupIndexedBatch _),
    "q18_simhash" -> (simhash _),
    "q19_ngram_jaccard" -> (ngramJaccard _),
    "q20_cosine_pairs" -> (cosinePairs _)
  )

  private val shinglesSql =
    """SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |WHERE len(w) >= 3""".stripMargin

  private val bandsSql =
    s"""WITH shingles AS ($shinglesSql),
       |sigs AS (
       | SELECT doc_id, i, min(md5(i || ':' || sh)) AS sig
       | FROM shingles CROSS JOIN (SELECT unnest(range(0, 12)) AS i)
       | GROUP BY doc_id, i),
       |bands AS (
       | SELECT doc_id, i // 3 AS band,
       |        md5(string_agg(sig, ',' ORDER BY i)) AS bv
       | FROM sigs GROUP BY doc_id, i // 3)""".stripMargin

  /** Shared CTE chain ending in `pairs(doc_a, doc_b, jaccard)` — the
    * jaccard-verified near-dup pairs of q17, reused by the q25 closure. */
  private val pairsSql =
    s"""$bandsSql,
       |cands AS (
       | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM bands a JOIN bands b
       |   ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |sh AS (SELECT DISTINCT doc_id, sh FROM ($shinglesSql)),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       | SELECT c.doc_a, c.doc_b, count(*) AS ni
       | FROM cands c
       | JOIN sh sa ON sa.doc_id = c.doc_a
       | JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       | GROUP BY c.doc_a, c.doc_b),
       |pairs AS (
       | SELECT doc_a, doc_b,
       |   round(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 4) AS jaccard
       | FROM inter
       | JOIN cnt ca ON ca.doc_id = doc_a
       | JOIN cnt cb ON cb.doc_id = doc_b
       | WHERE round(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 4) >= 0.5)"""
      .stripMargin

  private val nearDupCorpusSql: String =
    s"""$bandsSql,
       |cands AS (
       | SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS corpus_id
       | FROM bands a JOIN bands b
       |   ON a.band = b.band AND a.bv = b.bv
       | WHERE a.doc_id % 50 = 0),
       |sh AS (SELECT DISTINCT doc_id, sh FROM ($shinglesSql)),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       | SELECT c.doc_id, c.corpus_id, count(*) AS ni
       | FROM cands c
       | JOIN sh sa ON sa.doc_id = c.doc_id
       | JOIN sh sb ON sb.doc_id = c.corpus_id AND sb.sh = sa.sh
       | GROUP BY c.doc_id, c.corpus_id)
       |SELECT inter.doc_id AS doc_id, corpus_id,
       |  round(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 4) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = inter.doc_id
       |JOIN cnt cb ON cb.doc_id = inter.corpus_id
       |WHERE round(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 4) >= 0.5"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    "q17_minhash_lsh" ->
      s"$pairsSql\nSELECT doc_a, doc_b, jaccard FROM pairs",
    // the corpus screen reuses the q17 bands/shingle CTEs, but the
    // candidate join is probe-vs-ALL (self-pairs included) instead of
    // doc_a < doc_b
    "q26_neardup_corpus" -> nearDupCorpusSql,
    // q28 = q26 through the write-once index: identical output by
    // construction, same twin — the gate pins the INDEXED read path
    "q28_neardup_indexed" -> nearDupCorpusSql,
    // min-reachable-label closure: DuckDB's recursive CTE is the exact
    // (small-scale) twin of the large-star/small-star contraction
    "q25_dedup_cc" ->
      ("WITH RECURSIVE " + pairsSql.stripPrefix("WITH ") + ",\n" +
        """edges AS (
          | SELECT doc_a AS u, doc_b AS v FROM pairs
          | UNION ALL SELECT doc_b, doc_a FROM pairs),
          |reach(node, lbl) AS (
          | SELECT DISTINCT u, u FROM edges
          | UNION
          | SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v),
          |lab AS (SELECT node, min(lbl) AS canon FROM reach GROUP BY node),
          |alldoc AS (
          | SELECT d.doc_id, coalesce(l.canon, d.doc_id) AS canon_id
          | FROM documents d LEFT JOIN lab l ON l.node = d.doc_id)
          |SELECT doc_id, canon_id,
          |  count(*) OVER (PARTITION BY canon_id) AS csize
          |FROM alldoc""".stripMargin),
    "q18_simhash" ->
      """WITH toks AS (
        | SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
        | FROM documents),
        |dims AS (
        | SELECT doc_id, d,
        |  CASE WHEN sum(CASE WHEN substr(h, CAST(d+1 AS INTEGER), 1)
        |    IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) > 0
        |   THEN '1' ELSE '0' END AS c
        | FROM toks CROSS JOIN (SELECT unnest(range(0, 16)) AS d)
        | GROUP BY doc_id, d)
        |SELECT doc_id, string_agg(c, '' ORDER BY d) AS simhash
        |FROM dims GROUP BY doc_id""".stripMargin,
    "q19_ngram_jaccard" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id, sh FROM ($shinglesSql)),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         | SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS ni
         | FROM sh sa JOIN sh sb ON sa.sh = sb.sh
         | WHERE sa.doc_id % 25 = 0 AND sb.doc_id % 25 = 5
         | GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 4) AS jaccard
         |FROM inter
         |JOIN cnt ca ON ca.doc_id = doc_a
         |JOIN cnt cb ON cb.doc_id = doc_b
         |WHERE round(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 4) > 0"""
        .stripMargin,
    "q20_cosine_pairs" ->
      s"""WITH e AS (
         | SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM embeddings),
         |n AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
         |${graft.ops.Ann.bktSql},
         |cand AS (
         | SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
         | FROM b x JOIN b y ON x.t = y.t AND x.bkt = y.bkt
         |   AND x.vec_id < y.vec_id
         | WHERE x.vec_id % 5 = 0)
         |SELECT c.a_id, c.b_id,
         | round(list_sum(list_transform(range(1, CAST(len(a.v)+1 AS INTEGER)),
         |   i -> a.v[i] * b.v[i])) / (a.norm * b.norm), 4) AS cosine
         |FROM cand c
         |JOIN n a ON a.vec_id = c.a_id
         |JOIN n b ON b.vec_id = c.b_id
         |WHERE round(list_sum(list_transform(range(1, CAST(len(a.v)+1 AS INTEGER)),
         |   i -> a.v[i] * b.v[i])) / (a.norm * b.norm), 4) >= 0.15"""
        .stripMargin
  )
}
