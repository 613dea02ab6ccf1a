package graft.streaming

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, max, min, row_number, xxhash64}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** Rolling-ingest drivers: the composition of Structured Streaming with
  * the incremental batch-vs-store entry points — the shape a continuously
  * crawled 100 TB corpus actually runs, for BOTH incremental families
  * (ANN neighbors over vectors, simhash near-dup pairs over documents).
  * Each micro-batch
  *
  *   1. sketches ONCE (the persisted batch band relation serves the probe
  *      and the store append);
  *   2. probes the band store built from every batch BEFORE it — work ∝
  *      batch, never ∝ corpus;
  *   3. hands its result rows to `sink` (the caller's output contract),
  *      synchronously within the micro-batch;
  *   4. appends its bands to the store as a DELTA, re-ingested ids
  *      superseding their old rows at READ time. Duplicate ids WITHIN a
  *      micro-batch collapse to one row first, picked DETERMINISTICALLY
  *      (min xxhash64 over the full row) — a micro-batch has no internal
  *      order, and a checkpoint replay must rebuild the byte-identical
  *      delta, so an arbitrary `dropDuplicates` pick would break replay
  *      idempotence for duplicate ids with differing payloads.
  *
  * == Store layout: write ∝ batch, never ∝ corpus ==
  *
  * The store lives as parquet under `storeDir` in two kinds of directory:
  *
  *   - `d<batchId>`  — one DELTA per micro-batch, holding ONLY that
  *     batch's band rows. The per-batch write I/O is proportional to the
  *     batch — the property that makes a rolling 100 TB corpus ingestable
  *     (a versioned-snapshot store would rewrite the accumulated corpus
  *     every commit: O(n·corpus) cumulative write I/O after n batches).
  *   - `base<v>`     — a compacted base: the supersede-resolved union of
  *     everything up to and including delta `v`. Written once every
  *     `compactEvery` batches, so the corpus-sized write is amortized to
  *     corpus/K per batch; at most one base is live.
  *
  * The EFFECTIVE store before batch B = live(base) ∪ live(deltas in
  * (baseVersion, B)), where supersede resolves newest-delta-wins per id:
  * the base anti-joins the union of delta ids (batch-sized, broadcast —
  * the corpus-sized base never shuffles), and delta rows keep only each
  * id's newest batch (a groupBy over batch-sized relations). Re-reading
  * that resolution per probe costs K broadcast anti-joins of small sets —
  * the read-side price of not rewriting the corpus per commit.
  *
  * == Replay idempotence and crash recovery ==
  *
  * A replayed batch id (checkpoint recovery re-runs the LAST uncommitted
  * batch) sees exactly the effective store it originally saw: its own
  * delta is excluded (only deltas < B are read), and compaction folds
  * only deltas < B — so a crash after compaction but before the
  * checkpoint commit replays against the compacted base, which resolves
  * to the identical effective store. The replayed delta overwrites its
  * own directory with identical rows (deterministic intra-batch dedup).
  * Housekeeping is self-healing: any delta at-or-below the live base's
  * version and any base below it are stale leftovers of a mid-compaction
  * crash — excluded by the read path and swept on the next commit.
  * Starting a FRESH stream (new checkpoint, batch ids from 0) against a
  * populated storeDir is refused rather than silently probing an empty
  * store — which makes the one crash window before the FIRST delta's
  * checkpoint commit a guided manual recovery (the guard's message names
  * the directory to delete) instead of an automatic replay.
  *
  * With `routeCols` (ANN) every store directory is written `partitionBy`
  * the routing columns, and the probe's store read is pre-filtered to the
  * batch's own route values — so the cell-routed candidate pruning has
  * its storage-layout counterpart: a probe or an external reader touches
  * only the cells present in the batch (partition pruning, pinned by
  * RollingIngestSpec). Store reads disable partition-column type
  * inference and cast back to the band schema, so string route values
  * that LOOK numeric (cell "01") round-trip unchanged instead of being
  * inferred as int 1 and silently mis-matching the supersede anti-join.
  */
object RollingIngest {

  /** Store directories under `storeDir` with the given prefix, as
    * (version, path), oldest first. */
  private def dirs(spark: SparkSession, storeDir: String,
                   prefix: String): Seq[(Long, String)] = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap(s => s.getPath.getName.drop(prefix.length).toLongOption
        .map(_ -> s.getPath.toString))
      .sortBy(_._1)
  }

  private def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Commit `df` as the store element at `path` via a hidden temp dir +
    * rename: a crash mid-write must never leave a PARTIALLY-visible
    * element — [[dirs]] lists by directory existence, so a half-written
    * `base<v>` would otherwise read as the live base (breaking storeView
    * on unreadable footers, and worse, letting housekeeping sweep the
    * deltas it was meant to replace — silent data loss on the one crash
    * point every corpus-sized rewrite has). `.tmp_*` names are invisible
    * to every reader (no store prefix) and swept by housekeeping; the
    * rename is atomic on HDFS-semantics filesystems (an object-store
    * deployment substitutes a manifest committer at this one seam).
    * `partitionCols`, when present, also cluster the write — one file per
    * populated partition value (the layout RollingIngestSpec pins; the
    * unclustered form fanned 32 tasks x 512 cells into ~16k 2 KB files
    * per element at the sf10 routed operating point). */
  private def writeElement(spark: SparkSession, path: String, df: DataFrame,
                           partitionCols: Seq[String]): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(dst.getParent, ".tmp_" + dst.getName)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    val clustered =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df
    val w = clustered.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    fs.delete(dst, true)
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
  }

  /** Sweep `.tmp_*` leftovers of a crashed [[writeElement]] (idempotent;
    * readers never see them — hygiene only). */
  private def sweepTmp(spark: SparkSession, storeDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp_"))
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** Delete the given store elements EXCEPT those named in `keep` — the
    * one primitive every sweep site goes through, so a pinned snapshot's
    * retention ([[pinSnapshot]]) is enforced uniformly: an element
    * referenced by any live pin manifest survives housekeeping,
    * compaction, retrain and migration sweeps until its last pin is
    * dropped. */
  private def sweepEls(spark: SparkSession, els: Seq[(Long, String)],
                       keep: Set[String]): Unit =
    els.filterNot { case (_, p) =>
      keep(new org.apache.hadoop.fs.Path(p).getName) }
      .foreach { case (_, p) => delete(spark, p) }

  /** Read one store directory back to the band schema. Partition-column
    * type inference is disabled for the read (then every column is cast
    * to its band-schema type): inference would turn a numeric-looking
    * STRING route value (cell "01") into int 1, silently changing the
    * column — with inference off the raw partition string survives, and
    * the cast is exact for genuinely numeric route columns. */
  private def readBands(spark: SparkSession, path: String,
                        schema: StructType): DataFrame = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.get(key, "true")
    // schema resolution (file listing + partition discovery) is eager at
    // read time, so the conf toggle is scoped to this call
    val raw = try {
      spark.conf.set(key, "false")
      spark.read.parquet(path)
    } finally spark.conf.set(key, prev)
    raw.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Supersede-resolved union of delta relations (each tagged with its
    * batch id in `__b`): per id, only the rows of its NEWEST batch
    * survive. Deltas are batch-sized, so the winner aggregation and join
    * stay small regardless of corpus size. */
  private def resolveDeltas(tagged: DataFrame, idCol: String,
                            schema: StructType): DataFrame = {
    val winners = tagged.groupBy(idCol).agg(max(col("__b")).as("__b"))
    tagged.join(broadcast(winners), Seq(idCol, "__b"))
      .select(schema.fields.toSeq.map(f => col(f.name)): _*)
  }

  /** Supersede resolution over an EXPLICIT element set (one optional base
    * dir + delta dirs with their versions) — the shared core of the live
    * [[storeView]] and the pinned [[snapshotView]].
    *
    * Deltas are read UNFILTERED: supersede winners and the base anti-join
    * id set must see EVERY delta row. Route columns can be pure functions
    * of the payload (the IVF cell is), so re-ingesting an id with a
    * changed payload moves it across route values — a route-pruned delta
    * read would drop the superseding row while the stale one survives
    * (resurrection). Deltas are batch-sized, so the unpruned read stays
    * ∝ batch; the route filter is applied to resolved row CONTENT.
    * The corpus-sized base keeps the pruned read (partition pruning at
    * rest): any stale base row is removed by the unfiltered-id anti-join
    * regardless of which partitions were scanned. */
  private def resolveView(spark: SparkSession, baseDir: Option[String],
                          deltas: Seq[(Long, String)], schema: StructType,
                          idCol: String,
                          routeFilter: Option[Column]): Option[DataFrame] = {
    val filt = (df: DataFrame) => routeFilter.map(df.filter).getOrElse(df)
    val deltaAll = deltas
      .map { case (v, p) => readBands(spark, p, schema).withColumn("__b", lit(v)) }
      .reduceOption(_ unionByName _)
    (baseDir.map(b => filt(readBands(spark, b, schema))), deltaAll) match {
      case (None, None)       => None
      case (Some(base), None) => Some(base)
      case (None, Some(d))    => Some(filt(resolveDeltas(d, idCol, schema)))
      case (Some(base), Some(d)) =>
        // delta ids are batch-sized: the corpus-sized base anti-joins a
        // broadcast id set and never shuffles
        val ids = d.select(idCol).distinct()
        Some(base.join(broadcast(ids), Seq(idCol), "left_anti")
          .unionByName(filt(resolveDeltas(d, idCol, schema))))
    }
  }

  /** The effective store under `storeDir` strictly BEFORE batch `upTo`
    * (pass Long.MaxValue for "everything committed"): live base rows plus
    * supersede-resolved delta rows. `routeFilter`, if given, is applied
    * to every directory read BEFORE the union — on a `partitionBy`
    * routed store this prunes to the filter's partitions. Returns None
    * when the store holds nothing below `upTo`. Elements retained only
    * by a pin ([[pinSnapshot]]) never enter this view: a retained delta
    * or base is always <= the live base's version, which this listing
    * filter excludes by construction. */
  private[graft] def storeView(spark: SparkSession, storeDir: String,
                               schema: StructType, idCol: String,
                               upTo: Long = Long.MaxValue,
                               routeFilter: Option[Column] = None): Option[DataFrame] = {
    val baseOpt = dirs(spark, storeDir, "base").filter(_._1 < upTo).lastOption
    val baseVer = baseOpt.map(_._1).getOrElse(-1L)
    val live = dirs(spark, storeDir, "d")
      .filter { case (v, _) => v > baseVer && v < upTo }
    resolveView(spark, baseOpt.map(_._2), live, schema, idCol, routeFilter)
  }

  /** Deterministic one-row-per-id pick: min xxhash64 over every column.
    * Order-independent, so a checkpoint replay of a batch holding
    * duplicate ids with DIFFERENT payloads rebuilds the same delta (a
    * plain dropDuplicates pick is arbitrary per run). */
  private def dedupDeterministic(b: DataFrame, idCol: String): DataFrame = {
    val h = xxhash64(b.columns.sorted.toSeq.map(col): _*)
    val w = Window.partitionBy(idCol).orderBy(h.asc)
    b.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Refuse every shape where this batch did not produce the store's
    * history: elements NEWER than the batch (restart mid-history), or
    * a populated store with nothing OLDER than the batch (fresh
    * stream, ids from 0, against an existing store — including the
    * d0-only store a one-batch run leaves behind). The one legitimate
    * case this rejects is a crash between writing the very FIRST
    * delta and its checkpoint commit; the message names the recovery
    * (delete that delta — the replayed batch rebuilds it
    * deterministically), which is strictly safer than the silent
    * empty-store probe + overwrite a fresh-stream mixup would get. */
  private def guardHistory(spark: SparkSession, storeDir: String, id: Long): Unit = {
    val els = (dirs(spark, storeDir, "base") ++ dirs(spark, storeDir, "d"))
      .map(_._1).sorted
    require(els.isEmpty || (els.head < id && !els.exists(_ > id)),
      s"$storeDir holds versions [${els.mkString(",")}] not " +
        s"strictly older than batch $id — this stream did not build " +
        "that store (fresh checkpoint against a populated storeDir?). " +
        "Point the query at its original checkpoint, use an empty " +
        s"storeDir, or — after a crash before the first commit — " +
        s"delete $storeDir/d$id and restart")
  }

  /** Write batch `bands` as delta `d<id>` under `storeDir`, then run the
    * housekeeping + compaction contract (see the object doc): sweep stale
    * leftovers, fold deltas strictly older than this batch into a new base
    * once `compactEvery` have accumulated. Every step is idempotent and
    * replay-safe — a replayed batch (which reads only elements < id)
    * rebuilds the identical delta and sees the identical effective store. */
  private[graft] def commitDelta(spark: SparkSession, storeDir: String,
                          bands: DataFrame, schema: StructType, idCol: String,
                          partitionCols: Seq[String], compactEvery: Int,
                          id: Long): Unit = {
    def emptyBands: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    // the delta write is the ONLY per-batch store write: bytes ∝ batch.
    // writeElement clusters partitioned writes (one file per populated
    // cell — the 16k-tiny-files remedy, pinned by RollingIngestSpec) and
    // commits via tmp+rename so no crash point leaves a partial element.
    writeElement(spark, s"$storeDir/d$id", bands, partitionCols)
    // housekeeping — every step idempotent and replay-safe; every delete
    // spares elements retained by a pin manifest (snapshot retention):
    // (1) sweep stale leftovers of a mid-compaction crash (the read
    //     path already ignores them)
    sweepTmp(spark, storeDir)
    val keep = pinnedNames(spark, storeDir)
    val baseVer = dirs(spark, storeDir, "base").lastOption.map(_._1).getOrElse(-1L)
    sweepEls(spark, dirs(spark, storeDir, "base").dropRight(1), keep)
    sweepEls(spark, dirs(spark, storeDir, "d").filter(_._1 <= baseVer), keep)
    // (2) compact deltas STRICTLY OLDER than this batch once K have
    //     accumulated: fold them + the base into base<newest folded
    //     delta>, amortizing the corpus-sized write to corpus/K per
    //     batch. This batch's own delta is never folded, so a replay
    //     (which reads only elements < id) sees the same store.
    val pending = dirs(spark, storeDir, "d")
      .filter { case (v, _) => v > baseVer && v < id }
    if (pending.size >= compactEvery) {
      val compactTo = pending.map(_._1).max
      val compacted = storeView(spark, storeDir, schema, idCol, upTo = id, None)
        .getOrElse(emptyBands)
      // same clustering + atomic commit as the delta write: a crash mid-
      // compaction must never expose a partial base (whose presence would
      // let the delta sweep below destroy the rows it was folding)
      writeElement(spark, s"$storeDir/base$compactTo", compacted, partitionCols)
      sweepEls(spark, pending, keep)
      if (baseVer >= 0)
        sweepEls(spark, Seq((baseVer, s"$storeDir/base$baseVer")), keep)
    }
  }

  // ---- pinned snapshots: durable, reproducible reads of a rolling store
  //      (round 17) --------------------------------------------------------
  //
  // A training run needs to name the exact corpus it read — and re-read it
  // byte-identically a year later, while the crawl keeps ingesting. The
  // element contract already gives every commit an immutable identity
  // (elements are written once, never rewritten in place); the only thing
  // destroying history is housekeeping. A PIN is therefore just a manifest
  // naming the store's live element set; every sweep site spares pinned
  // elements ([[sweepEls]]), so the snapshot stays readable at zero write
  // cost — the write path is unchanged, and retention is ∝ the pinned
  // history (the Iceberg/Delta snapshot-expiry trade, re-derived for this
  // store). Retained elements never leak into live reads: a retained
  // delta/base/ledger element is always <= the live base's version, which
  // every live listing filter excludes; retained books/tier markers are
  // older than the newest, which the resolution reads ignore.
  //
  // Pin at a batch boundary (from the sink callback — the store then holds
  // exactly the batches up to and including the one just committed — or
  // with the stream stopped). Pinning concurrently with a commit races the
  // compaction listing and may capture a mid-fold element set; the
  // manifest write itself is atomic (tmp+rename), so the failure mode is a
  // wrong pin, never a corrupt store.

  private def pinsPath(storeDir: String) =
    new org.apache.hadoop.fs.Path(storeDir, ".pins")

  /** Element-dir names retained by any pin manifest under `storeDir` —
    * the set every sweep spares. One small-file read per manifest, once
    * per commit: metadata-cheap at any store size. */
  private def pinnedNames(spark: SparkSession, storeDir: String): Set[String] = {
    val pins = pinsPath(storeDir)
    val fs = pins.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(pins)) Set.empty
    else fs.listStatus(pins).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .flatMap(s => readManifestFile(fs, s.getPath)).toSet
  }

  private def readManifestFile(fs: org.apache.hadoop.fs.FileSystem,
                               p: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(p)
    val out = new java.io.ByteArrayOutputStream()
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096)
    finally in.close()
    out.toString("UTF-8").split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** One definition of a legal snapshot name, enforced on BOTH halves of
    * the API: a name pinSnapshot would reject must never resolve on the
    * read/delete side either (".." or "/" would escape `.pins/` — an
    * unvalidated unpinSnapshot could delete an arbitrary store file). */
  private def requireValidName(name: String): Unit =
    require(name.nonEmpty && !name.contains("/") && !name.contains("\\") &&
      !name.startsWith("."),  // startsWith(".") subsumes ".." and ".tmp_*"
      s"invalid snapshot name '$name'")

  /** The element names of snapshot `name` (loud failure on an unknown
    * name — a misspelled snapshot must not read as an empty store). */
  private def readManifest(spark: SparkSession, storeDir: String,
                           name: String): Seq[String] = {
    requireValidName(name)
    val p = new org.apache.hadoop.fs.Path(pinsPath(storeDir), name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$storeDir holds no snapshot '$name' " +
      s"(listSnapshots names the live pins)")
    readManifestFile(fs, p)
  }

  /** Parse an element-dir name into (kind, version); kinds are the store
    * contract's prefixes: base/books/tier/m/d. */
  private[graft] def parseEl(n: String): Option[(String, Long)] =
    Seq("base", "books", "tier", "m", "d").collectFirst {
      case p if n.startsWith(p) && n.drop(p.length).toLongOption.isDefined =>
        (p, n.drop(p.length).toLong)
    }

  /** Pin the store's CURRENT effective contents as snapshot `name`:
    * capture the live element set — newest base, the deltas above it, the
    * live ledger elements, and the newest books/tier marker (a PQ code
    * store's rows are meaningless without the books that encoded them;
    * a dedup store's signature width is declared by its tier marker) —
    * into an atomic manifest under `storeDir/.pins/`. Returns the pinned
    * element names. Refuses an existing name (pins are immutable; drop
    * and re-pin to move one) and an empty store. */
  def pinSnapshot(spark: SparkSession, storeDir: String,
                  name: String): Seq[String] = {
    requireValidName(name)
    val pins = pinsPath(storeDir)
    val fs = pins.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(pins, name)
    require(!fs.exists(dst),
      s"snapshot '$name' already exists under $storeDir (pins are " +
        "immutable — unpinSnapshot first to re-pin)")
    val baseVer = dirs(spark, storeDir, "base").lastOption.map(_._1).getOrElse(-1L)
    val els =
      dirs(spark, storeDir, "base").lastOption.toSeq ++
        dirs(spark, storeDir, "d").filter(_._1 > baseVer) ++
        dirs(spark, storeDir, "m").filter(_._1 > baseVer) ++
        dirs(spark, storeDir, "books").lastOption.toSeq ++
        dirs(spark, storeDir, "tier").lastOption.toSeq
    require(els.nonEmpty, s"$storeDir holds no committed elements to pin")
    val names = els.map { case (_, p) => new org.apache.hadoop.fs.Path(p).getName }
    fs.mkdirs(pins)
    val tmp = new org.apache.hadoop.fs.Path(pins, ".tmp_" + name)
    val out = fs.create(tmp, true)
    try out.write((names.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
    names
  }

  /** Drop snapshot `name`; its elements become reclaimable at the next
    * housekeeping pass (any commit's sweep, or an explicit
    * [[vacuumStore]]). Returns whether the pin existed. */
  def unpinSnapshot(spark: SparkSession, storeDir: String,
                    name: String): Boolean = {
    requireValidName(name)
    val p = new org.apache.hadoop.fs.Path(pinsPath(storeDir), name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  /** Live pins under `storeDir`, as (name, pinned element names). */
  def listSnapshots(spark: SparkSession,
                    storeDir: String): Seq[(String, Seq[String])] = {
    val pins = pinsPath(storeDir)
    val fs = pins.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(pins)) Seq.empty
    else fs.listStatus(pins).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .map(s => s.getPath.getName -> readManifestFile(fs, s.getPath))
      .sortBy(_._1)
  }

  /** The pinned snapshot's effective rows — the same supersede resolution
    * as the live [[storeView]], over exactly the manifest's base + delta
    * elements. Loud failure when a pinned element is missing on disk
    * (someone deleted around the pin contract): a silently smaller corpus
    * is the one failure mode a reproducibility feature must not have. */
  def snapshotView(spark: SparkSession, storeDir: String, name: String,
                   schema: StructType, idCol: String,
                   routeFilter: Option[Column] = None): Option[DataFrame] = {
    val els = manifestEls(spark, storeDir, name)
    val baseOpt = els.filter(_._1 == "base").map(_._2).maxOption
      .map(v => s"$storeDir/base$v")
    val deltas = els.filter(_._1 == "d")
      .map { case (_, v) => (v, s"$storeDir/d$v") }.sortBy(_._1)
    resolveView(spark, baseOpt, deltas, schema, idCol, routeFilter)
  }

  /** Manifest elements as (kind, version), existence-checked. */
  private def manifestEls(spark: SparkSession, storeDir: String,
                          name: String): Seq[(String, Long)] = {
    val names = readManifest(spark, storeDir, name)
    val sp = new org.apache.hadoop.fs.Path(storeDir)
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val missing = names.filterNot(n =>
      fs.exists(new org.apache.hadoop.fs.Path(sp, n)))
    require(missing.isEmpty,
      s"snapshot '$name' of $storeDir references missing elements " +
        s"[${missing.mkString(",")}] — the store was modified outside " +
        "the pin contract; the snapshot is NOT reproducible")
    names.flatMap(parseEl)
  }

  /** [[snapshotView]] for a rolling dedup store, with the band schema
    * derived from the pinned elements themselves (presence of `sig_hi`
    * = the 128-bit wide tier) — so a reader needs only the store dir and
    * the snapshot name. */
  def snapshotDedupView(spark: SparkSession, storeDir: String,
                        name: String): Option[DataFrame] = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val els = manifestEls(spark, storeDir, name)
    val newest = els.filter(e => e._1 == "base" || e._1 == "d")
      .maxByOption(_._2)
    newest.flatMap { case (kind, v) =>
      val wide = spark.read.parquet(s"$storeDir/$kind$v")
        .columns.contains("sig_hi")
      val emptyDocs = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val schema = (if (wide) Dedup.simhash128Bands(emptyDocs)
                    else Dedup.simhash64Bands(emptyDocs)).schema
      snapshotView(spark, storeDir, name, schema, "doc_id")
    }
  }

  /** The pinned component labels of a [[componentsIngest]] store:
    * [[snapshotView]]'s label rows resolved through the manifest's OWN
    * ledger elements (never the live ledger — later merges must not leak
    * into the snapshot). */
  def snapshotComponentLabels(spark: SparkSession, storeDir: String,
                              name: String): Option[DataFrame] = {
    val els = manifestEls(spark, storeDir, name)
    val ledger = ledgerOf(spark, els.filter(_._1 == "m").map(_._2).sorted
      .map(v => s"$storeDir/m$v"))
    snapshotView(spark, storeDir, name, labelSchema, "node")
      .map(resolveLabels(_, ledger))
  }

  /** Lineage between two pins of the same store: one row per id whose
    * effective content differs, with `change` ∈ added | removed |
    * updated (`from`'s perspective: an id only in `to` is `added`).
    * An id's content is its full effective row SET (a band store holds
    * several rows per id), compared order-independently by (row count,
    * xor of per-row xxhash64) — a 64-bit content compare, so a
    * same-count set collision is ~2^-64 per id: fine for a lineage
    * REPORT (nothing downstream branches on it), unlike a termination
    * criterion. Both sides are snapshot-sized and the one shuffle
    * is the per-id aggregate — an offline lineage query, not a hot-path
    * op: "what entered the corpus between training runs v1 and v2" is
    * exactly the question a dataset card answers with this. */
  def snapshotDiff(spark: SparkSession, storeDir: String,
                   from: String, to: String,
                   schema: StructType, idCol: String): DataFrame = {
    def sig(name: String): DataFrame = {
      val v = snapshotView(spark, storeDir, name, schema, idCol)
        .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
      val h = xxhash64(schema.fieldNames.sorted.toSeq.map(col): _*)
      v.groupBy(idCol).agg(
        org.apache.spark.sql.functions.bit_xor(h).as("__h"),
        org.apache.spark.sql.functions.count(lit(1)).as("__n"))
    }
    import org.apache.spark.sql.functions.when
    sig(from).withColumnRenamed("__h", "__hf").withColumnRenamed("__n", "__nf")
      .join(sig(to).withColumnRenamed("__h", "__ht").withColumnRenamed("__n", "__nt"),
        Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("__hf").isNull, lit("added"))
          .when(col("__ht").isNull, lit("removed"))
          .when(col("__hf") =!= col("__ht") || col("__nf") =!= col("__nt"),
            lit("updated")))
      .filter(col("change").isNotNull)
      .select(col(idCol), col("change"))
  }

  /** Offline reclamation: the same stale-element sweep every commit runs
    * (superseded bases/deltas/ledger elements, outdated books/tier
    * markers, `.tmp_*` leftovers), pin-guarded — the call to make after
    * [[unpinSnapshot]] when the next commit is far away. Safe on a live
    * store between batches: it deletes only elements the live read path
    * already ignores. */
  def vacuumStore(spark: SparkSession, storeDir: String): Unit = {
    val keep = pinnedNames(spark, storeDir)
    val baseVer = dirs(spark, storeDir, "base").lastOption.map(_._1).getOrElse(-1L)
    sweepEls(spark, dirs(spark, storeDir, "base").dropRight(1), keep)
    sweepEls(spark, (dirs(spark, storeDir, "d") ++ dirs(spark, storeDir, "m"))
      .filter(_._1 <= baseVer), keep)
    sweepEls(spark, dirs(spark, storeDir, "books").dropRight(1), keep)
    sweepEls(spark, dirs(spark, storeDir, "tier").dropRight(1), keep)
    sweepTmp(spark, storeDir)
    // manifest-write leftovers of a crashed pinSnapshot
    val pins = pinsPath(storeDir)
    val fs = pins.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(pins)) fs.listStatus(pins).toSeq
      .filter(s => s.getPath.getName.startsWith(".tmp_"))
      .foreach(s => fs.delete(s.getPath, false))
  }

  /** Read-only store diagnostic (fsck): verify the element contract's
    * on-disk invariants and name the recovery for each violation —
    * nothing is modified. Findings are (level, subject, detail) with
    * level ∈ error | warn | info:
    *
    *   - error: a pin references a missing element (the snapshot is not
    *     reproducible), or an element's parquet footer does not open
    *     (partial write outside the tmp+rename contract);
    *   - warn: a crash-window shape awaiting its documented recovery —
    *     books newer than the newest base (interrupted re-encode; the
    *     stream resumes it), tier marker newer than the newest base
    *     (interrupted migration; the stream REFUSES until it is re-run);
    *   - info: reclaimable state housekeeping will sweep (`.tmp_*`
    *     leftovers, superseded bases/deltas/ledger elements not retained
    *     by a pin), and unrecognized directory names.
    *
    * The read cost is one listing plus one footer open per element —
    * metadata-cheap at any store size; run it before trusting a store
    * handed over from another owner.
    *
    * One shape deliberately NOT flagged: `books<v>` at v equal to the
    * base version is the NORMAL post-retrain layout, and the
    * superficially similar corrupt state (new books written, crash
    * before the re-encoded base, all deltas already below base) is
    * unreachable — a retrain only fires when the census has grown, the
    * census only grows on delta appends, and the batch's delta always
    * sits ABOVE the base at event time, so an interrupted re-encode
    * always leaves a delta <= booksVer for the resume rule (and the
    * `booksVer > baseVer` warning here) to see. */
  def fsckStore(spark: SparkSession,
                storeDir: String): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq(("info", storeDir, "store does not exist"))
    val pins = listSnapshots(spark, storeDir)
    val keep = pins.flatMap(_._2).toSet
    val entries = fs.listStatus(root).toSeq
    val dirsByKind = entries.filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .map(n => n -> parseEl(n))
    dirsByKind.collect { case (n, None) =>
      out += (("info", n, "unrecognized directory name (not a store element)"))
    }
    val els = dirsByKind.collect { case (n, Some(kv)) => (n, kv._1, kv._2) }
    def newest(kind: String): Long =
      els.filter(_._2 == kind).map(_._3).maxOption.getOrElse(-1L)
    val baseVer = newest("base")
    // crash windows (each names its recovery)
    entries.filter(_.getPath.getName.startsWith(".tmp_")).foreach(s =>
      out += (("info", s.getPath.getName,
        "leftover of a crashed element write; swept at the next commit or vacuumStore")))
    val booksVer = newest("books")
    if (booksVer >= 0 && booksVer > baseVer &&
        els.exists(e => e._2 == "d" && e._3 <= booksVer))
      out += (("warn", s"books$booksVer",
        s"newer than base$baseVer with deltas at or below it — an " +
          "interrupted retrain re-encode; the routed stream resumes it at " +
          "the next batch"))
    val tierVer = newest("tier")
    if (tierVer >= 0 && tierVer > baseVer)
      out += (("warn", s"tier$tierVer",
        s"newer than base$baseVer — an interrupted tier migration; the " +
          "stream refuses to start until migrateDedupTier is re-run"))
    // reclaimable (pin-aware: retained elements are deliberate)
    els.filter(e => (e._2 == "base" && e._3 < baseVer) ||
        ((e._2 == "d" || e._2 == "m") && e._3 <= baseVer))
      .foreach { case (n, _, _) =>
        out += (("info", n,
          if (keep(n)) "superseded but retained by a pin"
          else "superseded and unpinned; reclaimable by any commit or vacuumStore"))
      }
    // element integrity: every element (tier markers included) is parquet
    // and must open
    els.foreach { case (n, _, _) =>
      try spark.read.parquet(s"$storeDir/$n").schema
      catch {
        // NonFatal + toString: a truncated footer commonly throws
        // message-less EOFException — the diagnostic must report it, not
        // NPE on it; and an OOM must propagate, not read as corruption
        case scala.util.control.NonFatal(e) =>
          out += (("error", n,
            s"element does not open as parquet (${e.toString.take(160)}) — " +
              "a partial write outside the tmp+rename contract; restore it " +
              "or roll the store back to a pinned snapshot"))
      }
    }
    // pins: every referenced element must exist
    pins.foreach { case (name, names) =>
      val missing = names.filterNot(n =>
        fs.exists(new org.apache.hadoop.fs.Path(root, n)))
      if (missing.nonEmpty)
        out += (("error", name,
          s"pin references missing elements [${missing.mkString(",")}] — " +
            "the snapshot is NOT reproducible"))
    }
    out.toSeq
  }

  /** The shared micro-batch loop; `sideFor(spark, id)` resolves the
    * batch's (sketcher, prober) pair AT BATCH START — static sides ignore
    * (spark, id); the dedup side re-reads the store-owned tier marker so
    * an offline [[migrateDedupTier]] takes effect at the next batch
    * boundary. `bandsOf` sketches a deduplicated batch,
    * `probe(store, batchBands)` computes the batch's result rows. */
  private def ingest(src: DataFrame, storeDir: String, idCol: String,
                     sideFor: (SparkSession, Long) =>
                       (DataFrame => DataFrame, (DataFrame, DataFrame) => DataFrame),
                     partitionCols: Seq[String], compactEvery: Int,
                     configure: DataStreamWriter[Row] => DataStreamWriter[Row])
                    (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    configure(src.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      if (!b.isEmpty) {
        val spark = b.sparkSession
        guardHistory(spark, storeDir, id)
        val (bandsOf, probe) = sideFor(spark, id)
        val schema = bandsOf(b.limit(0)).schema
        val bands = bandsOf(dedupDeterministic(b, idCol)).persist()
        try {
          // Routed stores: pre-filter the store read to the batch's own
          // route values — the partition-pruning counterpart of the
          // routed band join (only the batch's cells are scanned). The
          // per-column isin is a SUPERSET of the batch's route tuples, so
          // it is purely a pruning optimization; the band join enforces
          // exact equality.
          val routeFilter = if (partitionCols.isEmpty) None else {
            val vals = bands.select(partitionCols.map(col): _*).distinct().collect()
            Some(partitionCols.zipWithIndex.map { case (c, i) =>
              col(c).isin(vals.map(_.get(i)).distinct.toSeq: _*)
            }.reduce(_ && _))
          }
          val store = storeView(spark, storeDir, schema, idCol, upTo = id, routeFilter)
            .getOrElse(bandsOf(b.limit(0)))
          sink(probe(store, bands), id)
          commitDelta(spark, storeDir, bands, schema, idCol,
            partitionCols, compactEvery, id)
        } finally bands.unpersist()
      }
    }).start()
  }

  /** Rolling ANN ingest over a streaming relation of
    * (vec_id[, routeCols…], embedding). `sink` receives each batch's
    * neighbor rows (qid, nid, cosine) with the batch id. `configure` is
    * applied to the writer before start — set `checkpointLocation` there
    * for a durable query (the replay idempotency assumes the query HAS a
    * checkpoint), plus trigger/queryName as needed. `compactEvery` bounds
    * how many per-batch deltas accumulate before they fold into the
    * compacted base. `wideBands` picks the 64-lane wide band tier at
    * BOOTSTRAP — a rolling store's bands are at rest, so the tier is a
    * deployment parameter chosen from the expected store census (the
    * same knee the batch side routes per-call), and changing it later is
    * an offline re-encode, like IVF retraining. */
  def annIngest(vecs: DataFrame, storeDir: String, k: Int = 3,
                routeCols: Seq[String] = Nil, compactEvery: Int = 8,
                wideBands: Boolean = false,
                configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
               (sink: (DataFrame, Long) => Unit): StreamingQuery =
    ingest(vecs, storeDir, "vec_id",
      (_, _) => (
        if (wideBands) Similarity.hyperBandsWide else Similarity.hyperBands,
        (store, bands) =>
          Similarity.lshAnnIncrementalBands(store, bands, k, routeCols)),
      routeCols, compactEvery, configure)(sink)

  /** Rolling IVF-PQ ingest over a streaming relation of
    * (vec_id, embedding) against FROZEN pre-trained books
    * ([[Similarity.ivfPqTrain]] — retraining is an offline event, never a
    * per-batch one): each micro-batch encodes against the frozen coarse +
    * PQ books (one zero-shuffle projection), probes the routed code store
    * ([[Similarity.ivfPqIncrementalCodes]] — supersede, nprobe routing,
    * broadcast ADC, exact rerank), hands `sink` its (qid, nid, cosine)
    * rows, and appends its code rows as a CELL-PARTITIONED delta — the
    * IVF partition layout at rest, so the probe's store read prunes to
    * the batch's cells. nprobe is pinned to 1 here BY the partition
    * pruning: the generic route filter scans exactly the batch rows' own
    * cells, which equals the probed cells only at nprobe = 1 (the ingest
    * operating point — see simIvfPqIncremental's doc); a multi-cell
    * probing deployment derives the filter from probed cells instead.
    * Same store/delta/compaction contract as [[annIngest]]. */
  def ivfPqIngest(vecs: DataFrame, storeDir: String,
                  coarse: Seq[(Int, Array[Long])],
                  books: Seq[Seq[(Int, Array[Long])]],
                  k: Int = 3, compactEvery: Int = 8,
                  configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery =
    ingest(vecs, storeDir, "vec_id",
      (_, _) => (
        b => Similarity.ivfPqEncode(b, coarse, books),
        (store, codes) => Similarity.ivfPqIncrementalCodes(
          store, codes, coarse, books, k, nprobe = 1)),
      partitionCols = Seq("cell"), compactEvery, configure)(sink)

  // ---- retrain/re-encode cadence for the rolling IVF-PQ store ----
  // (VERDICT r15 #1: ivfPqIngest freezes bootstrap books forever, so a
  // store growing past its training slice re-enters the linear-probe-cost
  // regime the kc router was built to kill — the same disease one level up)

  /** Serialize (coarse, pq books) as one parquet directory. `ord` records
    * each codeword's position in its book: assignment tie-breaks are
    * first-minimum in book ORDER, so a (de)serialization that reordered
    * codewords would silently change encodes. */
  private[graft] def writeBooks(spark: SparkSession, path: String,
                                coarse: Seq[(Int, Array[Long])],
                                books: Seq[Seq[(Int, Array[Long])]]): Unit = {
    import spark.implicits._
    val rows =
      coarse.zipWithIndex.map { case ((cw, cv), i) => ("coarse", 0, i, cw, cv.toSeq) } ++
      books.zipWithIndex.flatMap { case (bk, s) =>
        bk.zipWithIndex.map { case ((cw, cv), i) => ("pq", s + 1, i, cw, cv.toSeq) } }
    writeElement(spark, path,
      rows.toDF("kind", "s", "ord", "cw", "cv").coalesce(1), Nil)
  }

  private[graft] def readBooks(spark: SparkSession, path: String)
      : (Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]]) = {
    val rows = spark.read.parquet(path)
      .select("kind", "s", "ord", "cw", "cv").collect()
    def book(rs: Seq[org.apache.spark.sql.Row]) = rs.sortBy(_.getInt(2))
      .map(r => (r.getInt(3), r.getSeq[Long](4).toArray)).toSeq
    val coarse = book(rows.filter(_.getString(0) == "coarse").toSeq)
    val m = rows.iterator.filter(_.getString(0) == "pq").map(_.getInt(1)).max
    val books = (1 to m).map(s =>
      book(rows.filter(r => r.getString(0) == "pq" && r.getInt(1) == s).toSeq))
    (coarse, books)
  }

  /** [[ivfPqIngest]] with a RETRAIN/RE-ENCODE CADENCE (VERDICT r15 #1):
    * the store OWNS its books (persisted as `books<v>` next to the
    * base/delta dirs; the caller's bootstrap pair seeds `books-1` on the
    * first batch), and when the store census pushes the routed cell count
    * [[graft.operators.Similarity.ivfPqKcRouted]] at least
    * `retrainGridSteps` power-of-2 grid steps above the trained kc, the
    * next batch boundary runs the offline event the wideBands precedent
    * names (re-tiering = offline re-encode):
    *
    *   1. TRAIN new books at the routed kc from the effective store's own
    *      (vec_id, q) rows ([[Similarity.ivfPqTrainQ]] — q is
    *      books-independent, no raw-embedding re-read);
    *   2. write `books<v>` (v = newest store element, so a crash here is
    *      detected as books-newer-than-base and the re-encode resumes);
    *   3. RE-ENCODE the effective store under the new books
    *      ([[Similarity.ivfPqEncodeQNorm]] — only cell/codes change;
    *      vec_id/q/norm are invariant, spec-pinned) into `base<v>`,
    *      cell-partitioned at the new kc;
    *   4. sweep superseded deltas/bases/books.
    *
    * The event is replay-safe at every crash point: before step 2 the
    * trigger simply re-fires; between 2 and 3 the resume rule (newest
    * books version > newest base version) re-runs the re-encode from the
    * still-live old rows; after 3, commitDelta's normal housekeeping
    * sweeps the leftovers, and the replayed batch re-reads census/books
    * from disk and encodes with the new books exactly as the original run
    * did (the retrain runs at batch START, before the batch's own encode).
    *
    * Census is tracked as cumulative appended rows (re-derived from
    * parquet metadata on restart): re-ingested ids double-count, which
    * only fires the retrain EARLY — the safe direction. `onRetrain`
    * observes (oldKc, newKc, census) for probes/monitoring. */
  def ivfPqIngestRouted(vecs: DataFrame, storeDir: String,
                        bootstrapCoarse: Seq[(Int, Array[Long])],
                        bootstrapBooks: Seq[Seq[(Int, Array[Long])]],
                        k: Int = 3, compactEvery: Int = 8,
                        retrainGridSteps: Int = 2,
                        configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity,
                        onRetrain: (Int, Int, Long) => Unit = (_, _, _) => ())
                       (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    import graft.operators.Similarity
    val rb = new RoutedBooks(storeDir, bootstrapCoarse, bootstrapBooks,
      retrainGridSteps, onRetrain)
    configure(vecs.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      if (!b.isEmpty) {
        val spark = b.sparkSession
        guardHistory(spark, storeDir, id)
        val schema = Similarity.ivfPqEncode(
          b.limit(0).select("vec_id", "embedding"),
          bootstrapCoarse, bootstrapBooks).schema
        val (coarse, books) = rb.forBatch(spark, id, schema)
        // ---- normal batch: encode, probe, append (ivfPqIngest's loop) ----
        val codes = Similarity.ivfPqEncode(
          dedupDeterministic(b, "vec_id").select("vec_id", "embedding"),
          coarse, books).persist()
        try {
          val cells = codes.select("cell").distinct().collect()
            .map(_.getInt(0)).toSeq
          val routeFilter = Some(col("cell").isin(cells: _*))
          val store = storeView(spark, storeDir, schema, "vec_id",
            upTo = id, routeFilter).getOrElse(
            Similarity.ivfPqEncode(b.limit(0).select("vec_id", "embedding"),
              coarse, books))
          sink(Similarity.ivfPqIncrementalCodes(store, codes, coarse, books,
            k, nprobe = 1), id)
          rb.append(codes.count())
          commitDelta(spark, storeDir, codes, schema, "vec_id",
            Seq("cell"), compactEvery, id)
        } finally codes.unpersist()
      }
    }).start()
  }

  /** Store-owned frozen books with the census-drift retrain/re-encode
    * cadence (the machinery of [[ivfPqIngestRouted]], factored so the
    * composed keeper-gated pipeline [[dedupIndexIngestPqRouted]] shares
    * ONE implementation). One instance per (query, storeDir). Driver-held
    * state is a CACHE only — the store is authoritative: a restart
    * rebuilds books from the newest `books<v>` dir and the census from
    * parquet row counts. See [[ivfPqIngestRouted]]'s doc for the event
    * semantics and crash-window analysis (each step resumes or replays
    * deterministically). */
  private final class RoutedBooks(
      storeDir: String,
      bootstrapCoarse: Seq[(Int, Array[Long])],
      bootstrapBooks: Seq[Seq[(Int, Array[Long])]],
      retrainGridSteps: Int,
      onRetrain: (Int, Int, Long) => Unit) {
    require(retrainGridSteps >= 1, "retrainGridSteps must be >= 1")
    import graft.operators.Similarity
    // (booksVersion, coarse, books); census = cumulative appended rows
    // (re-ingested ids double-count, which only fires the retrain CHECK
    // early — the safe direction; the check itself derives the exact
    // supersede-resolved live count and resets the census, so inflation
    // never survives an event boundary)
    private var cur: Option[(Long, Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]])] = None
    private var census = -1L

    /** The batch's operating books: bootstrap/load the newest books dir,
      * resume a crashed re-encode (books newer than base), fire the
      * census trigger and run the offline retrain event. Call at batch
      * START, before the batch's own encode. `schema` is the
      * (books-independent) code-row shape. */
    def forBatch(spark: SparkSession, id: Long,
                 schema: StructType): (Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]]) = {
      // ---- books bootstrap / load ----
      val bookDirs = dirs(spark, storeDir, "books")
      val bv = bookDirs.lastOption.map(_._1).getOrElse {
        writeBooks(spark, s"$storeDir/books-1", bootstrapCoarse, bootstrapBooks)
        -1L
      }
      if (cur.forall(_._1 != bv)) {
        val (c, bks) =
          if (bookDirs.isEmpty) (bootstrapCoarse, bootstrapBooks)
          else readBooks(spark, bookDirs.last._2)
        cur = Some((bv, c, bks))
      }
      val booksVer = cur.get._1
      val coarse = cur.get._2
      val books = cur.get._3
      def liveDirs = {
        val baseVer = dirs(spark, storeDir, "base").lastOption.map(_._1).getOrElse(-1L)
        dirs(spark, storeDir, "base").lastOption.toSeq ++
          dirs(spark, storeDir, "d").filter(_._1 > baseVer)
      }
      // ---- census (cumulative appended rows; metadata-cheap re-derive) ----
      if (census < 0)
        census = liveDirs.map { case (_, p) => spark.read.parquet(p).count() }.sum
      // ---- resume a crashed re-encode: books newer than the base ----
      val baseVer0 = dirs(spark, storeDir, "base").lastOption.map(_._1).getOrElse(-1L)
      val needResume = booksVer >= 0 && booksVer > baseVer0 &&
        dirs(spark, storeDir, "d").exists(_._1 <= booksVer)
      // ---- retrain trigger at batch start (pre-batch census) ----
      // The cumulative census only fires a CHECK: re-ingested ids
      // double-count (appends never decrement), so the event first derives
      // the exact live count from the supersede-resolved store view — a
      // heavily re-ingesting store must not retrain to a kc above the
      // routed point for its LIVE rows (VERDICT r16 watch item). A stale
      // census resets and writes nothing; a confirmed one retrains at the
      // live operating point. Census drift is thus bounded to the window
      // between checks, and every check lands it exactly.
      val trainedKc = coarse.size
      val targetKc = Similarity.ivfPqKcRouted(math.max(0L, census))
      val wantRetrain = targetKc >= (trainedKc << retrainGridSteps)
      val newestEl = liveDirs.map(_._1).maxOption.getOrElse(-1L)
      if ((wantRetrain || needResume) && newestEl >= 0 && newestEl < id) {
        val v = newestEl
        val eff = storeView(spark, storeDir, schema, "vec_id", upTo = id).get
          .persist()
        try {
          val live = eff.count()
          census = live // exact at every event boundary
          val liveKc = Similarity.ivfPqKcRouted(live)
          val confirmed = liveKc >= (trainedKc << retrainGridSteps)
          if (needResume || confirmed) {
            val (c2, b2) =
              if (needResume) (coarse, books) // books<v> already written
              else {
                val trained = Similarity.ivfPqTrainQ(
                  eff.select("vec_id", "q"), liveKc)
                writeBooks(spark, s"$storeDir/books$v", trained._1, trained._2)
                trained
              }
            // re-encode: vec_id/q/norm invariant, cell/codes re-derived;
            // writeElement clusters one-file-per-cell (the unclustered form
            // wrote ~16k tiny files at kc = 512 and dominated the retrain
            // event) and commits via tmp+rename — a crash mid-re-encode
            // never exposes a partial base whose presence would both break
            // storeView and let housekeeping sweep the still-needed deltas
            writeElement(spark, s"$storeDir/base$v",
              Similarity.ivfPqEncodeQNorm(eff.select("vec_id", "q", "norm"), c2, b2),
              Seq("cell"))
            // sweep superseded elements (idempotent; commitDelta would
            // also catch deltas <= the new base) — pin-guarded, so a
            // snapshot pinned before the retrain keeps its codes AND the
            // books that decode them
            val keep = pinnedNames(spark, storeDir)
            sweepEls(spark, dirs(spark, storeDir, "d").filter(_._1 <= v), keep)
            sweepEls(spark, dirs(spark, storeDir, "base").filter(_._1 < v), keep)
            sweepEls(spark, dirs(spark, storeDir, "books").filter(_._1 < v), keep)
            if (!needResume) onRetrain(trainedKc, liveKc, live)
            cur = Some((v, c2, b2))
          }
        } finally eff.unpersist()
      }
      (cur.get._2, cur.get._3)
    }

    /** Feed this batch's appended row count into the census. */
    def append(n: Long): Unit = census += n
  }

  /** Rolling simhash near-dup ingest over a streaming relation of
    * (doc_id, text): each micro-batch emits its (doc_a, doc_b, hamming)
    * pairs touching the batch, then its bands join the store. `wideSig`
    * picks the 128-bit/32-bit-band tier at BOOTSTRAP (VERDICT r15 #3 —
    * the text-side twin of [[annIngest]]'s `wideBands`), chosen from the
    * expected store census against the
    * [[graft.operators.Dedup.SimhashBandKnee]] occupancy knee (the knee
    * the batch side routes per-call via `simhashNearDupAuto`). The store
    * OWNS its tier thereafter: a `tier<v>` marker written by the offline
    * [[migrateDedupTier]] event (VERDICT r16 #1) overrides the bootstrap
    * parameter at the next batch boundary, so a store that outgrows the
    * knee upgrades in place — the re-sketch needs the keeper corpus back
    * (band stores hold signatures, not documents), which is the one
    * honest difference from the IVF side's self-contained re-encode.
    * Note the tiers are different points on the precision curve
    * (Hamming <= 3 against 128 bits is stricter than against 64), which
    * is exactly why a post-knee corpus must flip: the narrow tier's
    * extra band collisions there are noise, not near-duplicates. Same
    * store/delta/compaction contract as [[annIngest]]. */
  def dedupIngest(docs: DataFrame, storeDir: String, maxHamming: Int = 3,
                  compactEvery: Int = 8, wideSig: Boolean = false,
                  configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery =
    ingest(docs, storeDir, "doc_id",
      (spark, _) => {
        val (bandsOf, sigCols) = dedupTier(resolvedTier(spark, storeDir, wideSig))
        (bandsOf, (store, bands) =>
          Dedup.simhashNearDupIncrementalBands(store, bands, maxHamming, sigCols))
      },
      Nil, compactEvery, configure)(sink)

  /** The band tier of the rolling dedup stores: sketch function +
    * signature columns, narrow (64-bit sigs, 4 x 16-bit bands) or wide
    * (128-bit sigs, 4 x 32-bit bands). */
  private def dedupTier(wideSig: Boolean): (DataFrame => DataFrame, Seq[String]) =
    if (wideSig) (Dedup.simhash128Bands, Seq("sig_lo", "sig_hi"))
    else (Dedup.simhash64Bands, Seq("simhash"))

  // ---- store-owned tier + offline narrow→wide migration (VERDICT r16 #1:
  // the one rolling-store parameter that previously had NO store-local
  // upgrade path — the text-side twin of the RoutedBooks retrain/re-encode)

  private def writeTier(spark: SparkSession, storeDir: String, v: Long,
                        wide: Boolean): Unit = {
    import spark.implicits._
    writeElement(spark, s"$storeDir/tier$v",
      Seq(wide).toDF("wide").coalesce(1), Nil)
  }

  /** The store's OWNED band tier at batch start: the newest `tier<v>`
    * marker wins over the caller's bootstrap parameter (absent marker =
    * bootstrap, the pre-migration store). REFUSES to run when the marker
    * is newer than the newest base — the crash window of an interrupted
    * [[migrateDedupTier]] (marker written, re-sketched base not yet
    * renamed in): unlike the IVF side, the text store cannot self-resume
    * (band rows hold signatures, not documents), so the recovery is
    * guided — re-run the migration with the keeper corpus. This is the
    * text-side analog of [[RoutedBooks]]' books-newer-than-base rule. */
  private def resolvedTier(spark: SparkSession, storeDir: String,
                           bootstrapWide: Boolean): Boolean =
    dirs(spark, storeDir, "tier").lastOption match {
      case None => bootstrapWide
      case Some((v, p)) =>
        val baseVer = dirs(spark, storeDir, "base").lastOption
          .map(_._1).getOrElse(-1L)
        require(baseVer >= v,
          s"$storeDir: tier marker tier$v is newer than the newest base " +
            s"(version $baseVer) — an interrupted tier migration left the " +
            "store mid-event. Re-run RollingIngest.migrateDedupTier with " +
            "the keeper corpus to resume (idempotent from any crash " +
            "point), then restart the stream.")
        spark.read.parquet(p).select("wide").collect()(0).getBoolean(0)
    }

  /** Doc-count CENSUS trigger for [[migrateDedupTier]]: true when the
    * store is still on the narrow tier and its live band rows / 4 (bands
    * per doc) meet `knee` — [[Dedup.SimhashBandKnee]], the round-7
    * occupancy law's migration point. Supersede double-counting fires the
    * trigger EARLY (the safe direction, same rationale as the RoutedBooks
    * census); the count is parquet-metadata-cheap. The migration itself
    * stays a manual/offline event because it needs the keeper corpus
    * back — this helper is the deployment cron's cheap "is it due" check. */
  def dedupTierMigrationDue(spark: SparkSession, storeDir: String,
                            knee: Long = Dedup.SimhashBandKnee): Boolean = {
    val live = {
      val baseVer = dirs(spark, storeDir, "base").lastOption
        .map(_._1).getOrElse(-1L)
      dirs(spark, storeDir, "base").lastOption.toSeq ++
        dirs(spark, storeDir, "d").filter(_._1 > baseVer)
    }
    live.nonEmpty && !resolvedTier(spark, storeDir, bootstrapWide = false) &&
      !spark.read.parquet(live.head._2).columns.contains("sig_hi") &&
      live.map { case (_, p) => spark.read.parquet(p).count() }.sum / 4 >= knee
  }

  /** OFFLINE narrow→wide tier migration for a rolling dedup store
    * (VERDICT r16 #1) — the text-side analog of the IVF retrain/re-encode
    * event, with the one honest difference ARCHITECTURE.md documents:
    * band stores hold signatures, not documents, so the event must be
    * handed the KEEPER CORPUS back. `corpus` provides (doc_id, text) for
    * every live store id (checked: a corpus missing keepers would
    * silently shrink the store — the run aborts before any store change).
    * Run with the stream STOPPED; it resumes on its own checkpoint and
    * picks the new tier up from the store marker at the next batch.
    *
    * Event steps, each idempotent:
    *   1. write the `tier<v>` MARKER (v = newest store element) — the
    *      crash sentinel: marker newer than base = interrupted event
    *      (resolvedTier refuses to stream; re-running THIS function
    *      resumes, because the old narrow rows stay live until step 3);
    *   2. re-sketch the effective store's live ids from `corpus` at the
    *      128-bit tier and verify coverage;
    *   3. commit `base<v>` via tmp+rename (never partially visible);
    *   4. sweep superseded deltas/bases/markers.
    *
    * The keeper ID SET is invariant (spec-pinned): migration changes
    * signatures, never membership. The tiers sit at different points on
    * the precision curve (Hamming <= 3 against 128 bits is stricter), so
    * post-migration pairs are judged at the wide tier's threshold — the
    * point of migrating past the occupancy knee, where narrow band
    * collisions are noise, not near-duplicates. */
  def migrateDedupTier(spark: SparkSession, storeDir: String,
                       corpus: DataFrame): Unit = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val live = dirs(spark, storeDir, "base") ++ dirs(spark, storeDir, "d")
    require(live.nonEmpty, s"$storeDir: empty store — bootstrap the stream " +
      "with wideSig=true instead of migrating")
    require(!spark.read.parquet(live.maxBy(_._1)._2).columns.contains("sig_hi"),
      s"$storeDir: store is already on the wide tier")
    val v = live.map(_._1).max
    writeTier(spark, storeDir, v, wide = true)
    val narrowSchema = Dedup.simhash64Bands(spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))).schema
    val ids = storeView(spark, storeDir, narrowSchema, "doc_id").get
      .select("doc_id").distinct()
    val docs = dedupDeterministic(corpus.select("doc_id", "text"), "doc_id")
      .join(ids, "doc_id")
    val wide = Dedup.simhash128Bands(docs).persist()
    try {
      val nW = wide.select("doc_id").distinct().count()
      val nIds = ids.count()
      require(nW == nIds,
        s"$storeDir: corpus covers $nW of $nIds live store ids — a " +
          "migration over an incomplete corpus would silently drop " +
          s"keepers. No store change made (marker tier$v stays; re-run " +
          "with the full keeper corpus).")
      writeElement(spark, s"$storeDir/base$v", wide, partitionCols = Nil)
    } finally wide.unpersist()
    val keep = pinnedNames(spark, storeDir)
    sweepEls(spark, dirs(spark, storeDir, "d").filter(_._1 <= v), keep)
    sweepEls(spark, dirs(spark, storeDir, "base").filter(_._1 < v), keep)
    sweepEls(spark, dirs(spark, storeDir, "tier").filter(_._1 < v), keep)
    sweepTmp(spark, storeDir)
  }

  /** COMPOSED rolling dedup-then-index — the streaming twin of the batch
    * composition ([[graft.operators.Similarity.simDedupIndex]] /
    * `dedupThenIndexAuto`), and the shape a continuously crawled 100 TB
    * corpus actually runs: the dedup store's keeper decision GATES what
    * the ANN store ingests, so retrieval structures only ever index the
    * canonical (near-dup-free) corpus. Input is a streaming relation of
    * (doc_id, text, embedding[, routeCols…]). Each micro-batch:
    *
    *   1. sketches simhash bands ONCE (probe + dedup-store append) — the
    *      64-bit tier, or 128-bit under `wideSig` (see [[dedupIngest]]);
    *   2. probes the KEEPER dedup store for near-dup pairs at Hamming <=
    *      `maxHamming` ([[Dedup.simhashNearDupIncrementalBands]] — work ∝
    *      batch, store never reshuffles);
    *   3. decides keepers: connected components over the batch-touching
    *      pairs (edge set ∝ batch — every pair has a batch end — so
    *      [[Dedup.labelPropagation]]'s driver gate always takes the
    *      union-find shortcut here), FIRST-SEEN WINS: any component
    *      holding a store doc drops all its batch members (the store is
    *      published history — an arriving near-dup never unpublishes it),
    *      batch-only components keep their min doc_id. `dedupSink`
    *      receives the decisions as (doc_id, keeper_id, kept);
    *   4. encodes the KEEPERS' embeddings into the ANN structure's rows
    *      (hyperplane bands here; PQ codes in [[dedupIndexIngestPq]]),
    *      probes the ANN store ([[Similarity.lshAnnIncrementalBands]])
    *      and hands `sink` the batch's (qid, nid, cosine) neighbor rows;
    *   5. appends the keepers' simhash bands and vector bands as deltas
    *      to the two stores (same delta/compaction/replay contract as
    *      [[annIngest]] — both stores hold exactly the canonical corpus,
    *      under the same ids).
    *
    * Keeper-only stores mean BOTH stores stay ∝ unique content — the
    * scale property the composition exists for. Two documented semantic
    * consequences: (a) a future doc near-dupping only a DROPPED duplicate
    * (Hamming <= 3 to it but > 3 to its keeper) is not re-detected —
    * the standard recall trade of representative-based dedup (SemDeDup
    * keeps one representative per cluster for the same reason); (b) a
    * re-ingested id whose new payload dedups away keeps its PREVIOUS
    * canonical rows in both stores — the update is rejected, not merged.
    *
    * Replay idempotence: the keeper decision is a deterministic function
    * of (effective store before the batch, deduplicated batch), and both
    * deltas are derived from it — a checkpoint replay rebuilds
    * byte-identical deltas, same as the single-store loops. */
  def dedupIndexIngest(docs: DataFrame, dedupStoreDir: String,
                       annStoreDir: String, maxHamming: Int = 3, k: Int = 3,
                       routeCols: Seq[String] = Nil, compactEvery: Int = 8,
                       wideBands: Boolean = false, wideSig: Boolean = false,
                       configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity,
                       dedupSink: (DataFrame, Long) => Unit = (_, _) => ())
                      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val vecBandsOf: DataFrame => DataFrame =
      if (wideBands) Similarity.hyperBandsWide else Similarity.hyperBands
    composedIngest(docs, dedupStoreDir, annStoreDir, maxHamming, compactEvery,
      wideSig, configure, dedupSink,
      vecColsOf = df => df.select(
        (col("doc_id").as("vec_id") +: routeCols.map(col)) :+ col("embedding"): _*),
      annSideFor = (_, _) => (vecBandsOf,
        (store, bands) =>
          Similarity.lshAnnIncrementalBands(store, bands, k, routeCols),
        (_: Long) => ()),
      annPartitionCols = routeCols)(sink)
  }

  /** Keeper-gated QUANTIZED ingest — [[dedupIndexIngest]] with the
    * production retrieval structure on the index side (VERDICT r15 #2):
    * keepers ENCODE against the FROZEN pre-trained IVF-PQ books
    * ([[Similarity.ivfPqEncode]], one zero-shuffle projection), probe the
    * routed code store ([[Similarity.ivfPqIncrementalCodes]] — supersede,
    * nprobe-1 routing, broadcast ADC, exact rerank; the same nprobe = 1
    * partition-pruning operating point as [[ivfPqIngest]], see its doc),
    * and append CELL-PARTITIONED code deltas — the full 100 TB crawl
    * stack: dedup gate -> quantized encode -> routed probe ->
    * cell-partitioned delta, fused into one micro-batch loop. The keeper
    * decision, store layout, compaction, and replay contracts are
    * [[dedupIndexIngest]]'s verbatim (one shared loop); only the ANN-side
    * row shape and probe differ. */
  def dedupIndexIngestPq(docs: DataFrame, dedupStoreDir: String,
                         annStoreDir: String,
                         coarse: Seq[(Int, Array[Long])],
                         books: Seq[Seq[(Int, Array[Long])]],
                         maxHamming: Int = 3, k: Int = 3,
                         compactEvery: Int = 8, wideSig: Boolean = false,
                         configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity,
                         dedupSink: (DataFrame, Long) => Unit = (_, _) => ())
                        (sink: (DataFrame, Long) => Unit): StreamingQuery =
    composedIngest(docs, dedupStoreDir, annStoreDir, maxHamming, compactEvery,
      wideSig, configure, dedupSink,
      vecColsOf = df => df.select(col("doc_id").as("vec_id"), col("embedding")),
      annSideFor = (_, _) => (
        v => Similarity.ivfPqEncode(v, coarse, books),
        (store, codes) => Similarity.ivfPqIncrementalCodes(
          store, codes, coarse, books, k, nprobe = 1),
        (_: Long) => ()),
      annPartitionCols = Seq("cell"))(sink)

  /** [[dedupIndexIngestPq]] with the RETRAIN/RE-ENCODE CADENCE on the code
    * store — the full production crawl stack with none of its levers
    * frozen: dedup gate → encode against the store's CURRENT books →
    * routed probe → cell-partitioned delta, where the ANN store owns its
    * books ([[RoutedBooks]], shared verbatim with [[ivfPqIngestRouted]])
    * and retrains at the census trigger from its own keeper rows. The
    * dedup side is books-independent, so keeper decisions are identical
    * to the frozen-book variant's (spec-pinned); the census counts
    * KEEPERS — the store's actual content — so a duplicate-heavy crawl
    * retrains on canonical growth, not raw arrival volume. */
  def dedupIndexIngestPqRouted(docs: DataFrame, dedupStoreDir: String,
                               annStoreDir: String,
                               bootstrapCoarse: Seq[(Int, Array[Long])],
                               bootstrapBooks: Seq[Seq[(Int, Array[Long])]],
                               maxHamming: Int = 3, k: Int = 3,
                               compactEvery: Int = 8, wideSig: Boolean = false,
                               retrainGridSteps: Int = 2,
                               configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity,
                               dedupSink: (DataFrame, Long) => Unit = (_, _) => (),
                               onRetrain: (Int, Int, Long) => Unit = (_, _, _) => ())
                              (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import graft.operators.Similarity
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField}
    val rb = new RoutedBooks(annStoreDir, bootstrapCoarse, bootstrapBooks,
      retrainGridSteps, onRetrain)
    composedIngest(docs, dedupStoreDir, annStoreDir, maxHamming, compactEvery,
      wideSig, configure, dedupSink,
      vecColsOf = df => df.select(col("doc_id").as("vec_id"), col("embedding")),
      annSideFor = (spark, id) => {
        // code-row shape is books-independent; an empty (vec_id, embedding)
        // relation derives it without touching the batch
        val emptyVecs = spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("vec_id", LongType),
            StructField("embedding", ArrayType(FloatType)))))
        val schema = Similarity.ivfPqEncode(
          emptyVecs, bootstrapCoarse, bootstrapBooks).schema
        val (coarse, books) = rb.forBatch(spark, id, schema)
        (v => Similarity.ivfPqEncode(v, coarse, books),
          (store, codes) => Similarity.ivfPqIncrementalCodes(
            store, codes, coarse, books, k, nprobe = 1),
          (n: Long) => rb.append(n))
      },
      annPartitionCols = Seq("cell"))(sink)
  }

  /** The shared composed micro-batch loop behind [[dedupIndexIngest]] and
    * [[dedupIndexIngestPq]]: simhash-gate the batch against the keeper
    * dedup store, then run the parameterized ANN side (row encoder, probe,
    * partition layout) over the keepers only. See [[dedupIndexIngest]]
    * for the full step-by-step and semantic contract. */
  private def composedIngest(docs: DataFrame, dedupStoreDir: String,
                             annStoreDir: String, maxHamming: Int,
                             compactEvery: Int, wideSig: Boolean,
                             configure: DataStreamWriter[Row] => DataStreamWriter[Row],
                             dedupSink: (DataFrame, Long) => Unit,
                             vecColsOf: DataFrame => DataFrame,
                             // (row encoder, store probe, census append) —
                             // resolved PER BATCH so a routed/retraining
                             // ANN side can move its books at batch
                             // boundaries; static sides ignore (spark, id)
                             annSideFor: (SparkSession, Long) =>
                               (DataFrame => DataFrame,
                                (DataFrame, DataFrame) => DataFrame,
                                Long => Unit),
                             annPartitionCols: Seq[String],
                             // batch-deterministic pre-dedup gate (the
                             // curation funnel's quality/decontam stages);
                             // receives the deduplicated batch, returns
                             // the rows admitted to the dedup probe.
                             // Deterministic per (batch, static config) =>
                             // replay rebuilds identical decisions/deltas.
                             preGate: (SparkSession, Long, DataFrame) => DataFrame =
                               (_, _, b) => b)
                            (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    configure(docs.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      if (!b.isEmpty) {
        val spark = b.sparkSession
        guardHistory(spark, dedupStoreDir, id)
        guardHistory(spark, annStoreDir, id)
        // tier re-resolved AT BATCH START (store marker wins over the
        // bootstrap parameter) — an offline migrateDedupTier between
        // batches takes effect here, same cadence as the ANN side's books
        val (docBandsOf, sigCols) =
          dedupTier(resolvedTier(spark, dedupStoreDir, wideSig))
        val (annBandsOf, annProbe, annAppend) = annSideFor(spark, id)
        def docCols(df: DataFrame) = df.select("doc_id", "text")
        val dedupSchema = docBandsOf(docCols(b.limit(0))).schema
        val annSchema = annBandsOf(vecColsOf(b.limit(0))).schema
        val batch0 = dedupDeterministic(b, "doc_id").persist()
        val batch = preGate(spark, id, batch0).persist()
        val docBands = docBandsOf(docCols(batch)).persist()
        try {
          val dedupStore = storeView(spark, dedupStoreDir, dedupSchema, "doc_id",
            upTo = id).getOrElse(docBandsOf(docCols(b.limit(0))))
          val pairs = Dedup.simhashNearDupIncrementalBands(
            dedupStore, docBands, maxHamming, sigCols)
          // Components over the batch-touching pairs; labels is at most
          // edge-set-sized (∝ batch), so every derived relation below
          // broadcasts. Store members need NO store scan: every pair
          // endpoint is either a batch doc or a LIVE store doc (the probe
          // already anti-joined superseded store rows), so the labeled
          // vertices that are not batch ids ARE the store members — the
          // keeper decision never touches the corpus-sized store again.
          val labels = Dedup.labelPropagation(pairs.select("doc_a", "doc_b"))
          val batchIds = batch.select("doc_id")
          val storeMin = labels.join(broadcast(batchIds), Seq("doc_id"), "left_anti")
            .groupBy("cluster_id").agg(min("doc_id").as("store_keeper"))
          val batchMin = labels.join(broadcast(batchIds), "doc_id")
            .groupBy("cluster_id").agg(min("doc_id").as("batch_keeper"))
          // first-seen wins: a store member's min id is the keeper when
          // present; otherwise the component's min batch id
          val decisions = batchIds
            .join(broadcast(labels), Seq("doc_id"), "left")
            .join(broadcast(storeMin), Seq("cluster_id"), "left")
            .join(broadcast(batchMin), Seq("cluster_id"), "left")
            .select(col("doc_id"),
              coalesce(col("store_keeper"), col("batch_keeper"),
                col("doc_id")).as("keeper_id"))
            .select(col("doc_id"), col("keeper_id"),
              (col("keeper_id") === col("doc_id")).as("kept"))
            .persist()
          val keptIds = decisions.filter(col("kept")).select("doc_id")
          val keeperBands = docBands.join(broadcast(keptIds), Seq("doc_id"))
          val vecBands = annBandsOf(
            vecColsOf(batch.join(broadcast(keptIds), Seq("doc_id")))).persist()
          try {
            dedupSink(decisions, id)
            val routeFilter = if (annPartitionCols.isEmpty) None else {
              val vals = vecBands.select(annPartitionCols.map(col): _*).distinct().collect()
              Some(annPartitionCols.zipWithIndex.map { case (c, i) =>
                col(c).isin(vals.map(_.get(i)).distinct.toSeq: _*)
              }.reduce(_ && _))
            }
            val annStore = storeView(spark, annStoreDir, annSchema, "vec_id",
              upTo = id, routeFilter)
              .getOrElse(annBandsOf(vecColsOf(b.limit(0))))
            sink(annProbe(annStore, vecBands), id)
            // A batch may dedup away ENTIRELY; an empty partitioned write
            // leaves a schema-less directory readBands cannot open, so a
            // keeper-less batch writes no deltas at all — storeView and
            // guardHistory tolerate version gaps by construction.
            if (!keptIds.isEmpty) {
              commitDelta(spark, dedupStoreDir, keeperBands, dedupSchema,
                "doc_id", Nil, compactEvery, id)
              annAppend(vecBands.count())
              commitDelta(spark, annStoreDir, vecBands, annSchema,
                "vec_id", annPartitionCols, compactEvery, id)
            }
          } finally { vecBands.unpersist(); decisions.unpersist() }
        } finally { docBands.unpersist(); batch.unpersist(); batch0.unpersist() }
      }
    }).start()
  }

  /** The FULL curation funnel as one rolling micro-batch loop — the shape
    * a production LLM-data crawl actually runs. Per batch of
    * (doc_id, text, embedding):
    *
    *   1. QUALITY gate — [[graft.operators.TextAnalysis.keepFilter]]'s
    *      rule cascade (too-short / too-long / stopword-ratio /
    *      word-length / in-batch exact duplicate), all scan-stage
    *      metrics, one digest-keyed batch-sized shuffle;
    *   2. DECONTAMINATION gate — word-3-gram shingle overlap against the
    *      held-out benchmark corpus
    *      ([[graft.operators.TextAnalysis.decontaminate]]: broadcast
    *      dictionary at fixture sizes, bloom + exact re-check past
    *      `broadcastMaxIds` — the benchmark side is sketched + persisted
    *      ONCE at stream construction, never per batch);
    *   3. NEAR-DUP gate + INDEX — survivors flow into the keeper-gated
    *      quantized pipeline ([[dedupIndexIngestPq]]'s loop verbatim):
    *      simhash probe against the rolling keeper store,
    *      first-seen-wins components, keeper bands + PQ codes appended
    *      as deltas.
    *
    * `curationSink` receives each batch's pre-dedup DROP rows as
    * (doc_id, stage ∈ quality|decontam, reason); survivors carry no row
    * there — their keep/drop decision arrives via `dedupSink` like the
    * composed pipeline, so the union of the two sinks is the complete
    * per-doc funnel account. Both gates are deterministic functions of
    * (batch, static benchmark), so a checkpoint replay rebuilds identical
    * decisions and deltas — the composed loop's replay contract is
    * unchanged.
    *
    * Scale shape: gate work is ∝ batch (quality metrics in the scan
    * stage; the decontam dictionary is a broadcast/bloom probed by the
    * batch's exploded shingles, the asymmetric corpus-vs-reference shape
    * of [[graft.operators.TextAnalysis.decontaminate]]); the store-probe
    * cost structure of [[dedupIndexIngestPq]] is unchanged. Reference
    * semantics: the GPT-3/C4-style curation order (quality -> decontam ->
    * dedup) with each stage's account auditable per batch. */
  def curatedIngest(docs: DataFrame, benchDocs: DataFrame,
                    dedupStoreDir: String, annStoreDir: String,
                    coarse: Seq[(Int, Array[Long])],
                    books: Seq[Seq[(Int, Array[Long])]],
                    maxHamming: Int = 3, k: Int = 3,
                    compactEvery: Int = 8, wideSig: Boolean = false,
                    broadcastMaxIds: Long = 4000000L,
                    configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity,
                    curationSink: (DataFrame, Long) => Unit = (_, _) => (),
                    dedupSink: (DataFrame, Long) => Unit = (_, _) => ())
                   (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import graft.operators.{Dedup => D, Similarity, TextAnalysis}
    // the benchmark dictionary is derived, persisted, counted, and
    // tiered ONCE at construction (a static reference relation, like the
    // routed pipeline's bootstrap books) — per batch the gate pays only
    // the batch side's explode + probe, never a benchmark-sized job
    val (decontam, releaseDict) = TextAnalysis.decontamGate(
      D.docWidArrays(benchDocs.select("doc_id", "text")), broadcastMaxIds)
    // the cached dictionary lives exactly as long as its stream: released
    // on termination (the r15 ADVICE class of leak — a per-stream cached
    // relation with no owner outliving its loop). releaseDict is
    // idempotent, so the post-registration liveness check below may
    // double-fire safely.
    def releaseOn(q: StreamingQuery): StreamingQuery = {
      val spark = benchDocs.sparkSession
      val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == q.id) {
            releaseDict()
            spark.streams.removeListener(this)
          }
      }
      spark.streams.addListener(l)
      // a query that terminated BEFORE the registration above never posts
      // its event to this listener — release directly in that case
      if (!spark.streams.active.exists(_.id == q.id)) {
        releaseDict()
        spark.streams.removeListener(l)
      }
      q
    }
    val gate = (spark: SparkSession, id: Long, batch: DataFrame) => {
      val q = TextAnalysis.keepFilter(batch.select("doc_id", "text"))
      val qDrops = q.filter(!col("keep"))
        .select(col("doc_id"), lit("quality").as("stage"), col("reason"))
      val qKept = batch.join(
        broadcast(q.filter(col("keep")).select("doc_id")), Seq("doc_id"))
      // evaluated twice (sink + anti-join), both off the PERSISTED batch
      // relation — re-deriving a batch-sized gate beats holding another
      // cached relation per batch
      val contaminated = decontam(D.docWidArrays(qKept.select("doc_id", "text")))
        .filter(col("contaminated")).select("doc_id")
      val dDrops = contaminated.select(col("doc_id"),
        lit("decontam").as("stage"), lit("contaminated").as("reason"))
      curationSink(qDrops.unionByName(dDrops), id)
      qKept.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    }
    val query = try {
      composedIngest(docs, dedupStoreDir, annStoreDir, maxHamming,
        compactEvery, wideSig, configure, dedupSink,
        vecColsOf = df => df.select(col("doc_id").as("vec_id"), col("embedding")),
        annSideFor = (_, _) => (
          v => Similarity.ivfPqEncode(v, coarse, books),
          (store, codes) => Similarity.ivfPqIncrementalCodes(
            store, codes, coarse, books, k, nprobe = 1),
          (_: Long) => ()),
        annPartitionCols = Seq("cell"), preGate = gate)(sink)
    } catch {
      case e: Throwable => releaseDict(); throw e
    }
    releaseOn(query)
  }

  // ---- rolling connected components (round 17): incremental labels via a
  // label-merge ledger ----

  private val labelSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("node",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("label",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** The merge LEDGER strictly before `upTo`: (from, to) label renames,
    * collected to the driver. Bounded: every entry retires one label
    * forever, compaction folds all entries < its fold point into the node
    * rows and deletes them — so the ledger holds at most one entry per
    * component merge since the last compaction, the small indirection
    * that makes a merge O(1) instead of a relabel of the larger side. */
  /** The live ledger in (`sinceExclusive`, `upTo`): ledger elements at or
    * below the base version are part of the folded base (their renames
    * are already applied to every row they could touch) — and once pins
    * can RETAIN folded ledger elements on disk, the floor is what keeps
    * them from re-entering live reads. (Re-applying a folded rename is
    * semantically a no-op — a retired label never re-emerges, since a
    * component's min member only decreases — so the floor is a cost
    * bound, not a correctness fix.) */
  private def mergeLedger(spark: SparkSession, storeDir: String,
                          sinceExclusive: Long,
                          upTo: Long): Seq[(Long, Long)] =
    ledgerOf(spark, dirs(spark, storeDir, "m")
      .filter { case (v, _) => v > sinceExclusive && v < upTo }.map(_._2))

  private def ledgerOf(spark: SparkSession,
                       paths: Seq[String]): Seq[(Long, Long)] =
    paths.flatMap { p =>
      spark.read.parquet(p).collect().map(r => (r.getLong(0), r.getLong(1)))
    }

  /** Iterative path-halving find over a parent map (the [[Dedup]]
    * union-find discipline: O(1) stack depth on any chain shape). */
  private def pathFind(parent: scala.collection.mutable.Map[Long, Long])
                      (x0: Long): Long = {
    var x = x0
    var p = parent.getOrElse(x, x)
    while (p != x) {
      val gp = parent.getOrElse(p, p)
      parent(x) = gp
      x = gp
      p = parent.getOrElse(x, x)
    }
    x
  }

  /** Resolve a label DataFrame through the ledger: entries become a
    * broadcast rename map; labels outside it pass through. */
  private def resolveLabels(labels: DataFrame,
                            ledger: Seq[(Long, Long)]): DataFrame = {
    if (ledger.isEmpty) labels
    else {
      val spark = labels.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      ledger.foreach { case (f, t) =>
        val (rf, rt) = (pathFind(parent)(f), pathFind(parent)(t))
        if (rf != rt) parent(math.max(rf, rt)) = math.min(rf, rt)
      }
      val renames = ledger.map(_._1).distinct
        .map(l => (l, pathFind(parent)(l))).toDF("label", "__canon")
      labels.join(broadcast(renames), Seq("label"), "left")
        .select(col("node"),
          coalesce(col("__canon"), col("label")).as("label"))
    }
  }

  /** Every node's component label, resolved through the live ledger —
    * the store's read API. Labels follow the [[Dedup.labelPropagation]]
    * convention (min node id in the component). */
  def componentLabels(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val baseVer = dirs(spark, storeDir, "base").lastOption.map(_._1).getOrElse(-1L)
    storeView(spark, storeDir, labelSchema, "node")
      .map(resolveLabels(_, mergeLedger(spark, storeDir, baseVer, Long.MaxValue)))
  }

  /** [[commitDelta]]'s components twin: commit the batch's label delta and
    * ledger element, then compact with LEDGER FOLDING — the compacted base
    * is written with every label resolved through the ledger < the batch,
    * after which those ledger elements are deleted (every row they could
    * rename is inside the new base; the current batch's own delta carries
    * only post-resolution labels by construction, so it references no
    * retired label). The fold writes base<compactTo> as a FRESH element
    * (tmp+rename, no in-place overwrite of a live base — the one crash
    * window an in-place rewrite would open). Every step idempotent and
    * replay-safe under the shared upTo < id read discipline. */
  private def commitComponents(spark: SparkSession, storeDir: String,
                               labels: DataFrame, retired: Option[DataFrame],
                               compactEvery: Int, id: Long): Unit = {
    writeElement(spark, s"$storeDir/d$id", labels, Nil)
    retired.foreach(r => writeElement(spark, s"$storeDir/m$id", r, Nil))
    sweepTmp(spark, storeDir)
    val keep = pinnedNames(spark, storeDir)
    val baseVer = dirs(spark, storeDir, "base").lastOption.map(_._1).getOrElse(-1L)
    sweepEls(spark, dirs(spark, storeDir, "base").dropRight(1), keep)
    sweepEls(spark, (dirs(spark, storeDir, "d") ++ dirs(spark, storeDir, "m"))
      .filter(_._1 <= baseVer), keep)
    val pending = dirs(spark, storeDir, "d")
      .filter { case (v, _) => v > baseVer && v < id }
    if (pending.size >= compactEvery) {
      val compactTo = pending.map(_._1).max
      val ledger = mergeLedger(spark, storeDir, baseVer, upTo = id)
      val compacted = resolveLabels(
        storeView(spark, storeDir, labelSchema, "node", upTo = id)
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], labelSchema)),
        ledger)
      writeElement(spark, s"$storeDir/base$compactTo", compacted, Nil)
      sweepEls(spark, pending, keep)
      if (baseVer >= 0)
        sweepEls(spark, Seq((baseVer, s"$storeDir/base$baseVer")), keep)
      sweepEls(spark, dirs(spark, storeDir, "m").filter(_._1 < id), keep)
    }
  }

  /** Rolling connected-components ingest over a streaming relation of
    * undirected edges `(u, v)` — e.g. the near-dup pairs [[dedupIngest]]
    * emits. Maintains node→label rows under the element contract
    * (base/deltas, supersede by node) PLUS a label-merge ledger (`m<id>`
    * elements): when a batch edge connects two existing components, the
    * larger side is NOT relabeled — one ledger entry renames its label,
    * and readers resolve through the ledger. Per-batch work is therefore
    * ∝ batch (+ the ledger, which compaction empties), never ∝ corpus:
    * the cascade that makes naive incremental components degenerate to a
    * full relabel on a single bridging edge costs one ledger row here.
    *
    * Batch algorithm (driver memory ∝ batch + ledger, both documented):
    *   1. canonicalize batch edges (min,max), drop self-loops, distinct;
    *   2. the store rows of TOUCHED nodes only (corpus-sized scan,
    *      batch-sized result via broadcast semi-join) come back to the
    *      driver, resolved through the ledger;
    *   3. driver union-find over batch edges + (node → prior label)
    *      bindings; canonical label = min member (ids and labels share
    *      the id domain, so min-of-mins is the component min);
    *   4. delta `d<id>` rewrites the touched nodes' labels; ledger
    *      element `m<id>` records (old resolved label → canon) for every
    *      label the batch retired; `sink` receives the touched nodes'
    *      resolved (node, label) rows.
    * Compaction (same `compactEvery` contract as every store) folds
    * deltas AND the ledger < the fold point into the new base — ledger
    * entries are deleted only once every row they could rename is folded.
    * Replay-safe like the band stores: a replayed batch reads elements
    * strictly below its id and rebuilds the identical delta + ledger
    * element. After every batch, [[componentLabels]] over the edge
    * history equals [[Dedup.labelPropagation]] over the full edge set
    * (spec-pinned, including the one-edge bridge of two grown
    * components). */
  def componentsIngest(edges: DataFrame, storeDir: String,
                       compactEvery: Int = 8,
                       configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
                      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    configure(edges.writeStream.foreachBatch { (b0: DataFrame, id: Long) =>
      if (!b0.isEmpty)
        sink(componentsBatch(b0.sparkSession, storeDir, b0, compactEvery, id), id)
    }).start()
  }

  /** One components micro-batch against `storeDir`: update the label store
    * with `edges0` (first two columns = endpoints) under batch `id`,
    * commit, and return the touched nodes' resolved (node, label) rows —
    * the per-batch core of [[componentsIngest]], shared by the composed
    * [[dedupClustersIngest]]. Empty edge sets short-circuit to an empty
    * result with no store write (version gaps are tolerated by
    * construction). */
  private def componentsBatch(spark: SparkSession, storeDir: String,
                              edges0: DataFrame, compactEvery: Int,
                              id: Long): DataFrame = {
    import spark.implicits._
    guardHistory(spark, storeDir, id)
    val cols = edges0.columns
    val eb = edges0.select(
        org.apache.spark.sql.functions.least(col(cols(0)), col(cols(1))).cast("long").as("u"),
        org.apache.spark.sql.functions.greatest(col(cols(0)), col(cols(1))).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().persist()
    try {
      // driver memory ∝ batch edges (the documented contract; the probe
      // batches carry the same comment) + the ledger
      val ePairs = eb.collect().map(r => (r.getLong(0), r.getLong(1)))
      if (ePairs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], labelSchema)
      else {
        val touched = eb.select(col("u").as("node"))
          .union(eb.select(col("v").as("node"))).distinct()
        val ledgerBase = dirs(spark, storeDir, "base")
          .filter(_._1 < id).lastOption.map(_._1).getOrElse(-1L)
        val ledger = mergeLedger(spark, storeDir, ledgerBase, upTo = id)
        // prior labels of touched nodes: batch-sized result, resolved
        // through the ledger on the driver
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        ledger.foreach { case (f, t) =>
          val (rf, rt) = (pathFind(parent)(f), pathFind(parent)(t))
          if (rf != rt) parent(math.max(rf, rt)) = math.min(rf, rt)
        }
        val prior: Map[Long, Long] =
          storeView(spark, storeDir, labelSchema, "node", upTo = id)
            .map(_.join(broadcast(touched), Seq("node"))
              .collect().map(r => r.getLong(0) -> pathFind(parent)(r.getLong(1)))
              .toMap)
            .getOrElse(Map.empty)
        // driver union-find: batch edges + prior-label bindings.
        // min-union (attach the larger root under the smaller) keeps the
        // component representative = min id, the labelPropagation
        // convention.
        val uf = scala.collection.mutable.Map.empty[Long, Long]
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (pathFind(uf)(a), pathFind(uf)(b))
          if (ra != rb) uf(math.max(ra, rb)) = math.min(ra, rb)
        }
        ePairs.foreach { case (a, b) => union(a, b) }
        prior.foreach { case (n, l) => union(n, l) }
        val touchedIds = prior.keySet ++ ePairs.flatMap(p => Seq(p._1, p._2))
        val newLabels = touchedIds.toSeq.sorted
          .map(n => (n, pathFind(uf)(n)))
        // retired labels: a prior label whose canon moved
        val retired = prior.values.toSeq.distinct
          .map(l => (l, pathFind(uf)(l))).filter { case (f, t) => f != t }
        val labelsDf = newLabels.toDF("node", "label")
        commitComponents(spark, storeDir, labelsDf,
          if (retired.nonEmpty) Some(retired.toDF("from", "to")) else None,
          compactEvery, id)
        labelsDf
      }
    } finally eb.unpersist()
  }

  /** The crawl stack's cluster view in ONE micro-batch loop: simhash
    * near-dup pairs against the rolling band store ([[dedupIngest]]) feed
    * the components store ([[componentsBatch]]) within the same batch, so
    * every emitted pair immediately updates durable cluster identity.
    * `sink` receives the batch's resolved (node, label) rows — the docs
    * whose cluster membership this batch created or changed; a doc with
    * no near-dup edge is its own implicit singleton (the
    * [[Dedup.labelPropagation]] convention — stores hold edge endpoints
    * only). Both stores commit under the SAME batch id; a crash between
    * the two commits replays the batch, which rebuilds both elements
    * deterministically (pairs are a pure function of store< id + batch,
    * and [[guardHistory]] admits the half-written replay shape). */
  def dedupClustersIngest(docs: DataFrame, dedupStoreDir: String,
                          ccStoreDir: String, maxHamming: Int = 3,
                          compactEvery: Int = 8, wideSig: Boolean = false,
                          configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
                         (sink: (DataFrame, Long) => Unit): StreamingQuery =
    dedupIngest(docs, dedupStoreDir, maxHamming, compactEvery, wideSig,
      configure) { (pairs, id) =>
      val spark = pairs.sparkSession
      val p = pairs.select("doc_a", "doc_b").persist()
      try sink(componentsBatch(spark, ccStoreDir, p, compactEvery, id), id)
      finally p.unpersist()
    }
}