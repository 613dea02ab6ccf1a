package graft.streaming

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

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
  *   4. appends its bands to the store, re-ingested ids superseding their
  *      old rows. Duplicate ids WITHIN a micro-batch collapse to one
  *      arbitrary-but-single row first — a micro-batch has no internal
  *      order, and the store invariant (a fixed band-row count per live
  *      id) must hold regardless.
  *
  * The store lives as parquet under `storeDir`, one versioned directory
  * per micro-batch (`v<batchId>`), the latest discovered by listing. A
  * replayed batch id (checkpoint recovery re-runs the LAST uncommitted
  * batch) re-reads the newest version OLDER than itself and overwrites
  * ITS OWN version deterministically instead of double-appending, so the
  * store is idempotent under Structured Streaming's at-least-once
  * foreachBatch; versions below the replay horizon are pruned after each
  * commit, so disk holds at most two snapshots. Starting a FRESH stream
  * (new checkpoint, batch ids from 0) against a populated storeDir is
  * refused rather than silently probing an empty store — which makes the
  * one crash window before the FIRST version's checkpoint commit a
  * guided manual recovery (the guard's message names the version to
  * delete) instead of an automatic replay.
  *
  * With `routeCols` (ANN) the store is written `partitionBy` the routing
  * columns, so the cell-routed probe's candidate pruning has its
  * storage-layout counterpart: a rewrite or an external reader touches
  * only the cells present in the batch (partition values round-trip for
  * int/long/string cells — Spark's partition-column type inference).
  */
object RollingIngest {

  /** Versioned store directories under `storeDir`, oldest first. */
  private def versions(spark: org.apache.spark.sql.SparkSession,
                       storeDir: String): Seq[(Long, String)] = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption
        .map(_ -> s.getPath.toString))
      .sortBy(_._1)
  }

  /** The shared micro-batch loop; `bandsOf` sketches a deduplicated
    * batch, `probe(store, batchBands)` computes the batch's result rows. */
  private def ingest(src: DataFrame, storeDir: String, idCol: String,
                     bandsOf: DataFrame => DataFrame,
                     probe: (DataFrame, DataFrame) => DataFrame,
                     partitionCols: Seq[String],
                     configure: DataStreamWriter[Row] => DataStreamWriter[Row])
                    (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    configure(src.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      if (!b.isEmpty) {
        val spark = b.sparkSession
        val vs = versions(spark, storeDir)
        // Refuse every shape where this batch did not produce the store's
        // history: versions NEWER than the batch (restart mid-history), or
        // a populated store with nothing OLDER than the batch (fresh
        // stream, ids from 0, against an existing store — including the
        // v0-only store a one-batch run leaves behind). The one legitimate
        // case this rejects is a crash between writing the very FIRST
        // version and its checkpoint commit; the message names the
        // recovery (delete that version — the replayed batch rebuilds it
        // deterministically), which is strictly safer than the silent
        // empty-store probe + overwrite a fresh-stream mixup would get.
        require(vs.isEmpty || (vs.head._1 < id && !vs.exists(_._1 > id)),
          s"$storeDir holds versions [${vs.map(_._1).mkString(",")}] not " +
            s"strictly older than batch $id — this stream did not build " +
            "that store (fresh checkpoint against a populated storeDir?). " +
            "Point the query at its original checkpoint, use an empty " +
            s"storeDir, or — after a crash before the first commit — " +
            s"delete $storeDir/v$id and restart")
        // store = newest version strictly OLDER than this batch id, so a
        // checkpoint-replayed batch re-reads the store it originally saw
        val store = vs.filter(_._1 < id).lastOption
          .map(v => spark.read.parquet(v._2))
          .getOrElse(bandsOf(b.limit(0)))
        val bands = bandsOf(b.dropDuplicates(idCol)).persist()
        // next = the superseded store ∪ batch bands, persisted: the probe
        // receives it AS the store (its internal anti-join over the cached
        // relation is a no-op re-derivation), and the version write reads
        // the same cache — the store parquet is scanned ONCE per batch.
        val next = store
          .join(bands.select(idCol).distinct(), Seq(idCol), "left_anti")
          .unionByName(bands.select(store.columns.map(col): _*))
          .persist()
        try {
          sink(probe(next, bands), id)
          val w = next.write.mode("overwrite")
          (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
            .parquet(s"$storeDir/v$id")
          // prune everything below the replay horizon (keep v$id + the
          // version a replay of THIS batch would re-read)
          val fs = new org.apache.hadoop.fs.Path(storeDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          vs.filter(_._1 < id).dropRight(1).foreach { case (_, p) =>
            fs.delete(new org.apache.hadoop.fs.Path(p), true)
          }
        } finally { bands.unpersist(); next.unpersist() }
      }
    }).start()
  }

  /** Rolling ANN ingest over a streaming relation of
    * (vec_id[, routeCols…], embedding). `sink` receives each batch's
    * neighbor rows (qid, nid, cosine) with the batch id. `configure` is
    * applied to the writer before start — set `checkpointLocation` there
    * for a durable query (the replay idempotency assumes the query HAS a
    * checkpoint), plus trigger/queryName as needed. */
  def annIngest(vecs: DataFrame, storeDir: String, k: Int = 3,
                routeCols: Seq[String] = Nil,
                configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
               (sink: (DataFrame, Long) => Unit): StreamingQuery =
    ingest(vecs, storeDir, "vec_id", Similarity.hyperBands,
      (store, bands) => Similarity.lshAnnIncrementalBands(store, bands, k, routeCols),
      routeCols, configure)(sink)

  /** Rolling simhash near-dup ingest over a streaming relation of
    * (doc_id, text): each micro-batch emits its (doc_a, doc_b, hamming)
    * pairs touching the batch, then its 64-bit bands join the store.
    * Same store/versioning/supersede contract as [[annIngest]]. */
  def dedupIngest(docs: DataFrame, storeDir: String, maxHamming: Int = 3,
                  configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery =
    ingest(docs, storeDir, "doc_id", Dedup.simhash64Bands,
      (store, bands) => Dedup.simhashNearDupIncrementalBands(store, bands, maxHamming),
      Nil, configure)(sink)
}
