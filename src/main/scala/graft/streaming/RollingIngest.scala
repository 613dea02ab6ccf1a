package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Rolling-ingest driver: the composition of Structured Streaming with the
  * incremental batch-vs-store entry points, i.e. the shape a continuously
  * crawled 100 TB corpus actually runs. Each micro-batch of vectors
  *
  *   1. probes the band store built from every batch BEFORE it —
  *      top-k exact-cosine neighbors via
  *      [[Similarity.lshAnnIncrementalBands]], so probe work ∝ batch,
  *      never ∝ corpus;
  *   2. hands its per-batch neighbor rows to `sink` (the caller's output
  *      contract — a parquet append, a metrics table, an alert);
  *   3. appends its own bands to the store, re-ingested ids superseding
  *      their old rows (left-anti on the batch's ids, the same contract
  *      the incremental queries pin in spec). Duplicate vec_ids WITHIN a
  *      micro-batch collapse to one arbitrary-but-single row first — a
  *      micro-batch has no internal order, and the store invariant (two
  *      band rows per live id) must hold regardless.
  *
  * The store lives as parquet under `storeDir`, one versioned directory
  * per micro-batch (`v<batchId>`), the latest version discovered by
  * listing. A replayed batch id (checkpoint recovery re-runs the LAST
  * uncommitted batch) re-reads the newest version OLDER than itself and
  * overwrites ITS OWN version deterministically instead of
  * double-appending, so the store is idempotent under Structured
  * Streaming's at-least-once foreachBatch; versions older than the
  * replay horizon (everything below the previous version) are pruned
  * after each commit, so disk holds at most two full snapshots. Starting
  * a FRESH stream (new checkpoint, batch ids from 0) against a populated
  * storeDir is refused rather than silently probing an empty store.
  *
  * The batch sketch computes ONCE: the same persisted band relation
  * serves the probe and the store append. With `routeCols` the store is
  * written `partitionBy` the routing columns, so the cell-routed probe's
  * candidate pruning has its storage-layout counterpart (a rewrite or an
  * external reader touches only the cells present in the batch; partition
  * values round-trip for int/long/string cells — Spark's partition-column
  * type inference).
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

  /** Start the rolling ANN ingest over a streaming relation of
    * (vec_id[, routeCols…], embedding). `sink` receives each batch's
    * neighbor rows (qid, nid, cosine) with the batch id, synchronously
    * within the micro-batch. `configure` is applied to the writer before
    * start — set `checkpointLocation` there for a durable query (the
    * replay idempotency above assumes the query HAS a checkpoint),
    * plus trigger/queryName as needed. */
  def annIngest(vecs: DataFrame, storeDir: String, k: Int = 3,
                routeCols: Seq[String] = Nil,
                configure: DataStreamWriter[Row] => DataStreamWriter[Row] = identity)
               (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    configure(vecs.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      if (!b.isEmpty) {
        val spark = b.sparkSession
        val vs = versions(spark, storeDir)
        require(!vs.exists(_._1 > id),
          s"$storeDir holds store versions newer than batch $id — a replay " +
            "only re-runs the LAST batch, so this is a fresh stream (new " +
            "checkpoint) against an existing store; point it at its " +
            "original checkpoint or an empty storeDir")
        // store = newest version strictly OLDER than this batch id, so a
        // checkpoint-replayed batch re-reads the store it originally saw
        val store = vs.filter(_._1 < id).lastOption
          .map(v => spark.read.parquet(v._2))
          .getOrElse(Similarity.hyperBands(b.limit(0)))
        val bands = Similarity.hyperBands(b.dropDuplicates("vec_id")).persist()
        try {
          sink(Similarity.lshAnnIncrementalBands(store, bands, k, routeCols), id)
          val w = store
            .join(bands.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
            .unionByName(bands.select(store.columns.map(org.apache.spark.sql.functions.col): _*))
            .write.mode("overwrite")
          (if (routeCols.nonEmpty) w.partitionBy(routeCols: _*) else w)
            .parquet(s"$storeDir/v$id")
          // prune everything below the replay horizon (keep v$id + the
          // version a replay of THIS batch would re-read)
          val fs = new org.apache.hadoop.fs.Path(storeDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          vs.filter(_._1 < id).dropRight(1).foreach { case (_, p) =>
            fs.delete(new org.apache.hadoop.fs.Path(p), true)
          }
        } finally bands.unpersist()
      }
    }).start()
  }
}
