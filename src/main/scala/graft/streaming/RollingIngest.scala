package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Rolling-ingest driver: the composition of Structured Streaming with the
  * incremental batch-vs-store entry points, i.e. the shape a continuously
  * crawled 100 TB corpus actually runs. Each micro-batch of vectors
  *
  *   1. probes the band store built from every batch BEFORE it —
  *      top-k exact-cosine neighbors via [[Similarity.lshAnnIncremental]],
  *      so probe work ∝ batch, never ∝ corpus;
  *   2. hands its per-batch neighbor rows to `sink` (the caller's output
  *      contract — a parquet append, a metrics table, an alert);
  *   3. appends its own bands to the store, re-ingested ids superseding
  *      their old rows (left-anti on the batch's ids, the same contract
  *      the incremental queries pin in spec).
  *
  * The store lives as parquet under `storeDir`, one versioned directory per
  * micro-batch (`v<batchId>`), the latest version discovered by listing —
  * a replayed batch id (checkpoint recovery) overwrites ITS OWN version
  * deterministically instead of double-appending, so the store is
  * idempotent under Structured Streaming's at-least-once foreachBatch. At
  * test scale the supersede+append rewrite is a full-store pass; at 100 TB
  * the store is partitioned by the routing cell ([[Similarity]]'s
  * `routeCols`) and the rewrite touches only the batch's cells —
  * partition-wise compaction, the same pruning the routed probe enjoys.
  */
object RollingIngest {

  /** Versioned store directories under `storeDir`, newest last. */
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
    * within the micro-batch. */
  def annIngest(vecs: DataFrame, storeDir: String, k: Int = 3,
                routeCols: Seq[String] = Nil)
               (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    vecs.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      if (!b.isEmpty) {
        val spark = b.sparkSession
        // store = newest version strictly OLDER than this batch id, so a
        // checkpoint-replayed batch re-reads the store it originally saw
        val prior = versions(spark, storeDir).filter(_._1 < id).lastOption
        val store = prior.map(v => spark.read.parquet(v._2))
          .getOrElse(Similarity.hyperBands(b.limit(0)))
        sink(Similarity.lshAnnIncremental(store, b, k, routeCols), id)
        val bands = Similarity.hyperBands(b)
        store.join(b.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
          .unionByName(bands)
          .write.mode("overwrite").parquet(s"$storeDir/v$id")
      }
    }.start()
  }
}
