package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SetSimilarity

/** Streaming probes of a FROZEN persisted [[SetSimilarity.SetSimIndex]]
  * — the exact-join family's streaming face, completing the
  * per-index-family symmetry (minhash → StreamDedup, embeddings →
  * StreamEmbedDedup, media → StreamMediaDedup, PQ → StreamAnn):
  * each micro-batch of token sets probes the corpus index with the
  * same recall-1.0 prefix-filter machinery batch ingest uses, either
  * symmetric (Jaccard ≥ τ) or asymmetric (containment ≥ τ — the
  * quote-inclusion case).
  *
  * The index is loaded ONCE before the stream starts and stays FROZEN
  * for its lifetime (the dfreq token order is the index's correctness
  * contract — SetSimIndex deliberately has no incremental growth;
  * rebuild on the usual cadence and restart). Probes are pure
  * batch-engine jobs per micro-batch — no streaming state; replays are
  * harmless (probing writes nothing; `sink` gets the batch id to key
  * its own output). A save()d index keeps its sublinear paths under
  * streaming exactly as in batch: the verify fetch prunes to candidate
  * shards and the containment probe prunes the posting table to the
  * batch's prefix-token shards.
  */
object StreamSetSim {

  /** foreachBatch writer: symmetric probe — every (corpus a_id, batch
    * b_id) pair with Jaccard ≥ tauNum/tauDen. Callers pick trigger
    * and start. */
  def probeWriter(
      stream: DataFrame, index: SetSimilarity.SetSimIndex,
      idCol: String, tokensCol: Column, tauNum: Int, tauDen: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val exportBatch: (DataFrame, Long) => Unit = { (batch, batchId) =>
      sink(SetSimilarity.probeIndex(index, batch, idCol, tokensCol,
        tauNum, tauDen), batchId)
    }
    stream.writeStream.outputMode("append").foreachBatch(exportBatch)
  }

  /** foreachBatch writer: containment probe — every ordered pair with
    * |A∩B| ≥ τ·|B| for a batch doc B inside a corpus doc A. */
  def containmentWriter(
      stream: DataFrame, index: SetSimilarity.SetSimIndex,
      idCol: String, tokensCol: Column, tauNum: Int, tauDen: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val exportBatch: (DataFrame, Long) => Unit = { (batch, batchId) =>
      sink(SetSimilarity.probeContainment(index, batch, idCol, tokensCol,
        tauNum, tauDen), batchId)
    }
    stream.writeStream.outputMode("append").foreachBatch(exportBatch)
  }
}
