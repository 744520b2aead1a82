package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous HEAVY HITTERS over an unbounded token stream — the
  * streaming twin of q69's sketch-first batch query, with provably
  * BOUNDED state: per-shard Misra–Gries summaries of capacity `c`
  * (the Space-Saving family), merged downstream.
  *
  * Sharding is BY TERM (hash(term) % shards), so ALL of a term's mass
  * lands in one shard: a globally heavy term is in-shard heavy by
  * construction, and the per-shard MG guarantee — any term with
  * in-shard count > n_shard/(c+1) survives, with estimate error ≤
  * the shard's total decrement ≤ n_shard/(c+1) — carries to global
  * heavy hitters directly. State is O(shards × c) REGARDLESS of
  * stream length or vocabulary size — the property that lets an
  * open-vocabulary trend monitor run forever (an exact count table
  * grows with the vocabulary; a per-window exact agg re-shuffles
  * every token).
  *
  * Parallelism = `shards` (pick ≥ executor-core count at scale); the
  * per-batch emission is each shard's current summary (Update-mode
  * monitoring semantics: the sink always holds the latest view).
  */
object StreamTopK {

  /** One token occurrence batch row: `w` pre-aggregated occurrences
    * (map-side count before the shuffle — send (term, n), not n rows). */
  case class Tok(shard: Int, term: String, w: Long)

  /** MG summary state: surviving counters + total decrement so far
    * (the error bound: est ≤ true ≤ est + dec for tracked terms). */
  case class MgState(counts: Map[String, Long], dec: Long)

  /** Per-shard summary row emitted each batch. */
  case class ShardTop(shard: Int, term: String, est: Long, maxErr: Long)

  /** Fold a batch of (term, w) into a Misra–Gries summary of at most
    * `capacity` counters. Weighted decrements: when the summary is
    * full and a new term arrives with weight w, all counters sink by
    * the largest d ≤ w that keeps the map at capacity (classic MG
    * generalised to weighted updates; error accounting unchanged). */
  private[graft] def mgFold(
      state: MgState, terms: Iterator[(String, Long)],
      capacity: Int): MgState = {
    var counts = collection.mutable.Map(state.counts.toSeq: _*)
    var dec = state.dec
    terms.foreach { case (t, w) =>
      if (w > 0) {
        counts.get(t) match {
          case Some(c) => counts.update(t, c + w)
          case None if counts.size < capacity => counts.update(t, w)
          case None =>
            // sink everything by the min of (w, smallest counter) until
            // either the new term's weight is absorbed or a slot frees
            var remaining = w
            while (remaining > 0 && counts.size >= capacity) {
              val minC = counts.valuesIterator.min
              val d = math.min(remaining, minC)
              dec += d
              counts = counts.collect {
                case (k, c) if c > d => k -> (c - d)
              }
              remaining -= d
            }
            if (remaining > 0) counts.update(t, remaining)
        }
      }
    }
    MgState(counts.toMap, dec)
  }

  /** Per-shard continuous summaries (no watermark needed — state is
    * bounded by construction, not by time eviction). */
  def topKUpdates(
      toks: Dataset[Tok], capacity: Int)(
      implicit spark: SparkSession): Dataset[ShardTop] = {
    import spark.implicits._
    require(capacity >= 1, "topKUpdates: capacity >= 1")
    toks
      .groupByKey(_.shard)
      .flatMapGroupsWithState[MgState, ShardTop](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, batch: Iterator[Tok], state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val next = mgFold(prev, batch.map(t => (t.term, t.w)), capacity)
          state.update(next)
          next.counts.iterator.map { case (t, c) =>
            ShardTop(shard, t, c, next.dec)
          }
      }
  }
}
