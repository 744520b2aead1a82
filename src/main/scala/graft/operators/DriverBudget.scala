package graft.operators

/** THE driver-memory budget model behind every bounded driver-side
  * collect in the library — the graph fast paths, the dedup
  * union-find, the k-means/PQ/PCA training samples, and the
  * plan-literal model shipping. One allowance, one accounting rule,
  * instead of the per-operator constants that accreted round by
  * round (r15 unification).
  *
  * The rule: a bounded collect must fit its TRANSIENT peak — not its
  * steady-state footprint — inside [[MaxTransientBytes]]. The
  * transient peak is what actually OOMs a driver: `collect()` comes
  * back as an array of boxed rows/tuples before any primitive-array
  * conversion, so the peak runs 4–8× the steady bytes (a two-long
  * edge is 16 B steady but ~128 B as a boxed `(Long, Long)` in an
  * array slot; a 768-dim float vector is 3 KB steady but ~4 KB
  * through the row). 256 MB leaves a default 1 GiB driver room for
  * the session, the plans, and a second concurrent collect.
  *
  * Per-row transient costs (estimated from JOL-style field layouts,
  * validated by the measured collects of earlier rounds):
  *
  *  - [[GraphEdges]]: a collected edge through a typed tuple encoder
  *    ≈128 B transient (two boxed longs + Tuple2 + array slot +
  *    allocator slack) → 2,097,152 edges (~256 MB peak, 32 MB as
  *    primitive arrays after conversion). Consumers: Graph.pageRank /
  *    labelPropagation / triangles.
  *  - [[CcEdges]]: the union-find additionally holds per-edge map
  *    state while resolving (boxed keys/values + hash-table slack)
  *    ≈512 B → 524,288 edges. Consumer:
  *    Dedup.connectedComponents.
  *  - [[LiteralFloats]]: a float shipped as a plan LITERAL costs ~8 B
  *    through analysis/serialization (the literal tree, not a raw
  *    array) → 32M floats (the k-means/PQ codebook ceiling — a
  *    31k×768 centroid table for a 10^9-vector IVF fits). Consumer:
  *    Ann.collectCentroids.
  *  - [[TrainRows]]: one collected training-sample row at ≤1024
  *    float dims ≈4 KB boxed → 65,536 rows. Consumers: Pca.train,
  *    Ann.trainPq/trainPqResidual (their `maxTrain` ceilings).
  *
  * Operators keep per-call overrides (e.g. `driverMaxEdges`) for
  * drivers with less headroom — these are the DEFAULTS, and the specs
  * pin driver ≡ distributed on both sides of every bound, so the
  * numbers size the fast path, never correctness.
  */
object DriverBudget {

  /** The allowance: every bounded collect's transient peak fits here. */
  val MaxTransientBytes: Long = 256L << 20

  /** Rows admitted under the budget at a per-row transient cost. */
  def maxRows(transientBytesPerRow: Long): Long =
    MaxTransientBytes / math.max(1L, transientBytesPerRow)

  /** Graph fast-path edge bound: ~128 B/edge collected. */
  val GraphEdges: Long = maxRows(128)

  /** Union-find edge bound: ~512 B/edge incl. resolve-time map state. */
  val CcEdges: Long = maxRows(512)

  /** Plan-literal float bound: ~8 B/float through analysis. */
  val LiteralFloats: Long = maxRows(8)

  /** Training-sample row cap: ~4 KB/row at ≤1024 float dims. */
  val TrainRows: Int = maxRows(4096).toInt
}
