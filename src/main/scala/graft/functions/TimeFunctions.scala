package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Timestamp helpers that are agnostic to the parquet timestamp flavor.
  *
  * The driver's testdata has shipped event times as TIMESTAMP(NANOS)
  * (read as long), TIMESTAMP (LTZ) and TIMESTAMP_NTZ across rounds.
  * `unix_millis` accepts only TIMESTAMP (LTZ) and fails analysis on
  * NTZ input, so every epoch-millis site goes through [[tsMillis]]
  * instead: the cast interprets an NTZ wall-clock in the session time
  * zone (pinned to UTC by every graft session — Bench/Verify/specs),
  * which matches DuckDB's `epoch_ms` on naive timestamps, and is a
  * no-op on LTZ input. The cast is a codegen'd unary expression: it
  * adds no exchange and stays inside WholeStageCodegen.
  */
object TimeFunctions {

  /** Epoch milliseconds of a timestamp column, NTZ-safe. */
  def tsMillis(c: Column): Column = unix_millis(c.cast(TimestampType))
}
