package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric helpers. */
object Nums {

  /** Round half-up to 6 decimals via an explicit floor — identical semantics
    * in every engine (Spark `round` is HALF_UP, DuckDB rounds doubles
    * half-even; on exact rational ties like 0.5203125 they disagree). Values
    * here are non-negative scores/ratios, so half-up == half-away.
    */
  def round6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** The same expression in DuckDB SQL, for oracle parity. */
  def dRound6(e: String): String = s"floor(($e) * 1000000 + 0.5) / 1000000"
}
