package graft

/** Contract pins for the oracle battery itself — the driver's correctness
  * gate only covers queries that are REGISTERED correctly, so these
  * invariants guard the registration.
  */
class BatterySpec extends SparkSpec {

  test("every query is oracle-checked — no rows-only entries") {
    // r12: q_kmeans (the last rows-only row, four rounds running) gained a
    // DuckDB FP-replay oracle under the dRound6 tolerance pattern
    val rowsOnly = Queries.queries.keySet -- Queries.oracles.keySet
    assert(rowsOnly.isEmpty,
      s"every battery query must have an oracle: $rowsOnly")
  }

  test("battery names are unique and well-formed") {
    val names = Queries.battery.map(_._1)
    assert(names.distinct.length == names.length,
      "duplicate query name would silently drop a battery entry in the Map")
    val bad = names.filterNot(_.matches("q[0-9]?[a-z0-9_]+"))
    assert(bad.isEmpty, s"malformed query names: $bad")
  }

  test("oracle SQL never carries characters the Verify JSON escape misses") {
    // Verify.q escapes ", \, and control chars; anything else below 0x20
    // in a NEW oracle would corrupt oracle_sql.json for the whole round
    Queries.oracles.foreach { case (name, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n' && c != '\t' && c != '\r'),
        s"$name: oracle contains an unexpected control character")
    }
  }
}
