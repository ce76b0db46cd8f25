package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the full reference pipeline
    * end-to-end (ingest → extract → infer → evolve → validate → store →
    * latest-N browse). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q_corpus_roundtrip")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2 (see Queries). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
