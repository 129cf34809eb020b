package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CoreQueries, DocQueries, EmbedQueries, ExportQueries, FacadeQueries, MaintenanceQueries, MessageDedupQueries, PipelineQueries, PointLookupQueries, SearchQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live in graft.queries.*; each entry pairs a DataFrame
  * pipeline with its DuckDB oracle SQL (same column names/aliases on both
  * sides — the driver compare sorts columns by name before hashing).
  */
object SparkEntry {
  private def registry
      : Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    CoreQueries.all ++ DocQueries.all ++ SearchQueries.all ++
      PipelineQueries.all ++ TemporalQueries.all ++ MessageDedupQueries.all ++
      EmbedQueries.all ++ ExportQueries.all ++ MaintenanceQueries.all ++
      FacadeQueries.all ++ PointLookupQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.aggCore(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every entry is
    * DuckDB-oracled — non-oracle-able throughput twins (currently only the
    * xxhash64 simhash signature dump, whose construction is proven by the
    * bit-exact md5 twin `dedup_simhash_md5`) run in the bench only.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.collect { case (k, (fn, Some(_))) => k -> fn }

  /** Bench superset: all oracled queries plus throughput-only witnesses
    * that have no DuckDB-expressible oracle. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, (_, Some(sql))) => k -> sql }
}
