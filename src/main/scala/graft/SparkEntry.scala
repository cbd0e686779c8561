package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's public catalog: one named, self-contained
  * DataFrame program per operator in SURVEY.md §2 (plus the LLM-pipeline
  * extensions). `oracleSql` carries the ANSI-SQL equivalent the driver runs
  * in DuckDB over the same parquet for hash-compare; entries are omitted
  * only where the operator is not SQL-expressible (those get a rows-only
  * check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.flagship(spark, "/root/testdata/sf0.001")

  /** The operator-family modules making up the catalog. */
  private val modules: Seq[QueryModule] = Seq(ReadPath, Joins, WritePath, Olap, Events, Dedup, TextAnalysis,
      PipelineOps, Similarity, Multimodal, Scalars, StarSchema, Windows, CatalogOps)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap +
      ("flagship_buyer_home" -> (Flagship.flagship _)) +
      ("flagship_admin_home" -> (Flagship.adminHome _)) +
      ("flagship_worker_home" -> (Flagship.workerHome _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap +
      ("flagship_buyer_home" -> Flagship.flagshipSql) +
      ("flagship_admin_home" -> Flagship.adminHomeSql) +
      ("flagship_worker_home" -> Flagship.workerHomeSql)
}
