package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregate registry of the LLM-pipeline operators (dedup / text /
  * corpus / multimodal / vector / layout+temporal) with their DuckDB
  * oracle SQL. The entry definitions live in the per-family Registry*
  * objects (split so review diffs stay local); this facade preserves the
  * single `entries` surface SparkEntry consumes.
  */
object PipelineRegistry {

  private type QFn = (SparkSession, String) => DataFrame

  def entries: Seq[(String, QFn, Option[String])] =
    (RegistryDedup.entries ++ RegistryText.entries ++ RegistryCorpus.entries ++
      RegistryMultimodal.entries ++ RegistryVector.entries ++
      RegistryLayoutTemporal.entries)
      .map { case (n, f, o) => (n, f: QFn, o) }
}
