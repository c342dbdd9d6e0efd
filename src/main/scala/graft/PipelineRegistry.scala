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

  /** Family-labelled registry blocks — the bench evicts session-scoped memo
    * caches between families so 200+ queries sharing one JVM can't let one
    * family's resident memos (pair frames, thumbnails, term counts) distort
    * another family's wall-clock charge (the round-12 `embed_dim_cov`
    * 25.6 s-vs-1.7 s-isolated lesson). */
  def families: Seq[(String, Seq[(String, QFn, Option[String])])] = Seq(
    "dedup" -> RegistryDedup.entries.map { case (n, f, o) => (n, f: QFn, o) },
    "text" -> RegistryText.entries.map { case (n, f, o) => (n, f: QFn, o) },
    "corpus" -> RegistryCorpus.entries.map { case (n, f, o) => (n, f: QFn, o) },
    "multimodal" -> RegistryMultimodal.entries.map { case (n, f, o) => (n, f: QFn, o) },
    "vector" -> RegistryVector.entries.map { case (n, f, o) => (n, f: QFn, o) },
    "sparse" -> RegistrySparse.entries.map { case (n, f, o) => (n, f: QFn, o) },
    "layout_temporal" -> RegistryLayoutTemporal.entries.map { case (n, f, o) => (n, f: QFn, o) })

  def entries: Seq[(String, QFn, Option[String])] = families.flatMap(_._2)
}
