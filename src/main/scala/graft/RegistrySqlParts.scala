package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** SQL fragments (and the registry entry signature) shared by the
  * per-family registry objects: built once so a Spark expression and its
  * oracle twin cannot drift apart silently across families. */
private[graft] object RegistrySqlParts {

  private[graft] type QFn = (SparkSession, String) => DataFrame

  // ---- shared DuckDB fragments ----------------------------------------------

  /** toks CTE: whitespace tokens of lowercased text. */
  private[graft] val toksCte =
    "SELECT doc_id, text, lang, string_split_regex(lower(text), '\\s+') AS toks FROM documents"

  /** shingled CTE body: distinct word-3-gram shingles, docs with >=3 tokens. */
  private[graft] val shingledCte =
    s"""SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
       |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |FROM ($toksCte) WHERE len(toks) >= 3""".stripMargin

  private[graft] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)))"

  private[graft] def l2Sql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(($a[i]::DOUBLE) - ($b[i]::DOUBLE)) * (($a[i]::DOUBLE) - ($b[i]::DOUBLE))))"

  private[graft] val stopwordsList = TextAnalysis.StopwordsEn.map(w => s"'$w'").mkString("[", ",", "]")

}
