package graft

/** One-call lifecycle surface for every per-dataset memo the engine keeps
  * (cached tables, fitted ANN models, shingle/pair frames, function-registry
  * memos). The memos make repeated queries over one dataset cheap, but a
  * long-lived service that cycles through MANY datasets — or stops and
  * recreates sessions — should call [[clearAll]] between datasets so cached
  * frames are unpersisted and stopped sessions become collectable.
  */
object GraftCaches {

  def clearAll(): Unit = {
    core.Tables.clearCache()
    operators.Dedup.clearCaches()
    operators.Multimodal.clearCaches()
    operators.TextAnalysis.clearCaches()
    operators.Similarity.clearCaches()
    operators.Clustering.clearCaches()
    operators.DocClassifier.clearCaches()
    operators.LangClassifier.clearCaches()
    vamana.VamanaOps.clearCaches()
    vamana.VamanaPq.clearCaches()
    functions.NativeVectorFunctions.clearRegistry()
    functions.TextExpressions.clearRegistry()
    functions.MinhashSigs.clearRegistry()
    functions.SimhashSig.clearRegistry()
  }
}
