package graft.functions

/** One switch for every session memo ([[PlanMemo]] slots) in the
  * engine — the shared chains (suffix rank tables, NB scoring, KN LM,
  * dedup candidate generators, trained k-means/PQ models, top-k
  * rankings, components). Each memo's eviction policy already bounds
  * live storage; this is the explicit "between workloads" hook a
  * long-lived session (notebook, server) calls to free every
  * checkpoint at once — callers declare no live frames derived from
  * the memoized chains remain in use.
  */
object Memos {
  def releaseAll(): Unit = {
    Suffix.releaseShared()
    NaiveBayes.releaseShared()
    LangModel.releaseKnMemos()
    Dedup.releasePairMemos()
    Cluster.releaseComponentsMemo()
    Graph.releaseLabelMemo()
    Bpe.releaseLearnMemo()
    Vec.releaseModelMemo()
    Vec.releaseTopKMemos()
    Vec.releaseResidMemo()
    Quant.releaseModelMemo()
    graft.multimodal.Media.releaseThumbMemo()
  }
}
