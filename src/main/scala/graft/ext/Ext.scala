package graft.ext

import graft.queries.Q

/** Extension query registry (LLM-data-pipeline operators): dedup,
  * similarity search, text analysis, multimodal plumbing. */
object Ext {
  def queries: Seq[Q] =
    Dedup.queries ++ TextAnalysis.queries ++ TextAnalysis2.queries ++
      Similarity.queries ++ Multimodal.queries ++ Pipeline.queries
}
