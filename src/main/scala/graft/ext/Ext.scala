package graft.ext

import graft.queries.Q

/** Extension query registry (LLM-data-pipeline operators): dedup,
  * similarity search, text analysis, multimodal plumbing. Populated
  * incrementally; see Dedup / TextAnalysis / Similarity / Multimodal. */
object Ext {
  def queries: Seq[Q] = Seq.empty
}
