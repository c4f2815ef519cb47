package graft.queries

// Temporary placeholders — each becomes a real group as SURVEY §2 fills in.
object SimilarityOps extends QueryGroup { override val queries: Seq[QueryDef] = Seq.empty }
