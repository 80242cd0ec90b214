package graft

/** Central list of every registered capability (SURVEY.md §2 inventory).
  * Each module contributes its `Seq[Q]`; SparkEntry exposes the union.
  */
object Registry {
  def all: Seq[Q] =
    queries.Relational.all ++ queries.Privacy.all ++ queries.Etl.all ++
      queries.Text.all ++ queries.Embeddings.all ++ queries.Events.all ++
      queries.Ml.all ++ queries.Scale.all ++ queries.Extras.all ++
      queries.Curation.all ++ queries.Corpus.all ++ queries.Graph.all ++
      queries.Search.all ++ queries.Preference.all
}
