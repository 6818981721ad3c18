package graft

import graft.queries.CoreRelational

/** Central registry of every declared operator check (SURVEY.md §2).
  *
  * Each query suite lives in its own object under graft.queries; this is the
  * single place SparkEntry/Verify/Bench look at, so adding a suite is one
  * line here.
  */
object Queries {
  def all: Seq[QueryDef] =
    CoreRelational.defs ++
      graft.queries.LlmPipeline.defs ++
      graft.queries.TrainingPipeline.defs ++
      graft.queries.ScaleOps.defs ++
      graft.queries.AggExtras.defs ++
      graft.queries.N5Queries.defs ++
      graft.queries.StreamingQueries.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.CorpusOps.defs ++
      graft.queries.CurationOps.defs

  lazy val byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap
}
