package graft.queries

/** All declared queries, one per implemented operator family
  * (SURVEY.md §2 inventory + §7.5 extensions). */
object Registry {
  def all: Seq[Q] =
    RelationalQueries.all ++ WindowQueries.all ++ PipelineQueries.all ++
      StatQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      EventQueries.all ++ ScalarQueries.all ++ AdvancedJoinQueries.all ++
      CorpusQueries.all ++ CurationQueries.all ++ ClassifyQueries.all ++
      GraphQueries.all ++ ProfileQueries.all ++ SequenceQueries.all ++
      LakehouseQueries.all ++ AuditQueries.all ++ RankQueries.all ++
      SurvivalQueries.all ++ SpectralQueries.all
  // (RankQueries/SurvivalQueries/SpectralQueries are the round-14 waves;
  //  q_l_diversity, q_mrl_recall et al. live in their domain files)
  // (Graph/Profile/Sequence/Lakehouse/AuditQueries are the round-10
  // additions; RankQueries the round-14 rank/robust-statistics wave)

  def queries = all.map(q => q.name -> q.build).toMap
  def oracleSql = all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
