package graft.queries

/** The full operator inventory exposed to the driver via
  * [[graft.SparkEntry]]. Sub-objects group SURVEY.md §2 families.
  */
object Registry {
  val flagship: OpQuery = Relational.q1_agg

  def all: Seq[OpQuery] =
    Relational.all ++ Scalars.all ++ MergeQueries.all ++ ScaleOps.all ++
      StreamingQueries.all ++ MultimodalQueries.all ++ AsOfQueries.all ++
      ScaleExtras.all ++ Extended.all ++ RangeQueries.all ++ CsvQueries.all ++
      CurationPipeline.all ++ JdbcQueries.all ++ TrainingDataOps.all ++
      Round4Ops.all ++ Round4Ops2.all ++ Round4Ops3.all ++ Round4Ops4.all ++
      Round4Ops5.all ++ Round4Ops6.all ++ Round4Ops7.all ++ Round4Ops8.all ++
      Round4Ops9.all ++ Round4Ops10.all ++ Round4Ops11.all ++ Round4Ops12.all ++ Round4Ops13.all ++ Round4Ops14.all ++ Round4Ops15.all ++ Round4Ops16.all ++ Round4Ops17.all ++ Round4Ops18.all ++ Round4Ops19.all ++ Round4Ops20.all ++ Round4Ops21.all ++ Round4Ops22.all ++ Round4Ops23.all ++ Round4Ops24.all ++ Round4Ops25.all ++ Round4Ops26.all ++ Round4Ops27.all ++ Round4Ops28.all ++ Round4Ops29.all ++ Round4Ops30.all ++ Round4Ops31.all ++ Round4Ops32.all ++ Round4Ops33.all ++ Round4Ops34.all ++ Round4Ops35.all ++ Round4Ops36.all ++ Round4Ops37.all ++ Round4Ops38.all ++ Round4Ops39.all ++ Round4Ops40.all ++ Round4Ops41.all ++ Round4Ops42.all ++ Round4Ops43.all ++ Round4Ops44.all ++ Round4Ops45.all ++ Round4Ops46.all ++ Round4Ops47.all ++ Round4Ops48.all ++ Round4Ops49.all ++ Round4Ops50.all ++ Round4Ops51.all ++ Round4Ops52.all ++ Round4Ops53.all ++ Round4Ops54.all ++ Round4Ops55.all ++ Round4Ops56.all ++ Round4Ops57.all ++ Round4Ops58.all ++ Round4Ops59.all ++ Round4Ops60.all ++ Round4Ops61.all ++ Round4Ops62.all ++ Round4Ops63.all ++ Round4Ops64.all ++ Round4Ops65.all ++ Round4Ops66.all ++ Round4Ops67.all ++ Round4Ops68.all ++ Round4Ops69.all ++ Round4Ops70.all ++ Round4Ops71.all ++ Round4Ops72.all ++ Round4Ops73.all ++ Round4Ops74.all ++ Round4Ops75.all ++ Round4Ops76.all ++ Round4Ops77.all ++ Round4Ops78.all ++ Round4Ops79.all ++ Round4Ops80.all ++ Round4Ops81.all ++ Round4Ops82.all ++ Round4Ops83.all ++ Round4Ops85.all ++ Round4Ops86.all ++ Round4Ops87.all ++ Round4Ops88.all ++ Round4Ops89.all ++ Round4Ops90.all ++ Round4Ops91.all ++ Round4Ops92.all ++ Round4Ops93.all ++ Round4Ops94.all ++ Round4Ops95.all ++ Round4Ops96.all ++ Round4Ops97.all ++ Round4Ops98.all ++ Round4Ops99.all ++ Round4Ops100.all
}
