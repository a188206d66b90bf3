package graft.queries

object TrainingData {
  def queries: Seq[Q] = Seq()
}
