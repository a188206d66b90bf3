package graft.queries

object Pipeline {
  def queries: Seq[Q] = Seq()
}
