package graft.queries

object Temporal {
  def queries: Seq[Q] = Seq()
}
