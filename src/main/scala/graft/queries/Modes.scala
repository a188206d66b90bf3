package graft.queries

object Modes {
  def queries: Seq[Q] = Seq()
}
