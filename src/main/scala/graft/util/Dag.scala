package graft.util

import scala.collection.mutable

/** Shared scheduling/templating primitives for the two DAG executors
  * (API endpoint DAG, replication stream DAG) — one Kahn level sort and
  * one `{state.k}` substitution fold instead of a copy in each.
  */
object Dag {

  /** Kahn topological sort into parallel levels; cycles and unknown
    * dependencies are errors. `label` names the dependency kind in
    * messages ("dependency", "depends_on").
    */
  def topoLevels[T](items: Seq[T], name: T => String, deps: T => Seq[String],
      label: String = "dependency"): Seq[Seq[T]] = {
    val byName = items.map(i => name(i) -> i).toMap
    items.foreach(i => deps(i).foreach { d =>
      require(byName.contains(d), s"unknown $label $d of ${name(i)}")
    })
    val done = mutable.Set[String]()
    val remaining = mutable.LinkedHashSet[String](items.map(name): _*)
    val levels = mutable.ArrayBuffer[Seq[T]]()
    while (remaining.nonEmpty) {
      val ready = remaining.toSeq
        .filter(n => deps(byName(n)).forall(done.contains))
      require(ready.nonEmpty, s"$label cycle among: ${remaining.mkString(", ")}")
      levels += ready.map(byName)
      ready.foreach { n => done += n; remaining -= n }
    }
    levels.toSeq
  }

  /** Replace every `{state.<k>}` occurrence with the state value. */
  def renderState(tpl: String, state: collection.Map[String, Any]): String =
    state.foldLeft(tpl) { case (acc, (k, v)) =>
      acc.replace(s"{state.$k}", v.toString)
    }
}
