package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** Normalizes file URIs so the three spellings that appear around
  * row-level deletes compare equal: manifest/log paths ("file:/x"),
  * delete-file paths, and Spark `_metadata.file_path` ("file:///x").
  * Non-file schemes (s3a://, abfss://) pass through untouched — both
  * sides of those comparisons come from the same catalog and agree.
  */
object PathNorm {
  def normUri(c: Column): Column = regexp_replace(c, "^file:/+", "/")
}
