package graft.transform

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's named row-transform registry
  * (core/dbio/iop/transforms.go:52-89) re-expressed as `Column → Column`
  * functions. Wherever Spark has a codegen'd built-in we use it; only
  * accent-stripping and non-printable-replacement need Scala UDFs (they stay
  * off the hot path — the common transforms are all whole-stage codegen).
  */
object Transforms {

  import graft.functions.expressions.StringClean

  /** name → implementation; mirrors transforms.go registry keys. */
  val registry: Map[String, Column => Column] = Map(
    "upper" -> (c => upper(c)),
    "lower" -> (c => lower(c)),
    "trim_space" -> (c => trim(c)),
    "hash_md5" -> (c => md5(c.cast("string"))),
    "hash_sha256" -> (c => sha2(c.cast("string"), 256)),
    "hash_sha512" -> (c => sha2(c.cast("string"), 512)),
    // native codegen'd Catalyst expressions (no UDF boundary)
    "replace_accents" -> (c => StringClean.strip_accents(c)),
    "replace_non_printable" -> (c => StringClean.strip_non_printable(c)),
    "replace_0x00" -> (c => regexp_replace(c, "\u0000", "")),
    "binary_to_hex" -> (c => hex(c)),
    "length" -> (c => length(c)),
    "parse_uuid" -> (c => lower(trim(c))),
    "duckdb_list_to_text" -> (c => c.cast("string")),
    // binary/protocol transforms (BinaryTransforms; scalar UDFs by nature)
    "parse_uuid_bin" -> (c => BinaryTransforms.parse_uuid_bin(c)),
    "parse_ms_uuid" -> (c => BinaryTransforms.parse_ms_uuid(c)),
    "parse_bit" -> (c => BinaryTransforms.parse_bit(c)),
    "binary_to_decimal" -> (c => BinaryTransforms.binary_to_decimal(c)),
    "parse_fix" -> (c => BinaryTransforms.parse_fix(c)),
    // charset decode/encode — the reference's full set (transforms.go:52-89)
    "decode_latin1" -> (c => BinaryTransforms.decode(c, "latin1")),
    "decode_latin5" -> (c => BinaryTransforms.decode(c, "latin5")),
    "decode_latin9" -> (c => BinaryTransforms.decode(c, "latin9")),
    "decode_utf8" -> (c => BinaryTransforms.decode(c, "utf8")),
    "decode_utf8_bom" -> (c => BinaryTransforms.decode(c, "utf8_bom")),
    "decode_utf16" -> (c => BinaryTransforms.decode(c, "utf16")),
    "decode_windows1250" -> (c => BinaryTransforms.decode(c, "windows1250")),
    "decode_windows1252" -> (c => BinaryTransforms.decode(c, "windows1252")),
    "encode_latin1" -> (c => BinaryTransforms.encode(c, "latin1")),
    "encode_latin5" -> (c => BinaryTransforms.encode(c, "latin5")),
    "encode_latin9" -> (c => BinaryTransforms.encode(c, "latin9")),
    "encode_utf8" -> (c => BinaryTransforms.encode(c, "utf8")),
    "encode_utf8_bom" -> (c => BinaryTransforms.encode(c, "utf8_bom")),
    "encode_utf16" -> (c => BinaryTransforms.encode(c, "utf16")),
    "encode_windows1250" -> (c => BinaryTransforms.encode(c, "windows1250")),
    "encode_windows1252" -> (c => BinaryTransforms.encode(c, "windows1252"))
  )

  def apply(name: String, c: Column): Column =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown transform: $name"))(c)
}
