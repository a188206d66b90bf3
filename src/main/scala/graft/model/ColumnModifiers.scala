package graft.model

import org.apache.spark.sql.types._

/** The `columns:` YAML modifier DSL — a declared type string may carry DDL
  * modifiers after the type, e.g.
  * `"bigint not_null primary_key description('customer key') index(ix_ck)"`.
  *
  * Port of ParseModifiers (reference column_modifiers.go:64-153): the first
  * whitespace token (parens kept balanced) is the type, the rest are
  * modifiers; not_null/nullable conflict is an error; description takes a
  * quoted payload; index/unique_index may name the index. Everything lands
  * in `StructField.metadata`, Spark's analogue of the reference's ColMeta
  * map, and `ddl()` renders the CREATE TABLE column lines from it.
  */
object ColumnModifiers {

  final case class Parsed(field: StructField, indexes: Seq[String])

  private val sparkTypes: Map[String, DataType] = Map(
    "smallint" -> ShortType, "integer" -> IntegerType, "int" -> IntegerType,
    "bigint" -> LongType, "float" -> DoubleType, "double" -> DoubleType,
    "bool" -> BooleanType, "boolean" -> BooleanType, "string" -> StringType,
    "text" -> StringType, "uuid" -> StringType, "json" -> StringType,
    "binary" -> BinaryType, "date" -> DateType,
    "datetime" -> TimestampNTZType, "timestamp" -> TimestampNTZType,
    "timestampz" -> TimestampType)

  /** Whitespace tokenizer that keeps balanced parens inside one token. */
  private[model] def tokenize(raw: String): Seq[String] = {
    val out = collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    raw.trim.foreach {
      case c @ ('(') => depth += 1; cur += c
      case c @ (')') => depth -= 1; cur += c
      case c if c.isWhitespace && depth == 0 =>
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
      case c => cur += c
    }
    if (depth != 0) throw new IllegalArgumentException(s"unbalanced parens: $raw")
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def splitModifier(tok: String): (String, Option[String]) = {
    val i = tok.indexOf('(')
    if (i < 0) (tok, None)
    else {
      require(tok.endsWith(")"), s"malformed modifier: $tok")
      (tok.substring(0, i), Some(tok.substring(i + 1, tok.length - 1)))
    }
  }

  private def stringPayload(p: String): String = {
    val t = p.trim
    if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("\"") && t.endsWith("\""))) t.substring(1, t.length - 1)
    else t
  }

  private def dataTypeOf(typeTok: String): DataType = {
    val (name, payload) = splitModifier(typeTok)
    name.toLowerCase match {
      case "decimal" | "numeric" =>
        payload match {
          case Some(ps) =>
            val parts = ps.split(",").map(_.trim.toInt)
            DecimalType(parts(0), if (parts.length > 1) parts(1) else 0)
          case None => DecimalType(38, 9)
        }
      case n => sparkTypes.getOrElse(n,
        throw new IllegalArgumentException(s"unknown type $n"))
    }
  }

  /** Parse one declared column: `name` + raw type-with-modifiers string. */
  def parse(name: String, raw: String): Parsed = {
    val tokens = tokenize(raw)
    require(tokens.nonEmpty, s"empty type for column $name")
    val dt = dataTypeOf(tokens.head)
    var nullable = true
    var sawNotNull = false
    var sawNullable = false
    val meta = new MetadataBuilder()
    val indexes = collection.mutable.ArrayBuffer[String]()
    tokens.tail.foreach { tok =>
      val (mod, payload) = splitModifier(tok)
      mod.toLowerCase match {
        case "not_null" =>
          require(payload.isEmpty, s"$name: not_null takes no arguments")
          sawNotNull = true; nullable = false
        case "nullable" =>
          require(payload.isEmpty, s"$name: nullable takes no arguments")
          sawNullable = true
        case "primary_key" =>
          require(payload.isEmpty, s"$name: primary_key takes no arguments")
          meta.putBoolean("primary_key", true); nullable = false
        case "unique" =>
          require(payload.isEmpty, s"$name: unique takes no arguments")
          meta.putBoolean("unique", true)
        case "description" =>
          meta.putString("description", stringPayload(
            payload.getOrElse(throw new IllegalArgumentException(
              s"$name: description requires a value"))))
        case "index" =>
          indexes += payload.map(stringPayload).getOrElse(s"idx_$name")
        case "unique_index" =>
          indexes += payload.map(stringPayload).getOrElse(s"uidx_$name")
          meta.putBoolean("unique", true)
        // the full KeyType enum (reference datatype.go:87-99): carried in
        // field metadata as `<kind>_key`, rendered by the dialect's
        // create-table key clauses (NativeTypes.createTableKeyed)
        case kt @ ("aggregate_key" | "cluster_key" | "distribution_key" |
            "duplicate_key" | "hash_key" | "index_key" | "partition_key" |
            "sort_key" | "unique_key" | "update_key") =>
          require(payload.isEmpty, s"$name: $kt takes no arguments")
          meta.putBoolean(kt, true)
        case "identity" =>
          // identity / identity(seed,increment) — schema-migration carries
          // seed+increment ONLY for columns flagged identity (the reference
          // fix behind suite.cli id=189: seed/inc must never attach to
          // non-identity columns)
          val (seed, inc) = payload.map { p =>
            val parts = p.split(',').map(_.trim)
            require(parts.length == 2, s"$name: identity(seed,increment)")
            (parts(0).toLong, parts(1).toLong)
          }.getOrElse((1L, 1L))
          meta.putLong("identity_seed", seed)
          meta.putLong("identity_increment", inc)
        case other =>
          throw new IllegalArgumentException(s"$name: unknown modifier $other")
      }
    }
    require(!(sawNotNull && sawNullable),
      s"$name: conflicting modifiers not_null and nullable")
    if (indexes.nonEmpty) meta.putStringArray("indexes", indexes.toArray)
    Parsed(StructField(name, dt, nullable, meta.build()), indexes.toSeq)
  }

  /** Parse a declared `columns:` map (insertion-ordered) into a schema. */
  def parseAll(cols: Seq[(String, String)]): StructType =
    StructType(cols.map { case (n, raw) => parse(n, raw).field })

  /** Render ANSI CREATE TABLE column DDL from a (possibly parsed) schema. */
  def ddl(schema: StructType, tableName: String): String = {
    val lines = schema.fields.map { f =>
      val base = s"  ${f.name} ${f.dataType.sql}"
      val nn = if (!f.nullable) " NOT NULL" else ""
      val uq = if (f.metadata.contains("unique") &&
        f.metadata.getBoolean("unique")) " UNIQUE" else ""
      base + nn + uq
    }
    val pks = schema.fields.filter(f =>
      f.metadata.contains("primary_key") && f.metadata.getBoolean("primary_key"))
      .map(_.name)
    val pkLine = if (pks.nonEmpty) Seq(s"  PRIMARY KEY (${pks.mkString(", ")})")
      else Nil
    s"CREATE TABLE $tableName (\n${(lines ++ pkLine).mkString(",\n")}\n)"
  }
}
