package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.ColumnModifiers

/** columns: modifier DSL (reference column_modifiers.go:64-153). */
class ColumnModifiersSpec extends AnyFunSuite {

  test("plain type, no modifiers") {
    val p = ColumnModifiers.parse("c1", "bigint")
    assert(p.field.dataType == LongType && p.field.nullable)
  }

  test("modifiers land in metadata; pk implies not null") {
    val p = ColumnModifiers.parse("ck",
      "bigint not_null primary_key description('customer key') index(ix_ck)")
    assert(p.field.dataType == LongType)
    assert(!p.field.nullable)
    assert(p.field.metadata.getBoolean("primary_key"))
    assert(p.field.metadata.getString("description") == "customer key")
    assert(p.indexes == Seq("ix_ck"))
  }

  test("decimal precision/scale payload; parens kept in one token") {
    val p = ColumnModifiers.parse("amt", "decimal(18,2) not_null")
    assert(p.field.dataType == DecimalType(18, 2) && !p.field.nullable)
  }

  test("description payload may contain spaces") {
    val p = ColumnModifiers.parse("c", "string description('two words here')")
    assert(p.field.metadata.getString("description") == "two words here")
  }

  test("conflicting and unknown modifiers rejected") {
    intercept[IllegalArgumentException] {
      ColumnModifiers.parse("c", "bigint not_null nullable")
    }
    intercept[IllegalArgumentException] {
      ColumnModifiers.parse("c", "bigint sparkle")
    }
    intercept[IllegalArgumentException] {
      ColumnModifiers.parse("c", "bigint not_null(yes)")
    }
  }

  test("ddl renders NOT NULL, UNIQUE, PRIMARY KEY") {
    val schema = ColumnModifiers.parseAll(Seq(
      "id" -> "bigint not_null primary_key",
      "email" -> "string unique",
      "note" -> "text"))
    val ddl = ColumnModifiers.ddl(schema, "t")
    assert(ddl.contains("id BIGINT NOT NULL"))
    assert(ddl.contains("email STRING UNIQUE"))
    assert(ddl.contains("PRIMARY KEY (id)"))
  }
}
