package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.transform.BinaryTransforms._

/** Binary/protocol transforms (transforms.go:429-644 semantics). */
class BinaryTransformsSpec extends AnyFunSuite {

  test("parse_uuid: 16 bytes big-endian; other lengths pass through") {
    val b = (0 until 16).map(_.toByte).toArray
    assert(parseUuid(b) == "00010203-0405-0607-0809-0a0b0c0d0e0f")
    assert(parseUuid("abc".getBytes) == "abc")
  }

  test("parse_ms_uuid: first three fields little-endian") {
    val b = (0 until 16).map(_.toByte).toArray
    assert(parseMsUuid(b) == "03020100-0504-0706-0809-0a0b0c0d0e0f")
  }

  test("parse_bit and binary_to_decimal") {
    assert(parseBit(Array[Byte](0)) == "0")
    assert(parseBit(Array[Byte](1)) == "1")
    assert(parseBit("x".getBytes) == "x")
    assert(binaryToDecimal(Array[Byte](1, 0)) == "256")
    assert(binaryToDecimal(Array[Byte](-1, -1, -1, -1, -1, -1, -1, -1)) ==
      "18446744073709551615") // unsigned 64-bit max
    assert(binaryToDecimal("42".getBytes) == "42") // printable → passthrough
  }

  test("parse_fix: delimiter auto-detect, tag naming, sorted keys") {
    val pipe = "8=FIX.4.2|35=D|55=MSFT|44=23.5|99999=x"
    assert(parseFix(pipe) ==
      """{"99999":"x","begin_string":"FIX.4.2","msg_type":"D","price":"23.5","symbol":"MSFT"}""")
    val soh = "8=FIX.4.2\u000135=D\u000155=IBM"
    assert(parseFix(soh) ==
      """{"begin_string":"FIX.4.2","msg_type":"D","symbol":"IBM"}""")
  }

  test("charset decode: latin1, windows1252, utf16, bom strip") {
    assert(decodeCharset(Array[Byte](0xe9.toByte), "latin1") == "é")
    assert(decodeCharset(Array[Byte](0x93.toByte), "windows1252") == "“")
    assert(decodeCharset("x".getBytes("UTF-16"), "utf16") == "x")
    assert(decodeCharset(
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "hi".getBytes,
      "utf8_bom") == "hi")
    assert(new String(encodeCharset("é", "latin1"),
      java.nio.charset.StandardCharsets.ISO_8859_1) == "é")
  }
}
