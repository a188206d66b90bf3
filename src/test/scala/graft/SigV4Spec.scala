package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Auth

/** AWS Signature Version 4 against the documented AWS example vectors
  * (AWS General Reference, "Signature Version 4 signing process" — the
  * GET iam ListUsers example with AKIDEXAMPLE credentials at
  * 20150830T123600Z). The reference delegates to the SDK signer
  * (auth.go:742-815); these vectors pin our from-spec implementation to
  * the same outputs the SDK produces.
  */
class SigV4Spec extends AnyFunSuite {

  private val secret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val conf = Auth.SigV4Config(
    service = "iam", region = "us-east-1",
    accessKeyId = "AKIDEXAMPLE", secretAccessKey = secret)
  private def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
  private val emptySha =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  test("derived signing key matches the documented chain") {
    assert(hex(Auth.sigV4SigningKey(secret, "20150830", "us-east-1", "iam"))
      == "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("canonical request matches the documented layout") {
    val cr = Auth.sigV4CanonicalRequest("GET", "/",
      Map("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      Map(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      emptySha)
    assert(cr ==
      s"""GET
         |/
         |Action=ListUsers&Version=2010-05-08
         |content-type:application/x-www-form-urlencoded; charset=utf-8
         |host:iam.amazonaws.com
         |x-amz-date:20150830T123600Z
         |
         |content-type;host;x-amz-date
         |$emptySha""".stripMargin)
  }

  test("full signature matches the documented example") {
    val (sig, signedHeaders) = Auth.sigV4Signature(conf, "GET",
      "iam.amazonaws.com", "/",
      Map("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      Map("content-type" ->
        "application/x-www-form-urlencoded; charset=utf-8"),
      emptySha, "20150830T123600Z")
    assert(signedHeaders == "content-type;host;x-amz-date")
    assert(sig ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("uri encoding: AWS variant (+→%20, *→%2A, ~ kept, / optional)") {
    assert(Auth.awsUriEncode("a b*c~d/e") == "a%20b%2Ac~d%2Fe")
    assert(Auth.awsUriEncode("a/b", encodeSlash = false) == "a/b")
  }

  test("query canonicalization sorts by encoded key") {
    assert(Auth.sigV4CanonicalQuery(Map("b" -> "2", "A" -> "sp ace"))
      == "A=sp%20ace&b=2")
  }

  test("RequestAuth emits Authorization with scope + session token header") {
    val c2 = conf.copy(sessionToken = Some("TOK"),
      clock = () => java.time.Instant.parse("2015-08-30T12:36:00Z"))
    val h = Auth.sigV4(c2).headers("GET", "https://iam.amazonaws.com/",
      Map("Action" -> "ListUsers"))
    assert(h("x-amz-date") == "20150830T123600Z")
    assert(h("x-amz-security-token") == "TOK")
    val auth = h("Authorization")
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/" +
      "20150830/us-east-1/iam/aws4_request"))
    assert(auth.contains(
      "SignedHeaders=host;x-amz-date;x-amz-security-token"))
  }
}
