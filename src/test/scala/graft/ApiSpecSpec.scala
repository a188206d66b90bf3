package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{ApiExtractor, ApiSpec}

/** API framework above the pagination loop: DAG, retry, processors, auth,
  * iteration (spec.go call-site semantics).
  */
class ApiSpecSpec extends AnyFunSuite {

  private def ep(name: String, url: String = "stub://x") =
    ApiExtractor.EndpointSpec(name = name, url = url)

  test("topological levels respect depends_on; cycles rejected") {
    val eps = Seq(
      ApiSpec.Endpoint(ep("c"), dependsOn = Seq("a", "b")),
      ApiSpec.Endpoint(ep("a")),
      ApiSpec.Endpoint(ep("b"), dependsOn = Seq("a")))
    val levels = ApiSpec.topoLevels(eps).map(_.map(_.spec.name))
    assert(levels == Seq(Seq("a"), Seq("b"), Seq("c")))
    intercept[IllegalArgumentException] {
      ApiSpec.topoLevels(Seq(
        ApiSpec.Endpoint(ep("x"), dependsOn = Seq("y")),
        ApiSpec.Endpoint(ep("y"), dependsOn = Seq("x"))))
    }
  }

  test("retry: transient failures retried with backoff, then surfaced") {
    val calls = new AtomicInteger(0)
    val flaky: ApiExtractor.Transport = (_, _) => {
      if (calls.incrementAndGet() < 3) throw new RuntimeException("boom")
      """{"data":[{"id":1}],"next":null}"""
    }
    val t = ApiSpec.withRetry(flaky, ApiSpec.RetryPolicy(maxAttempts = 3, backoffMs = 1))
    assert(t("u", Map.empty).contains("\"id\":1"))
    assert(calls.get() == 3)

    val alwaysDown: ApiExtractor.Transport = (_, _) => throw new RuntimeException("down")
    intercept[RuntimeException] {
      ApiSpec.withRetry(alwaysDown, ApiSpec.RetryPolicy(maxAttempts = 2, backoffMs = 1))("u", Map.empty)
    }
  }

  test("processors fold into state: max/min/first/last/collect/count") {
    val recs = Seq("""{"id":3,"name":"c"}""", """{"id":1,"name":"a"}""",
      """{"id":2,"name":"b"}""")
    val state = scala.collection.mutable.Map[String, Any]()
    ApiSpec.applyProcessors(recs, Seq(
      ApiSpec.Processor("id", "max", "max_id"),
      ApiSpec.Processor("id", "min", "min_id"),
      ApiSpec.Processor("name", "first", "first_name"),
      ApiSpec.Processor("name", "last", "last_name"),
      ApiSpec.Processor("id", "collect", "ids"),
      ApiSpec.Processor("id", "count", "n")), state)
    assert(state("max_id") == 3L && state("min_id") == 1L)
    assert(state("first_name") == "c" && state("last_name") == "b")
    assert(state("ids") == Seq(3L, 1L, 2L) && state("n") == 3L)
  }

  test("auth headers: bearer, basic, api-key") {
    assert(ApiSpec.authHeaders("bearer", Map("token" -> "T")) ==
      Map("Authorization" -> "Bearer T"))
    assert(ApiSpec.authHeaders("basic",
      Map("username" -> "u", "password" -> "p"))("Authorization") ==
      "Basic " + java.util.Base64.getEncoder.encodeToString("u:p".getBytes))
    assert(ApiSpec.authHeaders("api-key", Map("key" -> "K")) ==
      Map("X-API-Key" -> "K"))
  }

  test("DAG run: producer state feeds dependent iteration endpoint") {
    // users lists ids 0..4; details/{value} is fetched once per id
    val transport: ApiExtractor.Transport = (url, params) =>
      if (url == "stub://users") {
        val recs = (0 until 5).map(i => s"""{"id":$i}""").mkString(",")
        s"""{"data":[$recs],"next":null}"""
      } else {
        val id = url.stripPrefix("stub://details/").toInt
        s"""{"data":[{"user_id":$id,"score":${id * 10}}],"next":null}"""
      }
    val out = ApiSpec.run(Seq(
      ApiSpec.Endpoint(ep("users", "stub://users"),
        processors = Seq(ApiSpec.Processor("id", "collect", "user_ids"))),
      ApiSpec.Endpoint(ep("details", "stub://details/{value}"),
        dependsOn = Seq("users"), iterateOver = Some("user_ids"))),
      transport)
    assert(out("users").size == 5)
    assert(out("details").map(r => r.contains("score")).forall(identity))
    assert(out("details").size == 5)
  }
}
