package graft

import graft.functions.UrlFunctions
import graft.operators.Redaction
import org.apache.spark.sql.functions._

/** Edge-case behavior of the PII redaction and URL canonicalization
  * operators (the oracle queries cover the bulk path; these pin the corners).
  */
class RedactionUrlSpec extends SparkSpec {

  private def redactOne(s: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val r = Redaction.redact(Seq((1L, s)).toDF("id", "text"), "text", "id")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("redaction masks all three PII types in one text") {
    val (e, p, i, t) = redactOne(
      "reach a@b.com or c.d+x@sub.example.org, call 555-123-4567, host 192.168.0.1 ok")
    assert((e, p, i) == (2L, 1L, 1L))
    assert(t == "reach <EMAIL> or <EMAIL>, call <PHONE>, host <IP> ok")
  }

  test("email precedence: dotted-quad inside an address is not double-masked") {
    val (e, _, i, t) = redactOne("admin@10.0.0.1.example.com only")
    assert(e == 1L)
    assert(t == "<EMAIL> only")
    assert(i == 1L) // raw-text count still sees the quad; the mask does not
  }

  test("phone requires exact 3-3-4 shape with boundaries") {
    val (_, p, _, t) = redactOne("5551-123-4567 and 555-123-45678 and 555-123-4567")
    assert(p == 1L)
    assert(t.endsWith("<PHONE>"))
    assert(t.contains("5551-123-4567"))
  }

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(UrlFunctions.canonicalizeUrl(col("u"))).collect().head.getString(0)
  }

  test("url: case, www, default port, fragment, trailing slash") {
    assert(canon("HTTPS://WWW.Host.COM:443/A/B/#frag") == "https://host.com/A/B")
    assert(canon("http://host.com:80/") == "http://host.com")
    assert(canon("http://host.com:8080/x/") == "http://host.com:8080/x")
  }

  test("url: path/query case is preserved, tracking params dropped") {
    assert(canon("https://h.com/Path?utm_source=x&ID=7&gclid=z") == "https://h.com/Path?ID=7")
    assert(canon("https://h.com/p?utm_campaign=only") == "https://h.com/p")
    assert(canon("https://h.com/p?a=1&utm_medium=m&b=2") == "https://h.com/p?a=1&b=2")
  }

  private def host(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(UrlFunctions.hostOf(col("u"))).collect().head.getString(0)
  }

  test("hostOf: scheme, port, path, query, fragment and www all stripped") {
    assert(host("HTTPS://WWW.Host.COM:443/A/B?q=1#f") == "host.com")
    assert(host("http://sub.example.org/x") == "sub.example.org")
    assert(host("ftp+ssh://Weird.Scheme.net:21") == "weird.scheme.net")
    assert(host("example.com/path") == "example.com")
    assert(host("www.example.com") == "example.com")
  }

  test("url: idempotent on already-canonical input") {
    val u = "https://host.com/a/b?x=1&y=2"
    assert(canon(u) == u)
    assert(canon(canon("HTTP://WWW.HOST.com:80/a/?utm_source=s#f")) ==
      canon("HTTP://WWW.HOST.com:80/a/?utm_source=s#f"))
  }
}
