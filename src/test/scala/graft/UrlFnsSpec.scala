package graft

import graft.functions.UrlFns
import org.apache.spark.sql.functions._

/** F20 URL scalars: field extraction on adversarial shapes — ports,
  * fragments, bare hosts, missing protocols — and the no-match
  * empty-string contract.
  */
class UrlFnsSpec extends SparkSpec {
  import spark.implicits._

  test("F20: fields extract correctly across adversarial URL shapes; no-match yields empty") {
    val cases = Seq(
      ("https://en12.example.com/docs/5?ref=3",
        ("https", "en12.example.com", "/docs/5", "ref=3", "com")),
      ("http://a.b.example.org/",
        ("http", "a.b.example.org", "/", "", "org")),
      ("https://example.net", // bare host, no path
        ("https", "example.net", "", "", "net")),
      ("https://host.io:8080/x/y#frag", // port + fragment
        ("https", "host.io", "/x/y", "", "io")),
      ("ftp+ssh://files.example.co/path", // exotic scheme
        ("ftp+ssh", "files.example.co", "/path", "", "co")),
      ("not a url at all", ("", "", "", "", "")),
      ("//missing.protocol.com/x", ("", "", "", "", "")),
      // a '?' INSIDE the fragment is not a query marker
      ("http://x.example.com/p#sec?b=1",
        ("http", "x.example.com", "/p", "", "com")))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"),
        UrlFns.extract(col("url"), "protocol").as("p"),
        UrlFns.extract(col("url"), "host").as("h"),
        UrlFns.extract(col("url"), "path").as("pa"),
        UrlFns.extract(col("url"), "query").as("q"),
        UrlFns.extract(col("url"), "tld").as("t"))
      .as[(String, String, String, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    for ((url, want) <- cases)
      assert(got(url) === want, url)
  }
}
