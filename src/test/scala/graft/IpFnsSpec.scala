package graft

import graft.functions.IpFns
import org.apache.spark.sql.functions._

/** F21 IPv4 scalars: round-trip identity on the full value lattice,
  * malformed-input nulls, and CIDR boundary membership.
  */
class IpFnsSpec extends SparkSpec {
  import spark.implicits._

  test("F21: string->num->string round-trips across octet corners; malformed inputs null") {
    val good = Seq("0.0.0.0", "255.255.255.255", "10.0.0.1",
      "192.168.1.255", "1.2.3.4", "127.0.0.1")
    val bad = Seq("256.1.2.3", "1.2.3", "1.2.3.4.5", "a.b.c.d",
      "1..2.3", "", "999.0.0.1", "-1.2.3.4")
    val got = (good ++ bad).toDF("ip")
      .select(col("ip"), IpFns.ipv4ToNum(col("ip")).as("n"))
      .withColumn("rt", IpFns.numToIpv4(col("n")))
      .as[(String, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (ip <- good) {
      assert(got(ip)._1.nonEmpty, ip)
      assert(got(ip)._2 === Some(ip), ip)
    }
    for (ip <- bad) assert(got(ip) === ((None, None)), ip)
    // known values
    assert(got("0.0.0.0")._1 === Some(0L))
    assert(got("255.255.255.255")._1 === Some(4294967295L))
    assert(got("1.2.3.4")._1 === Some(16909060L))
  }

  test("F21: CIDR membership hits exact block boundaries") {
    val ips = Seq("10.0.0.0", "10.255.255.255", "11.0.0.0", "9.255.255.255",
      "10.127.255.255", "10.128.0.0", "192.168.1.7")
    val got = ips.toDF("ip")
      .select(col("ip"),
        IpFns.inCidr(IpFns.ipv4ToNum(col("ip")), "10.0.0.0/8").as("p8"),
        IpFns.inCidr(IpFns.ipv4ToNum(col("ip")), "10.128.0.0/9").as("p9"),
        IpFns.inCidr(IpFns.ipv4ToNum(col("ip")), "192.168.1.0/24").as("p24"),
        IpFns.inCidr(IpFns.ipv4ToNum(col("ip")), "0.0.0.0/0").as("all"))
      .as[(String, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("10.0.0.0") === ((true, false, false, true)))
    assert(got("10.255.255.255") === ((true, true, false, true)))
    assert(got("11.0.0.0") === ((false, false, false, true)))
    assert(got("9.255.255.255") === ((false, false, false, true)))
    assert(got("10.127.255.255") === ((true, false, false, true)))
    assert(got("10.128.0.0") === ((true, true, false, true)))
    assert(got("192.168.1.7") === ((false, false, true, true)))
  }
}
