package graft

import org.apache.spark.sql.functions._

import graft.functions.Fns

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("humanBytes matches reference getNumberAndUnitFromBytes semantics") {
    val cases = Seq(
      0L -> "0B", 500L -> "500B", 949L -> "949B",
      950L -> "1.0KB", // promotion on ROUNDED value
      999L -> "1.0KB", 1000L -> "1.0KB", 1500L -> "1.5KB",
      999950L -> "1.0MB", // the boundary the advisor flagged
      999949L -> "1.0MB", 123456789L -> "123.5MB",
      5000000000L -> "5.0GB", 2000000000000000L -> "2.0PB")
    val got = cases.map(_._1).toDF("b")
      .select(Fns.humanBytes($"b")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("safeLong yields null on garbage under ANSI mode") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val got = Seq("123", "x", "", "1.5", "-9").toDF("s")
      .select(Fns.safeLong($"s")).collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(Some(123L), None, None, None, Some(-9L)))
  }

  test("plusDecode: '+' is space, percent-escapes decode, %2B stays plus") {
    val got = Seq("a+b", "a%20b", "sp%2Bplus", "plain").toDF("s")
      .select(Fns.plusDecode($"s")).as[String].collect().toSeq
    assert(got == Seq("a b", "a b", "sp+plus", "plain"))
  }

  test("s3 uri parse") {
    val r = Seq("s3://my-bkt/deep/path/key.bin").toDF("u")
      .select(Fns.s3Bucket($"u"), Fns.s3Key($"u")).as[(String, String)].head()
    assert(r == ("my-bkt", "deep/path/key.bin"))
  }

  test("queueName renders prefix-%03d with 1-based hash-mod routing") {
    val got = Seq(0L, 1L, 15L, 16L).toDF("k")
      .select(Fns.queueName(lit("q"), $"k", 16)).as[String].collect().toSeq
    assert(got == Seq("q-001", "q-002", "q-016", "q-001"))
  }

  test("msgId is md5(endpoint+name+eventType)") {
    val got = Seq(("https://e", "n", "BlobCreated")).toDF("e", "n", "t")
      .select(Fns.msgId($"e", $"n", $"t")).as[String].head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("https://enBlobCreated".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == expect)
  }

  test("flag coercions match TaskExecutor.py:58-64") {
    val r = Seq(("true", "COMPLETED"), ("false", ""), ("TRUE", "x"))
      .toDF("mp", "rs")
      .select(Fns.boolFlag($"mp"), Fns.replicatedFlag($"rs"))
      .as[(Boolean, Int)].collect().toSeq
    assert(r == Seq((true, 1), (false, 0), (true, 1)))
  }
}
