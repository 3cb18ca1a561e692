package graft

import org.apache.spark.sql.functions._

/** Regressions pinned from the round-1 review:
  *  - calculator round(x, n) silently dropped n
  *  - Dedup.exact relied on Spark's plan-id disambiguation of a self-join
  *  - boolean filter `flag:garbage` matched all false rows
  *  - grok group indices shifted by literal '(' inside character classes
  *  - preprocessor "hmac" was sha256(key||msg), not HMAC-SHA256
  */
class RegressionSpec extends SparkSpec {

  test("calculator round(x, n) honors the digits argument") {
    val s = spark
    import s.implicits._
    val df = Seq(1.267, 2.345).toDF("x")
    val out = graft.operators.Calculator
      .calculator(df, "round(${x}, 2)", "r")
      .select("r").collect().map(_.getDouble(0)).sorted
    assert(out.toSeq == Seq(1.27, 2.35))
    // non-literal digits must be rejected, not silently zeroed
    intercept[IllegalArgumentException] {
      graft.operators.Calculator.compile("round(${x}, ${x})", df.schema)
    }
  }

  test("Dedup.exact keeps first row per hash with explicit join aliases") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "text")
    val out = graft.ml.Dedup.exact(df, "text", "id")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("boolean field filter matches only true/false strings") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", true), ("y", false)).toDF("k", "flag")
    def count(f: String): Long =
      df.filter(graft.filter.FilterCompiler.predicate(f, df.schema)).count()
    assert(count("flag:true") == 1)
    assert(count("flag:TRUE") == 1)
    assert(count("flag:false") == 1)
    assert(count("flag:garbage") == 0) // used to match every false row
  }

  test("numeric range filters don't match string or boolean fields") {
    val s = spark
    import s.implicits._
    val df = Seq(("5", true, 5L)).toDF("s", "b", "n")
    def count(f: String): Long =
      df.filter(graft.filter.FilterCompiler.predicate(f, df.schema)).count()
    assert(count("n:[1 TO 10]") == 1)
    assert(count("s:[1 TO 10]") == 0) // reference requires int-typed values
    assert(count("b:[0 TO 1]") == 0)  // bools excluded
  }

  test("grok capture after a char-class '(' pattern extracts the right group") {
    val s = spark
    import s.implicits._
    // URIPATH's body contains literal '(' inside [...]; a naive '(' count
    // would shift the status group's index
    val df = Seq("GET /a(b)/c 200").toDF("msg")
    val out = graft.operators.PatternOps.grokker(df, "msg",
      Seq("%{WORD:verb} %{URIPATH:path} %{INT:status}"))
    val r = out.select("verb", "path", "status").head()
    assert(r.getString(0) == "GET")
    assert(r.getString(1) == "/a(b)/c")
    assert(r.getString(2) == "200")
  }

  test("preprocessor hmac matches javax.crypto HMAC-SHA256 and zlib round-trips") {
    val s = spark
    import s.implicits._
    val df = Seq(("alice", 1L)).toDF("user", "n")
    val out = graft.pipeline.Preprocessor.hmac(df, "secret-key", "hm")
      .select("hm.hmac", "hm.compressed_base64").head()

    val rawJson = """{"user":"alice","n":1}"""
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      "secret-key".getBytes("UTF-8"), "HmacSHA256"))
    val expected = mac.doFinal(rawJson.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.getString(0) == expected)

    // compressed_base64 must be a real zlib stream of the raw event
    val compressed = java.util.Base64.getDecoder.decode(out.getString(1))
    val inf = new java.util.zip.Inflater()
    inf.setInput(compressed)
    val buf = new Array[Byte](1024)
    val n = inf.inflate(buf)
    inf.end()
    assert(new String(buf, 0, n, "UTF-8") == rawJson)
  }

  test("hmacSha256 long keys are pre-hashed per RFC 2104") {
    val s = spark
    import s.implicits._
    val longKey = "k" * 100
    val df = Seq("payload").toDF("v")
    val got = df.select(graft.pipeline.Preprocessor
      .hmacSha256(longKey, encode(col("v"), "utf-8")).as("m")).head().getString(0)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(longKey.getBytes("UTF-8"), "HmacSHA256"))
    val expected = mac.doFinal("payload".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == expected)
  }
}
