package graft.operators

import graft.SparkSpec
import graft.fields.FieldOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Golden-triple style operator tests (reference pattern:
  * tests/unit/processor/<name>/test_<name>.py — rule, input, expected).
  */
class OperatorSpec extends SparkSpec {

  private def oneRow(json: String, schema: String) = {
    val s = spark
    import s.implicits._
    Seq(json).toDF("j").select(from_json(col("j"),
      org.apache.spark.sql.types.StructType.fromDDL(schema)).as("e")).select("e.*")
  }

  // ---- dissector -------------------------------------------------------

  test("dissector: writes new fields with same separator") {
    val df = oneRow("""{"message":"This is a message"}""", "message STRING")
    val out = PatternOps.dissector(df, "message", "%{f1} %{f2} %{f3} %{f4}")
      .select("f1", "f2", "f3", "f4").head()
    assert(out == Row("This", "is", "a", "message"))
  }

  test("dissector: mixed separators and int conversion") {
    val df = oneRow("""{"m":"a=1;b=2"}""", "m STRING")
    val out = PatternOps.dissector(df, "m", "%{ka}=%{va|int};%{kb}=%{vb|int}")
      .select("ka", "va", "kb", "vb").head()
    assert(out == Row("a", 1L, "b", 2L))
  }

  test("dissector: non-matching input yields nulls, no failure") {
    val df = oneRow("""{"m":"no separators here!"}""", "m STRING")
    val out = PatternOps.dissector(df, "m", "%{a};%{b}").select("a", "b").head()
    assert(out == Row(null, null))
  }

  // ---- grokker ---------------------------------------------------------

  test("grokker: named captures to dotted fields, first match wins") {
    val df = oneRow("""{"m":"INFO 10.1.2.3 GET /index.html"}""", "m STRING")
    val out = PatternOps.grokker(df, "m",
      Seq("%{LOGLEVEL:level} %{IP:client} %{WORD:verb} %{URIPATH:path}"))
      .select("level", "client", "verb", "path").head()
    assert(out == Row("INFO", "10.1.2.3", "GET", "/index.html"))
  }

  test("grokker: apache common log composite pattern") {
    val df = oneRow(
      """{"m":"127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] \"GET /apache_pb.gif HTTP/1.0\" 200 2326"}""",
      "m STRING")
    val out = PatternOps.grokker(df, "m",
      Seq("""%{IPORHOST:client} %{NOTSPACE:ident} %{NOTSPACE:auth} \[%{HTTPDATE:ts}\] "%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?" %{NONNEGINT:status} (?:%{NONNEGINT:bytes}|-)"""))
      .select("client", "verb", "request", "status", "bytes").head()
    assert(out == Row("127.0.0.1", "GET", "/apache_pb.gif", "200", "2326"))
  }

  test("grokker: syslog base composite pattern resolves recursively") {
    val df = oneRow(
      """{"m":"Oct 11 22:14:15 mymachine su[230]: 'su root' failed"}""",
      "m STRING")
    val out = PatternOps.grokker(df, "m",
      Seq("%{SYSLOGTIMESTAMP:ts} %{IPORHOST:host} %{SYSLOGPROG:prog}: %{GREEDYDATA:msg}"))
      .select("ts", "host", "prog", "msg").head()
    assert(out == Row("Oct 11 22:14:15", "mymachine", "su[230]", "'su root' failed"))
  }

  test("grokker: extended dictionary (email, mac, path, date)") {
    val df = oneRow(
      """{"m":"from bob.smith@corp.example.com at 00:1a:2b:3c:4d:5e wrote /var/log/app.log on 10/31/2024"}""",
      "m STRING")
    val out = PatternOps.grokker(df, "m",
      Seq("from %{EMAILADDRESS:email} at %{MAC:mac} wrote %{UNIXPATH:path} on %{DATE_US:date}"))
      .select("email", "mac", "path", "date").head()
    assert(out == Row("bob.smith@corp.example.com", "00:1a:2b:3c:4d:5e",
      "/var/log/app.log", "10/31/2024"))
  }

  test("grokker: no pattern match leaves fields null") {
    val df = oneRow("""{"m":"unparseable"}""", "m STRING")
    val out = PatternOps.grokker(df, "m", Seq("%{INT:n} only")).select("n").head()
    assert(out == Row(null))
  }

  // ---- calculator ------------------------------------------------------

  test("calculator: precedence, power right-assoc, field templates") {
    val df = oneRow("""{"a":2,"b":3}""", "a DOUBLE, b DOUBLE")
    val out = Calculator.calculator(df, "1 + ${a} * ${b} ^ 2", "r")
      .select("r").head().getDouble(0)
    assert(out == 19.0) // 1 + 2*9
  }

  test("calculator: functions and constants") {
    val df = oneRow("""{"x":-4}""", "x DOUBLE")
    val got = Calculator.calculator(df, "abs(${x}) + trunc(pi) + from_hex(0x0A)", "r")
      .select("r").head().getDouble(0)
    assert(got == 4.0 + 3.0 + 10.0)
  }

  test("calculator: comparisons return booleans") {
    // fourFn comparisons yield Python bools (calculator conformance corpus)
    val df = oneRow("""{"x":5}""", "x DOUBLE")
    val got = Calculator.calculator(df, "${x} >= 5", "r").select("r").head()
    assert(got.getBoolean(0))
  }

  // ---- field ops (write semantics) ------------------------------------

  test("FieldOps.set creates intermediate structs (reference _add_field_to)") {
    val df = oneRow("""{"a":"x"}""", "a STRING")
    val out = FieldOps.set(df, "deep.nested.field", lit("v"))
    assert(out.select("deep.nested.field").head().getString(0) == "v")
  }

  test("FieldOps merge extends lists, strict keeps existing") {
    val df = oneRow("""{"arr":["a"],"s":"keep"}""", "arr ARRAY<STRING>, s STRING")
    val merged = FieldOps.set(df, "arr", lit("b"), FieldOps.WriteMode.Merge)
    assert(merged.select("arr").head().getSeq[String](0) == Seq("a", "b"))
    val strict = FieldOps.set(df, "s", lit("new"), FieldOps.WriteMode.Strict)
    assert(strict.select("s").head().getString(0) == "keep")
  }

  test("FieldOps.delete drops nested fields") {
    val df = oneRow("""{"keep":{"a":"1","drop_me":"2"}}""",
      "keep STRUCT<a: STRING, drop_me: STRING>")
    val out = FieldOps.delete(df, "keep.drop_me")
    assert(out.schema("keep").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("a"))
  }

  // ---- structural ------------------------------------------------------

  test("deleter removes matching events only") {
    val s = spark
    import s.implicits._
    val df = Seq(("drop", 1), ("keep", 2)).toDF("kind", "v")
    val out = Structural.deleter(df, "kind:drop")
    assert(out.select("kind").collect().map(_.getString(0)).toSeq == Seq("keep"))
  }

  test("deduplicator is order-preserving (reference array semantics)") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Seq("b", "a", "b", "c", "a"))).toDF("arr")
    val out = Structural.deduplicator(df, Seq("arr"))
    assert(out.head().getSeq[String](0) == Seq("b", "a", "c"))
  }

  // ---- CIDR / ip -------------------------------------------------------

  test("cidrContains matches prefix boundaries exactly") {
    val s = spark
    import s.implicits._
    val df = Seq("10.0.0.1", "10.127.255.255", "10.128.0.0", "11.0.0.1", "notanip")
      .toDF("ip")
    val got = df.select(Lookup.cidrContains(col("ip"), "10.0.0.0/9").as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
    // non-IP strings are simply "not contained" (false), matching the
    // reference's behavior of skipping unparseable values
    assert(got == Seq(true, true, false, false, false))
  }

  test("enrichPartitioned: mapPartitions stage with per-task cache") {
    val s = spark
    import s.implicits._
    val df = Seq("a.com", "b.com", "a.com", null).toDF("domain")
    val out = Lookup.enrichPartitioned(df.repartition(2), "domain", "ip",
      d => s"ip-of-$d")
    val got = out.collect().map(r => Option(r.getAs[String]("ip"))).toSet
    assert(got == Set(Some("ip-of-a.com"), Some("ip-of-b.com"), None))
  }

  // ---- time ------------------------------------------------------------

  test("timestamper: multi-format fallback to ISO output") {
    val df = oneRow("""{"t":"2024-03-05 10:11:12"}""", "t STRING")
    val out = TimeOps.timestamper(df, "t",
      Seq("ISO8601", "yyyy-MM-dd HH:mm:ss"), "ts_iso")
    assert(out.select("ts_iso").head().getString(0) == "2024-03-05T10:11:12.000Z")
  }

  test("timestamper: UNIX seconds and millis auto-detect") {
    val df = oneRow("""{"t":"1709633472"}""", "t STRING")
    val out = TimeOps.timestamper(df, "t", Seq("UNIX"), "ts_iso")
    assert(out.select("ts_iso").head().getString(0) == "2024-03-05T10:11:12.000Z")
    val dfMs = oneRow("""{"t":"1709633472000"}""", "t STRING")
    val outMs = TimeOps.timestamper(dfMs, "t", Seq("UNIX"), "ts_iso")
    assert(outMs.select("ts_iso").head().getString(0) == "2024-03-05T10:11:12.000Z")
  }

  // ---- dedup / similarity ---------------------------------------------

  test("minhash signatures are identical for identical texts") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
      (3L, "totally different content here now")).toDF("id", "text")
    val sigDf = graft.ml.Dedup.minhashSignatures(df, "id", "text", 6)
    val sigs = sigDf.collect()
      .map(r => r.getLong(0) -> (1 to 6).map(i => r.getLong(i)).toSeq).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhashPairs finds exact-duplicate docs as candidates") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "x y z w v u t q")).toDF("doc_id", "text")
    val pairs = graft.ml.Dedup.minhashPairs(df, "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("jaccard of identical is 1, disjoint is 0") {
    val s = spark
    import s.implicits._
    val df = Seq(("a b c d", "a b c d", "x y z w")).toDF("t1", "t2", "t3")
    val r = df.select(
      graft.ml.Dedup.jaccard(col("t1"), col("t2")).as("same"),
      graft.ml.Dedup.jaccard(col("t1"), col("t3")).as("diff")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("pseudonymizer hybrid encryption round-trips and is key-bound") {
    val kp = Crypto.generateRsaKeyPair()
    val token = Crypto.encrypt("alice@example.com", kp.getPublic.getEncoded)
    assert(token.split(":").length == 3)
    assert(Crypto.decrypt(token, kp.getPrivate.getEncoded) == "alice@example.com")
    // fresh session key per encryption → tokens differ, both decrypt
    val token2 = Crypto.encrypt("alice@example.com", kp.getPublic.getEncoded)
    assert(token != token2)
    assert(Crypto.decrypt(token2, kp.getPrivate.getEncoded) == "alice@example.com")
  }

  test("encrypted pseudonym mapping stream decrypts to origins") {
    val s = spark
    import s.implicits._
    val kp = Crypto.generateRsaKeyPair()
    val df = Seq("u1", "u2", "u1").toDF("uid")
    val mapping = Detection.pseudonymMappingEncrypted(df, "uid", "salt",
      kp.getPublic.getEncoded)
    val rows = mapping.collect()
    assert(rows.length == 2)
    val origins = rows.map(r =>
      Crypto.decrypt(r.getAs[String]("origin_encrypted"),
        kp.getPrivate.getEncoded)).toSet
    assert(origins == Set("u1", "u2"))
  }

  test("cosine similarity: orthogonal and identical vectors") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    val r = df.select(
      graft.ml.Similarity.cosine(col("a"), col("a")).as("same"),
      graft.ml.Similarity.cosine(col("a"), col("b")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && r.getDouble(1) == 0.0)
  }
}
