package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** e2e: POST events into the custom `graft-http` v2 streaming Source and
  * read them out of a memory-sink streaming query — no spool-file hop.
  */
class HttpSourceSpec extends SparkSpec {

  private def post(url: String, body: String): Int = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    conn.disconnect()
    code
  }

  test("graft-http source: push → micro-batch → memory sink") {
    val q = spark.readStream.format("graft-http").option("port", "0").load()
      .writeStream.format("memory").queryName("http_in")
      .trigger(Trigger.ProcessingTime(200))
      .start()
    try {
      // the stream binds an ephemeral port on start; wait for it
      var port = 0
      val deadline = System.currentTimeMillis() + 15000
      while (port == 0 && System.currentTimeMillis() < deadline) {
        port = HttpSource.boundPorts.getOrDefault(0, 0)
        if (port == 0) Thread.sleep(100)
      }
      assert(port != 0, "source never bound its port")
      assert(post(s"http://127.0.0.1:$port/jsonl",
        """{"a":1}""" + "\n" + """{"a":2}""") == 200)
      assert(post(s"http://127.0.0.1:$port/plaintext", "hello world") == 200)
      assert(post(s"http://127.0.0.1:$port/jsonl", "not json") == 400)
      val end = System.currentTimeMillis() + 20000
      var n = 0L
      while (n < 3 && System.currentTimeMillis() < end) {
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) FROM http_in").head().getLong(0)
      }
      assert(n == 3, s"expected 3 ingested rows, got $n")
      val msgs = spark.sql("SELECT message FROM http_in").collect()
        .map(_.getString(0)).sorted
      assert(msgs.contains("""{"a":1}"""))
      assert(msgs.exists(_.contains("hello world")))
    } finally q.stop()
  }
}
