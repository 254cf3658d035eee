package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest => JHttpRequest, HttpResponse}

import graft.channel.ChannelRegistry
import graft.net.HttpIngress
import graft.switchboard.Switchboard
import org.apache.spark.sql.functions._

/** The load-balancer example replayed end-to-end (M3, reference
  * examples/load-balancer/src/lib.rs): HTTP edge → fanout work-queue →
  * per-worker bounded processing (request-byte accumulation, response
  * computation) → results channel. Responses at the live edge are
  * synchronous (HttpIngress); this pipeline is the analytics/worker leg.
  */
class LoadBalancerSuite extends SparkSpec {
  import spark.implicits._

  test("http edge → fanout workers → per-worker responses (M3 load-balancer)") {
    val reg = new ChannelRegistry(spark, tmpDir("lb"))
    val board = new Switchboard(spark, reg)
    val in = reg.create("lb_in", HttpIngress.schema)
    val ingress = HttpIngress.start(spark, in)
    try {
      val client = HttpClient.newHttpClient()
      (1 to 12).foreach { i =>
        val r = JHttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${ingress.port}/w/$i"))
          .POST(JHttpRequest.BodyPublishers.ofString("x" * i)).build()
        assert(client.send(r, HttpResponse.BodyHandlers.ofString()).statusCode() == 202)
      }
      assert(ingress.flush() == 12)

      // fanout: stable worker assignment over the ingested channel
      val workers = 4
      val assigned = in.read().withColumn("worker",
        pmod(xxhash64(col("_seq"), col("_offset")), lit(workers)))
      // per-worker leg: accumulate request bytes, compute response
      // (reference load-balancer:163-195 accumulates then replies)
      val responses = assigned
        .withColumn("resp_len", length(col("body")))
        .groupBy(col("worker"))
        .agg(count(lit(1)).as("n_reqs"),
          sum(col("resp_len")).as("bytes_seen"))
      val total = responses.agg(sum("n_reqs"), sum("bytes_seen"))
        .as[(Long, Long)].collect().head
      assert(total._1 == 12)                 // every request exactly once
      assert(total._2 == (1 to 12).sum)      // all request bytes accounted
      assert(responses.count() <= workers)
    } finally ingress.stop()
  }
}
