package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import scala.jdk.CollectionConverters._

/** GraphQL-subscriptions analog over the streaming source — the
  * reference ships live queries via Postgraphile + pg-pubsub
  * (`docker-compose.yaml:55,71-72`: Postgres NOTIFY fans out to
  * websocket subscribers). Here the pub/sub bus is the micro-batch
  * itself: a client POSTs a subscription document (same grammar as
  * [[GraphQL]] queries, `subscription { view(condition: …) { cols } }`)
  * to the SSE endpoint and holds the connection; every micro-batch's
  * NEW rows are projected through the subscribed view, filtered by the
  * condition, and pushed as `data:` events. No polling, no replay —
  * live rows only, exactly pg-pubsub's contract.
  *
  * Serving discipline (same as [[GraphQL]]'s page bound):
  * - per-subscriber delivery queues are BOUNDED, drop-oldest — a slow
  *   SSE consumer can never backpressure the ingest stream;
  * - per-batch row delivery is capped (`maxEventsPerBatch`) — a
  *   subscription matching a huge backfill batch gets a bounded
  *   prefix + a `truncated` marker, not an unbounded collect;
  * - each distinct VIEW projects the batch once per publish, and the
  *   filter + bounded collect runs once per DISTINCT (condition,
  *   selections, cap) — N subscribers sharing a predicate cost one
  *   Spark job, not N (the rendered event string is shared).
  */
object Subscriptions {
  import GraphQL.{FieldQuery, ParseError}

  private val mapper = new ObjectMapper()

  /** One live subscriber: parsed root field + bounded event queue. */
  final class Sub private[Subscriptions] (val id: Long, val field: FieldQuery) {
    private[Subscriptions] val queue =
      new java.util.concurrent.LinkedBlockingQueue[String](1024)
    @volatile private[Subscriptions] var closed = false
    private[Subscriptions] def offer(ev: String): Unit = {
      while (!queue.offer(ev)) queue.poll() // drop-oldest, never block
    }
    /** Next SSE-framed event, or None after `timeoutMs` (keepalive turn). */
    def next(timeoutMs: Long): Option[String] =
      Option(queue.poll(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    def isClosed: Boolean = closed
  }

  /** Subscriber registry + the per-micro-batch publisher. */
  final class Hub(maxEventsPerBatch: Int = 1000) {
    private val nextId = new java.util.concurrent.atomic.AtomicLong()
    private val subs = new java.util.concurrent.ConcurrentHashMap[Long, Sub]()

    private def knownView(v: String): Boolean =
      v == "logs" || v == "logs_canonical" ||
        graft.operators.EventViews.referenceViews.exists(_.viewName == v)

    def subscribe(doc: String): Sub = {
      val fields = GraphQL.parse(doc)
      if (fields.size != 1)
        throw ParseError("subscriptions take exactly one root field")
      val f = fields.head
      if (!knownView(f.view))
        throw ParseError(s"unknown subscribable view '${f.view}'")
      if (f.nested.nonEmpty || f.wantEdges || f.pageInfo.nonEmpty || f.after.nonEmpty)
        throw ParseError(
          "subscriptions deliver flat node rows — relations, edges, pageInfo and cursors are query-only")
      val sub = new Sub(nextId.incrementAndGet(), f)
      subs.put(sub.id, sub)
      sub
    }

    def unsubscribe(id: Long): Unit =
      Option(subs.remove(id)).foreach(_.closed = true)

    def active: Int = subs.size

    /** Deliver a micro-batch of NEW raw log rows to every subscriber.
      * Call from the ingest stream's `foreachBatch`, after the sink
      * append (so a replayed batch re-publishes only if it also
      * re-appends — at-least-once delivery, like pg NOTIFY). */
    def publish(batch: DataFrame): Unit = {
      val snapshot = subs.values.asScala.toSeq
      if (snapshot.isEmpty) return
      snapshot.groupBy(_.field.view).foreach { case (view, viewSubs) =>
        val projected =
          // logs_canonical over a single NEW-rows batch is the batch
          // itself (canonicalization dedups against history, which a
          // live feed does not replay)
          if (view == "logs" || view == "logs_canonical") batch
          else graft.operators.EventViews.referenceViews
            .find(_.viewName == view)
            .map(e => graft.operators.EventViews.project(batch, e))
            .getOrElse(batch.limit(0))
        // one render (one Spark job) per DISTINCT predicate: condition,
        // selections, response keys and effective cap fully determine
        // the event, so subscribers sharing them share the rendered
        // string (aliases are part of the key — two subscribers
        // differing only in response keys must not share a render)
        viewSubs.groupBy(s =>
            (s.field.condition, s.field.selections, s.field.outs,
              s.field.outName, effectiveCap(s.field)))
          .foreach { case (_, group) =>
            try {
              val ev = render(projected, group.head.field, view)
              ev.foreach(e => group.foreach(_.offer(e)))
            } catch {
              case e: Exception =>
                val err =
                  s"""{"errors":[{"message":${mapper.writeValueAsString(e.toString)}}]}"""
                group.foreach(_.offer(err))
            }
          }
      }
    }

    private def effectiveCap(f: FieldQuery): Int =
      math.min(f.first.getOrElse(maxEventsPerBatch.toLong),
        maxEventsPerBatch.toLong).toInt

    /** Condition→filter, selections→projection, cap→limit; None when
      * the batch has no matching rows (no event — SSE stays quiet). */
    private def render(df: DataFrame, f: FieldQuery, view: String): Option[String] = {
      val cols = df.schema.fieldNames.toSet
      def check(c: String): String =
        if (cols(c)) c
        else throw ParseError(s"'$view' has no field '$c' (has: ${df.schema.fieldNames.mkString(", ")})")
      val conditioned = f.condition.foldLeft(df) { case (d, (k, v)) =>
        if (v == null) d.filter(col(check(k)).isNull)
        else d.filter(col(check(k)) === lit(v))
      }
      val cap = effectiveCap(f)
      val rows = conditioned
        .select(f.selections.map(c => col(check(c))): _*)
        .limit(cap + 1)
        .collect()
      if (rows.isEmpty) return None
      val root = mapper.createObjectNode()
      val data = root.putObject("data")
      // response keys are alias-aware (outName/outs), positions map to
      // the selections projection — same contract as the HTTP surface
      val conn = data.putObject(f.outName)
      val nodes = conn.putArray("nodes")
      rows.take(cap).foreach { r =>
        val o = nodes.addObject()
        f.outs.zipWithIndex.foreach { case (name, i) =>
          GraphQL.putValueOn(o, name, r.get(i))
        }
      }
      conn.put("truncated", rows.length > cap)
      Some(mapper.writeValueAsString(root))
    }
  }

  /** Serve `POST /subscribe` (body = subscription document, raw or
    * `{"query": …}` envelope — same dispatch as the query endpoint) as
    * a Server-Sent-Events stream: `data: {json}` per delivered batch,
    * `: keepalive` comments while idle. The connection stays open
    * until the client drops it; the subscriber is then removed. */
  def serve(hub: Hub, port: Int,
      keepaliveMs: Long = 1000): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    // each open SSE connection holds a thread — cached pool, not the
    // default single-thread executor, or the second subscriber blocks
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/subscribe", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val doc = GraphQL.extractQuery(
        Option(ex.getRequestHeaders.getFirst("Content-Type")), body)
      (try Right(hub.subscribe(doc)) catch { case e: ParseError => Left(e.msg) }) match {
        case Left(msg) =>
          val err = s"""{"errors":[{"message":${mapper.writeValueAsString(msg)}}]}"""
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(400, err.length)
          ex.getResponseBody.write(err)
          ex.close()
        case Right(sub) =>
          ex.getResponseHeaders.set("Content-Type", "text/event-stream")
          ex.getResponseHeaders.set("Cache-Control", "no-cache")
          ex.sendResponseHeaders(200, 0) // chunked — stream until closed
          val out = ex.getResponseBody
          try {
            out.write(s": subscribed id=${sub.id}\n\n".getBytes("UTF-8"))
            out.flush()
            while (!sub.isClosed) {
              sub.next(keepaliveMs) match {
                case Some(ev) => out.write(s"data: $ev\n\n".getBytes("UTF-8"))
                case None => out.write(": keepalive\n\n".getBytes("UTF-8"))
              }
              out.flush() // a dropped client surfaces here as IOException
            }
          } catch { case _: java.io.IOException => () }
          finally {
            hub.unsubscribe(sub.id)
            ex.close()
          }
      }
    })
    server.start()
    server
  }
}
