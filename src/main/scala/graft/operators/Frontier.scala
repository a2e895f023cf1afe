package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Politeness-aware frontier scheduling (beyond-reference): turn a
  * candidate URL set plus the per-host `Crawl-delay` table
  * ([[Robots.crawlDelaysOf]]) into a fetch plan — which worker owns
  * each URL, in what order, and how many milliseconds into the cycle
  * its fetch slot opens. This is the planning HALF of a crawler: the
  * engine emits the plan as data; executing fetches belongs to a
  * fetcher fleet (out of scope, like live RPC).
  *
  * Invariants the plan guarantees:
  *  - ONE worker per host (worker = hash(host) mod nWorkers), so
  *    per-host serialization needs no cross-worker coordination;
  *  - within a host, slots are `seq × delay_ms` apart (seq from a
  *    deterministic per-host ordering), so a worker that fetches at
  *    its slot times never violates the host's declared delay;
  *  - `maxPerHost` truncates each host's queue per cycle — crawl
  *    budget enforcement, and the bound that keeps one mega-host from
  *    dominating a cycle.
  *
  * Scale shape: one broadcast-ready join against the tiny delay
  * table, one window per host. The window's per-host partition is the
  * politeness SEMANTICS (a host's queue is inherently serial), so the
  * skew is irreducible — but `maxPerHost` bounds what any one host
  * contributes, and the window needs no full sort buffer beyond the
  * host's own rows (Spark spills; at 10⁸-URL hosts set maxPerHost
  * first). All slot arithmetic is exact int64 (delays become integer
  * milliseconds up front). */
object Frontier {

  /** Plan a fetch cycle: `(url, host, worker, seq, delay_ms,
    * fetch_offset_ms)`, one row per admitted URL.
    *
    * `delays` is `(host, crawl_delay)` in (possibly fractional)
    * seconds; hosts absent from it get `defaultDelaySec`. Delays are
    * floored to integer milliseconds once, then every offset is exact
    * integer arithmetic. Per-host order is lexicographic by URL —
    * deterministic across runs and engines; priority-ordered variants
    * pass a pre-built `rankCol`. `family` follows the repo's hash
    * discipline: xxh64 in production, md5 when an oracle must
    * replay the worker assignment. */
  def schedule(urls: DataFrame, urlCol: String, delays: DataFrame,
      defaultDelaySec: Double = 1.0, nWorkers: Int = 64,
      maxPerHost: Long = Long.MaxValue, rankCol: Option[String] = None,
      family: String = "xxh64"): DataFrame = {
    require(nWorkers > 0, "schedule: nWorkers must be positive")
    val withHost = urls
      .withColumn("host", Robots.hostOf(col(urlCol)))
      .filter(col("host") =!= "")
    val d = delays.select(col("host"),
      col("crawl_delay").cast("double").as("_delay_s"))
    val joined = withHost.join(broadcast(d), Seq("host"), "left")
      .withColumn("delay_ms",
        floor(coalesce(col("_delay_s"), lit(defaultDelaySec)) * 1000.0).cast(LongType))
    val order = rankCol.map(r => Seq(col(r), col(urlCol))).getOrElse(Seq(col(urlCol)))
    val w = Window.partitionBy(col("host")).orderBy(order: _*)
    val worker = family match {
      case "md5" => pmod(graft.functions.Md5Family.md5Hash60(col("host")), lit(nWorkers.toLong))
      case _ => pmod(xxhash64(col("host")), lit(nWorkers.toLong))
    }
    joined
      .withColumn("seq", (row_number().over(w) - 1).cast(LongType))
      .filter(col("seq") < maxPerHost)
      .withColumn("worker", worker)
      .withColumn("fetch_offset_ms", col("seq") * col("delay_ms"))
      .select(col(urlCol), col("host"), col("worker"), col("seq"),
        col("delay_ms"), col("fetch_offset_ms"))
  }

  /** Recrawl staleness from sitemap `lastmod` vs the fetch log (r15)
    * — the consumer of [[Sitemaps.parse]]'s lastmod column: per URL,
    * `status` ∈
    *  - `new`      — never fetched;
    *  - `modified` — the sitemap declares a lastmod AFTER our fetch
    *                 (the publisher told us; trust it);
    *  - `aged`     — no usable lastmod and the fetch is ≥ maxAgeDays
    *                 old (fall back to age-based refresh);
    *  - `fresh`    — everything else, including lastmod ≤ fetch date
    *                 (an old lastmod is a statement the page has NOT
    *                 changed — age does not override it).
    *
    * `asOf` is an explicit ISO date so plans are deterministic and
    * replayable (never wall-clock). Dates compare as DATE; a
    * W3C-datetime lastmod contributes its date part; an unparsable
    * lastmod reads as absent (to_date's null, loud in `status` only
    * as the age fallback — malformed sitemup dates are routine).
    * Output `(url, status, age_days)` (age null when never fetched)
    * — feed `status`-derived priorities into [[schedule]]'s
    * `rankCol`. One broadcast-sized join against the fetch log's
    * projection; everything else is date arithmetic. */
  def recrawlStatus(entries: DataFrame, locCol: String, lastmodCol: String,
      fetched: DataFrame, urlCol: String, fetchedCol: String,
      asOf: String, maxAgeDays: Int = 30): DataFrame = {
    val e = entries.select(col(locCol).as("url"),
      to_date(col(lastmodCol).substr(1, 10)).as("_lm"))
    val f = fetched.select(col(urlCol).as("url"),
      to_date(col(fetchedCol)).as("_ft")).distinct()
    e.join(f, Seq("url"), "left")
      .withColumn("age_days",
        when(col("_ft").isNotNull,
          datediff(lit(asOf).cast("date"), col("_ft")).cast(LongType)))
      .withColumn("status",
        when(col("_ft").isNull, lit("new"))
          .when(col("_lm").isNotNull && col("_lm") > col("_ft"), lit("modified"))
          .when(col("_lm").isNull && col("age_days") >= maxAgeDays, lit("aged"))
          .otherwise(lit("fresh")))
      .select(col("url"), col("status"), col("age_days"))
  }
}
