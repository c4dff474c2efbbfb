package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Relational
import Q.{Entry, t, r6}

/** Batch-mode equivalents of the Structured Streaming operators over
  * `events` (SURVEY §2.10). The streaming versions themselves (readStream +
  * watermark + the same windows) are exercised in StreamingSpec; window
  * semantics are identical by construction, so these entries are the
  * oracle-checkable face of the streaming layer. Timestamps are emitted as
  * epoch seconds (BIGINT) — never raw. */
object StreamQueries {

  val entries: Seq[Entry] = Seq(

    Entry("q_stream_tumbling",
      (s, d) => Q.events(s, d)
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), Q.sumDec6(col("value")).as("sum_value"))
        .select(col("event_type"), unix_timestamp(col("w.start")).as("ws"),
          col("n"), col("sum_value")),
      Some("""SELECT event_type, CAST(floor(epoch(time_bucket(INTERVAL '10 minutes', ts))) AS BIGINT) AS ws, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value FROM events GROUP BY 1, 2""")),

    Entry("q_stream_sliding",
      // 10-minute windows sliding every 5 — each event lands in exactly two
      (s, d) => Q.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), unix_timestamp(col("w.start")).as("ws"), col("n")),
      Some("""SELECT event_type, ws, count(*) AS n FROM (SELECT event_type, CAST(floor(epoch(time_bucket(INTERVAL '10 minutes', ts))) AS BIGINT) AS ws FROM events UNION ALL SELECT event_type, CAST(floor(epoch(time_bucket(INTERVAL '10 minutes', ts - INTERVAL '5 minutes'))) AS BIGINT) + 300 FROM events) GROUP BY 1, 2""")),

    Entry("q_stream_session",
      // session_window(gap 30 min) ≡ gaps-and-islands compaction
      (s, d) => Q.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
          col("n_events")),
      Some("""WITH t AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), r AS (SELECT user_id, ts, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM t) SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start, count(*) AS n_events FROM r GROUP BY user_id, sid""")),

    Entry("q_stream_join",
      // batch face of the stream-stream interval join (same function —
      // withWatermark is a no-op in batch); micros-truncated timestamps
      // on the Spark side are mirrored with epoch_ns//1000 in the oracle
      (s, d) => graft.streaming.Events.clickPurchaseJoin(Q.events(s, d)),
      Some("""WITH c AS (SELECT user_id, event_id AS click_id, epoch_ns(ts) // 1000 AS us FROM events WHERE event_type = 'click'), p AS (SELECT user_id, event_id AS purchase_id, epoch_ns(ts) // 1000 AS us FROM events WHERE event_type = 'purchase') SELECT c.user_id, c.click_id, p.purchase_id, p.us // 1000000 - c.us // 1000000 AS lag_sec FROM c JOIN p ON c.user_id = p.user_id AND p.us >= c.us AND p.us <= c.us + 1800000000""")),

    Entry("q_stream_dedup",
      // batch analogue of dropDuplicatesWithinWatermark: earliest event per
      // (user, type)
      (s, d) => Relational.keepFirstAgg(Q.events(s, d),
          Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select("user_id", "event_type", "event_id"),
      Some("""SELECT user_id, event_type, event_id FROM (SELECT user_id, event_type, event_id, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1""")),

    Entry("q_stream_hist_dedup",
      // the EXACT streamingExactDedup function run in batch mode
      // (flatMapGroupsWithState executes on batch Datasets with empty
      // state), which by construction equals a single-batch drain: per-doc
      // keep/dup_of under keep-min-id per content hash. Cross-batch
      // history state is exercised in StreamingSpec.
      (s, d) => graft.streaming.Events.streamingExactDedup(
        t(s, d, "documents"), "doc_id", "text").toDF(),
      Some("""SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash, doc_id = min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS kept, min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS dup_of FROM documents""")),

    Entry("q_stream_quota",
      // batch face of the stateful per-source admission limiter
      // (streamingSourceQuota run on a batch Dataset = a single-batch
      // drain): admit_seq = rank by id within the source, admitted up
      // to the quota. Cross-batch counter state is exercised in
      // StreamingSpec.
      (s, d) => graft.streaming.Events.streamingSourceQuota(
        t(s, d, "documents"), "doc_id", "source", quota = 20L).toDF(),
      Some("""SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS admit_seq, row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 20 AS admitted FROM documents""")),

    Entry("q_stream_ingest",
      // batch face of the COMPOSED single-job ingest (Events.
      // ingestDecisions = a whole-corpus drain of streamingIngest):
      // decontaminate (eval = doc_id % 40 == 0, the q_decontaminate
      // fixture) → quality ≥ 0.5 + lang == 'en' gate → exact
      // content-hash dedup keep-first → per-source quota 20, with one
      // audit row per input document and NULL stage flags for documents
      // eliminated upstream. Cross-batch state (hash store + admission
      // ledger) is exercised in StreamingSpec (stream ≡ this face).
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.streaming.Events.ingestDecisions(
          docs.select("doc_id", "text", "source"),
          docs.where(col("doc_id") % 40 === 0).select("doc_id", "text"),
          "doc_id", "text", "source")
      },
      Some {
        val decon = """toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS ts FROM documents), sh0 AS (SELECT doc_id, CASE WHEN len(ts) >= 5 THEN array_to_string(ts[i:i+4], ' ') ELSE array_to_string(ts, ' ') END AS s FROM toks, unnest(generate_series(1, greatest(len(ts) - 4, 1))) AS g(i)), shh AS (SELECT DISTINCT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh0), ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % 40 = 0), hits AS (SELECT shh.doc_id, count(*) AS n_hits FROM shh JOIN ev USING (h) GROUP BY 1), cont AS (SELECT d.doc_id, coalesce(hits.n_hits, 0) > 0 AS contaminated FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id)"""
        s"""WITH $decon, ${LlmQueries.qualityLangCtes}, fl AS (SELECT d.doc_id, d.source, c.contaminated, qq.quality, lp.pred_lang, ((NOT c.contaminated) AND qq.quality >= 0.5 AND lp.pred_lang = 'en') AS pass_gate FROM documents d JOIN cont c ON c.doc_id = d.doc_id JOIN qq ON qq.doc_id = d.doc_id JOIN lp ON lp.doc_id = d.doc_id), sv AS (SELECT fl.doc_id, fl.source, row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) ORDER BY fl.doc_id) > 1 AS exact_dup FROM fl JOIN documents d ON d.doc_id = fl.doc_id WHERE fl.pass_gate), uq AS (SELECT doc_id, CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS admit_seq, row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 20 AS admitted FROM sv WHERE NOT exact_dup) SELECT fl.doc_id, fl.source, fl.contaminated, fl.quality, fl.pred_lang, fl.pass_gate, sv.exact_dup, uq.admit_seq, uq.admitted FROM fl LEFT JOIN sv ON sv.doc_id = fl.doc_id LEFT JOIN uq ON uq.doc_id = fl.doc_id"""
      }),

    Entry("q_stream_enrich",
      // stream-static broadcast enrichment (events joined to the nation
      // dim by a derived key) rolled up per dim row; the same function
      // runs against a real readStream in StreamingSpec
      (s, d) => {
        val ev = Q.events(s, d).withColumn("nkey", col("user_id") % 25)
        val dim = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
        graft.streaming.Events.enrichStatic(ev, dim,
            col("nkey"), col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"), Q.sumDec6(col("value")).as("sum_value"))
      },
      Some("""SELECT n_name, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value FROM events e LEFT JOIN nation ON e.user_id % 25 = n_nationkey GROUP BY 1""")),

    Entry("q_funnel",
      // sequential view->click->purchase funnel per user: first view,
      // first click at-or-after it, first purchase after that — order
      // matters. Exact epoch-micros timestamps; k steps = k aggregates
      (s, d) => graft.streaming.Events.funnelSteps(Q.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase")),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events), u AS (SELECT DISTINCT user_id FROM e), s0 AS (SELECT user_id, min(us) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1), s1 AS (SELECT e.user_id, min(e.us) AS t1 FROM e JOIN s0 USING (user_id) WHERE e.event_type = 'click' AND e.us >= s0.t0 GROUP BY 1), s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' AND e.us >= s1.t1 GROUP BY 1) SELECT u.user_id, s0.t0, s1.t1, s2.t2, (CASE WHEN s0.t0 IS NULL THEN 0 ELSE 1 END + CASE WHEN s1.t1 IS NULL THEN 0 ELSE 1 END + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END) AS reached FROM u LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)""")),

    Entry("q_retention_cohorts",
      // retention triangle: users cohorted by first-event day; active
      // users per (cohort day, day offset). Exact integer day math
      (s, d) => graft.streaming.Events.retentionCohorts(Q.events(s, d),
        "user_id", "ts"),
      Some("""WITH e AS (SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day FROM events), f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1), a AS (SELECT DISTINCT e.user_id, f.cohort_day, e.day - f.cohort_day AS day_offset FROM e JOIN f USING (user_id)) SELECT cohort_day, day_offset, count(*) AS active_users FROM a GROUP BY 1, 2""")),

    Entry("q_asof_join",
      // as-of enrichment: each purchase carries the user's latest click
      // at-or-before it (union-tag + window fill — one exchange, no range
      // explosion; see Relational.asofJoin). Clicks pre-deduped to one
      // per (user, ts) so tie order is defined in both engines; DuckDB's
      // native ASOF LEFT JOIN is the oracle.
      (s, d) => {
        val ev = Q.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("click_id"))
          .withColumn("click_us", expr("unix_micros(ts)"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
        Relational.asofJoin(purchases, clicks, "user_id", "ts",
            Seq("click_id", "click_us"))
          .select(col("user_id"), col("purchase_id"),
            expr("unix_micros(ts)").as("purchase_us"),
            col("click_id"), col("click_us"))
      },
      Some("""WITH c AS (SELECT user_id, ts, max(event_id) AS click_id FROM events WHERE event_type = 'click' GROUP BY 1, 2), p AS (SELECT user_id, ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase') SELECT p.user_id, p.purchase_id, epoch_ns(p.ts) // 1000 AS purchase_us, c.click_id, epoch_ns(c.ts) // 1000 AS click_us FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"""))
  )
}
