package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document on the stream. */
case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** A near-dup candidate: two docs sharing a MinHash band bucket. */
case class NearDupCandidate(band_bucket: Long, earlier_id: Long, later_id: Long)

/** One embedding on the stream (incremental-ingest dedup input). */
case class StreamVec(vec_id: Long, ts: Timestamp, embedding: Array[Float])

/** One event on the stream (event-time in millis carried as Timestamp). */
case class StreamEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** One keyed upsert record on the stream. */
case class StreamUpdate(key: Long, version: Long, payload: String)
case class EventGap(user_id: Long, event_type: String, gap_ms: Long)
case class PrefixScore(user_id: Long, event_type: String, ts_ms: Long,
  value: Double, z: Double)

/** Open-session state per user. */
case class SessionState(start_ms: Long, last_ms: Long, n_events: Long, value: Double)

/** One closed session. */
case class ClosedSession(user_id: Long, start_ms: Long, n_events: Long,
    value: Double, duration_ms: Long)

/** One completed streaming funnel conversion. */
case class FunnelConversion(user_id: Long, signup_ms: Long, convert_ms: Long)

/** Per-user funnel progress: current stage (1 = signed up, 2 = viewed),
  * when that stage was entered, and the original signup time. */
case class FunnelState(stage: Int, stage_ms: Long, signup_ms: Long)
case class AttribState(first_type: String, last_type: String)
case class AttributionHit(user_id: Long, first_touch: String,
    last_touch: String, purchase_ms: Long)

/** Structured Streaming twins of the batch event operators
  * (operators.Relational q_tumbling / q_sessionize).
  *
  * Scale notes:
  *  - tumbling agg state is bounded by the watermark: late rows beyond it
  *    are dropped and closed windows are evicted — state size is
  *    O(active windows × event types), independent of stream length;
  *  - sessionization keeps exactly one `SessionState` per active user via
  *    `flatMapGroupsWithState`; sessions close on gap timeout, so state is
  *    O(concurrently-active users). Keys hash-partition across executors —
  *    no single-node state bottleneck.
  */
object StreamOps {

  /** Tumbling 1-hour windowed counts with watermarking (D4). The value sum
    * accumulates as DECIMAL(18,4) — exact partial merges across executors
    * and micro-batches, so the emitted total is order-independent and
    * bitwise-equal to the batch twin's moneySum (q_tumbling), which is what
    * lets the streaming run be oracle-checked against the same SQL. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
          .as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Hopping (sliding) windowed counts — the streaming twin of batch
    * q_hopping: 1-hour windows every 15 minutes. Spark materializes the
    * length/hop = 4 window memberships per event; state is bounded by the
    * watermark exactly as in the tumbling case, ×4 open windows. */
  def hoppingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
          .as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming EXACT per-window percentiles (D28) — the production shape:
    * watermark + APPEND mode, so a (window, type) group's value multiset
    * lives in the state store only until the watermark passes its window
    * end, then the finalized window emits ONCE with exact nearest-rank
    * p50/p95 (ceil(q·n) over the sorted values, computed at emission —
    * never kept sorted in state) and its state is evicted; later-arriving
    * rows for a closed window are dropped by the watermark. This is the
    * honest cost model for exact streaming percentiles: they are not
    * sketch-mergeable, so state is O(open-window rows), watermark-bounded
    * — the unbounded-stream alternative is the sketch family
    * (q_approx_percentile / q_stream_cms). The complete-mode replay twin
    * (q_stream_percentiles) runs this same aggregation shape with the
    * watermark inert; this entry point is the one a deployment runs. */
  def windowedPercentiles(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(collect_list(col("value")).as("raw"))
      .select(col("w"), col("event_type"), sort_array(col("raw")).as("vs"))
      .select(unix_millis(col("w.start")).as("start_ms"),
        col("event_type"),
        size(col("vs")).cast("bigint").as("n"),
        element_at(col("vs"), greatest(lit(1),
          ceil(size(col("vs")) * lit(0.5)).cast("int"))).as("p50"),
        element_at(col("vs"), greatest(lit(1),
          ceil(size(col("vs")) * lit(0.95)).cast("int"))).as("p95"))

  /** Sliding 7-day active users (the streaming twin of batch q_wau, D21):
    * 7-day windows advancing daily, each carrying an HLL distinct-user
    * sketch. Exact sliding distinct is not incrementally expressible in a
    * stream (a user's previous appearance inside the window would need
    * unbounded lookback); the mergeable constant-size sketch is the
    * correct 100 TB semantics, and `approx_count_distinct`'s partial
    * state merges across executors and triggers like any other partial
    * agg. State is O(open windows) × sketch size, evicted by the
    * watermark; rsd 2% mirrors the batch approx-distinct discipline. */
  def slidingActiveUsers(events: DataFrame,
      watermark: String = "8 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("active_users"))
      .select(col("w.end").as("window_end"), col("active_users"))

  /** Streaming exact dedup (C16): the first arrival of each key passes,
    * later duplicates are dropped — Spark's streaming `dropDuplicates`
    * keeps one state-store entry per distinct key, hash-partitioned
    * across executors. Pass a watermark-bearing frame and a ts-derived
    * key column to bound that state in production; on a bounded backfill
    * (or a corpus whose distinct-key count is the product being built,
    * as in training-data dedup) the unbounded form is the exact
    * semantics. Dedup on a fingerprint column (md5/simhash), never raw
    * text: state then stores 16 bytes per distinct doc, not the doc. */
  def exactDedup(docs: DataFrame, keyCols: Seq[String]): DataFrame =
    docs.select(keyCols.map(col): _*).dropDuplicates(keyCols)

  /** Streaming MinHash-LSH near-dup detection: each arriving document's
    * 16 band hashes (64-perm MinHash, the same graft.functions kernel the
    * batch path uses) key a state store of doc-ids previously seen in that
    * bucket; a new doc colliding with a stored one emits a candidate pair
    * immediately.
    *
    * Scale notes: state is per (band, bucket) — cardinality bounded by the
    * corpus's distinct band hashes, hash-partitioned across executors.
    * Per-bucket membership is capped (`maxPerBucket`) so a degenerate
    * bucket (boilerplate text) cannot grow state unboundedly — the same
    * hot-bucket cut the batch df-cut applies. Candidates may repeat across
    * bands; exact-verify + distinct is the (batch or downstream) second
    * stage, as in the batch LSH operator. */
  def nearDupCandidates(docs: Dataset[StreamDoc],
      maxPerBucket: Int = 64): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        explode(call_function("minhash_bands",
          call_function("word_shingles", col("text"), lit(3)), lit(64), lit(16)))
          .as("bucket"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[List[Long], NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, it: Iterator[(Long, Long)], state: GroupState[List[Long]]) =>
          val seen = state.getOption.getOrElse(Nil)
          val arrivals = it.map(_._1).toSeq.distinct.filterNot(seen.contains)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCandidate]
          var members = seen
          arrivals.foreach { id =>
            members.foreach(m => out += NearDupCandidate(bucket, math.min(m, id), math.max(m, id)))
            if (members.size < maxPerBucket) members = id :: members
          }
          if (members.nonEmpty) state.update(members)
          out.iterator
      }
  }

  /** Streaming embedding near-dup against a static corpus (the incremental
    * twin of the batch q_embed_decontaminate / q_dedup_incremental ops).
    * Scale-routed like the batch family (Similarity.embedNeardupAuto, one
    * count() of the STATIC side at plan-build time): a corpus at or below
    * `Similarity.NeardupRouteMax` broadcasts whole and every arriving
    * vector exact-verifies against it — recall 1.0 at ANY τ, stateless,
    * the same physical shape as the batch flat path. Above the cutoff the
    * corpus is SRP-LSH banded with the same `srp_bands` kernel as the
    * batch path and the stream joins the (band, bucket) index;
    * cosine-verify keeps only true near-dups. Both routes are stream-static
    * joins — stateless per micro-batch, no streaming state at all.
    * (r12 fix: the SRP route at 192×12 bands has ≈0.54 recall at cos=0.4 —
    * it is sized for the τ=0.5 contract of SURVEY C6 — so routing a
    * below-cutoff corpus through it dropped true pairs; the exact
    * broadcast route is both correct and cheaper there.)
    *
    * Scale shape (above-cutoff route): the corpus index carries
    * (corpus_id, band, bucket) rows, never the vectors; full vectors join
    * back only for the candidate rows. A pair colliding in several bands
    * is emitted once per band (same sim value) — distinct() is the
    * downstream batch stage, exactly like the batch LSH operator's
    * contract. */
  def embedNearDupAgainstCorpus(vecs: Dataset[StreamVec], corpus: DataFrame,
      threshold: Double = 0.4, bands: Int = 192, bits: Int = 12,
      routeMax: Long = graft.operators.Similarity.NeardupRouteMax): DataFrame = {
    val cVec = corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
    val verified =
      if (corpus.count() <= routeMax)
        vecs.toDF().select(col("vec_id"), col("embedding"))
          .join(broadcast(cVec))
      else {
        val sIdx = vecs.toDF()
          .select(col("vec_id"), col("embedding"),
            posexplode(call_function("srp_bands", col("embedding"), lit(bands), lit(bits))))
          .toDF("vec_id", "embedding", "band", "bucket")
        val cIdx = corpus
          .select(col("vec_id").as("corpus_id"),
            posexplode(call_function("srp_bands", col("embedding"), lit(bands), lit(bits))))
          .toDF("corpus_id", "band", "bucket")
        sIdx.join(cIdx, Seq("band", "bucket"))
          .select(col("vec_id"), col("embedding"), col("corpus_id"))
          .join(cVec, "corpus_id")
      }
    verified
      // round-then-threshold is the batch near-dup discipline (a sim in
      // the last ulp below τ must land on the same side in every engine)
      .select(col("vec_id"), col("corpus_id"),
        round(call_function("cosine_sim", col("embedding"), col("cv")), 6)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Stream-static enrichment join (D8): each micro-batch joins against a
    * static dimension snapshot. Stateless — no streaming state at all; the
    * dimension broadcasts into every batch. The scale shape for attaching
    * slowly-changing metadata (user segments, locale tables) to a 100 TB/day
    * event stream: the stream never shuffles, only the dim moves. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream event-time interval join (D9): follow-events of the same
    * user within `withinMs` AFTER a lead-event (view→purchase attribution).
    * Both sides are watermarked and the join condition carries the time
    * range, so each side's buffered state is evicted once the watermark
    * passes the interval — an un-ranged stream-stream join would buffer
    * both streams forever. State is keyed by user_id, hash-partitioned
    * across executors like any streaming agg. */
  def followWithin(lead: Dataset[StreamEvent], follow: Dataset[StreamEvent],
      withinMs: Long, watermark: String = "1 hour"): DataFrame = {
    val l = lead.toDF().withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("lead_ts"),
        col("event_type").as("lead_type"))
    val f = follow.toDF().withWatermark("ts", watermark)
      .select(col("user_id").as("f_user"), col("ts").as("follow_ts"),
        col("event_type").as("follow_type"), col("value").as("follow_value"))
    l.join(f,
      col("user_id") === col("f_user") &&
        col("follow_ts") >= col("lead_ts") &&
        col("follow_ts") <= col("lead_ts") +
          make_dt_interval(lit(0), lit(0), lit(0), lit(withinMs / 1000.0)))
      .select(col("user_id"), col("lead_ts"), col("lead_type"),
        col("follow_ts"), col("follow_type"), col("follow_value"))
  }

  /** Declarative session windows (D19): Spark's native `session_window`
    * aggregation — the engine-managed twin of the hand-rolled
    * flatMapGroupsWithState sessionizer (D5). Same gap semantics; the
    * difference is operational: state layout, merge, and eviction are the
    * engine's (sessions merge when late events bridge two windows, state
    * evicts with the watermark), at the price of append-mode results only
    * arriving once the watermark CLOSES a session — the custom-state
    * version can emit early/richer records. Both belong in the library:
    * this one is what you reach for first; D5 is the escape hatch. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming debounce (D18, twin of batch q_debounce with the stronger
    * previous-KEPT semantics): an event is emitted only if it arrives more
    * than `windowMs` after the last EMITTED event of the same
    * (user, type) — exactly what an ingest edge does to suppress retries
    * and double-fires before they pollute downstream counts. State is one
    * long (last kept event-time) per active key, hash-partitioned;
    * event-time timeout evicts it once the watermark passes the debounce
    * window — after that moment any future event is, by definition,
    * further than `windowMs` from the last kept one, so dropping the
    * state changes nothing (state stays O(keys active inside a window),
    * not O(keys ever seen)). */
  def debounce(events: Dataset[StreamEvent], windowMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[StreamEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, StreamEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Long, String), it: Iterator[StreamEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var lastKept = state.getOption
            val out = it.toSeq.sortBy(_.ts.getTime).filter { e =>
              val keep = lastKept.forall(e.ts.getTime - _ > windowMs)
              if (keep) lastKept = Some(e.ts.getTime)
              keep
            }
            lastKept.foreach { lk =>
              state.update(lk)
              state.setTimeoutTimestamp(lk + windowMs + 1L)
            }
            out.iterator
          }
      }
  }

  /** Streaming last-write-wins upsert (the streaming twin of the batch
    * q_upsert compaction): one winner record per key, re-emitted whenever
    * a higher-version update arrives — a continuously-maintained
    * materialized view of a mutable table. Update output mode: sinks see
    * only changed keys per micro-batch. State is exactly one record per
    * live key, hash-partitioned across executors; out-of-order and
    * duplicate deliveries collapse to the same winner because versions,
    * not arrival order, decide (payload tie-breaks equal versions, so
    * replays are idempotent). The batch compaction op stays the
    * cold-path rewrite; this serves the hot view. */
  def lwwUpsert(updates: Dataset[StreamUpdate]): Dataset[StreamUpdate] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.key)
      .mapGroupsWithState[StreamUpdate, StreamUpdate](GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[StreamUpdate], state: GroupState[StreamUpdate]) =>
          val winner = (state.getOption.iterator ++ it)
            .maxBy(u => (u.version, u.payload))
          state.update(winner)
          winner
      }
  }

  /** Streaming funnel (the streaming twin of batch q_funnel): emit a
    * conversion the moment a user completes signup → view → purchase with
    * each step inside `stepMs` of the previous one. One small state record
    * per user currently inside the funnel, hash-partitioned across
    * executors; event-time timeout evicts state as soon as the watermark
    * passes the step deadline, so state is O(users inside an open step
    * window), not O(all users ever seen). A dead funnel (step window
    * missed) resets, and a later signup restarts it; completion removes
    * state, so each user converts at most once per funnel entry. */
  def funnel(events: Dataset[StreamEvent], stepMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[FunnelConversion] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelConversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[StreamEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelConversion]
            var cur = state.getOption
            sorted.foreach { e =>
              val ms = e.ts.getTime
              // a funnel whose step window has lapsed is dead; fall through
              // so this same event may restart it (e.g. a fresh signup)
              cur = cur.filter(s => ms <= s.stage_ms + stepMs)
              (cur, e.event_type) match {
                case (None, "signup") =>
                  cur = Some(FunnelState(1, ms, ms))
                case (Some(s), "view") if s.stage == 1 && ms > s.stage_ms =>
                  cur = Some(FunnelState(2, ms, s.signup_ms))
                case (Some(s), "purchase") if s.stage == 2 && ms > s.stage_ms =>
                  out += FunnelConversion(userId, s.signup_ms, ms)
                  cur = None
                case _ => ()
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.stage_ms + stepMs)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }

  /** Streaming first/last-touch attribution (the streaming twin of batch
    * q_attribution): the moment a purchase arrives, emit the user's
    * opening event type and the last non-purchase type seen before it —
    * no waiting for a batch window to close. State is ONE tiny record per
    * user (two strings), hash-partitioned; in-batch events apply in
    * event-time order, so replays are deterministic. Matches B47 exactly
    * on each user's FIRST purchase ('direct' when nothing precedes it)
    * and extends it by attributing every later purchase to the latest
    * preceding touch — the streaming superset. A retention policy would
    * add an event-time timeout; the state is already O(users), the same
    * bound as the batch aggregation. */
  def attribution(events: Dataset[StreamEvent]): Dataset[AttributionHit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttribState, AttributionHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[StreamEvent], state: GroupState[AttribState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[AttributionHit]
          var cur = state.getOption
          sorted.foreach { e =>
            val first = cur.map(_.first_type).getOrElse(e.event_type)
            val lastTouch = cur.map(_.last_type).getOrElse("direct")
            if (e.event_type == "purchase")
              out += AttributionHit(userId, first, lastTouch, e.ts.getTime)
            cur = Some(AttribState(first,
              if (e.event_type == "purchase") lastTouch else e.event_type))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Gap-based sessionization (D5): one state per active user; a session
    * closes when the next event arrives > gap later (in-batch) or when the
    * event-time watermark passes `last_event + gap` (idle users). Event-time
    * timeout keeps state bounded by the watermark — a processing-time
    * timeout would instead busy-trigger batches and close sessions on
    * wall-clock, which is wrong under replay/backfill. */
  def sessionize(events: Dataset[StreamEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .as[StreamEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              ClosedSession(userId, s.start_ms, s.n_events, s.value, s.last_ms - s.start_ms))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.last_ms > gapMs =>
                  closed += ClosedSession(userId, s.start_ms, s.n_events, s.value, s.last_ms - s.start_ms)
                  cur = Some(SessionState(ms, ms, 1L, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start_ms, ms, s.n_events + 1, s.value + e.value))
                case None =>
                  cur = Some(SessionState(ms, ms, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Streaming inter-event cadence (D23, the streaming twin of the batch
    * q_event_gaps lag window): per (user, type), the gap between each
    * event and its predecessor is emitted AS IT ARRIVES — the
    * engagement-rhythm signal maintained continuously instead of
    * rescanning history. State is exactly ONE long (the last seen
    * event-time) per live key, hash-partitioned; within a micro-batch
    * events sort by event time so replays and batch boundaries produce
    * the same gaps the batch lag window computes (parity-asserted in
    * StreamingSpec). */
  def eventGaps(events: Dataset[StreamEvent],
      watermarkDelay: String = "0 seconds"): Dataset[EventGap] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, EventGap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), it: Iterator[StreamEvent], state: GroupState[Long]) =>
          var last = state.getOption
          val out = it.toSeq.sortBy(_.ts.getTime).flatMap { e =>
            val g = last.map(l => EventGap(key._1, key._2, e.ts.getTime - l))
            last = Some(e.ts.getTime)
            g
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming prefix z-score anomaly (D25): each event's value is scored
    * against the running mean/variance of everything its event_type has
    * seen SO FAR — the alert-as-it-arrives twin of the batch q_outliers
    * z-score (which scores against the final distribution). State per
    * live key is three numbers (n, Σx, Σx²) — O(1) regardless of stream
    * length; within a micro-batch events fold in event-time order (ts
    * ties broken by value) so replays and batch boundaries produce
    * identical prefixes (parity-asserted in StreamingSpec against the
    * same fold run in plain Scala). Scores before the second observation
    * and under zero variance are 0 by definition — loud NaNs never leave
    * the operator. */
  def prefixZscore(events: Dataset[StreamEvent]): Dataset[PrefixScore] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Double, Double), PrefixScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[StreamEvent],
         state: GroupState[(Long, Double, Double)]) =>
          var (n, sx, sxx) = state.getOption.getOrElse((0L, 0.0, 0.0))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.value)).map { e =>
            val z =
              if (n < 2) 0.0
              else {
                val mean = sx / n
                val variance = (sxx - sx * sx / n) / (n - 1)
                if (variance <= 0) 0.0 else (e.value - mean) / math.sqrt(variance)
              }
            n += 1; sx += e.value; sxx += e.value * e.value
            PrefixScore(e.user_id, key, e.ts.getTime, e.value, z)
          }
          state.update((n, sx, sxx))
          out.iterator
      }
  }

  /** Streaming frequency sketch (D21): the `cms_agg`
    * TypedImperativeAggregate runs UNCHANGED as a streaming aggregate —
    * the state store holds the one d×w counter grid (a few hundred KB)
    * regardless of stream length, and every micro-batch folds in via the
    * same partial-merge path batch aggregation uses. This is the whole
    * point of sketch-shaped state: exact streaming term counts keep
    * O(vocabulary) state (unbounded on raw text), the sketch keeps O(d·w)
    * with the q_cms_vocab accuracy contract. Probe the emitted grid with
    * `cms_estimate` (or driver-side [[graft.functions.CountMin.estimate]]). */
  def termSketch(docs: Dataset[StreamDoc]): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy()
      .agg(call_function("cms_agg", col("term"), lit(4), lit(2048)).as("sketch"))
}
