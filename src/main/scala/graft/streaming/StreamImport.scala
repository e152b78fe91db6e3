package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** Structured-Streaming re-expression of the reference's import loop
  * (NatsConsumer listen → RecordParser → Inflight*Manager → JPA save):
  * a keyed state machine over the record stream materializing one
  * Transfer row per workflow instance, upserted per micro-batch.
  *
  * The NATS client itself is out of scope (zero-egress container;
  * SURVEY.md §5) — the source is pluggable: any Dataset[Rec]-shaped
  * stream (file source in the driver path, MemoryStream in specs).
  *
  * Scale posture: state is keyed by instance (bounded per-key size,
  * no per-key growth beyond the folded aggregates), the fold is
  * order-insensitive (min/max/sum + arg-max by composite ord) so
  * late/out-of-order records need no reprocessing, and the sink is an
  * idempotent keyed upsert — the three properties that let the
  * pipeline run with thousands of parallel state partitions. The KEY
  * SET is bounded too: every keyed fold defaults to watermark-driven
  * eviction ([[evicting]]) so state is O(keys active within the
  * horizon), not O(keys ever seen); the state itself lives in RocksDB
  * ([[graft.Graft.session]]), off-heap.
  */
object StreamImport {

  /** One export record (the events-table shape; `k` is the parsed
    * JSON payload field, ts normalized to epoch millis).
    */
  case class Rec(event_id: Long, ts_ms: Long, user_id: Long,
    event_type: String, value: Double, k: Long)

  /** Per-instance in-flight state — the batch groupBy's accumulator,
    * folded incrementally (InflightTransferManager's entity cache,
    * minus the repo lookups: the fold is total, not read-modify-write).
    * The last-write ordering is the (ts, event_id) PAIR compared
    * lexicographically — same semantics as the batch side's struct
    * max_by, with no composite-bigint overflow at event_id >= 1e6.
    */
  case class St(started: Long, completed: Long, amountE2: Long,
    lastTs: Long, lastId: Long, lastClickE2: Long, hasClick: Boolean,
    hasAmount: Boolean, failed: Boolean, done: Boolean, n: Long)

  private val EmptySt = St(Long.MaxValue, Long.MinValue, 0L, Long.MinValue,
    Long.MinValue, 0L,
    hasClick = false, hasAmount = false, failed = false, done = false, n = 0L)

  /** (ts, id) strictly after the fold's current last-write mark? */
  private def isAfter(ts: Long, id: Long, lastTs: Long, lastId: Long): Boolean =
    ts > lastTs || (ts == lastTs && id > lastId)

  /** The materialized entity row — column-compatible with
    * ImporterCore.transfers so the SAME DuckDB oracle checks the
    * streaming path.
    */
  case class TransferRow(transfer_key: Long, tenant: String,
    started_ms: Long, completed_ms: Long, amount: String,
    last_click_value: String, status: String, n_events: Long)

  /** Double → cents with the SAME rounding as the batch path's
    * decimal(18,2) cast (HALF_UP on the decimal rendering of the
    * double — `math.round(v * 100)` would differ on negatives and on
    * FP .5 boundaries, diverging from the shared oracle).
    */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def fold(st: St, r: Rec): St = {
    var s = st.copy(n = st.n + 1)
    r.event_type match {
      case "signup" =>
        s = s.copy(started = math.min(s.started, r.ts_ms))
      case "purchase" =>
        s = s.copy(completed = math.max(s.completed, r.ts_ms),
          amountE2 = s.amountE2 + cents(r.value),
          hasAmount = true, done = true)
      case "click" =>
        if (isAfter(r.ts_ms, r.event_id, s.lastTs, s.lastId))
          s = s.copy(lastTs = r.ts_ms, lastId = r.event_id,
            lastClickE2 = cents(r.value), hasClick = true)
      case "error" =>
        if (r.k >= 90) s = s.copy(failed = true)
      case _ => ()
    }
    s
  }

  private def render(key: Long, s: St): TransferRow = TransferRow(
    transfer_key = key,
    tenant = "t" + (key % 10),
    started_ms = if (s.started == Long.MaxValue) -1L else s.started,
    completed_ms = if (s.completed == Long.MinValue) -1L else s.completed,
    amount = if (s.hasAmount) java.math.BigDecimal.valueOf(s.amountE2, 2).toPlainString else "",
    last_click_value = if (s.hasClick) java.math.BigDecimal.valueOf(s.lastClickE2, 2).toPlainString else "",
    status = if (s.failed) "FAILED" else if (s.done) "COMPLETED" else "IN_PROGRESS",
    n_events = s.n)

  /** The flatMapGroupsWithState update function: fold the batch's
    * records into the per-instance state, emit the refreshed entity.
    */
  def update(key: Long, recs: Iterator[Rec], state: GroupState[St]): Iterator[TransferRow] = {
    val st = recs.foldLeft(state.getOption.getOrElse(EmptySt))(fold)
    state.update(st)
    Iterator.single(render(key, st))
  }

  // ------------------------------------------- bounded-state plumbing

  /** Watermark delay of the bounded keyed folds: how long a record may
    * trail the stream's max event time before it counts as late.
    */
  val FoldWatermark = "30 minutes"

  /** Idle horizon of the bounded keyed folds: a key's state is evicted
    * once the watermark passes its newest record by this much — the
    * bound the reference effectively gets by flushing completed
    * entities to MySQL instead of caching every instance forever
    * (Inflight*Manager caches + the repository save).
    */
  val EvictHorizonMs: Long = 60L * 60 * 1000L

  /** Wrap a keyed fold with watermark-driven state EVICTION — the
    * 100 TB posture for the five entity/top-n folds, whose PER-KEY
    * state is bounded but whose key set is every instance ever seen:
    *
    *   - each batch re-arms the key's event-time timeout at
    *     (newest record + [[EvictHorizonMs]]); when the watermark
    *     passes it the state is REMOVED and nothing is emitted — the
    *     idempotent keyed sink already holds the key's final row, so
    *     eviction is invisible downstream;
    *   - records at-or-behind the watermark are DROPPED before the
    *     fold (the reference's first-write rule makes late duplicates
    *     droppable) so a straggler can never RESTART an evicted key's
    *     state and overwrite the sunk row with a partial entity —
    *     the corruption StreamingSpec pins against.
    *
    * State is then O(keys active within the horizon), not O(keys ever
    * seen). Exact replay under ARBITRARY disorder (the chunked
    * adversarial-order specs) needs the unbounded form instead — the
    * watermark is precisely a bound on tolerated disorder.
    */
  private def evicting[S, O](inner: (Long, Iterator[Rec], GroupState[S]) => Iterator[O])
      : (Long, Iterator[Rec], GroupState[S]) => Iterator[O] = (key, recs, state) => {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val wm = state.getCurrentWatermarkMs()
      var maxTs = Long.MinValue
      val live = recs.filter { r =>
        if (r.ts_ms > maxTs) maxTs = r.ts_ms
        r.ts_ms >= wm
      }
      // hasNext pulls through the filter, so a no-live-records batch
      // is detected without running the fold (which would re-emit —
      // or worse, resurrect — this key from an empty accumulator)
      if (!live.hasNext) Iterator.empty
      else {
        val out = inner(key, live, state)
        // every inner fold is strict (foldLeft), so maxTs is final
        state.setTimeoutTimestamp(math.max(maxTs, wm) + EvictHorizonMs)
        out
      }
    }
  }

  /** Shared keyed-fold constructor: bounded (watermark +
    * EventTimeTimeout eviction, the production default) or unbounded
    * (NoTimeout — exact replay under arbitrary disorder, used by the
    * adversarial-order specs).
    */
  private def foldStream[S: org.apache.spark.sql.Encoder, O: org.apache.spark.sql.Encoder](
      events: DataFrame, bounded: Boolean)(
      inner: (Long, Iterator[Rec], GroupState[S]) => Iterator[O]): Dataset[O] = {
    import events.sparkSession.implicits._
    if (bounded)
      toRecs(events)
        .withColumn("event_time", timestamp_millis(col("ts_ms")))
        .withWatermark("event_time", FoldWatermark)
        .as[Rec]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
          evicting(inner))
    else
      toRecs(events)
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(inner)
  }

  /** events DataFrame (batch or streaming) → typed record stream:
    * parse + route, dropping the record classes the reference drops
    * is NOT done here — the state machine consumes every class
    * (routing demo lives in ImporterCore.impParseRoute).
    */
  def toRecs(events: DataFrame): Dataset[Rec] = {
    import events.sparkSession.implicits._
    val k =
      if (events.columns.contains("props"))
        coalesce(get_json_object(col("props"), "$.k").cast(LongType), lit(0L))
      else col("k")
    events.select(
      col("event_id"), col("ts_ms"), col("user_id"), col("event_type"),
      col("value"), k.as("k"))
      .as[Rec]
  }

  /** Incrementally materialized transfers from a streaming events
    * source. Bounded state by default ([[evicting]]); `bounded=false`
    * keeps every key forever for exact replay under arbitrary
    * disorder.
    */
  def transfersStream(events: DataFrame, bounded: Boolean = true): Dataset[TransferRow] = {
    import events.sparkSession.implicits._
    foldStream[St, TransferRow](events, bounded)(update)
  }

  // ------------------------------------------------ TransactionRequest

  /** TransactionRequest streaming state: LAST-WRITE-WINS on the state
    * signal (every state-carrying record overwrites; latest ord wins —
    * ImporterCore.impEntityTxnreq's arg-max, folded incrementally),
    * plus the scalar registry columns (VariableParser.java:71-83):
    * authType / payerDfspId / payeeDfspId, each with its own
    * last-write mark.
    */
  case class TxnSt(state: String, stateTs: Long, stateId: Long, started: Long,
    completed: Long, amountE2: Long, hasAmount: Boolean,
    auth: String, authTs: Long, authId: Long,
    payerDfsp: String, payerDfspTs: Long, payerDfspId_ : Long,
    payeeDfsp: String, payeeDfspTs: Long, payeeDfspId_ : Long,
    n: Long)

  private val EmptyTxnSt = TxnSt("IN_PROGRESS", Long.MinValue, Long.MinValue,
    Long.MaxValue, Long.MinValue, 0L, hasAmount = false,
    "NONE", Long.MinValue, Long.MinValue,
    "", Long.MinValue, Long.MinValue,
    "", Long.MinValue, Long.MinValue,
    0L)

  case class TxnRow(txn_key: Long, tenant: String, state: String,
    started_ms: Long, completed_ms: Long, amount: String,
    auth_type: String, payer_dfsp_id: String, payee_dfsp_id: String,
    n_events: Long)

  private def txnSignal(r: Rec): Option[String] = {
    val fatal = r.k >= 90
    r.event_type match {
      case "signup" => Some("RECEIVED")
      case "view" => Some(if (fatal) "FAILED" else "RECEIVED")
      // k ∈ [80,90): the request-response reject arm — all five
      // reference states (TransactionRequestState.java:7) reachable
      case "click" => Some(
        if (fatal) "FAILED" else if (r.k >= 80) "REJECTED" else "IN_PROGRESS")
      case "purchase" => Some(if (fatal) "FAILED" else "ACCEPTED")
      case "error" if fatal => Some("FAILED")
      case _ => None
    }
  }

  private def foldTxn(st: TxnSt, r: Rec): TxnSt = {
    var s = st.copy(n = st.n + 1)
    txnSignal(r).foreach { sig =>
      if (isAfter(r.ts_ms, r.event_id, s.stateTs, s.stateId))
        s = s.copy(state = sig, stateTs = r.ts_ms, stateId = r.event_id)
    }
    if (r.event_type == "signup") {
      s = s.copy(started = math.min(s.started, r.ts_ms))
      // authType (VariableParser:71; parseTransactionRequest:268-269
      // NONE default) — last write wins
      if (isAfter(r.ts_ms, r.event_id, s.authTs, s.authId)) {
        val m = r.k % 3
        val a = if (m == 0) "NONE" else if (m == 1) "OTP" else "BIO"
        s = s.copy(auth = a, authTs = r.ts_ms, authId = r.event_id)
      }
    }
    if (r.event_type == "view" &&
        isAfter(r.ts_ms, r.event_id, s.payerDfspTs, s.payerDfspId_))
      // partyLookupFspId → payerDfspId (VariableParser:73)
      s = s.copy(payerDfsp = "dfsp-" + (r.k % 10),
        payerDfspTs = r.ts_ms, payerDfspId_ = r.event_id)
    if (r.event_type == "click" && r.user_id % 2 != 0 &&
        isAfter(r.ts_ms, r.event_id, s.payeeDfspTs, s.payeeDfspId_))
      // initiatorFspId → payeeDfspId, OUTGOING-only
      // (parseInitiatorFspId:285-289)
      s = s.copy(payeeDfsp = "fsp-" + (r.k % 10),
        payeeDfspTs = r.ts_ms, payeeDfspId_ = r.event_id)
    if (r.event_type == "purchase")
      s = s.copy(completed = math.max(s.completed, r.ts_ms),
        amountE2 = s.amountE2 + cents(r.value), hasAmount = true)
    s
  }

  def updateTxn(key: Long, recs: Iterator[Rec], state: GroupState[TxnSt]): Iterator[TxnRow] = {
    val st = recs.foldLeft(state.getOption.getOrElse(EmptyTxnSt))(foldTxn)
    state.update(st)
    Iterator.single(TxnRow(
      txn_key = key,
      tenant = "t" + (key % 10),
      state = st.state,
      started_ms = if (st.started == Long.MaxValue) -1L else st.started,
      completed_ms = if (st.completed == Long.MinValue) -1L else st.completed,
      amount = if (st.hasAmount) java.math.BigDecimal.valueOf(st.amountE2, 2).toPlainString else "",
      auth_type = st.auth,
      payer_dfsp_id = st.payerDfsp,
      payee_dfsp_id = st.payeeDfsp,
      n_events = st.n))
  }

  def txnreqStream(events: DataFrame, bounded: Boolean = true): Dataset[TxnRow] = {
    import events.sparkSession.implicits._
    foldStream[TxnSt, TxnRow](events, bounded)(updateTxn)
  }

  /** Streaming TransactionRequest materialization, driver-checked
    * against the SAME oracle as the batch imp_entity_txnreq.
    */
  def runTxnreqToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events => txnreqStream(events).toDF(), "txn_key")
      .select("txn_key", "tenant", "state", "started_ms", "completed_ms",
        "amount", "auth_type", "payer_dfsp_id", "payee_dfsp_id", "n_events")
      .orderBy("txn_key")

  // ------------------------------------------------------------ Batch

  /** Batch entity streaming state: counters + lifecycle
    * (InflightBatchManager semantics — all order-insensitive) plus
    * the registry's metadata strings (batchParsers:88-91: requestFile
    * from `fileName`, note) with their own last-write marks.
    */
  case class BatchSt(started: Long, completed: Long, total: Long,
    done: Long, failed: Long,
    reqFile: String, reqFileTs: Long, reqFileId: Long,
    note: String, noteTs: Long, noteId: Long)

  private val EmptyBatchSt = BatchSt(Long.MaxValue, Long.MinValue, 0L, 0L, 0L,
    "", Long.MinValue, Long.MinValue, "", Long.MinValue, Long.MinValue)

  case class BatchRow(batch_key: Long, batch_id: String, request_id: String,
    request_file: String, note: String,
    started_ms: Long, completed_ms: Long, total_transactions: Long,
    ongoing: Long, failed: Long, completed: Long)

  private def foldBatch(st: BatchSt, r: Rec): BatchSt = {
    var s = st
    r.event_type match {
      case "signup" =>
        s = s.copy(started = math.min(s.started, r.ts_ms))
        if (isAfter(r.ts_ms, r.event_id, s.reqFileTs, s.reqFileId))
          s = s.copy(reqFile = s"f-${r.k}.csv",
            reqFileTs = r.ts_ms, reqFileId = r.event_id)
      case "purchase" => s = s.copy(completed = math.max(s.completed, r.ts_ms),
        total = s.total + 1, done = s.done + 1)
      case "view" =>
        s = s.copy(total = s.total + 1)
        if (isAfter(r.ts_ms, r.event_id, s.noteTs, s.noteId))
          s = s.copy(note = "note-" + (r.k % 5),
            noteTs = r.ts_ms, noteId = r.event_id)
      case "click" => s = s.copy(total = s.total + 1)
      case "error" => if (r.k >= 90) s = s.copy(failed = s.failed + 1)
      case _ => ()
    }
    s
  }

  def updateBatch(key: Long, recs: Iterator[Rec], state: GroupState[BatchSt]): Iterator[BatchRow] = {
    val st = recs.foldLeft(state.getOption.getOrElse(EmptyBatchSt))(foldBatch)
    state.update(st)
    Iterator.single(BatchRow(
      batch_key = key,
      batch_id = "b" + (key % 20),
      request_id = s"req-$key",
      request_file = st.reqFile,
      note = st.note,
      started_ms = if (st.started == Long.MaxValue) -1L else st.started,
      completed_ms = if (st.completed == Long.MinValue) -1L else st.completed,
      total_transactions = st.total,
      ongoing = math.max(st.total - st.done, 0L),
      failed = st.failed,
      completed = st.done))
  }

  def batchesStream(events: DataFrame, bounded: Boolean = true): Dataset[BatchRow] = {
    import events.sparkSession.implicits._
    foldStream[BatchSt, BatchRow](events, bounded)(updateBatch)
  }

  /** Streaming Batch materialization — same oracle as the batch
    * imp_entity_batches.
    */
  def runBatchesToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events => batchesStream(events).toDF()
      .withColumn("tenant", concat(lit("t"), col("batch_key") % 10)), "batch_key")
      .select("batch_key", "batch_id", "request_id", "request_file", "note",
        "started_ms", "completed_ms",
        "total_transactions", "ongoing", "failed", "completed")
      .orderBy("batch_key")

  // ------------------------------------------------------------- Wide

  /** Streaming wide-entity state: one last-write mark per WRITER
    * GROUP, because the registry's columns have different (sometimes
    * overlapping) writer sets (VariableParser.java:41-52):
    *
    *   - party/amount: channelRequest AND quoteSwitchRequest (same
    *     columns, two classes — one shared mark);
    *   - transactionId + dfsp ids: quoteSwitchRequest only;
    *   - completedMs: CREATE and PREPARE share a mark (:174-183,
    *     :189-198) while transferState is CREATE-only;
    *   - payer fee/currency/quoteCode: outgoing-routed
    *     localQuoteResponse;
    *   - payee fee/currency: incoming-routed localQuoteResponse AND
    *     the un-routed payeeQuoteResponse (shared mark), but
    *     payee_quote_code is localQuoteResponse-only (its own mark);
    *   - errorInformation + status: the dual error parser.
    */
  case class LastMark(ts: Long, id: Long)
  case class PartySt(m: LastMark, payerPartyId: String, payerIdType: String,
    payeePartyId: String, payeeIdType: String, amount: String, currency: String)
  case class QswSt(m: LastMark, transactionId: String, payerDfsp: String,
    payeeDfsp: String)
  case class RespSt(stateM: LastMark, transferState: String,
    cmplM: LastMark, completedMs: Long)
  case class PayerQSt(m: LastMark, fee: String, currency: String, code: String)
  case class PayeeFSt(m: LastMark, fee: String, currency: String)
  case class QcSt(m: LastMark, code: String)
  case class ErrSt(m: LastMark, info: String, status: String)
  case class WideSt(party: PartySt, qsw: QswSt, resp: RespSt,
    payerQ: PayerQSt, payeeF: PayeeFSt, payeeQc: QcSt, err: ErrSt)

  private val NoMark = LastMark(Long.MinValue, Long.MinValue)
  private val EmptyWideSt = WideSt(
    PartySt(NoMark, "", "", "", "", "", ""),
    QswSt(NoMark, "", "", ""),
    RespSt(NoMark, "", NoMark, -1L),
    PayerQSt(NoMark, "", "", ""),
    PayeeFSt(NoMark, "", ""),
    QcSt(NoMark, ""),
    ErrSt(NoMark, "", "IN_PROGRESS"))

  private def after(r: Rec, m: LastMark): Boolean =
    isAfter(r.ts_ms, r.event_id, m.ts, m.id)

  private def markOf(r: Rec): LastMark = LastMark(r.ts_ms, r.event_id)

  /** tenant is carried for the sink's partition routing and dropped
    * from the oracle-checked projection (the batch entity has none).
    */
  case class WideRow(transfer_key: Long, tenant: String,
    payer_party_id: String, payer_id_type: String,
    payee_party_id: String, payee_id_type: String,
    amount: String, currency: String,
    transaction_id: String, payer_dfsp_id: String, payee_dfsp_id: String,
    completed_ms: Long, transfer_state: String,
    payer_fee: String, payer_fee_currency: String, payer_quote_code: String,
    payee_fee: String, payee_fee_currency: String, payee_quote_code: String,
    error_information: String, status: String)

  // Jackson ships on Spark's classpath; ObjectMapper.readTree is
  // thread-safe after construction
  private lazy val json = new com.fasterxml.jackson.databind.ObjectMapper()

  private val WideTsFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  private def amountStr(v: Double): String =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP).toPlainString

  /** Per-record nested-payload round-trip: SYNTHESIZE the variable's
    * JSON document, then parse it back and extract multi-level paths
    * (JSON Pointer) — the streaming mirror of the batch side's
    * to_json/from_json, so the stream path also exercises real JSON
    * parsing per record, like the reference's VariableParser.
    */
  /** Parse a synthesized `transferResponse-*` document and return the
    * epoch-millis of its completedTimestamp (both CREATE and PREPARE
    * carry one — VariableParser:174-183 / :189-198).
    */
  private def completedOf(r: Rec, withState: Boolean): (Long, String) = {
    val root = json.createObjectNode()
    root.put("completedTimestamp", WideTsFmt.format(
      java.time.Instant.ofEpochMilli(r.ts_ms).atOffset(java.time.ZoneOffset.UTC)))
    if (withState) root.put("transferState", "COMMITTED")
    val doc = json.readTree(json.writeValueAsString(root))
    val parsedMs = java.time.LocalDateTime
      .parse(doc.at("/completedTimestamp").asText(), WideTsFmt)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    (parsedMs, doc.at("/transferState").asText())
  }

  private def foldWide(st: WideSt, r: Rec): WideSt = r.event_type match {
    case "signup" if r.k < 50 && after(r, st.party.m) =>
      // channelRequest — writes the shared party/amount group
      val root = json.createObjectNode()
      root.putObject("payer").putObject("partyIdInfo")
        .put("partyIdType", "MSISDN")
        .put("partyIdentifier", "277" + (r.user_id % 100))
      root.putObject("payee").putObject("partyIdInfo")
        .put("partyIdType", "ACCOUNT_ID")
        .put("partyIdentifier", "acct-" + (r.user_id % 50))
      root.putObject("amount")
        .put("amount", amountStr(r.value))
        .put("currency", if (r.user_id % 2 == 0) "USD" else "KES")
      val doc = json.readTree(json.writeValueAsString(root))
      st.copy(party = PartySt(markOf(r),
        payerPartyId = doc.at("/payer/partyIdInfo/partyIdentifier").asText(),
        payerIdType = doc.at("/payer/partyIdInfo/partyIdType").asText(),
        payeePartyId = doc.at("/payee/partyIdInfo/partyIdentifier").asText(),
        payeeIdType = doc.at("/payee/partyIdInfo/partyIdType").asText(),
        amount = doc.at("/amount/amount").asText(),
        currency = doc.at("/amount/currency").asText()))
    case "signup" if r.k >= 50 =>
      // quoteSwitchRequest (parseQuoteSwitchRequest:139-153) — writes
      // the SAME party/amount group plus transactionId + fspIds
      var s = st
      val afterParty = after(r, s.party.m)
      val afterQsw = after(r, s.qsw.m)
      if (afterParty || afterQsw) {
        val root = json.createObjectNode()
        root.put("transactionId", s"txn-${r.user_id}-${r.event_id % 100}")
        val payer = root.putObject("payer").putObject("partyIdInfo")
        payer.put("partyIdType", "IBAN")
          .put("partyIdentifier", "PI" + (r.user_id % 77))
          .put("fspId", "fsp" + (r.k % 10))
        val payee = root.putObject("payee").putObject("partyIdInfo")
        payee.put("partyIdType", "MSISDN")
          .put("partyIdentifier", "266" + (r.user_id % 99))
          .put("fspId", "fsp" + ((r.k + 1) % 10))
        root.putObject("amount")
          .put("amount", amountStr(r.value))
          .put("currency", if (r.k % 2 == 0) "EUR" else "GHS")
        val doc = json.readTree(json.writeValueAsString(root))
        if (afterParty)
          s = s.copy(party = PartySt(markOf(r),
            payerPartyId = doc.at("/payer/partyIdInfo/partyIdentifier").asText(),
            payerIdType = doc.at("/payer/partyIdInfo/partyIdType").asText(),
            payeePartyId = doc.at("/payee/partyIdInfo/partyIdentifier").asText(),
            payeeIdType = doc.at("/payee/partyIdInfo/partyIdType").asText(),
            amount = doc.at("/amount/amount").asText(),
            currency = doc.at("/amount/currency").asText()))
        if (afterQsw)
          s = s.copy(qsw = QswSt(markOf(r),
            transactionId = doc.at("/transactionId").asText(),
            payerDfsp = doc.at("/payer/partyIdInfo/fspId").asText(),
            payeeDfsp = doc.at("/payee/partyIdInfo/fspId").asText()))
      }
      s
    case "purchase" =>
      // transferResponse-CREATE: transferState last-write on its own
      // mark, completedAt on the shared CREATE+PREPARE mark — one
      // JSON round-trip serves both guards
      var s = st
      val afterState = after(r, s.resp.stateM)
      val afterCmpl = after(r, s.resp.cmplM)
      if (afterState || afterCmpl) {
        val (ms, state) = completedOf(r, withState = true)
        var resp = s.resp
        if (afterState) resp = resp.copy(stateM = markOf(r), transferState = state)
        if (afterCmpl) resp = resp.copy(cmplM = markOf(r), completedMs = ms)
        s = s.copy(resp = resp)
      }
      s
    case "click" if after(r, st.resp.cmplM) =>
      // transferResponse-PREPARE: writes the same completedAt field
      val (ms, _) = completedOf(r, withState = false)
      st.copy(resp = st.resp.copy(cmplM = markOf(r), completedMs = ms))
    case "view" if r.k < 50 =>
      // localQuoteResponse: direction-routed at FOLD time — INCOMING
      // (even key) → payee fee + quote code, OUTGOING → payer group
      val incoming = r.user_id % 2 == 0
      val needPayee = incoming && (after(r, st.payeeF.m) || after(r, st.payeeQc.m))
      val needPayer = !incoming && after(r, st.payerQ.m)
      if (needPayee || needPayer) {
        val root = json.createObjectNode()
        root.putObject("fspFee")
          .put("amount", amountStr(r.value))
          .put("currency", if (r.event_id % 2 == 0) "USD" else "TZS")
        root.put("quoteCode", "LQ-" + (r.event_id % 1000))
        val doc = json.readTree(json.writeValueAsString(root))
        val fee = doc.at("/fspFee/amount").asText()
        val cur = doc.at("/fspFee/currency").asText()
        val code = doc.at("/quoteCode").asText()
        var s = st
        if (needPayer) s = s.copy(payerQ = PayerQSt(markOf(r), fee, cur, code))
        if (incoming && after(r, s.payeeF.m))
          s = s.copy(payeeF = PayeeFSt(markOf(r), fee, cur))
        if (incoming && after(r, s.payeeQc.m))
          s = s.copy(payeeQc = QcSt(markOf(r), code))
        s
      } else st
    case "view" if after(r, st.payeeF.m) =>
      // payeeQuoteResponse (parsePayeeQuoteResponse:168-172): UN-routed
      // payee fee — shares the payee-fee mark with the incoming-routed
      // localQuoteResponse; quote code untouched
      val root = json.createObjectNode()
      root.putObject("payeeFspFee")
        .put("amount", amountStr(r.value))
        .put("currency", if (r.event_id % 2 == 0) "XOF" else "NGN")
      val doc = json.readTree(json.writeValueAsString(root))
      st.copy(payeeF = PayeeFSt(markOf(r),
        doc.at("/payeeFspFee/amount").asText(),
        doc.at("/payeeFspFee/currency").asText()))
    case "error" if after(r, st.err.m) =>
      // errorInformation dual parser (VariableParser:51-52): store the
      // raw string AND run the transferCreateFailed state write
      // ("false" = book-funds success → COMPLETED, else FAILED)
      val raw = if (r.k >= 90) s"err-${r.k}" else "false"
      st.copy(err = ErrSt(markOf(r), raw,
        if (raw == "false") "COMPLETED" else "FAILED"))
    case _ => st
  }

  def updateWide(key: Long, recs: Iterator[Rec], state: GroupState[WideSt]): Iterator[WideRow] = {
    val st = recs.foldLeft(state.getOption.getOrElse(EmptyWideSt))(foldWide)
    state.update(st)
    Iterator.single(WideRow(
      transfer_key = key,
      tenant = "t" + (key % 10),
      payer_party_id = st.party.payerPartyId, payer_id_type = st.party.payerIdType,
      payee_party_id = st.party.payeePartyId, payee_id_type = st.party.payeeIdType,
      amount = st.party.amount, currency = st.party.currency,
      transaction_id = st.qsw.transactionId,
      payer_dfsp_id = st.qsw.payerDfsp, payee_dfsp_id = st.qsw.payeeDfsp,
      completed_ms = st.resp.completedMs, transfer_state = st.resp.transferState,
      payer_fee = st.payerQ.fee,
      payer_fee_currency = st.payerQ.currency,
      payer_quote_code = st.payerQ.code,
      payee_fee = st.payeeF.fee,
      payee_fee_currency = st.payeeF.currency,
      payee_quote_code = st.payeeQc.code,
      error_information = st.err.info,
      status = st.err.status))
  }

  def wideStream(events: DataFrame, bounded: Boolean = true): Dataset[WideRow] = {
    import events.sparkSession.implicits._
    foldStream[WideSt, WideRow](events, bounded)(updateWide)
  }

  /** Streaming wide-entity materialization — same oracle as the batch
    * imp_entity_wide (nested-JSON extraction semantics included).
    */
  def runWideToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events => wideStream(events).toDF(), "transfer_key")
      .select("transfer_key", "payer_party_id", "payer_id_type",
        "payee_party_id", "payee_id_type", "amount", "currency",
        "transaction_id", "payer_dfsp_id", "payee_dfsp_id",
        "completed_ms", "transfer_state",
        "payer_fee", "payer_fee_currency", "payer_quote_code",
        "payee_fee", "payee_fee_currency", "payee_quote_code",
        "error_information", "status")
      .orderBy("transfer_key")

  // ------------------------------------------------------- Window agg

  /** Tumbling-window aggregation over event time — the third core
    * streaming shape next to the keyed folds and the dedup: per
    * (event_type, 1 h window), count + exact decimal sum, refreshed
    * per micro-batch in update mode and upserted by window key.
    *
    * The driver-checked query runs UN-watermarked: every window stays
    * in state, so the result is exact under ANY micro-batch split —
    * the same contract as the batch groupBy it answers the oracle
    * with. The 100 TB posture adds a watermark
    * ([[windowStreamBounded]]): state holds only windows younger than
    * the horizon, at the documented cost of DROPPING rows that arrive
    * later than it (StreamingSpec pins exactly that semantics).
    */
  def windowStream(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      timestamp_millis(col("ts_ms")).as("ts"), col("value"))
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(graft.functions.Portable.dec2(col("value"))).as("sv"))

  /** Bounded-state variant: windows older than the horizon are evicted
    * and later arrivals for them dropped.
    */
  def windowStreamBounded(events: DataFrame, horizon: String): DataFrame =
    events.select(col("event_type"),
      timestamp_millis(col("ts_ms")).as("ts"), col("value"))
      .withWatermark("ts", horizon)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(graft.functions.Portable.dec2(col("value"))).as("sv"))

  /** Driver-checked streaming window aggregate — oracle = the batch
    * hour-bucket groupBy.
    */
  def runWindowToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events =>
      windowStream(events)
        .select(col("event_type"),
          expr("unix_millis(window.start) div 3600000").as("window_h"),
          col("n"),
          graft.functions.Portable.moneyStr(col("sv")).as("sum_value"))
        .withColumn("wkey", concat(col("event_type"), lit("_"), col("window_h")))
        .withColumn("tenant", col("event_type")),
      "wkey")
      .select("event_type", "window_h", "n", "sum_value")
      .orderBy("event_type", "window_h")

  // -------------------------------------------------- Streaming top-n

  /** One emitted leaderboard row. */
  case class TopRow(user_id: Long, rnk: Long, event_id: Long, event_type: String)

  /** Streaming per-key top-n in BOUNDED state: each user's running
    * top-3 events by value, held as an n-row selection in
    * `flatMapGroupsWithState` — the arbitrary-state shape for an
    * aggregate SQL streaming cannot express (per-key ORDER BY…LIMIT).
    * Bounded selection is a monoid (top-3 of a union = top-3 of
    * merged top-3s), so arrival order is irrelevant and the state per
    * key is exactly n rows forever. Each batch re-emits a touched
    * user's FULL current leaderboard under stable (user, rank) keys,
    * so the keyed sink upsert replaces displaced entries instead of
    * leaking them. Answers the batch q_window_topn's SAME oracle.
    */
  private def updateTopn(user: Long, recs: Iterator[Rec],
      state: GroupState[Seq[Rec]]): Iterator[TopRow] = {
    // dedup the merge by event_id: a re-delivered event (at-least-once
    // source) must not occupy two leaderboard ranks — within Spark's
    // exactly-once state replay this is a no-op, but the monoid stays
    // correct against duplicate delivery at the source
    val merged = (state.getOption.getOrElse(Seq.empty) ++ recs)
      .groupBy(_.event_id).map(_._2.head).toSeq
      .sortBy(r => (-r.value, r.event_id)).take(3)
    state.update(merged)
    merged.iterator.zipWithIndex.map { case (r, i) =>
      TopRow(user, i + 1L, r.event_id, r.event_type)
    }
  }

  def topnStream(events: DataFrame, bounded: Boolean = true): Dataset[TopRow] = {
    import events.sparkSession.implicits._
    foldStream[Seq[Rec], TopRow](events, bounded)(updateTopn)
  }

  /** Driver-checked streaming leaderboard — oracle = the batch
    * per-user window top-3.
    */
  def runTopnToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events =>
      topnStream(events).toDF()
        .withColumn("top_key", concat(col("user_id"), lit("_"), col("rnk")))
        .withColumn("tenant", concat(lit("t"), col("user_id") % 10)),
      "top_key")
      .select("user_id", "rnk", "event_id", "event_type")
      .orderBy("user_id", "rnk")

  // ------------------------------------------------ Streaming sketch

  /** Streaming distinct counting in CONSTANT state: the HLL register
    * table maintained as a streaming aggregate. The state is exactly
    * groups × 256 register rows no matter how many billions of keys
    * stream through — where [[dedupStream]]'s exact state grows with
    * distinct keys, this is the sketch answer to infinite-stream
    * cardinality. Update mode re-emits a register row only when its
    * max grows; the keyed sink upserts it. Same register derivation —
    * and the SAME oracle — as the batch
    * [[graft.operators.ApproxOps.sketchHll]]: register-wise max is
    * order-insensitive and idempotent, so any micro-batch split folds
    * to the identical table.
    */
  def hllStream(events: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    graft.operators.ApproxOps.hllRegisters(events)
  }

  /** Driver-checked streaming register table — oracle = the batch
    * sketch_hll SQL.
    */
  def runHllToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events =>
      hllStream(events)
        .withColumn("rkey", concat(col("event_type"), lit("_"), col("bucket")))
        .withColumn("tenant", col("event_type")),
      "rkey")
      .select("event_type", "bucket", "max_rho")
      .orderBy("event_type", "bucket")

  // ------------------------------------------------- Session windows

  /** Native `session_window` sessionization — the streaming
    * counterpart of the batch lag+cumsum q_sessionize: per user,
    * events within a 30-minute gap merge into one session whose
    * window GROWS as events arrive; state is evicted once the
    * watermark passes a session's close. Boundary semantics (verified
    * empirically on Spark 4.1.2): an event at EXACTLY gap distance
    * still MERGES into the session — the engine's merge test is
    * inclusive — so the oracle breaks only on `diff > gap`, the same
    * rule as the batch q_sessionize.
    *
    * Session keys: `window.start` equals the session's FIRST event
    * time, so when events arrive in event-time order a session only
    * ever extends under a stable (user, start) key — the upsert-key
    * contract the chunked spec pins. Out-of-order arrivals can MERGE
    * sessions (the merged session's start moves earlier); exact
    * replay then needs the sink to retract the absorbed keys — the
    * reference's importer has the same read-modify-write there, and
    * the gate run (AvailableNow, one batch) is unaffected.
    */
  def sessionizeStream(events: DataFrame): DataFrame =
    events.select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).cast(LongType).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        (unix_millis(col("session_window.end")) - lit(30L * 60 * 1000)).as("session_last_ms"),
        col("n_events"))

  /** Driver-checked session windows — oracle = the batch gap-break
    * sessionization with the session_window boundary rule.
    */
  def runSessionizeToCompletion(spark: SparkSession, dir: String): DataFrame =
    // session windows support append/complete only (update would emit
    // partial sessions under moving keys). Append holds back sessions
    // younger than watermark − gap at stream end, so the driver-checked
    // run uses COMPLETE (+ keyed upsert = idempotent): every session is
    // emitted, exact vs the batch oracle. Production tails use append
    // with a closing grace period instead.
    runPipeline(spark, dir, events =>
      sessionizeStream(events)
        .withColumn("sess_key", concat(col("user_id"), lit("_"), col("session_start_ms")))
        .withColumn("tenant", concat(lit("t"), col("user_id") % 10)),
      "sess_key", mode = "complete")
      .select("user_id", "session_start_ms", "session_last_ms", "n_events")
      .orderBy("user_id", "session_start_ms")

  // ------------------------------------------------------ Stream join

  /** Event-time stream-stream join — clicks matched to the same
    * user's purchases within the following hour. Both sides carry
    * watermarks and the join condition carries the event-time range,
    * which is what lets Spark EVICT state (a click older than
    * watermark − 1 h can never match again); an INNER join emits each
    * match as soon as both sides are seen, so results are exact under
    * any micro-batch split — cross-batch matches come out of the
    * buffered state, pinned by the chunked StreamingSpec run.
    */
  def joinStream(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        timestamp_millis(col("ts_ms")).as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        timestamp_millis(col("ts_ms")).as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Driver-checked stream-stream join — oracle = the batch interval
    * self-join.
    */
  def runJoinToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events =>
      joinStream(events)
        .select(col("click_id"), col("purchase_id"), col("user_id"))
        .withColumn("pair_key", concat(col("click_id"), lit("_"), col("purchase_id")))
        .withColumn("tenant", concat(lit("t"), col("user_id") % 10)),
      "pair_key", mode = "append")
      .select("click_id", "purchase_id", "user_id")
      .orderBy("click_id", "purchase_id")

  // ------------------------------------------------------------ Dedup

  /** Streaming exact dedup on (user_id, event_type) — the streaming
    * mirror of the reference's first-write dedup guards
    * (RecordParser.processVariable/processTask): emit each key once,
    * drop every later duplicate. `dropDuplicates` keeps one state row
    * PER DISTINCT KEY, the same cardinality the batch distinct
    * shuffles — at 100 TB the state is bounded with a watermark
    * (`withWatermark` + per-key expiry) and exactness is restored by
    * the keyed idempotent sink: a key re-emitted after its state
    * expired upserts onto its existing row, a no-op. The watermarked
    * variant and that end-to-end property are pinned in StreamingSpec.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")

  /** The BOUNDED-state variant: watermark + per-key expiry
    * (`dropDuplicatesWithinWatermark`). State holds only keys younger
    * than the horizon — the 100 TB shape — at the cost of re-emitting
    * a key whose duplicates straddle an expired horizon; the keyed
    * idempotent sink absorbs the re-emission (upsert onto the existing
    * row), restoring exact end-to-end semantics. StreamingSpec pins
    * both halves (re-emission happens; the sink collapses it).
    */
  def dedupStreamBounded(events: DataFrame, horizon: String): DataFrame =
    events.select(col("user_id"), col("event_type"),
      timestamp_millis(col("ts_ms")).as("ts"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")

  /** Driver-checked streaming dedup — oracle = batch SELECT DISTINCT. */
  def runDedupToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events =>
      dedupStream(events)
        .withColumn("dedup_key", concat(col("user_id"), lit("_"), col("event_type")))
        .withColumn("tenant", concat(lit("t"), col("user_id") % 10)),
      "dedup_key")
      .select("user_id", "event_type")
      .orderBy("user_id", "event_type")

  // --------------------------------------------------------- plumbing

  /** Shared end-to-end runner: stream the sf dir's events file through
    * `transform` with an AvailableNow trigger into the tenant-routed
    * upsert sink, then read the sink back.
    */
  private def runPipeline(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame, key: String,
      mode: String = "update"): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    val sinkDir = s"$work/sink"
    // Raw file schema (ts is parquet TIMESTAMP(NANOS) read as long —
    // Tables.events sets the legacy conf); normalization then comes
    // from the SAME helper the batch loader uses.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the streaming file source wants a directory: stream the sf dir
    // with a glob pinned to the events file
    val stream = Tables.normalizeEvents(spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    val q = transform(stream)
      .writeStream
      .outputMode(mode)
      .option("checkpointLocation", s"$work/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TenantUpsertSink.upsert(sinkDir, batch, key)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // detach from the temp files so the work dir can be reclaimed (a
    // lazy plan over deleted parquet would fail at consume time);
    // tracked in Scratch so the session can sweep it after consumption
    val result = graft.Scratch.cp(TenantUpsertSink.readCurrent(spark, sinkDir)
      .getOrElse(throw new IllegalStateException(s"no data reached the sink at $sinkDir")))
    def rm(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(work))
    result
  }

  /** Driver-checked transfers run — oracle-identical to the batch
    * imp_entity_transfers.
    */
  def runToCompletion(spark: SparkSession, dir: String): DataFrame =
    runPipeline(spark, dir, events => transfersStream(events).toDF(), "transfer_key")
      .select("transfer_key", "tenant", "started_ms", "completed_ms",
        "amount", "last_click_value", "status", "n_events")
      .orderBy("transfer_key")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_import" -> (runToCompletion _),
    "stream_txnreq" -> (runTxnreqToCompletion _),
    "stream_batches" -> (runBatchesToCompletion _),
    "stream_wide" -> (runWideToCompletion _),
    "stream_dedup" -> (runDedupToCompletion _),
    "stream_window" -> (runWindowToCompletion _),
    "stream_join" -> (runJoinToCompletion _),
    "stream_hll" -> (runHllToCompletion _),
    "stream_topn" -> (runTopnToCompletion _),
    "stream_sessionize" -> (runSessionizeToCompletion _))

  /** Streaming paths answer the SAME oracles as the batch entities. */
  def oracles: Map[String, String] = Map(
    "stream_import" -> graft.operators.ImporterCore.impEntityTransfersSql,
    "stream_txnreq" -> graft.operators.ImporterCore.impEntityTxnreqSql,
    "stream_batches" -> graft.operators.ImporterCore.impEntityBatchesSql,
    "stream_wide" -> graft.operators.ImporterCore.impEntityWideSql,
    "stream_dedup" ->
      """SELECT user_id, event_type FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_window" ->
      """SELECT event_type, epoch_ms(ts) // 3600000 AS window_h,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_ms(p.ts) BETWEEN epoch_ms(c.ts) AND epoch_ms(c.ts) + 3600000
        |ORDER BY click_id, purchase_id""".stripMargin,
    "stream_hll" -> graft.operators.ApproxOps.sketchHllSql,
    "stream_topn" -> graft.operators.Analytics.qWindowTopNSql,
    "stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, ms,
        |    CAST(SUM(CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms, user_id) AS BIGINT) AS sid
        |  FROM g)
        |SELECT user_id, MIN(ms) AS session_start_ms, MAX(ms) AS session_last_ms,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin)
}
