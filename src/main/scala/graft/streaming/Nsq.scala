package graft.streaming

import scala.collection.mutable

/** NSQ transport seam for the queue source — the subscribe-loop semantics
  * of the reference's consumer (`/root/reference/src/Sources/Nsq.php:59-84`:
  * `subscribe(topic, channel, {rdy, timeout}, handler)`) re-expressed as
  * the spool-before-read protocol [[QueueMicroBatchStream]] needs.
  *
  * NSQ's wire rules differ from AMQP's in every dimension that matters to
  * the ingest protocol, which is why this seam is not a rename of
  * [[AmqpIngest]]:
  *
  *  - **ids are stable**: a message keeps its 16-byte id across
  *    re-deliveries (AMQP re-delivers under NEW per-channel tags), so
  *    re-delivery dedup keys on the id itself and there is no tag-refresh
  *    bookkeeping;
  *  - **acks are per-message**: `FIN <id>` finishes exactly one message —
  *    there is no `multiple = true` prefix ack, so commit loops over the
  *    committed spool range and FINs each id (the loop IS the contract);
  *  - **flow control is RDY, and RDY is absolute**: `RDY n` SETS the
  *    server-side ready count (it does not add); nsqd decrements it per
  *    delivery and stops pushing at 0 — the reference's `rdy` option
  *    (`Nsq.php:75`) is this knob;
  *  - **re-delivery is timeout-driven**: an in-flight message not FIN'd
  *    within `timeout` (`Nsq.php:76`) is requeued server-side with
  *    `attempts + 1`; a late FIN for it gets the non-fatal `E_FIN_FAILED`
  *    error frame, NOT a channel teardown (AMQP kills the channel on an
  *    unknown tag).
  *
  * The spool-before-read / ack-on-commit shape is shared with the AMQP
  * seam and for the same reason: NSQ consumption is destructive (an
  * in-flight message cannot be re-read by offset), while Spark's
  * `planInputPartitions(start, end)` may re-execute. [[NsqIngest]] lands
  * every delivery in the offset-addressed [[MessageQueues]] spool before
  * Spark reads it, and FINs only from the stream's `commit(end)`.
  *
  * The REAL client binding is one class implementing [[NsqSubscriberApi]]
  * over a TCP connection speaking the public nsqd protocol (`  V2` magic,
  * `SUB topic channel`, then the frames below); no client jar ships in
  * this image:
  *  - `rdy(n)`    → `RDY n\n`
  *  - `poll()`    → drain a local buffer filled by message frames
  *                  (frame type 2: 8-byte ns timestamp, 2-byte attempts,
  *                  16-byte id, body) — push→pull adaptation, same as the
  *                  AMQP consumer binding
  *  - `fin(id)`   → `FIN id\n` (false ⇔ an `E_FIN_FAILED` error frame)
  *  - `req(id)`   → `REQ id 0\n`
  *  - `touch(id)` → `TOUCH id\n`
  * [[InProcessNsqd]] is the test double at the same interface, enforcing
  * the wire rules above, so `NsqIntegrationSpec` executes the contract
  * without a network.
  */
final case class NsqDelivery(id: String, attempts: Int, body: String)

/** The subscriber operations the ingest consumes — see the binding table
  * in the file header. `fin`/`req`/`touch` return false where a real nsqd
  * answers `E_FIN_FAILED`/`E_REQ_FAILED`/`E_TOUCH_FAILED` (message not in
  * flight on this connection) — non-fatal error frames, the connection
  * stays up.
  */
trait NsqSubscriberApi {
  def rdy(n: Int): Unit
  def poll(): Seq[NsqDelivery]
  def fin(id: String): Boolean
  def req(id: String): Boolean
  def touch(id: String): Boolean
}

/** Publish side of the seam — the reference's sink
  * (`/root/reference/src/Sinks/Nsq.php:60-69`: `publish` one body,
  * `publishMulti` a batch). The real binding speaks `PUB topic\n` /
  * `MPUB topic\n` over the same V2 connection.
  */
trait NsqPublishApi {
  def publish(body: String): Unit
  def mpublish(bodies: Seq[String]): Unit
  def close(): Unit
}

private[streaming] final case class NsqStored(id: String, attempts: Int,
                                              body: String)

/** In-process nsqd fake at protocol semantics (not a transport): one
  * topic+channel, a pending queue, per-connection in-flight windows with
  * deadlines on an injected tick clock, absolute RDY counts decremented
  * per delivery, timeout requeue with `attempts + 1` under the SAME id.
  */
object InProcessNsqd {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, InProcessNsqd]()

  /** Shared-by-name lookup, same rationale as
    * [[InProcessAmqpBroker.named]]: executor-side closures capture the
    * name, never the (unserializable) fake.
    */
  def named(name: String): InProcessNsqd =
    registry.computeIfAbsent(name, _ => new InProcessNsqd())
}

final class InProcessNsqd(timeoutTicks: Long = 5L) {
  private var nextId = 0L
  private var now = 0L
  private val pending = mutable.Queue[NsqStored]()
  private val conns = mutable.ArrayBuffer[InProcessNsqConnection]()

  /** A publish connection at the sink seam ([[NsqPublishApi]]). */
  def publisher(): NsqPublishApi = new NsqPublishApi {
    override def publish(body: String): Unit =
      InProcessNsqd.this.publish(body)
    override def mpublish(bodies: Seq[String]): Unit =
      InProcessNsqd.this.publish(bodies: _*)
    override def close(): Unit = ()
  }

  def publish(bodies: String*): Unit = synchronized {
    bodies.foreach { b =>
      // 16-byte ascii ids like a real nsqd's hex ids
      pending += NsqStored(f"$nextId%016x", attempts = 0, body = b)
      nextId += 1
    }
  }

  def connect(): InProcessNsqConnection = synchronized {
    val c = new InProcessNsqConnection(this)
    conns += c
    c
  }

  /** Advance the injected clock; in-flight messages whose deadline passed
    * requeue server-side with `attempts + 1` (same id) — nsqd's message
    * timeout, the reference's `timeout` option (`Nsq.php:76`).
    */
  def tick(ticks: Long = 1L): Unit = synchronized {
    now += ticks
    conns.foreach(_.sweepTimeouts(now))
  }

  private[streaming] def clock: Long = synchronized(now)
  private[streaming] def timeout: Long = timeoutTicks

  /** Messages waiting for delivery (excludes in-flight). */
  def pendingDepth: Int = synchronized(pending.size)
  /** In-flight (delivered, unFIN'd) across all open connections. */
  def inFlightDepth: Int = synchronized(conns.map(_.inFlightCount).sum)

  private[streaming] def take(n: Int): Seq[NsqStored] = synchronized {
    (0 until math.min(n, pending.size)).map(_ => pending.dequeue())
  }
  private[streaming] def requeue(msgs: Seq[NsqStored]): Unit = synchronized {
    // timed-out / REQ'd messages go back ahead of fresh ones so
    // re-delivery is prompt; NSQ guarantees no ordering either way
    val rest = pending.dequeueAll(_ => true)
    pending ++= msgs.map(m => m.copy(attempts = m.attempts + 1))
    pending ++= rest
  }
}

/** One subscriber connection: own absolute RDY count, own in-flight window
  * with per-message deadlines. [[closeConnection]] models a client drop —
  * every in-flight message requeues with `attempts + 1`.
  */
final class InProcessNsqConnection(nsqd: InProcessNsqd) extends NsqSubscriberApi {
  private var rdyCount = 0
  private val inFlight = mutable.LinkedHashMap[String, (NsqStored, Long)]()
  private var open = true

  /** RDY is ABSOLUTE: `RDY n` replaces the count (a client that wants
    * more headroom re-sends the total, not a delta).
    */
  override def rdy(n: Int): Unit = synchronized {
    require(n >= 0, "RDY count must be non-negative")
    require(open, "connection is closed")
    rdyCount = n
  }

  override def poll(): Seq[NsqDelivery] = synchronized {
    require(open, "connection is closed")
    nsqd.take(rdyCount).map { m =>
      rdyCount -= 1
      inFlight += m.id -> ((m, nsqd.clock + nsqd.timeout))
      NsqDelivery(m.id, m.attempts, m.body)
    }
  }

  override def fin(id: String): Boolean = synchronized {
    require(open, "connection is closed")
    val known = inFlight.contains(id)
    if (known) inFlight -= id // E_FIN_FAILED otherwise — non-fatal
    known
  }

  override def req(id: String): Boolean = synchronized {
    require(open, "connection is closed")
    inFlight.remove(id) match {
      case Some((m, _)) => nsqd.requeue(Seq(m)); true
      case None         => false // E_REQ_FAILED — non-fatal
    }
  }

  override def touch(id: String): Boolean = synchronized {
    require(open, "connection is closed")
    inFlight.get(id) match {
      case Some((m, _)) =>
        inFlight += id -> ((m, nsqd.clock + nsqd.timeout)); true
      case None => false // E_TOUCH_FAILED — non-fatal
    }
  }

  /** Client drop: in-flight messages requeue with attempts+1, same ids. */
  def closeConnection(): Unit = synchronized {
    open = false
    nsqd.requeue(inFlight.values.map(_._1).toSeq)
    inFlight.clear()
  }

  private[streaming] def sweepTimeouts(now: Long): Unit = synchronized {
    if (open) {
      val expired = inFlight.collect { case (id, (m, dl)) if dl <= now => (id, m) }
      expired.foreach { case (id, m) => inFlight -= id; nsqd.requeue(Seq(m)) }
    }
  }

  private[streaming] def inFlightCount: Int = synchronized(inFlight.size)
}

/** The spool-before-read pump over NSQ semantics: drains a connection into
  * the offset-addressed [[MessageQueues]] spool and FINs from the stream's
  * commit. Same four-rule protocol as [[AmqpIngest]] (spool before read,
  * admission = in-flight window, ack on commit, re-delivery dedup) with
  * the NSQ-specific mechanics:
  *
  *  - admission: before each poll the pump re-sends `RDY (maxInFlight −
  *    uncommitted)` — RDY being absolute makes the re-send idempotent, and
  *    bounding by UNCOMMITTED spool depth (not server in-flight) keeps the
  *    window closed even across timeout requeues;
  *  - commit: `commit(end)` FINs each spooled-and-uncommitted id below
  *    `end` individually — no prefix ack exists. A FIN that answers
  *    `E_FIN_FAILED` means the message timed out server-side and will be
  *    re-delivered; the pump FINs it at re-delivery (its index is then
  *    below `committed`), closing the at-least-once window;
  *  - dedup: ids are stable across re-deliveries, so a re-delivered id
  *    never takes a second spool index — committed ⇒ FIN immediately
  *    (the server just needs the FIN it never got), uncommitted ⇒ the
  *    message is simply back in flight under the same id, nothing to
  *    update (contrast the AMQP tag refresh).
  */
final class NsqIngest(nsqd: InProcessNsqd, val spoolQueue: String,
                      maxInFlight: Int) {
  require(maxInFlight > 0, "maxInFlight must be positive")
  private var conn: InProcessNsqConnection = nsqd.connect()
  private val indexOfMsg = mutable.HashMap[String, Long]()
  private val idOfIndex = mutable.TreeMap[Long, String]()
  private var committed = 0L
  MessageQueues.onCommitHook(spoolQueue, commitUpTo)

  /** Drain what the server will push inside the in-flight window into the
    * spool; returns the spool high-water mark.
    */
  def pump(): Long = synchronized {
    val uncommitted = (MessageQueues.size(spoolQueue) - committed).toInt
    conn.rdy(math.max(maxInFlight - uncommitted, 0))
    conn.poll().foreach { d =>
      indexOfMsg.get(d.id) match {
        case Some(idx) if idx < committed =>
          // committed before the timeout requeued it: the server just
          // needs the FIN it lost — no new spool index
          conn.fin(d.id); ()
        case Some(_) =>
          // uncommitted re-delivery, same stable id: already spooled,
          // already tracked — back in flight, nothing to update
          ()
        case None =>
          val idx = MessageQueues.size(spoolQueue)
          MessageQueues.push(spoolQueue, d.body)
          indexOfMsg(d.id) = idx
          idOfIndex(idx) = d.id
      }
    }
    MessageQueues.size(spoolQueue)
  }

  /** The stream's `commit(end)` lands here (spool commit hook): FIN each
    * spooled id below `end`, one by one — NSQ has no multiple-ack.
    */
  def commitUpTo(end: Long): Unit = synchronized {
    val below = idOfIndex.range(Long.MinValue, end)
    below.foreach { case (_, id) =>
      // false = E_FIN_FAILED: timed out server-side, re-delivery pending;
      // the pump FINs it on arrival (its index is below `committed` then)
      conn.fin(id); ()
    }
    below.keys.toSeq.foreach(idOfIndex -= _)
    committed = math.max(committed, end)
  }

  /** Connection drop + reconnect: in-flight messages requeue with
    * `attempts + 1` under the SAME ids; nothing to discard client-side —
    * id-keyed state stays valid across connections (contrast the AMQP
    * tag-table clear).
    */
  def recover(): Unit = synchronized {
    conn.closeConnection()
    conn = nsqd.connect()
  }
}
