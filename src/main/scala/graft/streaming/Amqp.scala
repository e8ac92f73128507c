package graft.streaming

import scala.collection.mutable

/** AMQP transport seam for the queue source — the consume-loop semantics of
  * the reference's blocking consumer (`/root/reference/src/Sources/
  * Amqp.php:89-103`: manual-ack consume, one in-flight window) re-expressed
  * as the spool-before-read protocol [[QueueMicroBatchStream]] needs.
  *
  * Why a seam: AMQP consumption is DESTRUCTIVE — a consumed, unacked
  * message cannot be re-read by offset — while Spark's
  * `planInputPartitions(start, end)` may re-execute (task retry,
  * speculative attempt). [[AmqpIngest]] therefore lands every delivery in
  * the offset-addressed [[MessageQueues]] spool before Spark ever reads
  * it, and acks the broker only from the stream's `commit(end)` — which
  * Spark calls AFTER the batch offset is durably checkpointed. Between
  * broker and spool the link is at-least-once (re-deliveries are dedup'd
  * by message id); end-to-end it composes to exactly-once into idempotent
  * sinks — the claim the oracle-checked `stream_queue_source` /
  * `stream_ingest_dedup` queries pin.
  *
  * The REAL client binding is one class implementing [[AmqpChannelApi]]
  * over `com.rabbitmq.client.Channel` (jar not present in this image):
  *  - `qos(n)`      → `Channel.basicQos(n)`
  *  - `poll()`      → drain a local buffer filled by a `DefaultConsumer.
  *                    handleDelivery` registered with `basicConsume(queue,
  *                    autoAck = false)` (push→pull adaptation); tag =
  *                    `Envelope.getDeliveryTag`, id = `AMQP.BasicProperties
  *                    .getMessageId`, redelivered = `Envelope.isRedeliver`
  *  - `ack(t, m)`   → `Channel.basicAck(t, m)`
  * Everything else here — spool indexing, dedup, ack bookkeeping, the
  * Spark source — runs unchanged against it. [[InProcessAmqpBroker]] is
  * the test double at the same interface, enforcing the wire rules a real
  * broker would (1-based per-channel monotone tags, prefetch window,
  * destructive consume, multiple-ack, re-delivery with NEW tags after
  * channel failure), so `AmqpIntegrationSpec` executes the contract
  * without a network.
  */
final case class AmqpDelivery(deliveryTag: Long, messageId: String,
                              body: String, redelivered: Boolean)

/** The channel operations the ingest consumes — see the binding table in
  * the file header. Implementations must honor AMQP tag semantics:
  * delivery tags are 1-based, monotone, and PER CHANNEL (a recovered
  * channel restarts the sequence), and `ack(tag, multiple = true)`
  * acknowledges every outstanding delivery with tag ≤ `tag`.
  */
trait AmqpChannelApi {
  def qos(prefetch: Int): Unit
  def poll(): Seq[AmqpDelivery]
  def ack(deliveryTag: Long, multiple: Boolean): Unit
}

/** Publish side of the seam — the reference's sink loop
  * (`/root/reference/src/Sinks/Amqp.php:89-95`: `basic_publish` with
  * persistent delivery mode; `Nsq.php:60-69`: `publish`/`publishMulti`).
  * The real binding is one class over `com.rabbitmq.client.Channel`:
  * `publish(body)` → `basicPublish(exchange, routingKey,
  * MessageProperties.PERSISTENT_TEXT_PLAIN, body.getBytes(UTF_8))`,
  * `close()` → channel/connection close. [[graft.sources.Sinks.amqpPublish]]
  * opens one of these per partition.
  */
trait AmqpPublishApi {
  def publish(body: String): Unit
  def close(): Unit
}

private[streaming] final case class AmqpMessage(id: String, body: String,
                                                redelivered: Boolean)

/** In-process broker fake at AMQP semantics (not a transport): a ready
  * queue, per-channel unacked windows, prefetch enforcement, and
  * re-delivery of a failed channel's unacked messages — at the FRONT of
  * the ready queue, flagged `redelivered`, re-consumed under NEW tags.
  */
object InProcessAmqpBroker {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, InProcessAmqpBroker]()

  /** Shared-by-name lookup: Spark serializes task closures even in local
    * mode, and a broker holds unserializable state — executor-side code
    * (per-partition publishers) captures the NAME and resolves the broker
    * here, the same way [[MessageQueues]] names its spools. Single-JVM by
    * design: this is the test double; a real deployment's "registry" is
    * the broker's own address.
    */
  def named(name: String): InProcessAmqpBroker =
    registry.computeIfAbsent(name, _ => new InProcessAmqpBroker)
}

final class InProcessAmqpBroker {
  private var nextId = 0L
  private val ready = mutable.Queue[AmqpMessage]()
  private val channels = mutable.ArrayBuffer[InProcessAmqpChannel]()

  /** A publish channel at the sink seam ([[AmqpPublishApi]]): every
    * `publish` enqueues one ready message, exactly as `basic_publish`
    * into a bound queue would.
    */
  def publisher(): AmqpPublishApi = new AmqpPublishApi {
    override def publish(body: String): Unit =
      InProcessAmqpBroker.this.publish(body)
    override def close(): Unit = ()
  }

  def publish(bodies: String*): Unit = synchronized {
    bodies.foreach { b => ready += AmqpMessage(s"m$nextId", b, redelivered = false); nextId += 1 }
  }

  def connect(): InProcessAmqpChannel = synchronized {
    val c = new InProcessAmqpChannel(this)
    channels += c
    c
  }

  /** Messages waiting for delivery (excludes in-flight unacked). */
  def readyDepth: Int = synchronized(ready.size)
  /** In-flight (delivered, unacked) across all open channels. */
  def unackedDepth: Int = synchronized(channels.map(_.unackedCount).sum)

  private[streaming] def take(n: Int): Seq[AmqpMessage] = synchronized {
    (0 until math.min(n, ready.size)).map(_ => ready.dequeue())
  }
  private[streaming] def requeueFront(msgs: Seq[AmqpMessage]): Unit = synchronized {
    val rest = ready.dequeueAll(_ => true)
    ready ++= msgs.map(_.copy(redelivered = true))
    ready ++= rest
  }
}

/** One channel of [[InProcessAmqpBroker]]: own 1-based monotone tag
  * sequence, own unacked window bounded by `qos`. [[fail]] models a
  * connection drop — every unacked message returns to the broker for
  * re-delivery (new channel, new tags, `redelivered = true`).
  */
final class InProcessAmqpChannel(broker: InProcessAmqpBroker) extends AmqpChannelApi {
  private var prefetch = Int.MaxValue
  private var tag = 0L
  private val unacked = mutable.LinkedHashMap[Long, AmqpMessage]()
  private var open = true

  override def qos(p: Int): Unit = synchronized {
    require(p > 0, "prefetch must be positive")
    prefetch = p
  }

  override def poll(): Seq[AmqpDelivery] = synchronized {
    require(open, "channel is closed")
    val room = prefetch - unacked.size
    broker.take(math.max(room, 0)).map { m =>
      tag += 1
      unacked += tag -> m
      AmqpDelivery(tag, m.id, m.body, m.redelivered)
    }
  }

  override def ack(deliveryTag: Long, multiple: Boolean): Unit = synchronized {
    require(open, "channel is closed")
    // a real broker kills the channel on an unknown tag (PRECONDITION_FAILED)
    require(unacked.contains(deliveryTag),
      s"unknown delivery tag $deliveryTag (channel error on a real broker)")
    if (multiple) unacked.filterInPlace { case (t, _) => t > deliveryTag }
    else unacked -= deliveryTag
    ()
  }

  /** Simulate a connection drop: unacked messages go back to the broker. */
  def fail(): Unit = synchronized {
    open = false
    broker.requeueFront(unacked.values.toSeq)
    unacked.clear()
  }

  private[streaming] def unackedCount: Int = synchronized(unacked.size)
}

/** The spool-before-read pump: drains a channel into the offset-addressed
  * [[MessageQueues]] spool `spoolQueue` (which [[QueueMicroBatchStream]]
  * reads replayably) and acks the broker from the stream's commit.
  *
  * Protocol (the `AmqpIntegrationSpec` contract):
  *  1. spool before read — [[pump]] appends each NEW message id at the next
  *     spool index; Spark only ever reads the spool, so task retries
  *     re-read instead of re-consuming;
  *  2. admission = prefetch — `prefetch` maps to `qos` (the broker-side
  *     in-flight window, the NSQ `rdy` analogue); the spool's high-water
  *     mark is what `latestOffset` reports;
  *  3. ack on commit — registered as the spool's commit hook, so Spark's
  *     `commit(end)` (called after the checkpoint write) acks the highest
  *     current-channel tag below spool index `end` with `multiple = true`;
  *  4. re-delivery dedup — a re-delivered id never takes a second spool
  *     index: if its index is still uncommitted the new tag replaces the
  *     old (dead channel's tags must never be acked on the new channel);
  *     if already committed it is acked immediately (the broker just
  *     needs the ack it lost).
  *
  * Tag/index alignment invariant: within one channel, deliveries arrive
  * tag-ascending and new spool indices are assigned in delivery order, so
  * among `tagOfIndex` entries index order == tag order — which is what
  * makes the single `ack(maxTagBelowEnd, multiple = true)` ack exactly
  * the committed prefix.
  */
final class AmqpIngest(broker: InProcessAmqpBroker, val spoolQueue: String,
                       prefetch: Int) {
  private var channel: InProcessAmqpChannel = broker.connect()
  channel.qos(prefetch)
  private val indexOfMsg = mutable.HashMap[String, Long]()
  private val tagOfIndex = mutable.TreeMap[Long, Long]()
  private var committed = 0L
  MessageQueues.onCommitHook(spoolQueue, commitUpTo)

  /** Drain what the broker will deliver inside the prefetch window into the
    * spool; returns the spool high-water mark.
    */
  def pump(): Long = synchronized {
    channel.poll().foreach { d =>
      indexOfMsg.get(d.messageId) match {
        case Some(idx) if idx < committed =>
          // already committed before the old channel died: the broker only
          // needs the ack it lost — no new spool index
          channel.ack(d.deliveryTag, multiple = false)
        case Some(idx) =>
          // uncommitted re-delivery: same spool index, refreshed tag
          tagOfIndex(idx) = d.deliveryTag
        case None =>
          val idx = MessageQueues.size(spoolQueue)
          MessageQueues.push(spoolQueue, d.body)
          indexOfMsg(d.messageId) = idx
          tagOfIndex(idx) = d.deliveryTag
      }
    }
    MessageQueues.size(spoolQueue)
  }

  /** The stream's `commit(end)` lands here (spool commit hook): ack
    * everything spooled below `end`, once, on the current channel.
    */
  def commitUpTo(end: Long): Unit = synchronized {
    val below = tagOfIndex.range(Long.MinValue, end)
    if (below.nonEmpty) {
      channel.ack(below.values.max, multiple = true)
      below.keys.toSeq.foreach(tagOfIndex -= _)
    }
    committed = math.max(committed, end)
  }

  /** Connection drop + reconnect: the dead channel's unacked messages are
    * re-delivered by the broker under new tags; stale tags are discarded
    * (acking them on the new channel would be a wire error).
    */
  def recover(): Unit = synchronized {
    channel.fail()
    tagOfIndex.clear()
    channel = broker.connect()
    channel.qos(prefetch)
  }
}
