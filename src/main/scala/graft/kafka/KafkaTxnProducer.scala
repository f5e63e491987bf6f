package graft.kafka

/** The reference Kafka producer's transactional surface
  * (sea-streamer-kafka/src/producer.rs:236-301: `init_transactions`,
  * `begin_transaction`, `commit_transaction`, `abort_transaction`,
  * `send_offsets_to_transaction`) spoken directly on the wire through
  * [[KafkaClient]] — InitProducerId / AddPartitionsToTxn /
  * AddOffsetsToTxn / TxnOffsetCommit / EndTxn, with the KIP-98
  * transactional record batches (pid/epoch/sequence + attribute bit)
  * carrying the data.
  *
  * Lifecycle: `initTransactions()` once (re-init fences any zombie with
  * the same transactional id and aborts its open txn), then per
  * transaction `begin()` → `send(...)`* → `commit()`/`abort()`.
  * Partitions auto-register on first send; base sequences are tracked
  * per (topic, partition) across the producer's life, as the idempotent
  * producer requires.
  */
final class KafkaTxnProducer(client: KafkaClient, txnId: String,
    /** `transaction.timeout.ms` sent with InitProducerId: past this much
      * transactional inactivity the COORDINATOR aborts the open txn and
      * bumps the epoch (releasing the LSO a crashed producer would
      * otherwise hold forever) — any later request from this incarnation
      * dies with INVALID_PRODUCER_EPOCH.
      */
    txnTimeoutMs: Int = 60000) {
  private var pid: Long = -1L
  private var epoch: Int = -1
  private var inTxn = false
  private val added = scala.collection.mutable.Set.empty[(String, Int)]
  private val seq = scala.collection.mutable.Map.empty[(String, Int), Int]

  def producerId: Long = pid
  def producerEpoch: Int = epoch

  /** InitProducerId: acquire (or re-fence) the (pid, epoch). A bumped
    * epoch RESTARTS sequence numbering at 0 on every partition —
    * carrying the old incarnation's sequences into the new epoch would
    * read as a giant sequence gap (OUT_OF_ORDER) on a real broker.
    */
  def initTransactions(): this.type = {
    val (p, e) = client.initProducerId(txnId, txnTimeoutMs)
    pid = p; epoch = e
    inTxn = false
    added.clear()
    seq.clear()
    this
  }

  def begin(): this.type = {
    require(pid >= 0, "initTransactions() first")
    require(!inTxn, "transaction already open")
    inTxn = true
    added.clear()
    this
  }

  /** Transactional send of one batch; the partition registers into the
    * txn on first touch (AddPartitionsToTxn precedes the produce, the
    * coordinator-mandated order).
    */
  def send(topic: String, partition: Int,
      records: Seq[(Long, Array[Byte], Array[Byte])],
      codec: Int = KafkaWire.Codec.None): Long = {
    require(inTxn, "begin() first")
    if (added.add((topic, partition)))
      client.addPartitionsToTxn(txnId, pid, epoch, Seq((topic, partition)))
    val base = client.produceTxn(topic, partition, records, txnId, pid,
      epoch, seq.getOrElse((topic, partition), 0), codec)
    seq((topic, partition)) =
      seq.getOrElse((topic, partition), 0) + records.length
    base
  }

  /** send_offsets_to_transaction: stage the group's read positions under
    * this transaction — they publish at commit, vanish on abort.
    */
  def sendOffsetsToTransaction(group: String,
      offsets: Map[(String, Int), Long]): this.type = {
    require(inTxn, "begin() first")
    client.addOffsetsToTxn(txnId, pid, epoch, group)
    client.txnOffsetCommit(txnId, group, pid, epoch, offsets)
    this
  }

  def commit(): this.type = end(commitTxn = true)
  def abort(): this.type = end(commitTxn = false)

  private def end(commitTxn: Boolean): this.type = {
    require(inTxn, "no open transaction")
    client.endTxn(txnId, pid, epoch, commitTxn)
    inTxn = false
    added.clear()
    this
  }
}
