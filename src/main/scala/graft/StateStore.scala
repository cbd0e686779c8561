package graft

import java.sql.Timestamp
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Session-scoped mutable entity state for the serving façade — the
  * engine's answer to the reference's MongoDB collections
  * (/root/reference/index.js:281-289) for the 25 POST/PATCH/PUT/DELETE
  * routes RestServe now serves.
  *
  * Model: each entity is an immutable BASE (the fixture parquet, loaded
  * through [[Tables]]) plus a driver-held CDC JOURNAL of upserts and
  * tombstones, merged on read — the classic lakehouse merge-on-read
  * (the same shape the catalog gates as `w8_merge_upsert` /
  * `w11_cdc_apply`, here running live behind a wire surface):
  *
  *   - WRITE = O(1): append one journal entry (plus the guard point
  *     reads the reference also performs, index.js:805-822). The base
  *     is NEVER rewritten per request — at 100 TB a request mutating a
  *     parquet lake in place would be absurd; appending to a journal
  *     (in production: a Kafka topic / Delta commit log) is exactly
  *     what Hudi/Delta/Iceberg streaming upserts do.
  *   - READ = base ⟕anti journal-keys ∪ journal-rows: the journal is
  *     request-bounded (tiny), so the anti join BROADCASTS it against
  *     the base scan — one pruned parquet pass, no shuffle, no window
  *     over the corpus. When the journal is empty, `current()` returns
  *     the base RELATION ITSELF, so an unwritten entity plans and
  *     serves byte-identically to the read-only façade.
  *   - SCHEMA EVOLUTION: journal rows may carry columns the base lacks
  *     (the reference's collections are schemaless; its inserts attach
  *     whatever the handler builds, index.js:494-506). `current()`
  *     null-fills them on the base side (`unionByName(allowMissing)`)
  *     — schema-on-read, the x5 evolution contract live.
  *   - COMPACTION [[EntityState.compact]]: materialize the merged view
  *     to parquet, swap it in as the new base, clear the journal — the
  *     w9 maintenance pass; read cost returns to a bare scan.
  *
  * Consistency: one coarse lock per store ([[StateStore.mutate]])
  * linearizes every multi-entity read-check-write sequence. The
  * reference has NO such guarantee (its capacity guard index.js:816-822
  * admits overshoot under concurrent approvals, SURVEY §3.3);
  * linearizable-per-store is the deliberate improvement, matching the
  * deterministic w5 restatement — RestWriteSpec's concurrent-increment
  * probe pins that no update is ever lost.
  *
  * Determinism: wall-clock stamps (`new Date()` at every reference
  * write site) become a LOGICAL CLOCK — a fixed epoch advanced one
  * second per write — so any op sequence replays to bit-identical
  * state, which is what lets specs pin HTTP-driven state hash-equal to
  * the batch w-family program for the same ops.
  */
final class StateStore(spark: SparkSession, dir: String,
                       autoCompactAt: Int = 4096) {
  private val t = Tables(spark, dir)

  /** Entities in their catalog shapes (the façade's established entity
    * mapping, SURVEY Appendix A): users≙customer (c_name plays the
    * email, c_acctbal the coin balance — one user directory for buyers
    * AND workers, like the reference's single users collection);
    * tasks/payments/withdrawals≙orders (three independent entities
    * sharing one base relation, each with its own journal);
    * submissions≙lineitem (composite natural key);
    * notifications≙events. */
  val users         = new EntityState(spark, () => t.customer, Seq("c_custkey"))
  val tasks         = new EntityState(spark, () => t.orders,   Seq("o_orderkey"))
  val payments      = new EntityState(spark, () => t.orders,   Seq("o_orderkey"))
  val withdrawals   = new EntityState(spark, () => t.orders,   Seq("o_orderkey"))
  val submissions   = new EntityState(spark, () => t.lineitem,
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
  val notifications = new EntityState(spark, () => t.events,   Seq("event_id"))

  private var tick = 0L
  private val epochMs = 1767225600000L // 2026-01-01T00:00:00Z

  /** Logical clock: deterministic, strictly monotone per store. */
  def now(): Timestamp = synchronized { tick += 1; new Timestamp(epochMs + tick * 1000L) }

  private def entities: Seq[EntityState] =
    Seq(users, tasks, payments, withdrawals, submissions, notifications)

  /** Store-wide critical section: every mutation handler's
    * read-check-write sequence runs under this one lock, so cross-entity
    * invariants (approve = submission $set + user $inc; task insert =
    * coin debit + task row) are linearizable. Guard point reads are
    * journal-first O(1) or key-pruned parquet point scans — holding the
    * lock across them is the serving-tier trade (single-writer journal;
    * reads outside `mutate` never block).
    *
    * AUTO-COMPACTION: after each mutation, any entity whose journal
    * exceeds [[autoCompactAt]] keys is compacted — the LSM discipline
    * that keeps `current()`'s broadcast side bounded BY CONSTRUCTION
    * however long the server runs (an unbounded journal would
    * eventually stop being a broadcastable delta). The write that
    * crosses the threshold pays the materialization while holding the
    * lock — compaction debt, amortized O(1) per write, exactly how
    * RocksDB/Delta pay for their merge-on-read. */
  def mutate[A](body: => A): A = synchronized {
    val r = body
    entities.foreach(e => if (e.journalSize > autoCompactAt) e.compact())
    r
  }
}

/** One mutable entity: immutable base relation + driver CDC journal.
  * All journal access is `this`-synchronized; `current()` snapshots
  * under the lock and builds the merged plan outside it. */
final class EntityState(
    spark: SparkSession,
    baseF: () => DataFrame,
    val keyCols: Seq[String]) {

  /** The current base relation — the fixture parquet until [[compact]]
    * swaps in a materialized merge (which then CARRIES any evolved
    * columns in its own schema). */
  private var baseRel: Option[DataFrame] = None
  private def base: DataFrame = synchronized {
    baseRel.getOrElse { val b = baseF(); baseRel = Some(b); b }
  }

  /** key → Some(full row as column→value) for upserts, None for
    * tombstones. LinkedHashMap: iteration order = first-write order
    * (stable output order for merged reads). */
  private val journal = mutable.LinkedHashMap.empty[Seq[Any], Option[Map[String, Any]]]
  /** Evolved columns in first-seen order (base columns never move). */
  private var extras = Vector.empty[StructField]
  private var nextIdCache: Option[Long] = None

  private def keyFields: Seq[StructField] =
    keyCols.map(c => base.schema(base.schema.fieldIndex(c)))

  def journalSize: Int = synchronized(journal.size)

  /** Fresh single-column surrogate id: base max (one pruned agg, run
    * once) + count of ids handed out. Single-key entities only. */
  def newId(): Long = synchronized {
    require(keyCols.size == 1, "newId() needs a single-column key")
    val next = nextIdCache.getOrElse {
      val m = base.agg(max(col(keyCols.head))).head()
      (if (m.isNullAt(0)) 0L else m.getLong(0)) + 1L
    }
    nextIdCache = Some(next + 1L)
    next
  }

  /** Value coercion to the column's declared type — journal rows come
    * from parsed JSON (Int/Long/Double/String/Boolean) and must land
    * in the base/evolved column type exactly or createDataFrame throws.
    * LOUD on lossy narrowing: a fractional value for an integral column
    * throws (IllegalArgumentException → the route's 400) instead of
    * silently truncating — the same refuse-to-round-money stance as the
    * loader's decimal guard. Unparseable strings throw
    * NumberFormatException, likewise surfaced as the 400 shape. */
  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                     => null
    case (x: Number, LongType)         => integral(x)
    case (x: Number, IntegerType)      => Math.toIntExact(integral(x))
    case (x: Number, DoubleType)       => x.doubleValue()
    case (x: String, LongType)         => x.toLong
    case (x: String, IntegerType)      => x.toInt
    case (x: String, DoubleType)       => x.toDouble
    case (x: Timestamp, TimestampType) => x
    case (x: Boolean, BooleanType)     => x
    case (x, StringType)               => String.valueOf(x)
    case (x, _)                        => x
  }

  private def integral(x: Number): Long = {
    val l = x.longValue()
    if (x.doubleValue() == l.toDouble) l
    else throw new IllegalArgumentException(
      s"non-integral value $x for an integral column — refusing the silent truncation")
  }

  private def inferType(v: Any): DataType = v match {
    case _: Int | _: Long | _: Integer | _: java.lang.Long => LongType
    case _: Double | _: Float | _: java.lang.Double => DoubleType
    case _: Boolean | _: java.lang.Boolean => BooleanType
    case _: Timestamp => TimestampType
    case _ => StringType
  }

  private def allFields: Seq[StructField] = base.schema.fields.toSeq ++ extras

  /** Full-row upsert (insert or replace). Unknown columns evolve the
    * schema; known columns coerce to their declared type. */
  def upsert(row: Map[String, Any]): Unit = synchronized {
    val known = allFields.map(f => f.name -> f.dataType).toMap
    row.keys.filterNot(known.contains).toSeq.foreach { c =>
      extras :+= StructField(c, inferType(row(c)), nullable = true)
    }
    val types = allFields.map(f => f.name -> f.dataType).toMap
    val coerced = row.map { case (k, v) => k -> coerce(v, types(k)) }
    journal.update(keyCols.map(coerced), Some(coerced))
  }

  /** Read-merge-write `$set`: fetch the current row, apply changes,
    * upsert. False when the key does not exist (→ the route's 404). */
  def patch(key: Seq[Any], changes: Map[String, Any]): Boolean =
    lookup(key) match {
      case Some(row) => upsert(row ++ changes ++ keyCols.zip(key).toMap); true
      case None => false
    }

  /** Tombstone a key. False when absent. */
  def delete(key: Seq[Any]): Boolean = synchronized {
    if (lookup(key).isEmpty) false
    else { journal.update(normKey(key), None); true }
  }

  private def normKey(key: Seq[Any]): Seq[Any] =
    keyCols.zip(key).map { case (c, v) =>
      coerce(v, base.schema(base.schema.fieldIndex(c)).dataType)
    }

  /** Point read: journal first (O(1), no job), then a pruned base scan
    * — the serving-tier read path (at scale: journal = hot cache,
    * base = key-pruned parquet point scan). */
  def lookup(key: Seq[Any]): Option[Map[String, Any]] = {
    val nk = normKey(key)
    synchronized(journal.get(nk)) match {
      case Some(v) => v // Some(row) or None (tombstoned)
      case None =>
        val pred = keyCols.zip(nk)
          .map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
        base.filter(pred).limit(1).collect().headOption
          .map(r => r.schema.fieldNames.zip(r.toSeq).toMap)
    }
  }

  /** Secondary-key point read (e.g. users by email≙c_name): journal
    * scan first (last write wins — reverse insertion order), then base
    * rows whose key the journal has NOT superseded (a journal version
    * that no longer matches, or a tombstone, hides its base row). */
  def lookupBy(column: String, value: Any): Option[Map[String, Any]] = {
    val snap = synchronized(journal.toVector)
    snap.reverseIterator.collectFirst {
      case (_, Some(row)) if row.get(column).contains(value) => row
    } match {
      case hit @ Some(_) => hit
      case None =>
        val journaled = snap.map(_._1).toSet
        if (!base.schema.fieldNames.contains(column)) None
        else base.filter(col(column) === lit(value)).collect()
          .map(r => r.schema.fieldNames.zip(r.toSeq).toMap)
          .find(m => !journaled.contains(keyCols.map(m)))
    }
  }

  /** The merged relation. Empty journal → the base relation ITSELF
    * (identical object, identical plan — the read-only façade's
    * byte-equality contract is preserved by construction). Otherwise:
    * base anti-join journal keys (journal side broadcast — bounded by
    * request count) union journal rows, schema evolution null-filled. */
  def current(): DataFrame = {
    val (snapRows, snapKeys, snapFields, snapBase) = synchronized {
      (journal.values.flatten.toVector, journal.keys.toVector, allFields, base)
    }
    if (snapKeys.isEmpty) snapBase
    else {
      val schema = StructType(snapFields)
      val delta = spark.createDataFrame(
        snapRows.map(m => Row.fromSeq(schema.map(f => m.getOrElse(f.name, null)))).asJava,
        schema)
      val keysDf = spark.createDataFrame(
        snapKeys.map(Row.fromSeq).asJava, StructType(keyFields))
      snapBase.join(broadcast(keysDf), keyCols, "left_anti")
        .unionByName(delta, allowMissingColumns = true)
    }
  }

  /** w9-style maintenance: materialize the merged view as the new base
    * (scratch parquet under the run root), clear the journal. Read
    * plans return to a bare scan; content is unchanged (spec-pinned).
    * Evolved columns become REAL columns of the compacted base. */
  def compact(): Unit = synchronized {
    // The whole pass holds the entity lock (current() re-enters it):
    // a write sneaking in between the merge snapshot and journal.clear()
    // would otherwise be silently dropped. Maintenance blocks writers;
    // that is the copy-on-write compaction contract (w9).
    if (journal.nonEmpty) {
      val out = Scratch.tempDir("state_compact")
      current().write.mode("overwrite").parquet(out)
      journal.clear()
      extras = Vector.empty
      baseRel = Some(spark.read.parquet(out))
    }
  }
}
