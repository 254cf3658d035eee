package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.channel.Channel

/** DataSource V2 integration for graft channels: `spark.read.format
  * ("graft-channel").load(topicDir)` and `spark.readStream.format
  * ("graft-channel")...`.
  *
  * The batch/stream READERS delegate to Spark's own parquet machinery
  * ([[GraftSqlBridge.parquetReadFunc]]), so predicate pushdown (row-group +
  * page skipping) and column pruning are the native parquet ones — this is
  * why the source exists alongside [[graft.channel.ChannelRegistry
  * .registerViews]] (SQL convenience) rather than replacing it: both paths
  * bottom out in the same scan machinery.
  *
  * What DSv2 adds over the file-stream `Channel.readStream`:
  *   - **seq-based offsets**: a micro-batch is a contiguous range of
  *     channel sequence numbers `[start, end)` — compact, human-readable
  *     checkpoint state (vs the file source's per-file log), mirroring the
  *     reference's 64-bit channel cursors
  *     (/root/reference/subsystem/messaging/src/lib.rs:80-83);
  *   - **latest-start weak readers**: `startingOffsets=latest` begins at
  *     the committed tail, the reference's weak-subscribe semantics
  *     (reader.rs:319-349) that the file source cannot express (it always
  *     replays the directory);
  *   - **admission control**: `maxBatchesPerTrigger` bounds each
  *     micro-batch in channel batches (Park-style flow control);
  *   - **data-loss accounting**: `weak=true` skips seq ranges evicted by
  *     Drop-mode channels (ReaderBehind parity, reader.rs:342-396);
  *     `weak=false` (default, strong reader) fails on a gap instead of
  *     silently losing data.
  *
  * Mid-write safety is mode-specific. STRONG readers plan only below the
  * strict end, which parks at the lowest pending `_res_` reservation
  * (writers claim their seq with an atomic createDirectory BEFORE
  * writing, see [[Channel.reserveSeq]], and the marker provably outlives
  * any partial batch dir), so a mid-write batch is never half-read, a
  * not-yet-visible concurrent write can never be skipped, and a crashed
  * write blocks (not corrupts) the stream until swept. WEAK readers
  * follow the published weak end (which deliberately advances past
  * durable gaps — evicted and aborted seqs) but `latestOffset` CLAMPS
  * each advance at the first still-in-flight batch dir in range: an
  * offered offset range therefore never spans an uncommitted dir, which
  * keeps `planInputPartitions` deterministic under failure replay (the
  * rival commits → the NEXT trigger resumes past it; it crashes → the
  * sweep tombstones it into a benign hole). The plan site additionally
  * filters any dir lacking `_SUCCESS` as defense-in-depth. Streaming
  * planning reads `batch_*` dirs only — `compact_*` rewrites are
  * invisible to subscriptions (same contract as [[Channel.readStream]]:
  * a checkpointed subscriber already ingested the originals).
  *
  * Scale: batch scans bin-pack parquet files into input partitions by
  * `spark.sql.files.maxPartitionBytes`, so a long-lived topic with
  * thousands of micro-batch files plans a bounded task count instead of
  * one task per tiny file.
  */
final class ChannelSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-channel"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Channel.withWriterId(ChannelSource.storedSchema(ChannelSource.topicDir(options)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChannelTable(schema, new CaseInsensitiveStringMap(properties))
}

private[graft] object ChannelSource {
  def topicDir(options: CaseInsensitiveStringMap): Path = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-channel requires option 'path' (the topic directory)"))
    Paths.get(p)
  }

  def storedSchema(dir: Path): StructType = {
    val meta = dir.resolve("_SCHEMA")
    require(Files.exists(meta), s"not a channel topic (no _SCHEMA): $dir")
    org.apache.spark.sql.types.DataType
      .fromJson(Files.readString(meta).split("\n")(0)).asInstanceOf[StructType]
  }

  /** Parquet data files of one batch/compact dir, lexicographic (part
    * file order = write order within the batch). */
  def dataFiles(dir: Path): Seq[Path] =
    Channel.listDir(dir)
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getFileName.toString)

  def committed(dir: Path): Boolean = Files.exists(dir.resolve("_SUCCESS"))
}

final class ChannelTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val dir = ChannelSource.topicDir(options)
  override def name(): String = s"graft-channel `${dir.getFileName}`"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ChannelScanBuilder(schema, dir, caseInsensitiveOptions)
}

/** Records Spark's pruned schema and pushable filters. `pushFilters`
  * returns ALL filters back to Spark for re-evaluation (parquet row-group
  * stats are a may-skip index, not an exact filter — the same contract the
  * native parquet source uses), while the pushable subset is handed to the
  * reader for actual row-group/page skipping and reported via
  * `pushedFilters`. */
final class ChannelScanBuilder(dataSchema: StructType, dir: Path,
                               options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // A filter is pushable when every referenced column is a top-level
    // atomic field (ParquetFilters' own precondition); nested/complex
    // references stay Spark-side only.
    import org.apache.spark.sql.types._
    val atomic = dataSchema.fields.collect {
      case f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | _: BinaryType => None
        case _ => Some(f.name)
      }
    }.flatten.toSet
    pushed = filters.filter(_.references.forall(atomic.contains))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new ChannelScan(SparkSession.active, dataSchema, required, pushed, dir, options)
}

final class ChannelScan(spark: SparkSession, dataSchema: StructType,
                        required: StructType, pushed: Array[Filter],
                        dir: Path, options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = required

  private def factory(): PartitionReaderFactory =
    new ChannelReaderFactory(GraftSqlBridge.parquetReadFunc(
      spark, dataSchema, required, pushed.toSeq,
      options.asCaseSensitiveMap().asScala.toMap))

  override def description(): String =
    s"GraftChannelScan ${dir.getFileName} ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toString: String = description()

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      // Snapshot reads: [startSeq, endSeq) pins an immutable slice of the
      // topic by cursor — a training run records endSeq once and every
      // re-read sees the identical dataset regardless of later appends.
      // Batch dirs are single-seq, so planning-level pruning is EXACT.
      // Compaction rewrites batches into a multi-seq compact_* dir, which
      // can no longer be pruned exactly at planning — a pin that reaches
      // into compacted history fails loudly (re-pin after maintenance)
      // instead of silently over- or under-reading, mirroring the
      // streaming contract that compaction invalidates subscriptions'
      // view of history.
      val startSeq = Option(options.get("startSeq")).map(_.toLong)
      val endSeq = Option(options.get("endSeq")).map(_.toLong)
      val snapshot = startSeq.isDefined || endSeq.isDefined
      val all = Channel.listBatches(dir)
      val batches = if (!snapshot) all else {
        val compacted = all.filter(_.getFileName.toString.startsWith("compact_"))
          .map(Channel.batchSeq).maxOption
        compacted.filter(c => startSeq.getOrElse(0L) < c).foreach { c =>
          throw new IllegalStateException(
            s"snapshot [${startSeq.getOrElse(0L)}, ${endSeq.fold("∞")(_.toString)}) " +
              s"reaches into compacted history (compact seq $c) on '$dir'; " +
              "re-pin the snapshot from the current visible end")
        }
        // pruned/evicted history is deleted WITHOUT per-seq traces; the
        // _PRUNED floor is its durable record. A pin below it must fail
        // loudly — silently returning fewer rows than the pinned range
        // once held is the exact failure readSnapshot exists to prevent
        val pruned = Channel.prunedFloor(dir)
        if (startSeq.getOrElse(0L) < pruned)
          throw new IllegalStateException(
            s"snapshot [${startSeq.getOrElse(0L)}, ${endSeq.fold("∞")(_.toString)}) " +
              s"reaches below the pruned floor $pruned on '$dir' " +
              "(consumption retention or Drop eviction removed that history); " +
              "re-pin the snapshot at or above the floor")
        all.filter { p =>
          val s = Channel.batchSeq(p)
          !p.getFileName.toString.startsWith("compact_") &&
            startSeq.forall(s >= _) && endSeq.forall(s < _)
        }
      }
      val files = batches.flatMap(ChannelSource.dataFiles)
        .map(p => FileSlice(p.toString, Files.size(p)))
      ChannelScan.binPack(files,
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")))
    }
    override def createReaderFactory(): PartitionReaderFactory = factory()
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChannelMicroBatchStream(dir, factory(),
      weak = options.getBoolean("weak", false),
      startLatest = Option(options.get("startingOffsets")).exists(_.equalsIgnoreCase("latest")),
      startSeq = Option(options.get("startingSeq")).map(_.toLong),
      maxBatches = Option(options.get("maxBatchesPerTrigger")).map(_.toInt),
      clampSweepMs = Option(options.get("weakClampSweepMs")).map(_.toLong)
        .getOrElse(600000L))
}

private[graft] object ChannelScan {
  /** First-fit bin-packing of whole files into partitions of ≤ target
    * bytes (files ordered by batch seq, so each partition stays roughly
    * offset-contiguous). One oversized file still gets its own partition —
    * parquet row groups inside it are skipped via pushed filters. */
  def binPack(files: Seq[FileSlice], target: Long): Array[InputPartition] = {
    val parts = Seq.newBuilder[ChannelInputPartition]
    var cur = Vector.empty[FileSlice]
    var bytes = 0L
    for (f <- files) {
      if (cur.nonEmpty && bytes + f.length > target) {
        parts += ChannelInputPartition(cur); cur = Vector.empty; bytes = 0L
      }
      cur :+= f; bytes += f.length
    }
    if (cur.nonEmpty) parts += ChannelInputPartition(cur)
    parts.result().toArray
  }
}

final case class FileSlice(path: String, length: Long)

final case class ChannelInputPartition(files: Seq[FileSlice]) extends InputPartition

final class ChannelReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[ChannelInputPartition].files
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = files.iterator.flatMap { f =>
        readFunc(PartitionedFile(
          InternalRow.empty, SparkPath.fromPathString(f.path), 0, f.length))
      }.flatMap { r =>
        // returning_batch is pinned false, but stay defensive about the
        // cast-smuggled ColumnarBatch the parquet reader CAN emit (the
        // static element type is InternalRow, hence the Any indirection)
        (r: Any) match {
          case b: ColumnarBatch => b.rowIterator().asScala
          case row: org.apache.spark.sql.catalyst.InternalRow => Iterator.single(row)
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Offset = the next channel sequence number to read (exclusive end of
  * everything ingested), directly mirroring the reference's monotonically
  * increasing reader cursors. */
final case class ChannelSeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

final case class ChannelDataLoss(dir: String, missing: Seq[Long])
    extends RuntimeException(
      s"channel '$dir' lost seq(s) ${missing.mkString(",")} (evicted by Drop-mode " +
        "capacity or compacted mid-subscription); use weak=true to skip ahead")

final class ChannelMicroBatchStream(dir: Path, factory: PartitionReaderFactory,
                                    weak: Boolean, startLatest: Boolean,
                                    startSeq: Option[Long],
                                    maxBatches: Option[Int],
                                    clampSweepMs: Long = 600000L)
    extends MicroBatchStream with SupportsAdmissionControl {
  import ChannelSource._

  // weak-clamp persistence tracking (driver-side, one planner per query —
  // latestOffset is never called concurrently for a given stream)
  private var clampedSeq: Long = -1L
  private var clampedSince: Long = 0L

  /** Surfaces the topic dir in StreamingQueryProgress.sources.description
    * so tooling (e.g. Channel.ackFromProgress) can match a source to its
    * topic. */
  override def toString: String = s"GraftChannel[$dir]"

  /** Streaming sees only `batch_*` dirs (compaction is invisible to
    * subscriptions), grouped by seq — concurrent writers may share one. */
  private def batchDirs(): Seq[(Long, Seq[Path])] =
    Channel.listDir(dir)
      .filter(_.getFileName.toString.startsWith("batch_"))
      .groupBy(Channel.batchSeq).toSeq.sortBy(_._1)

  private def earliest(): Long = {
    val dirs = batchDirs()
    dirs.headOption.map(_._1).getOrElse(Channel.nextSeq(dir))
  }

  /** One past the last seq of the committed prefix: the stream never
    * advances into a half-written or still-contended seq (every dir at a
    * seq needs `_SUCCESS`), NOR — for strong readers — past a pending
    * `_res_` seq reservation (an in-flight writer whose batch dir may not
    * even exist yet; reservation-before-write is what makes seq offsets
    * strong for concurrent multi-writer topics). Weak readers are lossy
    * by contract (they already skip evicted seqs), so a stalled writer
    * must not park them. Seq GAPS (eviction, manual deletion) do not
    * hold the end back — planInputPartitions decides per mode whether a
    * gap inside the offset range is a skip (weak) or a loss (strict).
    *
    * O(1) per trigger: writers publish the committed head cursor on
    * every commit/abort/compact ([[Channel.advanceHead]] — the reference
    * contract of monotone 64-bit cursors,
    * /root/reference/subsystem/messaging/src/lib.rs:80-83), so a
    * long-lived topic with 10⁵–10⁶ batch dirs plans each trigger from
    * ONE small-file read instead of a full directory listing. The full
    * listing ([[Channel.committedEnds]]) remains the recovery path for
    * topics without a published cursor. */
  private def visibleEnd(): Long =
    Channel.readHead(dir) match {
      case Some((strict, weakEnd)) => if (weak) weakEnd else strict
      case None =>
        val (strict, weakEnd) = Channel.committedEnds(dir)
        if (weak) weakEnd else strict
    }

  /** Explicit `startingSeq` (the backfill→tail handoff: batch-read the
    * snapshot `[0, N)`, then subscribe from exactly N — no overlap, no
    * gap) takes precedence over latest/earliest. */
  override def initialOffset(): Offset =
    ChannelSeqOffset(startSeq.getOrElse(if (startLatest) visibleEnd() else earliest()))

  override def getDefaultReadLimit: ReadLimit =
    maxBatches.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(Offset, ReadLimit) is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ChannelSeqOffset].seq
    var end = visibleEnd()
    // A WEAK advance must never SPAN an in-flight seq: the epoch's
    // content would be re-decided from live filesystem state on failure
    // replay (the seq commits in between → the replayed epoch contains
    // rows the original dropped — non-deterministic replay), and once
    // the offset passes the seq, its later-committed data is silently
    // skipped forever (a REAL loss, unlike the evicted/aborted holes
    // weak semantics advertise). "In-flight" has TWO on-disk shapes,
    // both clamped at:
    //  - a batch dir missing `_SUCCESS` (writer mid-parquet-job);
    //  - a `_res_` reservation whose batch dir does not exist YET (the
    //    window between reserveSeq and the parquet job creating the
    //    target dir) — invisible to a batch_*-only listing, so it gets
    //    its own minimum over the same single listing.
    // Either way the rival commits (next trigger resumes past it) or
    // is swept to an `_abort_` tombstone (benign hole — sweepStale
    // bounds how long a crashed writer can park the clamp). Costs one
    // listing ONLY on non-idle triggers (idle offset planning stays
    // O(1) off the published head, pinned by the Dsv2 suite); new
    // reservations always land at or above the published weak end, so
    // nothing can appear inside an already-offered range afterwards —
    // which is what makes planInputPartitions deterministic for a
    // fixed range.
    if (weak && end > from) {
      val entries = Channel.listDir(dir)
      val bySeq = entries
        .filter(_.getFileName.toString.startsWith("batch_"))
        .groupBy(Channel.batchSeq)
      def committed(ds: Seq[Path]): Boolean =
        ds.forall(p => Files.exists(p.resolve("_SUCCESS")))
      // a TOMBSTONED seq is RESOLVED, not in-flight — Channel.write's
      // failure path tombstones the seq but may leave its partial dir
      // behind (only compact/sweep removes it), and parking on that
      // dir would wedge every weak subscriber FOREVER on a hole that
      // strict mode (planInputPartitions' benign set) correctly skips
      val aborted = entries
        .filter(_.getFileName.toString.startsWith(Channel.AbortPrefix))
        .map(p => p.getFileName.toString.drop(Channel.AbortPrefix.length).toLong)
        .toSet
      val firstInFlightDir = bySeq.toSeq.sortBy(_._1)
        .find { case (seq, ds) => seq >= from && seq < end &&
          !committed(ds) && !aborted(seq) }
        .map(_._1)
      // reservations whose seq already has a fully committed dir are
      // release-lagged markers (commit happens before marker delete),
      // not in-flight writes — same exclusion committedEnds applies;
      // tombstoned seqs are resolved holes as above
      val firstPendingRes = entries
        .filter(_.getFileName.toString.startsWith(Channel.ResPrefix))
        .map(p => p.getFileName.toString.drop(Channel.ResPrefix.length).toLong)
        .filter(s0 => s0 >= from && s0 < end)
        .filterNot(s0 => aborted(s0) || bySeq.get(s0).exists(committed))
        .minOption
      val clampAt = (firstInFlightDir.toSeq ++ firstPendingRes).minOption
      end = (Seq(end) ++ clampAt).min
      // Self-healing: a weak-ONLY subscriber has no guarantee any
      // maintenance actor ever runs sweepStale, so a crashed writer's
      // reservation would park the clamp forever (the r10 clamp traded
      // silent loss for liveness-by-maintenance). If the clamp has sat
      // at the SAME seq for longer than clampSweepMs, the planner runs
      // the age-gated sweep itself with that age as the cutoff — the
      // same wall-clock judgement an operator cron would make, with the
      // same documented risk profile (default 10 min; a writer slower
      // than that is declared dead either way). Re-armed after each
      // attempt so a sweep that finds nothing (e.g. the marker is
      // younger than the clamp observation) retries one period later
      // instead of hammering the listing.
      clampAt match {
        case Some(s) =>
          val now = System.currentTimeMillis()
          // wait vs cutoff are SEPARATE dials: the option (floored at 1 s
          // so a zero/negative setting can't sweep on every trigger)
          // controls how long to stay parked before attempting
          // maintenance; the sweep's staleness cutoff never drops below
          // sweepStale's documented-safe default (10 min), so a reader
          // configured for snappy liveness still cannot declare a LIVE
          // writer dead and destroy its in-flight batch — only markers
          // already older than the full cutoff are reclaimed.
          if (s != clampedSeq) { clampedSeq = s; clampedSince = now }
          else if (now - clampedSince >= math.max(clampSweepMs, 1000L)) {
            Channel.sweepStaleAt(dir, math.max(clampSweepMs, 600000L))
            clampedSince = now
          }
        case _ => clampedSeq = -1L
      }
    }
    val capped = limit match {
      case m: ReadMaxFiles => math.min(end, from + m.maxFiles())
      case _ => end
    }
    ChannelSeqOffset(math.max(from, capped))
  }

  override def reportLatestOffset(): Offset = ChannelSeqOffset(visibleEnd())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChannelSeqOffset].seq
    val e = end.asInstanceOf[ChannelSeqOffset].seq
    // Only FULLY COMMITTED dirs are plannable. By construction neither
    // mode's offered end spans an uncommitted dir (STRICT parks at the
    // live reservation marker, which outlives any partial dir; WEAK
    // clamps at the first in-flight dir in latestOffset above), so this
    // filter is defense-in-depth for the states offsets cannot rule out
    // — retention/compaction racing the plan, or out-of-band damage. A
    // weak plan drops such a dir as the benign hole weak semantics
    // already tolerate; a strict plan counts it as loss below and fails
    // LOUDLY instead of half-reading a mid-write batch.
    val planned = batchDirs()
      .filter { case (seq, ds) => seq >= s && seq < e &&
        ds.forall(p => Files.exists(p.resolve("_SUCCESS"))) }
    if (!weak) {
      // `_abort_` tombstones are holes that never held data (failed or
      // capacity-rejected writes), and a `compact_N` dir consumed seq N
      // without a batch (its content was already delivered as the
      // original batches) — neither is loss
      val benign = Channel.abortSeqs(dir).toSet ++ Channel.compactSeqs(dir)
      val missing = (s until e).filterNot(planned.map(_._1).toSet ++ benign)
      if (missing.nonEmpty) throw ChannelDataLoss(dir.toString, missing)
    }
    planned.flatMap(_._2).flatMap(dataFiles)
      .map(p => ChannelInputPartition(Seq(FileSlice(p.toString, Files.size(p)))))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = factory

  override def deserializeOffset(json: String): Offset = ChannelSeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
