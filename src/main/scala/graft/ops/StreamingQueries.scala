package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Tables._
import graft.streaming.StreamingIngest

/**
 * Streaming operators with a BATCH-CHECKABLE face — registered queries
 * that execute the REAL structured-streaming code path
 * (`readStream` file source → graft.streaming transforms →
 * `Trigger.AvailableNow` micro-batches → memory sink) and hand the
 * settled result to the same DuckDB differential as every batch query.
 * Until round 8 the batch≡streaming equivalences lived only in
 * StreamingSpec, invisible to the driver's correctness gate (r7 verdict
 * item 6); these rows are the first CORRECTNESS entries whose execution
 * actually runs `streaming/StreamingIngest.scala` code.
 *
 * Determinism note: AvailableNow replays the fixture as one bounded
 * stream; complete-mode aggregation (q257) and a stateless stream-static
 * anti-join (q258) are both batch-equivalent BY SEMANTICS, not by luck —
 * no watermark-dependent row withholding is involved (complete mode
 * re-emits full state; the anti-join keeps no state at all). Memory-sink
 * table names carry a nonce so Verify + 3 bench iterations in one JVM
 * never collide.
 *
 * Scale shape: the same code runs unbounded — tumblingCounts'
 * watermarked state evicts closed windows (update/append mode in
 * production, complete mode here only because the oracle wants the full
 * history), and the dedup gate's "state" is the static corpus table,
 * re-planned per micro-batch (see dedupAgainstCorpus's scaladoc).
 */
object StreamingQueries {

  private val nonce = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Scale-adaptive stateful-shuffle sizing for the streaming faces
    * (guide §2: derive partitioning from input size, never a constant
    * tuned to one environment). A streaming query's shuffle-partition
    * count is DURABLE — it fixes the number of state-store instances,
    * is baked into the checkpoint at first start, and every micro-batch
    * thereafter pays one store open + commit + WAL entry PER PARTITION
    * whether or not it holds state. The set/restore is session-global:
    * these bounded drains are strictly sequential per session (Bench,
    * Verify and the driver all run queries one at a time) — concurrent
    * batch work on the SAME session during a drain would see the derived
    * count; use a separate session for such work. Sized to the DATA
    * (one store per `spark.graft.stream.stateTargetBytes` of source,
    * default 64 MB), not to the local core count: the fixture derives
    * 1–2 stores instead of 32 mostly-empty ones (the stream-stream join
    * keeps FOUR stores per partition), and a 100 TB source derives
    * thousands. Set/restored around the bounded AvailableNow drain; an
    * explicit conf overrides the derivation for deployments that know
    * their state volume. */
  private def withStatePartitions[A](s: SparkSession, srcBytes: Long)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val target = s.conf.get("spark.graft.stream.stateTargetBytes",
      (64L * 1024 * 1024).toString).toLong
    // Floor: a few partitions of compute parallelism even when the state
    // itself would fit one store (a complete-mode replay re-scans all
    // state per batch — measured 0.65 s slower single-tasked at fixture
    // scale); the floor stays far below core count so near-empty store
    // commits remain bounded. bytes/target dominates at any real volume.
    val floor = s.conf.get("spark.graft.stream.minStatePartitions", "4").toLong
    val derived = derivedStatePartitions(srcBytes, target, floor)
    val prev = s.conf.get(key)
    s.conf.set(key, derived.toString)
    try body finally s.conf.set(key, prev)
  }

  /** The pure derivation under [[withStatePartitions]], split out for
    * StreamingSpec: ceil(srcBytes / targetBytes), floored at `floor`,
    * capped at 2²⁰ stores. */
  private[graft] def derivedStatePartitions(srcBytes: Long, targetBytes: Long,
      floor: Long): Int =
    math.max(floor, math.min((srcBytes + targetBytes - 1) / targetBytes,
      1L << 20)).toInt

  /** Source size feeding the state-partition derivation: a RECURSIVE
    * leaf-file sum through the Hadoop FileSystem API. `java.io.File.length`
    * (the r10 implementation) returns 0 for any non-local URI and ~4 KB for
    * a directory-layout parquet table, degenerating the derivation to the
    * floor on exactly the sources that need real state sizing; content
    * summary counts the actual bytes for single files, directory tables and
    * remote filesystems alike. Unknown/missing paths report 0 — the
    * derivation then uses its floor. */
  private[graft] def fixtureBytes(s: SparkSession, dir: String, table: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    try p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
    catch { case _: java.io.IOException => 0L }
  }

  /** Scratch checkpoint for the bounded batch-face drains. These streams
    * END inside the call (AvailableNow → memory sink → settled table), so
    * their checkpoint is pure scratch: there is no resume, and durability
    * buys nothing — while every offset/commit/state file it writes is
    * fsync'd, which measured 30–40% of each face's cost on a disk-backed
    * tmpdir. Default root: /dev/shm when present (RAM-backed, exists on
    * any modern Linux), else java.io.tmpdir. A deployment running a REAL
    * continuous stream must point `spark.graft.stream.checkpointDir` at
    * durable shared storage — that contract is exactly why this is a
    * conf, and the production StreamingIngest pipelines take an explicit
    * checkpoint path already (this helper is only for the driver-checked
    * faces). Each call returns a fresh subdir; [[dropScratch]] removes it
    * after the drain (a shutdown hook sweeps the root as backstop). */
  private def scratchCheckpoint(s: SparkSession): String = {
    val root = s.conf.getOption("spark.graft.stream.checkpointDir")
      .map(new java.io.File(_)).getOrElse(scratchRoot)
    root.mkdirs()
    // Unique PER RUN, not per JVM: "ck" + AtomicLong restarts at 1 every
    // JVM, so under a configured checkpointDir a crashed run's leftover
    // ck1 would be REUSED by the next run — AvailableNow then sees all
    // offsets committed and the sink settles empty (r10 advice).
    new java.io.File(root,
      "ck_" + java.util.UUID.randomUUID().toString).getAbsolutePath
  }

  private def dropScratch(path: String): Unit = rmRec(new java.io.File(path))

  private def rmRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmRec))
    f.delete(); ()
  }

  private lazy val scratchRoot: java.io.File = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val root = java.nio.file.Files.createTempDirectory(base, "graft_ck_").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmRec(root)))
    root
  }

  /** Run `build(stream)` over a fixture table read AS A STREAM, collect
    * through a memory sink with AvailableNow, and return the settled
    * table. The stream read applies the same ntz normalization as the
    * batch [[Tables.t]] path. */
  private def settle(s: SparkSession, dir: String, table: String,
      mode: String)(build: DataFrame => DataFrame): DataFrame = {
    val schema = s.read.parquet(s"$dir/$table.parquet").schema
    // The fixture is a single FILE and the file-source stream wants a
    // DIRECTORY — stream the fixture dir with a glob pinned to the one
    // table so sibling tables never enter the stream.
    val src = ntzNorm(s.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir))
    settleDf(s, build(src), mode, fixtureBytes(s, dir, table))
  }

  /** The sink half of [[settle]], split out for faces that build their
    * own source (the 2-file staged streams below): memory sink,
    * AvailableNow, drain, return the settled table. `srcBytes` sizes the
    * stream's stateful shuffle via [[withStatePartitions]]. */
  private def settleDf(s: SparkSession, built: DataFrame, mode: String,
      srcBytes: Long): DataFrame = {
    val sink = s"graft_stream_q_${nonce.incrementAndGet()}"
    val ck = scratchCheckpoint(s)
    // finally, not post-success: a failed drain must not leak its scratch
    // checkpoint (the shutdown hook sweeps only the default root, never a
    // user-configured spark.graft.stream.checkpointDir — r10 advice).
    try withStatePartitions(s, srcBytes) {
      val q = built.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ck)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally dropScratch(ck)
    s.table(sink)
  }

  /** Stage the events fixture as an N-FILE copy — file b<i> = the rows
    * matching `parts(i)` (the predicates must partition the fixture) —
    * with modification times 2 minutes apart, so a file-source stream
    * reading it with `maxFilesPerTrigger=1` replays the fixture as N
    * ORDERED micro-batches (FileStreamSource schedules files
    * oldest-mtime first; the b0..bN names give the same order
    * lexically). This is the harness piece that makes MULTI-batch
    * semantics — watermark eviction, update-mode changed-keys
    * emission — driver-visible: the single-file settle() replay always
    * collapses to one data batch (r9 verdict items 3–4). Input is
    * ntz-normalized BEFORE staging so the staged ts column is a plain
    * UTC TimestampType both engines read identically. The staged dir is
    * MEMOIZED per (application, fixture, face) — the split is pure
    * fixture content, and a 3-iteration bench would otherwise rewrite
    * ~2× the events table per face per iteration (the q91 layout-memo
    * lesson); each READER still gets a fresh source-tracking log
    * because the checkpoint lives with the query, not the staging. */
  private def stageEventsSplit(s: SparkSession, dir: String, face: String,
      parts: Seq[Column]): String =
    stageCache.computeIfAbsent(
      AppCaches.key(s, dir, stageCache) + "#" + face,
      { _ => buildStagedSplit(s, dir, parts) })

  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def buildStagedSplit(s: SparkSession, dir: String,
      parts: Seq[Column]): String = {
    val ev = ntzNorm(s.read.parquet(s"$dir/events.parquet"))
    val root = java.nio.file.Files.createTempDirectory("graft_stage_").toFile
    // deleteOnExit can't remove a non-empty directory — register a
    // recursive cleanup instead so repeated Verify/Bench JVMs don't
    // accumulate staged copies under the temp filesystem.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(root)
    }))
    val stage = new java.io.File(root, "stage")
    stage.mkdirs()
    def writeOne(df: DataFrame, name: String, mtime: Long): Long = {
      val work = new java.io.File(root, name + "_w")
      df.coalesce(1).write.parquet(work.getAbsolutePath)
      val part = work.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written under $work"))
      val dst = new java.io.File(stage, name + ".parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(mtime), s"cannot set mtime on $dst")
      s.read.parquet(dst.getAbsolutePath).count()
    }
    val now = System.currentTimeMillis()
    val staged = parts.zipWithIndex.map { case (p, i) =>
      writeOne(ev.filter(p), s"b$i", now - 120000L * (parts.size - 1 - i))
    }.sum
    // The scaladoc contract, enforced: the predicates must PARTITION the
    // fixture (no overlap, no NULL-predicate drops) — a silently lossy
    // or duplicating split would poison every memoized iteration with
    // nothing pointing back here.
    val total = ev.count()
    require(staged == total,
      s"staged split is not a partition: ${staged} staged vs $total fixture rows")
    stage.getAbsolutePath
  }

  /** Streaming read of a [[stageEventsSplit]] directory: one file per
    * micro-batch, in mtime order. */
  private def readStaged(s: SparkSession, stagePath: String): DataFrame =
    s.readStream.schema(s.read.parquet(stagePath).schema)
      .option("maxFilesPerTrigger", "1").parquet(stagePath)

  /** Scope the RocksDB state-store provider (mandatory for
    * transformWithState) to one stream start, restoring the previous
    * provider after — shared by q279/q283 so the swap/restore logic
    * lives once. The provider class is read at query START; by the time
    * `body` returns, the settled memory table is already materialized. */
  private def withRocksDBProvider[A](s: SparkSession)(body: => A): A = {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(confKey)
    s.conf.set(confKey, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(confKey, v)
      case None    => s.conf.unset(confKey)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------- streaming tumbling rollup, batch face
    // StreamingIngest.tumblingCounts (watermark + window().groupBy) fed
    // by the events fixture as a file-source stream: hourly event_type
    // counts. Complete mode emits every window, so the result equals the
    // batch GROUP BY — the equivalence StreamingSpec pins now faces the
    // DuckDB oracle too. Windows align to the epoch (Spark's default),
    // so the oracle is integer µs modulo arithmetic — engine-exact.
    "q257_streaming_tumbling_rollup" -> { (s, dir) =>
      import s.implicits._
      settle(s, dir, "events", "complete") { src =>
        StreamingIngest.tumblingCounts(eventsNorm(src), "ts", "event_type",
          "1 hour")
      }
        .select($"event_type",
          unix_micros($"window.start").as("window_start_us"),
          $"n")
        .orderBy($"event_type", $"window_start_us")
    },

    // ------------------- streaming dedup-against-corpus, batch face
    // StreamingIngest.dedupAgainstCorpus — the stream-static left-anti
    // gate (q64's streaming operating mode): arriving documents
    // (doc_id % 10 ≥ 8 stands in for "this delivery") pass only if their
    // content hash is unseen in the static corpus (the rest). Stateless,
    // so append mode emits exactly the batch anti-join. NULL-text rows
    // hash to NULL and survive in BOTH engines (null joins nothing in a
    // left_anti / in the oracle's null-never-equal LEFT JOIN).
    "q258_streaming_dedup_gate" -> { (s, dir) =>
      import s.implicits._
      val corpus = t(s, dir, "documents").filter($"doc_id" % 10 < 8)
        .select(md5($"text").as("text_md5"))
      settle(s, dir, "documents", "append") { src =>
        StreamingIngest.dedupAgainstCorpus(
          src.filter(col("doc_id") % 10 >= 8), corpus, "text")
      }
        .select($"doc_id", $"text_md5")
        .orderBy($"doc_id")
    },

    // ---------------------- streaming gap sessionization, batch face
    // StreamingIngest.sessionCounts (watermark + session_window gap
    // merge — the streaming operating mode of q15/q127's batch
    // sessionization) over the events fixture as a file-source stream.
    // Session windows support complete mode (update is the unsupported
    // one) and need a non-window grouping column — user_id here, which
    // also makes the state key (user, session) as it must be at scale.
    // Complete mode re-emits the full merged-session state, so the
    // settled table equals the batch gap-and-islands result; window
    // bounds are exact integer µs (start = first event, end = last
    // event + gap), so the oracle is q127's lag/cumsum island SQL.
    "q265_streaming_session_rollup" -> { (s, dir) =>
      import s.implicits._
      settle(s, dir, "events", "complete") { src =>
        StreamingIngest.sessionCounts(eventsNorm(src), "ts", "user_id",
          "30 minutes")
      }
        .select($"user_id",
          unix_micros($"session_window.start").as("session_start_us"),
          unix_micros($"session_window.end").as("session_end_us"),
          $"n")
        .orderBy($"user_id", $"session_start_us")
    },

    // ----------------- streaming click→purchase attribution, batch face
    // StreamingIngest.clickAttribution — the watermarked STREAM-STREAM
    // time-range inner join (the streaming operating mode of q23/q25's
    // as-of/attribution family), both sides carved from the events
    // fixture arriving as one file-source stream. First driver-checked
    // row whose execution runs StreamingSymmetricHashJoinExec (r8
    // verdict item 6). Determinism: an inner stream-stream join emits a
    // match as soon as both rows are in state and drops rows only when
    // one side's state was evicted by the watermark BEFORE the other
    // side arrived — the single-file fixture replays as ONE data
    // micro-batch, so both sides co-reside in state and the settled
    // output equals the batch time-range join exactly, independent of
    // the watermark. The oracle is the equivalent batch interval join.
    "q271_streaming_click_attribution" -> { (s, dir) =>
      import s.implicits._
      settle(s, dir, "events", "append") { src =>
        val ev = eventsNorm(src)
        StreamingIngest.clickAttribution(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "purchase"),
          "user_id", "ts", within = "30 minutes")
      }
        .select($"user".as("user_id"),
          unix_micros($"click_ts").as("click_us"),
          unix_micros($"purchase_ts").as("purchase_us"))
        .orderBy($"user_id", $"click_us", $"purchase_us")
    },

    // ----------------------------- streaming anomaly gate, batch face
    // StreamingIngest.anomalyGate — the stream-static z-score volume
    // monitor (q98's integer-moment discipline at arrival time): hourly
    // per-type counts z-scored against a BROADCAST batch-warehouse
    // moments frame, windows beyond |z| > 2 flagged. This is the first
    // driver-checked row emitting from an APPEND-mode watermarked
    // aggregation (q257/q265 use complete mode): append emits a window
    // only once the watermark passes its END, so the settled output is
    // the batch result RESTRICTED to windows with
    // end ≤ max(ts) − 10 min — a deterministic cutoff the oracle states
    // verbatim (AvailableNow runs a final no-data commit batch after the
    // watermark advances, flushing every closed window; the trailing
    // sub-watermark windows stay in state by design — that withholding
    // IS append mode's late-data contract). Window ends are hour-aligned
    // and max(ts) sits at an arbitrary µs, so the ≤-vs-< boundary cannot
    // bite on any real fixture. The face keeps only finite-z rows
    // (sd > 0 — the ±Infinity zero-variance branch is StreamingSpec's
    // job; an Infinity literal would be loader-hostile in the oracle).
    "q277_streaming_anomaly_gate" -> { (s, dir) =>
      import s.implicits._
      val hourly = events(s, dir)
        .groupBy($"event_type", window($"ts", "1 hour"))
        .agg(count(lit(1)).as("x"))
      val stats = hourly.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"x" * $"x").as("sx2"))
      settle(s, dir, "events", "append") { src =>
        StreamingIngest.anomalyGate(eventsNorm(src), "ts", "event_type",
          stats, "1 hour", zLimit = 2.0)
      }
        // finite-z only: abs(NaN) and abs(±Inf) both fail `< Inf` (Spark
        // orders NaN greater than every value), one predicate covers both
        .filter(abs($"z") < lit(Double.PositiveInfinity))
        .select($"event_type",
          unix_micros($"window.start").as("window_start_us"),
          $"n_events", round($"z", 6).as("z"))
        .orderBy($"event_type", $"window_start_us")
    },

    // --------------------- streaming trending top-k, foreachBatch face
    // StreamingIngest.trendingTopK through a REAL foreachBatch sink —
    // the first driver-checked row executing the custom GroupTopK plan
    // operator INSIDE a streaming micro-batch (StreamingSpec pins the
    // operator is in the executed plan; this row puts its output in
    // front of the DuckDB differential). Per-batch semantics are the
    // operator's contract ("top keys among THIS trigger's arrivals"),
    // and the single-file fixture replays as ONE batch, so the settled
    // rows equal the batch per-hour top-3 exactly. The driver-side
    // buffer is the foreachBatch analogue of the memory sink — bounded
    // at windows × k rows (control-plane by construction).
    "q278_streaming_trending_topk" -> { (s, dir) =>
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val src = ntzNorm(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val buf =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
      withStatePartitions(s, fixtureBytes(s, dir, "events")) {
        val ck = scratchCheckpoint(s)
        try {
          val q = src.writeStream
            .option("checkpointLocation", ck)
            .foreachBatch { (batch: DataFrame, _: Long) =>
              StreamingIngest.trendingTopK(eventsNorm(batch), "ts",
                  "event_type", "1 hour", k = 3)
                .select(unix_micros(col("window.start")), col("event_type"),
                  col("n"))
                .collect()
                .foreach(r => buf.add((r.getLong(0), r.getString(1), r.getLong(2))))
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        } finally dropScratch(ck)
      }
      import scala.jdk.CollectionConverters._
      s.createDataFrame(buf.asScala.toSeq)
        .toDF("window_start_us", "event_type", "n")
        .orderBy($"window_start_us", $"event_type")
    },

    // --------------------------- streaming curation gate, batch face
    // StreamingIngest.curationGate — the stateless arrival-time quality
    // + repetition filter (q38's quality formula ∧ q69's top-word-share
    // boilerplate signal) applied to the documents fixture as a
    // file-source stream. Pure per-row projection + filter: no
    // watermark, no state store, so append mode IS the batch filter and
    // the gate is batching-invariant by construction (StreamingSpec
    // already pins split-batch ≡ one-batch; this row puts the executed
    // streaming path in front of the DuckDB differential). Thresholds
    // sit inside the fixture's score distributions (tws median 0.093 /
    // p90 0.14 at sf0.01) so both sides of each gate are exercised.
    "q276_streaming_curation_gate" -> { (s, dir) =>
      import s.implicits._
      settle(s, dir, "documents", "append") { src =>
        StreamingIngest.curationGate(src,
          minQuality = CurationMinQuality, maxTopWordShare = CurationMaxTws)
      }
        .select($"doc_id", $"quality", $"top_word_share")
        .orderBy($"doc_id")
    },

    // ------------------ transformWithState TTL dedup, driver face (r10)
    // StreamingIngest.ttlDedupGate — arbitrary typed state with
    // DECLARATIVE TTL (Spark 4's transformWithState + RocksDB store) —
    // was the last streaming operator family the DuckDB differential
    // never saw (r9 verdict item 1). Determinism: the single-file
    // fixture replays as ONE data batch, so TTL (processing-time,
    // 1 hour) can never expire mid-run and the gate degenerates to
    // exact per-key first-occurrence — each key emits exactly one row
    // (emitted = 1, suppressed = n − 1), which IS the batch GROUP BY.
    // StreamingSpec keeps pinning the cross-batch TTL/suppression
    // semantics this face can't show. The RocksDB provider switch is
    // scoped to the stream start and restored after (the store class is
    // read at query start; the settled memory table is already
    // materialized by then).
    //
    // Drain protocol: TTL state forces TimeMode.ProcessingTime, and
    // that mode schedules TTL-bookkeeping batches indefinitely — even
    // Trigger.AvailableNow never terminates (measured; the verify-skill
    // gotcha). So this face can't ride settle(): it polls the memory
    // sink until the DETERMINISTIC expected row count (one row per
    // distinct key, known up front from the batch side) has landed —
    // which happens at the end of the single data batch — then stops
    // the query. The poll is on row COUNT only; values still face the
    // oracle.
    "q279_streaming_ttl_dedup" -> { (s, dir) =>
      import s.implicits._
      val expected = events(s, dir).filter($"user_id".isNotNull)
        .select($"user_id").distinct().count()
      withRocksDBProvider(s) { withStatePartitions(s, fixtureBytes(s, dir, "events")) {
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val src = ntzNorm(s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
        val sink = s"graft_stream_q_${nonce.incrementAndGet()}"
        val ck = scratchCheckpoint(s)
        try {
          val q = StreamingIngest.ttlDedupGate(s,
              src.filter(col("user_id").isNotNull), "user_id",
              java.time.Duration.ofHours(1)).toDF()
            .writeStream.format("memory").queryName(sink)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          // Health-aware poll: a dead query must surface ITS exception
          // immediately, not a 180 s hang ending in a row-count error
          // (this drain bypasses awaitTermination's propagation path).
          val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
          while (q.isActive && s.table(sink).count() < expected &&
              System.nanoTime() < deadline)
            Thread.sleep(50) // fine-grained: the 200 ms quantum added up to
                             // ~0.2 s of pure wait after the batch landed
          q.stop()
          q.exception.foreach(throw _)
        } finally dropScratch(ck)
        require(s.table(sink).count() == expected,
          s"ttl dedup face: sink never reached $expected rows")
        s.table(sink)
          .select($"key".cast("long").as("user_id"),
            $"emitted".cast("long").as("emitted"), $"suppressed")
          .orderBy($"user_id")
      } }
    },

    // ---------------- flatMapGroupsWithState funnel, driver face (r10)
    // StreamingIngest.funnelStages — the arbitrary-state machine
    // (per-user view → click → purchase progression) through the
    // settle() harness. Determinism: within a micro-batch the fold
    // sorts by (ms, type) and a stage only advances on a STRICTLY later
    // timestamp, so on a one-batch replay the emitted advance snapshots
    // are exactly the min-chain: stage 1 at min(view ms), stage 2 at
    // min(click ms > stage-1 ms), stage 3 at min(purchase ms > stage-2
    // ms) — which the oracle states verbatim. (Equal-ms events sort
    // 'click' < 'purchase' < 'view', but an equal-ms event can never
    // advance past the strict > gate, so the tiebreak cannot reach the
    // output.) StreamingSpec pins the cross-batch arrival-order stance.
    "q282_streaming_funnel" -> { (s, dir) =>
      import s.implicits._
      settle(s, dir, "events", "append") { src =>
        StreamingIngest.funnelStages(s,
          eventsNorm(src).filter(col("user_id").isNotNull),
          "user_id", "event_type", "ms").toDF()
      }
        .select($"userId".cast("long").as("user_id"),
          $"stage".cast("long").as("stage"), $"stageMs".as("stage_ms"))
        .orderBy($"user_id", $"stage")
    },

    // --------------------- watermark EVICTION made visible, driver face
    // The one streaming behavior no single-batch face can show: a LATE
    // row actually dropped by the watermark (r9 verdict item 3). The
    // events fixture is staged as THREE ordered files
    // (stageEventsSplit): b0/b1 split the on-time rows (b0 includes
    // max(ts)), b2 = the late subset — every 5th µs-stamp at least 3 h
    // older than max(ts). Three files, not two, because of Spark's
    // two-watermark semantics (SPARK-40925, 3.4+): batch N filters LATE
    // events with the watermark batch N−1 ran with, while EVICTION uses
    // the current value — so a 2-file split would process the late file
    // under lateness watermark 0 and drop nothing (measured: 865 rows,
    // zero numRowsDroppedByWatermark). Timeline here: batch 0 (b0,
    // includes max(ts)) runs under watermark 0 and advances it to
    // max(ts) − 2 h; batch 1 (b1) still FILTERS with 0 (all accepted)
    // but EVICTS-and-emits the closed windows (end ≤ max(ts) − 2 h);
    // batch 2 (b2) filters with max(ts) − 2 h, and every b2 row sits
    // ≥ 1 h below it (the 3 h staging margin vs the 2 h delay — the
    // ≤-vs-< lateness boundary can never bite), so all are dropped
    // before state. The settled table therefore equals the batch hourly
    // rollup over the NON-late rows restricted to windows with end ≤
    // max(ts) − 2 h — the oracle states both the late-drop predicate
    // and the emission cutoff verbatim. StreamingSpec's twin asserts
    // the dropped rows were present in the staged input.
    "q280_streaming_late_data" -> { (s, dir) =>
      import s.implicits._
      val mt = t(s, dir, "events")
        .agg(max(unix_micros($"ts"))).head().getLong(0)
      val us = unix_micros(col("ts"))
      val late = us % 5 === 0 && us <= mt - 3L * 3600000000L
      // The max(ts) row is pinned INTO b0 (us === mt overrides the %3
      // sub-split): the whole timeline argument rests on batch 0
      // advancing the watermark to max(ts) − 2 h, and leaving that to
      // the %3 draw would break on ~1/3 of fixture regenerations.
      val src = readStaged(s, stageEventsSplit(s, dir, "late",
        Seq(!late && (us % 3 =!= 0 || us === mt),
          !late && us % 3 === 0 && us =!= mt, late)))
      settleDf(s,
        StreamingIngest.tumblingCounts(eventsNorm(src), "ts", "event_type",
          "1 hour", watermark = "2 hours"), "append",
        fixtureBytes(s, dir, "events"))
        .select($"event_type",
          unix_micros($"window.start").as("window_start_us"), $"n")
        .orderBy($"event_type", $"window_start_us")
    },

    // ------------- transformWithState EVENT-TIME TIMERS, driver face (r10)
    // StreamingIngest.sessionCloseGate — the timer half of
    // transformWithState (q279 covers value-state + TTL): per-key
    // session state closes when the WATERMARK passes last-event + gap,
    // i.e. emission is driven by stream progress, not by new data.
    // Determinism on a one-batch replay: handleInputRows folds ALL of a
    // key's batch rows into ONE [min, max] session (the gap splits
    // sessions only ACROSS batches — it arms the close timer), so after
    // the single data batch every key holds one session and a timer at
    // end + gap. AvailableNow then runs the final no-data batch with
    // the advanced watermark (= max(ts), delay 0), firing exactly the
    // timers with expiry ≤ watermark — so the settled output is the
    // per-key (min, max, count) frame RESTRICTED to keys whose last
    // event is at least `gap` older than the stream's end; the trailing
    // still-open sessions are withheld by design (that withholding IS
    // the timer contract). The oracle states the close predicate
    // verbatim. Timers and state shard by key; RocksDB scoped as q279.
    "q283_streaming_session_close" -> { (s, dir) =>
      import s.implicits._
      withRocksDBProvider(s) {
        settle(s, dir, "events", "append") { src =>
          StreamingIngest.sessionCloseGate(s,
            eventsNorm(src).filter(col("user_id").isNotNull),
            "ts", "user_id", gapMs = 1800000L, watermark = "0 seconds")
            .toDF()
        }
          .select($"key".cast("long").as("user_id"),
            $"startMs".as("start_ms"), $"endMs".as("end_ms"), $"nEvents".as("n_events"))
          .orderBy($"user_id")
      }
    },

    // -------------------- token-bucket admission gate, driver face (r10)
    // StreamingIngest.rateLimitGate — per-key EVENT-TIME token-bucket
    // quota (flatMapGroupsWithState carrying (tokens, lastMs) across
    // batches). The fold is sequential per key, which a set-oriented
    // oracle can't state directly — but DuckDB's RECURSIVE CTE can run
    // the identical fold (the q47/q63 recursive-closure precedent):
    // rank the key's events by (ms, id) — the same order the gate sorts
    // a batch — and advance (tokens, last) rank by rank with the same
    // double arithmetic in the same operation order (refill =
    // min(cap, tokens + Δms/1000·rps)); IEEE doubles are then
    // bit-identical cross-engine, so the admit/deny decisions
    // hash-match exactly. One-batch replay makes the in-batch sort the
    // total history order. Params (capacity 2, refill 1 token/DAY) are
    // chosen so the fixture's inter-event gaps exercise BOTH branches
    // (sf0.001: 437 admits / 563 denials); refill 1/s would saturate on
    // an events table whose per-user gaps are hours. Recursion depth =
    // max per-key event count — bounded by the hottest key, not the
    // stream.
    "q284_streaming_rate_limit" -> { (s, dir) =>
      import s.implicits._
      settle(s, dir, "events", "append") { src =>
        StreamingIngest.rateLimitGate(s,
          eventsNorm(src).filter(col("user_id").isNotNull),
          "user_id", "event_id", "ms",
          capacity = 2.0, refillPerSec = 1.0 / 86400.0).toDF()
      }
        .select($"key".cast("long").as("user_id"), $"id".as("event_id"),
          $"ms", $"admitted".cast("long").as("admitted"))
        .orderBy($"user_id", $"ms", $"event_id")
    },

    // --------------------------- update-mode emission, driver face (r10)
    // The third output mode (q257/q265 complete, q271/q277/q280 append):
    // update emits ONLY the keys whose aggregate changed in the
    // trigger, merged downstream latest-wins (r9 verdict item 4). The
    // staged split puts every 'error' row in batch 1 and everything
    // else in batch 0, so the changed-key sets are disjoint by
    // construction and the per-key LAST update batch is itself
    // deterministic: 1 for 'error', 0 for every other type — the face
    // emits it as a column, making update-mode selectivity (not just
    // the final counts) oracle-checked. Latest-wins ≡ batch because a
    // streaming count is monotone per key: the last update a key ever
    // gets carries its full-history total, which is the batch GROUP BY
    // count. The driver-side map is the foreachBatch analogue of the
    // memory sink — bounded at one entry per event type.
    "q281_streaming_update_counts" -> { (s, dir) =>
      import s.implicits._
      val src = readStaged(s, stageEventsSplit(s, dir, "err",
        Seq(col("event_type") =!= "error", col("event_type") === "error")))
      val buf = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
      withStatePartitions(s, fixtureBytes(s, dir, "events")) {
        val ck = scratchCheckpoint(s)
        try {
          val q = src.filter(col("event_type").isNotNull)
            .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
            .writeStream.outputMode("update")
            .option("checkpointLocation", ck)
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              batch.collect().foreach { r =>
                buf.put(r.getString(0), (r.getLong(1), batchId))
              }
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        } finally dropScratch(ck)
      }
      import scala.jdk.CollectionConverters._
      s.createDataFrame(buf.asScala.toSeq.map { case (k, (n, b)) => (k, n, b) })
        .toDF("event_type", "n", "last_update_batch")
        .orderBy($"event_type")
    }
  )

  /** q276 gate thresholds (shared with the oracle as literals). */
  private val CurationMinQuality = 0.7
  private val CurationMaxTws = 0.1

  val oracles: Map[String, String] = Map(

    // time_bucket, not epoch % 3600e6: % truncates toward zero for
    // negative epochs while Spark tumbling windows FLOOR-align —
    // time_bucket floors like Spark for pre-1970 timestamps too
    // (latent on this post-1970 fixture, but free to get right).
    "q257_streaming_tumbling_rollup" ->
      """SELECT event_type,
        |  epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, window_start_us""".stripMargin,

    "q258_streaming_dedup_gate" ->
      """WITH corpus AS (
        |  SELECT DISTINCT md5(text) AS text_md5
        |  FROM documents WHERE doc_id % 10 < 8),
        |arriving AS (
        |  SELECT doc_id, md5(text) AS text_md5 FROM documents
        |  WHERE doc_id % 10 >= 8)
        |SELECT a.doc_id, a.text_md5
        |FROM arriving a LEFT JOIN corpus c ON a.text_md5 = c.text_md5
        |WHERE c.text_md5 IS NULL
        |ORDER BY a.doc_id""".stripMargin,

    // q127's gap-and-islands SQL, keyed by user only — exact integer µs.
    "q265_streaming_session_rollup" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events),
        |flag AS (
        |  SELECT user_id, us,
        |    CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
        |              >= 1800000000 OR
        |         LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM flag)
        |SELECT user_id, MIN(us) AS session_start_us,
        |  MAX(us) + 1800000000 AS session_end_us,
        |  COUNT(*) AS n
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start_us""".stripMargin,

    // The batch equivalent of the watermarked stream-stream join: a
    // time-range interval join on exact integer-µs timestamps.
    "q271_streaming_click_attribution" ->
      """WITH c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, epoch_us(c.ts) AS click_us,
        |  epoch_us(p.ts) AS purchase_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY c.user_id, click_us, purchase_us""".stripMargin,

    // Mirrors anomalyGate's EXACT integer-moment sd (n·Σx² − (Σx)² and
    // n(n−1) as integers, cast once before the division — NOT q98's
    // float-chain form) and append mode's watermark cutoff: windows
    // with end ≤ max(ts) − 10 min are the emitted set.
    "q277_streaming_anomaly_gate" ->
      """WITH w AS (
        |  SELECT event_type,
        |    epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS ws, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sx2
        |  FROM w GROUP BY 1 HAVING COUNT(*) >= 2),
        |mx AS (SELECT epoch_us(MAX(ts)) AS mt FROM events),
        |z AS (
        |  SELECT w.event_type, w.ws, w.x,
        |    (CAST(w.x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) /
        |           CAST(n * (n - 1) AS DOUBLE)) AS zv
        |  FROM w JOIN st USING (event_type)
        |  WHERE n * sx2 - sx * sx > 0)
        |SELECT event_type, ws AS window_start_us,
        |  x AS n_events, ROUND(zv, 6) AS z
        |FROM z CROSS JOIN mx
        |WHERE abs(zv) > 2.0 AND ws + 3600000000 <= mt - 600000000
        |ORDER BY event_type, window_start_us""".stripMargin,

    // Per-hour top-3 by count, ties to the lexicographically first type
    // (GroupTopK's ordering), windows epoch-hour-aligned via time_bucket.
    "q278_streaming_trending_topk" ->
      """WITH w AS (
        |  SELECT event_type,
        |    epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS ws, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, ws, n,
        |    ROW_NUMBER() OVER (PARTITION BY ws
        |      ORDER BY n DESC, event_type) AS rk
        |  FROM w)
        |SELECT ws AS window_start_us, event_type, n
        |FROM r WHERE rk <= 3
        |ORDER BY window_start_us, event_type""".stripMargin,

    // quality rides the q38-proven CTE; top_word_share is q69's
    // MAX(count)/total ratio of exact integers — both raw emissions.
    "q276_streaming_curation_gate" ->
      s"""WITH ${graft.ops.TextQueries.qualityCteBody},
         |t AS (SELECT doc_id, regexp_split_to_array(lower(text), ' ') AS w
         |      FROM documents),
         |cnt AS (
         |  SELECT doc_id, word, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest(w) AS word FROM t) u
         |  GROUP BY doc_id, word),
         |tw AS (
         |  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
         |    AS top_word_share
         |  FROM cnt GROUP BY doc_id)
         |SELECT s.doc_id, s.quality, tw.top_word_share
         |FROM scored s JOIN tw USING (doc_id)
         |WHERE s.quality >= $CurationMinQuality
         |  AND tw.top_word_share <= $CurationMaxTws
         |ORDER BY s.doc_id""".stripMargin,

    // One-batch replay ⇒ TTL can't fire ⇒ per-key first-occurrence =
    // the batch GROUP BY (see the face's determinism note).
    "q279_streaming_ttl_dedup" ->
      """SELECT user_id, CAST(1 AS BIGINT) AS emitted,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS suppressed
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // The min-chain the in-order fold reduces to on one batch: stage 1
    // at the first view, each later stage at the first event of the
    // next type STRICTLY after the previous stage's timestamp.
    "q282_streaming_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
        |  WHERE user_id IS NOT NULL),
        |s1 AS (
        |  SELECT user_id, MIN(ms) AS m FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ms) AS m FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ms > s1.m GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ms) AS m FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ms > s2.m GROUP BY 1)
        |SELECT user_id, CAST(1 AS BIGINT) AS stage, m AS stage_ms FROM s1
        |UNION ALL
        |SELECT user_id, CAST(2 AS BIGINT), m FROM s2
        |UNION ALL
        |SELECT user_id, CAST(3 AS BIGINT), m FROM s3
        |ORDER BY user_id, stage""".stripMargin,

    // The late-drop predicate (staged batch-2 rows, all below the
    // batch-1 watermark) and append's emission cutoff (window end ≤
    // max(ts) − 2 h), stated verbatim — see the face's comment.
    "q280_streaming_late_data" ->
      """WITH mx AS (SELECT epoch_us(MAX(ts)) AS mt FROM events),
        |kept AS (
        |  SELECT e.event_type, e.ts FROM events e CROSS JOIN mx
        |  WHERE NOT (epoch_us(e.ts) % 5 = 0
        |             AND epoch_us(e.ts) <= mt - 10800000000)),
        |w AS (
        |  SELECT event_type,
        |    epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS ws, COUNT(*) AS n
        |  FROM kept GROUP BY 1, 2)
        |SELECT event_type, ws AS window_start_us, n
        |FROM w CROSS JOIN mx
        |WHERE ws + 3600000000 <= mt - 7200000000
        |ORDER BY event_type, window_start_us""".stripMargin,

    // The identical token-bucket fold as a RECURSIVE CTE: base case =
    // each key's first event (advanced=0 ⇒ refilled=cap ⇒ admit,
    // tokens=cap−1, exactly the gate's initial BucketState); step joins
    // rank k+1 and advances (tokens, last) with the same double ops in
    // the same order. Every numeric literal is e-notation — a plain
    // 2.0 is DECIMAL in DuckDB and would poison the double chain (the
    // q206 convention).
    "q284_streaming_rate_limit" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS rk
        |  FROM events WHERE user_id IS NOT NULL),
        |fold AS (
        |  SELECT user_id, event_id, ms, rk,
        |    TRUE AS admitted, CAST(1e0 AS DOUBLE) AS tokens, ms AS last
        |  FROM e WHERE rk = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.ms, e.rk,
        |    LEAST(2e0, f.tokens
        |      + GREATEST(0, e.ms - f.last) / 1e3 * (1e0 / 86400e0)) >= 1e0,
        |    CASE WHEN LEAST(2e0, f.tokens
        |        + GREATEST(0, e.ms - f.last) / 1e3 * (1e0 / 86400e0)) >= 1e0
        |      THEN LEAST(2e0, f.tokens
        |        + GREATEST(0, e.ms - f.last) / 1e3 * (1e0 / 86400e0)) - 1e0
        |      ELSE LEAST(2e0, f.tokens
        |        + GREATEST(0, e.ms - f.last) / 1e3 * (1e0 / 86400e0)) END,
        |    GREATEST(f.last, e.ms)
        |  FROM fold f JOIN e ON e.user_id = f.user_id AND e.rk = f.rk + 1)
        |SELECT user_id, event_id, ms,
        |  CAST(CASE WHEN admitted THEN 1 ELSE 0 END AS BIGINT) AS admitted
        |FROM fold ORDER BY user_id, ms, event_id""".stripMargin,

    // One session per key on a one-batch replay; closed iff the timer
    // at end + 30 min expired under the final watermark max(epoch_ms).
    // Boundary (≤): a tie needs end_ms + 1800000 == max ms exactly —
    // StreamingSpec's twin asserts the fixture is tie-free so either
    // convention yields identical rows.
    "q283_streaming_session_close" ->
      """WITH mx AS (SELECT MAX(epoch_ms(ts)) AS mt FROM events),
        |s AS (
        |  SELECT user_id, MIN(epoch_ms(ts)) AS start_ms,
        |    MAX(epoch_ms(ts)) AS end_ms, COUNT(*) AS n_events
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT user_id, start_ms, end_ms, n_events
        |FROM s CROSS JOIN mx
        |WHERE end_ms + 1800000 <= mt
        |ORDER BY user_id""".stripMargin,

    // Final counts are batch counts (monotone per-key totals,
    // latest-wins); the last-update batch id is pinned by the staged
    // split — 'error' rows all arrive in batch 1, everything else in
    // batch 0.
    "q281_streaming_update_counts" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT)
        |    AS last_update_batch
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}
