package graft.operators

/** Unified compaction-cadence policy for the standing-index families
  * (BM25 postings, IVF inverted lists, hash-band signature lists —
  * the positional GIF variant shares the hash-band layout and stats,
  * so it rides the same policy). The stats twins deliberately share one `rows`
  * definition (on-disk rows; servable = rows − tombstonedRows), so a
  * single policy can feed on all of them — this object is that policy
  * turned into code, replacing the SCALE.md cadence paragraph's
  * prose with something operators can schedule.
  *
  * The three compact-now signals, each traced to a real cost:
  *  - STRIPES: every append adds a file per touched bucket/list, and
  *    probe cost grows ~linearly in files-opened-per-list — compact
  *    when the worst list approaches the per-list read parallelism.
  *  - STALE rows (BM25 only): whole lists the df-gate excludes at
  *    probe time but whose bytes still ride every scan.
  *  - TOMBSTONED rows: deletions probes must anti-join away on every
  *    read until a compaction removes them materially (and the ids
  *    stay un-re-addable until then).
  *
  * Everything here is driver-side arithmetic over one stats call (one
  * fs walk + one artifact read — no corpus access), so a daily
  * health check over hundreds of standing indexes is trivially
  * schedulable. */
object IndexMaintenance {

  /** Thresholds; defaults are conservative starting points, not
    * magic — size `maxStripes` to the deployment's per-list read
    * parallelism. */
  final case class CompactPolicy(
      maxStripes: Long = 8,
      maxStaleFraction: Double = 0.2,
      maxTombstonedFraction: Double = 0.1)

  /** The family-neutral health view the policy consumes — built by
    * the `healthOf` adapters, one per stats twin. */
  final case class IndexHealth(family: String, dir: String, rows: Long,
      maxStripes: Long, staleRows: Long,
      tombstonedIds: Long, tombstonedRows: Long, bytes: Long)

  def healthOf(s: TextStats.Bm25IndexStats): IndexHealth =
    IndexHealth("bm25", s.postingsDir, s.rows, s.maxStripesPerBucket,
      s.staleRows, s.tombstonedIds, s.tombstonedRows, s.bytes)

  /** IVF has no stale-row class (no df-gate analogue): staleRows 0. */
  def healthOf(s: Similarity.IvfIndexStats): IndexHealth =
    IndexHealth("ivf", s.indexDir, s.rows, s.maxStripesPerList,
      0L, s.tombstonedIds, s.tombstonedRows, s.bytes)

  /** The hash-band index is not partition-pruned (a probe's read
    * re-collects the whole bands frame), so its stripe count is the
    * TOTAL file count — same probe-cost meaning, whole-index scope.
    * Writes and compactions BOUND that count (`outFiles`, default 4),
    * so the default stripe threshold is meaningful: a fresh or
    * freshly-compacted index sits under it, and the signal clears
    * after a compaction instead of re-firing forever. */
  def healthOf(s: Dedup.HashBandIndexStats): IndexHealth =
    IndexHealth("hashband", s.indexDir, s.rows, s.files,
      0L, s.tombstonedIds, s.tombstonedRows, s.bytes)

  final case class CompactAdvice(compact: Boolean, reasons: Seq[String])

  def shouldCompact(h: IndexHealth,
      p: CompactPolicy = CompactPolicy()): CompactAdvice = {
    require(p.maxStripes >= 1 && p.maxStaleFraction >= 0 &&
      p.maxTombstonedFraction >= 0, s"nonsensical policy $p")
    val reasons = Seq(
      (h.maxStripes > p.maxStripes) ->
        s"maxStripes ${h.maxStripes} > ${p.maxStripes} (probe opens that many files per list)",
      (h.rows > 0 && h.staleRows.toDouble / h.rows > p.maxStaleFraction) ->
        f"staleRows ${h.staleRows} = ${h.staleRows.toDouble / math.max(h.rows, 1)}%.2f of rows (df-gated bytes every probe still scans)",
      (h.rows > 0 && h.tombstonedRows.toDouble / h.rows > p.maxTombstonedFraction) ->
        f"tombstonedRows ${h.tombstonedRows} = ${h.tombstonedRows.toDouble / math.max(h.rows, 1)}%.2f of rows (anti-joined on every read; ids not re-addable)")
      .collect { case (true, r) => r }
    CompactAdvice(reasons.nonEmpty, reasons)
  }

  /** Evaluate AND log through the same `graft.metrics` logger the
    * GraftSession listener uses for observed metrics, so lifecycle
    * drift shows up in ordinary run logs on the same channel as
    * hot-key drops: WARN when the policy says compact (with the
    * reasons), INFO otherwise. Returns the advice so callers can act
    * on it in the same breath. */
  def logHealth(h: IndexHealth,
      p: CompactPolicy = CompactPolicy()): CompactAdvice = {
    val log = org.slf4j.LoggerFactory.getLogger("graft.metrics")
    val adv = shouldCompact(h, p)
    if (adv.compact)
      log.warn(s"graft_index_health family=${h.family} dir=${h.dir} " +
        s"COMPACT: ${adv.reasons.mkString("; ")} | $h")
    else
      log.info(s"graft_index_health family=${h.family} dir=${h.dir} healthy | $h")
    adv
  }

  /** One row of `healthSweep`'s report: what was found at the path,
    * what the policy said, or why the index could not be read. */
  final case class SweepRow(path: String, family: String,
      compact: Boolean, reasons: Seq[String], error: Option[String])

  /** Detect which standing-index family wrote a root, from the layout
    * alone: hash-band indexes are versioned from birth (`bands_vN`),
    * BM25 carries its `df`/`meta` table dirs, IVF carries `index_vN`
    * after a compaction or `cid=...` list partitions while flat. */
  private def detectFamily(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) return None
    val names = fs.listStatus(p).map(_.getPath.getName).toSet
    if (names.exists(_.startsWith("bands_v"))) Some("hashband")
    else if (names.contains("df") && names.contains("meta")) Some("bm25")
    else if (names.exists(_.startsWith("index_v")) ||
        names.exists(_.startsWith("cid="))) Some("ivf")
    else None
  }

  /** The daily-cron shape this object's scaladoc promises, as one
    * call: map a set of index roots (family auto-detected from the
    * on-disk layout) through stats → healthOf → logHealth and return
    * the advice as a small DataFrame — (path, family, compact,
    * reasons, error). Per-path failures become ERROR ROWS instead of
    * killing the sweep (the crash-after-pointer hash-band state, for
    * example, reports its named repair path here while the other
    * indexes still get their verdicts), and an unrecognized layout
    * reports `unknown` rather than guessing. Driver-side arithmetic
    * over one stats call per index; the corpora are never touched. */
  def healthSweep(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String],
      p: CompactPolicy = CompactPolicy()): org.apache.spark.sql.DataFrame = {
    val rows = paths.map { path =>
      // the WHOLE per-path body is guarded — detectFamily's listing
      // (ACL denial, unreachable filesystem) and even Path parsing
      // (malformed URI) fail per-path, or one bad root would kill
      // the report for every healthy index
      var fam = "unknown"
      try {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
        detectFamily(fs, path) match {
          case None =>
            SweepRow(path, fam, compact = false, Nil,
              Some("unrecognized layout — not a graft index root " +
                "(or the dir is missing)"))
          case Some(f) =>
            fam = f
            val h = fam match {
              case "hashband" => healthOf(Dedup.hashBandIndexStats(spark, path))
              case "bm25" => healthOf(TextStats.bm25IndexStats(spark, path))
              case _ => healthOf(Similarity.indexStats(spark, path))
            }
            val adv = logHealth(h, p)
            SweepRow(path, fam, adv.compact, adv.reasons, None)
        }
      } catch {
        case e: Exception =>
          org.slf4j.LoggerFactory.getLogger("graft.metrics")
            .warn(s"graft_index_health family=$fam dir=$path " +
              s"UNREADABLE: ${e.getMessage}")
          SweepRow(path, fam, compact = false, Nil,
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    }
    import spark.implicits._
    rows.toDF()
  }

  /** Family-dispatched compaction — the ACT half of the maintenance
    * story (`healthSweep` says WHICH roots to compact; this runs the
    * right compaction without the caller naming the family). Detects
    * the family from the on-disk layout like the sweep does, then
    * calls that family's own entry point — all of their guarantees
    * (versioned swap, snapshot-safe tombstone clear, lock refusal on
    * a racing compaction) apply unchanged, because this IS that call.
    * The positional (GIF) hash-band layout detects as `hashband` and
    * compacts through the shared entry point — the position column
    * rides the data rows. An unrecognized layout is refused loudly
    * (compacting a guess would be worse than a no-op). Returns the
    * detected family. */
  def compactNow(spark: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    detectFamily(fs, path) match {
      case Some("hashband") => Dedup.compactHashBandIndex(spark, path); "hashband"
      case Some("bm25") => TextStats.compactBm25Index(spark, path); "bm25"
      case Some("ivf") => Similarity.compactIndex(spark, path); "ivf"
      case other => throw new IllegalArgumentException(
        s"$path is not a recognizable graft index root " +
          s"(detected: ${other.getOrElse("unknown layout")}) — refusing " +
          "to compact a guess; pass a root written by writeBm25Index, " +
          "Similarity.writeIndex, writeHashBandIndex or " +
          "writeGifHashBandIndex")
    }
  }

  /** The WHOLE daily-cron body as one call: sweep the roots, compact
    * exactly the ones the policy flags, then re-sweep the compacted
    * roots so the returned report shows the POST-action state (the
    * `compacted` column records what acted). Per-path failures stay
    * error rows at both phases — a crashed compaction (its named
    * lock-recovery message lands in `error`) must not kill the pass
    * for the healthy indexes, which is the property that makes this
    * schedulable unattended. Compactions run sequentially on the
    * driver (each is one artifact-sized Spark job; the fleet case
    * wants them serialized against one cluster anyway). */
  def sweepAndCompact(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String],
      p: CompactPolicy = CompactPolicy()): org.apache.spark.sql.DataFrame = {
    val before = healthSweep(spark, paths, p).collect()
    // path -> (did a compaction run, action-phase error)
    val acted: Map[String, (Boolean, Option[String])] = before.map { r =>
      val path = r.getString(0)
      val flagged = r.getBoolean(2)
      if (!flagged) path -> ((false, Option.empty[String]))
      else {
        try { compactNow(spark, path); path -> ((true, Option.empty[String])) }
        catch { case e: Exception =>
          org.slf4j.LoggerFactory.getLogger("graft.metrics")
            .warn(s"graft_index_health dir=$path COMPACT FAILED: " +
              s"${e.getMessage}")
          path -> ((false, Some(Option(e.getMessage).getOrElse(
            e.getClass.getName))))
        }
      }
    }.toMap
    // re-sweep ONLY what acted: the untouched rows' verdicts are
    // already current, and a second stats pass over them is waste
    val actedPaths = acted.collect { case (p0, (true, _)) => p0 }.toSeq
    val after = healthSweep(spark, actedPaths, p).collect()
      .map(r => r.getString(0) -> r).toMap
    import spark.implicits._
    before.map { r =>
      val path = r.getString(0)
      val (didCompact, actErr) = acted(path)
      val cur = after.getOrElse(path, r)
      (path, cur.getString(1), cur.getBoolean(2),
        cur.getSeq[String](3), didCompact,
        actErr.orElse(Option(cur.getString(4))))
    }.toSeq
      .toDF("path", "family", "compact", "reasons", "compacted", "error")
  }
}
