package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disk-backed, corpus-fingerprinted artifact store — the cross-JVM layer
  * under the in-memory artifact caches (TextQueries.cachedTextFrame,
  * VectorQueries.cachedIndexFrame/cachedIndexTable, the BPE merge table).
  *
  * The "build once per corpus snapshot" families (dedup pair graph +
  * component labels, corpus bigram LM, lexical index, NB-labeled corpus,
  * BPE merges, IVF centroids + inverted file, PQ codebook + code table,
  * SRP band tables) previously lived only in SparkContext-keyed TrieMaps
  * over localCheckpoint frames: a fresh JVM rebuilt everything. At 100 TB
  * these artifacts ARE persisted tables next to the corpus (the index's
  * data files, the dedup pipeline's staged pair graph); this store is
  * that layer — each artifact written once as parquet under a path keyed
  * by (family tag, schema version, corpus fingerprint), read by any later
  * session whose corpus fingerprint matches. Every build is deterministic
  * given the corpus (md5-seeded hashing throughout), so a store hit is
  * bit-equivalent to a rebuild — only the redundant compute is gone.
  *
  * Layout: `root/<tag>/fp=<md5(version:fingerprint)>/` containing the
  * parquet `data/` plus a `_MANIFEST` holding the full unhashed key (the
  * collision guard — a hash hit with a mismatched manifest is treated as
  * corrupt and replaced). Writers build into a sibling `.tmp-<uuid>` and
  * publish with an ATOMIC rename: a killed writer leaves only an ignored
  * tmp dir, never a half-published artifact.
  *
  * Concurrency: a `<entry>.lock` file (atomic create) elects ONE builder
  * per entry across sessions and JVMs; losers poll for the winner's
  * manifest and read it — N racing sessions build once, read N times. A
  * crashed builder's lock goes stale by mtime ([[LockStaleMs]]) and is
  * stolen; a waiter that outlives [[WaitBuildMs]] falls back to building
  * its own copy (first-writer-wins publish keeps that safe, just
  * redundant).
  *
  * Root resolution, in order: the `spark.graft.artifacts.path` session
  * conf, the `SPARK_GRAFT_ARTIFACTS` env var, then
  * `<java.io.tmpdir>/graft-artifacts`. Set the conf to `off` to disable
  * the disk layer entirely (the in-memory caches still apply). Bench
  * points it at a fresh temp dir per run so its `build` map always
  * prices COLD builds, comparably across rounds.
  */
object ArtifactStore {

  /** Manual escape hatch for semantic bumps that [[codeFingerprint]]
    * cannot see (a changed option DEFAULT read from outside the compiled
    * classes, a store-layout change). Since the code fingerprint below is
    * folded into every entry key automatically, builder EDITS no longer
    * need a bump — this stays for the rare out-of-band invalidation.
    */
  val SchemaVersion = 1

  /** Fingerprint of the engine code itself, folded into every entry key:
    * an entry built by one compile of the builders must never satisfy a
    * reader running a DIFFERENT compile. The persistent default root
    * (<tmpdir>/graft-artifacts) made the failure mode concrete before
    * this existed — edit a builder, forget the manual SchemaVersion bump,
    * and a warm machine serves the OLD builder's parquet to tests and
    * Verify: green runs that never executed the new code. Hashing the
    * compiled classes closes that by construction: unchanged code keeps
    * its warm entries (incremental compilation leaves untouched class
    * files byte-identical), any rebuild of the engine costs exactly one
    * cold re-derivation per corpus. Computed once per JVM from this
    * class's code-source location — the classes directory (every .class
    * under it, name + bytes, in sorted order) or the deployed jar's raw
    * bytes.
    */
  private[graft] lazy val codeFingerprint: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    try {
      val url = getClass.getProtectionDomain.getCodeSource.getLocation
      val p = Paths.get(url.toURI)
      if (Files.isDirectory(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.comparing[Path, String](_.toString))
          .forEach { f =>
            if (Files.isRegularFile(f) && f.toString.endsWith(".class")) {
              md.update(p.relativize(f).toString.getBytes("UTF-8"))
              md.update(Files.readAllBytes(f))
            }
          }
        finally walk.close()
      } else md.update(Files.readAllBytes(p))
      md.digest().map("%02x".format(_)).mkString
    } catch {
      // no code source (odd classloader): fall back to the manual version
      // alone rather than refuse to run — the store just loses the
      // automatic invalidation on such platforms
      case _: Exception => "unknown"
    }
  }

  private[graft] val LockStaleMs = 15 * 60 * 1000L
  private[graft] val WaitBuildMs = 20 * 60 * 1000L
  private val PollMs = 100L

  def rootOf(s: SparkSession): Option[Path] = {
    val conf = s.conf.getOption("spark.graft.artifacts.path")
      .orElse(sys.env.get("SPARK_GRAFT_ARTIFACTS"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-artifacts")
    if (conf.isEmpty || conf == "off") None else Some(Paths.get(conf))
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def versioned(fingerprint: String): String =
    s"v$SchemaVersion:c$codeFingerprint:$fingerprint"

  private def entryDir(root: Path, tag: String, fingerprint: String): Path =
    root.resolve(tag).resolve("fp=" + md5(versioned(fingerprint)))

  private def manifestOk(dir: Path, fingerprint: String): Boolean =
    try Files.exists(dir.resolve("_MANIFEST")) &&
      Files.readString(dir.resolve("_MANIFEST")) == versioned(fingerprint)
    catch { case _: java.io.IOException => false }

  /** The published artifact for (tag, fingerprint) as a parquet scan, if
    * the disk layer is on and the entry exists.
    */
  /** Mark an entry as used: gc ages by LAST USE (manifest mtime), not
    * build time — a hot entry of an unchanged corpus must survive any
    * maxAgeMs as long as sessions keep reading it.
    */
  private def touch(dir: Path): Unit =
    try Files.setLastModifiedTime(dir.resolve("_MANIFEST"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => () }

  /** Open the published parquet, self-healing a manifest-present but
    * unreadable entry (interrupted delete, concurrent gc, torn copy):
    * the entry is removed — manifest first, so it reads as a MISS — and
    * the caller falls back to its miss path instead of being wedged.
    */
  private def readData(s: SparkSession, dir: Path, tag: String)
      : Option[DataFrame] =
    try {
      val df = s.read.parquet(dir.resolve("data").toString)
      touch(dir)
      Some(df)
    } catch {
      case e: Exception =>
        System.err.println(
          s"[artifacts] unreadable entry for $tag (${e.getClass.getSimpleName}) — removing")
        deleteRecursively(dir)
        None
    }

  /** Liveness check for the in-memory caches above this store
    * (TextQueries.textFrames, VectorQueries.annFrames): true iff the
    * published entry still exists on disk under THIS session's store
    * root. Touches the manifest when it does — an L1 cache hit is a USE,
    * and [[gc]] ages by last use, so a frame a long-lived session keeps
    * reading must keep its backing entry alive. When the entry is gone
    * (gc'd, or the session's store root changed), the caller drops its
    * cached frame and re-reads through — instead of serving a parquet
    * scan whose files vanished (FileNotFoundException with no self-heal,
    * since nothing would ever re-check the L1 key). Disk layer off →
    * trivially true: the cached frame has no disk backing to lose.
    */
  private[graft] def stillLive(s: SparkSession, tag: String,
      fingerprint: String): Boolean = rootOf(s) match {
    case None => true
    case Some(root) =>
      val dir = entryDir(root, tag, fingerprint)
      val ok = manifestOk(dir, fingerprint)
      if (ok) touch(dir)
      ok
  }

  def readIfPresent(s: SparkSession, tag: String, fingerprint: String)
      : Option[DataFrame] = rootOf(s).flatMap { root =>
    val dir = entryDir(root, tag, fingerprint)
    if (manifestOk(dir, fingerprint)) {
      val out = readData(s, dir, tag)
      if (out.isDefined) System.err.println(s"[artifacts] disk hit: $tag")
      out
    } else None
  }

  /** Read the artifact from disk, or elect a builder, run `build`,
    * publish, and return a reader over the published copy. Falls back to
    * the raw build frame only when the disk layer is disabled. The
    * returned frame is otherwise always a plain parquet scan — column
    * pruning and predicate pushdown apply to artifact readers exactly as
    * to any staged table.
    */
  def readThrough(s: SparkSession, tag: String, fingerprint: String)
      (build: => DataFrame): DataFrame = rootOf(s) match {
    case None => build
    case Some(root) =>
      val dir = entryDir(root, tag, fingerprint)
      val deadline = System.currentTimeMillis() + WaitBuildMs
      var out: Option[DataFrame] = None
      var built = false
      while (out.isEmpty) {
        if (manifestOk(dir, fingerprint)) {
          out = readData(s, dir, tag) // None self-heals → loop rebuilds
          if (out.isDefined && !built)
            System.err.println(s"[artifacts] disk hit: $tag")
        } else if (acquireLock(lockOf(dir))) {
          try {
            if (!manifestOk(dir, fingerprint)) { // winner of a steal re-checks
              writeEntry(s, dir, fingerprint, build); built = true
            }
          } finally releaseLock(lockOf(dir))
        } else if (System.currentTimeMillis() > deadline) {
          // the elected builder is alive but slower than any sane build:
          // build our own copy (publish stays first-writer-wins safe)
          writeEntry(s, dir, fingerprint, build); built = true
        } else Thread.sleep(PollMs)
      }
      out.get
  }

  /** Publish-if-absent without reading back — the write-through hook for
    * trainers that must always retrain in-session (q74 BPE: its bench
    * cost is the training cost) but whose deterministic product should
    * still land on disk once for every other session. No-op when the
    * entry already exists (same corpus ⇒ bit-identical product) or the
    * disk layer is off.
    */
  def put(s: SparkSession, tag: String, fingerprint: String)
      (df: => DataFrame): Unit = rootOf(s).foreach { root =>
    val dir = entryDir(root, tag, fingerprint)
    if (!manifestOk(dir, fingerprint) && acquireLock(lockOf(dir)))
      try {
        if (!manifestOk(dir, fingerprint)) writeEntry(s, dir, fingerprint, df)
      } finally releaseLock(lockOf(dir))
  }

  private def writeEntry(s: SparkSession, dir: Path, fingerprint: String,
      build: => DataFrame): Unit = {
    val built = build
    val tmp = dir.getParent.resolve(
      ".tmp-" + java.util.UUID.randomUUID().toString)
    Files.createDirectories(tmp)
    built.write.mode("overwrite").parquet(tmp.resolve("data").toString)
    Files.writeString(tmp.resolve("_MANIFEST"), versioned(fingerprint))
    // the artifact now lives on disk: release the build frame's
    // checkpoint blocks (only THIS plan's — the cachedIndexTable
    // LogicalRDD-id derivation)
    built.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
    publish(tmp, dir, fingerprint)
  }

  private def lockOf(dir: Path): Path =
    dir.getParent.resolve(dir.getFileName.toString + ".lock")

  /** Atomic lock-file election; a lock whose mtime is older than
    * [[LockStaleMs]] belonged to a crashed builder and is stolen. The
    * steal is an ATOMIC RENAME-aside, not check-then-delete: with a plain
    * delete, two stealers could each delete-and-recreate (the second
    * deleting the first's FRESH lock), electing two builders. Exactly one
    * stealer's move succeeds; the losers re-contend on whatever lock the
    * winner creates. The aside name keeps the `.lock` suffix so a crashed
    * stealer's debris is swept by the same gc rule as any stale lock.
    */
  private def acquireLock(lock: Path): Boolean =
    try {
      Files.createDirectories(lock.getParent)
      Files.createFile(lock)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val stale =
          try System.currentTimeMillis() -
            Files.getLastModifiedTime(lock).toMillis > LockStaleMs
          catch { case _: java.io.IOException => false } // vanished: next poll wins
        if (stale) {
          val aside = lock.resolveSibling(lock.getFileName.toString +
            ".stale-" + java.util.UUID.randomUUID() + ".lock")
          try {
            Files.move(lock, aside, StandardCopyOption.ATOMIC_MOVE)
            Files.deleteIfExists(aside)
            acquireLock(lock)
          } catch { case _: java.io.IOException => false } // lost the steal race
        } else false
    }

  private def releaseLock(lock: Path): Unit =
    try Files.deleteIfExists(lock) catch { case _: java.io.IOException => () }

  /** Atomic first-writer-wins publish. A lost race (target appeared
    * between the build and the rename) discards this writer's copy; a
    * target with a MISMATCHED manifest (hash collision, or a corrupt
    * half-cleaned entry) is replaced rather than trusted.
    */
  private def publish(tmp: Path, dir: Path, fingerprint: String): Unit = {
    try {
      Files.createDirectories(dir.getParent)
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    } catch {
      // the exact exception for "target already exists" varies by
      // filesystem (FileAlreadyExists, DirectoryNotEmpty, or a generic
      // FileSystemException from the rename syscall) — any IO failure
      // here resolves the same way: trust a valid existing entry,
      // replace an invalid one
      case _: java.io.IOException =>
        if (manifestOk(dir, fingerprint)) deleteRecursively(tmp)
        else { // corrupt or colliding entry: replace it
          deleteRecursively(dir)
          try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
          catch { case _: Throwable => deleteRecursively(tmp) }
        }
    }
  }

  private[graft] def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    // the manifest dies FIRST: the reverse-lexicographic walk below would
    // otherwise remove data/ before _MANIFEST ('_' sorts before 'd'), and
    // an INTERRUPTED delete would leave a manifest-present, data-missing
    // entry that every later manifestOk check trusts (wedging the family
    // until it ages out). Manifest-first, an interruption leaves
    // manifest-less debris — a plain miss the next builder replaces.
    try Files.deleteIfExists(p.resolve("_MANIFEST"))
    catch { case _: java.io.IOException => () }
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }

  /** Driver-side store snapshot as a LocalRelation — backs the
    * `graft_artifacts_status(path)` SQL table function
    * (GraftExtensions): one row per artifact family with entry counts,
    * on-disk bytes, freshness, and any builder debris (tmp dirs from
    * crashed builds, lock files) — the ops view an operator checks
    * before trusting a store or scheduling a [[gc]]. Metadata only
    * (directory walk; no data files are read).
    */
  def statusRelation(rootPath: String)
      : org.apache.spark.sql.catalyst.plans.logical.LocalRelation = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val out = Seq(
      AttributeReference("family", StringType, nullable = false)(),
      AttributeReference("entries", IntegerType, nullable = false)(),
      AttributeReference("live_entries", IntegerType, nullable = false)(),
      AttributeReference("bytes", LongType, nullable = false)(),
      AttributeReference("newest_manifest_ms", LongType, nullable = false)(),
      AttributeReference("tmp_dirs", IntegerType, nullable = false)(),
      AttributeReference("locks", IntegerType, nullable = false)())
    val root = Paths.get(rootPath)
    val rows =
      if (!Files.exists(root)) Seq.empty[InternalRow]
      else {
        val fams = Files.list(root)
        try fams.toArray.toSeq.collect {
          case f: Path if Files.isDirectory(f) =>
            var (entries, live, tmps, locks) = (0, 0, 0, 0)
            var bytes = 0L
            var newest = 0L
            val children = Files.list(f)
            try children.forEach { e =>
              val name = e.getFileName.toString
              if (name.startsWith(".tmp-")) tmps += 1
              else if (name.endsWith(".lock")) locks += 1
              else if (name.startsWith("fp=")) {
                entries += 1
                val m = e.resolve("_MANIFEST")
                if (Files.exists(m)) {
                  live += 1
                  newest = math.max(newest,
                    try Files.getLastModifiedTime(m).toMillis
                    catch { case _: java.io.IOException => 0L })
                }
                // a concurrent gc/publish may delete the entry mid-walk;
                // a vanished subtree counts 0 bytes, it must not throw
                try {
                  val walk = Files.walk(e)
                  try walk.forEach(p =>
                    if (Files.isRegularFile(p))
                      bytes += (try Files.size(p)
                      catch { case _: java.io.IOException => 0L }))
                  finally walk.close()
                } catch { case _: java.io.IOException | _: java.io.UncheckedIOException => () }
              }
            } finally children.close()
            InternalRow(UTF8String.fromString(f.getFileName.toString),
              entries, live, bytes, newest, tmps, locks)
        } finally fams.close()
      }
    LocalRelation(out, rows, isStreaming = false)
  }

  /** Garbage-collect the store: entries whose manifest mtime — refreshed
    * on EVERY disk hit, so it means last USE, not build time — is older
    * than `maxAgeMs` (a rewritten corpus gets a new fingerprint, so its
    * predecessor's entries go cold and only age out here; a hot entry of
    * an unchanged corpus is touched by its readers — including on every
    * L1 cache hit via [[stillLive]] — and never ages), plus orphaned
    * `.tmp-*` build dirs and stale `.lock` files past the crash-steal
    * threshold. Safe against racing builders (a deleted entry is just a
    * miss — the next readThrough re-publishes) and against the in-memory
    * frame caches (they re-check [[stillLive]] on every hit and re-read
    * through on a vanished entry). NOT safe against a reader caught
    * mid-action: Spark re-opens parquet files per job, so a collected
    * entry can still fail one in-flight query of a live session — run gc
    * with a maxAgeMs comfortably above any query's lifetime, never 0, on
    * a shared store. Returns the deleted entry paths.
    */
  def gc(root: Path, maxAgeMs: Long): Seq[Path] = {
    if (!Files.exists(root)) return Seq.empty
    val now = System.currentTimeMillis()
    def mtime(p: Path): Long =
      try Files.getLastModifiedTime(p).toMillis
      catch { case _: java.io.IOException => 0L }
    val deleted = scala.collection.mutable.ArrayBuffer[Path]()
    val fams = Files.list(root)
    try fams.forEach { fam =>
      if (Files.isDirectory(fam)) {
        val entries = Files.list(fam)
        try entries.forEach { e =>
          val name = e.getFileName.toString
          val stale =
            if (name.startsWith(".tmp-")) now - mtime(e) > LockStaleMs
            else if (name.endsWith(".lock")) now - mtime(e) > LockStaleMs
            else if (name.startsWith("fp=")) {
              val m = e.resolve("_MANIFEST")
              !Files.exists(m) && now - mtime(e) > LockStaleMs ||
                Files.exists(m) && now - mtime(m) > maxAgeMs
            } else false
          if (stale) { deleted += e; deleteRecursively(e) }
        } finally entries.close()
      }
    } finally fams.close()
    deleted.toSeq
  }
}
