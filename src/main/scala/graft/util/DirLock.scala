package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory lock files over a (possibly remote) Hadoop filesystem —
  * the r7→r11 partition-rewrite lock protocol, extracted (r13) from
  * `Logs.withPartitionLock` so the persisted signature indexes
  * (`Dedup.minhashWriteIndex` / `hammingWriteIndex` /
  * `bloomWriteIndex`, `Similarity.cosineWriteIndex`) and their
  * compactor (`Dedup.compactIndex`) share one discipline with the
  * log-table partition rewrites instead of growing a second, subtly
  * different one. `Logs` delegates here; every protocol comment below
  * is carried from the in-situ version that survived the SnapshotsSpec
  * 4-breaker races.
  *
  * Semantics: one lock per `name` under `dir`. Stale locks (owner
  * died) break after [[StaleMs]] via a rename-to-tombstone CAS; of N
  * concurrent breakers at most one wins, and the winner re-claims
  * before dropping the tombstone so the lock path's absence window is
  * one create. Holders record a `kind`; waiters poll out holder kinds
  * in `waitFor` and fail fast (retryable `IOException`) on the rest.
  */
private[graft] object DirLock {

  /** A lock older than this is presumed orphaned (holder crashed
    * without the `finally` delete) and may be broken. Generous: the
    * longest legitimate hold is a partition rewrite or index compact
    * of one range, minutes not hours. */
  val StaleMs: Long = 60L * 60 * 1000

  /** Holder kind recorded in a lock payload; `"rewrite"` when the
    * field is absent (foreign or pre-r11 locks). */
  private def holderKind(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val m = """"kind"\s*:\s*"([a-z]+)"""".r.findFirstMatchIn(txt)
      Some(m.map(_.group(1)).getOrElse("rewrite"))
    } catch { case _: java.io.IOException => None } // vanished

  /** @param dir     lock directory (created if absent); must live
    *                OUTSIDE any directory the guarded operation
    *                renames or deletes
    * @param name    lock identity within `dir` (one lock per name)
    * @param kind    recorded in the lock payload (`"rewrite"` for
    *                swaps/compactions, `"append"` for staged appends)
    * @param waitFor holder kinds worth waiting out instead of failing
    *                fast: a REWRITER waits only for appenders (their
    *                holds are seconds; another rewriter on the same
    *                name keeps the loud fail-fast contract), an
    *                APPENDER waits for anyone (rewrites can take
    *                minutes, and the appender has nowhere better to
    *                be — its data isn't published until the rename)
    * @param waitMs  wait budget before the retryable conflict throws */
  def withLock[T](fs: FileSystem, dir: Path, name: String,
      kind: String = "rewrite",
      waitFor: Set[String] = Set("append"),
      waitMs: Long = 120000L)(body: => T): T = {
    fs.mkdirs(dir)
    val lock = new Path(dir, s"$name.lock")
    val nonce = java.util.UUID.randomUUID().toString
    def tryAcquire(): Boolean =
      try {
        val payload =
          s"""{"nonce":"$nonce","kind":"$kind","ts":${System.currentTimeMillis()}}"""
            .getBytes("UTF-8")
        if (fs.getScheme == "file") {
          // RawLocalFileSystem.create(overwrite = false) is an
          // exists-CHECK-then-open, NOT an atomic exclusive create:
          // every waiter whose check lands inside a lock-break's
          // rename->re-claim gap "succeeds" and they overwrite each
          // other (observed: THREE acquirers of one range under suite
          // load). POSIX O_EXCL via NIO is the real CAS on local
          // filesystems; HDFS keeps the Hadoop path below (its create
          // is atomic at the namenode).
          java.nio.file.Files.write(
            java.nio.file.Paths.get(lock.toUri.getPath), payload,
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } else {
          val out = fs.create(lock, false)
          out.write(payload)
          out.close()
          true
        }
      } catch { case _: java.io.IOException => false }
    // One full acquire attempt, including the stale-lock break
    // protocol. Returns whether the lock is now held by this nonce.
    def attemptOnce(): Boolean = {
      var acquired = tryAcquire()
      if (!acquired) {
        val stale =
          try System.currentTimeMillis() -
            fs.getFileStatus(lock).getModificationTime > StaleMs
          catch { case _: java.io.IOException => true } // vanished: owner released
        if (stale) {
          // Re-judge IMMEDIATELY before touching the lock: a breaker
          // that lost the break race reaches this point with the
          // winner's FRESH re-claimed lock at the path, and must back
          // off without touching it (the r7 hole: judging once, then
          // deleting whatever sits there — two rewriters proceed).
          val stillStale =
            try System.currentTimeMillis() -
              fs.getFileStatus(lock).getModificationTime > StaleMs
            catch { case _: java.io.IOException => false } // vanished: plain acquire below
          if (stillStale) {
            // Break by renaming to a breaker-unique tombstone: of N
            // concurrent breakers only one rename of this instance can
            // succeed, and rename preserves mtime — so the tombstone
            // re-check catches the residual full-owner-cycle-between-
            // re-judge-and-rename case and hands a fresh lock straight
            // back instead of claiming over it.
            val tomb = new Path(dir, s"$name.stale.$nonce")
            val renamed =
              try fs.rename(lock, tomb)
              catch { case _: java.io.IOException => false }
            if (renamed) {
              val brokeFresh =
                try System.currentTimeMillis() -
                  fs.getFileStatus(tomb).getModificationTime <= StaleMs
                catch { case _: java.io.IOException => false } // gone: treat as broken stale
              if (brokeFresh) {
                try fs.rename(tomb, lock) catch { case _: java.io.IOException => () }
              } else {
                // re-claim FIRST, then drop the tombstone: the lock
                // path's absence window is one create, not three ops
                acquired = tryAcquire()
                try fs.delete(tomb, false) catch { case _: java.io.IOException => () }
              }
            }
            // rename lost: another breaker holds the instance — fall
            // through unacquired to the retryable conflict
          }
          // stillStale = false (vanished or re-claimed fresh): NO
          // opportunistic acquire. A vanished lock here is ambiguous —
          // "owner released" and "a winning breaker is inside its
          // rename→re-claim gap" are indistinguishable, and acquiring
          // on the second reading puts TWO rewriters in one partition
          // (observed: concurrent compactors colliding in the same
          // FileOutputCommitter _temporary dir under suite load).
          // Waiters that lose any race get the retryable conflict;
          // retrying re-enters through the entry acquire, which is the
          // one legitimate taker of a released lock.
        }
      }
      acquired
    }
    var acquired = attemptOnce()
    // Kind-aware waiting (r11): a holder whose kind is in `waitFor`
    // is worth polling out rather than failing fast — this is what
    // lets staged appends and partition rewrites SERIALIZE instead of
    // corrupting each other's swap windows (the SnapshotsSpec race
    // class: an append renaming into a just-parked partition dir, or
    // a compactor parking a file an append published mid-rewrite).
    // A vanished lock retries immediately (owner released); a holder
    // kind outside `waitFor` keeps the loud fail-fast contract.
    val deadline = System.currentTimeMillis() + waitMs
    while (!acquired && System.currentTimeMillis() < deadline &&
        holderKind(fs, lock).forall(waitFor.contains)) {
      Thread.sleep(100L + scala.util.Random.nextInt(150))
      acquired = attemptOnce()
    }
    if (!acquired)
      throw new java.io.IOException(
        s"rewrite conflict: $name at $dir is locked by a concurrent " +
          s"rewrite (stale locks break after ${StaleMs / 1000}s)")
    try body
    finally {
      try {
        val in = fs.open(lock)
        val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        if (txt.contains(nonce)) fs.delete(lock, false)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Lock guarding a persisted signature index directory (minhash /
    * hamming / bloom / embedding-LSH): one lock per index, living in a
    * sibling `.graft_index_lock` dir of the index's PARENT — never
    * inside the index itself, which compaction renames away. Appends
    * take `kind = "append"` and wait for anyone; `Dedup.compactIndex`
    * takes `kind = "rewrite"` and waits only for appends (two
    * compactors on one index fail fast, loudly).
    *
    * Wait budgets (r14, advisor): an index APPEND holds the lock for
    * its whole Spark write job — signature compute + parquet write,
    * MINUTES on a large batch, not the seconds a staged log-partition
    * append holds `withLock`'s default for. A compactor that waited
    * only the default 120 s would spuriously throw the retryable
    * conflict against any real append, so the rewrite path gets a
    * 15-minute budget here (still bounded: the retryable-IOException
    * contract at the `compactIndex` call sites stands — callers retry
    * or skip the cycle, they don't hang a stream). Appenders waiting
    * out a compactor keep a matching budget for the same reason in
    * reverse. */
  def withIndexLock[T](fs: FileSystem, indexPath: String, kind: String)(body: => T): T = {
    val p = new Path(indexPath)
    val parent = Option(p.getParent).getOrElse(new Path("/"))
    val waitFor =
      if (kind == "append") Set("append", "rewrite") else Set("append")
    withLock(fs, new Path(parent, ".graft_index_lock"), p.getName,
      kind = kind, waitFor = waitFor, waitMs = 15L * 60 * 1000)(body)
  }
}
