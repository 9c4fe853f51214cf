package graft.tools

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A Hadoop FileSystem that models OBJECT-STORE semantics on local disk —
  * the sandbox's stand-in for S3, faithful in exactly the three ways the
  * transcode commit protocol cares about (the r18 verdict's #1 ask):
  *
  *   1. **PUT visibility**: an object does not exist until its write
  *      completes. `create` buffers into a hidden `.inflight-*` sibling
  *      and materializes the object atomically at `close()` (a local
  *      rename — the model of S3's atomic single-object PUT). A writer
  *      that dies mid-stream leaves only an invisible temp, never a
  *      partial object — the behavior `object_store::BufWriter` gives the
  *      reference (osm-pbf-parquet/src/sink.rs:119-132).
  *   2. **No atomic rename**: `rename` is what S3A actually does — a
  *      per-object COPY followed by a delete. Mid-rename states are
  *      observable, and the injection knobs can kill the copy loop
  *      between files ([[HostileObjectStoreFs.failAfterFileCopies]]) or
  *      mid-file ([[HostileObjectStoreFs.tornCopyBytes]]), leaving
  *      exactly the partial-destination wreckage a driver crash during an
  *      S3A "rename" leaves. Every rename is counted, so a protocol that
  *      CLAIMS to be rename-free is held to zero.
  *   3. **Laggy listing**: with [[HostileObjectStoreFs.listingLagMs]] set,
  *      `listStatus` hides objects younger than the lag — the
  *      eventual-consistency model of older object stores. A commit
  *      protocol that decides what to publish by LISTING breaks here; the
  *      pointer commit (manifest-driven) must not.
  *
  * Knobs are process-global (Hadoop caches FileSystem instances per
  * scheme); [[HostileObjectStoreFs.reset()]] restores neutral behavior.
  * Used by ObjectStoreCommitSpec and the ObjectStoreProof tool.
  */
class HostileObjectStoreFs extends RawLocalFileSystem {
  import HostileObjectStoreFs._

  override def getUri: java.net.URI = java.net.URI.create("grafts3:///")
  override def getScheme: String = "grafts3"

  // every create funnels through here (all public create() overloads of
  // RawLocalFileSystem delegate to this protected seam)
  override def createOutputStreamWithMode(f: Path, append: Boolean,
      permission: FsPermission): java.io.OutputStream = {
    if (append) return super.createOutputStreamWithMode(f, append, permission)
    val tmp = new Path(f.getParent,
      s".inflight-${java.util.UUID.randomUUID().toString.take(8)}-${f.getName}")
    val inner = super.createOutputStreamWithMode(tmp, false, permission)
    new java.io.OutputStream {
      // idempotent close: Hadoop cleanup paths (try-with-resources plus
      // IOUtils sweeps) double-close routinely; a second close must be a
      // no-op, NOT re-run the materialization (which would delete the
      // already-PUT object and throw — the opposite of S3 semantics)
      private var closed = false
      override def write(b: Int): Unit = inner.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        inner.write(b, off, len)
      override def flush(): Unit = inner.flush()
      override def close(): Unit = {
        if (closed) return
        closed = true
        inner.close()
        // one-shot injected PUT death: the object never materializes
        // (the hidden temp is all that remains — invisible to listings
        // and to parquet discovery), exactly a mid-PUT crash on S3
        if (f.getName == "_CURRENT" && failPointerPutOnce.getAndSet(false))
          throw new java.io.IOException(
            s"injected: PUT of $f died before the object materialized")
        val src = pathToFile(tmp); val dst = pathToFile(f)
        if (!src.renameTo(dst)) {
          dst.delete()
          if (!src.renameTo(dst))
            throw new java.io.IOException(s"PUT materialization failed: $tmp -> $f")
        }
      }
    }
  }

  // S3A-faithful rename: copy every object, then delete the source. No
  // atomicity anywhere; the knobs inject a crash mid-loop or mid-file.
  override def rename(src: Path, dst: Path): Boolean = {
    renameCalls.incrementAndGet()
    val s = pathToFile(src)
    if (!s.exists()) return false
    val d = pathToFile(dst)
    if (d.exists() && d.isFile) return false
    copyTree(s, if (d.isDirectory) new java.io.File(d, s.getName) else d)
    deleteTree(s)
    true
  }

  private def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      if (!dst.isDirectory && !dst.mkdirs())
        throw new java.io.IOException(s"mkdir failed: $dst")
      // sorted: deterministic copy order, so failAfterFileCopies injects
      // a REPRODUCIBLE partial state
      src.listFiles().sortBy(_.getName).foreach(c => copyTree(c, new java.io.File(dst, c.getName)))
    } else {
      val n = copiedFiles.incrementAndGet()
      val cap = failAfterFileCopies
      if (cap >= 0 && n > cap) {
        if (tornCopyBytes) {
          // the dying copy wrote HALF the object before the crash — on a
          // real store a torn server-side copy can't happen per object
          // (copy is atomic per object), but a non-object-store NFS/HDFS
          // proxying layer can tear; modeled for completeness
          val bytes = java.nio.file.Files.readAllBytes(src.toPath)
          java.nio.file.Files.write(dst.toPath,
            java.util.Arrays.copyOf(bytes, bytes.length / 2))
        }
        throw new java.io.IOException(
          s"injected: rename copy loop died after $cap objects (while copying $src)")
      }
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteTree)
    if (!f.delete()) throw new java.io.IOException(s"delete failed: $f")
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val all = super.listStatus(f)
    val lag = listingLagMs
    // lag is a LIST phenomenon: enumerating a prefix can miss young
    // objects, but a point lookup (HEAD/GET — here, listStatus of an
    // exact file path) always sees a PUT object. S3 has been
    // read-after-write consistent for point reads far longer than for
    // listings; hiding point lookups would over-model the hazard.
    if (lag <= 0 || getFileStatus(f).isFile) all
    else {
      val cutoff = System.currentTimeMillis() - lag
      all.filter(st => st.isDirectory || st.getModificationTime <= cutoff)
    }
  }
}

object HostileObjectStoreFs {
  /** Total `rename` invocations — the zero a rename-free protocol is
    * held to. */
  val renameCalls = new java.util.concurrent.atomic.AtomicLong(0)
  /** Objects copied by rename loops so far (the failure knob's clock). */
  val copiedFiles = new java.util.concurrent.atomic.AtomicLong(0)
  /** >= 0: the rename copy loop throws after this many objects. */
  @volatile var failAfterFileCopies: Long = -1L
  /** The injected rename death also leaves a half-copied object. */
  @volatile var tornCopyBytes: Boolean = false
  /** One-shot: the next `_CURRENT` PUT dies before materializing. */
  val failPointerPutOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** > 0: listStatus hides objects younger than this many millis. */
  @volatile var listingLagMs: Long = 0L

  def reset(): Unit = {
    renameCalls.set(0); copiedFiles.set(0)
    failAfterFileCopies = -1L; tornCopyBytes = false
    failPointerPutOnce.set(false); listingLagMs = 0L
  }
}
