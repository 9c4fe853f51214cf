package graft.fs

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** FORK-FREE local filesystem (guide §1.2 per-task work, measured r20):
  * without the native Hadoop library (absent in this image — the
  * NativeCodeLoader WARN on every startup), Hadoop's
  * `RawLocalFileSystem.setPermission` shells out to `/bin/chmod` via
  * `Shell.execCommand` — one process fork+exec per created file or
  * directory, unconditionally (RawLocalFileSystem.java:1179; the
  * group==other pure-Java fast path exists only in `FileUtil`, which
  * this code path never reaches). Every `create()` with a non-null
  * permission funnels through it (LocalFSFileOutputStream's ctor), so
  * EVERY local write pays it: streaming checkpoint logs (offsets/
  * commits/state, × partitions × batches × the .crc sidecars), RocksDB
  * snapshot uploads, parquet part files, commit markers. Measured on
  * this box: ~1–3 ms per fork plus fork-storm failure modes under
  * concurrency (task commits aborting on transient exec failures, seen
  * in the r20 probe logs).
  *
  * The override computes the SAME chmod through `java.nio.file.Files
  * .setPosixFilePermissions` — pure JVM, no fork, identical on-disk
  * result — and falls back to Hadoop's path for anything NIO cannot
  * express (sticky/setuid bits, non-POSIX stores). Registered for the
  * `file:` scheme via
  *
  *   spark.hadoop.fs.file.impl                = graft.fs.FastLocalFileSystem
  *   spark.hadoop.fs.AbstractFileSystem.file.impl = graft.fs.FastLocalFs
  *
  * (both seams: `FileSystem` for the data paths, `AbstractFileSystem`/
  * FileContext for Spark's streaming CheckpointFileManager), set as
  * system properties in scripts/run.sh and build.sbt so every surface —
  * bench, verify, tests, tools — runs the same engine. On real
  * HDFS/S3 deployments the `file:` scheme override is inert; behavior
  * (permissions included) is unchanged everywhere — only the syscall
  * path differs. Scale note: at 100 TB the same fork-per-file cost is
  * what this removes from any local-disk shuffle/checkpoint/scratch
  * tier on images without libhadoop.
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort
    if ((bits & ~0x1ff) != 0) {
      // sticky/setuid/setgid: not expressible via PosixFilePermissions —
      // keep Hadoop's exec path for exactness (never hit by Spark's
      // checkpoint/output writers, which use plain 0644/0755-class perms)
      super.setPermission(p, permission)
    } else {
      val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
      def add(mask: Int, perm: PosixFilePermission): Unit =
        if ((bits & mask) != 0) { set.add(perm); () }
      add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
      add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
      add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
      try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      catch {
        case _: UnsupportedOperationException | _: java.io.IOException =>
          super.setPermission(p, permission) // non-POSIX store / races: exact fallback
      }
      ()
    }
  }
}

/** `file:` scheme FileSystem: the stock LocalFileSystem (checksummed)
  * over the fork-free raw layer. */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

/** FileContext (AbstractFileSystem) twin of [[FastRawLocalFileSystem]] —
  * the seam Spark's streaming CheckpointFileManager writes through. */
class FastRawLocalFs(uri: java.net.URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new FastRawLocalFileSystem, conf, "file", false) {
  // match RawLocalFs exactly: local paths have no port and no name rules
  override def getUriDefaultPort: Int = -1
  override def isValidName(src: String): Boolean = true
}

/** `file:` scheme AbstractFileSystem: checksummed over the fork-free
  * raw layer — the stock LocalFs shape with our raw delegate. */
class FastLocalFs(uri: java.net.URI, conf: Configuration)
    extends ChecksumFs(new FastRawLocalFs(uri, conf))
