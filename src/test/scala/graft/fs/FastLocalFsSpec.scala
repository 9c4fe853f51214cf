package graft.fs

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermissions

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** The fork-free local FS must be a drop-in for the stock one: same
  * classes resolve from the conf keys the harness sets, same on-disk
  * permissions land — only the syscall path (NIO chmod vs a forked
  * /bin/chmod) differs. */
class FastLocalFsSpec extends AnyFunSuite {

  private def conf(): Configuration = {
    val c = new Configuration()
    c.set("fs.file.impl", "graft.fs.FastLocalFileSystem")
    c.set("fs.AbstractFileSystem.file.impl", "graft.fs.FastLocalFs")
    // test-scoped instance, not the process-wide cached one
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  test("FileSystem seam resolves the fast class and writes normal files") {
    val dir = Files.createTempDirectory("fastfs")
    try {
      val p = new Path(dir.toString, "x")
      val fs = p.getFileSystem(conf())
      assert(fs.getClass.getName == "graft.fs.FastLocalFileSystem")
      val o = fs.create(p); o.write(42); o.close()
      assert(fs.exists(p) && fs.getFileStatus(p).getLen == 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("setPermission lands the exact bits without forking") {
    val dir = Files.createTempDirectory("fastfs")
    try {
      val p = new Path(dir.toString, "perm")
      val fs = p.getFileSystem(conf())
      fs.create(p).close()
      fs.setPermission(p, new FsPermission("754"))
      val got = PosixFilePermissions.toString(
        Files.getPosixFilePermissions(Paths.get(p.toUri.getPath)))
      assert(got == "rwxr-xr--", s"expected rwxr-xr--, got $got")
      // bits NIO cannot express (sticky) still work via the fallback path
      fs.setPermission(p, new FsPermission(java.lang.Short.parseShort("1644", 8)))
      val sticky = Files.getPosixFilePermissions(Paths.get(p.toUri.getPath))
      assert(PosixFilePermissions.toString(sticky).startsWith("rw-r--r--"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("FileContext seam (streaming checkpoint writer path) resolves and writes") {
    val dir = Files.createTempDirectory("fastfs")
    try {
      val fc = FileContext.getFileContext(new java.net.URI("file:///"), conf())
      val p = new Path(dir.toString, "ckpt-like")
      val o = fc.create(p, java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
      o.write(7); o.close()
      assert(fc.getFileStatus(p).getLen == 1)
      // the checksummed layout (.crc sidecar) must be preserved — the
      // wrapper is still ChecksumFs, only the raw layer changed
      assert(Files.exists(Paths.get(dir.toString, ".ckpt-like.crc")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
