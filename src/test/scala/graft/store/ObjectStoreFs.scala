package graft.store

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileAlreadyExistsException, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only Hadoop `FileSystem` with OBJECT-STORE semantics over a
  * local directory — the shim SnapshotObjectStoreSpec races the
  * snapshot commit protocol through, registered under the `objfs`
  * scheme (`fs.objfs.impl`). It models the two S3 behaviors the
  * protocol must survive, WITHOUT relying on any proprietary client:
  *
  *   - **rename is copy+delete, never atomic.** Like S3, there is no
  *     server-side move: [[rename]] streams every byte to the
  *     destination and then deletes the source, and it counts every
  *     rename whose target is a manifest version slot
  *     ([[ObjectStoreFs.slotRenames]]) so a spec can assert the commit
  *     path NEVER renames into a slot. A rename observed mid-flight
  *     shows a partially-copied tree — exactly the torn window a
  *     rename-commit would expose.
  *   - **conditional create is atomic AT CLOSE.** `create(path,
  *     overwrite = false)` buffers all bytes and publishes them in one
  *     step when the stream closes — failing with
  *     [[FileAlreadyExistsException]] if the key exists — modelling
  *     S3's `If-None-Match: *` conditional PUT (an object appears
  *     atomically and whole when the PUT completes, never truncated).
  *     The check-and-publish runs under one JVM-wide lock, standing in
  *     for the store's server-side atomicity.
  *
  * Everything else (list, open, mkdirs, delete) delegates to
  * RawLocalFileSystem — deliberately checksum-free, so no `.crc`
  * sidecar confuses byte-level assertions.
  */
class ObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {

  override def getScheme: String = "objfs"

  override def initialize(name: URI, conf: Configuration): Unit =
    super.initialize(name, conf)

  // A constant, never a field set in initialize(): RawLocalFileSystem's
  // CONSTRUCTOR already calls makeQualified → getUri, so a var would
  // still be null there.
  override def getUri: URI = ObjectStoreFs.SchemeUri

  /** RawLocalFileSystem's lazy permission loading does `new File(
    * path.toUri)` — which rejects any non-`file` scheme. Return plain
    * eagerly-filled FileStatus rows instead (an object store has no
    * POSIX permissions anyway).
    */
  private def plain(st: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getAccessTime, null, null, null, st.getPath)

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(plain)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    plain(super.getFileStatus(f))

  /** S3-style rename: recursive copy then delete-source. Returns false
    * (no exception) when the source is absent or the destination
    * exists — the Hadoop `FileSystem.rename` contract the commit
    * protocol and the parquet committer both expect.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    if (SnapshotStoreSpecSupport.isManifestSlot(dst))
      ObjectStoreFs.slotRenames.incrementAndGet()
    if (!exists(src) || exists(dst)) return false
    copyInto(src, dst)
    delete(src, true)
    true
  }

  private def copyInto(src: Path, dst: Path): Unit = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      listStatus(src).foreach(c =>
        copyInto(c.getPath, new Path(dst, c.getPath.getName)))
    } else {
      val in = open(src)
      val out = super.create(dst, true, 65536, 1.toShort,
        getDefaultBlockSize(dst), null)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      finally { in.close(); out.close() }
    }
  }

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditionalCreate(f)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else conditionalCreate(f)

  /** The conditional PUT: bytes buffer in memory; close() atomically
    * either publishes the whole object or throws
    * FileAlreadyExistsException — a reader can never observe the key
    * half-written, and two racing writers of the same key get exactly
    * one winner.
    */
  private def conditionalCreate(f: Path): FSDataOutputStream = {
    val target = pathToFile(f)
    val buf = new java.io.ByteArrayOutputStream()
    val publishing = new java.io.OutputStream {
      private var closed = false
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        if (closed) return
        closed = true
        ObjectStoreFs.putLock.synchronized {
          if (target.exists())
            throw new FileAlreadyExistsException(
              s"conditional PUT lost: $f already exists")
          target.getParentFile.mkdirs()
          val tmp = java.io.File.createTempFile(".objfs-put", ".tmp",
            target.getParentFile)
          java.nio.file.Files.write(tmp.toPath, buf.toByteArray)
          java.nio.file.Files.move(tmp.toPath, target.toPath)
        }
      }
    }
    new FSDataOutputStream(publishing, null)
  }
}

object ObjectStoreFs {
  private val SchemeUri = URI.create("objfs:///")

  /** Count of rename() calls whose DESTINATION was a manifest version
    * slot — the spec's "the commit path never renames into a slot"
    * probe.
    */
  val slotRenames = new java.util.concurrent.atomic.AtomicInteger(0)

  private[store] val putLock = new Object
}

/** Shared predicate so the shim and its spec agree on what counts as a
  * manifest slot.
  */
object SnapshotStoreSpecSupport {
  def isManifestSlot(p: Path): Boolean =
    p.toString.contains("/_snapshots/") && p.getName.startsWith("v") &&
      p.getName.endsWith(".json") && !p.toString.contains("/_staged/")
}
