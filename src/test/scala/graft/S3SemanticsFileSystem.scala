package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, OutputStream}
import java.net.URI
import java.nio.file.{FileAlreadyExistsException, Files => JFiles, Path => JPath, Paths => JPaths, StandardOpenOption}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local-disk Hadoop FileSystem that exposes ONLY object-store semantics —
  * the S3/GCS contract the 100 TB deployment runs on:
  *
  *  - `create(path, overwrite = false)` buffers the whole object and
  *    publishes it atomically at `close()` iff the key is still absent
  *    (`If-None-Match: *`); the losing writer gets
  *    FileAlreadyExistsException at close, and a reader can never observe
  *    a partial object (it does not exist until the PUT completes).
  *  - `rename` THROWS — an object store has no rename, and any client
  *    code that calls one fails this suite immediately.
  *  - `append` throws; directories are implicit (`mkdirs` is a no-op).
  *
  * The conditional PUT's internal atomicity is emulated with a private
  * temp file + hard link — that is the STORE's server-side implementation
  * detail (S3 does the equivalent internally); the client-visible surface
  * has no rename or link, which is exactly what the commit protocol is
  * proven against. Objects land at their real local paths so Spark's own
  * `file://` reads of published parquet keep working side by side. */
class S3SemanticsFileSystem extends FileSystem {
  private var fsUri: URI = URI.create("s3mock:///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = name
  }

  override def getUri: URI = fsUri
  override def getScheme: String = "s3mock"

  /** This store's create(overwrite=false) IS an atomic-at-close
    * conditional PUT (see create below), so advertise it the way S3A
    * does — HadoopFileStore probes this capability before trusting the
    * commit CAS on a non-atomic-rename scheme. */
  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability match {
      case "fs.s3a.create.conditional" | "fs.capability.conditional.create" => true
      case other => super.hasPathCapability(path, other)
    }

  private def local(p: Path): JPath = JPaths.get(p.toUri.getPath)

  // ------------------------------------------------------------- reads
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val lp = local(f)
    if (!JFiles.isRegularFile(lp)) throw new FileNotFoundException(f.toString)
    new FSDataInputStream(new SeekableBytes(JFiles.readAllBytes(lp)))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val lp = local(f)
    if (!JFiles.exists(lp)) throw new FileNotFoundException(f.toString)
    val dir = JFiles.isDirectory(lp)
    new FileStatus(if (dir) 0 else JFiles.size(lp), dir, 1, 64L << 20,
      JFiles.getLastModifiedTime(lp).toMillis, f)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val lp = local(f)
    if (!JFiles.exists(lp)) throw new FileNotFoundException(f.toString)
    if (!JFiles.isDirectory(lp)) return Array(getFileStatus(f))
    val s = JFiles.list(lp)
    try {
      val it = s.iterator()
      val out = Array.newBuilder[FileStatus]
      while (it.hasNext) {
        val c = it.next()
        val name = c.getFileName.toString
        // in-flight conditional PUTs are the store's SERVER-side state: a
        // real object store never lists them, so neither does the mock —
        // and they vanish concurrently (losing writers clean up), so a
        // stat race on one is also invisible, not an error
        if (!name.endsWith(".put")) {
          try out += getFileStatus(new Path(f, name))
          catch { case _: FileNotFoundException => () }
        }
      }
      out.result()
    } finally s.close()
  }

  // ------------------------------------------------------------ writes
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val lp = local(f)
    if (!overwrite && JFiles.exists(lp))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    val buf = new ByteArrayOutputStream()
    val out: OutputStream = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        // the PUT: the object appears all-at-once, conditionally for
        // overwrite = false (If-None-Match enforced at completion time,
        // not at create time — the S3A conditional-create behavior)
        Option(lp.getParent).foreach(JFiles.createDirectories(_))
        if (overwrite) JFiles.write(lp, buf.toByteArray)
        else {
          val tmp = lp.resolveSibling(
            s".${lp.getFileName}-${java.util.UUID.randomUUID().toString.take(8)}.put")
          JFiles.write(tmp, buf.toByteArray, StandardOpenOption.CREATE_NEW)
          try JFiles.createLink(lp, tmp) // store-INTERNAL atomicity (server side)
          catch {
            case _: FileAlreadyExistsException =>
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
          } finally JFiles.deleteIfExists(tmp)
        }
      }
    }
    new FSDataOutputStream(out, null)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append")

  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(
      s"object stores do not rename ($src -> $dst) — the commit protocol must not need one")

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val lp = local(f)
    if (!JFiles.exists(lp)) false
    else if (JFiles.isDirectory(lp)) {
      if (!recursive) throw new java.io.IOException(s"directory not empty: $f")
      val it = JFiles.walk(lp).iterator()
      val all = Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq
      all.reverse.foreach(JFiles.deleteIfExists(_))
      true
    } else JFiles.deleteIfExists(lp)
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true // implicit dirs

  private var wd = new Path("/")
  override def setWorkingDirectory(d: Path): Unit = { wd = d }
  override def getWorkingDirectory: Path = wd
}

/** Byte-array input stream satisfying Hadoop's Seekable/PositionedReadable. */
private class SeekableBytes(bytes: Array[Byte]) extends ByteArrayInputStream(bytes)
    with Seekable with PositionedReadable {
  override def seek(p: Long): Unit = { pos = p.toInt }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= bytes.length) return -1
    val n = math.min(length, bytes.length - position.toInt)
    System.arraycopy(bytes, position.toInt, buffer, offset, n)
    n
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    if (read(position, buffer, offset, length) < length)
      throw new java.io.EOFException()
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
