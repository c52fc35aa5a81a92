package graft.relations

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardOpenOption}

/** Storage seam for the commit-log's metadata I/O (VERDICT r3 #3).
  *
  * The commit protocol is object-store-shaped by design (SCALE.md): the
  * only atomicity it needs is `createIfAbsent` — a conditional PUT. This
  * trait makes that claim a TYPE signature: there is no rename/move
  * operation at all, so the log physically cannot depend on one. The
  * local-fs impl maps `createIfAbsent` to write-temp + hard-link (atomic
  * and exclusive on POSIX); an S3/GCS impl would map it to
  * `If-None-Match: *`. Data (parquet) files are written by Spark through
  * its own Hadoop FileSystem and only their NAMES pass through here.
  */
trait FileStore {
  def read(path: String): String
  def exists(path: String): Boolean

  /** Atomically publish a fully-written file iff `path` does not exist.
    * Returns false when it already exists (a concurrent writer won).
    * Readers never observe partial content. */
  def createIfAbsent(path: String, content: String): Boolean

  /** Overwrite-allowed write for non-versioned sidecars (view defs,
    * checkpoint markers, docs). NOT used on the commit path. */
  def write(path: String, content: String): Unit

  /** Immediate child names of a directory; Nil if it does not exist. */
  def list(dir: String): Seq[String]

  def delete(path: String): Unit
}

/** java.nio implementation — the local[_] / POSIX backend. */
final class LocalFileStore extends FileStore {
  private def p(s: String): Path = Paths.get(s)

  def read(path: String): String = Files.readString(p(path))

  def exists(path: String): Boolean = Files.exists(p(path))

  def createIfAbsent(path: String, content: String): Boolean = {
    val target = p(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    // Fully write a hidden temp file, then hard-link it to the final name:
    // link(2) is atomic AND exclusive, so exactly one writer wins and a
    // concurrent reader can never observe a half-written file (a plain
    // CREATE_NEW write is not atomic with respect to its content).
    val tmp = target.resolveSibling(
      s".${target.getFileName}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, content.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    try { Files.createLink(target, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  def write(path: String, content: String): Unit = {
    Option(p(path).getParent).foreach(Files.createDirectories(_))
    Files.writeString(p(path), content)
  }

  def list(dir: String): Seq[String] = {
    val d = p(dir)
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try {
        val it = s.iterator()
        val out = Seq.newBuilder[String]
        while (it.hasNext) out += it.next().getFileName.toString
        out.result().sorted
      } finally s.close()
    }
  }

  def delete(path: String): Unit = Files.deleteIfExists(p(path))
}

/** In-memory fake: proves the commit protocol runs on the five primitives
  * alone (FakeStoreSpec drives the full CommitLog suite through it), and
  * doubles as the concurrency harness — `createIfAbsent` is a single CAS. */
final class InMemoryFileStore extends FileStore {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def read(path: String): String = {
    val v = m.get(path)
    if (v == null) throw new java.nio.file.NoSuchFileException(path)
    v
  }

  def exists(path: String): Boolean = m.containsKey(path)

  def createIfAbsent(path: String, content: String): Boolean =
    m.putIfAbsent(path, content) == null

  def write(path: String, content: String): Unit = m.put(path, content)

  def list(dir: String): Seq[String] = {
    val pre = dir.stripSuffix("/") + "/"
    import scala.jdk.CollectionConverters._
    m.keySet.asScala.iterator
      .filter(_.startsWith(pre))
      .map(_.stripPrefix(pre))
      .filterNot(_.contains("/"))
      .toSeq.sorted
  }

  def delete(path: String): Unit = m.remove(path)
}
