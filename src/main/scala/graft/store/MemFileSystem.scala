package graft.store

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A heap-resident Hadoop [[FileSystem]] (`graftmem:` scheme) — the
  * store's in-memory blob backend, matching the reference's in-process
  * memory store (vecgo `blobstore/memory/memory.go`: a mutex-guarded
  * `map[string][]byte` behind the same BlobStore interface the S3 and
  * filesystem backends implement). Here the interface is Hadoop's, so
  * EVERYTHING above it — Spark parquet segments, parquet-mr tombstone
  * writes, manifest commits, CURRENT swaps, vacuum — runs unchanged
  * against byte arrays: a [[SnapshotStore]]/`GraftDB` opened on a
  * `graftmem:/...` root is a genuinely in-memory database, no disk IO
  * on any path.
  *
  * Semantics (the contract [[SnapshotStore]] relies on):
  *   - `create(overwrite = false)` commits via `putIfAbsent` at
  *     close — a true namespace CAS (stronger than S3A's client-side
  *     exists check), so the default rename-CAS commit guard AND the
  *     conditional-create guard are both sound here.
  *   - `rename` is atomic under the namespace lock (file or whole
  *     subtree), with HDFS's into-existing-directory semantics.
  *   - directories are explicit entries (empty dirs survive, as the
  *     FileOutputCommitter expects) plus implicit parents of files.
  *
  * Scope: one JVM, like the reference's memory store — state is a
  * process-wide static map shared by every instance Hadoop's FS cache
  * hands out. On a multi-executor cluster each executor would see its
  * own heap; use it for serving snapshots, tests, and scratch stores,
  * not as a shared cluster filesystem.
  */
class MemFileSystem extends FileSystem {
  import MemFileSystem._

  private var fsUri: URI = URI.create(s"$Scheme:///")
  private var workDir: Path = new Path(s"$Scheme:/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${name.getScheme}:///")
    setConf(conf)
  }

  override def getScheme: String = Scheme
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** Normalized map key: absolute path, no scheme, no trailing slash. */
  private def key(f: Path): String = {
    val p = f.toUri.getPath
    val abs = if (p.isEmpty) "/" else p
    if (abs.length > 1 && abs.endsWith("/")) abs.dropRight(1) else abs
  }

  private def qualified(k: String): Path =
    makeQualified(new Path(if (k.isEmpty) "/" else k))

  private def fileStatus(k: String, e: Entry): FileStatus =
    new FileStatus(e.bytes.length.toLong, false, 1, DefaultBlock, e.mtime,
      e.mtime, FsPermission.getFileDefault, "graft", "graft", qualified(k))

  private def dirStatus(k: String): FileStatus =
    new FileStatus(0L, true, 1, DefaultBlock, 0L, 0L,
      FsPermission.getDirDefault, "graft", "graft", qualified(k))

  /** True when k has any child entry (file or explicit dir). */
  private def hasChildren(k: String): Boolean = {
    val prefix = if (k == "/") "/" else k + "/"
    files.keySet.asScala.exists(_.startsWith(prefix)) ||
      dirs.asScala.exists(d => d != k && d.startsWith(prefix))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    val e = files.get(k)
    if (e != null) fileStatus(k, e)
    else if (k == "/" || dirs.contains(k) || hasChildren(k)) dirStatus(k)
    else throw new FileNotFoundException(s"graftmem: $k")
  }

  override def exists(f: Path): Boolean =
    try { getFileStatus(f); true }
    catch { case _: FileNotFoundException => false }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    val e = files.get(k)
    if (e != null) return Array(fileStatus(k, e))
    if (!(k == "/" || dirs.contains(k) || hasChildren(k)))
      throw new FileNotFoundException(s"graftmem: $k")
    val prefix = if (k == "/") "/" else k + "/"
    val out = collection.mutable.LinkedHashMap[String, FileStatus]()
    files.forEach { (fk, fe) =>
      if (fk.startsWith(prefix)) {
        val rest = fk.substring(prefix.length)
        val slash = rest.indexOf('/')
        if (slash < 0) out(fk) = fileStatus(fk, fe)
        else { val d = prefix + rest.substring(0, slash)
          if (!out.contains(d)) out(d) = dirStatus(d) }
      }
    }
    dirs.forEach { dk =>
      if (dk.startsWith(prefix)) {
        val rest = dk.substring(prefix.length)
        if (rest.nonEmpty) {
          val slash = rest.indexOf('/')
          val d = if (slash < 0) dk else prefix + rest.substring(0, slash)
          if (!out.contains(d)) out(d) = dirStatus(d)
        }
      }
    }
    out.values.toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    lock.synchronized {
      var k = key(f)
      if (files.containsKey(k))
        throw new FileAlreadyExistsException(s"graftmem: $k is a file")
      while (k != "/" && k.nonEmpty) {
        dirs.add(k)
        k = k.substring(0, math.max(k.lastIndexOf('/'), 0)) match {
          case "" => "/"; case s => s
        }
      }
      true
    }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val e = files.get(k)
    if (e == null) throw new FileNotFoundException(s"graftmem: $k")
    new FSDataInputStream(new MemInputStream(e.bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (dirs.contains(k) || hasChildren(k))
      throw new FileAlreadyExistsException(s"graftmem: $k is a directory")
    if (!overwrite && files.containsKey(k))
      throw new FileAlreadyExistsException(s"graftmem: $k exists")
    mkdirs(f.getParent, FsPermission.getDirDefault)
    val buf = new ByteArrayOutputStream(8192)
    val out = new java.io.OutputStream {
      private var closed = false
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        if (closed) return
        closed = true
        val e = Entry(buf.toByteArray, clock.incrementAndGet())
        if (overwrite) files.put(k, e)
        else if (files.putIfAbsent(k, e) != null)
          // the namespace CAS: losers surface the precondition failure
          // exactly where an S3 conditional PUT would — at close
          throw new FileAlreadyExistsException(s"graftmem: $k exists")
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new IOException("graftmem: append not supported")

  override def rename(src: Path, dst: Path): Boolean = lock.synchronized {
    val sk = key(src)
    var dk = key(dst)
    val srcFile = files.get(sk)
    val srcIsDir = srcFile == null && (dirs.contains(sk) || hasChildren(sk))
    if (srcFile == null && !srcIsDir) return false
    // HDFS semantics: renaming onto an existing directory moves INTO it
    if (files.get(dk) == null && (dirs.contains(dk) || hasChildren(dk)) &&
        dk != "/") {
      if (sk == dk) return true
      dk = dk + "/" + src.getName
    }
    if (sk == dk) return true
    if (files.containsKey(dk) || dirs.contains(dk) || hasChildren(dk))
      return false // dest exists (file, or dir after the into-move probe)
    mkdirs(new Path(dk).getParent, FsPermission.getDirDefault)
    if (srcFile != null) {
      files.put(dk, srcFile); files.remove(sk)
    } else {
      val prefix = sk + "/"
      files.keySet.asScala.filter(_.startsWith(prefix)).toVector.foreach {
        fk => files.put(dk + fk.substring(sk.length), files.remove(fk))
      }
      dirs.asScala.filter(d => d == sk || d.startsWith(prefix)).toVector
        .foreach { dd => dirs.remove(dd); dirs.add(dk + dd.substring(sk.length)) }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean =
    lock.synchronized {
      val k = key(f)
      if (files.remove(k) != null) return true
      val isDir = dirs.contains(k) || hasChildren(k)
      if (!isDir) return false
      if (!recursive && hasChildren(k))
        throw new IOException(s"graftmem: $k is non-empty, need recursive")
      val prefix = if (k == "/") "/" else k + "/"
      files.keySet.asScala.filter(_.startsWith(prefix)).toVector
        .foreach(files.remove)
      dirs.asScala.filter(d => d == k || d.startsWith(prefix)).toVector
        .foreach(dirs.remove)
      true
    }

  override def getDefaultBlockSize(f: Path): Long = DefaultBlock
}

object MemFileSystem {
  val Scheme = "graftmem"
  private val DefaultBlock = 128L * 1024 * 1024

  final case class Entry(bytes: Array[Byte], mtime: Long)

  /** The process-wide namespace (shared by all instances, like the
    * reference's single memory-store map).
    */
  private val files = new ConcurrentHashMap[String, Entry]()
  private val dirs = ConcurrentHashMap.newKeySet[String]()
  private val lock = new Object
  private val clock = new java.util.concurrent.atomic.AtomicLong()

  /** Total heap bytes held by file content (tests / sizing). */
  def usedBytes(): Long = {
    var n = 0L; files.forEach((_, e) => n += e.bytes.length); n
  }

  /** Drop an entire store root (tests / scratch reclamation). */
  def clear(): Unit = lock.synchronized { files.clear(); dirs.clear() }

  /** Register the scheme on a Hadoop conf (FileSystem API + FileContext,
    * so the rename-CAS commit guard's `FileContext.rename(Rename.NONE)`
    * resolves too).
    */
  def register(conf: Configuration): Unit = {
    conf.set(s"fs.$Scheme.impl", classOf[MemFileSystem].getName)
    conf.set(s"fs.AbstractFileSystem.$Scheme.impl",
      classOf[MemAbstractFs].getName)
  }
}

/** Seekable/positioned-read view over one immutable byte array. */
private class MemInputStream(bytes: Array[Byte]) extends FSInputStream {
  private var pos = 0

  override def seek(p: Long): Unit = {
    if (p < 0 || p > bytes.length)
      throw new java.io.EOFException(s"seek $p past end ${bytes.length}")
    pos = p.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int =
    if (pos >= bytes.length) -1
    else { val b = bytes(pos) & 0xff; pos += 1; b }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len, bytes.length - pos)
    System.arraycopy(bytes, pos, b, off, n)
    pos += n
    n
  }

  override def available(): Int = bytes.length - pos
}

/** FileContext binding for the graftmem scheme (reflectively constructed
  * by Hadoop; must expose exactly this (URI, Configuration) constructor).
  */
class MemAbstractFs(uri: URI, conf: Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new MemFileSystem(), conf, MemFileSystem.Scheme, false)
