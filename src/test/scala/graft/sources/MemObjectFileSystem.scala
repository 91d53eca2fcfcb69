package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

/** An in-memory OBJECT-STORE FileSystem (scheme `mem`) for CAS drills:
  * models S3 semantics, not POSIX —
  *  - objects become visible ALL-OR-NOTHING at stream close (a
  *    half-written object never exists);
  *  - `create(path, overwrite = false)` is a conditional put: the
  *    duplicate is rejected at create time when the object already
  *    exists, AND at close time when a racer committed in between
  *    (exactly S3 `If-None-Match: *`, which evaluates when the PUT
  *    completes) — the only atomic no-replace primitive the store has;
  *  - `rename` is copy+delete and silently REPLACES the destination
  *    (why a rename-based publish claim is wrong on object stores).
  * Registered per-conf via `fs.mem.impl`; all instances share one
  * object map so concurrent FileSystem handles race for real.
  */
class MemObjectFileSystem extends FileSystem {
  import MemObjectFileSystem.store

  private var uri: URI = URI.create("mem:///")

  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = Option(name.getAuthority) match {
      case Some(a) => URI.create(s"${name.getScheme}://$a")
      case None => URI.create(s"${name.getScheme}:///")
    }
  }

  override def getScheme: String = "mem"
  override def getUri: URI = uri

  private def key(p: Path): String = p.toUri.getPath

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = Option(store.get(key(p)))
      .getOrElse(throw new FileNotFoundException(key(p)))
    new FSDataInputStream(new MemObjectFileSystem.SeekableBytes(bytes))
  }

  override def create(
      p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    if (!overwrite && store.containsKey(k))
      throw new FileAlreadyExistsException(s"mem object exists: $k")
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(buf, null) {
      override def close(): Unit = {
        super.close()
        if (overwrite) { store.put(k, buf.toByteArray); () }
        else if (store.putIfAbsent(k, buf.toByteArray) != null)
          // the conditional commit lost: a racer completed first
          throw new FileAlreadyExistsException(
            s"mem conditional put lost the race: $k")
      }
    }
  }

  override def append(p: Path, bufferSize: Int, progress: Progressable):
      FSDataOutputStream =
    throw new IOException("mem object store does not append")

  /** Copy+delete that silently replaces — deliberately S3-shaped. */
  override def rename(src: Path, dst: Path): Boolean = {
    val bytes = Option(store.get(key(src))).getOrElse(return false)
    store.put(key(dst), bytes)
    store.remove(key(src))
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = key(p)
    val exact = store.remove(k) != null
    if (recursive) {
      val prefix = if (k.endsWith("/")) k else k + "/"
      val it = store.keySet().iterator()
      var any = exact
      while (it.hasNext) {
        if (it.next().startsWith(prefix)) { it.remove(); any = true }
      }
      any
    } else exact
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val k = key(p)
    val prefix = if (k.endsWith("/")) k else k + "/"
    import scala.jdk.CollectionConverters._
    store.keySet().asScala.toArray.collect {
      case obj if obj.startsWith(prefix) =>
        // one level down only (object listings are prefix-delimited)
        val rest = obj.stripPrefix(prefix)
        if (rest.contains("/"))
          dirStatus(new Path(s"mem://${prefix}${rest.takeWhile(_ != '/')}"))
        else fileStatus(obj)
    }.distinct
  }

  private def fileStatus(k: String): FileStatus =
    new FileStatus(store.get(k).length, false, 1, 1L << 20, 0L,
      new Path(s"mem://$k"))

  private def dirStatus(p: Path): FileStatus =
    new FileStatus(0L, true, 1, 1L << 20, 0L, p)

  override def getFileStatus(p: Path): FileStatus = {
    val k = key(p)
    if (store.containsKey(k)) fileStatus(k)
    else {
      val prefix = if (k.endsWith("/")) k else k + "/"
      import scala.jdk.CollectionConverters._
      if (store.keySet().asScala.exists(_.startsWith(prefix)))
        dirStatus(p)
      else throw new FileNotFoundException(k)
    }
  }

  override def setWorkingDirectory(d: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path("mem:///")
  override def mkdirs(p: Path, permission: FsPermission): Boolean = true
}

object MemObjectFileSystem {
  /** Shared across instances — concurrent handles race on one store. */
  private val store = new ConcurrentHashMap[String, Array[Byte]]()

  def clear(): Unit = store.clear()
  def contentOf(path: String): Option[String] =
    Option(store.get(path)).map(new String(_, java.nio.charset.StandardCharsets.UTF_8))

  private class SeekableBytes(bytes: Array[Byte])
      extends ByteArrayInputStream(bytes)
      with Seekable with PositionedReadable {
    override def seek(newPos: Long): Unit = {
      reset(); skip(newPos); ()
    }
    override def getPos: Long = (bytes.length - available()).toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException()
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
