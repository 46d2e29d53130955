package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.net.{HttpURLConnection, URL}

import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.SparkSession

/** Read-only `http(s)://` Hadoop FileSystem — the reference's ingest
  * TRANSPORT (`Sample.cs:143`: `_httpClient.GetStreamAsync(fileUri)`
  * streams each CSV over HTTP; `TaxiDataImporter.ps1:78-86` stages the
  * files behind HTTP endpoints), previously carried as an
  * environmental gap because the sandbox has no network. Closed here
  * WITHOUT network: the binding is a FileSystem the whole source layer
  * already speaks (S2-S4 take any Hadoop URI), spec-driven against a
  * loopback JDK HttpServer.
  *
  * Hadoop ships `org.apache.hadoop.fs.http.HttpFileSystem`, but it is
  * unusable under Spark (bytecode-verified): `getFileStatus` returns
  * length -1 (split planning needs real sizes), `listStatus` throws
  * (Spark's InMemoryFileIndex requires it even for a single file), and
  * `seek` throws unconditionally (LineRecordReader seeks to every
  * split start, including 0). This implementation fixes all three:
  *
  *  - `getFileStatus`: one HEAD request; Content-Length becomes the
  *    file length, so Spark plans real splits. A server that sends no
  *    length fails fast with a diagnosable error.
  *  - `listStatus(file)` = the file's own status (plain HTTP has no
  *    directory protocol — ENUMERATION stays the catalog's job,
  *    exactly as in the reference, whose lister asks the blob API for
  *    URIs and only FETCHES over HTTP; pass explicit URI lists, the
  *    `TaxiSpeed.*Listed` entry points).
  *  - `open`: a lazy, position-tracked stream. `seek` is satisfied by
  *    a `Range: bytes=pos-` GET when the server honors ranges (206) —
  *    genuine random access, so a large CSV SPLITS across tasks like
  *    any other text source, one connection per split — and falls
  *    back to read-and-discard skipping on naive 200-only servers
  *    (correct, one wasted prefix read per split; the spec drives
  *    both server behaviors).
  *
  * Scale posture: with ranges honored, an N-split file costs N
  * parallel range GETs — the same dataflow as a blob store; without
  * them, set `spark.sql.files.maxPartitionBytes` above the largest
  * file and each file is one streaming task, which IS the reference's
  * one-mapper-per-file shape. Write paths all throw (read-only by
  * contract).
  */
class HttpReadFileSystem extends FileSystem {

  private var fsUri: java.net.URI = _

  override def initialize(name: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = java.net.URI.create(
      s"${name.getScheme}://${name.getAuthority}")
  }

  override def getScheme: String = "http"
  override def getUri: java.net.URI = fsUri

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    new FSDataInputStream(
      new HttpSeekableInput(makeQualified(f).toUri.toURL))

  override def getFileStatus(f: Path): FileStatus = {
    val q = makeQualified(f)
    val conn = q.toUri.toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("HEAD")
      val code = conn.getResponseCode
      if (code == 404) throw new java.io.FileNotFoundException(q.toString)
      if (code >= 400) throw new IOException(s"$q: HTTP $code")
      val len = conn.getContentLengthLong
      if (len < 0) throw new IOException(
        s"$q: server sent no Content-Length — cannot plan splits " +
          "(serve with a length, or stage through a real filesystem)")
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, q)
    } finally conn.disconnect()
  }

  /** Plain HTTP has no listing protocol: a path "lists" as itself.
    * Globs therefore never expand — hand explicit URI lists to the
    * reader (the reference's lister/fetcher split). */
  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))

  private def readOnly =
    new IOException(s"$fsUri is a read-only filesystem")
  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    throw readOnly
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = throw readOnly
  override def rename(src: Path, dst: Path): Boolean = throw readOnly
  override def delete(f: Path, recursive: Boolean): Boolean =
    throw readOnly
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    throw readOnly
  override def setWorkingDirectory(dir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(fsUri)
}

/** The TLS twin (`fs.https.impl`). */
class HttpsReadFileSystem extends HttpReadFileSystem {
  override def getScheme: String = "https"
}

/** Seekable read: `seek` only records the target; the next read
  * reconnects if the stream isn't already there — via a Range GET
  * (one round-trip to any offset) or, when the server ignores ranges,
  * by skipping from byte 0. Sequential reads never reconnect. */
private class HttpSeekableInput(url: URL) extends FSInputStream {
  private var stream: InputStream = _
  private var pos = 0L   // position the caller wants
  private var at = -1L   // position the open stream serves next

  private def ensure(): InputStream = {
    if (stream == null || at != pos) {
      if (stream != null) { stream.close(); stream = null }
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      if (pos > 0) conn.setRequestProperty("Range", s"bytes=$pos-")
      val code = conn.getResponseCode
      if (code >= 400) throw new IOException(s"$url: HTTP $code")
      stream = conn.getInputStream
      if (pos > 0 && code != HttpURLConnection.HTTP_PARTIAL) {
        var toSkip = pos // 200 despite Range: discard the prefix
        while (toSkip > 0) {
          val skipped = stream.skip(toSkip)
          if (skipped > 0) toSkip -= skipped
          else if (stream.read() >= 0) toSkip -= 1
          else throw new EOFException(s"$url: seek past end to $pos")
        }
      }
      at = pos
    }
    stream
  }

  override def seek(newPos: Long): Unit = {
    if (newPos < 0) throw new EOFException(s"negative seek to $newPos")
    pos = newPos
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    val r = ensure().read()
    if (r >= 0) { pos += 1; at = pos }
    r
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val r = ensure().read(b, off, len)
    if (r > 0) { pos += r; at = pos }
    r
  }
  override def close(): Unit = {
    if (stream != null) { stream.close(); stream = null }
    super.close()
  }
}

/** Session wiring: point the `http`/`https` schemes at the read-only
  * filesystem so every existing source path (S2-S4, the `*Listed`
  * taxi entry points, `spark.read.*`) accepts http(s) URIs unchanged.
  */
object HttpIngest {
  def enable(spark: SparkSession): Unit = {
    val h = spark.sparkContext.hadoopConfiguration
    h.set("fs.http.impl", classOf[HttpReadFileSystem].getName)
    h.set("fs.https.impl", classOf[HttpsReadFileSystem].getName)
  }
}
