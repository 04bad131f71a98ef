package graft.transfer

import java.io.IOException
import java.net.{InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets.UTF_8

/** A PostgreSQL backend error surfaced to the caller — severity + message +
  * SQLSTATE, the fields a failed COPY needs for fault classification. */
final class PgWireException(val severity: String, val sqlState: String, message: String)
  extends IOException(s"$severity ($sqlState): $message")

/** Dependency-free COPY FROM STDIN over the PostgreSQL v3 wire protocol —
  * the execution path the reference drives through psycopg2's `copy_expert`
  * (`data_transfer.py:339-344`), implemented directly against the documented
  * frontend/backend protocol so `--format copy` works with ZERO jars beyond
  * Spark: no pgjdbc on the classpath, no reflective dispatch.
  *
  * The COPY-IN leg really is three frontend message types —
  *
  *   - `Q` Query: `COPY t (cols) FROM STDIN WITH CSV NULL '\N'`
  *   - `d` CopyData: raw CSV bytes, chunked
  *   - `c` CopyDone (or `f` CopyFail if the local reader throws mid-stream)
  *
  * — plus the startup handshake (StartupMessage, Authentication, ReadyForQuery)
  * and the `COPY <n>` CommandComplete that carries the database-acknowledged
  * row count [[CopySession.copyIn]] must return. Connects over TCP or, when
  * the host is an absolute path (libpq convention), a unix domain socket
  * (`<dir>/.s.PGSQL.<port>`, JDK 17 `StandardProtocolFamily.UNIX`).
  *
  * Auth: trust, cleartext password, and md5 are implemented; SCRAM-SHA-256
  * and the rest fail loudly with the mechanism code so a misconfigured
  * target is a clear error, not a hang. (Reference parity note: psycopg2
  * links libpq which negotiates SCRAM; a cluster that requires SCRAM should
  * use `--copy-transport jdbc` with pgjdbc on the classpath instead.)
  */
final class PgWireCopySessionFactory(
    host: String,
    port: Int,
    database: String,
    user: String,
    password: Option[String] = None)
  extends CopySessionFactory {

  def open(): CopySession = new PgWireSession(host, port, database, user, password)
}

object PgWireCopySessionFactory {

  /** Build a factory from a `jdbc:postgresql://` URL so `--format copy
    * --copy-transport wire` accepts the same target string as every other
    * jdbc sink. Recognized pieces: `host[:port]` (default 5432), `/database`
    * (default = user), and `user` / `password` / `socketDir` from either the
    * query string or `props` (props win, matching JDBC's Properties
    * precedence). A `socketDir` routes the connection over the unix socket
    * in that directory instead of TCP — the libpq `host=/path` convention,
    * which plain pgjdbc lacks. */
  def fromJdbcUrl(url: String, props: Map[String, String] = Map.empty): PgWireCopySessionFactory = {
    val prefix = "jdbc:postgresql://"
    require(url.startsWith(prefix), s"--copy-transport wire requires a jdbc:postgresql:// target, got $url")
    val rest = url.stripPrefix(prefix)
    val (hostPortDb, query) = rest.indexOf('?') match {
      case -1 => (rest, "")
      case i  => (rest.take(i), rest.drop(i + 1))
    }
    val qs: Map[String, String] = query.split('&').filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _           => None
      }
    }.toMap
    val params = qs ++ props // props override the query string
    val (hostPort, db) = hostPortDb.indexOf('/') match {
      case -1 => (hostPortDb, "")
      case i  => (hostPortDb.take(i), hostPortDb.drop(i + 1))
    }
    val (host, port) = hostPort.lastIndexOf(':') match {
      case -1 => (hostPort, 5432)
      case i  => (hostPort.take(i), hostPort.drop(i + 1).toInt)
    }
    val user = params.getOrElse("user",
      throw new IllegalArgumentException(s"no user in $url (add ?user=… or pass it via props)"))
    new PgWireCopySessionFactory(
      host = params.getOrElse("socketDir", if (host.isEmpty) "localhost" else host),
      port = port,
      database = if (db.isEmpty) user else db,
      user = user,
      password = params.get("password"))
  }
}

/** One v3-protocol connection. Blocking SocketChannel I/O; every backend
  * message is `type:int8  length:int32(includes itself)  payload`. */
private[transfer] final class PgWireSession(
    host: String, port: Int, database: String, user: String, password: Option[String])
  extends CopySession {

  private val ch: SocketChannel =
    if (host.startsWith("/")) { // unix socket dir, libpq naming: <dir>/.s.PGSQL.<port>
      val c = SocketChannel.open(StandardProtocolFamily.UNIX)
      c.connect(UnixDomainSocketAddress.of(s"$host/.s.PGSQL.$port"))
      c
    } else {
      val c = SocketChannel.open()
      c.socket().setTcpNoDelay(true)
      c.connect(new InetSocketAddress(host, port))
      c
    }

  // ---- low-level framing -------------------------------------------------

  private def writeFully(buf: ByteBuffer): Unit =
    while (buf.hasRemaining) ch.write(buf)

  private def readFully(n: Int): ByteBuffer = {
    val buf = ByteBuffer.allocate(n)
    while (buf.hasRemaining)
      if (ch.read(buf) < 0) throw new IOException("connection closed by server mid-message")
    buf.flip()
    buf
  }

  /** Read one backend message: (type byte, payload). */
  private def readMessage(): (Byte, ByteBuffer) = {
    val head = readFully(5)
    val tpe = head.get()
    val len = head.getInt() - 4 // length includes itself, excludes the type byte
    if (len < 0 || len > (1 << 30)) throw new IOException(s"implausible message length $len (type ${tpe.toChar})")
    (tpe, readFully(len))
  }

  private def cstring(buf: ByteBuffer): String = {
    val sb = new java.lang.StringBuilder
    var b = buf.get()
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while (b != 0) { bytes += b; b = buf.get() }
    sb.append(new String(bytes.toArray, UTF_8)).toString
  }

  private def parseError(payload: ByteBuffer): PgWireException = {
    var severity = "ERROR"; var state = "XX000"; var message = "unknown error"
    var code = payload.get()
    while (code != 0) {
      val value = cstring(payload)
      code match {
        case 'S' => severity = value
        case 'C' => state = value
        case 'M' => message = value
        case _   => () // detail/hint/position — not needed for classification
      }
      code = payload.get()
    }
    new PgWireException(severity, state, message)
  }

  /** Frontend message with a 1-byte type tag. */
  private def send(tpe: Char, payload: Array[Byte]): Unit = {
    val buf = ByteBuffer.allocate(5 + payload.length)
    buf.put(tpe.toByte).putInt(4 + payload.length).put(payload).flip()
    writeFully(buf)
  }

  // ---- startup handshake -------------------------------------------------

  locally {
    try startup()
    catch { case e: Throwable => try ch.close() catch { case _: Throwable => () }; throw e }
  }

  private def startup(): Unit = {
    val params = Seq("user" -> user, "database" -> database, "client_encoding" -> "UTF8")
    val body = params.flatMap { case (k, v) =>
      k.getBytes(UTF_8) ++ Array[Byte](0) ++ v.getBytes(UTF_8) ++ Array[Byte](0)
    }.toArray ++ Array[Byte](0)
    val buf = ByteBuffer.allocate(8 + body.length)
    buf.putInt(8 + body.length).putInt(196608).put(body).flip() // protocol 3.0
    writeFully(buf)
    var ready = false
    while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'R' => // Authentication*
          payload.getInt() match {
            case 0 => () // AuthenticationOk
            case 3 => // cleartext password
              val pw = password.getOrElse(throw new IOException(
                s"server requires a password for $user and none was provided"))
              send('p', pw.getBytes(UTF_8) ++ Array[Byte](0))
            case 5 => // md5: md5(md5(password + user) + salt), hex, "md5" prefix
              val pw = password.getOrElse(throw new IOException(
                s"server requires a password for $user and none was provided"))
              val salt = new Array[Byte](4); payload.get(salt)
              def md5hex(b: Array[Byte]): String =
                java.security.MessageDigest.getInstance("MD5").digest(b)
                  .map("%02x".format(_)).mkString
              val inner = md5hex(pw.getBytes(UTF_8) ++ user.getBytes(UTF_8))
              val outer = "md5" + md5hex(inner.getBytes(UTF_8) ++ salt)
              send('p', outer.getBytes(UTF_8) ++ Array[Byte](0))
            case mech => throw new IOException(
              s"unsupported authentication mechanism $mech (trust/cleartext/md5 are implemented; " +
                "for SCRAM use --copy-transport jdbc with pgjdbc on the classpath)")
          }
        case 'S' | 'K' | 'N' => () // ParameterStatus / BackendKeyData / Notice
        case 'Z'             => ready = true // ReadyForQuery
        case 'E'             => throw parseError(payload)
        case other => throw new IOException(s"unexpected message '${other.toChar}' during startup")
      }
    }
  }

  // ---- COPY FROM STDIN ---------------------------------------------------

  /** Drain backend messages until ReadyForQuery, remembering the first error
    * and the CommandComplete tag; used both on success and failure so the
    * connection always returns to a known state for the next chunk. */
  private def drainToReady(): (Option[PgWireException], Option[String]) = {
    var err: Option[PgWireException] = None
    var complete: Option[String] = None
    var ready = false
    while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'C' => complete = Some(cstring(payload)) // CommandComplete: "COPY <n>"
        case 'E' => if (err.isEmpty) err = Some(parseError(payload))
        case 'Z' => ready = true
        case _   => () // notices, parameter changes
      }
    }
    (err, complete)
  }

  def copyIn(sql: String, from: java.io.Reader): Long = {
    send('Q', sql.getBytes(UTF_8) ++ Array[Byte](0))
    // expect CopyInResponse ('G'); an error here (missing table, bad column
    // list) arrives as ErrorResponse followed by ReadyForQuery
    var inCopy = false
    while (!inCopy) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'G' => inCopy = true // CopyInResponse: format+column formats, irrelevant for CSV text
        case 'N' => ()
        case 'E' =>
          val e = parseError(payload)
          drainToReady()
          throw e
        case other => throw new IOException(s"expected CopyInResponse, got '${other.toChar}'")
      }
    }
    // stream the reader as CopyData chunks — bounded memory: one 64 KiB char
    // buffer, encoded per chunk (the reader yields complete CSV lines, but
    // COPY imposes no alignment so splitting anywhere is fine)
    val chars = new Array[Char](64 * 1024)
    try {
      var n = from.read(chars)
      while (n >= 0) {
        if (n > 0) send('d', new String(chars, 0, n).getBytes(UTF_8))
        n = from.read(chars)
      }
    } catch {
      case e: Throwable => // local failure: tell the server, restore protocol state
        // best-effort — if the connection itself died, the ORIGINAL cause
        // must surface, not the secondary send/drain failure
        try {
          send('f', ("graft reader failed: " + e.getMessage).getBytes(UTF_8) ++ Array[Byte](0))
          drainToReady()
        } catch { case _: Throwable => () }
        throw e
    }
    send('c', Array.emptyByteArray) // CopyDone
    drainToReady() match {
      case (Some(err), _) => throw err
      case (None, Some(tag)) if tag.startsWith("COPY ") => tag.stripPrefix("COPY ").trim.toLong
      case (None, tag) => throw new IOException(s"COPY finished without a COPY tag (got $tag)")
    }
  }

  def close(): Unit = {
    try send('X', Array.emptyByteArray) // Terminate
    catch { case _: Throwable => () }
    ch.close()
  }
}
