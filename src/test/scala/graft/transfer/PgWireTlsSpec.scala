package graft.transfer

import java.io.{ByteArrayOutputStream, FileInputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket}

import scala.sys.process._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scripted TLS PostgreSQL backend: a plain TCP ServerSocket playing one
  * per-connection script per accepted connection, so multi-connection
  * ladders (prefer's plaintext retry after a broken handshake, allow's TLS
  * upgrade after a plaintext rejection) are asserted without a real
  * server. Scripts:
  *
  *   - `tls`          — expect SSLRequest, answer 'S', TLS-wrap (keytool
  *                      PKCS12 identity), serve trust-auth v3 COPY
  *   - `nossl`        — answer 'N' to a preamble if one arrives (or accept
  *                      a bare StartupMessage), serve plaintext
  *   - `break`        — answer 'S' then CLOSE mid-handshake
  *   - `hangup`       — CLOSE right after SSLRequest, no answer (the
  *                      client's preamble read sees EOF, a plain
  *                      IOException — the round-11-advice fallback shape)
  *   - `reject-plain` — read the plaintext StartupMessage, reply a 28000
  *                      ErrorResponse (an hostssl-only pg_hba), close
  */
final class TlsFakeBackend(ksPath: Option[String], scripts: Seq[String] = Seq("tls")) {
  private val server =
    new ServerSocket(0, 4, InetAddress.getByName("localhost"))
  def port: Int = server.getLocalPort

  @volatile var sawSslRequest = false
  @volatile var servedOverTls = false
  @volatile var rejectedPlain = false
  @volatile var sawMechanism = ""
  @volatile var sawGs2 = ""
  @volatile var scramVerified = false
  @volatile var copyBytes: Array[Byte] = Array.emptyByteArray
  @volatile var startupParams: Map[String, String] = Map.empty

  private def sslWrap(plain: Socket): Socket = {
    val ks = KeyStore.getInstance("PKCS12")
    val fis = new FileInputStream(ksPath.get)
    try ks.load(fis, "changeit".toCharArray) finally fis.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val ssl = ctx.getSocketFactory
      .createSocket(plain, null, plain.getPort, true).asInstanceOf[SSLSocket]
    ssl.setUseClientMode(false)
    ssl
  }

  val thread = new Thread(() => {
    scripts.foreach { script =>
      try {
        val plain = server.accept()
        try handle(script, plain)
        finally { try plain.close() catch { case _: Throwable => () } }
      } catch { case _: java.io.IOException => () } // client hung up / handshake aborted
    }
  })
  thread.setDaemon(true)
  thread.start()

  private def errorResponse(state: String, m: String): Array[Byte] =
    Array('S'.toByte) ++ "FATAL".getBytes(UTF_8) ++ Array[Byte](0) ++
      Array('C'.toByte) ++ state.getBytes(UTF_8) ++ Array[Byte](0) ++
      Array('M'.toByte) ++ m.getBytes(UTF_8) ++ Array[Byte](0) ++ Array[Byte](0)

  private def handle(script: String, plain: Socket): Unit = {
    val in0 = plain.getInputStream
    val head = in0.readNBytes(8)
    if (head.length < 8) return
    val hb = ByteBuffer.wrap(head)
    val len = hb.getInt(); val code = hb.getInt()
    val isPreamble = len == 8 && code == 80877103
    if (isPreamble) sawSslRequest = true
    script match {
      case "tls" =>
        assert(isPreamble, s"expected SSLRequest, got len=$len code=$code")
        plain.getOutputStream.write('S'); plain.getOutputStream.flush()
        val ssl = sslWrap(plain)
        servedOverTls = true
        serve(ssl.getInputStream, ssl.getOutputStream, preread = None)
      case "break" =>
        assert(isPreamble, s"expected SSLRequest, got len=$len code=$code")
        plain.getOutputStream.write('S'); plain.getOutputStream.flush()
        plain.close() // mid-handshake hangup
      case "hangup" =>
        assert(isPreamble, s"expected SSLRequest, got len=$len code=$code")
        plain.close() // no answer at all: the client's preamble read sees EOF
      case "nossl" =>
        if (isPreamble) {
          plain.getOutputStream.write('N'); plain.getOutputStream.flush()
          serve(in0, plain.getOutputStream, preread = None)
        } else serve(in0, plain.getOutputStream, preread = Some((len, code)))
      case "mute" => // accept, then never answer: the client's read must
        Thread.sleep(20000) // be bounded by socketTimeout, not hang forever
      case "reject-plain" =>
        val (slen, proto) =
          if (isPreamble) { // shouldn't happen for allow, but answer 'N' and read on
            plain.getOutputStream.write('N'); plain.getOutputStream.flush()
            val h2 = ByteBuffer.wrap(in0.readNBytes(8)); (h2.getInt(), h2.getInt())
          } else (len, code)
        assert(proto == 196608, s"bad protocol $proto")
        in0.readNBytes(slen - 8) // drain startup body
        rejectedPlain = true
        val payload = errorResponse("28000",
          "no pg_hba.conf entry for host, SSL off")
        val buf = ByteBuffer.allocate(5 + payload.length)
        buf.put('E'.toByte).putInt(4 + payload.length).put(payload)
        plain.getOutputStream.write(buf.array()); plain.getOutputStream.flush()

      // full SCRAM over TLS: "scram-plus" advertises the -PLUS mechanism
      // and VERIFIES the channel-binding c= attribute against its own
      // certificate; "scram-noplus" advertises plain SCRAM only, so a
      // CB-capable client over TLS must send the 'y' gs2 flag
      case "scram-plus" | "scram-noplus" =>
        assert(isPreamble, s"expected SSLRequest, got len=$len code=$code")
        plain.getOutputStream.write('S'); plain.getOutputStream.flush()
        val ssl = sslWrap(plain)
        servedOverTls = true
        val in = ssl.getInputStream
        val out = ssl.getOutputStream
        val h2 = ByteBuffer.wrap(in.readNBytes(8))
        val sl = h2.getInt(); assert(h2.getInt() == 196608)
        in.readNBytes(sl - 8) // drain startup params
        val mechNames =
          if (script == "scram-plus") Seq("SCRAM-SHA-256-PLUS", "SCRAM-SHA-256")
          else Seq("SCRAM-SHA-256")
        val mechBytes =
          mechNames.flatMap(m => m.getBytes(UTF_8).toSeq :+ 0.toByte).toArray :+ 0.toByte
        msg(out, 'R', ByteBuffer.allocate(4).putInt(10).array() ++ mechBytes)
        val (t1, p1) = readMsg(in); assert(t1 == 'p')
        val mech = {
          val bs = scala.collection.mutable.ArrayBuffer.empty[Byte]
          var b = p1.get(); while (b != 0) { bs += b; b = p1.get() }
          new String(bs.toArray, UTF_8)
        }
        sawMechanism = mech
        val il = p1.getInt(); val ib = new Array[Byte](il); p1.get(ib)
        val clientFirst = new String(ib, UTF_8)
        val bareAt = clientFirst.indexOf("n=,r=")
        assert(bareAt > 0, s"no bare part in $clientFirst")
        sawGs2 = clientFirst.take(bareAt)
        val bare = clientFirst.drop(bareAt)
        val cnonce = Scram.parseAttrs(bare)('r')
        val snonce = cnonce + "srvTLS+nonce"
        val salt = "tls-salt-bytes!!".getBytes(UTF_8)
        val b64 = java.util.Base64.getEncoder
        val serverFirst = s"r=$snonce,s=${b64.encodeToString(salt)},i=4096"
        msg(out, 'R', ByteBuffer.allocate(4).putInt(11).array() ++
          serverFirst.getBytes(UTF_8))
        val (t2, p2) = readMsg(in); assert(t2 == 'p')
        val fb = new Array[Byte](p2.remaining()); p2.get(fb)
        val clientFinal = new String(fb, UTF_8)
        val fattrs = Scram.parseAttrs(clientFinal)
        // the c= attribute must be base64(gs2 ++ cb-data) — for PLUS the
        // cb-data is the RFC 5929 hash of THIS server's certificate
        val cbData =
          if (script == "scram-plus") {
            val ks = KeyStore.getInstance("PKCS12")
            val fis = new FileInputStream(ksPath.get)
            try ks.load(fis, "changeit".toCharArray) finally fis.close()
            Scram.endpointHash(ks.getCertificate(ks.aliases().nextElement()))
          } else Array.emptyByteArray
        val expectedC = b64.encodeToString(sawGs2.getBytes(UTF_8) ++ cbData)
        assert(fattrs('c') == expectedC,
          s"c=${fattrs('c')} != expected $expectedC (gs2=$sawGs2)")
        assert(fattrs('r') == snonce)
        val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
        val authMessage = s"$bare,$serverFirst,$withoutProof"
        val salted = Scram.hi("sekret", salt, 4096)
        val clientKey = Scram.hmac(salted, "Client Key")
        val clientSig = Scram.hmac(Scram.sha256(clientKey), authMessage)
        val proof = java.util.Base64.getDecoder.decode(fattrs('p'))
        val recovered = proof.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
        assert(java.util.Arrays.equals(Scram.sha256(recovered), Scram.sha256(clientKey)),
          "client proof failed verification")
        scramVerified = true
        val serverSig = Scram.hmac(Scram.hmac(salted, "Server Key"), authMessage)
        msg(out, 'R', ByteBuffer.allocate(4).putInt(12).array() ++
          s"v=${b64.encodeToString(serverSig)}".getBytes(UTF_8))
        msg(out, 'R', ByteBuffer.allocate(4).putInt(0).array())
        queryLoop(in, out)
    }
  }

  private def readMsg(in: InputStream): (Char, ByteBuffer) = {
    val h = ByteBuffer.wrap(in.readNBytes(5))
    val t = h.get().toChar
    val l = h.getInt() - 4
    (t, ByteBuffer.wrap(in.readNBytes(l)))
  }

  private def cstr(b: ByteBuffer): String = {
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var c = b.get(); while (c != 0) { bytes += c; c = b.get() }
    new String(bytes.toArray, UTF_8)
  }

  private def msg(out: OutputStream, tpe: Char, payload: Array[Byte]): Unit = {
    val buf = ByteBuffer.allocate(5 + payload.length)
    buf.put(tpe.toByte).putInt(4 + payload.length).put(payload)
    out.write(buf.array()); out.flush()
  }

  private def serve(in: InputStream, out: OutputStream,
                    preread: Option[(Int, Int)]): Unit = {
    val (slen, proto) = preread.getOrElse {
      val h = ByteBuffer.wrap(in.readNBytes(8)); (h.getInt(), h.getInt())
    }
    assert(proto == 196608, s"bad protocol $proto")
    val body = ByteBuffer.wrap(in.readNBytes(slen - 8))
    val params = scala.collection.mutable.Map.empty[String, String]
    var k = cstr(body)
    while (k.nonEmpty) { params(k) = cstr(body); k = if (body.remaining() > 1) cstr(body) else "" }
    startupParams = params.toMap
    msg(out, 'R', ByteBuffer.allocate(4).putInt(0).array()) // trust
    queryLoop(in, out)
  }

  private def queryLoop(in: InputStream, out: OutputStream): Unit = {
    msg(out, 'Z', Array('I'.toByte))
    var open = true
    while (open) {
      val head = in.readNBytes(5)
      if (head.length < 5) return
      val hb = ByteBuffer.wrap(head)
      val tpe = hb.get(); val len = hb.getInt() - 4
      val payload = ByteBuffer.wrap(in.readNBytes(len))
      tpe.toChar match {
        case 'Q' =>
          msg(out, 'G', Array[Byte](0, 0, 0))
          val acc = new ByteArrayOutputStream()
          var inCopy = true
          while (inCopy) {
            val h2 = ByteBuffer.wrap(in.readNBytes(5))
            val t2 = h2.get(); val l2 = h2.getInt() - 4
            val p2 = in.readNBytes(l2)
            t2.toChar match {
              case 'd' => acc.write(p2)
              case 'c' =>
                inCopy = false
                copyBytes = acc.toByteArray
                val rows = new String(copyBytes, UTF_8).count(_ == '\n')
                msg(out, 'C', s"COPY $rows".getBytes(UTF_8) ++ Array[Byte](0))
                msg(out, 'Z', Array('I'.toByte))
              case other => throw new AssertionError(s"unexpected in-copy $other")
            }
          }
        case 'X' => open = false
        case other => throw new AssertionError(s"unexpected frontend message $other")
      }
    }
  }

  def close(): Unit = server.close()
}

class PgWireTlsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = Files.createTempDirectory("graft_tls").toFile
  private val ks = s"$dir/pg.p12"
  private val rootPem = s"$dir/root.pem"
  private val otherKs = s"$dir/other.p12"
  private val otherPem = s"$dir/other.pem"

  override def beforeAll(): Unit = {
    def keytool(args: String*): Unit =
      assert(Process("keytool" +: args).!(ProcessLogger(_ => ())) == 0,
        s"keytool failed: ${args.mkString(" ")}")
    // server identity: CN + SAN=dns:localhost ONLY (no IP SAN), so
    // verify-full passes via "localhost" and fails via "127.0.0.1"
    keytool("-genkeypair", "-alias", "pg", "-keyalg", "RSA", "-keysize", "2048",
      "-dname", "CN=localhost", "-ext", "SAN=dns:localhost", "-validity", "30",
      "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", "changeit", "-keypass", "changeit")
    keytool("-exportcert", "-rfc", "-alias", "pg", "-keystore", ks,
      "-storepass", "changeit", "-file", rootPem)
    // an UNRELATED self-signed root for the wrong-CA case
    keytool("-genkeypair", "-alias", "other", "-keyalg", "RSA", "-keysize", "2048",
      "-dname", "CN=localhost", "-ext", "SAN=dns:localhost", "-validity", "30",
      "-storetype", "PKCS12", "-keystore", otherKs,
      "-storepass", "changeit", "-keypass", "changeit")
    keytool("-exportcert", "-rfc", "-alias", "other", "-keystore", otherKs,
      "-storepass", "changeit", "-file", otherPem)
  }

  override def afterAll(): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(dir)

  private def factory(be: TlsFakeBackend, sslMode: String,
                      rootCert: Option[String] = None,
                      host: String = "localhost",
                      password: Option[String] = None) =
    new PgWireCopySessionFactory(host, be.port, "graftdb", "graft",
      password = password, sslMode = sslMode, sslRootCert = rootCert)

  private def copyOnce(f: PgWireCopySessionFactory): Long = {
    val s = f.open()
    try s.copyIn("COPY t FROM STDIN WITH CSV NULL '\\N'",
      new java.io.StringReader("1,a\n2,b\n"))
    finally s.close()
  }

  test("sslmode=require: SSLRequest preamble, TLS wrap, COPY streams encrypted") {
    val be = new TlsFakeBackend(Some(ks))
    try {
      assert(copyOnce(factory(be, "require")) === 2L)
      assert(be.sawSslRequest && be.servedOverTls)
      assert(new String(be.copyBytes, UTF_8) === "1,a\n2,b\n")
      assert(be.startupParams("user") === "graft")
    } finally be.close()
  }

  test("sslmode=require against a server that answers 'N' fails loudly") {
    val be = new TlsFakeBackend(None, Seq("nossl"))
    try {
      val e = intercept[java.io.IOException](factory(be, "require").open())
      assert(e.getMessage.contains("refused SSL"))
    } finally be.close()
  }

  test("sslmode=require fails loudly when the handshake itself breaks") {
    val be = new TlsFakeBackend(None, Seq("break"))
    try intercept[java.io.IOException](factory(be, "require").open())
    finally be.close()
  }

  test("sslmode=prefer encrypts WITHOUT demanding a root cert when the server has TLS") {
    val be = new TlsFakeBackend(Some(ks))
    try {
      assert(copyOnce(factory(be, "prefer")) === 2L) // no sslrootcert passed
      assert(be.servedOverTls)
    } finally be.close()
  }

  test("sslmode=prefer falls back to plaintext on 'N', like libpq") {
    val be = new TlsFakeBackend(None, Seq("nossl"))
    try {
      assert(copyOnce(factory(be, "prefer")) === 2L)
      assert(be.sawSslRequest && !be.servedOverTls)
    } finally be.close()
  }

  test("sslmode=prefer retries plaintext after a BROKEN handshake, like libpq") {
    // connection 1: server says 'S' then hangs up mid-handshake;
    // connection 2: plaintext, no preamble — the client must reconnect
    val be = new TlsFakeBackend(None, Seq("break", "nossl"))
    try {
      assert(copyOnce(factory(be, "prefer")) === 2L)
      assert(be.sawSslRequest && !be.servedOverTls)
    } finally be.close()
  }

  test("sslmode=prefer retries plaintext when the server closes on SSLRequest (EOF)") {
    // round-11 advice: a hangup right after SSLRequest surfaces as a plain
    // IOException (read() == -1), not an SSLException — libpq's prefer
    // ladder falls back on ANY SSL-phase failure, so must this client
    val be = new TlsFakeBackend(None, Seq("hangup", "nossl"))
    try {
      assert(copyOnce(factory(be, "prefer")) === 2L)
      assert(be.sawSslRequest && !be.servedOverTls)
    } finally be.close()
  }

  test("sslmode=require still fails loudly when the server closes on SSLRequest") {
    val be = new TlsFakeBackend(None, Seq("hangup"))
    try {
      val e = intercept[Exception](copyOnce(factory(be, "require")))
      assert(e.getMessage.toLowerCase.contains("ssl"), e.getMessage)
    } finally be.close()
  }

  test("sslmode=disable sends no preamble at all") {
    val be = new TlsFakeBackend(None, Seq("nossl"))
    try {
      assert(copyOnce(factory(be, "disable")) === 2L)
      assert(!be.sawSslRequest)
    } finally be.close()
  }

  test("sslmode=allow stays plaintext when the server accepts it") {
    val be = new TlsFakeBackend(None, Seq("nossl"))
    try {
      assert(copyOnce(factory(be, "allow")) === 2L)
      assert(!be.sawSslRequest && !be.servedOverTls)
    } finally be.close()
  }

  test("sslmode=allow upgrades to TLS after a plaintext 28000 rejection, like libpq") {
    // connection 1: plaintext StartupMessage rejected with 28000 (an
    // hostssl-only pg_hba); connection 2: SSLRequest -> 'S' -> TLS serve
    val be = new TlsFakeBackend(Some(ks), Seq("reject-plain", "tls"))
    try {
      assert(copyOnce(factory(be, "allow")) === 2L)
      assert(be.rejectedPlain && be.servedOverTls)
    } finally be.close()
  }

  test("SCRAM-SHA-256-PLUS: channel binding over TLS, proof covers the server certificate") {
    val be = new TlsFakeBackend(Some(ks), Seq("scram-plus"))
    try {
      assert(copyOnce(factory(be, "require", password = Some("sekret"))) === 2L)
      assert(be.sawMechanism === "SCRAM-SHA-256-PLUS")
      assert(be.sawGs2 === "p=tls-server-end-point,,")
      assert(be.scramVerified, "backend did not verify the channel-bound proof")
    } finally be.close()
  }

  test("TLS without PLUS on offer: client sends the 'y' gs2 flag (downgrade signal)") {
    // an honest non-PG server that simply lacks PLUS accepts 'y'; a real
    // PostgreSQL that HAD advertised PLUS would reject it — which is the
    // point of the flag
    val be = new TlsFakeBackend(Some(ks), Seq("scram-noplus"))
    try {
      assert(copyOnce(factory(be, "require", password = Some("sekret"))) === 2L)
      assert(be.sawMechanism === "SCRAM-SHA-256")
      assert(be.sawGs2 === "y,,")
      assert(be.scramVerified)
    } finally be.close()
  }

  test("verify-ca: accepts the pinned root, rejects an unrelated one, demands sslrootcert") {
    val ok = new TlsFakeBackend(Some(ks))
    try assert(copyOnce(factory(ok, "verify-ca", Some(rootPem))) === 2L)
    finally ok.close()

    val wrong = new TlsFakeBackend(Some(ks))
    try intercept[java.io.IOException](
      factory(wrong, "verify-ca", Some(otherPem)).open())
    finally wrong.close()

    val missing = new TlsFakeBackend(Some(ks))
    try {
      val e = intercept[java.io.IOException](factory(missing, "verify-ca").open())
      assert(e.getMessage.contains("sslrootcert"))
    } finally missing.close()
  }

  test("verify-full: hostname must match the certificate's SAN") {
    val ok = new TlsFakeBackend(Some(ks))
    try assert(copyOnce(factory(ok, "verify-full", Some(rootPem))) === 2L)
    finally ok.close()

    // same certificate, connected by IP: no IP SAN -> identification fails
    val byIp = new TlsFakeBackend(Some(ks))
    try intercept[java.io.IOException](
      factory(byIp, "verify-full", Some(rootPem), host = "127.0.0.1").open())
    finally byIp.close()
  }

  test("socketTimeout bounds a mute server; timeouts parse from the URL") {
    val be = new TlsFakeBackend(None, Seq("mute"))
    try {
      val f = new PgWireCopySessionFactory("localhost", be.port, "db", "u",
        password = None, sslMode = "disable", socketTimeoutSecs = 1)
      val t0 = System.nanoTime()
      intercept[java.net.SocketTimeoutException](f.open())
      assert((System.nanoTime() - t0) / 1e9 < 5.0, "timeout did not bound the read")
    } finally be.close()
    val f2 = PgWireCopySessionFactory.fromJdbcUrl(
      "jdbc:postgresql://h/db?user=u&connectTimeout=3&socketTimeout=7")
    assert(f2.connectTimeoutSecs === 3 && f2.socketTimeoutSecs === 7)
    val f3 = PgWireCopySessionFactory.fromJdbcUrl(
      "jdbc:postgresql://h/db?user=u&connect_timeout=4") // libpq alias
    assert(f3.connectTimeoutSecs === 4)
  }

  test("fromJdbcUrl parses sslmode/sslrootcert and pgjdbc's ssl=true") {
    val f1 = PgWireCopySessionFactory.fromJdbcUrl(
      "jdbc:postgresql://h:5432/db?user=u&sslmode=verify-ca&sslrootcert=%2Fca.pem")
    assert(f1.sslMode === "verify-ca" && f1.sslRootCert === Some("/ca.pem"))
    val f2 = PgWireCopySessionFactory.fromJdbcUrl(
      "jdbc:postgresql://h/db?user=u&ssl=true")
    assert(f2.sslMode === "require")
    val f3 = PgWireCopySessionFactory.fromJdbcUrl("jdbc:postgresql://h/db?user=u")
    assert(f3.sslMode === "prefer")
    intercept[IllegalArgumentException](
      PgWireCopySessionFactory.fromJdbcUrl(
        "jdbc:postgresql://h/db?user=u&sslmode=bogus"))
  }
}
