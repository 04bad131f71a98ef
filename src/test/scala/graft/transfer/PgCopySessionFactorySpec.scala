package graft.transfer

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DriverManager}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stand-in for `org.postgresql.core.BaseConnection`: any interface works —
  * the factory only ever passes the unwrapped object back into the copy
  * manager's constructor. */
trait FakePgBaseConnection { def tag: String }

/** Stand-in for `org.postgresql.copy.CopyManager`: same constructor shape
  * (the base-connection interface) and the same
  * `copyIn(String, Reader): Long` the factory resolves by name. Drains the
  * reader fully — pgjdbc does — and records (sql, payload) per call. */
final class FakePgCopyManager(conn: FakePgBaseConnection) {
  def copyIn(sql: String, from: java.io.Reader): Long = {
    val sb = new java.lang.StringBuilder
    val buf = new Array[Char](64)
    var n = from.read(buf, 0, buf.length)
    while (n >= 0) { sb.append(buf, 0, n); n = from.read(buf, 0, buf.length) }
    val payload = sb.toString
    FakePgCopyManager.calls.add((conn.tag, sql, payload))
    payload.count(_ == '\n').toLong
  }
}

object FakePgCopyManager {
  /** (connection tag, COPY sql, CSV payload) per copyIn — concurrent: the
    * sink opens one session per executor partition in parallel. */
  val calls = new ConcurrentLinkedQueue[(String, String, String)]()
}

/** `jdbc:fakepg:` driver whose connections are dynamic proxies that unwrap
  * to [[FakePgBaseConnection]] — the minimal surface the factory touches. */
object FakePgDriver extends java.sql.Driver {
  val closedCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private def connection(url: String): Connection = {
    val closed = new AtomicBoolean(false)
    val base = new FakePgBaseConnection { def tag: String = url }
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef =
          method.getName match {
            case "unwrap"       => base
            case "isWrapperFor" => java.lang.Boolean.TRUE
            case "close" =>
              if (closed.compareAndSet(false, true)) closedCount.incrementAndGet()
              null
            case "isClosed" => java.lang.Boolean.valueOf(closed.get)
            case "toString" => s"FakePgConnection($url)"
            case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
            case "equals"   => java.lang.Boolean.valueOf(proxy eq args(0))
            case _          => null
          }
      }).asInstanceOf[Connection]
  }

  def connect(url: String, info: java.util.Properties): Connection =
    if (acceptsURL(url)) connection(url) else null
  def acceptsURL(url: String): Boolean = url.startsWith("jdbc:fakepg:")
  def getPropertyInfo(url: String, info: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  def getMajorVersion: Int = 1
  def getMinorVersion: Int = 0
  def jdbcCompliant(): Boolean = false
  def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

/** Proves the production [[PgCopySessionFactory]] glue — connection open,
  * reflective CopyManager construction from the unwrapped base connection,
  * reflective copyIn dispatch, connection close — with the pgjdbc class
  * names swapped for stand-ins, since the build's offline mirror carries no
  * org.postgresql artifacts (README records this). The reflective path is
  * identical at runtime; only the three name strings differ.
  */
class PgCopySessionFactorySpec extends SparkSpec {
  DriverManager.registerDriver(FakePgDriver)

  private def factory(url: String = "jdbc:fakepg:target") =
    new PgCopySessionFactory(url,
      driverClass = classOf[FakePgCopyManager].getName, // any loadable class
      copyManagerClass = classOf[FakePgCopyManager].getName,
      baseConnectionClass = classOf[FakePgBaseConnection].getName)

  test("open() builds the copy manager reflectively and copyIn round-trips") {
    FakePgCopyManager.calls.clear()
    val before = FakePgDriver.closedCount.get()
    val session = factory().open()
    val rows = session.copyIn("COPY \"t\" (\"a\") FROM STDIN WITH CSV NULL '\\N'",
      new java.io.StringReader("1,x\n2,\\N\n"))
    session.close()
    assert(rows == 2L)
    val (tag, sql, payload) = FakePgCopyManager.calls.poll()
    assert(tag == "jdbc:fakepg:target")
    assert(sql.startsWith("COPY \"t\""))
    assert(payload == "1,x\n2,\\N\n")
    assert(FakePgDriver.closedCount.get() == before + 1)
  }

  test("a missing driver class is tolerated; a missing manager class fails at open") {
    // driver preload failure must not mask DriverManager's own resolution
    val okDespiteNoDriver = new PgCopySessionFactory("jdbc:fakepg:x",
      driverClass = "org.postgresql.Driver", // absent in this image
      copyManagerClass = classOf[FakePgCopyManager].getName,
      baseConnectionClass = classOf[FakePgBaseConnection].getName).open()
    okDespiteNoDriver.close()
    // but the copy-manager class itself is load-bearing — and a setup
    // failure AFTER getConnection must close the connection it opened
    // (one leaked server connection per task retry otherwise)
    val beforeLeakCheck = FakePgDriver.closedCount.get()
    assertThrows[ClassNotFoundException] {
      new PgCopySessionFactory("jdbc:fakepg:x").open()
    }
    assert(FakePgDriver.closedCount.get() == beforeLeakCheck + 1,
      "reflective-setup failure leaked the JDBC connection")
  }

  test("CopyManagerSink streams executor partitions through the factory") {
    FakePgCopyManager.calls.clear()
    val df = spark.range(100L).select(col("id"), concat(lit("v"), col("id")).as("s"))
      .repartition(4)
    val sink = new CopyManagerSink(factory())
    sink.write(df, "items")
    assert(sink.countRows(spark, "items").contains(100L))
    val calls = FakePgCopyManager.calls.toArray(Array.empty[(String, String, String)])
    assert(calls.length <= 4 && calls.nonEmpty) // one per non-empty partition
    assert(calls.forall(_._2 ==
      "COPY \"items\" (\"id\", \"s\") FROM STDIN WITH CSV NULL '\\N'"))
    val lines = calls.flatMap(_._3.split("\n"))
    assert(lines.length == 100)
    assert(lines.contains("42,v42"))
  }
}
