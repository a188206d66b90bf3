package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  InputStream, OutputStream}
import java.net.Socket

import javax.net.ssl.{SSLContext, SSLSocket}

/** TLS upgrades for the wire-protocol clients, reusing
  * [[graft.api.Tls]]'s PEM/context plumbing. Each engine negotiates the
  * upgrade differently — PG sends an SSLRequest preamble before startup
  * (protocol v3 "SSL Session Encryption"), MySQL sends a short
  * CLIENT_SSL handshake response then wraps (Protocol::SSLRequest), and
  * TDS tunnels the TLS handshake records inside PRELOGIN-type packets
  * before switching to raw TLS ([MS-TDS] encryption negotiation; the
  * flow behind `database_sqlserver.go:677`'s encrypt connection
  * options) — but the socket wrapping is shared here.
  */
private[sources] object WireTls {

  /** Client-side context: trust `caPem` when given (self-signed /
    * private-CA servers), the JVM default trust store otherwise. */
  def clientContext(caPem: Option[String]): SSLContext =
    caPem.map(graft.api.Tls.trustOnlyContext)
      .getOrElse(SSLContext.getDefault)

  /** Upgrade a connected socket to TLS (client role) and handshake.
    * `protocols` restricts the offered versions — the TDS tunnel pins
    * TLSv1.2 because TLS 1.3 servers emit NewSessionTicket records
    * AFTER the Finished exchange, which would still be inside the
    * tunnel's framed phase on the server while the client has already
    * switched to raw records; in 1.2 every handshake message lands
    * before the switch. */
  def clientWrap(socket: Socket, host: String, ctx: SSLContext,
      protocols: Seq[String] = Nil): SSLSocket = {
    val ssl = ctx.getSocketFactory
      .createSocket(socket, host, socket.getPort, true)
      .asInstanceOf[SSLSocket]
    ssl.setUseClientMode(true)
    if (protocols.nonEmpty) ssl.setEnabledProtocols(protocols.toArray)
    ssl.startHandshake()
    ssl
  }

  /** Upgrade an accepted socket to TLS (server role) and handshake —
    * the loopback fixtures' side of the exchange. */
  def serverWrap(socket: Socket, ctx: SSLContext): SSLSocket = {
    val ssl = ctx.getSocketFactory
      .createSocket(socket, null, socket.getPort, true)
      .asInstanceOf[SSLSocket]
    ssl.setUseClientMode(false)
    ssl.startHandshake()
    ssl
  }

  /** TDS encryption tunnel: while `framing` is on, outgoing bytes are
    * wrapped in PRELOGIN-type (0x12) TDS packets and incoming packets
    * are unwrapped — the [MS-TDS] rule that the TLS handshake rides
    * inside TDS frames. Once both sides finish the handshake, flip
    * `framing` off and the tunnel becomes a passthrough: whole TDS
    * packets then travel inside raw TLS records. Works for both roles
    * (client wraps with [[clientWrap]], the loopback with
    * [[serverWrap]]); the deframed/passthrough modes share one buffered
    * stream so no bytes are lost at the switch. */
  final class TdsTunnel(inner: Socket) extends Socket {
    @volatile var framing = true
    private val rawIn = new DataInputStream(
      new BufferedInputStream(inner.getInputStream, 1 << 16))
    private val rawOut =
      new BufferedOutputStream(inner.getOutputStream, 1 << 16)
    private var buf: Array[Byte] = Array.emptyByteArray
    private var pos = 0

    private val tunnelIn: InputStream = new InputStream {
      def read(): Int = {
        val one = new Array[Byte](1)
        val n = read(one, 0, 1)
        if (n < 0) -1 else one(0) & 0xff
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (!framing) return rawIn.read(b, off, len)
        if (pos >= buf.length) {
          val tpe = rawIn.read()
          if (tpe < 0) return -1
          // remaining 7 header bytes read atomically: a mid-header EOF
          // must fail as a closed connection, not decode a garbage length
          val hdr = new Array[Byte](7)
          rawIn.readFully(hdr)
          val plen = ((hdr(1) & 0xff) << 8) | (hdr(2) & 0xff)
          if (plen < 8)
            throw new java.io.IOException(s"bad TDS tunnel frame length $plen")
          buf = new Array[Byte](plen - 8)
          rawIn.readFully(buf)
          pos = 0
        }
        val n = math.min(len, buf.length - pos)
        System.arraycopy(buf, pos, b, off, n)
        pos += n
        n
      }
    }

    private val tunnelOut: OutputStream = new OutputStream {
      def write(v: Int): Unit = write(Array(v.toByte), 0, 1)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        if (!framing) { rawOut.write(b, off, len); return }
        var o = off; var left = len
        while (left > 0) {
          val take = math.min(left, 4088)
          val last = take == left
          rawOut.write(0x12)
          rawOut.write(if (last) 0x01 else 0x00)
          val l = take + 8
          rawOut.write((l >> 8) & 0xff); rawOut.write(l & 0xff)
          rawOut.write(0); rawOut.write(0); rawOut.write(0); rawOut.write(0)
          rawOut.write(b, o, take)
          o += take; left -= take
        }
      }
      override def flush(): Unit = rawOut.flush()
    }

    override def getInputStream: InputStream = tunnelIn
    override def getOutputStream: OutputStream = tunnelOut
    override def isConnected: Boolean = true
    override def isBound: Boolean = true
    override def isClosed: Boolean = inner.isClosed
    override def getInetAddress: java.net.InetAddress = inner.getInetAddress
    override def getPort: Int = inner.getPort
    override def getLocalPort: Int = inner.getLocalPort
    override def getRemoteSocketAddress: java.net.SocketAddress =
      inner.getRemoteSocketAddress
    override def setSoTimeout(t: Int): Unit = inner.setSoTimeout(t)
    override def getSoTimeout: Int = inner.getSoTimeout
    override def setTcpNoDelay(on: Boolean): Unit = inner.setTcpNoDelay(on)
    override def close(): Unit = inner.close()
  }
}
