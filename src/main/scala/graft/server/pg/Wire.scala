package graft.server.pg

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** PostgreSQL v3 wire framing: 1-byte type + int32 length (incl. the
  * length field, excl. the type byte), then payload. Mirrors the
  * reference's framing (reference wire.go:68-98, message.go:146-255)
  * with plain buffers — the zero-copy single-inflight trick there is a
  * cgo-era optimization we don't need (SURVEY A2).
  */
final class WireIn(in: InputStream) {
  private val din = new DataInputStream(new BufferedInputStream(in, 1 << 20))

  /** First message: no type byte (StartupMessage / SSLRequest /
    * CancelRequest — reference message.go:79-144). */
  def readStartup(): (Int, Array[Byte]) = {
    val len = din.readInt()
    val code = din.readInt()
    val body = new Array[Byte](len - 8)
    din.readFully(body)
    (code, body)
  }

  /** Regular message: returns (type, payload). */
  def readMessage(): (Byte, Array[Byte]) = {
    val typ = din.read()
    if (typ < 0) throw new EOFException
    val len = din.readInt()
    val body = new Array[Byte](len - 4)
    din.readFully(body)
    (typ.toByte, body)
  }
}

/** Payload reader with PG conventions (cstr, int16/32, counted bytes). */
final class Payload(buf: Array[Byte]) {
  private var pos = 0
  def cstr(): String = {
    val start = pos
    while (buf(pos) != 0) pos += 1
    val s = new String(buf, start, pos - start, UTF_8)
    pos += 1
    s
  }
  def int16(): Int = { val v = ((buf(pos) & 0xff) << 8) | (buf(pos + 1) & 0xff); pos += 2; v.toShort.toInt }
  def int32(): Int = {
    val v = ((buf(pos) & 0xff) << 24) | ((buf(pos + 1) & 0xff) << 16) |
      ((buf(pos + 2) & 0xff) << 8) | (buf(pos + 3) & 0xff)
    pos += 4
    v
  }
  def bytes(n: Int): Array[Byte] = { val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a }
  def remaining: Int = buf.length - pos
}

/** Outgoing message builder + writer. */
final class WireOut(out: OutputStream) {
  private val dout = new DataOutputStream(new BufferedOutputStream(out, 1 << 16))

  def raw(b: Int): Unit = dout.write(b) // bare byte ('N' SSL denial)

  def message(typ: Char)(build: MsgBuf => Unit): Unit = {
    val b = new MsgBuf
    build(b)
    dout.write(typ)
    dout.writeInt(b.size + 4)
    b.writeTo(dout)
  }
  def flush(): Unit = dout.flush()

  // -- protocol-level senders ------------------------------------------------
  def authenticationOk(): Unit = message('R')(_.int32(0))
  def authenticationSASL(mechs: Seq[String]): Unit = message('R') { b =>
    b.int32(10); mechs.foreach(b.cstr); b.byte(0)
  }
  def authenticationSASLContinue(data: Array[Byte]): Unit = message('R') { b => b.int32(11); b.bytes(data) }
  def authenticationSASLFinal(data: Array[Byte]): Unit = message('R') { b => b.int32(12); b.bytes(data) }
  def parameterStatus(k: String, v: String): Unit = message('S') { b => b.cstr(k); b.cstr(v) }
  def backendKeyData(pid: Int, secret: Int): Unit = message('K') { b => b.int32(pid); b.int32(secret) }
  def readyForQuery(status: Char = 'I'): Unit = { message('Z')(_.byte(status.toByte)); flush() }
  def commandComplete(tag: String): Unit = message('C')(_.cstr(tag))
  def emptyQueryResponse(): Unit = message('I')(_ => ())
  def parseComplete(): Unit = message('1')(_ => ())
  def bindComplete(): Unit = message('2')(_ => ())
  def closeComplete(): Unit = message('3')(_ => ())
  def noData(): Unit = message('n')(_ => ())
  def portalSuspended(): Unit = message('s')(_ => ())

  def errorResponse(msg: String, sqlState: String = "XX000"): Unit = {
    message('E') { b =>
      b.byte('S'); b.cstr("ERROR")
      b.byte('C'); b.cstr(sqlState)
      b.byte('M'); b.cstr(msg)
      b.byte(0)
    }
    flush()
  }

  def rowDescription(cols: Seq[(String, Int)], fmts: Seq[Int] = Nil): Unit = message('T') { b =>
    b.int16(cols.size)
    cols.zipWithIndex.foreach { case ((name, oid), i) =>
      val f = if (fmts.isEmpty) 0 else if (fmts.size == 1) fmts.head
              else if (i < fmts.size) fmts(i) else 0
      b.cstr(name); b.int32(0); b.int16(0); b.int32(oid); b.int16(-1); b.int32(-1); b.int16(f)
    }
  }

  def parameterDescription(oids: Seq[Int]): Unit = message('t') { b =>
    b.int16(oids.size); oids.foreach(b.int32)
  }

  def dataRow(values: Seq[Option[String]]): Unit = message('D') { b =>
    b.int16(values.size)
    values.foreach {
      case None => b.int32(-1)
      case Some(s) =>
        val bs = s.getBytes(UTF_8)
        b.int32(bs.length); b.bytes(bs)
    }
  }

  /** DataRow from pre-encoded cell bodies — the mixed text/binary
    * extended-protocol path (r15b): each cell is already in the format
    * its Bind result code requested. */
  def dataRowBytes(values: Seq[Option[Array[Byte]]]): Unit = message('D') { b =>
    b.int16(values.size)
    values.foreach {
      case None => b.int32(-1)
      case Some(bs) => b.int32(bs.length); b.bytes(bs)
    }
  }

  def copyInResponse(nCols: Int): Unit = { message('G') { b =>
    b.byte(0); b.int16(nCols); (0 until nCols).foreach(_ => b.int16(0))
  }; flush() }
}

final class MsgBuf {
  private val buf = new ArrayBuffer[Byte](64)
  def byte(b: Byte): Unit = buf += b
  def bytes(bs: Array[Byte]): Unit = buf ++= bs
  def cstr(s: String): Unit = { buf ++= s.getBytes(UTF_8); buf += 0 }
  def int16(v: Int): Unit = { buf += (v >> 8).toByte; buf += v.toByte }
  def int32(v: Int): Unit = {
    buf += (v >> 24).toByte; buf += (v >> 16).toByte; buf += (v >> 8).toByte; buf += v.toByte
  }
  def size: Int = buf.size
  def writeTo(out: DataOutputStream): Unit = out.write(buf.toArray)
}
