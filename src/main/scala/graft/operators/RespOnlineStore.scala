package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

/** Redis-protocol [[OnlineStore]]: the K2 online sink speaking real
  * RESP over a socket (reference `RedisSink`,
  * feathr-rs/src/materialization.rs:27-55 — feature maps written as
  * Redis hashes keyed `table:key`).
  *
  * Write path: [[putAll]] is called once per PARTITION by
  * `Materializer.write` and pipelines `DEL` + `HSET` command pairs
  * (`DEL` first: a materialization REPLACES a key's feature map, while
  * a bare `HSET` would merge with stale fields) — up to
  * `maxPipeline` commands are buffered before one flush + bulk reply
  * drain, so the wire pays ~one round-trip per `maxPipeline/2` rows
  * instead of one per row. Each partition opens its own connection
  * (task-scoped, no shared mutable client state to synchronize).
  *
  * RESP bulk strings are length-prefixed and binary-safe, so field
  * names and values round-trip losslessly with NO encoding layer
  * (unlike [[FileOnlineStore]]'s URL-encoding) — newlines, '=', and
  * unicode all pass through as raw UTF-8 bytes.
  *
  * Limitation (inherent to hash-shaped storage, same as Redis): a row
  * whose value map is EMPTY stores nothing — `get` returns None. The
  * materializer always writes at least one feature column.
  */
class RespOnlineStore(host: String, port: Int,
    maxPipeline: Int = 512) extends OnlineStore {
  import Resp._

  def put(table: String, key: String, value: Map[String, String]): Unit =
    putAll(table, Iterator(key -> value))

  override def putAll(table: String,
      rows: Iterator[(String, Map[String, String])]): Unit = {
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port))
    try {
      val out = new BufferedOutputStream(sock.getOutputStream, 1 << 16)
      val in = new DataInputStream(
        new BufferedInputStream(sock.getInputStream, 1 << 16))
      var pending = 0
      def drain(): Unit = { out.flush(); (0 until pending).foreach(_ => readReply(in)); pending = 0 }
      rows.foreach { case (k, v) =>
        val rk = s"$table:$k"
        writeCommand(out, Seq("DEL", rk))
        pending += 1
        if (v.nonEmpty) {
          writeCommand(out,
            "HSET" +: rk +: v.toSeq.sortBy(_._1).flatMap { case (f, x) => Seq(f, x) })
          pending += 1
        }
        if (pending >= maxPipeline) drain()
      }
      drain()
    } finally sock.close()
  }

  def get(table: String, key: String): Option[Map[String, String]] = {
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port))
    try {
      val out = new BufferedOutputStream(sock.getOutputStream)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      writeCommand(out, Seq("HGETALL", s"$table:$key"))
      out.flush()
      readReply(in) match {
        case ArrayReply(items) if items.nonEmpty =>
          Some(items.grouped(2).collect {
            case Seq(f, v) => new String(f, UTF_8) -> new String(v, UTF_8)
          }.toMap)
        case _ => None
      }
    } finally sock.close()
  }

  /** Bulk point-read: pipelined `HGETALL` for every key over ONE
    * connection — `maxPipeline` commands per flush+drain round-trip,
    * the same wire discipline as the write path ([[putAll]]). The
    * per-key [[get]] opens a socket per call; serving or verifying a
    * key SET should pay connection setup once.
    * Returns (key, None) for absent keys, preserving input order.
    */
  override def getAll(table: String,
      keys: Seq[String]): Seq[(String, Option[Map[String, String]])] = {
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port))
    try {
      val out = new BufferedOutputStream(sock.getOutputStream, 1 << 16)
      val in = new DataInputStream(
        new BufferedInputStream(sock.getInputStream, 1 << 16))
      keys.grouped(maxPipeline).flatMap { batch =>
        batch.foreach(k => writeCommand(out, Seq("HGETALL", s"$table:$k")))
        out.flush()
        batch.map { k =>
          readReply(in) match {
            case ArrayReply(items) if items.nonEmpty =>
              k -> Some(items.grouped(2).collect {
                case Seq(f, v) => new String(f, UTF_8) -> new String(v, UTF_8)
              }.toMap)
            case _ => k -> None
          }
        }
      }.toSeq
    } finally sock.close()
  }

  /** All keys of `table`, enumerated with cursor `SCAN … MATCH table:*
    * COUNT batch` — the production path: each round-trip returns a
    * bounded batch and the server never blocks on the whole keyspace
    * (Redis `KEYS` is O(keyspace) inside the server's single event
    * loop). Iterates until the server returns cursor "0"; duplicates
    * (which Redis's rehash-safe cursors may emit) are collapsed
    * client-side, per the documented SCAN contract.
    */
  def scanKeys(table: String, batch: Int = 512): Seq[String] = {
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port))
    try {
      val out = new BufferedOutputStream(sock.getOutputStream)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      var cursor = "0"
      var done = false
      while (!done) {
        writeCommand(out,
          Seq("SCAN", cursor, "MATCH", s"$table:*", "COUNT", batch.toString))
        out.flush()
        val (next, keys) = readScanReply(in)
        keys.foreach(b =>
          seen += new String(b, UTF_8).substring(table.length + 1))
        cursor = next
        done = cursor == "0"
      }
      seen.toSeq
    } finally sock.close()
  }

  /** One-shot `KEYS table:*` — fine for SMALL tables (tests, bounded
    * verification reads); O(keyspace) in one blocking server pass, so
    * production enumeration should use [[scanKeys]].
    */
  def keys(table: String): Seq[String] = {
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port))
    try {
      val out = new BufferedOutputStream(sock.getOutputStream)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      writeCommand(out, Seq("KEYS", s"$table:*"))
      out.flush()
      readReply(in) match {
        case ArrayReply(items) =>
          items.map(b => new String(b, UTF_8).substring(table.length + 1))
        case other => throw new java.io.IOException(s"KEYS: unexpected reply $other")
      }
    } finally sock.close()
  }
}

/** Minimal RESP wire codec shared by the client and the embedded test
  * server. Commands are RESP arrays of bulk strings
  * (`*N\r\n$len\r\n<bytes>\r\n...`); replies are integers (`:n`),
  * simple strings (`+OK`), errors (`-ERR`), bulk strings, or arrays.
  */
private[operators] object Resp {
  sealed trait Reply
  case class IntReply(n: Long) extends Reply
  case class SimpleReply(s: String) extends Reply
  case class BulkReply(bytes: Array[Byte]) extends Reply // null = nil
  case class ArrayReply(items: Seq[Array[Byte]]) extends Reply
  case class ErrorReply(msg: String) extends Reply

  private val Crlf = "\r\n".getBytes(UTF_8)

  def writeCommand(out: java.io.OutputStream, args: Seq[String]): Unit = {
    out.write(s"*${args.size}".getBytes(UTF_8)); out.write(Crlf)
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}".getBytes(UTF_8)); out.write(Crlf)
      out.write(b); out.write(Crlf)
    }
  }

  /** One CRLF-terminated header line (RESP headers are ASCII). */
  def readLine(in: DataInputStream): String = {
    val sb = new java.lang.StringBuilder(16)
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new java.io.EOFException("RESP stream closed mid-line")
      sb.append(c.toChar); c = in.read()
    }
    require(in.read() == '\n', "RESP: CR not followed by LF")
    sb.toString
  }

  private def readBulk(in: DataInputStream, len: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    in.readFully(b)
    require(in.read() == '\r' && in.read() == '\n', "RESP: bulk not CRLF-terminated")
    b
  }

  def readReply(in: DataInputStream): Reply = {
    val line = readLine(in)
    line.charAt(0) match {
      case ':' => IntReply(line.substring(1).toLong)
      case '+' => SimpleReply(line.substring(1))
      case '-' => throw new java.io.IOException(s"RESP server error: ${line.substring(1)}")
      case '$' =>
        val len = line.substring(1).toInt
        BulkReply(if (len < 0) null else readBulk(in, len))
      case '*' =>
        val n = line.substring(1).toInt
        ArrayReply((0 until math.max(n, 0)).map { _ =>
          val h = readLine(in)
          require(h.charAt(0) == '$', s"RESP: nested non-bulk reply '$h'")
          readBulk(in, h.substring(1).toInt)
        })
      case c => throw new java.io.IOException(s"RESP: unknown reply type '$c'")
    }
  }

  /** SCAN reply: `*2` of [bulk next-cursor, array of bulk keys] — the
    * one nested-array reply shape the client consumes (generic
    * [[readReply]] handles flat arrays only).
    */
  def readScanReply(in: DataInputStream): (String, Seq[Array[Byte]]) = {
    val outer = readLine(in)
    if (outer.startsWith("-"))
      throw new java.io.IOException(s"RESP server error: ${outer.substring(1)}")
    require(outer == "*2", s"SCAN: expected *2 reply, got '$outer'")
    val ch = readLine(in)
    require(ch.charAt(0) == '$', s"SCAN: non-bulk cursor '$ch'")
    val cursor = new String(readBulk(in, ch.substring(1).toInt), UTF_8)
    val ah = readLine(in)
    require(ah.charAt(0) == '*', s"SCAN: non-array key list '$ah'")
    val keys = (0 until ah.substring(1).toInt).map { _ =>
      val h = readLine(in)
      require(h.charAt(0) == '$', s"SCAN: non-bulk key '$h'")
      readBulk(in, h.substring(1).toInt)
    }
    (cursor, keys)
  }

  /** A RESP command: verb + raw argument bytes. */
  def readCommand(in: DataInputStream): Option[Seq[Array[Byte]]] = {
    val first = in.read()
    if (first < 0) return None
    require(first == '*', s"RESP: expected array command, got '${first.toChar}'")
    val n = readLine(in).toInt // rest of the *N line
    Some((0 until n).map { _ =>
      val h = readLine(in)
      require(h.charAt(0) == '$', s"RESP: non-bulk command arg '$h'")
      readBulk(in, h.substring(1).toInt)
    })
  }
}

/** In-process RESP server implementing the command subset the store
  * uses (`PING`, `DEL`, `HSET`, `HGETALL`, `KEYS`, cursor `SCAN`) —
  * the zero-egress stand-in
  * for a Redis endpoint, so [[RespOnlineStore]]'s pipelining, framing,
  * and concurrency are exercised over REAL sockets in tests. One thread
  * per connection (the sink opens one connection per partition);
  * `commandCount` lets tests assert the pipelined command volume.
  */
class EmbeddedRespServer {
  import Resp._

  // sorted concurrent map: SCAN's stateless cursor pages tailMap(from)
  // in O(log K + batch) per round-trip instead of re-sorting the whole
  // keyspace on every cursor call
  private val data =
    new java.util.concurrent.ConcurrentSkipListMap[String, Map[String, String]]()
  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", 0))
  val commandCount = new java.util.concurrent.atomic.AtomicLong()

  def port: Int = server.getLocalPort

  private def str(b: Array[Byte]): String = new String(b, UTF_8)

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new BufferedOutputStream(sock.getOutputStream, 1 << 16)
    try {
      var cmd = readCommand(in)
      while (cmd.isDefined) {
        commandCount.incrementAndGet()
        val args = cmd.get
        // command-VALIDATION failures (unsupported glob, bad COUNT, …)
        // reply -ERR like a real Redis instead of killing the
        // connection — only protocol-FRAMING errors (readCommand /
        // readBulk) abort the stream, where resync is impossible
        try str(args.head).toUpperCase match {
          case "PING" => out.write("+PONG\r\n".getBytes(UTF_8))
          case "DEL" =>
            val removed = args.tail.count(k => data.remove(str(k)) != null)
            out.write(s":$removed\r\n".getBytes(UTF_8))
          case "HSET" =>
            val key = str(args(1))
            val fields = args.drop(2).grouped(2).collect {
              case Seq(f, v) => str(f) -> str(v)
            }.toMap
            var added = 0
            data.compute(key, (_, old) => {
              val prev = if (old == null) Map.empty[String, String] else old
              added = fields.keySet.diff(prev.keySet).size
              prev ++ fields
            })
            out.write(s":$added\r\n".getBytes(UTF_8))
          case "HGETALL" =>
            val m = data.getOrDefault(str(args(1)), Map.empty)
            out.write(s"*${m.size * 2}\r\n".getBytes(UTF_8))
            m.toSeq.sortBy(_._1).foreach { case (f, v) =>
              Seq(f, v).foreach { s =>
                val b = s.getBytes(UTF_8)
                out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
                out.write(b); out.write("\r\n".getBytes(UTF_8))
              }
            }
          case "KEYS" =>
            // glob subset the client uses: a literal prefix + "*"
            val pat = str(args(1))
            require(pat.endsWith("*") && !pat.dropRight(1).contains("*"),
              s"KEYS: only prefix globs supported, got '$pat'")
            val prefix = pat.dropRight(1)
            val ks = {
              import scala.jdk.CollectionConverters._
              data.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
            }
            out.write(s"*${ks.size}\r\n".getBytes(UTF_8))
            ks.foreach { s =>
              val b = s.getBytes(UTF_8)
              out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
              out.write(b); out.write("\r\n".getBytes(UTF_8))
            }
          case "SCAN" =>
            // cursor semantics: "0" starts; otherwise the hex-encoded
            // last key the previous batch returned — stateless on the
            // server (like Redis's reverse-bucket cursor), resilient to
            // concurrent inserts (keys present throughout the whole
            // iteration are always returned; Redis gives no stronger
            // guarantee either). Keys are walked in sorted order so a
            // batch is "the next COUNT keys after the cursor".
            val cursor = str(args(1))
            var prefix = ""
            var count = 10
            var i = 2
            while (i + 1 < args.size) {
              str(args(i)).toUpperCase match {
                case "MATCH" =>
                  val pat = str(args(i + 1))
                  require(pat.endsWith("*") && !pat.dropRight(1).contains("*"),
                    s"SCAN: only prefix globs supported, got '$pat'")
                  prefix = pat.dropRight(1)
                case "COUNT" => count = str(args(i + 1)).toInt
                case other => throw new IllegalArgumentException(
                  s"SCAN: unknown option '$other'")
              }
              i += 2
            }
            // first page seeks straight to the prefix (not ""), and the
            // walk stops at the first key PAST the prefix range
            // (takeWhile, not filter — matching keys are contiguous in
            // sorted order), so a batch never scans the keyspace beyond
            // the last match
            val from = if (cursor == "0") prefix else
              new String(cursor.grouped(2).toArray
                .map(Integer.parseInt(_, 16).toByte), UTF_8)
            val it = {
              import scala.jdk.CollectionConverters._
              data.tailMap(from, /* inclusive = */ cursor == "0")
                .keySet().iterator().asScala.takeWhile(_.startsWith(prefix))
            }
            val page = it.take(count + 1).toSeq
            val batch = page.take(count)
            val next = if (page.size <= count) "0"
              else batch.last.getBytes(UTF_8).map("%02x".format(_)).mkString
            out.write(s"*2\r\n".getBytes(UTF_8))
            val nb = next.getBytes(UTF_8)
            out.write(s"$$${nb.length}\r\n".getBytes(UTF_8))
            out.write(nb); out.write("\r\n".getBytes(UTF_8))
            out.write(s"*${batch.size}\r\n".getBytes(UTF_8))
            batch.foreach { s =>
              val b = s.getBytes(UTF_8)
              out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
              out.write(b); out.write("\r\n".getBytes(UTF_8))
            }
          case other =>
            out.write(s"-ERR unknown command '$other'\r\n".getBytes(UTF_8))
        } catch {
          case e @ (_: IllegalArgumentException | _: NumberFormatException) =>
            // getMessage may be null (e.g. bare NumberFormatException)
            val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
            out.write(s"-ERR ${msg.replaceAll("[\r\n]", " ")}\r\n"
              .getBytes(UTF_8))
        }
        // a pipelined client flushes many commands before reading; only
        // flush when no further command is already buffered would need
        // peeking — flushing per reply is correct and still batched by
        // the BufferedOutputStream
        out.flush()
        cmd = readCommand(in)
      }
    } catch {
      case _: java.io.EOFException | _: java.net.SocketException => ()
    } finally sock.close()
  }

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock), s"resp-conn-${sock.getPort}")
      t.setDaemon(true); t.start()
    } catch { case _: java.net.SocketException => () }
  }, "resp-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = server.close()
}
