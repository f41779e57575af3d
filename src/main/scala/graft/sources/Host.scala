package graft.sources

import java.nio.file.{Files => JFiles, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Host-introspection sources: `processes`, `sockets`, `nics`.
  *
  * Reference analogues: `/root/reference/libtenzir/builtins/operators/
  * processes.cpp`, `sockets.cpp` and `plugins/nic` — node-local state as
  * event sources. These are driver-side /proc & /sys walks (host metadata is
  * tiny and node-local by definition); the result is an ordinary DataFrame, so
  * everything downstream distributes normally.
  */
object Host {

  private def read(p: Path): Option[String] =
    Try(new String(JFiles.readAllBytes(p), "UTF-8")).toOption

  /** One row per process: pid, name, state, ppid, threads, rss_bytes. */
  def processes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pageSize = 4096L
    val rows = JFiles.list(Paths.get("/proc")).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .flatMap { p =>
        read(p.resolve("stat")).flatMap { stat =>
          // pid (comm) state ppid … — comm may contain spaces/parens: split
          // around the LAST ')' per proc(5)
          val close = stat.lastIndexOf(')')
          if (close < 0) None
          else {
            val pid = stat.takeWhile(_ != ' ').toLong
            val comm = stat.substring(stat.indexOf('(') + 1, close)
            val rest = stat.substring(close + 2).split(' ')
            // rest(0)=state rest(1)=ppid rest(17)=num_threads rest(21)=rss pages
            Try((pid, comm, rest(0), rest(1).toLong, rest(17).toLong,
              rest(21).toLong * pageSize)).toOption
          }
        }
      }.toSeq
    rows.toDF("pid", "name", "state", "ppid", "threads", "rss_bytes")
  }

  private val TcpStates = Map(
    "01" -> "ESTABLISHED", "02" -> "SYN_SENT", "03" -> "SYN_RECV",
    "04" -> "FIN_WAIT1", "05" -> "FIN_WAIT2", "06" -> "TIME_WAIT",
    "07" -> "CLOSE", "08" -> "CLOSE_WAIT", "09" -> "LAST_ACK",
    "0A" -> "LISTEN", "0B" -> "CLOSING")

  /** Little-endian hex ip:port ("0100007F:1F90") → ("127.0.0.1", 8080).
    * v6 rows carry 32 hex chars: four 32-bit little-endian words.
    */
  private[graft] def parseHexAddr(s: String): (String, Int) = {
    val Array(ip, port) = s.split(':')
    val addr =
      if (ip.length <= 8) ip.grouped(2).toSeq.reverse.map(Integer.parseInt(_, 16)).mkString(".")
      else ip.grouped(8).map(_.grouped(2).toSeq.reverse.mkString).mkString
        .toLowerCase.grouped(4).mkString(":")
    (addr, Integer.parseInt(port, 16))
  }

  /** One row per TCP/UDP socket (v4+v6 tables): protocol, local/remote
    * addr+port, state, uid, inode.
    */
  def sockets(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq("tcp", "udp", "tcp6", "udp6").flatMap { proto =>
      read(Paths.get(s"/proc/net/$proto")).toSeq.flatMap { text =>
        text.split('\n').drop(1).flatMap { line =>
          val f = line.trim.split("\\s+")
          if (f.length < 10) None
          else Try {
            val (la, lp) = parseHexAddr(f(1))
            val (ra, rp) = parseHexAddr(f(2))
            (proto, la, lp, ra, rp,
              TcpStates.getOrElse(f(3), f(3)), f(7).toLong, f(9).toLong)
          }.toOption
        }
      }
    }
    rows.toDF("protocol", "local_addr", "local_port", "remote_addr", "remote_port",
      "state", "uid", "inode")
  }

  /** One row per network interface: name, mtu, mac, operstate. */
  def nics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = Paths.get("/sys/class/net")
    val rows =
      if (!JFiles.isDirectory(base)) Seq.empty
      else JFiles.list(base).iterator().asScala.map { p =>
        val name = p.getFileName.toString
        def f(n: String) = read(p.resolve(n)).map(_.trim).getOrElse("")
        (name, Try(f("mtu").toLong).getOrElse(0L), f("address"), f("operstate"))
      }.toSeq
    rows.toDF("name", "mtu", "mac", "operstate")
  }
}
