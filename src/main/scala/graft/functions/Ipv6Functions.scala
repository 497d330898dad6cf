package graft.functions

import java.net.{Inet4Address, Inet6Address, InetAddress}

import org.apache.spark.sql.SparkSession

/** IPv6 function family (reference: be/src/exprs/function/function_ip
  * .cpp — ipv6_string_to_num / ipv6_num_to_string / is_ipv6_string /
  * ipv4_to_ipv6 / cut_ipv6). The numeric form is the 16-byte
  * big-endian BINARY, like the reference's IPV6 columns.
  *
  * Literal-looking input only (regex-gated before InetAddress so no
  * hostname resolution can ever trigger); unparseable input -> NULL,
  * matching the reference's *_or_null contract.
  */
object Ipv6Functions {

  private val ipv6ish = "^[0-9a-fA-F:.]+$".r

  private def parse6(s: String): Option[Array[Byte]] =
    if (s == null || s.isEmpty || ipv6ish.findFirstIn(s).isEmpty || !s.contains(':')) None
    else try InetAddress.getByName(s) match {
      case a: Inet6Address => Some(a.getAddress)
      case a: Inet4Address => // "::ffff:1.2.3.4" may normalize to v4
        val b = new Array[Byte](16)
        b(10) = -1; b(11) = -1
        System.arraycopy(a.getAddress, 0, b, 12, 4)
        Some(b)
      case _ => None
    } catch { case _: Exception => None }

  /** canonical textual form (RFC 5952: lowercase hex, longest zero run
    * of >= 2 groups compressed to ::) — Java's getHostAddress never
    * compresses, so this is hand-rolled to match the reference. */
  private def format6(b: Array[Byte]): Option[String] =
    if (b == null || b.length != 16) None
    else {
      val groups = (0 until 8).map(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
      var bestStart = -1
      var bestLen = 0
      var i = 0
      while (i < 8) {
        if (groups(i) == 0) {
          var j = i
          while (j < 8 && groups(j) == 0) j += 1
          if (j - i > bestLen) { bestLen = j - i; bestStart = i }
          i = j
        } else i += 1
      }
      if (bestLen < 2) Some(groups.map(Integer.toHexString).mkString(":"))
      else Some(groups.take(bestStart).map(Integer.toHexString).mkString(":") +
        "::" + groups.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":"))
    }

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("ipv6_string_to_num", (s: String) => parse6(s).orNull)
    u.register("ipv6_string_to_num_or_null", (s: String) => parse6(s).orNull)
    u.register("ipv6_num_to_string", (b: Array[Byte]) => format6(b).orNull)
    u.register("is_ipv6_string", (s: String) =>
      if (s == null) null else java.lang.Boolean.valueOf(parse6(s).isDefined))
    u.register("ipv4_to_ipv6", (s: String) => {
      // ::ffff:a.b.c.d mapping of a dotted-quad
      if (s == null) null
      else {
        val parts = s.split("\\.")
        if (parts.length != 4 || parts.exists(p => p.isEmpty || p.exists(!_.isDigit)
            || p.toIntOption.forall(v => v < 0 || v > 255))) null
        else {
          val b = new Array[Byte](16)
          b(10) = -1; b(11) = -1
          parts.map(_.toInt.toByte).copyToArray(b, 12)
          b
        }
      }
    })
    // cut_ipv6(addr, bytesToCutForIPv6, bytesToCutForIPv4): zero the
    // trailing N bytes (the reference's anonymization cut)
    u.register("cut_ipv6", (b: Array[Byte], cut6: Int, cut4: Int) =>
      if (b == null || b.length != 16) null
      else {
        val isMapped4 = b.take(10).forall(_ == 0) && b(10) == -1.toByte && b(11) == -1.toByte
        val cut = math.min(16, math.max(0, if (isMapped4) cut4 else cut6))
        val out = b.clone()
        var i = 16 - cut
        while (i < 16) { out(i) = 0; i += 1 }
        out
      })
  }
}
