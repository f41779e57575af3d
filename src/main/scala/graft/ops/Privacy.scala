package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Prefix-preserving IP pseudonymization with the Crypto-PAn structure
  * (reference `/root/reference/libtenzir/builtins/operators/pseudonymize.cpp`,
  * the `encrypt_cryptopan` operator; algorithm from Xu et al.,
  * "Prefix-Preserving IP Address Anonymization", ICNP 2002).
  *
  * Output bit i = input bit i XOR lsb(PRF(key, input bits above i)) — so two
  * addresses sharing exactly a k-bit prefix map to outputs sharing exactly a
  * k-bit prefix, which is the property network-trace consumers rely on.
  *
  * The reference instantiates the PRF with AES-128; we instantiate it with
  * [[Text.md5h60]] over `"key:len:prefix"` so the whole mapping is (a) a pure
  * codegen'd Column expression — no UDF, no shuffle, broadcast-free — and
  * (b) exactly reproducible by the DuckDB oracle (md5 is common to both
  * engines). Same structure, different PRF: suitable for deterministic
  * pseudonymization in analytics pipelines, NOT for adversarial anonymity
  * (neither is 128-bit Crypto-PAn once the key leaks).
  */
object Privacy {

  /** Pseudonymize a numeric IPv4 (0 <= ip < 2^32, as long). 32 md5 probes per
    * row, one per bit; constant-folds nothing but stays inside whole-stage
    * codegen.
    */
  def pseudonymizeIp(ipNum: Column, key: String): Column = {
    val terms = (0 to 31).map { i =>
      // prefix above bit i: the top (31-i) bits; length tag disambiguates
      // e.g. prefix value 0 at different lengths
      val prefixVal = shiftrightunsigned(ipNum, i + 1)
      val prf = Text.md5h60(
        concat_ws(":", lit(key), lit(31 - i), prefixVal.cast("string")))
      val flip = pmod(prf, lit(2L))
      val bit = shiftrightunsigned(ipNum, i).bitwiseAND(lit(1L))
      bit.bitwiseXOR(flip) * lit(1L << i)
    }
    terms.reduce(_ + _)
  }

  /** Dotted-quad string in, dotted-quad string out. */
  def pseudonymizeIpString(ip: Column, key: String): Column =
    numToDotted(pseudonymizeIp(Contexts.ipToLong(ip), key))

  /** Numeric IPv4 → dotted-quad string. */
  def numToDotted(n: Column): Column =
    concat_ws(".",
      shiftrightunsigned(n, 24).bitwiseAND(lit(255L)).cast("string"),
      shiftrightunsigned(n, 16).bitwiseAND(lit(255L)).cast("string"),
      shiftrightunsigned(n, 8).bitwiseAND(lit(255L)).cast("string"),
      n.bitwiseAND(lit(255L)).cast("string"))

  /** The DuckDB-SQL twin of [[pseudonymizeIp]], generated so the oracle and
    * the Spark plan cannot drift: `ipExpr` must be a SQL expression yielding
    * the same numeric IP.
    */
  def pseudonymizeIpSql(ipExpr: String, key: String): String = {
    val terms = (0 to 31).map { i =>
      val prefix = s"(($ipExpr) >> ${i + 1})"
      val prf = s"('0x' || substr(md5(concat('$key', ':', '${31 - i}', ':', " +
        s"CAST($prefix AS VARCHAR))), 1, 15))::BIGINT"
      val flip = s"($prf % 2)"
      val bit = s"((($ipExpr) >> $i) & 1)"
      s"(xor($bit, $flip) * ${1L << i})"
    }
    terms.mkString("(", " + ", ")")
  }
}
