package graft.functions

/** The portable 32-bit hash both engines compute identically: the first 8
  * hex chars of md5, read big-endian into a BIGINT. Used for deterministic
  * sampling (hash % N) wherever engine-private RNG (TABLESAMPLE) would
  * break reproducibility. SketchDedup's token-lambda hashes are the same
  * construction applied inside list_transform/transform lambdas.
  */
object PortableHash {
  /** Spark SQL fragment hashing the given SQL expression. */
  def spark(in: String): String =
    s"cast(conv(substring(md5($in), 1, 8), 16, 10) as bigint)"

  /** DuckDB fragment: hex digits positionally weighted (powers of 16 up to
    * 16^7 stay far inside double precision). */
  def duck(in: String): String =
    s"""CAST(list_sum(list_transform(range(1, 9),
       |  i -> (strpos('0123456789abcdef', substr(md5($in), i, 1)) - 1)
       |       * power(16, 8 - i))) AS BIGINT)""".stripMargin
}
